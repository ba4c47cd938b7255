#!/bin/bash
# Poll the axon TPU tunnel until a trivial device fetch succeeds, then run
# the given command. The tunnel drops for hours at a time (PROGRESS.jsonl
# stall windows); jax.devices() HANGS rather than erroring while it is
# down, so each probe is wrapped in its own timeout.
set -u
PROBE='import jax, numpy as np, jax.numpy as jnp; x = jnp.ones((8,)); assert float(np.asarray(x)[0]) == 1.0; print("tpu-ok", jax.devices()[0])'
while true; do
    if timeout 120 python -c "$PROBE" >/tmp/tpu_probe.log 2>&1; then
        echo "[wait_tpu] tunnel up at $(date -u +%H:%M:%S), launching: $*"
        break
    fi
    echo "[wait_tpu] tunnel still down at $(date -u +%H:%M:%S); retrying in 180s"
    sleep 180
done
exec "$@"
