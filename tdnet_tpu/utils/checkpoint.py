"""Native checkpointing (pickle or Orbax) + run management.

Covers the reference's best-mIoU checkpoint behavior
(Training/train.py:136-146: save {epoch, model_state-sans-teacher,
best_iou}) and exceeds it with step-tagged periodic saves for
resume-after-preemption (SURVEY.md 5.3).

Two backends:
- pickle-of-numpy (default): single portable file, gathers to host.
- Orbax (``save_pytree_orbax``/``load_pytree_orbax``): directory
  checkpoints written per-shard straight from device memory — on a
  mesh every host writes only its shards (no global gather), and
  ``async_=True`` overlaps the write with the next training steps.
  Select with ``training: ckpt_backend: orbax`` in the YAML config.
"""

from __future__ import annotations

import datetime
import logging
import os
import pickle
import random

import jax
import numpy as np


def save_pytree(path: str, tree) -> None:
    """Portable pickle-of-numpy checkpoint (host-independent)."""
    host = jax.tree.map(lambda x: np.asarray(x), tree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(host, f, protocol=4)
    os.replace(tmp, path)


def load_pytree(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


_async_ckptr = None  # one AsyncCheckpointer per process (owns a thread pool)
_pending_swap = None  # (written_tmp_dir, final_dir) of the in-flight async save


def _orbax_async():
    global _async_ckptr
    if _async_ckptr is None:
        import orbax.checkpoint as ocp
        _async_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _async_ckptr


def _swap_in(tmp: str, final: str) -> None:
    """Promote a finished checkpoint at ``tmp`` to ``final``. The old
    ``final`` survives (as ``final.old``) until the new one is in place,
    so no crash window leaves zero resumable checkpoints."""
    import shutil
    old = final + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(final):
        os.rename(final, old)
    os.rename(tmp, final)
    if os.path.exists(old):
        shutil.rmtree(old)


def save_pytree_orbax(path: str, tree, *, async_: bool = False):
    """Orbax checkpoint at directory ``path`` (replaced if it exists).

    Crash-safe replacement: the new checkpoint is written to
    ``path.new`` first and only swapped in once complete — the previous
    ``path`` remains restorable throughout (preemption during the write
    must not destroy the only checkpoint, SURVEY.md 5.3).

    ``async_=True`` returns immediately after device arrays are copied
    out; the serialize/write runs on a background thread and the swap
    happens at the next ``wait_pending_saves()`` (or next save). Sharded
    arrays are written per-shard without gathering to one host.
    """
    global _pending_swap
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    wait_pending_saves()  # join + swap any previous async save
    tmp = path + ".new"
    if os.path.exists(tmp):
        import shutil
        shutil.rmtree(tmp)
    if async_:
        _orbax_async().save(tmp, args=ocp.args.StandardSave(tree))
        _pending_swap = (tmp, path)
        return
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(tmp, tree)
    _swap_in(tmp, path)


def wait_pending_saves() -> None:
    """Join the in-flight async orbax save (if any) and swap it in."""
    global _pending_swap
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()
    if _pending_swap is not None:
        tmp, final = _pending_swap
        _pending_swap = None
        _swap_in(tmp, final)


def resolve_ckpt_dir(path: str) -> str:
    """Pick the newest complete checkpoint among ``path`` and the
    crash-window leftovers. Orbax itself commits atomically (tmp name +
    rename), so an existing ``path.new`` directory is always complete
    AND newer than ``path`` (crash after commit, before our swap);
    ``path.old`` only survives a crash mid-swap."""
    for p in (path + ".new", path, path + ".old"):
        if os.path.isdir(p):
            return p
    return path


def load_pytree_orbax(path: str, like=None):
    """Restore an Orbax checkpoint. ``like`` (a pytree of arrays or
    jax.ShapeDtypeStructs with shardings) restores each leaf directly to
    the given sharding/devices; without it leaves arrive as numpy."""
    import orbax.checkpoint as ocp
    path = resolve_ckpt_dir(os.path.abspath(path))
    with ocp.StandardCheckpointer() as ckptr:
        if like is None:
            return ckptr.restore(path)
        target = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                           sharding=getattr(x, "sharding", None)),
            like)
        return ckptr.restore(path, target)


def save_best(logdir: str, arch: str, dataset: str, *, step: int,
              params, best_iou: float) -> str:
    """Reference-compatible best checkpoint (name + payload keys)."""
    state = {"epoch": step + 1,
             "model_state": jax.tree.map(np.asarray, params),
             "best_iou": float(best_iou)}
    path = os.path.join(logdir, f"{arch}_{dataset}_best_model.pkl")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(state, f, protocol=4)
    os.replace(tmp, path)
    return path


def make_run_dir(config_path: str, base: str = "runs") -> str:
    """runs/<config-stem>/<random-id>/ with a config copy
    (reference train.py:165-175)."""
    import shutil
    stem = os.path.basename(config_path)
    stem = stem[:-4] if stem.endswith(".yml") else os.path.splitext(stem)[0]
    run_id = random.randint(1, 100000)
    logdir = os.path.join(base, stem, str(run_id))
    os.makedirs(logdir, exist_ok=True)
    shutil.copy(config_path, logdir)
    return logdir


def get_logger(logdir: str) -> logging.Logger:
    """File logger run_<ts>.log (reference utils.py:222-232)."""
    logger = logging.getLogger("tdnet_tpu")
    ts = str(datetime.datetime.now()).split(".")[0]
    ts = ts.replace(" ", "_").replace(":", "_").replace("-", "_")
    hdlr = logging.FileHandler(os.path.join(logdir, f"run_{ts}.log"))
    hdlr.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
    logger.addHandler(hdlr)
    logger.setLevel(logging.INFO)
    return logger
