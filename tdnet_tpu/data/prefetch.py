"""Device feeding: uint8 upload + on-device preprocessing + prefetch.

The reference preprocesses on the host (cv2 resize + numpy normalize,
Testing/dataloader.py:55-73) and ships float32. TPU-first version:

- ship the raw uint8 frame (4x less host->device traffic),
- normalize and align-corners-resize ON DEVICE inside the jitted step
  (``make_device_preprocess``),
- overlap the next frame's host work + upload with the current frame's
  compute (``prefetch_to_device``).
"""

from __future__ import annotations

import collections
import threading

import jax
import jax.numpy as jnp

from tdnet_tpu.data.streaming import IMAGENET_MEAN, IMAGENET_STD
from tdnet_tpu.ops import resize_bilinear


def make_device_preprocess(in_size: tuple[int, int], dtype=jnp.bfloat16):
    """Returns jitted fn: uint8 NHWC frame -> normalized resized dtype."""
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)

    @jax.jit
    def preprocess(raw_u8):
        x = raw_u8.astype(jnp.float32) / 255.0
        x = (x - mean) / std
        x = resize_bilinear(x.astype(dtype), in_size)
        return x

    return preprocess


def prefetch_to_device(iterator, size: int = 2, device=None):
    """Wrap a host iterator of array(-tree)s with an upload-ahead buffer.

    Yields device-resident items while the host prepares + uploads the
    next ``size`` in a background thread (double buffering for size=2).
    """
    q: collections.deque = collections.deque()
    lock = threading.Condition()
    done = object()

    def producer():
        for item in iterator:
            placed = jax.tree.map(
                lambda x: jax.device_put(x, device), item)
            with lock:
                while len(q) >= size:
                    lock.wait()
                q.append(placed)
                lock.notify_all()
        with lock:
            q.append(done)
            lock.notify_all()

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        with lock:
            while not q:
                lock.wait()
            item = q.popleft()
            lock.notify_all()
        if item is done:
            return
        yield item
