"""tdnet_tpu — a TPU-native (JAX/XLA/Pallas) framework for Temporally
Distributed Networks for fast video semantic segmentation.

Re-implements the full capability surface of the reference TDNet
(CVPR'20, "Temporally Distributed Networks for Fast Video Semantic
Segmentation") with a TPU-first architecture:

- functional models with per-path parameters stacked on a leading
  ``path`` axis (vmap for single chip, shard_map/GSPMD for branch
  parallelism),
- a stateless clip (training) graph and a stateful streaming inference
  step that carries an explicit K/V/Q ring-cache pytree through ``jit``,
- XLA collectives (via GSPMD sharding) instead of NCCL DataParallel,
- SyncBatchNorm for free: batch moments reduced over the sharded batch
  axis by the partitioner,
- Pallas kernels for the cross-frame attention-propagation hot path.
"""

__version__ = "0.1.0"
