"""Device mesh and sharding layouts.

The reference's parallelism is single-node multi-GPU DataParallel +
SyncBatchNorm over NCCL (Training/train.py:77, models/__init__.py:26-28).
The TPU-native replacement (SURVEY.md 2.11, 5.8):

- mesh axes ``(data, path)``: ``data`` is the batch/data-parallel axis
  (ICI within a slice, DCN across hosts via jax.distributed), ``path``
  shards the stacked sub-network axis — branch/model-group parallelism
  over TDNet's N temporally-distributed subnets.
- params: per-path stacks sharded over ``path``, everything else
  replicated; inputs: clip axis over ``path``, batch over ``data``.
- SyncBN falls out of GSPMD: batch-moment reductions over the sharded
  batch axis become ICI all-reduces; gradient reduction likewise.
- ``spatial`` axis (optional, streaming): shards the image H dimension
  for multi-chip single-frame latency (XLA inserts conv halo exchanges).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, path_parallel: int = 1,
              devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    n = len(devices)
    if path_parallel > 1 and n % path_parallel == 0:
        shape = (n // path_parallel, path_parallel)
    else:
        shape = (n, 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, ("data", "path"))


def make_spatial_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.asarray(devices), ("spatial",))


@dataclasses.dataclass(frozen=True)
class TrainShardings:
    params: object     # pytree-prefix sharding applied leaf-wise
    frames: NamedSharding
    labels: NamedSharding
    replicated: NamedSharding


def _path_leaf_sharding(mesh: Mesh):
    return NamedSharding(mesh, P("path"))


def train_shardings(mesh: Mesh) -> TrainShardings:
    return TrainShardings(
        params=None,  # computed per-leaf by shard_params
        frames=NamedSharding(mesh, P("path", "data")),
        labels=NamedSharding(mesh, P("data")),
        replicated=NamedSharding(mesh, P()),
    )


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Place a TDNet param tree: path-stacked leaves over ``path``,
    everything else replicated."""
    path_sh = _path_leaf_sharding(mesh)
    rep = NamedSharding(mesh, P())

    def place(tree, sharded):
        return jax.tree.map(
            lambda x: jax.device_put(x, path_sh if sharded else rep), tree)

    out = {}
    for k, v in params.items():
        out[k] = place(v, k in ("paths", "atn"))
    return out


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> int:
    """Multi-host initialization (DCN across hosts, ICI within a slice).

    The reference is single-node only (SURVEY.md 5.8); on TPU pods,
    calling this before ``make_mesh`` makes ``jax.devices()`` span every
    host and the same (data, path) mesh code runs unchanged — GSPMD
    routes the data-axis collectives over DCN. No-ops on a single
    process. Returns the process count.
    """
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_count()
