"""The parallelism layer: device mesh + sharding rules.

The reference is single-device only (SURVEY.md §2.8: no DataParallel, no
torch.distributed). This module supplies what it lacks, TPU-idiomatically:

- **Data parallelism over ICI** as the baseline: a 1-D ``Mesh('data')`` over
  all visible chips; the batch dimension is sharded over it, parameters are
  replicated, and XLA compiles the gradient all-reduce onto ICI — the
  NCCL-equivalent is ``jax.sharding`` + XLA collectives, not hand-rolled
  transport.
- Multi-host: call :func:`initialize_distributed` once per process;
  ``jax.distributed.initialize()`` wires the coordinator and
  ``jax.devices()`` becomes the global device set.

TP/PP/EP are genuinely not applicable to SSD-class convnets (no sequence
axis, no experts, model ≪ HBM; SURVEY.md §2.8). The one model-axis strategy
that IS meaningful for convnets — **spatial partitioning** (GSPMD shards the
image-height dim; XLA inserts halo exchanges around every conv/pool) — is a
second mesh axis here: set ``cfg.TPU.MESH.SPATIAL > 1`` and images are
sharded ``P('data', 'spatial')`` while every other batch leaf stays
``P('data')``. The step function does not change — sharding propagation
derives every intermediate's layout and the halo collectives ride ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def initialize_distributed(coordinator: Optional[str] = None, **kwargs) -> None:
    """Multi-host bring-up (no-op single-host). The comm-backend layer."""
    if coordinator:
        jax.distributed.initialize(coordinator_address=coordinator, **kwargs)


def create_mesh(tpu_cfg=None, devices=None, batch_size: Optional[int] = None) -> Mesh:
    """Build the device mesh from ``cfg.TPU.MESH`` (``DATA: -1`` = all).

    ``MESH.SPATIAL > 1`` adds a spatial axis (image-height sharding); the
    remaining devices go to the data axis. When ``batch_size`` is given,
    the data axis is clipped to the largest device count that divides it
    (sharding requires batch % devices == 0).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    spatial = int(tpu_cfg.MESH.get("SPATIAL", 1)) if tpu_cfg is not None else 1
    spatial = max(1, min(spatial, n))
    want = int(tpu_cfg.MESH.DATA) if tpu_cfg is not None else -1
    if want in (-1, 0) or want > n // spatial:
        want = n // spatial
    if batch_size is not None:
        while want > 1 and batch_size % want != 0:
            want -= 1
    if want * spatial < n:
        print(
            f"warning: mesh uses {want * spatial}/{n} devices "
            f"(data={want}, spatial={spatial}; adjust TPU.MESH.SPATIAL or "
            f"the batch size to use every chip)", flush=True,
        )
    dev = np.asarray(devices[: want * spatial]).reshape(want, spatial)
    return Mesh(dev, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [B, ...] arrays: batch split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [B, H, W, C] images: batch over data, height over the
    spatial axis (a no-op partition when MESH.SPATIAL == 1)."""
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, priors, scalars)."""
    return NamedSharding(mesh, P())


def allgather_pickled(obj):
    """Gather an arbitrary picklable host object from every process; returns
    the list of all processes' objects (same order on every host).

    Built on two rounds of ``multihost_utils.process_allgather`` over uint8
    buffers (sizes first, then max-padded payloads) — no shared filesystem
    assumed, the bytes ride the same ICI/DCN fabric as the training
    collectives. This is the merge primitive for sharded multi-host eval.
    """
    import pickle

    procs = jax.process_count()
    if procs == 1:
        return [obj]
    from jax.experimental import multihost_utils

    data = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.asarray([data.size], np.int64))  # [procs, 1]
    buf = np.zeros(int(sizes.max()), np.uint8)
    buf[: data.size] = data
    bufs = multihost_utils.process_allgather(buf)  # [procs, max_size]
    return [
        pickle.loads(np.asarray(bufs[p][: int(sizes[p, 0])]).tobytes())
        for p in range(procs)
    ]


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch pytree with the batch dim sharded over chips.

    Single-process: a plain sharded device_put. Multi-host: each process
    contributes its PROCESS-LOCAL slice of the global batch (the loader is
    sharded by process — see ``load_data(..., shard_id, num_shards)``) and
    ``make_array_from_process_local_data`` assembles the global array.

    ``batch`` may be any pytree; a leaf whose final path key is ``images``
    and which is 4-D shards its height dim over the spatial axis too.
    """
    s = batch_sharding(mesh)
    s_img = image_sharding(mesh)
    n_spatial = mesh.shape[SPATIAL_AXIS]

    def put(path, x):
        is_img = (
            bool(path)
            and getattr(path[-1], "key", getattr(path[-1], "name", None)) == "images"
            and np.ndim(x) == 4
        )
        if is_img and n_spatial > 1 and x.shape[1] % n_spatial != 0:
            raise ValueError(
                f"image height {x.shape[1]} not divisible by the spatial "
                f"mesh axis ({n_spatial}); pick TPU.MESH.SPATIAL dividing H"
            )
        sh = s_img if is_img else s
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree_util.tree_map_with_path(put, batch)
