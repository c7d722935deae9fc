"""Device mesh + sharding layout for multi-chip training.

The scaling axes of this workload (SURVEY.md §2.10): the reference is
single-GPU; its "long axis" is the number of Gaussians. TPU-native layout:

  * mesh ('data', 'point') over the slice;
  * Gaussian state + Adam moments + counters sharded over 'point' (axis 0 of
    every capacity-padded array) — this replaces the reference's CPU-RAM
    offload of moments past 50M points (LoG/model/splitter.py:198-204) with
    an HBM pool that grows with the slice;
  * cameras/GT images sharded over 'data' (each data group renders different
    views); gradients reduce over 'data' via XLA-inserted collectives;
  * the per-view visible cut is gathered across point shards by the XLA GSPMD
    partitioner (all-gather over ICI), and the sparse Adam scatter goes back
    shard-local.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, data: int | None = None,
              point: int | None = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if data is None or point is None:
        # favor point-sharding (HBM capacity), keep data >= 2 when possible
        if n >= 4:
            data = 2
            point = n // 2
        else:
            data, point = 1, n
    assert data * point == n, (data, point, n)
    dev_array = np.asarray(devices).reshape(data, point)
    return Mesh(dev_array, ("data", "point"))


def point_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("point"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def shard_pytree_point_axis(tree, mesh: Mesh):
    """Place every array in the pytree with axis-0 sharded over 'point'."""
    sh = point_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host initialization (DCN): call once per host before any jax
    op; afterwards `make_mesh` sees the global device set and GSPMD routes
    the 'data' axis over DCN while 'point' shards ride ICI within each
    slice. No-op when single-host env vars are absent."""
    import jax

    if coordinator is None:
        import os

        coordinator = os.environ.get("LOG_TPU_COORDINATOR")
        if coordinator is None:
            return
        num_processes = int(os.environ.get("LOG_TPU_NUM_PROCESSES", "1"))
        process_id = int(os.environ.get("LOG_TPU_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
