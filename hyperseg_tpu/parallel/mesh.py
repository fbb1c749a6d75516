"""Device-mesh utilities: SPMD data/spatial parallelism over TPU ICI.

The reference's entire multi-device story is single-process
nn.DataParallel (train.py:242-243) plus a dormant torch.distributed
all_reduce for the eval confusion matrix (seg_utils.py:38-44). Here the
equivalent is jit over a jax.sharding.Mesh: batches sharded on the 'data'
axis, parameters replicated, XLA inserting psums for gradients and metric
reductions over ICI. A 'spatial' axis is reserved for sharding large images
over their height (the patch grid is embarrassingly parallel up to halos).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_spatial: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'spatial') mesh. Default: all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    if len(devices) < n_data * n_spatial:
        raise ValueError(
            f"make_mesh needs {n_data * n_spatial} devices "
            f"({n_data} data x {n_spatial} spatial) but jax sees only "
            f"{len(devices)} on '{jax.default_backend()}'. For virtual CPU "
            "devices set JAX_PLATFORMS=cpu and add "
            "--xla_force_host_platform_device_count=<n> to XLA_FLAGS before "
            "the first jax backend use (see tests/conftest.py).")
    devices = np.array(devices[:n_data * n_spatial]).reshape(n_data, n_spatial)
    return Mesh(devices, ("data", "spatial"))


def make_mesh_for_batch(batch_size: int, devices=None) -> Mesh:
    """Data-parallel mesh using the largest device count dividing batch_size."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh(n_data=n, devices=devices[:n])


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, *, spatial_dim: Optional[int] = None) -> NamedSharding:
    """Batch axis on 'data'; optionally shard a spatial dim (image height) on
    'spatial'."""
    if spatial_dim is None:
        return NamedSharding(mesh, P("data"))
    spec = [None] * (spatial_dim + 1)
    spec[0] = "data"
    spec[spatial_dim] = "spatial"
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, batch):
    sh = data_sharded(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_params(mesh: Mesh, params):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), params)
