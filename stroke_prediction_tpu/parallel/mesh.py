"""Device mesh and sharding helpers.

The reference is single-process / single-GPU (SURVEY.md §2.2: no
DataParallel, no torch.distributed).  The TPU framework scales by design:

  * **Data parallelism** (first-class): batches are sharded over the
    ``data`` mesh axis with ``NamedSharding``; under ``jit`` XLA inserts
    the gradient all-reduce and the cross-replica BatchNorm statistics
    reductions over ICI automatically — the collectives are compiled, not
    hand-written NCCL calls.
  * **Spatial sharding** (the CP/SP analog for volumes, SURVEY.md §5):
    the H axis of ``(B, D, H, W, C)`` volumes can be sharded over a
    ``space`` axis; XLA's SPMD partitioner inserts halo exchanges for the
    valid convolutions.  Not needed at 128x128x28, but the mesh hooks are
    first-class so larger volumes shard without code changes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _get_devices(n: int):
    """Default-platform devices, falling back to the fake multi-device CPU
    backend when the default platform has too few chips (the standard JAX
    ``--xla_force_host_platform_device_count`` test setup)."""
    devices = jax.devices()
    if len(devices) < n:
        cpu = jax.devices("cpu")
        if len(cpu) >= n:
            devices = cpu
    assert len(devices) >= n, (
        f"need {n} devices, have {len(devices)}; for a fake multi-device "
        f"CPU mesh run with JAX_PLATFORMS=cpu "
        f"XLA_FLAGS=--xla_force_host_platform_device_count={n} set "
        f"before jax initializes (see tests/conftest.py)")
    return devices[:n]


def make_data_mesh(n_devices: Optional[int] = None) -> Mesh:
    n = n_devices or len(jax.devices())
    return Mesh(np.array(_get_devices(n)).reshape(n), ("data",))


def make_mesh(data: int = 1, space: int = 1) -> Mesh:
    n = data * space
    return Mesh(np.array(_get_devices(n)).reshape(data, space),
                ("data", "space"))


def batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """Sharding for (B, D, H, W, C) batches: batch over 'data', optionally
    H over 'space'."""
    if spatial and "space" in mesh.axis_names:
        return NamedSharding(mesh, P("data", None, "space"))
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, spatial: bool = False):
    """device_put a host batch pytree with batch-axis sharding."""
    sh = batch_sharding(mesh, spatial)
    rep = replicate(mesh)

    def put(x):
        if x is None:
            return None
        import jax.numpy as jnp
        arr = jnp.asarray(x)
        if arr.ndim >= 1 and arr.shape[0] % mesh.shape["data"] == 0:
            if arr.ndim >= 5 and spatial:
                return jax.device_put(arr, sh)
            return jax.device_put(
                arr, NamedSharding(mesh, P(("data",))))
        return jax.device_put(arr, rep)

    return jax.tree_util.tree_map(put, tree)
