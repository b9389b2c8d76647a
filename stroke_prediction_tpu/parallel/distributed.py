"""Multi-host (multi-process) initialization and batch assembly.

The reference is strictly single-process (SURVEY.md §2.2: torch-0.3, no
torch.distributed).  The TPU framework's multi-host story is the standard
JAX one:

  * every process calls :func:`initialize` once before any jax array op —
    on TPU pod slices ``jax.distributed.initialize()`` auto-detects the
    coordinator from the TPU metadata; elsewhere (CPU/GPU or tests) the
    coordinator address / process count / process id are passed
    explicitly;
  * after init, ``jax.devices()`` is the GLOBAL device list, so the
    meshes built by :mod:`stroke_prediction_tpu.parallel.mesh` span all
    hosts and jitted collectives ride ICI (and DCN between slices) —
    the program stays single-program-multiple-data;
  * input data is process-local: every host loads only its shard of each
    global batch (:meth:`data.loader.BatchLoader` with
    ``process_shard=True`` slices the deterministic, seed-shared batch
    order by ``process_index``), and :func:`global_batch` assembles the
    per-host shards into one global ``jax.Array`` without any host ever
    materializing the full batch.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_INITIALIZED = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up the JAX distributed runtime (idempotent).

    On TPU pods call with no arguments (auto-detection); in tests /
    CPU fleets pass coordinator ``host:port``, world size and rank.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    # NB: must run before anything touches the XLA backend (jax.devices,
    # device_put, any computation) — do NOT probe jax.process_count() here
    already = False
    if hasattr(jax.distributed, "is_initialized"):
        already = jax.distributed.is_initialized()
    if not already:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
        except RuntimeError as e:
            # older JAX without is_initialized(): tolerate double init
            if "already initialized" not in str(e).lower():
                raise
    _INITIALIZED = True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def global_batch(mesh: Mesh, local_tree, batch_axis: str = "data"):
    """Assemble per-process local batch shards into global jax.Arrays.

    ``local_tree``: this process's slice of the batch (leading axis =
    local batch).  Every process must call this with the same structure
    and equal local batch sizes; the result is one global array whose
    leading axis is sharded over ``batch_axis`` across all hosts.
    Scalars / per-case metadata with a non-divisible leading axis are
    fully replicated (each host must then hold identical values).
    """
    sh = NamedSharding(mesh, P(batch_axis))
    rep = NamedSharding(mesh, P())

    def put(x):
        if x is None:
            return None
        arr = np.asarray(x)
        if arr.ndim >= 1:
            return jax.make_array_from_process_local_data(sh, arr)
        return jax.make_array_from_process_local_data(rep, arr)

    return jax.tree_util.tree_map(put, local_tree)
