"""Shared CLI wiring: dataset construction and device mesh from args."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from stroke_prediction_tpu.data.dataset import (
    NiftiCaseProvider, StrokeDataset3D, SyntheticCaseProvider)

# The reference's institute-share defaults (common/data.py:32-33); only
# used when --datadir / --clinicalcsv are given or reachable.
DEFAULT_ROOT = "/share/data_zoe1/lucas/Linda_Segmentations"
DEFAULT_CSV = "/share/data_zoe1/lucas/Linda_Segmentations/clinical_cleaned.csv"


def make_provider(args):
    import os
    if args.synthetic or (args.datadir is None
                          and not os.path.isdir(DEFAULT_ROOT)):
        return SyntheticCaseProvider(
            n_cases=29, shape_xyz=(args.xyoriginal, args.xyoriginal,
                                   args.zsize), seed=args.seed,
            cache_dir="/tmp/stroke_tpu_synth_cache")
    root = args.datadir or DEFAULT_ROOT
    csv = args.clinicalcsv or DEFAULT_CSV
    return NiftiCaseProvider(root, csv)


def make_dataset(args, modalities: Sequence[str], labels: Sequence[str],
                 flip_split_id: Optional[float] = None,
                 pad: Optional[Tuple[int, int, int]] = None,
                 provider=None) -> StrokeDataset3D:
    if provider is None:
        provider = make_provider(args)
    resample = args.xyresample if args.xyresample != 1 else None
    return StrokeDataset3D(provider, modalities, labels, resample=resample,
                           flip_split_id=flip_split_id, pad=pad)


def make_mesh(args):
    if getattr(args, "distributed", False):
        # multi-host: bring up the JAX distributed runtime FIRST so
        # jax.devices() below is the global (all-host) device list
        from stroke_prediction_tpu.parallel.distributed import initialize
        initialize(coordinator_address=args.coordinator,
                   num_processes=args.nprocs, process_id=args.procid)
        import jax
        from stroke_prediction_tpu.parallel.mesh import make_data_mesh
        # --ndevices defaults to 1; in a multi-host run the mesh must
        # span the GLOBAL device list unless explicitly overridden
        n = getattr(args, "ndevices", 1)
        if n <= 1:
            n = len(jax.devices())
        return make_data_mesh(n)
    if getattr(args, "ndevices", 1) <= 1:
        return None
    from stroke_prediction_tpu.parallel.mesh import make_data_mesh
    return make_data_mesh(args.ndevices)
