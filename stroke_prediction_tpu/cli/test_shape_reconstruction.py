"""Multi-model / multi-fold CAE shape-reconstruction evaluation.

reference: test_shape_reconstruction.py — for each (--path, --fold) pair:
batch-1 per-case metrics + NIfTI dumps via CaeReconstructionTester.
"""

import datetime

import argparse

from stroke_prediction_tpu.cli.common import make_dataset
from stroke_prediction_tpu.data.dataset import (
    LABEL_CORE, LABEL_LESION, LABEL_PENU, MOD_CBV, MOD_TTD)
from stroke_prediction_tpu.data.loader import get_testdata
from stroke_prediction_tpu.eval.cae_tester import CaeReconstructionTester
from stroke_prediction_tpu.utils.args import get_args_shape_testing


def test(args):
    pad = tuple(args.padding)
    for idx in range(len(args.path)):
        dataset = make_dataset(args, [MOD_CBV, MOD_TTD],
                               [LABEL_CORE, LABEL_PENU, LABEL_LESION],
                               pad=pad)
        ds_test = get_testdata(dataset, args.fold[idx], seed=args.seed)
        print("Size test set:", len(ds_test.indices),
              "| # batches:", len(ds_test))
        tester = CaeReconstructionTester(ds_test, args.path[idx],
                                         args.outbasepath, args.normalize)
        tester.run_inference()


if __name__ == "__main__":
    print(datetime.datetime.now())
    test(get_args_shape_testing())
    print(datetime.datetime.now())
