"""CAE evaluation with counterfactual time-curve analysis.

reference: test_shape_reconstruction_CurveAnalysis.py — per-fold
evaluation with fixed tA->tR steps 0-5 h plus relative and uniform
sweeps via CaeReconstructionTesterCurve.
"""

import datetime

from stroke_prediction_tpu.cli.common import make_dataset
from stroke_prediction_tpu.data.dataset import (
    LABEL_CORE, LABEL_LESION, LABEL_PENU, MOD_CBV, MOD_TTD)
from stroke_prediction_tpu.data.loader import get_testdata
from stroke_prediction_tpu.eval.cae_tester import (
    CaeReconstructionTesterCurve)
from stroke_prediction_tpu.utils.args import get_args_shape_testing


def test(args):
    assert len(args.fold) == len(args.path), (
        "You must provide as many --fold arguments as caepath model "
        "arguments in the exact same order!")
    steps = range(6)   # fixed tAdmission->tReca steps: 0-5 hrs
    pad = tuple(args.padding)
    for i, path in enumerate(args.path):
        print("Model " + path + " of fold " + str(i + 1) + "/"
              + str(len(args.fold)) + " with indices: " + str(args.fold[i]))
        dataset = make_dataset(args, [MOD_CBV, MOD_TTD],
                               [LABEL_CORE, LABEL_PENU, LABEL_LESION],
                               pad=pad)
        ds_test = get_testdata(dataset, args.fold[i], seed=args.seed)
        print("Size test set:", len(ds_test.indices),
              "| # batches:", len(ds_test))
        tester = CaeReconstructionTesterCurve(ds_test, path,
                                              args.outbasepath,
                                              args.normalize, steps)
        tester.run_inference()


if __name__ == "__main__":
    print(datetime.datetime.now())
    test(get_args_shape_testing())
    print(datetime.datetime.now())
