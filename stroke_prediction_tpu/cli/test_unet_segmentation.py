"""Full-volume U-Net evaluation on a held-out fold.

reference: test_unet_segmentation.py — fully-convolutional full-volume
inference (no patch transform), pad 20³, per-case Dice + NIfTI dumps.
"""

import datetime

from stroke_prediction_tpu.cli.common import make_dataset
from stroke_prediction_tpu.data.dataset import (
    LABEL_CORE, LABEL_PENU, MOD_CBV, MOD_TTD)
from stroke_prediction_tpu.data.loader import get_testdata
from stroke_prediction_tpu.eval.unet_tester import UnetSegmentationTester
from stroke_prediction_tpu.utils.args import get_args_unet_training


def test(args):
    pad = tuple(args.padding)
    dataset = make_dataset(args, [MOD_CBV, MOD_TTD],
                           [LABEL_CORE, LABEL_PENU], pad=pad)
    ds_test = get_testdata(dataset, args.fold, seed=args.seed)
    print("Size test set:", len(ds_test.indices),
          "| # batches:", len(ds_test))
    tester = UnetSegmentationTester(ds_test, args.unetpath,
                                    args.outbasepath, None)
    tester.run_inference()


if __name__ == "__main__":
    print(datetime.datetime.now())
    test(get_args_unet_training())
    print(datetime.datetime.now())
