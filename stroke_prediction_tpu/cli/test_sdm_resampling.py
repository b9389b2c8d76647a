"""Signed-distance-map interpolation baseline driver.

reference: test_sdm_resampling.py:62-179 — per test case: signed EDTs of
core/penumbra (from U-Net segmentations or ground truth), optional 12x
latent downsample, linear SDM interpolation at the normalized
time-to-treatment, threshold at 0, binary measures, results appended to a
txt file, 4 NIfTI outputs at 2x in-plane zoom, optional visual inspection
figure.  The SDM computation itself runs on device (eval/sdm.py).
"""

import datetime
import os

import numpy as np

from stroke_prediction_tpu.cli.common import make_dataset
from stroke_prediction_tpu.data.dataset import (
    KEY_CASE_ID, KEY_GLOBAL, KEY_IMAGES, KEY_LABELS,
    LABEL_CORE, LABEL_LESION, LABEL_PENU, MOD_CBV,
    MOD_UNET_CORE, MOD_UNET_PENU)
from stroke_prediction_tpu.data.loader import get_testdata
from stroke_prediction_tpu.eval.metrics import binary_measures_host
from stroke_prediction_tpu.eval.sdm import sdm_interpolate
from stroke_prediction_tpu.utils.nifti import (
    dhw_to_xyz, save_nifti, zoom2x_inplane_xyz)
from stroke_prediction_tpu.utils.args import get_args_sdm


def infer(args):
    print("Evaluate validation set", args.fold)
    normalization_hours_penumbra = float(args.normalize)

    dataset = make_dataset(
        args, [MOD_UNET_CORE, MOD_UNET_PENU],
        [LABEL_CORE, LABEL_PENU, LABEL_LESION],
        flip_split_id=args.hemisflipid)
    ds_test = get_testdata(dataset, args.fold, seed=args.seed)

    results_txt = args.outbasepath + "_sdm_results.txt"

    for sample in ds_test:
        case_id = int(sample[KEY_CASE_ID][0])
        clinical = np.asarray(sample[KEY_GLOBAL])[0]
        to_to_ta, ta_to_tr = float(clinical[0]), float(clinical[1])
        normalization = normalization_hours_penumbra - to_to_ta
        time_to_treatment = ta_to_tr / normalization

        labels = np.asarray(sample[KEY_LABELS])[0]     # (D, H, W, 3)
        lesion = labels[..., 2]
        if args.groundtruth:
            core, penu = labels[..., 0], labels[..., 1]
        else:
            images = np.asarray(sample[KEY_IMAGES])[0]
            core, penu = images[..., 0], images[..., 1]

        (recon_core, recon_intp, recon_penu,
         latent_core, latent_intp, latent_penu) = map(np.asarray, sdm_interpolate(
            core, penu, time_to_treatment, threshold=0.5, zoom=12,
            resample=bool(args.downsample)))

        print(case_id, "TO-->TR", time_to_treatment)

        if args.visualinspection:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            zs = min(core.shape[0] - 1, 16)
            fig, axes = plt.subplots(3, 4)
            for row, (m, lat, rec, thr) in enumerate([
                    (core, latent_core, recon_core, recon_core < 0),
                    (lesion, latent_intp, recon_intp, recon_intp > 0),
                    (penu, latent_penu, recon_penu, recon_penu > 0)]):
                axes[row, 0].imshow(m[zs], cmap="gray", vmin=0, vmax=1)
                axes[row, 1].imshow(lat[zs], cmap="gray")
                axes[row, 2].imshow(rec[zs], cmap="gray")
                axes[row, 3].imshow(thr[zs], cmap="gray", vmin=0, vmax=1)
            fig.savefig(args.outbasepath + "_" + str(case_id)
                        + "_inspect.png", dpi=150)
            plt.close(fig)

        results = binary_measures_host((recon_intp > 0).astype(np.float32),
                                       lesion)
        c_res = binary_measures_host((recon_core < 0).astype(np.float32),
                                     core)
        p_res = binary_measures_host((recon_penu > 0).astype(np.float32),
                                     penu)

        with open(results_txt, "a") as f:
            print("Evaluate case: {} - DC:{:.3}, HD:{:.3}, ASSD:{:.3}, "
                  "Core recon DC:{:.3}, Penu recon DC:{:.3}".format(
                      case_id, results.dc, results.hd, results.assd,
                      c_res.dc, p_res.dc), file=f)

        idx = next((i for i in ds_test.indices
                    if dataset.case_id(i) == case_id), None)
        affine = dataset.affine(idx, MOD_CBV) if idx is not None else None

        def dump(vol_dhw, name, binarize):
            xyz = zoom2x_inplane_xyz(dhw_to_xyz(vol_dhw))
            if binarize == ">":
                xyz = (xyz > 0).astype(np.float32)
            elif binarize == "<":
                xyz = (xyz < 0).astype(np.float32)
            save_nifti(args.outbasepath + "_" + str(case_id) + name, xyz,
                       affine)

        dump(recon_intp, "_lesion.nii.gz", ">")
        dump(lesion.astype(np.float32), "_fuctgt.nii.gz", None)
        dump(recon_core, "_core.nii.gz", "<")
        dump(recon_penu, "_penu.nii.gz", ">")


if __name__ == "__main__":
    print(datetime.datetime.now())
    infer(get_args_sdm())
    print(datetime.datetime.now())
