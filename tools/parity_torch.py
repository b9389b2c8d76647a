"""Torch-CPU side of the Dice-parity protocol (BASELINE.json: "Dice parity
±0.005 across folds").

An independent modern-PyTorch implementation of the reference's training
configurations (NOT a copy of the torch-0.3 reference code), run on the
same synthetic 29-case dataset, folds, seeds, and hyperparameters as the
JAX framework, so per-fold validation Dice can be compared side by side.

Mirrored configuration (see the reference for the originals):
  * unet — 3-scale valid-conv U-Net, Dice loss, Adam(1e-3, (0.99, 0.999),
    wd 1e-5), batch 6, random 104x104x68 patches
    (reference: train_unet_segmentation.py, learner/UnetSegmentationLearner.py)
  * cae — Enc3D/Dec3D shape autoencoder, curriculum loss with monotonicity
    hinges + latent-consistency ramp, Adam β₁ warm-ramp, batch 4,
    random-flip + elastic-deformation augmentation
    (reference: train_shape_reconstruction.py,
    learner/CaeReconstructionLearner.py)

Data comes from the same host-side pipeline as the JAX framework
(stroke_prediction_tpu.data), so both sides see byte-identical cached
volumes; augmentation is distribution-matched (not bitstream-matched).

Outputs the same curves-JSON schema as the JAX Learner
({"training": [...], "validate": [...]}) for tools/parity_report.py.

Run (CPU):
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/parity_torch.py \
      --config unet --epochs 35 --fold 0 1 ... --out /tmp/parity/unet_t.json
"""

import argparse
import json
import os
import sys
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# --------------------------------------------------------------------- data

def build_dataset(config: str, seed: int, xyoriginal: int = 256,
                  zsize: int = 28):
    from stroke_prediction_tpu.data.dataset import (
        LABEL_CORE, LABEL_LESION, LABEL_PENU, MOD_CBV, MOD_TTD,
        StrokeDataset3D, SyntheticCaseProvider)

    provider = SyntheticCaseProvider(
        n_cases=29, shape_xyz=(xyoriginal, xyoriginal, zsize), seed=seed,
        cache_dir="/tmp/stroke_tpu_synth_cache" if xyoriginal == 256
        else None)
    if config == "unet":
        return StrokeDataset3D(provider, [MOD_CBV, MOD_TTD],
                               [LABEL_CORE, LABEL_PENU], resample=0.5,
                               flip_split_id=15, pad=(20, 20, 20))
    return StrokeDataset3D(provider, [MOD_CBV, MOD_TTD],
                           [LABEL_CORE, LABEL_PENU, LABEL_LESION],
                           resample=0.5, flip_split_id=15, pad=None)


# ------------------------------------------------------------------- models

class UnetBlock(nn.Module):
    """Double BN -> Conv3d(3, valid) -> LeakyReLU(0.01)."""

    def __init__(self, c_in, c_out):
        super().__init__()
        self.bn1 = nn.BatchNorm3d(c_in)
        self.conv1 = nn.Conv3d(c_in, c_out, 3)
        self.bn2 = nn.BatchNorm3d(c_out)
        self.conv2 = nn.Conv3d(c_out, c_out, 3)

    def forward(self, x):
        x = F.leaky_relu(self.conv1(self.bn1(x)), 0.01)
        x = F.leaky_relu(self.conv2(self.bn2(x)), 0.01)
        return x


def center_crop(x, target_dhw):
    sl = [slice(None), slice(None)]
    for ax, t in zip((2, 3, 4), target_dhw):
        start = (x.shape[ax] - t) // 2
        sl.append(slice(start, start + t))
    return x[tuple(sl)]


class TorchUnet3D(nn.Module):
    def __init__(self, channels=(2, 16, 32, 64, 32, 16, 32, 2)):
        super().__init__()
        cin, b1, b2, b3, b4, b5, bc, ncls = channels
        self.block1 = UnetBlock(cin, b1)
        self.block2 = UnetBlock(b1, b2)
        self.block3 = UnetBlock(b2, b3)
        self.block4 = UnetBlock(b3 + b2, b4)
        self.block5 = UnetBlock(b4 + b1, b5)
        self.head1 = nn.Conv3d(b5, bc, 1)
        self.head2 = nn.Conv3d(bc, ncls, 1)

    def forward(self, x):
        r1 = self.block1(x)
        r2 = self.block2(F.max_pool3d(r1, 2))
        r3 = self.block3(F.max_pool3d(r2, 2))
        u3 = F.interpolate(r3, scale_factor=2, mode="trilinear",
                           align_corners=True)
        r4 = self.block4(torch.cat([u3, center_crop(r2, u3.shape[2:])], 1))
        u4 = F.interpolate(r4, scale_factor=2, mode="trilinear",
                           align_corners=True)
        r5 = self.block5(torch.cat([u4, center_crop(r1, u4.shape[2:])], 1))
        h = F.leaky_relu(self.head1(r5), 0.01)
        return torch.sigmoid(self.head2(h))


class TorchEnc3D(nn.Module):
    """10-conv encoder with z-only padding + 3 stride-2 downsamples."""

    def __init__(self, channels):
        super().__init__()
        cin, origin, d2, d4, d8, fc = channels[:6]

        def bca(ci, co, stride=1, pad=(1, 0, 0)):
            return nn.ModuleDict({
                "bn": nn.BatchNorm3d(ci),
                "conv": nn.Conv3d(ci, co, 3, stride=stride, padding=pad)})

        self.layers = nn.ModuleList([
            bca(cin, origin), bca(origin, origin),
            bca(origin, d2, stride=2, pad=(1, 1, 1)),
            bca(d2, d2), bca(d2, d2),
            bca(d2, d4, stride=2, pad=(1, 1, 1)),
            bca(d4, d4), bca(d4, d4),
            bca(d4, d8, stride=2, pad=0),
            bca(d8, fc, pad=0),
        ])

    def forward(self, x):
        for layer in self.layers:
            x = F.elu(layer["conv"](layer["bn"](x)))
        return x


class TorchDec3D(nn.Module):
    """14-layer mirrored decoder."""

    def __init__(self, channels):
        super().__init__()
        _, origin, d2, d4, d8, fc = channels[:6]
        ncls = channels[-1]
        self.bns = nn.ModuleList([nn.BatchNorm3d(c) for c in
                                  (fc, d8, d4, d4, d2, d2, d2, origin,
                                   origin, origin, origin)])
        self.ops = nn.ModuleList([
            nn.ConvTranspose3d(fc, d8, 3, 1),
            nn.ConvTranspose3d(d8, d4, 3, 2),
            nn.Conv3d(d4, d4, 3, padding=(1, 2, 2)),
            nn.Conv3d(d4, d2, 3, padding=(1, 2, 2)),
            nn.ConvTranspose3d(d2, d2, 2, 2),
            nn.Conv3d(d2, d2, 3, padding=(1, 2, 2)),
            nn.Conv3d(d2, origin, 3, padding=(1, 2, 2)),
            nn.ConvTranspose3d(origin, origin, 2, 2),
            nn.Conv3d(origin, origin, 3, padding=(1, 2, 2)),
            nn.Conv3d(origin, origin, 3, padding=(1, 2, 2)),
            nn.Conv3d(origin, origin, 1),
        ])
        self.bn_out = nn.BatchNorm3d(origin)
        self.head = nn.Conv3d(origin, ncls, 1)

    def forward(self, z):
        x = z
        for bn, op in zip(self.bns, self.ops):
            x = F.elu(op(bn(x)))
        return torch.sigmoid(self.head(self.bn_out(x)))


# ------------------------------------------------------------------- losses

def dice_loss(o, t, eps=1e-7):
    """Soft Dice over the flattened batch (reference: common/metrics.py:8-28)."""
    o, t = o.reshape(-1), t.reshape(-1)
    inter = (o * t).sum()
    denom = (o * o).sum() + (t * t).sum()
    return 1.0 - (2 * inter + eps) / (denom + eps)


def hinge(diff):
    return (diff.abs() - diff).mean()


def binary_dc(o, t, thr=0.5):
    r = (o > thr).float().reshape(-1)
    g = (t > thr).float().reshape(-1)
    tp = (r * g).sum()
    denom = r.sum() + g.sum()
    return float(2 * tp / denom) if denom > 0 else 0.0


# ------------------------------------------------------------- augmentation

def random_patch_np(rs, images, labels, patch_whd, pad_xyz):
    """Numpy mirror of data/augment.py random_patch (B, D, H, W, C)."""
    w, h, d = patch_whd
    px, py, pz = pad_xyz
    b, sd, sh, sw = images.shape[:4]
    imgs, labs = [], []
    for i in range(b):
        od = rs.randint(0, sd - d + 1)
        oh = rs.randint(0, sh - h + 1)
        ow = rs.randint(0, sw - w + 1)
        imgs.append(images[i, od:od + d, oh:oh + h, ow:ow + w])
        labs.append(labels[i, od:od + d - 2 * pz, oh:oh + h - 2 * py,
                           ow:ow + w - 2 * px])
    return np.stack(imgs), np.stack(labs)


def random_flip_np(rs, labels):
    out = labels.copy()
    for i in range(labels.shape[0]):
        if rs.rand() < 0.5:
            out[i] = out[i, :, :, ::-1]
    return out


def elastic_np(rs, labels, alpha=100.0, sigma=4.0, z_scale=0.22):
    """Simard-2003 elastic deformation, field shared across channels
    (reference: common/data.py:313-351)."""
    from scipy.ndimage import gaussian_filter, map_coordinates
    b, d, h, w, c = labels.shape
    out = np.empty_like(labels)

    def field(scale):
        return gaussian_filter(rs.rand(d, h, w) * 2 - 1, sigma,
                               mode="constant", cval=0.0) * alpha * scale

    for i in range(b):
        dz, dy, dx = field(z_scale), field(1.0), field(1.0)
        gz, gy, gx = np.meshgrid(np.arange(d), np.arange(h), np.arange(w),
                                 indexing="ij")
        coords = [(gz + dz).ravel(), (gy + dy).ravel(), (gx + dx).ravel()]
        for ch in range(c):
            out[i, ..., ch] = map_coordinates(
                labels[i, ..., ch], coords, order=1).reshape(d, h, w)
    return out


def to_torch(x):
    """(B, D, H, W, C) numpy -> (B, C, D, H, W) torch."""
    return torch.from_numpy(np.ascontiguousarray(
        np.moveaxis(x, -1, 1))).float()


# ----------------------------------------------------------------- training

def train_unet(args, ds_train, ds_valid):
    model = TorchUnet3D(tuple(args.channels))
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, betas=(0.99, 0.999),
                           weight_decay=1e-5)
    rs = np.random.RandomState(args.seed + 100)
    curves = {"training": [], "validate": []}
    patch, pad = (104, 104, 68), (20, 20, 20)
    start = _load_ckpt(args, [model], opt, rs, [ds_train, ds_valid], curves)

    for epoch in range(start, args.epochs):
        t0 = time.time()
        lr = _epoch_lr(args, epoch)
        for g in opt.param_groups:
            g["lr"] = lr
        for phase, loader, training in (("training", ds_train, True),
                                        ("validate", ds_valid, False)):
            model.train(training)
            tot = {"loss": 0.0, "core_dc": 0.0, "penu_dc": 0.0}
            n = 0
            for batch in loader:
                imgs, labs = random_patch_np(rs, batch["images"],
                                             batch["labels"], patch, pad)
                x, y = to_torch(imgs), to_torch(labs)
                with torch.set_grad_enabled(training):
                    seg = model(x)
                    loss = (dice_loss(seg[:, 0], y[:, 0])
                            + dice_loss(seg[:, 1], y[:, 1])) / 2
                if training:
                    opt.zero_grad()
                    loss.backward()
                    opt.step()
                tot["loss"] += float(loss)
                tot["core_dc"] += binary_dc(seg[:, 0], y[:, 0])
                tot["penu_dc"] += binary_dc(seg[:, 1], y[:, 1])
                n += 1
            curves[phase].append({k: v / n for k, v in tot.items()})
        m = curves["validate"][-1]
        print(f"Epoch {epoch + 1}/{args.epochs} "
              f"val loss {m['loss']:.3f} core {m['core_dc']:.3f} "
              f"penu {m['penu_dc']:.3f} ({time.time() - t0:.0f}s)",
              flush=True)
        save_curves(args.out, curves)
        _save_ckpt(args, epoch + 1, [model], opt, rs,
                   [ds_train, ds_valid], curves)
    return curves


def train_cae(args, ds_train, ds_valid):
    channels = tuple(args.channelscae)
    enc, dec = TorchEnc3D(channels), TorchDec3D(channels)
    params = list(enc.parameters()) + list(dec.parameters())
    opt = torch.optim.Adam(params, lr=1e-3, betas=(0.9, 0.999),
                           weight_decay=1e-5)
    rs = np.random.RandomState(args.seed + 100)
    curves = {"training": [], "validate": []}
    start = _load_ckpt(args, [enc, dec], opt, rs, [ds_train, ds_valid],
                       curves)

    def forward(labels_np, clinical_np, training):
        y = to_torch(labels_np)
        core_gt, penu_gt, lesion_gt = y[:, 0:1], y[:, 1:2], y[:, 2:3]
        clin = torch.from_numpy(clinical_np).float()
        t = (clin[:, 1:2] / (10.0 - clin[:, 0:1])).view(-1, 1, 1, 1, 1)
        z_core, z_penu = enc(core_gt), enc(penu_gt)
        z_lesion = enc(lesion_gt)
        z_interp = z_core + t * (z_penu - z_core)
        return (dec(z_core), dec(z_penu), dec(z_lesion), dec(z_interp),
                core_gt, penu_gt, lesion_gt, z_interp, z_lesion)

    for epoch in range(start, args.epochs):
        t0 = time.time()
        # β₁ warm-ramp (reference: CaeReconstructionLearner.py:28-40)
        b1 = 0.9 - 0.1 * (4 - epoch) if epoch < 4 else 0.9
        lr = _epoch_lr(args, epoch)
        for g in opt.param_groups:
            g["betas"] = (b1, 0.999)
            g["lr"] = lr
        factor = min(0.04 * max(0, epoch - 25), 1)
        for phase, loader, training in (("training", ds_train, True),
                                        ("validate", ds_valid, False)):
            enc.train(training)
            dec.train(training)
            tot = {"loss": 0.0, "lesion_dc": 0.0, "core_dc": 0.0,
                   "penu_dc": 0.0}
            n = 0
            for batch in loader:
                labs = batch["labels"]
                if training:
                    labs = elastic_np(rs, random_flip_np(rs, labs))
                with torch.set_grad_enabled(training):
                    (rc, rp, rl, ri, gc, gp, gl, zi, zl) = forward(
                        labs, batch["clinical"], training)
                    loss = (hinge(rp - ri) + hinge(rp - rc)
                            + dice_loss(rc, gc) + dice_loss(rp, gp)
                            + dice_loss(rl, gl)
                            + factor * (zi - zl).abs().mean()) / (5 + factor)
                if training:
                    opt.zero_grad()
                    loss.backward()
                    opt.step()
                tot["loss"] += float(loss)
                tot["lesion_dc"] += binary_dc(ri, gl)
                tot["core_dc"] += binary_dc(rc, gc)
                tot["penu_dc"] += binary_dc(rp, gp)
                n += 1
            curves[phase].append({k: v / n for k, v in tot.items()})
        m = curves["validate"][-1]
        print(f"Epoch {epoch + 1}/{args.epochs} "
              f"val loss {m['loss']:.3f} lesion {m['lesion_dc']:.3f} "
              f"core {m['core_dc']:.3f} penu {m['penu_dc']:.3f} "
              f"({time.time() - t0:.0f}s)", flush=True)
        save_curves(args.out, curves)
        _save_ckpt(args, epoch + 1, [enc, dec], opt, rs,
                   [ds_train, ds_valid], curves)
    return curves


def _epoch_lr(args, epoch: int, base_lr: float = 1e-3,
              gamma: float = 0.1) -> float:
    """MultiStepLR equivalent, same formula as the JAX side's
    ``multistep_lr`` (train/optim.py): lr = base * gamma^#{m <= epoch}."""
    steps = getattr(args, "lrsteps", None) or []
    return base_lr * gamma ** sum(1 for m in steps if m <= epoch)


def save_curves(path, curves):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(curves, f)


# ---------------------------------------------------------- resume support

def _ckpt_path(args) -> str:
    return args.ckpt or (args.out + ".ckpt")


def _save_ckpt(args, epoch_done, modules, opt, rs, loaders, curves):
    """Snapshot everything the epoch loop consumes (model/opt params,
    every RNG stream) so a killed run resumes on the exact trajectory."""
    path = _ckpt_path(args)
    tmp = path + ".tmp"
    torch.save({
        "epoch_done": epoch_done,
        "models": [m.state_dict() for m in modules],
        "opt": opt.state_dict(),
        "np_rs": rs.get_state(),
        "torch_rng": torch.get_rng_state(),
        "loader_rs": [ld._rs.get_state() for ld in loaders],
        "curves": curves,
    }, tmp)
    os.replace(tmp, path)


def _load_ckpt(args, modules, opt, rs, loaders, curves):
    """Restore a snapshot if one exists; returns the first epoch to run."""
    path = _ckpt_path(args)
    if not os.path.exists(path):
        return 0
    state = torch.load(path, weights_only=False)
    for m, sd in zip(modules, state["models"]):
        m.load_state_dict(sd)
    opt.load_state_dict(state["opt"])
    rs.set_state(state["np_rs"])
    torch.set_rng_state(state["torch_rng"])
    for ld, s in zip(loaders, state["loader_rs"]):
        ld._rs.set_state(s)
    curves.clear()
    curves.update(state["curves"])
    print(f"resumed from {path} at epoch {state['epoch_done']}", flush=True)
    return state["epoch_done"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", choices=["unet", "cae"], required=True)
    p.add_argument("--epochs", type=int, default=35)
    p.add_argument("--fold", type=int, nargs="+",
                   default=list(range(29)))
    p.add_argument("--validsetsize", type=float, default=0.275)
    p.add_argument("--seed", type=int, default=4)
    p.add_argument("--batchsize", type=int, default=None)
    p.add_argument("--channels", type=int, nargs="+",
                   default=[2, 16, 32, 64, 32, 16, 32, 2])
    p.add_argument("--channelscae", type=int, nargs="+",
                   default=[1, 16, 24, 32, 100, 200, 1])
    p.add_argument("--xyoriginal", type=int, default=256)
    p.add_argument("--zsize", type=int, default=28)
    p.add_argument("--lrsteps", type=int, nargs="*", default=None,
                   help="MultiStepLR epoch milestones (gamma 0.1), the "
                        "reference's --lrsteps (util.py:54)")
    p.add_argument("--out", required=True)
    p.add_argument("--ckpt", default=None,
                   help="resume checkpoint path (default: <out>.ckpt)")
    args = p.parse_args()

    torch.manual_seed(args.seed)
    from stroke_prediction_tpu.data.loader import (
        get_stroke_shape_training_data)

    batch = args.batchsize or (6 if args.config == "unet" else 4)
    ds = build_dataset(args.config, args.seed, args.xyoriginal, args.zsize)
    dl_train, dl_valid = get_stroke_shape_training_data(
        ds, args.fold, args.validsetsize, seed=args.seed, batchsize=batch)
    print(f"torch parity {args.config}: train {len(dl_train.indices)} "
          f"valid {len(dl_valid.indices)} batch {batch}", flush=True)
    if args.config == "unet":
        train_unet(args, dl_train, dl_valid)
    else:
        train_cae(args, dl_train, dl_valid)
    print("PARITY_TORCH_DONE")


if __name__ == "__main__":
    main()
