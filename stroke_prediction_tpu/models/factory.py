"""Model reconstruction from checkpoint config headers.

The reference pickles whole torch modules (``torch.save(model)``,
Learner.py:112-114) so testers can ``torch.load`` without knowing the
architecture.  Our checkpoints carry a JSON config header instead
(train/checkpoint.py); this factory rebuilds the matching flax module.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

from stroke_prediction_tpu.models.cae3d import (
    Cae3D, Cae3DCtp, Dec3D, Enc3D, Enc3DCtp, Enc3DStep)
from stroke_prediction_tpu.models.unet3d import LargeUnet3D, Unet3D


def build_model(config: Dict[str, Any]):
    kind = config["kind"]
    if kind == "unet3d":
        return Unet3D(channels=tuple(config["channels"]))
    if kind == "large_unet3d":
        return LargeUnet3D(channels=tuple(config["channels"]))
    if kind in ("cae3d", "cae3d_ctp"):
        ch = tuple(config["channels"])
        ng = config.get("n_ch_global", 5)
        if kind == "cae3d_ctp":
            enc = Enc3DCtp(channels=ch, n_ch_global=ng,
                           padding=tuple(config.get("padding", (20, 20, 20))))
            return Cae3DCtp(enc=enc, dec=Dec3D(channels=ch, n_ch_global=ng))
        enc_cls = Enc3DStep if config.get("step") else Enc3D
        return Cae3D(enc=enc_cls(channels=ch, n_ch_global=ng),
                     dec=Dec3D(channels=ch, n_ch_global=ng))
    if kind == "enc3d":
        return Enc3D(channels=tuple(config["channels"]),
                     n_ch_global=config.get("n_ch_global", 5))
    if kind == "enc3d_step":
        return Enc3DStep(channels=tuple(config["channels"]),
                         n_ch_global=config.get("n_ch_global", 5))
    raise ValueError(f"Unknown model kind: {kind}")


def load_model(path: str) -> Tuple[Any, Dict[str, Any]]:
    """Load a ``.model`` checkpoint -> (flax module, variables dict)."""
    from stroke_prediction_tpu.train.checkpoint import load_checkpoint
    state, config = load_checkpoint(path)
    if config is None:
        raise ValueError(f"Checkpoint {path} has no model config header")
    model = build_model(config)
    variables = {"params": state["params"],
                 "batch_stats": state.get("batch_stats", {})}
    return model, variables
