"""Tester engine: per-case inference, metrics, NIfTI dumps.

reference: tester/Tester.py:9-45 — loads a saved model, freezes it, runs
batch-size-1 inference over a test loader, computing per-case measures and
saving outputs.  Here the model is rebuilt from the checkpoint's config
header and the per-case forward + measures run as one jitted device call.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stroke_prediction_tpu.data.dataset import (
    KEY_CASE_ID, KEY_GLOBAL, KEY_IMAGES, KEY_LABELS)
from stroke_prediction_tpu.models.factory import load_model
from stroke_prediction_tpu.utils.nifti import (
    dhw_to_xyz, save_nifti, zoom2x_inplane_xyz)


class Tester:
    """reference: tester/Tester.py."""

    def __init__(self, dataloader, path_model: str,
                 path_outputs_base: str = "/tmp/"):
        assert dataloader.batch_size == 1, \
            "You must ensure a batch size of 1 for correct case metric measures."
        self._dataloader = dataloader
        self._path_outputs_base = path_outputs_base
        self._model, self._variables = load_model(path_model)

    def _fn(self, case_id, type_: str, suffix: str = "") -> str:
        return (self._path_outputs_base + "_" + str(case_id) + str(type_)
                + str(suffix) + ".nii.gz")

    def _device_batch(self, batch) -> Dict[str, Optional[jnp.ndarray]]:
        return {k: (jnp.asarray(v) if batch.get(k) is not None else None)
                for k, v in batch.items() if k != KEY_CASE_ID}

    # subclass hooks ----------------------------------------------------
    def infer_batch(self, batch):
        raise NotImplementedError

    def save_inference(self, out, batch):
        pass

    def print_inference(self, batch, metrics, out=None):
        pass

    def run_inference(self):
        for batch in self._dataloader:
            metrics, out = self.infer_batch(batch)
            self.save_inference(out, batch)
            self.print_inference(batch, metrics, out)
