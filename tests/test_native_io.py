"""Native C++ NIfTI codec tests: cross-compatibility with the pure-Python
reader/writer (and nibabel semantics)."""

import numpy as np
import pytest

from stroke_prediction_tpu.utils import native_io
from stroke_prediction_tpu.utils.nifti import read_nifti, write_nifti

pytestmark = pytest.mark.skipif(not native_io.available(),
                                reason="libstroke_io.so not built")


class TestNativeNifti:
    def _vol(self):
        rng = np.random.RandomState(0)
        return rng.rand(9, 7, 5).astype(np.float32)

    def _affine(self):
        a = np.diag([2.0, 2.0, 5.0, 1.0]).astype(np.float32)
        a[:3, 3] = [1, 2, 3]
        return a

    def test_native_roundtrip_gz(self, tmp_path):
        vol, aff = self._vol(), self._affine()
        p = str(tmp_path / "n.nii.gz")
        assert native_io.write_nifti(p, vol, aff)
        data, a = native_io.read_nifti(p)
        np.testing.assert_allclose(data, vol, rtol=1e-6)
        np.testing.assert_allclose(a, aff, rtol=1e-6)

    def test_native_reads_python_written(self, tmp_path):
        vol, aff = self._vol(), self._affine()
        p = str(tmp_path / "p.nii.gz")
        write_nifti(p, vol, aff)
        data, a = native_io.read_nifti(p)
        np.testing.assert_allclose(data, vol, rtol=1e-6)
        np.testing.assert_allclose(a, aff, rtol=1e-6)

    def test_python_reads_native_written(self, tmp_path):
        vol, aff = self._vol(), self._affine()
        p = str(tmp_path / "n2.nii.gz")
        assert native_io.write_nifti(p, vol, aff)
        data, a = read_nifti(p)
        np.testing.assert_allclose(data, vol, rtol=1e-6)
        np.testing.assert_allclose(a, aff, rtol=1e-6)

    def test_plain_nii(self, tmp_path):
        vol = self._vol()
        p = str(tmp_path / "n3.nii")
        assert native_io.write_nifti(p, vol, None)
        data, a = native_io.read_nifti(p)
        np.testing.assert_allclose(data, vol, rtol=1e-6)
        np.testing.assert_allclose(a, np.eye(4), rtol=1e-6)

    def test_int16_scaled(self, tmp_path):
        # python writer emits int16; native reader applies slope/inter
        vol = (np.arange(24).reshape(2, 3, 4)).astype(np.int16)
        p = str(tmp_path / "i.nii.gz")
        write_nifti(p, vol)
        data, _ = native_io.read_nifti(p)
        np.testing.assert_allclose(data, vol.astype(np.float32))
