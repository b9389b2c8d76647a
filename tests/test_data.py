"""Data pipeline tests: fold split semantics, synthetic dataset geometry,
on-device augmentation, NIfTI round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stroke_prediction_tpu.data.augment import (
    elastic_deform_batch, random_hemispheric_flip, random_patch)
from stroke_prediction_tpu.data.dataset import (
    KEY_CASE_ID, KEY_GLOBAL, KEY_IMAGES, KEY_LABELS,
    LABEL_CORE, LABEL_LESION, LABEL_PENU, MOD_CBV, MOD_TTD,
    StrokeDataset3D, SyntheticCaseProvider)
from stroke_prediction_tpu.data.loader import (
    BatchLoader, fold_split, get_testdata)


class TestFoldSplit:
    def test_split_fractions(self):
        # reference semantics (common/data.py:113-147): valid = first
        # floor(valid_size*n) of the shuffled fold
        train, valid = fold_split(29, range(29), 0.275, seed=4)
        assert len(valid) == int(np.floor(0.275 * 29))
        assert len(train) + len(valid) == 29
        assert set(train).isdisjoint(valid)

    def test_deterministic_given_seed(self):
        t1, v1 = fold_split(29, range(20), 0.5, seed=4)
        t2, v2 = fold_split(29, range(20), 0.5, seed=4)
        assert t1 == t2 and v1 == v2
        t3, _ = fold_split(29, range(20), 0.5, seed=5)
        assert t1 != t3

    def test_indices_intersected_with_range(self):
        train, valid = fold_split(10, [5, 8, 25, 3], 0.0, seed=0)
        assert sorted(train + valid) == [3, 5, 8]


class TestSyntheticDataset:
    def _dataset(self, **kw):
        provider = SyntheticCaseProvider(n_cases=4, shape_xyz=(32, 32, 16),
                                         seed=4)
        return StrokeDataset3D(provider, [MOD_CBV, MOD_TTD],
                               [LABEL_CORE, LABEL_PENU, LABEL_LESION], **kw)

    def test_sample_layout(self):
        ds = self._dataset()
        s = ds.sample(0)
        assert s[KEY_IMAGES].shape == (16, 32, 32, 2)    # (D, H, W, C)
        assert s[KEY_LABELS].shape == (16, 32, 32, 3)
        assert s[KEY_GLOBAL].shape == (5,)

    def test_core_inside_penumbra_inside(self):
        ds = self._dataset()
        s = ds.sample(1)
        core = s[KEY_LABELS][..., 0] > 0.5
        penu = s[KEY_LABELS][..., 1] > 0.5
        lesion = s[KEY_LABELS][..., 2] > 0.5
        assert core.sum() > 0 and penu.sum() > core.sum()
        assert np.all(core <= penu)            # core ⊆ penumbra
        assert np.all(core <= lesion)          # core ⊆ lesion
        assert np.all(lesion <= penu)          # lesion ⊆ penumbra

    def test_resample_and_pad(self):
        ds = self._dataset(resample=0.5, pad=(3, 3, 3))
        s = ds.sample(0)
        assert s[KEY_IMAGES].shape == (22, 22, 22, 2)    # 16+6, 16+6, 16+6
        assert s[KEY_LABELS].shape == (16, 16, 16, 3)    # labels unpadded

    def test_fixed_flip_applied_above_split_id(self):
        provider = SyntheticCaseProvider(n_cases=4, shape_xyz=(32, 32, 16),
                                         seed=4)
        plain = StrokeDataset3D(provider, [MOD_CBV], [LABEL_CORE])
        flipped = StrokeDataset3D(provider, [MOD_CBV], [LABEL_CORE],
                                  flip_split_id=2)
        s3p = plain.sample(3)[KEY_IMAGES]
        s3f = flipped.sample(3)[KEY_IMAGES]
        np.testing.assert_array_equal(s3f, s3p[:, :, ::-1])   # W axis flip
        s1p = plain.sample(1)[KEY_IMAGES]
        s1f = flipped.sample(1)[KEY_IMAGES]
        np.testing.assert_array_equal(s1f, s1p)

    def test_stack_and_loader(self):
        ds = self._dataset()
        loader = BatchLoader(ds, [0, 1, 2, 3], batch_size=2, seed=0)
        batches = list(loader)
        assert len(batches) == 2
        assert batches[0][KEY_IMAGES].shape == (2, 16, 32, 32, 2)

    def test_testdata_batch1(self):
        ds = self._dataset()
        loader = get_testdata(ds, [1, 3], seed=0)
        assert loader.batch_size == 1
        assert sorted(loader.indices) == [1, 3]


class TestAugment:
    def test_random_flip_flips_both(self):
        key = jax.random.PRNGKey(3)
        imgs = jnp.arange(2 * 4 * 4 * 6 * 1, dtype=jnp.float32).reshape(
            2, 4, 4, 6, 1)
        labs = imgs + 100
        fi, fl = random_hemispheric_flip(key, imgs, labs)
        # each sample either fully flipped or untouched, consistently
        for b in range(2):
            flipped = bool(jnp.all(fi[b] == jnp.flip(imgs[b], axis=-2)))
            same = bool(jnp.all(fi[b] == imgs[b]))
            assert flipped or same
            if flipped:
                assert bool(jnp.all(fl[b] == jnp.flip(labs[b], axis=-2)))

    def test_random_patch_alignment(self):
        # label patch must be the valid-conv center of the image patch
        key = jax.random.PRNGKey(0)
        full = jnp.arange(1 * 12 * 12 * 12, dtype=jnp.float32).reshape(
            1, 12, 12, 12, 1)
        pad = (2, 2, 2)
        # images padded by 2 relative to labels:
        labels = full[:, 2:-2, 2:-2, 2:-2, :]
        imgs, labs = random_patch(key, full, labels, (8, 8, 8), pad)
        assert imgs.shape == (1, 8, 8, 8, 1)
        assert labs.shape == (1, 4, 4, 4, 1)
        # the label patch equals the center crop of the image patch
        np.testing.assert_array_equal(
            np.asarray(labs[0]), np.asarray(imgs[0, 2:-2, 2:-2, 2:-2]))

    def test_elastic_batch_shapes_and_determinism(self):
        key = jax.random.PRNGKey(1)
        labs = jnp.zeros((2, 8, 16, 16, 3)).at[:, 2:5, 4:10, 4:10, :].set(1.0)
        imgs = jnp.ones((2, 8, 16, 16, 2))
        l1, i1 = elastic_deform_batch(key, labs, imgs, apply_to_images=True)
        l2, i2 = elastic_deform_batch(key, labs, imgs, apply_to_images=True)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        assert l1.shape == labs.shape and i1.shape == imgs.shape
        # per-sample fields differ
        assert not np.allclose(np.asarray(l1[0]), np.asarray(l1[1]))

    def test_elastic_images_untouched_by_default(self):
        key = jax.random.PRNGKey(2)
        labs = jnp.zeros((1, 8, 12, 12, 1)).at[0, 3:5, 4:8, 4:8, 0].set(1.0)
        imgs = jnp.ones((1, 8, 12, 12, 2)) * 7
        _, i_out = elastic_deform_batch(key, labs, imgs,
                                        apply_to_images=False)
        np.testing.assert_array_equal(np.asarray(i_out), np.asarray(imgs))


class TestNifti:
    def test_roundtrip(self, tmp_path):
        from stroke_prediction_tpu.utils.nifti import read_nifti, write_nifti
        rng = np.random.RandomState(0)
        vol = rng.rand(9, 7, 5).astype(np.float32)
        affine = np.diag([2.0, 2.0, 5.0, 1.0]).astype(np.float32)
        affine[:3, 3] = [1, 2, 3]
        p = str(tmp_path / "x.nii.gz")
        write_nifti(p, vol, affine)
        data, aff = read_nifti(p)
        np.testing.assert_allclose(data, vol, rtol=1e-6)
        np.testing.assert_allclose(aff, affine, rtol=1e-6)

    def test_uint8_plain_nii(self, tmp_path):
        from stroke_prediction_tpu.utils.nifti import read_nifti, write_nifti
        vol = (np.random.RandomState(1).rand(4, 4, 4) > 0.5).astype(np.uint8)
        p = str(tmp_path / "y.nii")
        write_nifti(p, vol)
        data, _ = read_nifti(p)
        np.testing.assert_array_equal(data, vol)
