"""On-device augmentation tests: determinism, probability gating, shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_segmentation_project_tpu.ops import augment


@pytest.fixture
def sample(rng):
    img = rng.uniform(0, 1, size=(1, 8, 8, 8)).astype(np.float32)
    lbl = rng.integers(0, 4, size=(8, 8, 8)).astype(np.int32)
    return jnp.array(img), jnp.array(lbl)


def test_deterministic_given_key(sample):
    img, lbl = sample
    key = jax.random.key(7)
    a1 = augment.augment_sample(key, img, lbl)
    a2 = augment.augment_sample(key, img, lbl)
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))
    np.testing.assert_array_equal(np.asarray(a1[1]), np.asarray(a2[1]))


def test_prob_zero_is_identity(sample):
    img, lbl = sample
    out_img, out_lbl = augment.augment_sample(jax.random.key(0), img, lbl, prob=0.0)
    np.testing.assert_allclose(np.asarray(out_img), np.asarray(img), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_lbl), np.asarray(lbl))


def test_prob_one_changes_image(sample):
    img, lbl = sample
    out_img, _ = augment.augment_sample(jax.random.key(0), img, lbl, prob=1.0)
    assert not np.allclose(np.asarray(out_img), np.asarray(img))


def test_shapes_preserved(sample):
    img, lbl = sample
    out_img, out_lbl = augment.augment_sample(jax.random.key(3), img, lbl, prob=1.0)
    assert out_img.shape == img.shape and out_lbl.shape == lbl.shape
    assert out_img.dtype == img.dtype and out_lbl.dtype == lbl.dtype


def test_bias_field_positive_multiplicative(sample):
    img, _ = sample
    out = augment.random_bias_field(jax.random.key(1), img)
    # field = exp(poly) is strictly positive and smooth; with 20 basis
    # terms and coeffs in [0, 0.1] the ratio is bounded by e^{+-2}.
    ratio = np.asarray(out) / np.maximum(np.asarray(img), 1e-6)
    mask = np.asarray(img) > 1e-3
    assert np.all(ratio[mask] > np.exp(-2.0))
    assert np.all(ratio[mask] < np.exp(2.0))


def test_gaussian_noise_statistics():
    img = jnp.zeros((1, 16, 16, 16))
    out = augment.random_gaussian_noise(jax.random.key(2), img, std=0.01)
    assert abs(float(jnp.std(out)) - 0.01) < 0.002


def test_contrast_preserves_range(sample):
    img, _ = sample
    out = augment.random_adjust_contrast(jax.random.key(4), img)
    assert float(jnp.min(out)) >= float(jnp.min(img)) - 1e-5
    assert float(jnp.max(out)) <= float(jnp.max(img)) + 1e-5


def test_histogram_shift_monotone(sample):
    img, _ = sample
    out = augment.random_histogram_shift(jax.random.key(5), img)
    # monotone remap preserves ordering
    flat_in = np.asarray(img).ravel()
    flat_out = np.asarray(out).ravel()
    order = np.argsort(flat_in)
    assert np.all(np.diff(flat_out[order]) >= -1e-5)


def test_coarse_dropout_zeroes_image_and_label():
    img = jnp.ones((1, 32, 32, 32))
    lbl = jnp.ones((32, 32, 32), jnp.int32)
    out_img, out_lbl = augment.random_coarse_dropout(jax.random.key(6), img, lbl)
    n_img_zero = int(jnp.sum(out_img == 0.0))
    n_lbl_zero = int(jnp.sum(out_lbl == 0))
    assert n_img_zero == n_lbl_zero  # same holes in both
    assert 16**3 <= n_img_zero <= 2 * 16**3  # 2 holes, may overlap


def test_batch_augment_per_sample_independent(rng):
    imgs = jnp.array(rng.uniform(0, 1, size=(2, 1, 8, 8, 8)).astype(np.float32))
    lbls = jnp.zeros((2, 8, 8, 8), jnp.int32)
    out_imgs, _ = augment.augment_batch(jax.random.key(8), imgs, lbls, prob=1.0)
    # the two samples get different random transforms
    d0 = np.asarray(out_imgs[0]) - np.asarray(imgs[0])
    d1 = np.asarray(out_imgs[1]) - np.asarray(imgs[1])
    assert not np.allclose(d0, d1)
