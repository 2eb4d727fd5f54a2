"""On-device stochastic augmentations, keyed by jax.random PRNG.

Behavioral parity with the reference's MONAI pipeline
(utils/dataloader.py:223-260 of fransiskusbudi/multimodal_segmentation_project),
each transform applied with probability 0.3 per sample:

  * RandBiasFieldd           -> random_bias_field (smooth multiplicative
                                exp(polynomial) field, degree 3, coeff 0.1)
  * RandGaussianNoised       -> random_gaussian_noise (std 0.01)
  * RandAdjustContrastd      -> random_adjust_contrast (gamma U[0.7, 1.5])
  * RandHistogramShiftd      -> random_histogram_shift (5 control points)
  * RandCoarseDropoutd       -> random_coarse_dropout (2 holes of 16^3,
                                fill 0, applied to image AND label)

TPU-first design: the reference runs these on the host CPU inside
DataLoader workers per sample; here they are pure jitted functions
executed on device inside the train step, so augmentation rides the
accelerator and is deterministic given the step PRNG key. All control
flow is branchless (lax.select on the probability draw) so XLA traces a
single static program. Layout is CHANNEL-FIRST (C, D, H, W) like the
rest of the framework (spatial dims minor -> no TPU lane padding).

These are behavioral (distribution-level) equivalents of the MONAI
transforms, not bit-exact ports.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

DEFAULT_PROB = 0.3


def _maybe(key, prob, img, fn):
    """Apply fn(img) with probability prob (branchless)."""
    apply = jax.random.uniform(key) < prob
    return jnp.where(apply, fn(img), img)


def _normalized_coords(shape):
    """Per-axis coordinate grids in [-1, 1], shape (D, H, W) each."""
    coords = []
    for ax, n in enumerate(shape):
        r = jnp.linspace(-1.0, 1.0, n)
        r = r.reshape([-1 if i == ax else 1 for i in range(len(shape))])
        coords.append(jnp.broadcast_to(r, shape))
    return coords


def random_bias_field(key, image, degree: int = 3, coeff_range=(0.0, 0.1)):
    """Smooth multiplicative bias field: img * exp(sum c_ijk x^i y^j z^k).

    Accumulated term-by-term so XLA fuses the whole polynomial into one
    elementwise kernel — a stacked (T, D, H, W) basis would materialize
    20 volume-sized buffers (2.2 GB at 192^3 fp32) and OOM the chip.
    """
    spatial = image.shape[1:]
    x, y, z = _normalized_coords(spatial)
    n_terms = sum(
        1
        for i in range(degree + 1)
        for j in range(degree + 1 - i)
        for _ in range(degree + 1 - i - j)
    )
    coeffs = jax.random.uniform(
        key, (n_terms,), minval=coeff_range[0], maxval=coeff_range[1]
    )
    field = jnp.zeros(spatial, image.dtype)
    t = 0
    for i in range(degree + 1):
        xi = x**i
        for j in range(degree + 1 - i):
            yj = y**j
            for k in range(degree + 1 - i - j):
                field = field + coeffs[t] * xi * yj * (z**k)
                t += 1
    return image * jnp.exp(field)[None]


def random_gaussian_noise(key, image, mean: float = 0.0, std: float = 0.01):
    return image + mean + std * jax.random.normal(key, image.shape)


def adjust_contrast(image, gamma):
    """Deterministic gamma adjustment on min-max normalized intensities
    (MONAI ``AdjustContrast`` semantics; golden-tested against MONAI in
    tests/test_golden_parity.py where the library exists)."""
    lo = jnp.min(image)
    rng = jnp.max(image) - lo
    eps = 1e-7
    norm = (image - lo) / (rng + eps)
    return jnp.power(norm, gamma) * (rng + eps) + lo


def random_adjust_contrast(key, image, gamma_range=(0.7, 1.5)):
    """Gamma adjustment with gamma ~ U[0.7, 1.5] (MONAI semantics)."""
    gamma = jax.random.uniform(key, minval=gamma_range[0], maxval=gamma_range[1])
    return adjust_contrast(image, gamma)


def apply_histogram_shift(image, dst):
    """Monotone piecewise-linear intensity remap with destination control
    points ``dst`` in [0, 1] (sources evenly span [min, max], as in
    MONAI's RandHistogramShift where reference points are a linspace).

    Evaluated segment-by-segment with compare/select instead of
    jnp.interp: interp's searchsorted+gather lowers to two ~100 ms
    volume-sized gather kernels on TPU, while the unrolled piecewise
    form (n_segments is 4) fuses into one elementwise pass. Golden-tested
    against np.interp, and against MONAI's own np.interp application
    where the library exists (tests/test_golden_parity.py).
    """
    dst = jnp.asarray(dst)
    lo = jnp.min(image)
    hi = jnp.max(image)
    span = hi - lo + 1e-7
    norm = jnp.clip((image - lo) / span, 0.0, 1.0)
    n_seg = dst.shape[0] - 1
    t = norm * n_seg
    shifted = jnp.zeros_like(norm)
    for k in range(n_seg):
        seg_val = dst[k] + (dst[k + 1] - dst[k]) * (t - k)
        in_seg = (t >= k) & (t < k + 1) if k < n_seg - 1 else (t >= k)
        shifted = jnp.where(in_seg, seg_val, shifted)
    return shifted * span + lo


def random_histogram_shift(key, image, num_control_points: int = 5):
    """Random monotone remap (MONAI semantics): destination points are
    sorted uniform draws with fixed 0/1 endpoints (monotone by
    construction)."""
    interior = jax.random.uniform(key, (num_control_points - 2,))
    dst = jnp.concatenate([jnp.zeros(1), jnp.sort(interior), jnp.ones(1)])
    return apply_histogram_shift(image, dst)


def random_coarse_dropout(
    key, image, label, holes: int = 2, hole_size=(16, 16, 16), fill_value: float = 0.0
):
    """Zero out ``holes`` random boxes in image AND label (MONAI RandCoarseDropoutd)."""
    spatial = image.shape[1:]
    keep = jnp.ones(spatial, dtype=bool)
    keys = jax.random.split(key, holes)
    for h in range(holes):
        ks = jax.random.split(keys[h], 3)
        inside = jnp.ones(spatial, dtype=bool)
        for ax in range(3):
            start = jax.random.randint(
                ks[ax], (), 0, max(spatial[ax] - hole_size[ax], 0) + 1
            )
            idx = jax.lax.broadcasted_iota(jnp.int32, spatial, ax)
            inside &= (idx >= start) & (idx < start + hole_size[ax])
        keep &= ~inside
    image = jnp.where(keep[None], image, fill_value)
    label = jnp.where(keep, label, jnp.array(int(fill_value), label.dtype))
    return image, label


@partial(jax.jit, static_argnames=("prob",))
def augment_sample(key, image, label, prob: float = DEFAULT_PROB):
    """Full reference augmentation pipeline for one (1,D,H,W)/(D,H,W) sample."""
    k = jax.random.split(key, 10)
    image = _maybe(k[0], prob, image, lambda im: random_bias_field(k[1], im))
    image = _maybe(k[2], prob, image, lambda im: random_gaussian_noise(k[3], im))
    image = _maybe(k[4], prob, image, lambda im: random_adjust_contrast(k[5], im))
    image = _maybe(k[6], prob, image, lambda im: random_histogram_shift(k[7], im))
    do_drop = jax.random.uniform(k[8]) < prob
    dropped_img, dropped_lbl = random_coarse_dropout(k[9], image, label)
    image = jnp.where(do_drop, dropped_img, image)
    label = jnp.where(do_drop, dropped_lbl, label)
    return image, label


def augment_batch(key, images, labels, prob: float = DEFAULT_PROB):
    """vmapped per-sample augmentation over the batch axis."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(lambda k, i, l: augment_sample(k, i, l, prob))(keys, images, labels)
