"""max_pool2x_cf: forward parity with the XLA chain and backward
correctness of the Pallas (interpret off-TPU) + XLA-fallback VJPs.

Reference semantics: torch MaxPool3d(kernel=2, stride=2)
(models/unet.py:44-47 of fransiskusbudi/multimodal_segmentation_project);
tie gradients use equal shares (divergence documented in ops/pool.py).
"""

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_segmentation_project_tpu.models.unet3d import max_pool_cf
from multimodal_segmentation_project_tpu.ops.pool import (
    _bwd_tiles,
    max_pool2x_cf,
)


def test_forward_matches_xla_chain():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3, 8, 16, 48)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(max_pool2x_cf(x)), np.asarray(max_pool_cf(x))
    )


def test_backward_equal_shares_no_ties_matches_autodiff():
    # distinct values: gradient must equal the plain autodiff chain's
    rng = np.random.default_rng(1)
    x = jnp.asarray(
        rng.permutation(4 * 2 * 8 * 16 * 48).reshape(4, 2, 8, 16, 48).astype(np.float32)
    )
    assert _bwd_tiles(*x.shape[1:]) is not None  # exercises the kernel path
    g1 = jax.grad(lambda t: jnp.sum(max_pool2x_cf(t) ** 2))(x)
    g2 = jax.grad(lambda t: jnp.sum(max_pool_cf(t) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)


def test_backward_tie_equal_shares():
    # an all-equal window must split the cotangent 8 ways
    x = jnp.zeros((1, 1, 2, 2, 48), jnp.float32)
    g = jax.grad(lambda t: jnp.sum(max_pool2x_cf(t)))(x)
    w = np.asarray(g)[0, 0, :, :, :2]
    np.testing.assert_allclose(w, 0.125)


def test_backward_xla_fallback_small_width():
    # W < 48 gates the kernel out -> XLA fallback, same formula
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 2, 4, 4, 8)).astype(np.float32))
    assert _bwd_tiles(*x.shape[1:]) is None
    g1 = jax.grad(lambda t: jnp.sum(max_pool2x_cf(t) ** 2))(x)
    g2 = jax.grad(lambda t: jnp.sum(max_pool_cf(t) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)


def test_backward_bf16():
    rng = np.random.default_rng(3)
    x32 = rng.normal(size=(1, 4, 4, 8, 48)).astype(np.float32)
    x = jnp.asarray(x32).astype(jnp.bfloat16)
    g = jax.grad(lambda t: jnp.sum(max_pool2x_cf(t).astype(jnp.float32)))(x)
    # every window's gradient mass sums to 1 (sum the IN-window axes:
    # 3=D-inner, 5=H-inner, 7=W-inner of the (.., 2, 2, 4, 2, 24, 2) split)
    gs = np.asarray(g, np.float32).reshape(1, 4, 2, 2, 4, 2, 24, 2).sum(axis=(3, 5, 7))
    np.testing.assert_allclose(gs, 1.0, atol=0.05)  # dx rounds to bf16

def test_fwd_kernel_tie_and_bf16():
    """The Pallas forward (default where _fwd_tiles allows — A/B-measured
    win, docs/PERFORMANCE.md "Round 3 pool A/B") matches the XLA chain
    bit-exactly, including repeated values and bf16 inputs."""
    from multimodal_segmentation_project_tpu.ops.pool import _fwd_tiles

    assert _fwd_tiles(8, 16, 48) is not None
    assert _fwd_tiles(8, 16, 40) is None  # w < 48 keeps the XLA chain
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.integers(-3, 3, size=(1, 2, 4, 16, 64)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(max_pool2x_cf(x)), np.asarray(max_pool_cf(x))
    )
    xb = x.astype(jnp.bfloat16)
    out = max_pool2x_cf(xb)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(out, np.float32), np.asarray(max_pool_cf(xb), np.float32)
    )
