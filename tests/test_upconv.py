"""upconv2x_cf numerics: forward and gradient parity vs the einsum
reference formulation (out[b,o,2d+a,2h+p,2w+q] = sum_i x*k)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_segmentation_project_tpu.ops.upconv import upconv2x_cf


def einsum_ref(x, k, b):
    bs, _, d, h, w = x.shape
    cout = k.shape[4]
    t = jnp.einsum("bidhw,apqio->bodahpwq", x, k)
    out = t.reshape(bs, cout, 2 * d, 2 * h, 2 * w)
    return out + b.reshape(1, -1, 1, 1, 1)


@pytest.mark.parametrize("bs,cin,cout,shape", [(1, 4, 8, (3, 5, 6)), (2, 8, 4, (4, 4, 4))])
def test_upconv_forward_matches_einsum(bs, cin, cout, shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(bs, cin) + shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 2, 2, cin, cout)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    got = upconv2x_cf(x, k, b)
    want = einsum_ref(x, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_upconv_grads_match_einsum():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 4, 3, 4, 5)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 2, 2, 4, 6)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(2, 6, 6, 8, 10)).astype(np.float32))

    def loss_new(x, k, b):
        return jnp.sum(upconv2x_cf(x, k, b) * ct)

    def loss_ref(x, k, b):
        return jnp.sum(einsum_ref(x, k, b) * ct)

    g_new = jax.grad(loss_new, argnums=(0, 1, 2))(x, k, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
    for a, bb in zip(g_new, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=1e-4, atol=1e-4)


def test_upconv_d2s_kernel_matches_einsum():
    """The Pallas depth-to-space forward (u32 W-pair packing, strided H
    stores) must match the einsum on bf16 inputs at supported shapes."""
    from multimodal_segmentation_project_tpu.ops.upconv import (
        _d2s_tiles, _upconv_forward_d2s,
    )

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 4, 8, 16)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    k = jnp.asarray(rng.normal(size=(2, 2, 2, 8, 4)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(4,)).astype(np.float32) * 0.1)
    tiles = _d2s_tiles(8, 4, 4, 8, 16)
    assert tiles is not None
    got = _upconv_forward_d2s(x, k, b, *tiles)
    want = einsum_ref(x.astype(jnp.float32), k, b)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=0.05, atol=0.05
    )


def test_upconv_bf16_compute():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 4)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    k = jnp.asarray(rng.normal(size=(2, 2, 2, 4, 8)).astype(np.float32))
    b = jnp.zeros((8,), jnp.float32)
    out = upconv2x_cf(x, k, b)
    assert out.dtype == jnp.bfloat16
    assert out.shape == (1, 8, 8, 8, 8)
    want = einsum_ref(x.astype(jnp.float32), k, b)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want), rtol=0.05, atol=0.05
    )

def test_d2s_tiles_respect_vmem_and_mosaic_limits():
    """Tile selection must model the kernel's limits, both learned from
    real 256^3 compile errors: the scoped-VMEM stack (the 256^3 deepest
    decoder level 256 -> 128 @ 16^3 overflowed the 16 MB limit by
    544 KB at TH=8) and Mosaic's second-minor block rule (TH must be
    8-divisible or equal to H, so there is no smaller legal TH there —
    that level falls back to the einsum)."""
    from multimodal_segmentation_project_tpu.ops.upconv import _d2s_tiles

    # 256^3 deepest level: TH=8 over VMEM budget, TH=4 Mosaic-illegal
    assert _d2s_tiles(256, 128, 16, 16, 16) is None
    # 192^3 deepest level (12^3): w % 8 gate keeps the einsum fallback
    assert _d2s_tiles(256, 128, 12, 12, 12) is None
    # mid levels keep the large tile
    assert _d2s_tiles(64, 32, 48, 48, 48) == (2, 8)
    assert _d2s_tiles(128, 64, 32, 32, 32) == (2, 8)
    # tiny H uses TH == H (block dim equal to array dim is legal)
    assert _d2s_tiles(16, 8, 4, 4, 16) == (2, 4)
    # H neither 8-divisible nor a whole-block candidate: no legal tile
    assert _d2s_tiles(16, 8, 6, 6, 16) is None
    # unsupported shapes still fall back
    assert _d2s_tiles(16, 8, 3, 8, 16) is None
    assert _d2s_tiles(16, 8, 4, 8, 130) is None
