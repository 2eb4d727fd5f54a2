"""Pallas channel-first conv kernel: parity vs the XLA reference
(interpret mode on CPU; the same kernels compile to Mosaic on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_segmentation_project_tpu.ops import pallas_conv as pc


@pytest.fixture
def case(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 6, 8, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 8)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(8,)) * 0.1, jnp.float32)
    return x, w, b


def test_forward_parity(case):
    x, w, b = case
    out = pc.conv3x3x3_cf(x, w, b)
    ref = pc.conv3x3x3_cf_reference(x, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_gradient_parity(case):
    x, w, b = case
    loss_p = lambda x, w, b: jnp.sum(pc.conv3x3x3_cf(x, w, b) ** 2)
    loss_r = lambda x, w, b: jnp.sum(pc.conv3x3x3_cf_reference(x, w, b) ** 2)
    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, w, b)
    for name, a, r in zip(("dx", "dw", "db"), gp, gr):
        scale = max(float(jnp.max(jnp.abs(r))), 1.0)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(r) / scale, atol=2e-4, err_msg=name
        )


def test_cin_one(rng):
    # first encoder conv: Cin=1
    x = jnp.asarray(rng.normal(size=(1, 1, 4, 8, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 1, 4)) * 0.1, jnp.float32)
    b = jnp.zeros((4,), jnp.float32)
    out = pc.conv3x3x3_cf(x, w, b)
    ref = pc.conv3x3x3_cf_reference(x, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_supported_shape_gate():
    assert pc.supported_shape(192, 192)
    assert pc.supported_shape(8, 16)
    assert not pc.supported_shape(18, 18)  # H not a multiple of 8


def test_model_param_tree_identical_between_impls():
    from multimodal_segmentation_project_tpu.models import UNet3D

    kw = dict(out_channels=4, features=(4, 8), dropout_rate=0.0, dtype=jnp.float32)
    x = jnp.zeros((1, 1, 8, 8, 8), jnp.float32)
    v_xla = jax.eval_shape(
        UNet3D(conv_impl="xla", **kw).init, {"params": jax.random.key(0)}, x
    )
    v_pal = jax.eval_shape(
        UNet3D(conv_impl="pallas", **kw).init, {"params": jax.random.key(0)}, x
    )
    sx = jax.tree.structure(v_xla)
    sp = jax.tree.structure(v_pal)
    assert sx == sp
    for a, b in zip(jax.tree.leaves(v_xla), jax.tree.leaves(v_pal)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_model_outputs_match_between_impls(rng):
    from multimodal_segmentation_project_tpu.models import UNet3D

    kw = dict(out_channels=2, features=(4, 8), dropout_rate=0.0, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, 1, 8, 8, 8)), jnp.float32)
    m_xla = UNet3D(conv_impl="xla", **kw)
    m_pal = UNet3D(conv_impl="pallas", **kw)
    v = m_xla.init({"params": jax.random.key(0)}, x)
    o1 = m_xla.apply(v, x, train=False)
    o2 = m_pal.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-4)
