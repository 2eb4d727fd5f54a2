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


@pytest.mark.smoke
def test_forward_parity(case):
    x, w, b = case
    out = pc.conv3x3x3_cf(x, w, b)
    ref = pc.conv3x3x3_cf_reference(x, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


@pytest.mark.smoke
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


def test_boundary_forward_parity(rng):
    """conv3x3x3_cf_boundary == conv(relu(x*a + t)) + b, including halo
    masking (the affine must NOT leak into the SAME-padding zeros)."""
    for shape in [(1, 4, 6, 8, 16), (2, 8, 4, 8, 48)]:
        bdim, cin = shape[0], shape[1]
        cout = 8
        x = jnp.asarray(rng.normal(size=shape), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
        # t > 0 in places so an unmasked halo would definitely differ
        a = jnp.asarray(rng.normal(size=(bdim, cin)) + 1.0, jnp.float32)
        t = jnp.asarray(np.abs(rng.normal(size=(bdim, cin))), jnp.float32)
        out = pc.conv3x3x3_cf_boundary(x, w, b, a, t)
        r = jnp.maximum(x * a[:, :, None, None, None] + t[:, :, None, None, None], 0.0)
        ref = pc.conv3x3x3_cf_reference(r, w, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_boundary_gradient_parity(rng):
    """Full VJP of the fused boundary op (dx-epilogue kernel: dx conv +
    relu-mask/affine + in-kernel (da, dt) accumulators) vs autodiff of
    the XLA composition: dx, dw, db, da, dt."""
    bdim, cin, cout = 2, 4, 8
    x = jnp.asarray(rng.normal(size=(bdim, cin, 4, 8, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    a = jnp.asarray(rng.normal(size=(bdim, cin)) + 1.0, jnp.float32)
    t = jnp.asarray(rng.normal(size=(bdim, cin)) * 0.5, jnp.float32)

    def loss_fused(x, w, b, a, t):
        return jnp.sum(pc.conv3x3x3_cf_boundary(x, w, b, a, t) ** 2)

    def loss_ref(x, w, b, a, t):
        r = jnp.maximum(x * a[:, :, None, None, None] + t[:, :, None, None, None], 0.0)
        return jnp.sum(pc.conv3x3x3_cf_reference(r, w, b) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w, b, a, t)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w, b, a, t)
    for name, u, v in zip(("dx", "dw", "db", "da", "dt"), gf, gr):
        scale = max(float(jnp.max(jnp.abs(v))), 1.0)
        np.testing.assert_allclose(
            np.asarray(u) / scale, np.asarray(v) / scale, atol=2e-4, err_msg=name
        )


def test_boundary_stats_parity(rng):
    """conv3x3x3_cf_boundary_stats == (conv(relu(x*a+t)) + b, per-channel
    sum/sumsq of that output) — forward and full VJP including the
    stats cotangent fold (g + gs1 + 2*y*gs2)."""
    bdim, cin, cout = 2, 4, 8
    x = jnp.asarray(rng.normal(size=(bdim, cin, 4, 8, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    a = jnp.asarray(rng.normal(size=(bdim, cin)) + 1.0, jnp.float32)
    t = jnp.asarray(np.abs(rng.normal(size=(bdim, cin))), jnp.float32)

    y, s1, s2 = pc.conv3x3x3_cf_boundary_stats(x, w, b, a, t)
    r = jnp.maximum(x * a[:, :, None, None, None] + t[:, :, None, None, None], 0.0)
    yr = pc.conv3x3x3_cf_reference(r, w, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s1), np.asarray(jnp.sum(yr, axis=(0, 2, 3, 4))), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(s2), np.asarray(jnp.sum(yr * yr, axis=(0, 2, 3, 4))), rtol=1e-4
    )

    def loss_fused(x, w, b, a, t):
        y, s1, s2 = pc.conv3x3x3_cf_boundary_stats(x, w, b, a, t)
        # touch all three outputs so every cotangent path is exercised
        return jnp.sum(y**2) + jnp.sum(s1 * s2) + jnp.sum(s1**2)

    def loss_ref(x, w, b, a, t):
        r = jnp.maximum(x * a[:, :, None, None, None] + t[:, :, None, None, None], 0.0)
        y = pc.conv3x3x3_cf_reference(r, w, b)
        yf = y.astype(jnp.float32)
        s1 = jnp.sum(yf, axis=(0, 2, 3, 4))
        s2 = jnp.sum(yf * yf, axis=(0, 2, 3, 4))
        return jnp.sum(y**2) + jnp.sum(s1 * s2) + jnp.sum(s1**2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w, b, a, t)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w, b, a, t)
    for name, u, v in zip(("dx", "dw", "db", "da", "dt"), gf, gr):
        scale = max(float(jnp.max(jnp.abs(v))), 1.0)
        np.testing.assert_allclose(
            np.asarray(u) / scale, np.asarray(v) / scale, atol=2e-4, err_msg=name
        )


def test_fused_boundary_doubleconv_parity(rng):
    """The fused DoubleConv (conv+stats -> BN affine -> prologue conv,
    the training-mode pallas default) matches the unfused XLA training
    path — same params, same outputs, same batch_stats updates, same
    gradients (dropout 0 so no mask-draw divergence)."""
    from multimodal_segmentation_project_tpu.models.unet3d import DoubleConv

    x = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 16)), jnp.float32)
    mod = DoubleConv(features=8, dropout_rate=0.0, dtype=jnp.float32,
                     conv_impl="pallas")
    mod_ref = DoubleConv(features=8, dropout_rate=0.0, dtype=jnp.float32,
                         conv_impl="xla")
    v = mod.init({"params": jax.random.key(0)}, x, train=True)

    def run(mod, x, params):
        out, upd = mod.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return out, upd

    out_ref, upd_ref = run(mod_ref, x, v["params"])
    g_ref = jax.grad(lambda p: jnp.sum(run(mod_ref, x, p)[0] ** 2))(v["params"])

    out_f, upd_f = run(mod, x, v["params"])
    g_f = jax.grad(lambda p: jnp.sum(run(mod, x, p)[0] ** 2))(v["params"])

    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_ref), atol=2e-4)
    def flat(t):
        return {
            jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_leaves_with_path(t)
        }

    fu, fr = flat(upd_f), flat(upd_ref)
    assert fu.keys() == fr.keys()
    for k in fu:
        # cross-impl (pallas vs XLA conv) comparison: fp32 conv parity
        # is ~1e-4, so the running stats inherit that tolerance
        np.testing.assert_allclose(
            np.asarray(fu[k]), np.asarray(fr[k]), atol=2e-4, err_msg=k
        )
    gu, gr = flat(g_f), flat(g_ref)
    assert gu.keys() == gr.keys()
    for k in gu:
        if "bias" in k and "conv" in k:
            # a conv bias feeding BatchNorm has an analytically ZERO
            # gradient (the mean subtracts any constant shift); what
            # remains is fp32 cancellation noise with no parity to test
            assert float(jnp.max(jnp.abs(gu[k]))) < 1e-2, k
            assert float(jnp.max(jnp.abs(gr[k]))) < 1e-2, k
            continue
        scale = max(float(jnp.max(jnp.abs(gr[k]))), 1.0)
        np.testing.assert_allclose(
            np.asarray(gu[k]) / scale, np.asarray(gr[k]) / scale,
            atol=5e-4, err_msg=k,
        )


def test_fused_boundary_dropout_channel_semantics(rng):
    """With dropout active, the fused path still yields finite outputs
    and a param tree identical to the unfused one (mask draws differ by
    construction — torch Dropout3d channel semantics preserved)."""
    from multimodal_segmentation_project_tpu.models.unet3d import DoubleConv

    x = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 16)), jnp.float32)
    mod = DoubleConv(features=8, dropout_rate=0.5, dtype=jnp.float32,
                     conv_impl="pallas")
    v = mod.init({"params": jax.random.key(0)}, x, train=False)
    out, _ = mod.apply(
        v, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(7)},
    )
    assert np.all(np.isfinite(np.asarray(out)))
    # a dropped channel is all-zero across its volume (Dropout3d)
    ch_any = np.asarray(jnp.any(out != 0, axis=(2, 3, 4)))
    assert ch_any.ndim == 2  # (B, C) pattern exists




@pytest.mark.smoke
def test_fused_relu_forward_parity(case):
    """conv3x3x3_cf_relu (the inference epilogue kernel) == relu of the
    XLA reference."""
    x, w, b = case
    out = pc.conv3x3x3_cf_relu(x, w, b)
    ref = jax.nn.relu(pc.conv3x3x3_cf_reference(x, w, b))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    assert float(jnp.min(out)) >= 0.0


def test_fused_relu_gradient_parity(case):
    x, w, b = case
    loss_p = lambda x, w, b: jnp.sum(pc.conv3x3x3_cf_relu(x, w, b) ** 2)
    loss_r = lambda x, w, b: jnp.sum(
        jax.nn.relu(pc.conv3x3x3_cf_reference(x, w, b)) ** 2
    )
    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, w, b)
    for name, a, r in zip(("dx", "dw", "db"), gp, gr):
        scale = max(float(jnp.max(jnp.abs(r))), 1.0)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(r) / scale, atol=2e-4, err_msg=name
        )
