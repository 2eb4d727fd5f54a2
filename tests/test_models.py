"""Model shape/dtype/behavior tests (reduced widths for CPU speed)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_segmentation_project_tpu.models import UNet3D, DomainDiscriminator

SMALL = dict(features=(4, 8), dropout_rate=0.1, dtype=jnp.float32)


def _init(model, shape=(1, 1, 16, 16, 16), **kwargs):
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, **kwargs)
    return variables, x


def test_forward_shapes():
    model = UNet3D(out_channels=4, **SMALL)
    variables, x = _init(model)
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (1, 4, 16, 16, 16)
    assert logits.dtype == jnp.float32


def test_return_features_gap():
    model = UNet3D(out_channels=4, **SMALL)
    variables, x = _init(model)
    logits, gap = model.apply(variables, x, train=False, return_features=True)
    assert logits.shape == (1, 4, 16, 16, 16)
    assert gap.shape == (1, 16)  # features[-1]*2 = 16
    assert gap.dtype == jnp.float32


def test_odd_shape_resize_guard():
    # 20 is divisible by 4 but not by 8 at two pool levels? 20->10->5 then
    # upsample 5->10->20: fine. Use 18: 18->9->4 (floor), up 4->8 != 9
    # triggers the trilinear shape guard (models/unet.py:81-83 analog).
    model = UNet3D(out_channels=2, **SMALL)
    variables, x = _init(model, shape=(1, 1, 18, 18, 18))
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (1, 2, 18, 18, 18)


def test_train_mode_updates_batch_stats_and_uses_dropout():
    model = UNet3D(out_channels=2, **SMALL)
    variables, x = _init(model)
    x = jnp.array(np.random.default_rng(0).normal(size=x.shape), jnp.float32)
    out1, mutated = model.apply(
        variables,
        x,
        train=True,
        rngs={"dropout": jax.random.key(1)},
        mutable=["batch_stats"],
    )
    assert "batch_stats" in mutated
    # different dropout key -> different output
    out2, _ = model.apply(
        variables,
        x,
        train=True,
        rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    # eval is deterministic
    e1 = model.apply(variables, x, train=False)
    e2 = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_param_count_full_size_model():
    # Reference UNet3D(1->4, [16,32,64,128]) is ~5.6M params (SURVEY.md 2).
    # eval_shape: no compute, just shape inference.
    model = UNet3D(out_channels=4)  # default widths
    x = jnp.zeros((1, 1, 32, 32, 32), jnp.float32)
    variables = jax.eval_shape(model.init, {"params": jax.random.key(0)}, x)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert 5.0e6 < n < 6.5e6, n


def test_remat_matches_no_remat():
    kwargs = dict(out_channels=2, features=(4, 8), dropout_rate=0.0, dtype=jnp.float32)
    m1 = UNet3D(remat=False, **kwargs)
    m2 = UNet3D(remat=True, **kwargs)
    x = jnp.array(np.random.default_rng(3).normal(size=(1, 1, 8, 8, 8)), jnp.float32)
    v = m1.init({"params": jax.random.key(0)}, x)
    o1 = m1.apply(v, x, train=False)
    o2 = m2.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_discriminator_shapes_and_params():
    disc = DomainDiscriminator()
    x = jnp.zeros((3, 256), jnp.float32)
    variables = disc.init({"params": jax.random.key(0)}, x)
    out = disc.apply(variables, x, train=False)
    assert out.shape == (3, 2)
    # 256*256+256 + 256*128+128 + 128*64+64 + 64*2+2 = 107_074
    n = sum(p.size for p in jax.tree.leaves(variables["params"]))
    assert n == 107074, n


def test_bf16_compute_fp32_params():
    # eval_shape only: bf16 convs are pathologically slow on CPU.
    model = UNet3D(out_channels=4, features=(4, 8), dtype=jnp.bfloat16)
    x = jnp.zeros((1, 1, 8, 8, 8), jnp.float32)
    variables = jax.eval_shape(model.init, {"params": jax.random.key(0)}, x)
    for leaf in jax.tree.leaves(variables["params"]):
        assert leaf.dtype == jnp.float32
    logits = jax.eval_shape(
        lambda v, x: model.apply(v, x, train=False), variables, x
    )
    assert logits.dtype == jnp.float32


def test_fused_bn_stats_matches_unfused():
    """The single-device fused conv+BN-stats train path (pallas kernel
    emitting (sum, sumsq), BatchNormCF normalizing from them) must match
    the XLA-conv + flax-BatchNorm path: outputs, updated batch_stats,
    and gradients. Same params serve both (checkpoint compatibility)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 1, 16, 16, 16)).astype(np.float32))
    kw = dict(out_channels=4, features=(4, 8), dropout_rate=0.0, dtype=jnp.float32)
    fused = UNet3D(conv_impl="pallas", fused_bn_stats=True, **kw)
    plain = UNet3D(conv_impl="xla", **kw)      # XLA convs + flax BN
    variables = plain.init({"params": jax.random.key(1)}, x)

    yf, mf = fused.apply(variables, x, train=True, mutable=["batch_stats"])
    yp, mp = plain.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yp), rtol=2e-3, atol=2e-3)
    for a, b in zip(
        jax.tree.leaves(mf["batch_stats"]), jax.tree.leaves(mp["batch_stats"])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)

    def loss(model, params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(out**2)

    gf = jax.grad(lambda p: loss(fused, p))(variables["params"])
    gp = jax.grad(lambda p: loss(plain, p))(variables["params"])
    flat_f = jax.tree_util.tree_flatten_with_path(gf)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(gp)[0]
    for (path, a), (_, b) in zip(flat_f, flat_p):
        keys = "/".join(str(getattr(k, "key", k)) for k in path)
        if "conv" in keys and keys.endswith("bias"):
            # conv bias grads through train-mode BN are mathematically
            # zero (mean subtraction cancels constant channel offsets);
            # both stacks return only roundoff noise there.
            continue
        scale = np.abs(np.asarray(b)).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, rtol=5e-3, atol=5e-3,
            err_msg=keys,
        )
