"""Spatial (D-axis) sharding numerics: halo-exchange shard_map islands.

VERDICT round-1 item 3: a (dp x sp)-sharded model must reproduce the
single-device output bit-for-tolerance — forward AND gradients — for
BOTH conv implementations (Pallas kernel forced on in interpret mode,
and the XLA conv), at n_spatial in {2, 4}, on the 8-virtual-device CPU
mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_segmentation_project_tpu.models import UNet3D
from multimodal_segmentation_project_tpu.ops.halo import halo_conv3
from multimodal_segmentation_project_tpu.ops.losses import get_loss_fn
from multimodal_segmentation_project_tpu.ops.pallas_conv import (
    conv3x3x3_cf,
    conv3x3x3_cf_reference,
)
from multimodal_segmentation_project_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    use_spatial_mesh,
)

MODEL_KW = dict(out_channels=4, features=(4, 8), dropout_rate=0.0, dtype=jnp.float32)


def synth(batch=4, d=16, hw=8, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.normal(size=(batch, 1, d, hw, hw)).astype(np.float32)
    labels = rng.integers(0, 4, size=(batch, d, hw, hw)).astype(np.int32)
    return jnp.asarray(images), jnp.asarray(labels)


@pytest.mark.parametrize("n_spatial", [2, 4])
@pytest.mark.parametrize("conv_impl", ["xla", "pallas"])
def test_halo_conv3_matches_unsharded(n_spatial, conv_impl):
    """The raw halo wrapper == plain SAME conv for one conv op."""
    mesh = make_mesh(n_data=8 // n_spatial, n_spatial=n_spatial)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 4, 16, 8, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 8)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32) * 0.1)
    conv_fn = conv3x3x3_cf if conv_impl == "pallas" else conv3x3x3_cf_reference
    ref = conv3x3x3_cf_reference(x, w, b)
    got = jax.jit(lambda x, w, b: halo_conv3(conv_fn, x, w, b, mesh))(
        jax.device_put(x, batch_sharding(mesh, 5)), w, b
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("n_spatial", [2, 4])
@pytest.mark.parametrize("conv_impl", ["xla", "pallas"])
def test_unet_forward_parity_under_spatial_sharding(n_spatial, conv_impl):
    mesh = make_mesh(n_data=8 // n_spatial, n_spatial=n_spatial)
    model = UNet3D(**MODEL_KW, conv_impl=conv_impl)
    images, _ = synth()
    variables = model.init({"params": jax.random.key(0)}, images[:1])
    ref = model.apply(variables, images, train=False)

    with use_spatial_mesh(mesh):
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
        got = fwd(variables, jax.device_put(images, batch_sharding(mesh, 5)))
        got = np.asarray(got)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=5e-4, atol=5e-4)


@pytest.mark.smoke
@pytest.mark.parametrize("n_spatial", [2, 4])
@pytest.mark.parametrize("conv_impl", ["xla", "pallas"])
def test_unet_grad_parity_under_spatial_sharding(n_spatial, conv_impl):
    """Full train-level gradients (loss -> all params, through BN stats
    and the halo exchange's transposed collectives) match unsharded."""
    mesh = make_mesh(n_data=8 // n_spatial, n_spatial=n_spatial)
    model = UNet3D(**MODEL_KW, conv_impl=conv_impl)
    images, labels = synth()
    variables = model.init({"params": jax.random.key(0)}, images[:1])
    loss_fn = get_loss_fn("ce_tversky")

    def loss_of(params, batch_stats, images, labels):
        logits, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
        )
        return loss_fn(logits, labels)

    ref_loss, ref_grads = jax.value_and_grad(loss_of)(
        variables["params"], variables["batch_stats"], images, labels
    )

    with use_spatial_mesh(mesh):
        vag = jax.jit(jax.value_and_grad(loss_of))
        got_loss, got_grads = vag(
            variables["params"],
            variables["batch_stats"],
            jax.device_put(images, batch_sharding(mesh, 5)),
            jax.device_put(labels, batch_sharding(mesh, 4)),
        )
        got_loss = float(got_loss)
        got_grads = jax.device_get(got_grads)

    assert got_loss == pytest.approx(float(ref_loss), rel=1e-4)
    flat_ref = jax.tree_util.tree_flatten_with_path(ref_grads)[0]
    flat_got = jax.tree_util.tree_flatten_with_path(got_grads)[0]
    for (path, a), (_, b) in zip(flat_ref, flat_got):
        np.testing.assert_allclose(
            np.asarray(b),
            np.asarray(a),
            rtol=2e-3,
            atol=2e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_unet_parity_data_parallel_only_pallas():
    """Data-parallel-only mesh (n_spatial=1): the pallas_call still
    needs its shard_map island (XLA cannot auto-partition custom
    calls). Forward AND gradients must match single-device output with
    the kernel forced on, batch sharded over all 8 devices."""
    mesh = make_mesh(n_data=8, n_spatial=1)
    model = UNet3D(**MODEL_KW, conv_impl="pallas")
    images, labels = synth(batch=8)
    variables = model.init({"params": jax.random.key(0)}, images[:1])
    ref = model.apply(variables, images, train=False)
    loss_fn = get_loss_fn("ce_tversky")

    def loss_of(params, images, labels):
        logits, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            images, train=True, mutable=["batch_stats"],
        )
        return loss_fn(logits, labels)

    ref_loss, ref_grads = jax.value_and_grad(loss_of)(
        variables["params"], images, labels
    )

    with use_spatial_mesh(mesh):
        got = jax.jit(lambda v, x: model.apply(v, x, train=False))(
            variables, jax.device_put(images, batch_sharding(mesh, 5))
        )
        got_loss, got_grads = jax.jit(jax.value_and_grad(loss_of))(
            variables["params"],
            jax.device_put(images, batch_sharding(mesh, 5)),
            jax.device_put(labels, batch_sharding(mesh, 4)),
        )
        got = np.asarray(got)
        got_loss = float(got_loss)
        got_grads = jax.device_get(got_grads)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=5e-4, atol=5e-4)
    assert got_loss == pytest.approx(float(ref_loss), rel=1e-4)
    for a, b in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(got_grads)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4)


def test_spatial_sharding_with_remat():
    """nn.remat around blocks containing shard_map islands must trace
    and differentiate (the production 192^3 config uses remat=True)."""
    mesh = make_mesh(n_data=4, n_spatial=2)
    model = UNet3D(**MODEL_KW, conv_impl="xla", remat=True)
    images, labels = synth()
    variables = model.init({"params": jax.random.key(0)}, images[:1])
    loss_fn = get_loss_fn("ce_tversky")

    def loss_of(params):
        logits, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            images_sh,
            train=True,
            mutable=["batch_stats"],
        )
        return loss_fn(logits, labels_sh)

    with use_spatial_mesh(mesh):
        images_sh = jax.device_put(images, batch_sharding(mesh, 5))
        labels_sh = jax.device_put(labels, batch_sharding(mesh, 4))
        loss, grads = jax.jit(jax.value_and_grad(loss_of))(variables["params"])
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in jax.tree.leaves(grads))
