"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_segmentation_project_tpu.engine import (
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from multimodal_segmentation_project_tpu.models import UNet3D
from multimodal_segmentation_project_tpu.ops.losses import get_loss_fn
from multimodal_segmentation_project_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch_arrays,
)
from multimodal_segmentation_project_tpu.parallel.mesh import replicate_state

MODEL_KW = dict(out_channels=4, features=(4, 8), dropout_rate=0.0, dtype=jnp.float32)


def small_state(lr=1e-3, sgd=False):
    model = UNet3D(**MODEL_KW)
    # SGD for numerical-parity tests: Adam's first-step update is
    # ~sign(g), which amplifies reduction-order noise on near-zero
    # grads into lr-scale param diffs.
    import optax

    tx = optax.sgd(1.0) if sgd else make_optimizer(weight_decay=1e-4)
    x = jnp.zeros((1, 1, 8, 8, 8), jnp.float32)
    return create_train_state(model, jax.random.key(0), x, tx, lr)


def batch(n=8, seed=0):
    rng = np.random.default_rng(seed)
    labels = np.zeros((n, 8, 8, 8), np.int32)
    labels[:, 2:6, 2:6, 2:6] = 1
    images = labels[:, None] * 0.5 + rng.normal(0, 0.05, (n, 1, 8, 8, 8))
    return images.astype(np.float32), labels


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    m = make_mesh()
    assert m.shape == {"data": 8, "spatial": 1}
    m2 = make_mesh(n_spatial=2)
    assert m2.shape == {"data": 4, "spatial": 2}


def test_dp_step_matches_single_device():
    images, labels = batch()
    step = make_train_step(get_loss_fn("ce_tversky"))

    # single device
    s1 = small_state(sgd=True)
    s1, m1 = step(s1, jnp.array(images), jnp.array(labels), jax.random.key(0))

    # 8-way data parallel
    mesh = make_mesh()
    s8 = replicate_state(mesh, small_state(sgd=True))
    imgs8, lbls8 = shard_batch_arrays(mesh, images, labels)
    s8, m8 = step(s8, imgs8, lbls8, jax.random.key(0))

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-4)
    assert float(m1["dice"]) == pytest.approx(float(m8["dice"]), rel=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_spatial_sharding_step_runs():
    # volume D axis sharded 2-way alongside 4-way DP: XLA inserts the
    # conv halo exchanges automatically.
    mesh = make_mesh(n_spatial=2)
    images, labels = batch(n=4)
    step = make_train_step(get_loss_fn("ce_tversky"))
    state = replicate_state(mesh, small_state())
    imgs, lbls = shard_batch_arrays(mesh, images, labels)
    state, metrics = step(state, imgs, lbls, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))

    # numerics match the unsharded step
    s1 = small_state()
    _, m1 = make_train_step(get_loss_fn("ce_tversky"))(
        s1, jnp.array(images), jnp.array(labels), jax.random.key(0)
    )
    assert float(metrics["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-4)


def test_eval_step_sharded():
    mesh = make_mesh()
    images, labels = batch()
    state = replicate_state(mesh, small_state())
    estep = make_eval_step(get_loss_fn("ce_tversky"))
    m = estep(state, *shard_batch_arrays(mesh, images, labels))
    assert np.isfinite(float(m["loss"]))


def test_batch_sharding_layout():
    mesh = make_mesh(n_spatial=2)
    images = np.zeros((4, 1, 8, 8, 8), np.float32)
    arr = jax.device_put(images, batch_sharding(mesh, ndim=5))
    # each device holds B/4 x D/2 shard
    shard_shape = arr.sharding.shard_shape(arr.shape)
    assert shard_shape == (1, 1, 4, 8, 8)
    rep = jax.device_put(np.zeros(3), replicated_sharding(mesh))
    assert rep.sharding.shard_shape(rep.shape) == (3,)
