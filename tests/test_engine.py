"""Engine tests: train/eval/distill/DANN steps, freezing, accumulation,
scheduler, checkpoint round-trip — tiny models on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_segmentation_project_tpu.engine import (
    ReduceLROnPlateau,
    create_train_state,
    freeze_mask,
    make_dann_step,
    make_distill_step,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from multimodal_segmentation_project_tpu.engine import checkpoint as ckpt
from multimodal_segmentation_project_tpu.engine.state import ones_mask, param_count
from multimodal_segmentation_project_tpu.models import DomainDiscriminator, UNet3D
from multimodal_segmentation_project_tpu.ops.losses import get_loss_fn

MODEL_KW = dict(out_channels=4, features=(4, 8), dropout_rate=0.0, dtype=jnp.float32)


def tiny_state(lr=1e-2, accum=1, dropout=0.0, seed=0):
    model = UNet3D(**{**MODEL_KW, "dropout_rate": dropout})
    tx = make_optimizer(weight_decay=1e-4, grad_accum_steps=accum)
    x = jnp.zeros((1, 1, 8, 8, 8), jnp.float32)
    return create_train_state(model, jax.random.key(seed), x, tx, lr)


def synth_batch(n=2, seed=0):
    rng = np.random.default_rng(seed)
    labels = np.zeros((n, 8, 8, 8), np.int32)
    labels[:, 2:6, 2:6, 2:6] = 1
    labels[:, 0:2, 0:2, 0:2] = 2
    images = labels[:, None] * 0.4 + rng.normal(0, 0.05, (n, 1, 8, 8, 8))
    return jnp.array(images, jnp.float32), jnp.array(labels)


def test_train_step_decreases_loss():
    state = tiny_state(lr=5e-3)
    step = make_train_step(get_loss_fn("ce_tversky"))
    images, labels = synth_batch()
    losses = []
    for i in range(50):
        state, metrics = step(state, images, labels, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses[::10]
    assert all(np.isfinite(losses))


def test_eval_step_metrics_finite():
    state = tiny_state()
    estep = make_eval_step(get_loss_fn("ce_tversky"))
    images, labels = synth_batch()
    m = estep(state, images, labels)
    for k in ("loss", "dice", "iou", "acc"):
        assert np.isfinite(float(m[k])), k


def test_grad_accumulation_applies_every_k():
    state = tiny_state(accum=2)
    step = make_train_step(get_loss_fn("ce_tversky"))
    images, labels = synth_batch()
    p0 = jax.tree.map(np.asarray, state.params)
    state, _ = step(state, images, labels, jax.random.key(0))
    p1 = jax.tree.map(np.asarray, state.params)
    # first micro-step: no update yet
    chex_equal = all(
        np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1))
    )
    assert chex_equal
    state, _ = step(state, images, labels, jax.random.key(1))
    p2 = jax.tree.map(np.asarray, state.params)
    changed = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2))
    )
    assert changed


def test_freeze_mask_blocks_updates():
    state = tiny_state()
    mask = freeze_mask(state.params, ("enc",))
    state = state.with_mask(mask)
    step = make_train_step(get_loss_fn("ce_tversky"))
    images, labels = synth_batch()
    enc_before = jax.tree.map(
        np.asarray, {k: v for k, v in state.params.items() if k.startswith("enc")}
    )
    for i in range(3):
        state, _ = step(state, images, labels, jax.random.key(i))
    enc_after = {k: v for k, v in state.params.items() if k.startswith("enc")}
    for a, b in zip(jax.tree.leaves(enc_before), jax.tree.leaves(enc_after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # decoder must have moved
    dec_moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(tiny_state().params["dec0"]),
            jax.tree.leaves(state.params["dec0"]),
        )
    )
    assert dec_moved


def test_freeze_mask_structure():
    state = tiny_state()
    mask = freeze_mask(state.params, ("enc", "bottleneck"))
    flat = jax.tree.leaves(
        {k: v for k, v in mask.items() if k.startswith(("enc", "bottleneck"))}
    )
    assert all(float(x) == 0.0 for x in flat)
    assert all(float(x) == 1.0 for x in jax.tree.leaves(mask["head_kernel"]))


def test_plateau_scheduler_reference_semantics():
    sched = ReduceLROnPlateau(lr=1e-3, patience=2, factor=0.1, min_lr=1e-6)
    assert sched.step(0.5) == pytest.approx(1e-3)  # new best
    assert sched.step(0.5) == pytest.approx(1e-3)  # bad 1 (rel threshold)
    assert sched.step(0.5) == pytest.approx(1e-3)  # bad 2
    assert sched.step(0.5) == pytest.approx(1e-4)  # bad 3 > patience -> reduce
    assert sched.step(0.6) == pytest.approx(1e-4)  # new best, no change
    for _ in range(10):
        lr = sched.step(0.0)
    assert lr >= 1e-6  # min_lr floor


def test_distill_step_runs_and_learns():
    student = tiny_state(lr=3e-3)
    teacher = tiny_state(seed=1)
    teacher_vars = {"params": teacher.params, "batch_stats": teacher.batch_stats}
    from multimodal_segmentation_project_tpu.ops.losses import distillation_loss

    kd = lambda s, t, y: distillation_loss(s, t, y, alpha=0.7, temperature=2.0)
    step = make_distill_step(kd)
    images, labels = synth_batch()
    losses = []
    for i in range(15):
        student, m = step(student, teacher_vars, images, labels, jax.random.key(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    # teacher untouched
    for a, b in zip(
        jax.tree.leaves(teacher.params), jax.tree.leaves(teacher_vars["params"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dann_step_updates_both_models():
    seg = tiny_state(lr=1e-3)
    disc_model = DomainDiscriminator(hidden_dims=(16, 8, 4))
    feat_dim = 16  # features[-1]*2
    disc_vars = disc_model.init(
        {"params": jax.random.key(2)}, jnp.zeros((1, feat_dim))
    )
    from multimodal_segmentation_project_tpu.engine.state import TrainState

    tx = make_optimizer()
    disc = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=disc_vars["params"],
        batch_stats={},
        opt_state=tx.init(disc_vars["params"]),
        trainable_mask=ones_mask(disc_vars["params"]),
        lr=jnp.asarray(1e-3),
        apply_fn=disc_model.apply,
        tx=tx,
    )
    step = make_dann_step(get_loss_fn("ce_tversky"), lambda_domain=0.2)
    src_img, src_lbl = synth_batch(seed=0)
    tgt_img, _ = synth_batch(seed=5)
    seg_p0 = jax.tree.map(np.asarray, seg.params)
    disc_p0 = jax.tree.map(np.asarray, disc.params)
    seg, disc, m = step(seg, disc, src_img, src_lbl, tgt_img, jax.random.key(0))
    assert np.isfinite(float(m["task_loss"]))
    assert np.isfinite(float(m["domain_loss"]))
    assert float(m["loss"]) == pytest.approx(
        float(m["task_loss"]) + 0.2 * float(m["domain_loss"]), rel=1e-5
    )
    moved = lambda t0, t1: any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(t0), jax.tree.leaves(t1))
    )
    assert moved(seg_p0, seg.params)
    assert moved(disc_p0, disc.params)


def test_checkpoint_roundtrip_and_resume(tmp_path):
    state = tiny_state()
    step = make_train_step(get_loss_fn("ce_tversky"))
    images, labels = synth_batch()
    for i in range(3):
        state, _ = step(state, images, labels, jax.random.key(i))
    path = str(tmp_path / "ckpt.msgpack")
    ckpt.save_checkpoint(
        path,
        ckpt.state_checkpoint_tree(state, {"epoch": jnp.asarray(3)}),
        metadata={"epoch": 3, "val_dice": 0.5},
    )
    fresh = tiny_state(seed=9)
    tree = ckpt.load_checkpoint(
        path, ckpt.state_checkpoint_tree(fresh, {"epoch": jnp.asarray(0)})
    )
    restored = ckpt.restore_train_state(fresh, tree)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(tree["epoch"]) == 3
    assert ckpt.load_metadata(path)["val_dice"] == 0.5
    # training continues identically from the restored state
    s1, m1 = step(state, images, labels, jax.random.key(99))
    s2, m2 = step(restored, images, labels, jax.random.key(99))
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-6)


def test_load_params_only_strict_and_lenient(tmp_path):
    state = tiny_state()
    path = str(tmp_path / "pre.msgpack")
    ckpt.save_checkpoint(path, {"params": state.params, "batch_stats": state.batch_stats})
    other = tiny_state(seed=3)
    params, stats = ckpt.load_params_only(path, other.params, strict=True)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # lenient load into a model with a different head succeeds
    bigger = UNet3D(**{**MODEL_KW, "out_channels": 3})
    bvars = bigger.init({"params": jax.random.key(0)}, jnp.zeros((1, 1, 8, 8, 8)))
    params2, _ = ckpt.load_params_only(path, bvars["params"], strict=False)
    assert param_count(params2) == param_count(bvars["params"])
    with pytest.raises(KeyError):
        ckpt.load_params_only(path, bvars["params"], strict=True)


def test_nan_guard_skips_nonfinite_updates():
    state = tiny_state()
    step = make_train_step(get_loss_fn("ce_tversky"), nan_guard=True)
    images, labels = synth_batch()
    p0 = jax.tree.map(np.asarray, state.params)
    # poison the input -> non-finite loss/grads
    bad = jnp.full_like(images, jnp.nan)
    state, m = step(state, bad, labels, jax.random.key(0))
    assert float(m["nonfinite"]) == 1.0
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # healthy step afterwards proceeds and reports finite
    state, m = step(state, images, labels, jax.random.key(1))
    assert float(m["nonfinite"]) == 0.0
    assert np.isfinite(float(m["loss"]))


def test_nan_guard_no_dilution_under_grad_accum():
    """A non-finite micro-batch under MultiSteps must be SKIPPED, not
    averaged in as zeros: good,bad,good == good,good exactly."""
    images, labels = synth_batch()
    bad = jnp.full_like(images, jnp.nan)
    step = make_train_step(get_loss_fn("ce_tversky"), nan_guard=True)

    s_guarded = tiny_state(accum=2)
    s_control = tiny_state(accum=2)
    s_guarded, _ = step(s_guarded, images, labels, jax.random.key(0))
    s_guarded, m = step(s_guarded, bad, labels, jax.random.key(1))
    assert float(m["nonfinite"]) == 1.0
    s_guarded, _ = step(s_guarded, images, labels, jax.random.key(2))

    s_control, _ = step(s_control, images, labels, jax.random.key(0))
    s_control, _ = step(s_control, images, labels, jax.random.key(2))

    for a, b in zip(
        jax.tree.leaves(s_guarded.params), jax.tree.leaves(s_control.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the accumulation window completed: params moved from init
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(tiny_state(accum=2).params),
            jax.tree.leaves(s_guarded.params),
        )
    )
    assert moved


def test_nan_guard_distill_step():
    from multimodal_segmentation_project_tpu.ops.losses import distillation_loss

    state = tiny_state()
    model = UNet3D(**MODEL_KW)
    teacher_vars = model.init(
        {"params": jax.random.key(9)}, jnp.zeros((1, 1, 8, 8, 8), jnp.float32)
    )
    kd = lambda s, t, y: distillation_loss(s, t, y, alpha=0.7, temperature=2.0)
    step = make_distill_step(kd, nan_guard=True)
    images, labels = synth_batch()
    bad = jnp.full_like(images, jnp.nan)
    p0 = jax.tree.map(np.asarray, state.params)
    stats0 = jax.tree.map(np.asarray, state.batch_stats)
    state, m = step(state, teacher_vars, bad, labels, jax.random.key(0))
    assert float(m["nonfinite"]) == 1.0
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(stats0), jax.tree.leaves(state.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    state, m = step(state, teacher_vars, images, labels, jax.random.key(1))
    assert float(m["nonfinite"]) == 0.0


def test_nan_guard_dann_step_atomic():
    """On a poisoned batch BOTH the seg net and the discriminator (and
    the BN stats from both forwards) must roll back atomically."""
    from multimodal_segmentation_project_tpu.engine.state import TrainState
    from multimodal_segmentation_project_tpu.engine import make_optimizer

    seg_state = tiny_state()
    disc = DomainDiscriminator(hidden_dims=(8, 4))
    feat_dim = UNet3D(**MODEL_KW).bottleneck_features
    dvars = disc.init({"params": jax.random.key(3)}, jnp.zeros((1, feat_dim)))
    tx = make_optimizer(1e-4, 1)
    disc_state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=dvars["params"],
        batch_stats={},
        opt_state=tx.init(dvars["params"]),
        trainable_mask=ones_mask(dvars["params"]),
        lr=jnp.asarray(1e-2, jnp.float32),
        apply_fn=disc.apply,
        tx=tx,
    )
    step = make_dann_step(get_loss_fn("ce_tversky"), 0.2, nan_guard=True)
    src_img, src_lbl = synth_batch()
    tgt_img = src_img + 0.1
    bad = jnp.full_like(src_img, jnp.nan)

    sp0 = jax.tree.map(np.asarray, seg_state.params)
    dp0 = jax.tree.map(np.asarray, disc_state.params)
    stats0 = jax.tree.map(np.asarray, seg_state.batch_stats)
    seg_state, disc_state, m = step(
        seg_state, disc_state, bad, src_lbl, tgt_img, jax.random.key(0)
    )
    assert float(m["nonfinite"]) == 1.0
    for a, b in zip(jax.tree.leaves(sp0), jax.tree.leaves(seg_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(dp0), jax.tree.leaves(disc_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(stats0), jax.tree.leaves(seg_state.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # healthy batch updates both
    seg_state, disc_state, m = step(
        seg_state, disc_state, src_img, src_lbl, tgt_img, jax.random.key(1)
    )
    assert float(m["nonfinite"]) == 0.0
    seg_moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(sp0), jax.tree.leaves(seg_state.params))
    )
    disc_moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(dp0), jax.tree.leaves(disc_state.params))
    )
    assert seg_moved and disc_moved
