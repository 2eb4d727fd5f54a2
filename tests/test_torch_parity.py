"""Cross-framework numerical parity: reference-architecture forward in
torch functional ops vs this framework's UNet3D with imported weights.

This is the strongest parity check available without the medical
datasets: the SAME weights (reference .pth layout, converted by
engine/interop.py) produce the SAME eval-mode output volume through
both stacks, validating conv padding semantics, BatchNorm inference
semantics, max-pool, the transpose-conv == einsum+depth-to-space
equivalence, and the 1x1x1 head — i.e. the whole eval path that
BASELINE.md's "Dice parity" target depends on.

The torch side is written procedurally against torch.nn.functional from
the state_dict (not as an nn.Module), mirroring the reference's
documented architecture (models/unet.py:34-90 structure).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from multimodal_segmentation_project_tpu.engine.interop import (  # noqa: E402
    torch_state_dict_to_trees,
)
from multimodal_segmentation_project_tpu.models import UNet3D  # noqa: E402
from tests.test_interop import reference_shaped_state_dict  # noqa: E402

FEATURES = (4, 8)


def torch_reference_forward(sd, x, training=False):
    """Forward of the reference UNet3D, written functionally.

    ``training=True`` uses batch statistics (and updates the running
    stats in place with torch's momentum 0.1 == flax momentum 0.9);
    dropout is rate-0 in these tests so it is omitted in both stacks.
    """

    def double_conv(prefix, h):
        for conv_i, bn_i in ((0, 1), (4, 5)):
            h = F.conv3d(
                h, sd[f"{prefix}.double_conv.{conv_i}.weight"],
                sd[f"{prefix}.double_conv.{conv_i}.bias"], padding=1,
            )
            h = F.batch_norm(
                h,
                sd[f"{prefix}.double_conv.{bn_i}.running_mean"],
                sd[f"{prefix}.double_conv.{bn_i}.running_var"],
                sd[f"{prefix}.double_conv.{bn_i}.weight"],
                sd[f"{prefix}.double_conv.{bn_i}.bias"],
                training=training,
                eps=1e-5,
            )
            h = F.relu(h)
            # Dropout3d is identity in eval mode
        return h

    skips = []
    h = x
    for i in range(len(FEATURES)):
        h = double_conv(f"encoder.{i}", h)
        skips.append(h)
        h = F.max_pool3d(h, kernel_size=2, stride=2)
    h = double_conv("bottleneck", h)
    for i in range(len(FEATURES)):
        h = F.conv_transpose3d(
            h, sd[f"upconvs.{i}.weight"], sd[f"upconvs.{i}.bias"], stride=2
        )
        skip = skips[-(i + 1)]
        if h.shape != skip.shape:
            h = F.interpolate(h, size=skip.shape[2:])
        h = torch.cat([skip, h], dim=1)
        h = double_conv(f"decoder.{i}", h)
    return F.conv3d(h, sd["final_conv.weight"], sd["final_conv.bias"])


@pytest.mark.parametrize("conv_impl", ["xla", "pallas"])
def test_eval_forward_parity_with_torch(conv_impl):
    sd = reference_shaped_state_dict(features=FEATURES, seed=11)
    # scale conv weights down so activations stay in a well-conditioned range
    sd = {k: (v * 0.3 if v.ndim == 5 else v) for k, v in sd.items()}

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 1, 16, 16, 16)).astype(np.float32)

    with torch.no_grad():
        want = torch_reference_forward(sd, torch.from_numpy(x)).numpy()

    params, stats = torch_state_dict_to_trees(sd, num_levels=len(FEATURES))
    model = UNet3D(
        out_channels=4, features=FEATURES, dropout_rate=0.1,
        dtype=jnp.float32, conv_impl=conv_impl,
    )
    got = np.asarray(
        model.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
        )
    )
    assert got.shape == want.shape
    scale = np.abs(want).max() + 1e-6
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-5)


def _blob_batch(n=2, size=8, seed=0):
    rng = np.random.default_rng(seed)
    labels = np.zeros((n, size, size, size), np.int64)
    labels[:, 2:6, 2:6, 2:6] = 1
    labels[:, 0:2, 0:2, 0:2] = 2
    labels[:, 6:8, 6:8, 6:8] = 3
    images = labels[:, None] * 0.5 + rng.normal(0, 0.1, (n, 1, size, size, size))
    return images.astype(np.float32), labels


def _torch_trainables(sd):
    """Weight/bias leaves (requires_grad); running stats stay buffers."""
    out = {}
    for k, v in sd.items():
        if "running_" in k or "num_batches" in k:
            out[k] = v.clone()
        else:
            out[k] = v.clone().requires_grad_(True)
    return out


def _torch_grad_trees(sd, num_levels):
    """Convert the .grad tensors of a torch param dict into this
    framework's tree layout (reusing the weight converter — gradients
    have the weights' shapes; running stats carry no grads, so the
    conversion runs in non-strict mode)."""
    gsd = {k: v.grad for k, v in sd.items() if getattr(v, "grad", None) is not None}
    gparams, _ = torch_state_dict_to_trees(gsd, num_levels=num_levels, strict=False)
    return gparams


def test_train_step_gradient_parity_with_torch():
    """SGD train-step gradients (CE loss, train-mode BN) match torch
    autograd through the full reference net — VERDICT round-1 item 6."""
    from multimodal_segmentation_project_tpu.ops.losses import cross_entropy_loss

    base_sd = reference_shaped_state_dict(features=FEATURES, seed=21)
    base_sd = {k: (v * 0.3 if v.ndim == 5 else v) for k, v in base_sd.items()}
    images, labels = _blob_batch()

    # ---- torch side ----
    sd = _torch_trainables(base_sd)
    out = torch_reference_forward(sd, torch.from_numpy(images), training=True)
    loss_t = F.cross_entropy(out, torch.from_numpy(labels))
    loss_t.backward()
    want_grads = _torch_grad_trees(sd, num_levels=len(FEATURES))

    # ---- this framework ----
    params, stats = torch_state_dict_to_trees(base_sd, num_levels=len(FEATURES))
    model = UNet3D(
        out_channels=4, features=FEATURES, dropout_rate=0.0, dtype=jnp.float32
    )

    def loss_of(params):
        logits, _ = model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(images),
            train=True,
            mutable=["batch_stats"],
        )
        return cross_entropy_loss(logits, jnp.asarray(labels.astype(np.int32)))

    loss_j, got_grads = jax.value_and_grad(loss_of)(params)
    assert float(loss_j) == pytest.approx(float(loss_t), rel=1e-5)

    flat_want = jax.tree_util.tree_flatten_with_path(want_grads)[0]
    got_flat = dict(jax.tree_util.tree_flatten_with_path(got_grads)[0])
    assert len(flat_want) > 30  # every conv/bn/upconv/head weight compared
    compared = 0
    for path, a in flat_want:
        b = got_flat[path]
        a = np.asarray(a)
        keys = [getattr(k, "key", str(k)) for k in path]
        # conv/upconv biases feed (possibly through a linear conv) into
        # a train-mode BatchNorm, whose mean subtraction cancels any
        # constant channel offset: their TRUE gradient is exactly zero
        # and both stacks return only amplified roundoff noise (scaled
        # by 1/std) — incomparable across frameworks. Only the head
        # bias (no BN after it) carries a real bias gradient.
        bn_absorbed_bias = keys[-1] == "bias" and keys[0] != "head_bias" and (
            "up" in keys or keys[-2].startswith("conv")
        )
        if bn_absorbed_bias:
            assert np.abs(a).max() < 0.1 and np.abs(np.asarray(b)).max() < 0.1, path
            continue
        compared += 1
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(b) / scale, a / scale, atol=3e-4,
            err_msg=jax.tree_util.keystr(path),
        )
    assert compared > 20

    # one SGD step on matching grads lands on matching params
    lr = 0.05
    k = "encoder.0.double_conv.0.weight"
    with torch.no_grad():
        stepped_torch = (sd[k] - lr * sd[k].grad).numpy()
    stepped_jax = np.asarray(params["enc0"]["conv0"]["kernel"]) - lr * np.asarray(
        got_grads["enc0"]["conv0"]["kernel"]
    )
    np.testing.assert_allclose(
        stepped_jax, np.transpose(stepped_torch, (2, 3, 4, 1, 0)), atol=1e-6
    )


def test_training_convergence_dice_parity_with_torch():
    """Train both stacks from identical weights with identical data and
    plain SGD for 25 steps; final train-set Dice must agree within
    +-0.01 (BASELINE.md Dice-parity proxy without the datasets)."""
    from multimodal_segmentation_project_tpu.ops.losses import cross_entropy_loss
    from multimodal_segmentation_project_tpu.ops.metrics import calculate_dice

    base_sd = reference_shaped_state_dict(features=FEATURES, seed=31)
    base_sd = {k: (v * 0.3 if v.ndim == 5 else v) for k, v in base_sd.items()}
    images, labels = _blob_batch(n=2)
    lr, steps = 0.5, 60

    # ---- torch: manual SGD over the functional reference net ----
    sd = _torch_trainables(base_sd)
    for _ in range(steps):
        for v in sd.values():
            if v.requires_grad and v.grad is not None:
                v.grad = None
        out = torch_reference_forward(sd, torch.from_numpy(images), training=True)
        loss = F.cross_entropy(out, torch.from_numpy(labels))
        loss.backward()
        with torch.no_grad():
            for v in sd.values():
                if v.requires_grad:
                    v -= lr * v.grad
    with torch.no_grad():
        final_t = torch_reference_forward(sd, torch.from_numpy(images), training=False)
    dice_torch = float(
        calculate_dice(jnp.asarray(final_t.numpy()), jnp.asarray(labels.astype(np.int32)))
    )

    # ---- this framework: same init, same data, same SGD ----
    params, stats = torch_state_dict_to_trees(base_sd, num_levels=len(FEATURES))
    model = UNet3D(
        out_channels=4, features=FEATURES, dropout_rate=0.0, dtype=jnp.float32
    )
    x = jnp.asarray(images)
    y = jnp.asarray(labels.astype(np.int32))

    @jax.jit
    def step(params, stats):
        def loss_of(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": stats},
                x, train=True, mutable=["batch_stats"],
            )
            return cross_entropy_loss(logits, y), mut["batch_stats"]

        (_, new_stats), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
        params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return params, new_stats

    for _ in range(steps):
        params, stats = step(params, stats)
    # jitted eval probe (the production eval path is jitted too): eager
    # full-model applies after long jitted loops were the recurring
    # SIGABRT site of the suite-stability issue (see tests/conftest.py)
    final_j = jax.jit(lambda p, s: model.apply(
        {"params": p, "batch_stats": s}, x, train=False
    ))(params, stats)
    dice_jax = float(calculate_dice(final_j, y))

    # CE on this tiny fixture (two 2^3 foreground corners) caps macro
    # dice around ~0.3; the load-bearing assertion is the cross-stack
    # parity bound, the floor just proves real learning happened
    assert dice_jax > 0.25, f"training failed to converge (dice={dice_jax})"
    assert abs(dice_jax - dice_torch) <= 0.01, (dice_jax, dice_torch)


def test_train_mode_bn_matches_torch_batch_stats():
    """Training-mode BN uses batch statistics in both frameworks."""
    sd = reference_shaped_state_dict(features=FEATURES, seed=5)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 1, 8, 8, 8)).astype(np.float32)

    # torch: one DoubleConv in train mode (batch stats), dropout off
    h = torch.from_numpy(x)
    with torch.no_grad():
        for conv_i, bn_i in ((0, 1), (4, 5)):
            h = F.conv3d(h, sd[f"encoder.0.double_conv.{conv_i}.weight"],
                         sd[f"encoder.0.double_conv.{conv_i}.bias"], padding=1)
            h = F.batch_norm(
                h,
                sd[f"encoder.0.double_conv.{bn_i}.running_mean"].clone(),
                sd[f"encoder.0.double_conv.{bn_i}.running_var"].clone(),
                sd[f"encoder.0.double_conv.{bn_i}.weight"],
                sd[f"encoder.0.double_conv.{bn_i}.bias"],
                training=True, eps=1e-5,
            )
            h = F.relu(h)
    want = h.numpy()

    from multimodal_segmentation_project_tpu.models.unet3d import DoubleConv

    params, stats = torch_state_dict_to_trees(sd, num_levels=len(FEATURES))
    block = DoubleConv(FEATURES[0], dropout_rate=0.0, dtype=jnp.float32, conv_impl="xla")
    got, _ = block.apply(
        {"params": params["enc0"], "batch_stats": stats["enc0"]},
        jnp.asarray(x),
        True,
        mutable=["batch_stats"],
    )
    scale = np.abs(want).max() + 1e-6
    np.testing.assert_allclose(np.asarray(got) / scale, want / scale, atol=5e-5)


def _torch_ce_tversky(pred, target_idx, alpha=0.5, beta=0.5):
    """Reference combined_ce_tversky_loss, functionally
    (utils/metrics.py:137-167: softmax tversky over foreground classes,
    eps 1e-6, mixed 0.3*CE + 0.7*tversky; drivers pass alpha=beta=0.5,
    train_unet.py:202)."""
    ce = F.cross_entropy(pred, target_idx)
    p = torch.softmax(pred, dim=1)
    tl = 0.0
    for c in range(1, p.size(1)):
        pm = p[:, c]
        tm = (target_idx == c).float()
        tp = (pm * tm).sum()
        fp = (pm * (1 - tm)).sum()
        fn = ((1 - pm) * tm).sum()
        tl = tl + (1 - (tp + 1e-6) / (tp + alpha * fp + beta * fn + 1e-6))
    tl = tl / (p.size(1) - 1)
    return 0.3 * ce + 0.7 * tl


def test_training_convergence_production_recipe_parity_with_torch():
    """Round-2 verdict item 4: convergence parity under the PRODUCTION
    recipe — AdamW(lr 1e-3, wd 1e-4) + ce_tversky(alpha=beta=0.5)
    (run_training.sh:26,31,77) on 16^3 fixtures, through this
    framework's REAL train step (make_train_step + TrainState), not a
    hand-rolled SGD loop. Final train-set Dice within +-0.01 of torch."""
    from multimodal_segmentation_project_tpu.engine import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )
    from multimodal_segmentation_project_tpu.ops.losses import get_loss_fn
    from multimodal_segmentation_project_tpu.ops.metrics import calculate_dice

    base_sd = reference_shaped_state_dict(features=FEATURES, seed=41)
    base_sd = {k: (v * 0.3 if v.ndim == 5 else v) for k, v in base_sd.items()}
    images, labels = _blob_batch(n=2, size=16, seed=7)
    # at the production lr the fixture's dice stays flat until ~step
    # 200 and reaches ~0.32 by 250 (probed on the torch side)
    lr, wd, steps = 1e-3, 1e-4, 250

    # ---- torch: functional reference net + torch.optim.AdamW ----
    sd = _torch_trainables(base_sd)
    opt = torch.optim.AdamW(
        [v for v in sd.values() if v.requires_grad], lr=lr, weight_decay=wd
    )
    for _ in range(steps):
        opt.zero_grad()
        out = torch_reference_forward(sd, torch.from_numpy(images), training=True)
        loss = _torch_ce_tversky(out, torch.from_numpy(labels))
        loss.backward()
        opt.step()
    with torch.no_grad():
        final_t = torch_reference_forward(sd, torch.from_numpy(images), training=False)
    dice_torch = float(
        calculate_dice(jnp.asarray(final_t.numpy()), jnp.asarray(labels.astype(np.int32)))
    )

    # ---- this framework: the production train step ----
    params, stats = torch_state_dict_to_trees(base_sd, num_levels=len(FEATURES))
    model = UNet3D(
        out_channels=4, features=FEATURES, dropout_rate=0.0, dtype=jnp.float32
    )
    tx = make_optimizer(weight_decay=wd, grad_accum_steps=1)
    state = create_train_state(
        model, jax.random.key(0), jnp.asarray(images[:1]), tx, lr
    )
    state = state.replace(params=params, batch_stats=stats)
    step = make_train_step(get_loss_fn("ce_tversky"), augment=False)
    x = jnp.asarray(images)
    y = jnp.asarray(labels.astype(np.int32))
    for i in range(steps):
        state, metrics = step(state, x, y, jax.random.key(i))
    # jitted eval probe — see the note in the CE/SGD convergence test
    final_j = jax.jit(lambda p, s: model.apply(
        {"params": p, "batch_stats": s}, x, train=False
    ))(state.params, state.batch_stats)
    dice_jax = float(calculate_dice(final_j, y))

    assert dice_jax > 0.25, f"training failed to converge (dice={dice_jax})"
    assert abs(dice_jax - dice_torch) <= 0.01, (dice_jax, dice_torch)


def test_per_organ_eval_path_parity_with_torch():
    """Round-2 verdict item 4: per-organ Dice/IoU through the EVAL path
    (argmax -> per-class overlap, eps 1e-5, absent organ scored 0.0)
    matches a torch-functional replica of the reference's evaluator
    (test_model.py:255-285) on the same imported weights."""
    from multimodal_segmentation_project_tpu.ops.metrics import (
        per_class_dice_iou_per_sample,
    )

    sd = reference_shaped_state_dict(features=FEATURES, seed=51)
    sd = {k: (v * 0.3 if v.ndim == 5 else v) for k, v in sd.items()}
    images, labels = _blob_batch(n=2, size=16, seed=9)
    labels[1][labels[1] == 2] = 0  # one volume with an ABSENT organ

    # ---- torch eval path (reference loop, one volume at a time) ----
    want = np.zeros((2, 3, 2), np.float64)  # (sample, organ, dice|iou)
    with torch.no_grad():
        out = torch_reference_forward(sd, torch.from_numpy(images), training=False)
    pred_t = torch.argmax(out, dim=1)
    for j in range(2):
        lbl = torch.from_numpy(labels[j])
        for oi, class_idx in enumerate((1, 2, 3)):
            pm = pred_t[j] == class_idx
            lm = lbl == class_idx
            if lm.sum() > 0:
                inter = (pm & lm).sum().float()
                union = pm.sum() + lm.sum()
                want[j, oi, 0] = float((2.0 * inter + 1e-5) / (union + 1e-5))
                want[j, oi, 1] = float(
                    (inter + 1e-5) / (pm.sum() + lm.sum() - inter + 1e-5)
                )

    # ---- this framework's eval path ----
    params, stats = torch_state_dict_to_trees(sd, num_levels=len(FEATURES))
    model = UNet3D(
        out_channels=4, features=FEATURES, dropout_rate=0.0, dtype=jnp.float32
    )
    logits = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(images), train=False
    )
    pred_j = jnp.argmax(logits, axis=1)
    # both stacks must agree on the hard prediction itself first
    np.testing.assert_array_equal(np.asarray(pred_j), pred_t.numpy())
    organ = per_class_dice_iou_per_sample(
        pred_j, jnp.asarray(labels.astype(np.int32)), num_classes=4
    )
    np.testing.assert_allclose(np.asarray(organ["dice"]), want[:, :, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(organ["iou"]), want[:, :, 1], atol=1e-5)
    assert not bool(organ["present"][1, 1])  # absent organ detected
    assert float(organ["dice"][1, 1]) == 0.0  # and scored 0.0
