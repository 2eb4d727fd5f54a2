"""Parity tests of metrics against independent numpy oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_segmentation_project_tpu.ops import metrics

pytestmark = pytest.mark.smoke


def np_macro_dice_iou(pred, labels, num_classes=4, eps=1e-5):
    dices, ious = [], []
    for c in range(1, num_classes):
        pm = pred == c
        tm = labels == c
        if tm.sum() == 0:
            continue
        inter = float(np.logical_and(pm, tm).sum())
        dices.append((2 * inter + eps) / (pm.sum() + tm.sum() + eps))
        ious.append((inter + eps) / (pm.sum() + tm.sum() - inter + eps))
    if not dices:
        return 0.0, 0.0
    return float(np.mean(dices)), float(np.mean(ious))


def test_dice_iou_accuracy_parity(logits_labels):
    logits, labels = logits_labels
    pred = logits.argmax(1)
    want_dice, want_iou = np_macro_dice_iou(pred, labels)
    got_dice = float(metrics.calculate_dice(jnp.array(logits), jnp.array(labels)))
    got_iou = float(metrics.calculate_iou(jnp.array(logits), jnp.array(labels)))
    got_acc = float(metrics.calculate_accuracy(jnp.array(logits), jnp.array(labels)))
    assert got_dice == pytest.approx(want_dice, rel=1e-6)
    assert got_iou == pytest.approx(want_iou, rel=1e-6)
    assert got_acc == pytest.approx(float((pred == labels).mean()), rel=1e-6)


def test_fused_metrics_match_individual(logits_labels):
    logits, labels = logits_labels
    m = metrics.segmentation_metrics(jnp.array(logits), jnp.array(labels))
    assert float(m["dice"]) == pytest.approx(
        float(metrics.calculate_dice(jnp.array(logits), jnp.array(labels))), rel=1e-6
    )
    assert float(m["iou"]) == pytest.approx(
        float(metrics.calculate_iou(jnp.array(logits), jnp.array(labels))), rel=1e-6
    )
    assert float(m["acc"]) == pytest.approx(
        float(metrics.calculate_accuracy(jnp.array(logits), jnp.array(labels))), rel=1e-6
    )


def test_absent_classes_skipped():
    # Target contains only background + class 2: classes 1 and 3 must be
    # excluded from the macro average (utils/metrics.py:83,110 semantics).
    labels = np.zeros((1, 6, 6, 6), dtype=np.int32)
    labels[0, :3] = 2
    logits = np.full((1, 4, 6, 6, 6), -10.0, dtype=np.float32)
    logits[:, 0] = 10.0  # predict all background
    d = float(metrics.calculate_dice(jnp.array(logits), jnp.array(labels)))
    # one valid class (2), dice = eps/(t+eps) ~ 0
    assert d < 1e-3
    # now predict class 2 perfectly -> dice 1.0 even though 1,3 absent
    logits2 = np.full((1, 4, 6, 6, 6), -10.0, dtype=np.float32)
    logits2[:, 0] = np.where(labels[0] == 0, 10.0, -10.0)
    logits2[:, 2] = np.where(labels[0] == 2, 10.0, -10.0)
    d2 = float(metrics.calculate_dice(jnp.array(logits2), jnp.array(labels)))
    assert d2 == pytest.approx(1.0, abs=1e-5)


def test_all_background_returns_zero():
    labels = np.zeros((1, 4, 4, 4), dtype=np.int32)
    logits = np.zeros((1, 4, 4, 4, 4), dtype=np.float32)
    assert float(metrics.calculate_dice(jnp.array(logits), jnp.array(labels))) == 0.0
    assert float(metrics.calculate_iou(jnp.array(logits), jnp.array(labels))) == 0.0


def test_per_class_eval_semantics():
    # Eval pipeline: absent organ scored 0.0 (test_model.py:274-276 semantics).
    labels = np.zeros((1, 6, 6, 6), dtype=np.int32)
    labels[0, :2] = 1  # only spleen present
    pred = labels.copy()
    out = metrics.per_class_dice_iou(jnp.array(pred), jnp.array(labels), num_classes=4)
    dice = np.asarray(out["dice"])
    present = np.asarray(out["present"])
    assert present.tolist() == [True, False, False]
    assert dice[0] == pytest.approx(1.0, abs=1e-5)
    assert dice[1] == 0.0 and dice[2] == 0.0


def test_legacy_binary_trio():
    # reference utils/metrics.py:42-63 semantics: 0.5 threshold,
    # per-sample dice/iou then batch mean
    rng = np.random.default_rng(7)
    pred = rng.uniform(0, 1, size=(2, 1, 4, 4, 4)).astype(np.float32)
    target = (rng.uniform(0, 1, size=(2, 1, 4, 4, 4)) > 0.5).astype(np.float32)
    p = (pred > 0.5).astype(np.float64)
    inter = (p * target).sum(axis=(1, 2, 3, 4))
    union = p.sum(axis=(1, 2, 3, 4)) + target.sum(axis=(1, 2, 3, 4))
    want_dice = np.mean((2 * inter + 1e-6) / (union + 1e-6))
    want_iou = np.mean((inter + 1e-6) / (union - inter + 1e-6))
    assert float(metrics.dice_score(jnp.array(pred), jnp.array(target))) == pytest.approx(want_dice, rel=1e-6)
    assert float(metrics.iou_score(jnp.array(pred), jnp.array(target))) == pytest.approx(want_iou, rel=1e-6)
    want_acc = np.mean(p == target)
    assert float(metrics.accuracy_score(jnp.array(pred), jnp.array(target))) == pytest.approx(want_acc, rel=1e-6)


def test_per_class_per_sample_matches_batch1():
    """per_class_dice_iou_per_sample == per_class_dice_iou applied to
    each volume separately (the batched/sharded eval path's contract)."""
    import numpy as np
    from multimodal_segmentation_project_tpu.ops.metrics import (
        per_class_dice_iou,
        per_class_dice_iou_per_sample,
    )

    rng = np.random.default_rng(3)
    pred = rng.integers(0, 4, size=(3, 6, 6, 6))
    lbl = rng.integers(0, 4, size=(3, 6, 6, 6))
    lbl[1][lbl[1] == 2] = 0  # one volume with an absent organ
    got = per_class_dice_iou_per_sample(pred, lbl, num_classes=4)
    for j in range(3):
        want = per_class_dice_iou(pred[j : j + 1], lbl[j : j + 1], num_classes=4)
        np.testing.assert_allclose(
            np.asarray(got["dice"][j]), np.asarray(want["dice"]), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(got["iou"][j]), np.asarray(want["iou"]), rtol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(got["present"][j]), np.asarray(want["present"])
        )
