"""Numerical-parity tests of losses against independent numpy oracles.

The oracles re-derive the reference formulas (utils/metrics.py of the
reference repo) in vectorized numpy (channel-LAST internally), so any
transcription error in the JAX implementation (channel-FIRST, the
torch/reference layout) or the oracle shows up as a mismatch.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_segmentation_project_tpu.ops import losses

pytestmark = pytest.mark.smoke


# ---------- numpy oracles (vectorized, channel-last internally) ----------


def cl(logits):
    """channel-first (B,C,...) -> channel-last for the oracles."""
    return np.moveaxis(logits, 1, -1)

def np_softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def np_ce(logits, labels):
    logp = np.log(np_softmax(logits))
    gathered = np.take_along_axis(logp, labels[..., None], axis=-1)
    return -gathered.mean()


def np_one_hot_fg(labels, c):
    oh = np.eye(c, dtype=np.float64)[labels]
    return oh[..., 1:]


def np_dice_loss(logits, labels, eps=1e-5):
    c = logits.shape[-1]
    p = np_softmax(logits.astype(np.float64))[..., 1:]
    t = np_one_hot_fg(labels, c)
    axes = tuple(range(p.ndim - 1))
    inter = (p * t).sum(axis=axes)
    union = p.sum(axis=axes) + t.sum(axis=axes)
    return (1 - (2 * inter + eps) / (union + eps)).mean()


def np_tversky(logits, labels, alpha, beta, eps=1e-6):
    c = logits.shape[-1]
    p = np_softmax(logits.astype(np.float64))[..., 1:]
    t = np_one_hot_fg(labels, c)
    axes = tuple(range(p.ndim - 1))
    tp = (p * t).sum(axis=axes)
    fp = (p * (1 - t)).sum(axis=axes)
    fn = ((1 - p) * t).sum(axis=axes)
    tv = (tp + eps) / (tp + alpha * fp + beta * fn + eps)
    return (1 - tv).mean()


def np_ce_tversky(logits, labels, alpha=0.7, beta=0.3):
    return 0.3 * np_ce(logits, labels) + 0.7 * np_tversky(logits, labels, alpha, beta)


def np_kd(student, teacher, labels, alpha=0.7, T=2.0):
    seg = np_ce_tversky(student, labels)  # reference uses ITS defaults 0.7/0.3
    sp = np.log(np_softmax(student.astype(np.float64) / T))
    tp = np_softmax(teacher.astype(np.float64) / T)
    kl = tp * (np.log(tp) - sp)
    return alpha * seg + (1 - alpha) * kl.mean() * T**2


# ---------- tests ----------

def test_cross_entropy_parity(logits_labels):
    logits, labels = logits_labels
    got = float(losses.cross_entropy_loss(jnp.array(logits), jnp.array(labels)))
    want = np_ce(cl(logits).astype(np.float64), labels)
    assert got == pytest.approx(want, rel=1e-5)


def test_soft_dice_parity(logits_labels):
    logits, labels = logits_labels
    got = float(losses.soft_dice_loss(jnp.array(logits), jnp.array(labels)))
    assert got == pytest.approx(np_dice_loss(cl(logits), labels), rel=1e-5)


def test_combined_loss_parity(logits_labels):
    logits, labels = logits_labels
    got = float(losses.combined_loss(jnp.array(logits), jnp.array(labels)))
    want = np_ce(cl(logits).astype(np.float64), labels) + np_dice_loss(cl(logits), labels)
    assert got == pytest.approx(want, rel=1e-5)


@pytest.mark.parametrize("alpha,beta", [(0.5, 0.5), (0.7, 0.3), (0.3, 0.7)])
def test_tversky_parity(logits_labels, alpha, beta):
    logits, labels = logits_labels
    got = float(losses.tversky_loss(jnp.array(logits), jnp.array(labels), alpha, beta))
    assert got == pytest.approx(np_tversky(cl(logits), labels, alpha, beta), rel=1e-5)


def test_tversky_equals_dice_at_half():
    # Tversky(0.5, 0.5) is the soft-dice formulation: cross-check the two
    # implementations agree up to their different epsilons.
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(1, 4, 6, 6, 6)).astype(np.float32) * 3
    labels = rng.integers(0, 4, size=(1, 6, 6, 6)).astype(np.int32)
    tv = float(losses.tversky_loss(jnp.array(logits), jnp.array(labels), 0.5, 0.5))
    dc = float(losses.soft_dice_loss(jnp.array(logits), jnp.array(labels)))
    assert tv == pytest.approx(dc, abs=1e-4)


def test_ce_tversky_parity(logits_labels):
    logits, labels = logits_labels
    got = float(
        losses.combined_ce_tversky_loss(jnp.array(logits), jnp.array(labels), 0.5, 0.5)
    )
    assert got == pytest.approx(
        0.3 * np_ce(cl(logits).astype(np.float64), labels)
        + 0.7 * np_tversky(cl(logits), labels, 0.5, 0.5),
        rel=1e-5,
    )


def test_distillation_parity(rng, logits_labels):
    student, labels = logits_labels
    teacher = rng.normal(size=student.shape).astype(np.float32)
    got = float(
        losses.distillation_loss(
            jnp.array(student), jnp.array(teacher), jnp.array(labels), 0.7, 2.0
        )
    )
    assert got == pytest.approx(np_kd(cl(student), cl(teacher), labels, 0.7, 2.0), rel=1e-5)


def test_distillation_perfect_teacher_match(rng):
    # KL term vanishes when student == teacher.
    logits = rng.normal(size=(1, 4, 4, 4, 4)).astype(np.float32)
    labels = rng.integers(0, 4, size=(1, 4, 4, 4)).astype(np.int32)
    kd = float(
        losses.distillation_loss(jnp.array(logits), jnp.array(logits), jnp.array(labels), 0.7, 2.0)
    )
    seg = float(losses.combined_ce_tversky_loss(jnp.array(logits), jnp.array(labels)))
    assert kd == pytest.approx(0.7 * seg, abs=1e-6)


def test_loss_registry():
    for name in ["ce", "tversky", "dice", "ce_tversky", "combined"]:
        fn = losses.get_loss_fn(name)
        rng = np.random.default_rng(1)
        logits = jnp.array(rng.normal(size=(1, 4, 4, 4, 4)).astype(np.float32))
        labels = jnp.array(rng.integers(0, 4, size=(1, 4, 4, 4)).astype(np.int32))
        val = float(fn(logits, labels))
        assert np.isfinite(val) and val > 0


def test_perfect_prediction_low_loss():
    labels = np.zeros((1, 8, 8, 8), dtype=np.int32)
    labels[0, 2:6, 2:6, 2:6] = 1
    logits = np.full((1, 4, 8, 8, 8), -20.0, dtype=np.float32)
    logits[:, 0] = np.where(labels[0] == 0, 20.0, -20.0)
    logits[:, 1] = np.where(labels[0] == 1, 20.0, -20.0)
    loss = float(losses.combined_ce_tversky_loss(jnp.array(logits), jnp.array(labels), 0.5, 0.5))
    assert loss < 1e-3
