"""Segmentation losses as pure jitted JAX functions (channel-first).

Numerical parity targets (formulas, constants, reductions) are the
reference implementations in ``utils/metrics.py`` of
fransiskusbudi/multimodal_segmentation_project:

  * ``combined_loss``            -> utils/metrics.py:14-40
  * ``tversky_loss``             -> utils/metrics.py:137-156
  * ``combined_ce_tversky_loss`` -> utils/metrics.py:158-167
  * ``distillation_loss``        -> utils/metrics.py:169-190
  * dice-only loss               -> train_unet.py:185-199 (get_loss_fn 'dice')

Layout: logits are CHANNEL-FIRST ``(B, C, *spatial)`` — the reference's
torch layout AND the TPU-efficient one: a channels-minor (B, ..., 4)
volume would be lane-padded 32x by the (8|16, 128) vector-memory tiling,
turning the fp32 loss temporaries into multi-GB buffers (measured: the
192^3 train step drops ~3 GB of HBM by keeping the loss path
channel-first). Labels are integer class maps ``(B, *spatial)``; a 2D
``(B, C)`` logits / ``(B,)`` labels pair (the DANN domain head) works
through the same functions.

All reductions are GLOBAL sums over batch+spatial (matching the
reference, which sums over the full tensor rather than per-sample) and
are computed in float32 regardless of the compute dtype.

Known reference quirks consciously preserved:
  * ``combined_ce_tversky_loss`` hard-codes the 0.3/0.7 CE/Tversky mix
    while exposing Tversky alpha/beta (utils/metrics.py:158-167).
  * ``distillation_loss`` calls the CE+Tversky term with the DEFAULT
    alpha=0.7/beta=0.3 (not the drivers' 0.5/0.5) and reduces the KL
    term with a global mean (not batchmean), then scales by T^2
    (utils/metrics.py:183-189).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

CH = 1  # channel axis (B, C, *spatial)


def _per_class_fg_sums(logits: jax.Array, labels: jax.Array):
    """Per foreground class c: (sum p_c*t_c, sum p_c, sum t_c,
    sum p_c*(1-t_c), sum (1-p_c)*t_c) via fused compare+reduce passes.

    Looping the C-1 classes keeps everything as elementwise+reduction
    fusions over compact volumes; a broadcast (B, C-1, *spatial) fp32
    one-hot would materialize ~340 MB buffers at 192^3.
    """
    num_classes = logits.shape[CH]
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=CH)
    tp, ps, ts, fp, fn = [], [], [], [], []
    for c in range(1, num_classes):
        pc = jax.lax.index_in_dim(p, c, axis=CH, keepdims=False)
        tc = (labels == c).astype(jnp.float32)
        tpc = jnp.sum(pc * tc)
        psc = jnp.sum(pc)
        tsc = jnp.sum(tc)
        tp.append(tpc)
        ps.append(psc)
        ts.append(tsc)
        fp.append(psc - tpc)  # sum p*(1-t) = sum p - sum p*t
        fn.append(tsc - tpc)  # sum (1-p)*t = sum t - sum p*t
    stack = lambda v: jnp.stack(v)
    return stack(tp), stack(ps), stack(ts), stack(fp), stack(fn)


def cross_entropy_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax cross-entropy over all voxels (torch nn.CrossEntropyLoss).

    The label log-prob is selected with a broadcast compare-and-sum
    rather than take_along_axis: a volume-sized gather lowers to a
    ~150 ms sort+gather kernel on TPU (it was the single hottest op of
    the train step), while compare+select fuses into the surrounding
    elementwise pass.
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=CH)
    num_classes = logits.shape[CH]
    classes = jnp.arange(num_classes).reshape((1, -1) + (1,) * (labels.ndim - 1))
    picked = jnp.sum(jnp.where(labels[:, None] == classes, logp, 0.0), axis=CH)
    return -jnp.mean(picked)


def soft_dice_loss(logits: jax.Array, labels: jax.Array, epsilon: float = 1e-5) -> jax.Array:
    """Soft multi-class dice loss over foreground classes (global sums).

    Matches the reference 'dice' loss (train_unet.py:185-199) and the
    dice term of ``combined_loss`` (utils/metrics.py:27-38):
    ``mean_c [1 - (2*I_c + eps) / (P_c + T_c + eps)]`` with eps=1e-5.
    """
    tp, ps, ts, _, _ = _per_class_fg_sums(logits, labels)
    dice = (2.0 * tp + epsilon) / (ps + ts + epsilon)
    return jnp.mean(1.0 - dice)


def combined_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """CE + mean foreground soft-dice (reference utils/metrics.py:14-40)."""
    return cross_entropy_loss(logits, labels) + soft_dice_loss(logits, labels)


def tversky_loss(
    logits: jax.Array,
    labels: jax.Array,
    alpha: float = 0.5,
    beta: float = 0.5,
    epsilon: float = 1e-6,
) -> jax.Array:
    """Multi-class Tversky loss over foreground classes (utils/metrics.py:137-156)."""
    tp, _, _, fp, fn = _per_class_fg_sums(logits, labels)
    tversky = (tp + epsilon) / (tp + alpha * fp + beta * fn + epsilon)
    return jnp.mean(1.0 - tversky)


def combined_ce_tversky_loss(
    logits: jax.Array,
    labels: jax.Array,
    alpha: float = 0.7,
    beta: float = 0.3,
) -> jax.Array:
    """0.3*CE + 0.7*Tversky(alpha, beta)  (utils/metrics.py:158-167).

    The 0.3/0.7 mix is hard-coded exactly as in the reference; drivers
    pass alpha=beta=0.5 (train_unet.py:200-203).
    """
    ce = cross_entropy_loss(logits, labels)
    tv = tversky_loss(logits, labels, alpha=alpha, beta=beta)
    return 0.3 * ce + 0.7 * tv


def distillation_loss(
    student_logits: jax.Array,
    teacher_logits: jax.Array,
    labels: jax.Array,
    alpha: float = 0.7,
    temperature: float = 2.0,
) -> jax.Array:
    """KD loss: alpha*(CE+Tversky) + (1-alpha)*T^2*KL(teacher||student).

    Parity with utils/metrics.py:169-190 including its quirks: the
    segmentation term uses combined_ce_tversky_loss with ITS defaults
    (Tversky alpha=0.7/beta=0.3), and the KL term is a global mean over
    every element (batch, spatial AND class dims), not batchmean.
    """
    seg = combined_ce_tversky_loss(student_logits, labels)
    s = student_logits.astype(jnp.float32) / temperature
    t = teacher_logits.astype(jnp.float32) / temperature
    s_logp = jax.nn.log_softmax(s, axis=CH)
    t_p = jax.nn.softmax(t, axis=CH)
    t_logp = jax.nn.log_softmax(t, axis=CH)
    # torch F.kl_div(input=s_logp, target=t_p, 'none') = t_p * (log t_p - s_logp)
    # with the 0*log0 -> 0 convention handled by using log_softmax directly.
    kl = t_p * (t_logp - s_logp)
    kl = jnp.mean(kl) * (temperature**2)
    return alpha * seg + (1.0 - alpha) * kl


def get_loss_fn(loss_type: str):
    """Loss registry matching the reference drivers (train_unet.py:178-205).

    The drivers call tversky/ce_tversky with alpha=beta=0.5. The
    reference's 'ce' option is broken there (passes (B,1,...) targets to
    CrossEntropyLoss); here it is simply correct CE.
    """
    if loss_type == "ce":
        return cross_entropy_loss
    if loss_type == "tversky":
        return lambda logits, labels: tversky_loss(logits, labels, alpha=0.5, beta=0.5)
    if loss_type == "dice":
        return soft_dice_loss
    if loss_type == "ce_tversky":
        return lambda logits, labels: combined_ce_tversky_loss(logits, labels, alpha=0.5, beta=0.5)
    return combined_loss
