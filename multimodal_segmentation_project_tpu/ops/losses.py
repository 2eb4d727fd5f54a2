"""Segmentation losses as pure jitted JAX functions.

Numerical parity targets (formulas, constants, reductions) are the
reference implementations in ``utils/metrics.py`` of
fransiskusbudi/multimodal_segmentation_project:

  * ``combined_loss``            -> utils/metrics.py:14-40
  * ``tversky_loss``             -> utils/metrics.py:137-156
  * ``combined_ce_tversky_loss`` -> utils/metrics.py:158-167
  * ``distillation_loss``        -> utils/metrics.py:169-190
  * dice-only loss               -> train_unet.py:185-199 (get_loss_fn 'dice')

Layout: this framework is channel-LAST (NDHWC, TPU-native), so
``logits`` are ``(B, *spatial, C)`` and ``labels`` are integer class
maps ``(B, *spatial)``.  The reference is channel-first with a
singleton label channel; drivers adapt at the boundary.

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


def _foreground_one_hot(labels: jax.Array, num_classes: int) -> jax.Array:
    """One-hot of the foreground classes 1..C-1, shape (*labels, C-1), f32."""
    oh = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    return oh[..., 1:]


def cross_entropy_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax cross-entropy over all voxels (torch nn.CrossEntropyLoss)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)
    return -jnp.mean(ll)


def soft_dice_loss(logits: jax.Array, labels: jax.Array, epsilon: float = 1e-5) -> jax.Array:
    """Soft multi-class dice loss over foreground classes (global sums).

    Matches the reference 'dice' loss (train_unet.py:185-199) and the
    dice term of ``combined_loss`` (utils/metrics.py:27-38):
    ``mean_c [1 - (2*I_c + eps) / (P_c + T_c + eps)]`` with eps=1e-5.
    """
    num_classes = logits.shape[-1]
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., 1:]
    t = _foreground_one_hot(labels, num_classes)
    axes = tuple(range(p.ndim - 1))
    inter = jnp.sum(p * t, axis=axes)
    union = jnp.sum(p, axis=axes) + jnp.sum(t, axis=axes)
    dice = (2.0 * inter + epsilon) / (union + epsilon)
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
    num_classes = logits.shape[-1]
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., 1:]
    t = _foreground_one_hot(labels, num_classes)
    axes = tuple(range(p.ndim - 1))
    tp = jnp.sum(p * t, axis=axes)
    fp = jnp.sum(p * (1.0 - t), axis=axes)
    fn = jnp.sum((1.0 - p) * t, axis=axes)
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
    s_logp = jax.nn.log_softmax(s, axis=-1)
    t_p = jax.nn.softmax(t, axis=-1)
    t_logp = jax.nn.log_softmax(t, axis=-1)
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
