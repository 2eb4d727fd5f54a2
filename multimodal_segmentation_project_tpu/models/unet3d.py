"""TPU-native 3D U-Net in Flax (linen), channel-last NDHWC.

Capability parity with the reference models (models/unet.py:6-90 and
models/unet_dann.py:65-98 of fransiskusbudi/multimodal_segmentation_project):
4-level encoder/decoder with DoubleConv blocks ([3x3x3 conv -> BN ->
ReLU -> channel dropout] x2), 2x max-pool downsampling, 2x
transpose-conv upsampling with skip concatenation, a trilinear resize
guard for odd shapes (models/unet.py:81-83), a 1x1x1 output head, and an
optional global-average-pooled bottleneck feature vector for the DANN
domain head (models/unet_dann.py:76-79) — one model class serves both
(the reference keeps two near-identical copies).

TPU-first design choices (not a translation):
  * NDHWC layout — XLA's native conv layout on TPU; the reference is
    NCDHW (cuDNN-preferred).
  * bf16 compute / fp32 params via the ``dtype`` attribute; BN
    statistics are accumulated in fp32 by flax regardless of dtype.
    No GradScaler needed (the reference hand-rolls fp16 scaling,
    train_dann.py:240-265).
  * optional activation rematerialization (``remat=True``) on the
    DoubleConv blocks — the memory lever for full 192^3 volumes,
    replacing the reference's "batch 1 + fp16 + small widths" coping
    strategy (SURVEY.md section 5.7).
  * BatchNorm under data parallelism: with jit + a sharded batch axis,
    XLA computes GLOBAL batch statistics (sync-BN). The reference's DDP
    default is per-replica stats; with per-device batch 1 this is a
    conscious, documented divergence (sync-BN is strictly more stable).
  * Dropout matches torch nn.Dropout3d channel-wise semantics via
    ``broadcast_dims`` over the spatial axes.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class DoubleConv(nn.Module):
    """[Conv3d(3x3x3, SAME) -> BatchNorm -> ReLU -> Dropout3d] x 2."""

    features: int
    dropout_rate: float = 0.1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i in range(2):
            x = nn.Conv(
                self.features,
                kernel_size=(3, 3, 3),
                padding="SAME",
                use_bias=True,
                dtype=self.dtype,
                kernel_init=nn.initializers.he_normal(),
                name=f"conv{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name=f"bn{i}",
            )(x)
            x = nn.relu(x)
            if self.dropout_rate > 0.0:
                # channel-wise dropout (torch Dropout3d): one mask per
                # (batch, channel), broadcast over D/H/W.
                x = nn.Dropout(
                    rate=self.dropout_rate,
                    broadcast_dims=(1, 2, 3),
                    deterministic=not train,
                    name=f"drop{i}",
                )(x)
        return x


class UNet3D(nn.Module):
    """3D U-Net for volumetric segmentation (NDHWC in, fp32 logits out).

    Args mirror the reference constructor (models/unet.py:34-37):
      out_channels: number of classes (4: bg/spleen/liver/kidneys).
      features: encoder widths; bottleneck is features[-1]*2.
      dropout_rate: channel-dropout rate inside DoubleConv.
      dtype: compute dtype (bf16 on TPU; params stay fp32).
      remat: checkpoint DoubleConv activations (memory vs FLOPs).
    """

    in_channels: int = 1
    out_channels: int = 4
    features: Sequence[int] = (16, 32, 64, 128)
    dropout_rate: float = 0.1
    dtype: Any = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        train: bool = False,
        return_features: bool = False,
    ):
        """Forward pass.

        x: (B, D, H, W, C_in). Returns fp32 logits (B, D, H, W, out_channels);
        with ``return_features=True`` also the fp32 global-average-pooled
        bottleneck (B, features[-1]*2) for the DANN domain head.
        """
        block_cls = DoubleConv
        if self.remat:
            # arg 0 is the module instance; 2 is the static `train` flag
            block_cls = nn.remat(DoubleConv, static_argnums=(2,))

        x = x.astype(self.dtype)
        skips = []
        for i, feats in enumerate(self.features):
            x = block_cls(feats, self.dropout_rate, self.dtype, name=f"enc{i}")(x, train)
            skips.append(x)
            x = nn.max_pool(x, window_shape=(2, 2, 2), strides=(2, 2, 2))

        x = block_cls(
            self.features[-1] * 2, self.dropout_rate, self.dtype, name="bottleneck"
        )(x, train)

        bottleneck_gap = None
        if return_features:
            bottleneck_gap = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))

        for i, feats in enumerate(reversed(self.features)):
            x = nn.ConvTranspose(
                feats,
                kernel_size=(2, 2, 2),
                strides=(2, 2, 2),
                padding="VALID",
                dtype=self.dtype,
                kernel_init=nn.initializers.he_normal(),
                name=f"up{i}",
            )(x)
            skip = skips[-(i + 1)]
            if x.shape[1:4] != skip.shape[1:4]:
                # shape guard for odd input sizes (models/unet.py:81-83);
                # static shapes, so this resolves at trace time.
                x = jax.image.resize(
                    x, skip.shape[:4] + (x.shape[-1],), method="trilinear"
                ).astype(self.dtype)
            x = jnp.concatenate([skip, x], axis=-1)
            x = block_cls(feats, self.dropout_rate, self.dtype, name=f"dec{i}")(x, train)

        x = nn.Conv(
            self.out_channels,
            kernel_size=(1, 1, 1),
            dtype=self.dtype,
            name="final_conv",
        )(x)
        logits = x.astype(jnp.float32)

        if return_features:
            return logits, bottleneck_gap
        return logits

    @property
    def bottleneck_features(self) -> int:
        return self.features[-1] * 2
