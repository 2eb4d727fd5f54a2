"""TPU-native 3D U-Net in Flax (linen) — channel-first boundaries,
channel-last compute interiors.

Capability parity with the reference models (models/unet.py:6-90 and
models/unet_dann.py:65-98 of fransiskusbudi/multimodal_segmentation_project):
4-level encoder/decoder with DoubleConv blocks ([3x3x3 conv -> BN ->
ReLU -> channel dropout] x2), 2x max-pool downsampling, 2x
transpose-conv upsampling with skip concatenation, a trilinear resize
guard for odd shapes (models/unet.py:81-83), a 1x1x1 output head, and an
optional global-average-pooled bottleneck feature vector for the DANN
domain head (models/unet_dann.py:76-79) — one model class serves both
(the reference keeps two near-identical copies).

Memory architecture (the load-bearing TPU decision):
  TPU vector memory tiles are (sublane, lane) = (8|16, 128): ANY tensor
  whose minor dimension is a small channel count is lane-padded to 128.
  For this model (C = 1/4/16/32) a channels-minor activation layout
  inflates every stored buffer 4-128x — measured 19.98 GB for the
   192^3 train step, far past the 15.75 GB HBM of a v5e chip.

  The fix used here: the PUBLIC layout and every tensor that lives
  across a block boundary (input volume, skip connections, logits —
  i.e. everything autodiff stores as a residual) is CHANNEL-FIRST
  (B, C, D, H, W), whose minor dims are large spatial extents (padding
  <= 1.33x). Convolutions still run in XLA's MXU-preferred
  channels-last form INSIDE each rematerialized block: the block
  transposes in, computes, transposes out, and `nn.remat` makes the
  padded intermediates transient — they exist only while one block's
  kernels run and are recomputed in the backward pass. Net effect:
  the 192^3 bf16 train step fits in ~half of HBM instead of OOMing,
  at the cost of two cheap layout copies per block.

  (Channel-first is also exactly the reference's public torch NCDHW
  layout, so the loss/metric APIs line up 1:1.)

Other TPU-first choices:
  * bf16 compute / fp32 params via ``dtype``; BN statistics accumulate
    in fp32 inside flax. No GradScaler (the reference hand-rolls fp16
    scaling, train_dann.py:240-265).
  * 1x1x1 output head as a channel-first einsum (never materializes a
    4-channel channels-minor volume).
  * Dropout matches torch nn.Dropout3d channel-wise semantics via
    ``broadcast_dims`` over the spatial axes.
  * BatchNorm under a sharded batch axis is global-batch sync-BN (the
    reference's DDP default is per-replica stats; documented divergence).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

TO_LAST = (0, 2, 3, 4, 1)  # (B, C, D, H, W) -> (B, D, H, W, C)
TO_FIRST = (0, 4, 1, 2, 3)  # (B, D, H, W, C) -> (B, C, D, H, W)


class PallasConv3(nn.Module):
    """3x3x3 SAME conv on channel-first tensors.

    Parameter names/shapes ('kernel' (3,3,3,Cin,Cout), 'bias' (Cout,))
    match flax nn.Conv exactly, so checkpoints are interchangeable
    between the Pallas and XLA conv paths. ``use_xla`` swaps the Pallas
    kernel for the channel-first XLA conv with identical semantics
    (used for the spatially-sharded path at widths the kernel doesn't
    cover).

    ``fold_scale``/``fold_shift`` fold an eval-mode BatchNorm's affine
    transform into the conv weights (exact: BN at inference is a
    per-channel y = s*x + t), saving one full elementwise pass over the
    volume per conv.

    When a mesh with a non-trivial 'spatial' axis is active
    (parallel.mesh.active_spatial_mesh), the conv runs inside a
    halo-exchange shard_map island (ops/halo.py) — a pallas_call cannot
    be auto-partitioned over a sharded D axis.
    """

    features: int
    dtype: Any = jnp.bfloat16
    use_xla: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        fold_scale=None,
        fold_shift=None,
        return_stats=False,
        prologue=None,
        act_relu=False,
    ):
        from multimodal_segmentation_project_tpu.ops.halo import halo_conv3
        from multimodal_segmentation_project_tpu.ops.pallas_conv import (
            conv3x3x3_cf,
            conv3x3x3_cf_boundary,
            conv3x3x3_cf_reference,
            conv3x3x3_cf_relu,
            conv3x3x3_cf_stats,
        )
        from multimodal_segmentation_project_tpu.parallel.mesh import (
            active_spatial_mesh,
        )

        cin = x.shape[1]
        kernel = self.param(
            "kernel",
            nn.initializers.he_normal(batch_axis=(), in_axis=(0, 1, 2, 3), out_axis=4),
            (3, 3, 3, cin, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        if fold_scale is not None:
            kernel = kernel * fold_scale.reshape(1, 1, 1, 1, -1)
            bias = bias * fold_scale + fold_shift
        if prologue is not None:
            # fused training-mode boundary: the preceding conv's
            # BN-apply + ReLU + Dropout3d (a per-(batch, channel)
            # affine) runs on this conv's input tile in VMEM — the
            # activated intermediate never touches HBM. Single-device
            # Pallas path only (DoubleConv gates it).
            a, t = prologue
            if return_stats:
                from multimodal_segmentation_project_tpu.ops.pallas_conv import (
                    conv3x3x3_cf_boundary_stats,
                )

                return conv3x3x3_cf_boundary_stats(
                    x.astype(self.dtype), kernel, bias, a, t
                )
            return conv3x3x3_cf_boundary(x.astype(self.dtype), kernel, bias, a, t)
        if return_stats:
            # fused conv + per-channel output stats (single-device path;
            # DoubleConv gates this off under an active mesh)
            if self.use_xla:
                y = conv3x3x3_cf_reference(x.astype(self.dtype), kernel, bias)
                yf = y.astype(jnp.float32)
                return y, jnp.sum(yf, axis=(0, 2, 3, 4)), jnp.sum(
                    yf * yf, axis=(0, 2, 3, 4)
                )
            return conv3x3x3_cf_stats(x.astype(self.dtype), kernel, bias)
        conv_fn = conv3x3x3_cf_reference if self.use_xla else conv3x3x3_cf
        mesh = active_spatial_mesh()
        if mesh is None and not self.use_xla:
            # data-parallel-only meshes still need the shard_map island
            # for the pallas_call (XLA cannot auto-partition custom
            # calls); the XLA conv path auto-partitions fine
            from multimodal_segmentation_project_tpu.parallel.mesh import (
                active_multi_mesh,
            )

            mesh = active_multi_mesh()
        if mesh is not None:
            y = halo_conv3(conv_fn, x.astype(self.dtype), kernel, bias, mesh)
            return nn.relu(y) if act_relu else y
        if act_relu and not self.use_xla:
            # inference fast path: bias + ReLU (BN already folded into
            # kernel/bias above) applied in the dot epilogue — no
            # separate elementwise pass over the volume
            return conv3x3x3_cf_relu(x.astype(self.dtype), kernel, bias)
        y = conv_fn(x.astype(self.dtype), kernel, bias)
        return nn.relu(y) if act_relu else y


class BatchNormCF(nn.Module):
    """Training-mode BatchNorm that consumes precomputed per-channel
    (sum, sumsq) statistics — the fused outputs of
    ops.pallas_conv.conv3x3x3_cf_stats — instead of re-reading the
    volume. Variable structure ('scale'/'bias' params, 'mean'/'var'
    batch_stats) and numerics (biased variance E[x^2]-E[x]^2 clamped at
    0, momentum running update) match flax nn.BatchNorm exactly, so
    checkpoints interchange with the unfused paths. The normalize is
    applied as one per-channel affine y = x*A + B (XLA fuses it with
    the following ReLU/dropout/cast into a single pass)."""

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(
        self, y: jax.Array, s1: jax.Array, s2: jax.Array, return_affine: bool = False
    ):
        c = y.shape[1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        n = y.shape[0] * y.shape[2] * y.shape[3] * y.shape[4]
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        if not self.is_initializing():
            ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
            ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        a = scale * jax.lax.rsqrt(var + self.epsilon)
        b = bias - mean * a
        if return_affine:
            # (a, b) per channel, fp32 — consumed by the fused boundary
            # conv's prologue instead of a volume-sized apply pass
            return a, b
        return y.astype(jnp.float32) * a.reshape(1, -1, 1, 1, 1) + b.reshape(
            1, -1, 1, 1, 1
        )


def _pallas_conv_ok(conv_impl: str, cin: int, cout: int, h: int, w: int) -> bool:
    """Per-conv dispatch: the Pallas kernel wins where XLA's lane
    padding is worst (small channel counts at large spatial extents)."""
    from multimodal_segmentation_project_tpu.ops.pallas_conv import supported_conv

    if conv_impl == "xla":
        return False
    ok = supported_conv(cin, cout, h, w)
    if conv_impl == "pallas":
        return ok
    # 'auto': only on real TPUs (interpret mode is too slow elsewhere)
    return ok and jax.default_backend() == "tpu"


def _pallas_shape_ok(conv_impl: str, features: int, cin: int, h: int, w: int) -> bool:
    """Whole-block dispatch: both convs of a DoubleConv run on Pallas."""
    return _pallas_conv_ok(conv_impl, cin, features, h, w) and _pallas_conv_ok(
        conv_impl, features, features, h, w
    )


class DoubleConv(nn.Module):
    """[Conv3d(3x3x3, SAME) -> BatchNorm -> ReLU -> Dropout3d] x 2.

    Channel-first in/out by default. Three interior compute paths with
    identical parameters:
      * Pallas (small-C levels on TPU): convs run natively channel-first
        — zero layout padding anywhere;
      * XLA, both convs: ONE transpose pair around the whole block
        (round-5; the per-conv pairs cost ~2x the layout copies);
      * XLA, mixed with Pallas (e.g. a concat conv over the C cap):
        per-conv transpose pairs as before.

    ``layout="cl"``: input AND output are channels-last (B, D, H, W, C)
    and no transposes are issued at all — used by UNet3D's deep
    channels-last region, where consecutive XLA blocks + pool/upconv/
    concat chain in NDHWC and the layout conversion is paid once per
    REGION instead of once per block. Only valid when both convs take
    the XLA path (UNet3D guarantees it).
    """

    features: int
    dropout_rate: float = 0.1
    dtype: Any = jnp.bfloat16
    conv_impl: str = "auto"
    fused_bn_stats: bool = False
    layout: str = "cf"  # 'cf' | 'cl'

    def _xla_block(self, x, train, channels_last_io):
        """Both convs through XLA's channels-last form; transposes only
        at the block boundary (or nowhere, for layout='cl')."""
        if not channels_last_io:
            x = jnp.transpose(x, TO_LAST)
        x = x.astype(self.dtype)
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
                x = nn.Dropout(
                    rate=self.dropout_rate,
                    broadcast_dims=(1, 2, 3),
                    deterministic=not train,
                    name=f"drop{i}",
                )(x)
        if not channels_last_io:
            x = jnp.transpose(x, TO_FIRST)
        return x

    def _fused_boundary_path(self, x, train, spatial):
        """Training-mode fused DoubleConv (the default where eligible).

        conv0 emits (y0, s1, s2) in one kernel pass; BN0 reduces to a
        per-channel affine (a, t); the Dropout3d channel mask folds into
        (a, t); conv1 applies the whole chain to its input tile in VMEM
        (conv3x3x3_cf_boundary) — the activated intermediate between the
        convs never exists in HBM. Measured on the real-TPU 192^3 train
        step: −16.6 ms/step vs the unfused chain. Parameter/variable
        tree is identical to the unfused path, so checkpoints
        interchange. Single-device Pallas-supported shapes in training
        mode only; returns None to fall through otherwise."""
        if not train or spatial:
            return None
        from multimodal_segmentation_project_tpu.parallel.mesh import (
            active_mesh_devices,
        )

        if active_mesh_devices() != 1:
            return None
        if not _pallas_shape_ok(
            self.conv_impl, self.features, x.shape[1], x.shape[3], x.shape[4]
        ):
            return None

        x = x.astype(self.dtype)
        bdim, feats = x.shape[0], self.features
        y0, s10, s20 = PallasConv3(feats, self.dtype, name="conv0")(
            x, return_stats=True
        )
        a0, t0 = BatchNormCF(name="bn0")(y0, s10, s20, return_affine=True)
        a_bc = jnp.broadcast_to(a0[None, :], (bdim, feats))
        t_bc = jnp.broadcast_to(t0[None, :], (bdim, feats))
        keep = 1.0 - self.dropout_rate
        if self.dropout_rate > 0.0:
            m0 = jax.random.bernoulli(
                self.make_rng("dropout"), keep, (bdim, feats)
            ).astype(jnp.float32) / keep
            a_bc, t_bc = a_bc * m0, t_bc * m0
        # conv1's per-channel (sum, sumsq) accumulate inside the kernel
        # too, so bn1's stats pass never re-reads the volume. A/B on the
        # real chip (round 4, 10-iter distinct-input runs): 6.7167 vs
        # 6.7163 samples/s with a separate XLA stats reduce — neutral on
        # the full step (XLA piggybacks the reduce on the y1f convert
        # pass); kept fused as the structurally simpler graph.
        y1, s11, s21 = PallasConv3(feats, self.dtype, name="conv1")(
            y0, prologue=(a_bc, t_bc), return_stats=True
        )
        y1f = y1.astype(jnp.float32)
        a1, t1 = BatchNormCF(name="bn1")(y1, s11, s21, return_affine=True)
        z = jnp.maximum(
            y1f * a1.reshape(1, -1, 1, 1, 1) + t1.reshape(1, -1, 1, 1, 1), 0.0
        )
        if self.dropout_rate > 0.0:
            m1 = jax.random.bernoulli(
                self.make_rng("dropout"), keep, (bdim, feats)
            ).astype(jnp.float32) / keep
            z = z * m1[:, :, None, None, None]
        return z.astype(self.dtype)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        from multimodal_segmentation_project_tpu.parallel.mesh import (
            active_spatial_mesh,
        )

        # under spatial sharding EVERY conv goes through the
        # channel-first branch so it runs inside a halo-exchange
        # shard_map island (ops/halo.py): pallas kernel where supported,
        # channel-first XLA conv otherwise
        spatial = active_spatial_mesh() is not None

        if self.layout == "cl":
            assert not spatial, "channels-last blocks are single-layout only"
            return self._xla_block(x, train, channels_last_io=True)

        fused = self._fused_boundary_path(x, train, spatial)
        if fused is not None:
            return fused
        if not spatial:
            p0 = _pallas_conv_ok(
                self.conv_impl, x.shape[1], self.features, x.shape[3], x.shape[4]
            )
            p1 = _pallas_conv_ok(
                self.conv_impl, self.features, self.features, x.shape[3], x.shape[4]
            )
            if not p0 and not p1:
                # fully-XLA block: one transpose pair, not two
                return self._xla_block(x, train, channels_last_io=False)
        for i in range(2):
            use_pallas = _pallas_conv_ok(
                self.conv_impl, x.shape[1], self.features, x.shape[3], x.shape[4]
            )
            if use_pallas or spatial:
                from multimodal_segmentation_project_tpu.parallel.mesh import (
                    active_mesh_devices,
                )

                conv = PallasConv3(
                    self.features, self.dtype, use_xla=not use_pallas, name=f"conv{i}"
                )
                # fused conv+BN-stats (conv3x3x3_cf_stats): the kernel
                # can emit the BN batch stats itself. Measured NET
                # NEUTRAL-TO-WORSE on the 192^3 step (XLA already
                # piggybacks the stats reduce on the bf16-cast pass it
                # must run anyway, while the fused path adds in-kernel
                # VPU reduces plus a g_eff elementwise pass in the
                # backward), so it is opt-in; kept as a tested
                # capability (tests/test_models.py fused-parity test).
                # Multi-device paths keep flax BN, whose jnp reduces
                # become global sync-BN under the sharded batch.
                fuse_stats = (
                    self.fused_bn_stats
                    and train
                    and not spatial
                    and active_mesh_devices() == 1
                )
                if fuse_stats:
                    y, s1, s2 = conv(x.astype(self.dtype), return_stats=True)
                    x = BatchNormCF(name=f"bn{i}")(y, s1, s2)
                else:
                    bn = nn.BatchNorm(
                        use_running_average=not train,
                        momentum=0.9,
                        epsilon=1e-5,
                        dtype=jnp.float32,
                        axis=1,
                        name=f"bn{i}",
                    )
                    if train:
                        x = bn(conv(x.astype(self.dtype)))
                    else:
                        # eval BN is per-channel affine: extract (scale,
                        # shift) by probing the module on tiny inputs
                        # (identical flax numerics, shared params) and fold
                        # them into the conv — one fewer full elementwise
                        # pass over the volume. The ReLU rides the conv
                        # kernel's epilogue too (act_relu), so inference
                        # needs NO elementwise pass at all per conv.
                        dummy = jnp.zeros((1, self.features, 1, 1, 1), jnp.float32)
                        t = bn(dummy).reshape(-1)
                        s = bn(jnp.ones_like(dummy)).reshape(-1) - t
                        x = conv(
                            x.astype(self.dtype), fold_scale=s, fold_shift=t,
                            act_relu=True,
                        )
                if train:
                    x = nn.relu(x)
                if self.dropout_rate > 0.0:
                    # channel-wise dropout (torch Dropout3d): one mask
                    # per (batch, channel), broadcast over D/H/W.
                    x = nn.Dropout(
                        rate=self.dropout_rate,
                        broadcast_dims=(2, 3, 4),
                        deterministic=not train,
                        name=f"drop{i}",
                    )(x)
                x = x.astype(self.dtype)
            else:
                x = jnp.transpose(x, TO_LAST).astype(self.dtype)
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
                    x = nn.Dropout(
                        rate=self.dropout_rate,
                        broadcast_dims=(1, 2, 3),
                        deterministic=not train,
                        name=f"drop{i}",
                    )(x)
                x = jnp.transpose(x, TO_FIRST)
        return x


class UpConv(nn.Module):
    """2x2x2 stride-2 transpose conv, channel-first.

    With kernel == stride, every output voxel receives exactly one
    kernel tap, so the transpose conv is algebraically a per-voxel
    matmul followed by depth-to-space interleaving (vs the
    lax.conv_transpose lowering, whose dilated conv was a ~150 ms
    full-resolution kernel over lane-padded buffers). The matmul +
    interleave runs through ops/upconv.py's custom-VJP formulation,
    which pins every contraction so the volume axis stays lane-minor —
    the naive einsum's backward relayouted full-resolution tensors to
    channel-minor (~16 ms/step of copies at 192^3). Parameter
    names/shapes match flax nn.ConvTranspose ('kernel'
    (2,2,2,Cin,Cout), 'bias'), so checkpoints are layout-independent.
    """

    features: int
    dtype: Any = jnp.bfloat16
    layout: str = "cf"  # 'cf' | 'cl'

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from multimodal_segmentation_project_tpu.ops.upconv import upconv2x_cf

        cin = x.shape[1] if self.layout == "cf" else x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.he_normal(batch_axis=(), in_axis=(0, 1, 2, 3), out_axis=4),
            (2, 2, 2, cin, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        if self.layout == "cl":
            # channels-last (deep-region) form: per-voxel matmul +
            # depth-to-space with C kept minor throughout (same algebra
            # as ops/upconv.py, which pins the channel-FIRST layout)
            b, d, h, w, _ = x.shape
            k2 = kernel.astype(self.dtype).reshape(8, cin, self.features)
            y = jnp.einsum("bdhwc,kco->bdhwko", x.astype(self.dtype), k2)
            y = y.reshape(b, d, h, w, 2, 2, 2, self.features)
            y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6, 7))
            y = y.reshape(b, 2 * d, 2 * h, 2 * w, self.features)
            return y + bias.astype(y.dtype)
        return upconv2x_cf(x.astype(self.dtype), kernel, bias)


class DecoderStage(nn.Module):
    """One decoder level: upsample -> (resize guard) -> skip concat ->
    DoubleConv, fused into a single remat scope.

    Keeping the whole stage in one checkpointed block means autodiff
    saves only the HALF-resolution stage input and the skip — not the
    full-resolution upconv output and concat (two lane-padded buffers
    that dominated HBM when checkpointing per-DoubleConv).
    """

    features: int
    dropout_rate: float = 0.1
    dtype: Any = jnp.bfloat16
    conv_impl: str = "auto"
    fused_bn_stats: bool = False
    layout: str = "cf"  # 'cf' | 'cl' (stage input, skip and output)

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array, train: bool = False) -> jax.Array:
        if self.layout == "cl":
            x = UpConv(self.features, self.dtype, layout="cl", name="up")(x)
            if x.shape[1:4] != skip.shape[1:4]:
                x = jax.image.resize(
                    x, x.shape[:1] + skip.shape[1:4] + x.shape[-1:],
                    method="trilinear",
                ).astype(self.dtype)
            x = jnp.concatenate([skip, x], axis=-1)
            return DoubleConv(
                self.features, self.dropout_rate, self.dtype, self.conv_impl,
                self.fused_bn_stats, layout="cl", name="conv"
            )(x, train)
        x = UpConv(self.features, self.dtype, name="up")(x)
        if x.shape[2:] != skip.shape[2:]:
            # shape guard for odd input sizes (models/unet.py:81-83);
            # static shapes, so this resolves at trace time.
            x = jax.image.resize(
                x, x.shape[:2] + skip.shape[2:], method="trilinear"
            ).astype(self.dtype)
        x = jnp.concatenate([skip, x], axis=1)
        return DoubleConv(
            self.features, self.dropout_rate, self.dtype, self.conv_impl,
            self.fused_bn_stats, name="conv"
        )(x, train)


def max_pool_cl(x: jax.Array) -> jax.Array:
    """2x stride-2 max pool on channels-last (B, D, H, W, C).

    With C minor, all three window factors live on MAJOR dims, so the
    whole pool is one reshape + max — none of the lane-dim contortions
    max_pool_cf needs."""
    b, d, h, w, c = x.shape
    x = x[:, : d // 2 * 2, : h // 2 * 2, : w // 2 * 2]
    x = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    return jnp.max(x, axis=(2, 4, 6))


def max_pool_cf(x: jax.Array) -> jax.Array:
    """2x stride-2 max pool on (B, C, D, H, W).

    Non-overlapping windows, so pooling is max over window factor axes.
    This avoids lax.reduce_window, whose backward lowers to a slow
    full-resolution select-and-scatter on TPU. The factorization is
    layout-aware: D and H (sublane/major dims) pool via a reshape + max,
    but W (the minor/lane dim) pools via two stride-2 lane slices — a
    reshape that splits the lane dim into (w/2, 2) forces the whole
    tensor into a T(2,128)-tiled layout whose backward materializes 8-d
    broadcast/select monsters (profiled ~30 ms/step at 192^3; the
    strided form is ~8x faster fwd+bwd). (Gradient-of-max tie-breaking
    differs from torch's first-match rule only on exactly-equal floats.)
    """
    b, c, d, h, w = x.shape
    # floor semantics for odd extents (torch MaxPool3d drops the tail)
    x = x[:, :, : d // 2 * 2, : h // 2 * 2, : w // 2 * 2]
    x = x.reshape(b, c, d // 2, 2, h // 2, 2, w // 2 * 2)
    x = jnp.max(x, axis=(3, 5))
    return jnp.maximum(x[..., 0::2], x[..., 1::2])


class UNet3D(nn.Module):
    """3D U-Net for volumetric segmentation.

    Input ``(B, C_in, D, H, W)`` (the reference's torch layout,
    models/unet.py:64), fp32 logits ``(B, out_channels, D, H, W)``.

    Args mirror the reference constructor (models/unet.py:34-37):
      out_channels: number of classes (4: bg/spleen/liver/kidneys).
      features: encoder widths; bottleneck is features[-1]*2.
      dropout_rate: channel-dropout rate inside DoubleConv.
      dtype: compute dtype (bf16 on TPU; params stay fp32).
      remat: checkpoint the conv blocks (memory vs FLOPs; required for
        full-volume 192^3 training on one chip).
    """

    in_channels: int = 1
    out_channels: int = 4
    features: Sequence[int] = (16, 32, 64, 128)
    dropout_rate: float = 0.1
    dtype: Any = jnp.bfloat16
    remat: bool = False
    conv_impl: str = "auto"  # 'auto' | 'pallas' | 'xla'
    fused_bn_stats: bool = False  # opt-in conv+BN-stats fusion (see DoubleConv)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        train: bool = False,
        return_features: bool = False,
    ):
        # Rematerialization is only worthwhile for the XLA conv path,
        # whose interiors are lane-padded 4-8x; Pallas-path blocks keep
        # compact activations, so saving them costs ~0.25 GB per
        # full-res level while skipping a full forward recompute in the
        # backward pass.
        r_block = nn.remat(DoubleConv, static_argnums=(2,)) if self.remat else DoubleConv
        r_stage = nn.remat(DecoderStage, static_argnums=(3,)) if self.remat else DecoderStage

        def _remat_worth_it(d, h, w):
            # Remat exists to keep the XLA path's lane-padded
            # channels-last interiors transient — a full-resolution
            # concern. The deep blocks this path actually serves
            # (C >= 128 at <= 48^3) hold ~10-30 MB of interiors against
            # ~10 GB of free HBM, while their backward replays cost a
            # measured ~6 ms/step of pure recompute (A/B on the real
            # chip 160.7 -> 154.3 ms/step, reproduced 3x; trace: the
            # `rematted_computation` convolution fusions at dec1/dec0/
            # enc3/bottleneck, docs/PERFORMANCE.md round-3 notes).
            return d * h * w > 48 ** 3

        def pick_block(feats, cin, h, w, d):
            if _pallas_shape_ok(self.conv_impl, feats, cin, h, w):
                return DoubleConv
            return r_block if _remat_worth_it(d, h, w) else DoubleConv

        def pick_stage(feats, cin, h, w, d):
            if _pallas_shape_ok(self.conv_impl, feats, cin, h, w):
                return DecoderStage
            return r_stage if _remat_worth_it(d, h, w) else DecoderStage

        def block_fully_xla(feats, cin, h, w):
            """Neither conv of the block can take a Pallas kernel."""
            return not (
                _pallas_conv_ok(self.conv_impl, cin, feats, h, w)
                or _pallas_conv_ok(self.conv_impl, feats, feats, h, w)
            )

        # Pool with the Pallas backward (ops/pool.py) on the
        # single-device TPU path — same gate as the Pallas 1x1 head
        # below: a pallas_call cannot sit bare inside a pjit-partitioned
        # graph, and multi-device runs keep the XLA chain (whose
        # backward pjit shards natively). Measured 4.8/1.5/0.3 ms/step
        # faster than the XLA chain's autodiff at the three pooled
        # levels (docs/PERFORMANCE.md round-3 table).
        from multimodal_segmentation_project_tpu.parallel.mesh import (
            active_mesh_devices,
        )

        use_pallas_pool = (
            self.conv_impl != "xla"
            and active_mesh_devices() == 1
            and (jax.default_backend() == "tpu" or self.conv_impl == "pallas")
        )
        if use_pallas_pool:
            from multimodal_segmentation_project_tpu.ops.pool import max_pool2x_cf

            pool_fn = max_pool2x_cf
        else:
            pool_fn = max_pool_cf

        # ---- deep channels-last region (round 5) ----
        # The fully-XLA deep levels each used to transpose CF->CL->CF
        # around every block; chaining them (blocks + pools + upconv +
        # concat) in NDHWC pays the layout conversion once per REGION.
        # The region is the deepest contiguous run: a suffix of the
        # encoder, the bottleneck, and the matching decoder prefix, all
        # fully-XLA (the skip of decoder stage j is encoder level
        # L-1-j, so symmetric trimming keeps every skip in-layout).
        # Disabled under spatial sharding (those convs must run inside
        # channel-first halo islands).
        from multimodal_segmentation_project_tpu.parallel.mesh import (
            active_spatial_mesh,
        )

        L = len(self.features)
        enc_fx, enc_shapes = [], []
        cin_i = x.shape[1]
        d_i, h_i, w_i = x.shape[2], x.shape[3], x.shape[4]
        for feats in self.features:
            enc_fx.append(block_fully_xla(feats, cin_i, h_i, w_i))
            enc_shapes.append((d_i, h_i, w_i))
            cin_i, d_i, h_i, w_i = feats, d_i // 2, h_i // 2, w_i // 2
        bneck_fx = block_fully_xla(self.features[-1] * 2, self.features[-1], h_i, w_i)
        dec_fx = []
        for i, feats in enumerate(reversed(self.features)):
            _, sh, sw = enc_shapes[L - 1 - i]
            dec_fx.append(block_fully_xla(feats, 2 * feats, sh, sw))
        k = 0
        if bneck_fx and active_spatial_mesh() is None:
            while k < L and dec_fx[k] and enc_fx[L - 1 - k]:
                k += 1

        def in_region_enc(i):
            return k > 0 and i >= L - k

        x = x.astype(self.dtype)
        skips = []
        enc_cins = [x.shape[1]] + list(self.features[:-1])
        for i, feats in enumerate(self.features):
            if in_region_enc(i) and not in_region_enc(i - 1):
                x = jnp.transpose(x, TO_LAST)  # enter the CL region
            bd, bh, bw = enc_shapes[i]
            cls = pick_block(feats, enc_cins[i], bh, bw, bd)
            x = cls(
                feats, self.dropout_rate, self.dtype, self.conv_impl,
                self.fused_bn_stats, layout="cl" if in_region_enc(i) else "cf",
                name=f"enc{i}",
            )(x, train)
            skips.append(x)
            x = max_pool_cl(x) if in_region_enc(i) else pool_fn(x)

        # (k > 0 implies enc L-1 is in the region, so x is already CL here)
        cls = pick_block(self.features[-1] * 2, self.features[-1], h_i, w_i, d_i)
        x = cls(
            self.features[-1] * 2, self.dropout_rate, self.dtype, self.conv_impl,
            self.fused_bn_stats, layout="cl" if k > 0 else "cf",
            name="bottleneck",
        )(x, train)

        bottleneck_gap = None
        if return_features:
            gap_axes = (1, 2, 3) if k > 0 else (2, 3, 4)
            bottleneck_gap = jnp.mean(x.astype(jnp.float32), axis=gap_axes)

        for i, feats in enumerate(reversed(self.features)):
            skip = skips[-(i + 1)]
            if i == k and k > 0:
                x = jnp.transpose(x, TO_FIRST)  # leave the CL region
            # the stage's DoubleConv sees concat(skip, up) at the skip's
            # resolution with 2*feats input channels
            _, sh, sw = enc_shapes[L - 1 - i]
            cls = pick_stage(feats, 2 * feats, sh, sw, enc_shapes[L - 1 - i][0])
            x = cls(
                feats, self.dropout_rate, self.dtype, self.conv_impl,
                self.fused_bn_stats, layout="cl" if i < k else "cf",
                name=f"dec{i}",
            )(x, skip, train)
        if k == L:
            x = jnp.transpose(x, TO_FIRST)  # whole net ran channels-last

        # 1x1x1 head: a (.., 4)-minor conv output would be lane-padded
        # 32x (see module docstring). The channel-first einsum form
        # relayouts the C=16 input to channel-minor for its contraction
        # (~3 ms of copies each way at 192^3) and a flat-volume
        # dot_general gets windowed into while-loops (~47 ms), so the
        # projection runs as a Pallas VPU kernel (ops/head.py) on the
        # single-device path. Under a mesh the einsum (auto-SPMD
        # partitionable) is kept.
        kernel = self.param(
            "head_kernel",
            nn.initializers.lecun_normal(),
            (self.features[0], self.out_channels),
            jnp.float32,
        )
        bias = self.param(
            "head_bias", nn.initializers.zeros_init(), (self.out_channels,), jnp.float32
        )
        from multimodal_segmentation_project_tpu.parallel.mesh import (
            active_mesh_devices,
        )

        use_pallas_head = (
            self.conv_impl != "xla"
            and active_mesh_devices() == 1
            and (jax.default_backend() == "tpu" or self.conv_impl == "pallas")
        )
        if use_pallas_head:
            from multimodal_segmentation_project_tpu.ops.head import head1x1_cf

            logits = head1x1_cf(x, kernel, bias)
        else:
            logits = jnp.einsum(
                "bidhw,io->bodhw", x.astype(jnp.float32), kernel
            ) + bias.reshape(1, -1, 1, 1, 1)

        if return_features:
            return logits, bottleneck_gap
        return logits

    @property
    def bottleneck_features(self) -> int:
        return self.features[-1] * 2
