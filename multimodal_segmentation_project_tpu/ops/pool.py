"""2x2x2 stride-2 max pool with a Pallas TPU backward.

The forward is cheap in XLA (layout-aware reshape+max, see
models/unet3d.py:max_pool_cf and the reference's MaxPool3d,
models/unet.py:44-47 of fransiskusbudi/multimodal_segmentation_project).
The AUTODIFF backward of that chain, however, materializes
T(2,128)-tiled broadcast/reshape monsters — profiled ~4.5 ms/step at
the 192^3 level alone (broadcasts of the pooled tensors back to
(d/2, 2, h/2, 2, w) window space).

This module keeps the XLA forward and supplies a custom VJP whose
backward is a single Pallas pass in the compact channel-first layout:

  dx[v] = g[v/2] * (x[v] == y[v/2]) / count(v/2)

(equal gradient shares among all window elements equal to the window
max — the same convention JAX's reduce-max autodiff uses; it differs
from the two-stage reshape+maximum chain only at exact float ties
ACROSS pooling stages, a measure-zero event masked downstream by the
ReLU backward, and from torch's first-match rule likewise — divergence
documented at max_pool_cf).

Since round 3 the FORWARD is also a Pallas kernel where shapes allow
(one bandwidth pass; the XLA chain spent ~3.3 ms at the 192^3 level in
a T(2,128) reshape copy + windowed reduce). A/B on the real chip
(docs/PERFORMANCE.md "Round 3 pool A/B"): Pallas fwd + pad-free bwd
inputs + roll-based count moved the 192^3 train step 154.3 -> 149.1 ms.

TPU tricks (each avoids an unsupported/expensive lane operation):
  * g and y are W-duplicated by the CALLER with one cheap jnp.repeat
    on the pooled (1/8-size) tensors, so the kernel never expands
    lanes;
  * D/H window duplication happens in registers via stack+reshape on
    sublane/major dims (never touches the lane dim);
  * the per-window equality COUNT needs a W-pair sum at every lane —
    done with two lane rolls + a parity select (cnt[l] = s[l] +
    s[l^1]), in place of an (unsupported) strided lane reduction;
  * W-pair MAX in the forward uses the same roll+parity trick, then
    compacts the duplicated lanes through one tiny MXU dot with the
    0/1 selection matrix S[i, j] = (i == 2j).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_segmentation_project_tpu.ops.pallas_conv import _interpret


def _pool_fwd_xla(x: jax.Array) -> jax.Array:
    """Layout-aware 2x pool: reshape+max on D/H, stride-2 lane slices
    on W (identical to models/unet3d.py:max_pool_cf)."""
    b, c, d, h, w = x.shape
    x = x[:, :, : d // 2 * 2, : h // 2 * 2, : w // 2 * 2]
    x = x.reshape(b, c, d // 2, 2, h // 2, 2, w // 2 * 2)
    x = jnp.max(x, axis=(3, 5))
    return jnp.maximum(x[..., 0::2], x[..., 1::2])


def _fwd_pool_kernel(x_ref, sel_ref, y_ref, *, c, td, th, w):
    """One bandwidth pass per input tile: D-pair max (plane indexing),
    H-pair max (sublane reshape), W-pair max (lane rolls + parity
    select, the dual of the backward's count trick), then lane
    COMPACTION of the duplicated row through one MXU dot with the 0/1
    selection matrix S[i, j] = (i == 2j) — each output column copies
    exactly one input lane, sidestepping the unsupported strided lane
    slice. The XLA chain costs ~3.3 ms at the 192^3 level in a
    T(2,128) reshape copy + windowed reduce; this reads x once."""
    parity = jax.lax.broadcasted_iota(jnp.int32, (c * th, w), 1) % 2
    for t in range(td):
        a0 = x_ref[0, :, 2 * t, :, :].astype(jnp.float32)  # (c, 2th, w)
        a1 = x_ref[0, :, 2 * t + 1, :, :].astype(jnp.float32)
        m = jnp.maximum(a0, a1)
        m = m.reshape(c, th, 2, w)
        m = jnp.maximum(m[:, :, 0, :], m[:, :, 1, :])  # (c, th, w)
        m2 = m.reshape(c * th, w)
        nb = jnp.where(
            parity == 0,
            pltpu.roll(m2, w - 1, axis=1),  # m[l+1]
            pltpu.roll(m2, 1, axis=1),  # m[l-1]
        )
        md = jnp.maximum(m2, nb)  # W-pair max, duplicated per pair
        yh = jnp.dot(md, sel_ref[:], preferred_element_type=jnp.float32)
        y_ref[0, :, t, :, :] = yh.reshape(c, th, w // 2).astype(y_ref.dtype)


def _fwd_tiles(d: int, h: int, w: int):
    """(td, th) when the Pallas forward supports the shape, else None.

    Block-shape legality: the x block's second-minor dim is 2*TH and
    the y block's is TH — each must be 8-divisible or equal to its
    array dim."""
    if d % 2 or h % 2 or w % 2 or w % 8 != 0 or w < 48 or w > 512:
        return None
    td = 2 if (d // 2) % 2 == 0 else 1
    if (h // 2) % 8 == 0:
        th = 8
    elif h // 2 in (2, 4):
        th = h // 2
    else:
        return None
    return td, th


def _pool_fwd_pallas(x, td, th):
    b, c, d, h, w = x.shape
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (w, w // 2), 0)
        == 2 * jax.lax.broadcasted_iota(jnp.int32, (w, w // 2), 1)
    ).astype(jnp.float32)
    return pl.pallas_call(
        partial(_fwd_pool_kernel, c=c, td=td, th=th, w=w),
        grid=(b, (d // 2) // td, (h // 2) // th),
        in_specs=[
            pl.BlockSpec(
                (1, c, 2 * td, 2 * th, w), lambda bb, dd, hh: (bb, 0, dd, hh, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c, td, th, w // 2), lambda bb, dd, hh: (bb, 0, dd, hh, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, c, d // 2, h // 2, w // 2), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=_interpret(),
    )(x, sel)


def _pool_fwd(x: jax.Array) -> jax.Array:
    tiles = _fwd_tiles(x.shape[2], x.shape[3], x.shape[4])
    if tiles is not None:
        return _pool_fwd_pallas(x, *tiles)
    return _pool_fwd_xla(x)


def _bwd_kernel(x_ref, yw_ref, gw_ref, dx_ref, *, c, td, th, w):
    """Per grid step: dx for a (C, 2*td, 2*th, W) input tile.

    yw/gw are the pooled max / cotangent with W already duplicated
    (yw[..., l] = y[..., l//2]); D/H duplication happens here in
    registers. cnt (#window elements equal to the max) uses the
    roll+parity W-pair sum described in the module docstring.

    Mosaic accepts VMEM blocks whose lane dim equals the array's raw W
    (block dim == array dim rule), and this kernel never lane-collapses
    a reshape — so no 128-multiple input pads (which cost a full
    read+write pass over x) are needed; values convert to f32
    immediately after load."""
    parity = jax.lax.broadcasted_iota(jnp.int32, (c * th, w), 1) % 2
    for t in range(td):
        ywt = yw_ref[0, :, t, :, :].astype(jnp.float32)  # (C, th, W)
        gwt = gw_ref[0, :, t, :, :].astype(jnp.float32)
        # row-duplicate to window space: (C, th, W) -> (C, 2*th, W)
        yd = jnp.stack([ywt, ywt], axis=2).reshape(c, 2 * th, w)
        gd = jnp.stack([gwt, gwt], axis=2).reshape(c, 2 * th, w)
        a0 = x_ref[0, :, 2 * t, :, :].astype(jnp.float32)
        a1 = x_ref[0, :, 2 * t + 1, :, :].astype(jnp.float32)
        m0 = (a0 == yd).astype(jnp.float32)
        m1 = (a1 == yd).astype(jnp.float32)
        # window count: sum d-pair, h-pair (reshape), then W pairs via
        # two lane rolls + parity select: cnt[l] = s[l] + s[l^1]. Lane 0
        # (even) selects the LEFT-roll and lane W-1 (odd) the RIGHT-roll,
        # so wrap values are never chosen.
        s = (m0 + m1).reshape(c, th, 2, w)
        s = s[:, :, 0, :] + s[:, :, 1, :]  # (C, th, W)
        s2 = s.reshape(c * th, w)
        nb = jnp.where(
            parity == 0,
            pltpu.roll(s2, w - 1, axis=1),  # s[l+1]
            pltpu.roll(s2, 1, axis=1),  # s[l-1]
        )
        cnt = (s2 + nb).reshape(c, th, w)
        cd = jnp.stack([cnt, cnt], axis=2).reshape(c, 2 * th, w)
        scale = gd / cd
        dx_ref[0, :, 2 * t, :, :] = (m0 * scale).astype(dx_ref.dtype)
        dx_ref[0, :, 2 * t + 1, :, :] = (m1 * scale).astype(dx_ref.dtype)


def _bwd_tiles(c: int, d: int, h: int, w: int):
    """(td, th) when the Pallas backward supports the shape, else None.

    W must be lane-friendly (mult of 8, and big enough that the kernel
    beats XLA's broadcast chain); D/H must split into 2x windows."""
    if w % 8 != 0 or w < 48 or w > 512 or d % 2 or h % 2:
        return None
    td = 2 if (d // 2) % 2 == 0 else 1
    th = next((t for t in (8, 4, 2) if (h // 2) % t == 0), None)
    if th is None:
        return None
    # VMEM: x + dx tiles are the big ones: 2 * C*2td*2th*W * 2B
    if c * (2 * td) * (2 * th) * w * 2 * 2 > 8 * 2**20:
        return None
    return td, th


def _pool_bwd_pallas(x, y, g, td, th):
    b, c, d, h, w = x.shape
    yw = jnp.repeat(y, 2, axis=-1)  # (B, C, d/2, h/2, W): W-duplicated
    gw = jnp.repeat(g, 2, axis=-1)
    kernel = partial(_bwd_kernel, c=c, td=td, th=th, w=w)
    half = pl.BlockSpec(
        (1, c, td, th, w), lambda bb, dd, hh: (bb, 0, dd, hh, 0),
        memory_space=pltpu.VMEM,
    )
    full = pl.BlockSpec(
        (1, c, 2 * td, 2 * th, w), lambda bb, dd, hh: (bb, 0, dd, hh, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, d // (2 * td), h // (2 * th)),
        in_specs=[full, half, half],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=_interpret(),
    )(x, yw, gw)


@jax.custom_vjp
def max_pool2x_cf(x: jax.Array) -> jax.Array:
    """2x stride-2 max pool on (B, C, D, H, W) with Pallas kernels
    (where supported — even extents, W >= 48; XLA chain otherwise)."""
    return _pool_fwd(x)


def _pool_fwd_rule(x):
    y = _pool_fwd(x)
    return y, (x, y)


def _pool_bwd_rule(res, g):
    x, y = res
    tiles = _bwd_tiles(x.shape[1], x.shape[2], x.shape[3], x.shape[4])
    if tiles is not None:
        return (_pool_bwd_pallas(x, y, g, *tiles),)
    # Fallback for kernel-gated shapes: plain autodiff of the forward
    # chain. A hand-written equal-shares formula (upsample-by-repeat +
    # 8-d reshape multi-axis count sum) previously lived here and was
    # MISCOMPILED by the TPU backend when embedded in the full train
    # graph: compiled grads came back 100% non-finite while the
    # de-optimized (eager) replay of the identical graph was finite, and
    # the formula in isolation was finite for every input distribution
    # tried. Root-caused to the cnt reshape/sum chain (replacing cnt
    # with a constant, or dropping the division, removed the NaNs; both
    # repeat- and broadcast_to-style upsampling of cnt reproduced them).
    # Autodiff of the two-stage forward avoids that op pattern entirely
    # and is exact for untied windows; tie semantics differ from the
    # Pallas kernel's equal shares only at exact float ties across
    # pooling stages (see module docstring). Gated shapes are the small
    # deep levels (W < 48), so the XLA chain's backward cost is
    # negligible there.
    _, vjp = jax.vjp(_pool_fwd_xla, x)
    return (vjp(g)[0],)


max_pool2x_cf.defvjp(_pool_fwd_rule, _pool_bwd_rule)
