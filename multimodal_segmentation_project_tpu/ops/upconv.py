"""2x2x2 stride-2 transpose conv (UpConv) with a layout-clean backward.

With kernel == stride every output voxel receives exactly one kernel
tap, so the transpose conv is a per-voxel channel matmul followed by
depth-to-space interleaving. The forward einsum
("bidhw,apqio->bodahpwq" + reshape) lowers well on TPU (measured
~4 ms at the full-resolution decoder level), but XLA's autodiff
backward for it relayouts full-volume tensors to channel-minor layouts
and was measured at ~134 ms fwd+bwd in isolation at the 96^3->192^3
level. This module keeps the einsum forward and supplies a custom VJP
in which every contraction keeps the VOLUME axis lane-minor (the same
principle as the Pallas conv, ops/pallas_conv.py):

  * the cotangent's 8 depth-to-space phases are extracted gather-free:
    the lane (W) phases via two stride-2 lane slices (cheap on TPU; a
    reshape that splits the lane dim would force T(2,128) tiling, and a
    combined 3-axis strided slice lowers to a volume gather — both
    measured disasters), then the D/H phases via reshape + plain
    indexing on sublane/major dims;
  * dx[i, b, V] = k2^T[(a p q o), i] @ ct8[b, (a p q o), V]
  * dk[i, (a p q o)] = x[b, i, V] @ ct8 contracted over (b, V)

Measured fwd+bwd at (1,32,96^3)->(1,16,192^3): 24 ms vs 134 ms for the
einsum's autodiff backward (isolated-call methodology of bench.py).

Reference semantics: nn.ConvTranspose(kernel=(2,2,2), stride 2) as used
by the reference decoder (models/unet.py:24-31, up1..up4); parameter
shapes ('kernel' (2,2,2,Cin,Cout), 'bias' (Cout,)) are unchanged, so
checkpoints interchange with any conv path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pack_kernel(kernel: jax.Array, dtype) -> jax.Array:
    """(2,2,2,Cin,Cout) -> (8*Cout, Cin) with (a,p,q,o) row order."""
    cin, cout = kernel.shape[3], kernel.shape[4]
    return (
        jnp.transpose(kernel, (0, 1, 2, 4, 3)).reshape(8 * cout, cin).astype(dtype)
    )


def _slice8(ct: jax.Array) -> jax.Array:
    """ct (b, cout, 2d, 2h, 2w) -> (b, (a p q)*cout, d*h*w): the 8
    depth-to-space phases stacked along the channel axis in (a,p,q,o)
    order, extracted without gathers (see module docstring)."""
    b, cout = ct.shape[0], ct.shape[1]
    d, h, w = ct.shape[2] // 2, ct.shape[3] // 2, ct.shape[4] // 2
    parts = []
    for q in range(2):
        e = ct[..., q::2]  # stride-2 lane slice: (b, co, 2d, 2h, w)
        e = e.reshape(b, cout, d, 2, h, 2, w)
        for a in range(2):
            for p in range(2):
                parts.append(
                    (a, p, q, e[:, :, :, a, :, p, :].reshape(b, cout, d * h * w))
                )
    parts.sort(key=lambda t: (t[0], t[1], t[2]))
    return jnp.concatenate([t[3] for t in parts], axis=1)


def _d2s_kernel(x_ref, w_ref, b_ref, out_ref, *, ci, co, td, th, w2, wp):
    """Per tile: one (8*Cout, Cin) @ (Cin, TH*WP) dot over the
    W-DUPLICATED input (xd[..., l] = x[..., l//2], built by the caller
    with one cheap jnp.repeat on the small pre-upsample tensor), then
    write FINAL bf16 depth-to-space output directly:

      * W phases: because the input lanes are duplicated, phase q's dot
        already holds its value at every lane — the interleaved row is
        one parity select between the q=0 and q=1 results (the previous
        u32 lane-packing + host-side bitcast/reshape cost ~5.5 ms/step
        of XLA relayout copies at the full-res level);
      * H phases: stacked along a fresh axis and merged into the
        sublane dim in registers ((co, th, 2, W) -> (co, 2*th, W) never
        touches the lane dim, so Mosaic allows the reshape) — one
        contiguous store per (t, a), no strided sublane stores;
      * D phases: plain output plane indices."""
    parity = jax.lax.broadcasted_iota(jnp.int32, (th, wp), 1) % 2
    for t in range(td):
        xt = x_ref[0, :, t, :, :].reshape(ci, th * wp)
        y = jnp.dot(w_ref[:], xt, preferred_element_type=jnp.float32)
        y = y.reshape(2, 2, 2, co, th, wp) + b_ref[:].reshape(1, 1, 1, co, 1, 1)
        for a in range(2):
            rows = []
            for p in range(2):
                zi = jnp.where(parity == 0, y[a, p, 0], y[a, p, 1])
                rows.append(zi.astype(out_ref.dtype))
            z = jnp.stack(rows, axis=2)  # (co, th, 2, wp)
            out_ref[0, :, 2 * t + a, :, :] = z.reshape(co, 2 * th, wp)[:, :, :w2]


def _d2s_tiles(cin: int, cout: int, d: int, h: int, w: int):
    """(td, th) when the Pallas depth-to-space kernel supports the
    shape within the 16 MB scoped-VMEM budget, else None.

    Two gates beyond shape divisibility, both hit at 256^3 and learned
    from real compile errors:

    * Mosaic requires a block's second-minor dim to be 8-divisible or
      equal to the full array dim, so TH must be 8 (or H itself when
      H < 8) — a TH=4 tile against H=16 is rejected at lowering.
    * The kernel's stack holds the fp32 phase dot y (8*Cout, TH*WP)
      plus reshape/select temps of the same order (~3x y), alongside
      the double-buffered input and output blocks; the 256^3 deepest
      decoder level (256 -> 128 @ 16^3) overflows the 16 MB scoped
      VMEM by 544 KB at TH=8. With no smaller legal TH it falls back
      to the einsum (that level is 16^3-small; the fallback costs ~0)."""
    if w > 128 or w % 8 != 0:
        return None
    if d % 2 != 0:
        return None
    td = 2
    wp = -(-2 * w // 128) * 128
    if h % 8 == 0:
        th = 8
    elif h in (2, 4):
        th = h
    else:
        return None
    y_bytes = 4 * (8 * cout) * (th * wp)
    in_block = 2 * cin * td * th * wp
    out_block = 2 * cout * (2 * td) * (2 * th) * wp
    if 3 * y_bytes + 2 * in_block + 2 * out_block > 14 * 2**20:
        return None
    return td, th


def _upconv_forward_d2s(x, kernel, bias, td, th):
    b, cin, d, h, w = x.shape
    cout = kernel.shape[4]
    w2 = 2 * w
    wp = -(-w2 // 128) * 128  # lane-align the DUPLICATED width
    # duplicate every W lane (xd[..., l] = x[..., l // 2]): one small
    # XLA relayout on the pre-upsample tensor; the kernel's phase dots
    # then land their values at the final interleaved lanes directly
    xd = jnp.repeat(x, 2, axis=-1)
    xd = jnp.pad(xd, ((0, 0), (0, 0), (0, 0), (0, 0), (0, wp - w2)))
    k2 = _pack_kernel(kernel, x.dtype)
    return pl.pallas_call(
        partial(_d2s_kernel, ci=cin, co=cout, td=td, th=th, w2=w2, wp=wp),
        grid=(b, d // td, h // th),
        in_specs=[
            pl.BlockSpec(
                (1, cin, td, th, wp),
                lambda bb, dd, hh: (bb, 0, dd, hh, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, cout, 2 * td, 2 * th, w2),
            lambda bb, dd, hh: (bb, 0, dd, hh, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, cout, 2 * d, 2 * h, w2), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(xd, k2, bias.astype(jnp.float32).reshape(cout, 1))


def _upconv_forward(x, kernel, bias):
    b, cin, d, h, w = x.shape
    cout = kernel.shape[4]
    if x.dtype == jnp.bfloat16:
        from multimodal_segmentation_project_tpu.parallel.mesh import (
            active_mesh_devices,
        )

        tiles = _d2s_tiles(cin, cout, d, h, w)
        if tiles is not None and active_mesh_devices() == 1:
            # single-device bf16 path: Pallas depth-to-space kernel
            # (the einsum's lowering costs ~7 ms/step at the full-res
            # level in interleave relayout copies); under a mesh the
            # einsum stays auto-SPMD-partitionable
            return _upconv_forward_d2s(x, kernel, bias, *tiles)
    t = jnp.einsum("bidhw,apqio->bodahpwq", x, kernel.astype(x.dtype))
    out = t.reshape(b, cout, 2 * d, 2 * h, 2 * w)
    return out + bias.astype(out.dtype).reshape(1, -1, 1, 1, 1)


@jax.custom_vjp
def upconv2x_cf(x: jax.Array, kernel: jax.Array, bias: jax.Array) -> jax.Array:
    """Stride-2 2x2x2 transpose conv on (B, Cin, D, H, W) -> (B, Cout,
    2D, 2H, 2W). kernel (2,2,2,Cin,Cout) fp32, bias (Cout,) fp32;
    computes in x.dtype."""
    return _upconv_forward(x, kernel, bias)


def _upconv_fwd_rule(x, kernel, bias):
    return _upconv_forward(x, kernel, bias), (x, kernel)


def _upconv_bwd_rule(res, ct):
    x, kernel = res
    b, cin, d, h, w = x.shape
    cout = kernel.shape[4]
    ct8 = _slice8(ct)  # (b, 8*cout, V)
    k2 = _pack_kernel(kernel, ct.dtype)  # (8*cout, cin)
    # dx[i, b, V] = k2^T @ ct8 (contract the 8*cout axis; volume minor)
    dx = jax.lax.dot_general(
        k2, ct8, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (cin, b, V)
    dx = jnp.transpose(dx, (1, 0, 2)).reshape(x.shape).astype(x.dtype)
    # dk[i, (a p q o)] = x3 @ ct8 contracted over (b, V)
    x3 = x.reshape(b, cin, d * h * w)
    dk = jax.lax.dot_general(
        x3, ct8, (((0, 2), (0, 2)), ((), ())), preferred_element_type=jnp.float32
    )  # (cin, 8*cout)
    dk = jnp.transpose(dk.reshape(cin, 2, 2, 2, cout), (1, 2, 3, 0, 4))
    db = jnp.sum(ct.astype(jnp.float32), axis=(0, 2, 3, 4))
    return dx, dk.astype(kernel.dtype), db.astype(kernel.dtype)


upconv2x_cf.defvjp(_upconv_fwd_rule, _upconv_bwd_rule)
