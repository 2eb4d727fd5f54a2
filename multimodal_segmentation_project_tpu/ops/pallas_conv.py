"""Pallas TPU kernels: fused channel-first 3x3x3 convolution.

WHY THIS KERNEL EXISTS. XLA's TPU convolution stores its operands in a
channels-minor layout, and the (8|16, 128) vector-memory tiling then
lane-pads the channel dimension to 128. For this U-Net's small widths
(C = 1/16/32) every full-resolution activation inflates 4-8x; the
measured 192^3 train step needs ~20 GB of HBM on a 15.75 GB chip and
the padded buffers burn 8x the HBM bandwidth (see models/unet3d.py).
This kernel computes the same conv directly in the compact
channel-first layout:

  x:   (B, Cin, D, H, W)   bf16, W-minor  (pad <= 1.33x, not 8x)
  w:   (Cout, 27*Cin)      packed [kd, kh, kw, cin] contraction order
  out: (B, Cout, D, H, W)  bf16

Per grid step (b, d, h-tile):
  1. DMA the haloed input tile x_pad[b, :, d:d+3, h0:h0+TH+2, :] from
     HBM into VMEM. The input is pre-padded spatially by 1 (SAME halo)
     and the W axis is padded to a 128 lane multiple (WP), so all DMA
     sizes are static, edge handling is branch-free, and the
     (Cin, TH, WP) -> (Cin, TH*WP) panel reshapes are lane-aligned
     (Mosaic rejects reshapes that collapse a non-128-multiple lane
     dim — the raw W=192 cannot be collapsed directly).
  2. assemble a 9-slab im2col panel A (9*Cin, TH*WP): one lane-aligned
     reshape per (kd, kh). The kw in {0,1,2} shifts are NOT assembled
     into the panel: a lane roll commutes with the matmul's N axis
     (W @ rollL(A, kw) == rollL(W @ A, kw)), so the kernel runs three
     dots w_kw @ A and lane-rolls the two shifted RESULTS (Cout x
     TH*WP) instead of 18 rolled panel slabs (27*Cin x TH*WP rows
     through fp32 casts). Measured -29% on the 192^3 16->16 forward;
     the wrap garbage stays in columns >= WP-2, never stored.
  3. fp32-accumulate the three dots, write the (Cout, TH, :W) tile.

Backward reuses the same machinery:
  * dx = the same conv kernel on the padded cotangent with
    spatially-flipped, in/out-transposed weights (transpose-conv
    identity);
  * dw: base_kdh @ rollL(base,kw)-style products are re-expressed as
    A9 @ rollR(g, kw)^T, and the three kw-rolls of the cotangent tile
    are STACKED along the dot's N axis: one dot (9*Cin, TH*WP) x
    (TH*WP, 3*Cout) per depth plane — 96 MXU pass-equivalents vs 224
    for the old (27*Cin) x (TH*WP) x (Cout) shape at Cin=32 (the
    packed N fills 3x more lanes). Accumulated into one (9*Cin,
    3*Cout) block across the sequential grid; g is zero-padded to WP
    so rolled-in wrap columns contribute exactly zero;
  * db is a plain XLA reduction.

Fusion boundary: bias is fused here; BatchNorm/ReLU/dropout stay in
XLA, which fuses that elementwise chain into a single bandwidth pass
over the compact output (training BN needs global output statistics,
so folding it in would force a second pass anyway).

See /opt/skills/guides/pallas_guide.md for the kernel-language
reference used throughout.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _interpret() -> bool:
    """Run in interpreter mode off-TPU (CPU tests, virtual meshes).

    ``MMSEG_FORCE_MOSAIC=1`` forces real Mosaic lowering regardless of
    the default backend — used when AOT-compiling for a TPU *topology*
    (compile-only client, no TPU devices attached) from a CPU process,
    e.g. tests/test_aot_topology.py."""
    if os.environ.get("MMSEG_FORCE_MOSAIC"):
        return False
    return jax.default_backend() != "tpu"


def _kw_dots(w_ref, p, cout: int):
    """Three (Cout, N) fp32 results w_kw @ p, kw in {0,1,2}, computed
    as ONE stacked M=3*Cout dot.

    All three kw taps share the same im2col panel operand, so a single
    dot with the weight matrices stacked on M computes the identical
    three result blocks while filling up to 3x more MXU rows per pass
    (collapsing the leading dims of the packed (3, Cout, 9*Cin) weights
    is legal in Mosaic — not a lane reshape). Measured on the real-TPU
    192^3 train step vs three separate kw dots: −3.4 ms/step."""
    w2 = w_ref[:].reshape(3 * cout, w_ref.shape[2])
    accs = jnp.dot(w2, p, preferred_element_type=jnp.float32)
    return accs[:cout], accs[cout : 2 * cout], accs[2 * cout :]


# Scoped VMEM is 16 MB; budget 12 MB for the explicitly-allocated
# scratch so Mosaic's own temporaries (dot accumulators, copy staging)
# keep headroom. Round-3 shipped static per-Cin TD caps; the budget
# formulas below replace them (round 4) because the static caps forced
# (td+2)/td = 2-3x input over-fetch on the wide-Cin convs at 192^3
# where the actual scratch had megabytes to spare.
_VMEM_BUDGET = 12 * 1024 * 1024


def _stack_temps(td: int, m_ch: int, th: int, wp: int, max_c: int) -> int:
    """Mosaic scoped-STACK cost of the kernels' unrolled plane loop:
    each iteration stacks its fp32 dot temporaries (~2x the M-rows
    result size with slices/rolls). The linear model over-prices the
    192^3-validated shape envelope — every real-chip-benched 192^3
    config (wp=256 only with C <= 32; wp=128 with C <= 64) compiles
    and runs WITHOUT this term, so those shapes are exempted to keep
    their measured-optimal td picks; everything beyond the envelope
    (256^3-class lane widths / wider channels) pays it. Both 256^3
    regressions that motivated this were real Mosaic stack OOMs:
    18.71M at (32->16, wp=384, td=8) and 16.46M at the (64,32, wp=256)
    dw, vs the 16M limit."""
    if (wp <= 128 and max_c <= 64) or (wp <= 256 and max_c <= 32):
        return 0
    return td * 6 * m_ch * th * wp * 4


def _fwd_vmem_bytes(
    cin: int, td: int, th: int, wp: int, itemsize: int,
    block_ch: int = 0, n_blocks: int = 1,
) -> int:
    """Scratch bytes of a forward-shaped kernel: double-buffered haloed
    input tile + im2col panel, plus ``n_blocks`` pipelined VMEM blocks
    of ``block_ch`` channels (the output tile; the dx-epilogue kernel
    adds a raw-x input block)."""
    tile = 2 * cin * (td + 2) * (th + 8) * wp
    panel = 9 * cin * th * wp
    blocks = 2 * n_blocks * block_ch * td * th * wp
    temps = _stack_temps(td, block_ch, th, wp, max(cin, block_ch))
    return (tile + panel + blocks) * itemsize + temps


def _dw_vmem_bytes(cin: int, cout: int, td: int, th: int, wp: int, itemsize: int) -> int:
    """Scratch bytes of the dw kernel: two double-buffered haloed tiles
    (x and the padded cotangent), the x panel, the 3-stacked cotangent
    block, and the fp32 accumulator."""
    tiles = 2 * (cin + cout) * (td + 2) * (th + 8) * wp
    panels = (9 * cin + 3 * cout) * th * wp
    temps = _stack_temps(td, cout, th, wp, max(cin, cout))
    return (tiles + panels) * itemsize + temps + 9 * cin * 3 * cout * 4


def _pick_tile_d(
    d: int, cin: int, th: int, wp: int, itemsize: int = 2,
    block_ch: int = 0, n_blocks: int = 1,
) -> int:
    """Depth tile: computing TD output planes per grid step reuses the
    loaded halo planes (each input plane is read (TD+2)/TD times instead
    of 3 times). Largest TD whose scratch fits the VMEM budget wins —
    A/B-measured on the real chip (docs/PERFORMANCE.md round 4)."""
    for td in (8, 4, 2, 1):
        if d % td == 0 and _fwd_vmem_bytes(
            cin, td, th, wp, itemsize, block_ch, n_blocks
        ) <= _VMEM_BUDGET:
            return td
    return 1


def _pick_tile_d_dw(d: int, cin: int, cout: int, th: int, wp: int, itemsize: int = 2) -> int:
    """dw depth tile, budget-driven like :func:`_pick_tile_d` (the dw
    kernel streams TWO haloed tiles, so its budget formula differs)."""
    for td in (8, 4, 2, 1):
        if d % td == 0 and _dw_vmem_bytes(cin, cout, td, th, wp, itemsize) <= _VMEM_BUDGET:
            return td
    return 1


def _pick_tile_h(h: int, cin: int, wp: int) -> int:
    """Tile height: a multiple of 8 keeps DMA slices sublane-aligned;
    kernels require h % 8 == 0 (the dispatcher falls back to XLA
    otherwise). Larger tiles amortize per-step overhead, but the im2col
    panel (9*Cin x TH*WP) and the unrolled fp32 dot stack must stay
    within the 16 MB scoped-VMEM budget, so wide-Cin convs use shorter
    tiles — and so do wide-W volumes: at 256^3 the full-resolution
    convs lane-pad to WP=384 (every 192^3 shape stays <= 256) and
    TH=16 overflows scoped VMEM by 3.4 MB (measured AOT compile
    error); TH=8 fits with ~4 MB to spare."""
    return 16 if (h % 16 == 0 and cin <= 32 and wp <= 256) else 8


def supported_conv(cin: int, cout: int, h: int, w: int) -> bool:
    """Shapes this kernel handles; the model falls back to XLA convs
    otherwise. The cap is symmetric in cin/cout because the backward
    dx conv swaps them (its im2col panel is built from the cotangent
    with Cout channels).

    The C <= 64 cap is A/B-validated (round 4): routing the C=128
    deep-level convs through this kernel measured 6.87 vs 6.90
    samples/s — the XLA deep convs are already MXU-efficient, the
    bottleneck (12^3 at 192^3 input) fails the h%8 gate regardless,
    and the widest dw panels (9*256 rows) exceed scoped VMEM — so the
    transposes the swap was meant to delete mostly remain. See
    docs/PERFORMANCE.md "Measured dead ends (round 4)".
    """
    return h % 8 == 0 and w >= 8 and cin <= 64 and cout <= 64


def supported_shape(h: int, w: int) -> bool:
    return h % 8 == 0 and w >= 8


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pack_weights(w: jax.Array) -> jax.Array:
    """(3,3,3,Cin,Cout) -> (3, Cout, 9*Cin): one (Cout, 9*Cin) weight
    matrix per kw tap, rows ordered [kd, kh, cin] to match the 9-slab
    panel."""
    k3, _, _, cin, cout = w.shape
    assert k3 == 3
    # (kw, cout, kd, kh, cin)
    return jnp.transpose(w, (2, 4, 0, 1, 3)).reshape(3, cout, 9 * cin)


def unpack_weight_grads(dw_packed: jax.Array, cin: int, cout: int) -> jax.Array:
    """(9*Cin, 3*Cout) [rows (kd,kh,ci), cols (kw,co)] -> (3,3,3,Cin,Cout)."""
    return jnp.transpose(
        dw_packed.reshape(3, 3, cin, 3, cout), (0, 1, 3, 2, 4)
    )


def _pad_for_kernel(x: jax.Array) -> jax.Array:
    """Spatial SAME halo + alignment padding.

    W is padded to a lane multiple (reshape alignment); H gets 1 halo
    row plus 6 extra so every (th+8)-row sublane-aligned DMA stays in
    bounds (DMA slice extents on the second-minor dim must be multiples
    of the 8-row tiling).
    """
    b, c, d, h, w = x.shape
    wp = _round_up(w + 2, LANE)
    return jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 7), (1, wp - w - 1)))


def _assemble_panel(xtile, panel, *, cin, th, wp, td_off=0):
    """9-slab im2col: panel[(kd*3+kh) block] = (Cin, TH*WP) slab.

    No rolls, no casts — the kw shifts happen on the dot RESULTS (fwd)
    or on the cotangent tile (dw), which are Cout-row-sized instead of
    27*Cin-row-sized."""
    for kd in range(3):
        for kh in range(3):
            t = kd * 3 + kh
            panel[pl.ds(t * cin, cin), :] = xtile[
                :, td_off + kd, kh : kh + th, :
            ].reshape(cin, th * wp)


def _tile_dma(x_ref, xtile, dma_sem, slot, b, d0, h0, td, th):
    return pltpu.make_async_copy(
        x_ref.at[b, :, pl.ds(d0, td + 2), pl.ds(h0, th + 8), :],
        xtile.at[slot],
        dma_sem.at[slot],
    )


def _pipelined_tile(x_ref, xtile, dma_sem, *, td, th, n_ht, n_d):
    """Double-buffered input-tile fetch: while computing tile i, tile
    i+1's DMA is already in flight (the kernel is otherwise DMA-latency
    bound: thousands of small sequential copies). Grid dim 1 counts
    depth tiles of TD planes each."""
    b, dt, ht = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    step = (b * n_d + dt) * n_ht + ht
    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        _tile_dma(x_ref, xtile, dma_sem, 0, b, dt * td, ht * th, td, th).start()

    # prefetch the next grid step's tile into the other slot
    nxt = step + 1
    nb = nxt // (n_d * n_ht)
    nd = (nxt // n_ht) - nb * n_d
    nht = jax.lax.rem(nxt, n_ht)
    last = nxt >= pl.num_programs(0) * n_d * n_ht

    @pl.when(jnp.logical_not(last))
    def _():
        _tile_dma(
            x_ref, xtile, dma_sem, 1 - slot, nb, nd * td, nht * th, td, th
        ).start()

    _tile_dma(x_ref, xtile, dma_sem, slot, b, dt * td, ht * th, td, th).wait()
    return slot


def _fwd_kernel(
    x_ref, w_ref, out_ref, xtile, panel, dma_sem, *,
    cin, cout, td, th, w_dim, wp, n_ht, n_d,
):
    slot = _pipelined_tile(x_ref, xtile, dma_sem, td=td, th=th, n_ht=n_ht, n_d=n_d)
    n = th * wp
    for t in range(td):
        _assemble_panel(xtile.at[slot], panel, cin=cin, th=th, wp=wp, td_off=t)
        # kw-split: three dots + two result rolls (see module docstring).
        # rollL(W @ A, kw) == W @ rollL(A, kw); wrap garbage stays in
        # columns >= WP-2 of each row, which are never stored.
        acc, acc1, acc2 = _kw_dots(w_ref, panel[:], cout)
        acc = (
            acc
            + pltpu.roll(acc1, n - 1, axis=1)
            + pltpu.roll(acc2, n - 2, axis=1)
        )
        acc = acc.reshape(cout, th, wp)
        out_ref[0, :, t, :, :] = acc[:, :, :w_dim].astype(out_ref.dtype)


def _fwd_bias_act_kernel(
    x_ref, w_ref, b_ref, out_ref, xtile, panel, dma_sem, *,
    cin, cout, td, th, w_dim, wp, n_ht, n_d, relu,
):
    """Forward conv with bias (+ optional ReLU) applied in-kernel.

    The plain kernel leaves bias to XLA, whose bias+ReLU fusion is a
    separate full-volume elementwise pass (profiled 0.92 ms per
    full-res conv at 192^3 in the eval step). Folding both into the
    dot epilogue makes the inference path's activation free."""
    slot = _pipelined_tile(x_ref, xtile, dma_sem, td=td, th=th, n_ht=n_ht, n_d=n_d)
    n = th * wp
    for t in range(td):
        _assemble_panel(xtile.at[slot], panel, cin=cin, th=th, wp=wp, td_off=t)
        acc, acc1, acc2 = _kw_dots(w_ref, panel[:], cout)
        acc = (
            acc
            + pltpu.roll(acc1, n - 1, axis=1)
            + pltpu.roll(acc2, n - 2, axis=1)
        )
        acc = acc + b_ref[:]
        if relu:
            acc = jnp.maximum(acc, 0.0)
        acc = acc.reshape(cout, th, wp)
        out_ref[0, :, t, :, :] = acc[:, :, :w_dim].astype(out_ref.dtype)


def _fwd_stats_kernel(
    x_ref, w_ref, b_ref, out_ref, stats_ref, xtile, panel, dma_sem, *,
    cin, cout, td, th, w_dim, wp, n_ht, n_d,
):
    """Forward conv + bias with fused per-channel output statistics:
    stats_ref accumulates (sum, sumsq) of the bf16-rounded biased
    output across the sequential grid (the dw accumulation pattern), so
    training-mode BatchNorm never re-reads the volume for its stats
    pass. Bias is added in fp32 before the cast so the stats see
    exactly the tensor BN normalizes."""
    slot = _pipelined_tile(x_ref, xtile, dma_sem, td=td, th=th, n_ht=n_ht, n_d=n_d)
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0) & (pl.program_id(2) == 0)
    n = th * wp
    for t in range(td):
        _assemble_panel(xtile.at[slot], panel, cin=cin, th=th, wp=wp, td_off=t)
        acc, acc1, acc2 = _kw_dots(w_ref, panel[:], cout)
        acc = (
            acc
            + pltpu.roll(acc1, n - 1, axis=1)
            + pltpu.roll(acc2, n - 2, axis=1)
        )
        acc = acc + b_ref[:]
        y_bf = acc.reshape(cout, th, wp)[:, :, :w_dim].astype(out_ref.dtype)
        out_ref[0, :, t, :, :] = y_bf
        # rank-2 throughout: Mosaic rejects rank-1 vectors, and the
        # (cout, th, w_dim) -> (cout, th*w_dim) reshape would collapse a
        # non-128-multiple lane dim
        yf = y_bf.astype(jnp.float32)
        s1 = jnp.sum(jnp.sum(yf, axis=2), axis=1, keepdims=True)  # (cout, 1)
        s2 = jnp.sum(jnp.sum(yf * yf, axis=2), axis=1, keepdims=True)
        s12 = jnp.concatenate([s1, s2], axis=1)  # (cout, 2)
        if t == 0:

            @pl.when(first)
            def _():
                stats_ref[:] = s12

            @pl.when(jnp.logical_not(first))
            def _():
                stats_ref[:] = stats_ref[:] + s12

        else:
            stats_ref[:] = stats_ref[:] + s12


def _make_conv(b, cin, cout, d, h, w_dim, wp, dtype, with_stats=False,
               bias_act=False, relu=False):
    it = jnp.dtype(dtype).itemsize
    th = _pick_tile_h(h, cin, wp)
    td = _pick_tile_d(d, cin, th, wp, it, block_ch=cout)
    n_dt = d // td
    n_ht = h // th
    if with_stats:
        kernel = partial(
            _fwd_stats_kernel, cin=cin, cout=cout, td=td, th=th, w_dim=w_dim,
            wp=wp, n_ht=n_ht, n_d=n_dt,
        )
    elif bias_act:
        kernel = partial(
            _fwd_bias_act_kernel, cin=cin, cout=cout, td=td, th=th,
            w_dim=w_dim, wp=wp, n_ht=n_ht, n_d=n_dt, relu=relu,
        )
    else:
        kernel = partial(
            _fwd_kernel, cin=cin, cout=cout, td=td, th=th, w_dim=w_dim, wp=wp,
            n_ht=n_ht, n_d=n_dt,
        )
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM; manual DMA
        pl.BlockSpec(memory_space=pltpu.VMEM),  # packed weights resident
    ]
    out_spec = pl.BlockSpec(
        (1, cout, td, th, w_dim),
        lambda bb, dd, hh: (bb, 0, dd, hh, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((b, cout, d, h, w_dim), dtype)
    if with_stats or bias_act:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # bias (cout, 1)
    if with_stats:
        out_spec = (
            out_spec,
            pl.BlockSpec((cout, 2), lambda bb, dd, hh: (0, 0), memory_space=pltpu.VMEM),
        )
        out_shape = (out_shape, jax.ShapeDtypeStruct((cout, 2), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(b, n_dt, n_ht),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, cin, td + 2, th + 8, wp), dtype),
            pltpu.VMEM((9 * cin, th * wp), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=_interpret(),
    )


def _conv_apply(x: jax.Array, w_packed: jax.Array, cout: int) -> jax.Array:
    b, cin, d, h, w_dim = x.shape
    xp = _pad_for_kernel(x)
    wp = xp.shape[-1]
    call = _make_conv(b, cin, cout, d, h, w_dim, wp, x.dtype)
    return call(xp, w_packed)


def _conv_apply_padded(
    xp: jax.Array, w_packed: jax.Array, cout: int, w_dim: int
) -> jax.Array:
    """Run the forward kernel on an ALREADY _pad_for_kernel-padded
    input. ``w_dim`` is the unpadded W (the lane pad rounds it away).
    Used by the VJP, which saves the padded input as its residual so
    the dw kernel never re-pads x (the re-pads were measured at several
    ms/step across the net's convs)."""
    b, cin = xp.shape[0], xp.shape[1]
    wp = xp.shape[-1]
    d = xp.shape[2] - 2
    h = xp.shape[3] - 8
    call = _make_conv(b, cin, cout, d, h, w_dim, wp, xp.dtype)
    return call(xp, w_packed)


def _dw_kernel_shared(
    x_ref, pg_ref, dw_ref, xtile, gtile, panel, g3, dma_sem, gdma_sem, *,
    cin, cout, td, th, wp, n_ht, n_d,
):
    """dw with the halo-padded cotangent: pg[l] = g[l-1], so the raw
    kw-roll blocks [g, rollR(g,1), rollR(g,2)] become
    [rollL(pg,1), pg, rollR(pg,1)]; rolled-in wrap columns land on pg's
    zero halo/pad lanes and contribute exactly zero. Plane t+1 / rows
    1..th+1 are the static halo offsets."""
    slot = _pipelined_tile(x_ref, xtile, dma_sem, td=td, th=th, n_ht=n_ht, n_d=n_d)
    # the same double-buffer schedule drives the cotangent stream (the
    # helper only reads grid ids, so the slots coincide)
    gslot = _pipelined_tile(pg_ref, gtile, gdma_sem, td=td, th=th, n_ht=n_ht, n_d=n_d)

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0) & (pl.program_id(2) == 0)
    n = th * wp
    for t in range(td):
        _assemble_panel(xtile.at[slot], panel, cin=cin, th=th, wp=wp, td_off=t)
        g_tile = gtile[gslot, :, t + 1, 1 : th + 1, :].reshape(cout, th * wp)
        g32 = g_tile.astype(jnp.float32)
        g3[pl.ds(0, cout), :] = pltpu.roll(g32, n - 1, axis=1).astype(g_tile.dtype)
        g3[pl.ds(cout, cout), :] = g_tile
        g3[pl.ds(2 * cout, cout), :] = pltpu.roll(g32, 1, axis=1).astype(g_tile.dtype)
        pdw = jax.lax.dot_general(
            panel[:], g3[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if t == 0:

            @pl.when(first)
            def _():
                dw_ref[:] = pdw

            @pl.when(jnp.logical_not(first))
            def _():
                dw_ref[:] = dw_ref[:] + pdw

        else:
            dw_ref[:] = dw_ref[:] + pdw


def _conv_dw_shared(xp: jax.Array, pg: jax.Array, cout: int) -> jax.Array:
    """dW_packed from the padded forward input AND padded cotangent —
    both straight from the backward's residuals, zero pads issued here."""
    b, cin = xp.shape[0], xp.shape[1]
    d, h = xp.shape[2] - 2, xp.shape[3] - 8
    wp = xp.shape[-1]
    th = _pick_tile_h(h, cin, wp)
    td = _pick_tile_d_dw(d, cin, cout, th, wp, xp.dtype.itemsize)
    n_dt, n_ht = d // td, h // th
    kernel = partial(
        _dw_kernel_shared, cin=cin, cout=cout, td=td, th=th, wp=wp,
        n_ht=n_ht, n_d=n_dt,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, n_dt, n_ht),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (9 * cin, 3 * cout), lambda bb, dd, hh: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((9 * cin, 3 * cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, cin, td + 2, th + 8, wp), xp.dtype),
            pltpu.VMEM((2, cout, td + 2, th + 8, wp), pg.dtype),
            pltpu.VMEM((9 * cin, th * wp), xp.dtype),
            pltpu.VMEM((3 * cout, th * wp), pg.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=_interpret(),
    )(xp, pg)


@partial(jax.custom_vjp, nondiff_argnums=())
def conv3x3x3_cf(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """SAME 3x3x3 conv, channel-first (B, C, D, H, W), Pallas TPU kernel.

    w: (3, 3, 3, Cin, Cout); b: (Cout,).
    """
    return _conv_forward(x, w, b)


def _conv_forward(x, w, b):
    cout = w.shape[4]
    w_packed = pack_weights(w).astype(x.dtype)
    out = _conv_apply(x, w_packed, cout)
    return out + b.astype(out.dtype).reshape(1, -1, 1, 1, 1)


def _conv_fwd_rule(x, w, b):
    # save the PADDED input: the dw kernel consumes the identical
    # _pad_for_kernel layout, so the backward never re-pads x
    cout = w.shape[4]
    w_packed = pack_weights(w).astype(x.dtype)
    xp = _pad_for_kernel(x)
    out = _conv_apply_padded(xp, w_packed, cout, x.shape[-1])
    out = out + b.astype(out.dtype).reshape(1, -1, 1, 1, 1)
    return out, (xp, w)


def _conv_bwd_rule(res, g):
    xp, w = res
    cin, cout = w.shape[3], w.shape[4]
    # dx: conv of g with spatially-flipped, in/out-swapped weights
    w_flip = w[::-1, ::-1, ::-1, :, :]
    w_t = jnp.transpose(w_flip, (0, 1, 2, 4, 3))  # (3,3,3,Cout,Cin)
    wt_packed = pack_weights(w_t).astype(g.dtype)
    # ONE halo pad of g feeds both the dx conv and the dw kernel (the
    # lane shift folds into the kw rolls). Measured on the real-TPU
    # 192^3 train step vs a second W-only pad of g: −13.5 ms/step.
    pg = _pad_for_kernel(g)
    dx = _conv_apply_padded(pg, wt_packed, cin, g.shape[-1])
    dw_packed = _conv_dw_shared(xp, pg, cout)
    dw = unpack_weight_grads(dw_packed, cin, cout).astype(w.dtype)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 2, 3, 4)).astype(w.dtype)
    return dx, dw, db


conv3x3x3_cf.defvjp(_conv_fwd_rule, _conv_bwd_rule)


@partial(jax.custom_vjp, nondiff_argnums=())
def conv3x3x3_cf_relu(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """SAME 3x3x3 conv + bias + ReLU, fused into one kernel pass.

    The inference path's post-conv activation (bias-add + ReLU, with
    the BatchNorm affine already folded into w/b by the caller) as a
    dot epilogue — removes the separate XLA elementwise pass over the
    volume (0.92 ms per full-res conv at 192^3). Differentiable (the
    backward masks the cotangent by out > 0 and reuses the plain conv
    backward), though the training path uses the boundary-fused kernels
    instead."""
    bdim, cin, d, h, w_dim = x.shape
    cout = w.shape[4]
    w_packed = pack_weights(w).astype(x.dtype)
    xp = _pad_for_kernel(x)
    call = _make_conv(
        bdim, cin, cout, d, h, w_dim, xp.shape[-1], x.dtype,
        bias_act=True, relu=True,
    )
    return call(xp, w_packed, b.astype(jnp.float32).reshape(cout, 1))


def _conv_relu_fwd_rule(x, w, b):
    out = conv3x3x3_cf_relu(x, w, b)
    return out, (x, w, out)


def _conv_relu_bwd_rule(res, g):
    x, w, out = res
    g = jnp.where(out > 0, g, jnp.zeros((), g.dtype))
    xp = _pad_for_kernel(x)
    cin, cout = w.shape[3], w.shape[4]
    w_flip = w[::-1, ::-1, ::-1, :, :]
    w_t = jnp.transpose(w_flip, (0, 1, 2, 4, 3))
    wt_packed = pack_weights(w_t).astype(g.dtype)
    pg = _pad_for_kernel(g)
    dx = _conv_apply_padded(pg, wt_packed, cin, g.shape[-1])
    dw_packed = _conv_dw_shared(xp, pg, cout)
    dw = unpack_weight_grads(dw_packed, cin, cout).astype(w.dtype)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 2, 3, 4)).astype(w.dtype)
    return dx, dw, db


conv3x3x3_cf_relu.defvjp(_conv_relu_fwd_rule, _conv_relu_bwd_rule)


@partial(jax.custom_vjp, nondiff_argnums=())
def conv3x3x3_cf_stats(x: jax.Array, w: jax.Array, b: jax.Array):
    """SAME 3x3x3 conv + bias with fused per-channel output statistics.

    Returns ``(y, s1, s2)`` where ``s1[c] = sum(y[:, c])`` and
    ``s2[c] = sum(y[:, c]**2)`` over batch and volume, accumulated
    inside the forward kernel — training-mode BatchNorm consumes them
    directly instead of re-reading the full volume (a ~1.3 ms reduce
    per 192^3 conv). Differentiable in all outputs: the stats
    cotangents fold into an effective output gradient
    ``g + gs1 + 2*y*gs2`` (one fused elementwise pass in the backward).
    """
    return _conv_forward_stats(x, w, b)


def _conv_forward_stats(x, w, b, xp=None):
    bdim, cin, d, h, w_dim = x.shape
    cout = w.shape[4]
    w_packed = pack_weights(w).astype(x.dtype)
    if xp is None:
        xp = _pad_for_kernel(x)
    wp = xp.shape[-1]
    call = _make_conv(bdim, cin, cout, d, h, w_dim, wp, x.dtype, with_stats=True)
    out, stats = call(xp, w_packed, b.astype(jnp.float32).reshape(cout, 1))
    return out, stats[:, 0], stats[:, 1]


def _conv_stats_fwd_rule(x, w, b):
    xp = _pad_for_kernel(x)
    out, s1, s2 = _conv_forward_stats(x, w, b, xp=xp)
    return (out, s1, s2), (xp, w, out)


def _conv_stats_bwd_rule(res, cts):
    xp, w, y = res
    g, gs1, gs2 = cts
    cin, cout = w.shape[3], w.shape[4]
    g_eff = (
        g.astype(jnp.float32)
        + gs1.reshape(1, -1, 1, 1, 1)
        + 2.0 * y.astype(jnp.float32) * gs2.reshape(1, -1, 1, 1, 1)
    ).astype(g.dtype)
    w_flip = w[::-1, ::-1, ::-1, :, :]
    w_t = jnp.transpose(w_flip, (0, 1, 2, 4, 3))
    wt_packed = pack_weights(w_t).astype(g.dtype)
    pg = _pad_for_kernel(g_eff)
    dx = _conv_apply_padded(pg, wt_packed, cin, g_eff.shape[-1])
    dw = unpack_weight_grads(_conv_dw_shared(xp, pg, cout), cin, cout)
    dw = dw.astype(w.dtype)
    db = jnp.sum(g_eff.astype(jnp.float32), axis=(0, 2, 3, 4)).astype(w.dtype)
    return dx, dw, db


conv3x3x3_cf_stats.defvjp(_conv_stats_fwd_rule, _conv_stats_bwd_rule)


# ---- fused boundary op: conv(relu(x*a + t)) + bias -------------------
#
# The BN-apply + ReLU + Dropout3d chain between two convs is a
# per-(batch, channel) affine followed by relu (the dropout channel
# mask folds into (a, t) since mask >= 0:
# relu(x*a + t) * m == relu(x*(a*m) + t*(m))). The consumer conv applies
# it to its DMA'd tile in VMEM, so the intermediate activation never
# exists in HBM (reference chain: models/unet.py:11-22 Conv3d->BN->
# ReLU->Dropout3d). The input here is the RAW producer output padded by
# _pad_for_kernel, so the transform must keep the SAME-halo zeros zero:
# relu(0*a + t) = relu(t) != 0 — halo positions are masked with iota
# index math against the tile's global coordinates.


def _prologue_tile(xtile, slot, a2, t2, *, cin, td, th, wp, d0, h0, D, H, W):
    """In-place relu(x*a + t) on the DMA'd tile with halo masking.

    a2/t2: (cin, 1) fp32 for this batch element. In padded coords,
    position (dp, hp, wl) is interior iff 1 <= dp <= D, 1 <= hp <= H,
    1 <= wl <= W."""
    row_i = jax.lax.broadcasted_iota(jnp.int32, (th + 8, wp), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (th + 8, wp), 1)
    hp = row_i + h0
    mask_hw = (hp >= 1) & (hp <= H) & (lane_i >= 1) & (lane_i <= W)
    for p in range(td + 2):
        dp = d0 + p
        dv = (dp >= 1) & (dp <= D)
        v = xtile[slot, :, p, :, :].astype(jnp.float32)  # (cin, th+8, wp)
        z = jnp.maximum(v * a2[:, :, None] + t2[:, :, None], 0.0)
        z = jnp.where((mask_hw & dv)[None, :, :], z, 0.0)
        xtile[slot, :, p, :, :] = z.astype(xtile.dtype)


def _fwd_prologue_kernel(
    x_ref, w_ref, a_ref, t_ref, out_ref, xtile, panel, dma_sem, *,
    cin, cout, td, th, w_dim, wp, n_ht, n_d, D, H,
):
    slot = _pipelined_tile(x_ref, xtile, dma_sem, td=td, th=th, n_ht=n_ht, n_d=n_d)
    dt, ht = pl.program_id(1), pl.program_id(2)
    _prologue_tile(
        xtile, slot, a_ref[0], t_ref[0],
        cin=cin, td=td, th=th, wp=wp,
        d0=dt * td, h0=ht * th, D=D, H=H, W=w_dim,
    )
    n = th * wp
    for t in range(td):
        _assemble_panel(xtile.at[slot], panel, cin=cin, th=th, wp=wp, td_off=t)
        acc, acc1, acc2 = _kw_dots(w_ref, panel[:], cout)
        acc = (
            acc
            + pltpu.roll(acc1, n - 1, axis=1)
            + pltpu.roll(acc2, n - 2, axis=1)
        )
        acc = acc.reshape(cout, th, wp)
        out_ref[0, :, t, :, :] = acc[:, :, :w_dim].astype(out_ref.dtype)


def _conv_boundary_apply(xp, w_packed, a, t, cout, w_dim):
    b, cin = xp.shape[0], xp.shape[1]
    d, h = xp.shape[2] - 2, xp.shape[3] - 8
    wp = xp.shape[-1]
    th = _pick_tile_h(h, cin, wp)
    td = _pick_tile_d(d, cin, th, wp, xp.dtype.itemsize, block_ch=cout)
    n_dt, n_ht = d // td, h // th
    kernel = partial(
        _fwd_prologue_kernel, cin=cin, cout=cout, td=td, th=th,
        w_dim=w_dim, wp=wp, n_ht=n_ht, n_d=n_dt, D=d, H=h,
    )
    a3 = a.astype(jnp.float32).reshape(b, cin, 1)
    t3 = t.astype(jnp.float32).reshape(b, cin, 1)
    scalar_spec = pl.BlockSpec(
        (1, cin, 1), lambda bb, dd, hh: (bb, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(b, n_dt, n_ht),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            scalar_spec,
            scalar_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, cout, td, th, w_dim),
            lambda bb, dd, hh: (bb, 0, dd, hh, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, cout, d, h, w_dim), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, cin, td + 2, th + 8, wp), xp.dtype),
            pltpu.VMEM((9 * cin, th * wp), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=_interpret(),
    )(xp, w_packed, a3, t3)


def _dw_kernel_prologue(
    x_ref, pg_ref, a_ref, t_ref, dw_ref, xtile, gtile, panel, g3,
    dma_sem, gdma_sem, *, cin, cout, td, th, wp, n_ht, n_d, D, H, W,
):
    """dw through the transformed input: the same prologue runs on the
    x tile before panel assembly; g is read from the shared halo-padded
    buffer (see _dw_kernel_shared)."""
    slot = _pipelined_tile(x_ref, xtile, dma_sem, td=td, th=th, n_ht=n_ht, n_d=n_d)
    gslot = _pipelined_tile(pg_ref, gtile, gdma_sem, td=td, th=th, n_ht=n_ht, n_d=n_d)
    dt, ht = pl.program_id(1), pl.program_id(2)
    _prologue_tile(
        xtile, slot, a_ref[0], t_ref[0],
        cin=cin, td=td, th=th, wp=wp,
        d0=dt * td, h0=ht * th, D=D, H=H, W=W,
    )
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0) & (pl.program_id(2) == 0)
    n = th * wp
    for t in range(td):
        _assemble_panel(xtile.at[slot], panel, cin=cin, th=th, wp=wp, td_off=t)
        g_tile = gtile[gslot, :, t + 1, 1 : th + 1, :].reshape(cout, th * wp)
        g32 = g_tile.astype(jnp.float32)
        g3[pl.ds(0, cout), :] = pltpu.roll(g32, n - 1, axis=1).astype(g_tile.dtype)
        g3[pl.ds(cout, cout), :] = g_tile
        g3[pl.ds(2 * cout, cout), :] = pltpu.roll(g32, 1, axis=1).astype(g_tile.dtype)
        pdw = jax.lax.dot_general(
            panel[:], g3[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if t == 0:

            @pl.when(first)
            def _():
                dw_ref[:] = pdw

            @pl.when(jnp.logical_not(first))
            def _():
                dw_ref[:] = dw_ref[:] + pdw

        else:
            dw_ref[:] = dw_ref[:] + pdw


def _conv_dw_prologue(xp, pg, a, t, cout, w_dim):
    b, cin = xp.shape[0], xp.shape[1]
    d, h = xp.shape[2] - 2, xp.shape[3] - 8
    wp = xp.shape[-1]
    th = _pick_tile_h(h, cin, wp)
    td = _pick_tile_d_dw(d, cin, cout, th, wp, xp.dtype.itemsize)
    n_dt, n_ht = d // td, h // th
    kernel = partial(
        _dw_kernel_prologue, cin=cin, cout=cout, td=td, th=th, wp=wp,
        n_ht=n_ht, n_d=n_dt, D=d, H=h, W=w_dim,
    )
    a3 = a.astype(jnp.float32).reshape(b, cin, 1)
    t3 = t.astype(jnp.float32).reshape(b, cin, 1)
    scalar_spec = pl.BlockSpec(
        (1, cin, 1), lambda bb, dd, hh: (bb, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(b, n_dt, n_ht),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            scalar_spec,
            scalar_spec,
        ],
        out_specs=pl.BlockSpec(
            (9 * cin, 3 * cout), lambda bb, dd, hh: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((9 * cin, 3 * cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, cin, td + 2, th + 8, wp), xp.dtype),
            pltpu.VMEM((2, cout, td + 2, th + 8, wp), pg.dtype),
            pltpu.VMEM((9 * cin, th * wp), xp.dtype),
            pltpu.VMEM((3 * cout, th * wp), pg.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=_interpret(),
    )(xp, pg, a3, t3)


def _dx_epilogue_kernel(
    pg_ref, w_ref, x_ref, a_ref, t_ref, dy_ref, acc_ref, gtile, panel,
    dma_sem, *, cout_g, cin, td, th, w_dim, wp, n_ht, n_d,
):
    """dx conv + boundary epilogue: the conv of the halo-padded
    cotangent with flipped weights yields dr (grad wrt relu(x*a+t));
    the epilogue consumes the raw x block at the same coordinates and
    writes dy = dr * (x*a+t > 0) * a directly, while accumulating
    (da, dt) = (sum du*x, sum du) per (batch, channel) — dr never
    exists in HBM."""
    slot = _pipelined_tile(pg_ref, gtile, dma_sem, td=td, th=th, n_ht=n_ht, n_d=n_d)
    a2 = a_ref[0].astype(jnp.float32)  # (cin, 1)
    t2 = t_ref[0].astype(jnp.float32)
    first = (pl.program_id(1) == 0) & (pl.program_id(2) == 0)
    n = th * wp
    for t in range(td):
        _assemble_panel(gtile.at[slot], panel, cin=cout_g, th=th, wp=wp, td_off=t)
        acc, acc1, acc2 = _kw_dots(w_ref, panel[:], cin)
        acc = (
            acc
            + pltpu.roll(acc1, n - 1, axis=1)
            + pltpu.roll(acc2, n - 2, axis=1)
        )
        dr = acc.reshape(cin, th, wp)[:, :, :w_dim]  # fp32
        xt = x_ref[0, :, t, :, :].astype(jnp.float32)  # (cin, th, w_dim)
        u_pos = xt * a2[:, :, None] + t2[:, :, None] > 0.0
        du = jnp.where(u_pos, dr, 0.0)
        dy_ref[0, :, t, :, :] = (du * a2[:, :, None]).astype(dy_ref.dtype)
        s_da = jnp.sum(jnp.sum(du * xt, axis=2), axis=1, keepdims=True)
        s_dt = jnp.sum(jnp.sum(du, axis=2), axis=1, keepdims=True)
        s = jnp.concatenate([s_da, s_dt], axis=1)  # (cin, 2)
        if t == 0:

            @pl.when(first)
            def _():
                acc_ref[0] = s

            @pl.when(jnp.logical_not(first))
            def _():
                acc_ref[0] = acc_ref[0] + s

        else:
            acc_ref[0] = acc_ref[0] + s


def _conv_dx_epilogue(pg, wt_packed, x, a, t):
    """dy, da, dt from the halo-padded cotangent in ONE kernel (the
    fused boundary backward)."""
    b, cin, d, h, w_dim = x.shape
    cout_g = pg.shape[1]
    wp = pg.shape[-1]
    th = _pick_tile_h(h, cout_g, wp)
    td = _pick_tile_d(
        d, cout_g, th, wp, pg.dtype.itemsize, block_ch=cin, n_blocks=2
    )
    n_dt, n_ht = d // td, h // th
    kernel = partial(
        _dx_epilogue_kernel, cout_g=cout_g, cin=cin, td=td, th=th,
        w_dim=w_dim, wp=wp, n_ht=n_ht, n_d=n_dt,
    )
    a3 = a.astype(jnp.float32).reshape(b, cin, 1)
    t3 = t.astype(jnp.float32).reshape(b, cin, 1)
    scalar_spec = pl.BlockSpec(
        (1, cin, 1), lambda bb, dd, hh: (bb, 0, 0), memory_space=pltpu.VMEM
    )
    dy, acc = pl.pallas_call(
        kernel,
        grid=(b, n_dt, n_ht),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # pg: manual haloed DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),  # flipped weights
            pl.BlockSpec(  # raw x block at output coords
                (1, cin, td, th, w_dim),
                lambda bb, dd, hh: (bb, 0, dd, hh, 0),
                memory_space=pltpu.VMEM,
            ),
            scalar_spec,
            scalar_spec,
        ],
        out_specs=(
            pl.BlockSpec(
                (1, cin, td, th, w_dim),
                lambda bb, dd, hh: (bb, 0, dd, hh, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, cin, 2), lambda bb, dd, hh: (bb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((b, cin, 2), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, cout_g, td + 2, th + 8, wp), pg.dtype),
            pltpu.VMEM((9 * cout_g, th * wp), pg.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=_interpret(),
    )(pg, wt_packed, x, a3, t3)
    return dy, acc[:, :, 0], acc[:, :, 1]


@jax.custom_vjp
def conv3x3x3_cf_boundary(
    x: jax.Array, w: jax.Array, b: jax.Array, a: jax.Array, t: jax.Array
) -> jax.Array:
    """SAME 3x3x3 conv of relu(x*a + t), channel-first, Pallas TPU kernel.

    (a, t): (B, Cin) fp32 per-(batch, channel) affine — the training-mode
    BN-apply + ReLU + Dropout3d chain of the preceding conv, applied to
    the input tile in VMEM so the activated intermediate never touches
    HBM. w: (3,3,3,Cin,Cout); b: (Cout,)."""
    cout = w.shape[4]
    xp = _pad_for_kernel(x)
    w_packed = pack_weights(w).astype(x.dtype)
    out = _conv_boundary_apply(xp, w_packed, a, t, cout, x.shape[-1])
    return out + b.astype(out.dtype).reshape(1, -1, 1, 1, 1)


def _boundary_fwd_rule(x, w, b, a, t):
    return conv3x3x3_cf_boundary(x, w, b, a, t), (x, w, a, t)


def _boundary_bwd_rule(res, g):
    x, w, a, t = res
    cin, cout = w.shape[3], w.shape[4]
    pg = _pad_for_kernel(g)
    w_flip = w[::-1, ::-1, ::-1, :, :]
    w_t = jnp.transpose(w_flip, (0, 1, 2, 4, 3))
    wt_packed = pack_weights(w_t).astype(g.dtype)
    # dx conv + relu-mask/affine epilogue + (da, dt) accumulators in
    # ONE kernel — the conv's raw output (dr) never exists in HBM.
    # Measured on the real-TPU 192^3 train step vs materializing dr
    # with a fused XLA tail: −6.4 ms/step in combination with the
    # other round-3 kernel changes.
    dx, da, dt_ = _conv_dx_epilogue(pg, wt_packed, x, a, t)
    da = da.astype(a.dtype)
    dt_ = dt_.astype(t.dtype)
    xp = _pad_for_kernel(x)
    dw_packed = _conv_dw_prologue(xp, pg, a, t, cout, g.shape[-1])
    dw = unpack_weight_grads(dw_packed, cin, cout).astype(w.dtype)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 2, 3, 4)).astype(w.dtype)
    return dx, dw, db, da, dt_


conv3x3x3_cf_boundary.defvjp(_boundary_fwd_rule, _boundary_bwd_rule)


def _fwd_prologue_stats_kernel(
    x_ref, w_ref, a_ref, t_ref, b_ref, out_ref, stats_ref, xtile, panel,
    dma_sem, *, cin, cout, td, th, w_dim, wp, n_ht, n_d, D, H,
):
    """Boundary prologue + bias + fused per-channel output statistics:
    the merge of _fwd_prologue_kernel and _fwd_stats_kernel, so the
    SECOND BatchNorm of a fused DoubleConv never re-reads the volume
    for its stats pass either. Bias is added in fp32 before the cast so
    the stats see exactly the tensor BN normalizes."""
    slot = _pipelined_tile(x_ref, xtile, dma_sem, td=td, th=th, n_ht=n_ht, n_d=n_d)
    dt, ht = pl.program_id(1), pl.program_id(2)
    _prologue_tile(
        xtile, slot, a_ref[0], t_ref[0],
        cin=cin, td=td, th=th, wp=wp,
        d0=dt * td, h0=ht * th, D=D, H=H, W=w_dim,
    )
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0) & (pl.program_id(2) == 0)
    n = th * wp
    for t in range(td):
        _assemble_panel(xtile.at[slot], panel, cin=cin, th=th, wp=wp, td_off=t)
        acc, acc1, acc2 = _kw_dots(w_ref, panel[:], cout)
        acc = (
            acc
            + pltpu.roll(acc1, n - 1, axis=1)
            + pltpu.roll(acc2, n - 2, axis=1)
        )
        acc = acc + b_ref[:]
        y_bf = acc.reshape(cout, th, wp)[:, :, :w_dim].astype(out_ref.dtype)
        out_ref[0, :, t, :, :] = y_bf
        yf = y_bf.astype(jnp.float32)
        s1 = jnp.sum(jnp.sum(yf, axis=2), axis=1, keepdims=True)
        s2 = jnp.sum(jnp.sum(yf * yf, axis=2), axis=1, keepdims=True)
        s12 = jnp.concatenate([s1, s2], axis=1)  # (cout, 2)
        if t == 0:

            @pl.when(first)
            def _():
                stats_ref[:] = s12

            @pl.when(jnp.logical_not(first))
            def _():
                stats_ref[:] = stats_ref[:] + s12

        else:
            stats_ref[:] = stats_ref[:] + s12


def _conv_boundary_apply_stats(xp, w_packed, a, t, bias, cout, w_dim):
    b, cin = xp.shape[0], xp.shape[1]
    d, h = xp.shape[2] - 2, xp.shape[3] - 8
    wp = xp.shape[-1]
    th = _pick_tile_h(h, cin, wp)
    td = _pick_tile_d(d, cin, th, wp, xp.dtype.itemsize, block_ch=cout)
    n_dt, n_ht = d // td, h // th
    kernel = partial(
        _fwd_prologue_stats_kernel, cin=cin, cout=cout, td=td, th=th,
        w_dim=w_dim, wp=wp, n_ht=n_ht, n_d=n_dt, D=d, H=h,
    )
    a3 = a.astype(jnp.float32).reshape(b, cin, 1)
    t3 = t.astype(jnp.float32).reshape(b, cin, 1)
    scalar_spec = pl.BlockSpec(
        (1, cin, 1), lambda bb, dd, hh: (bb, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(b, n_dt, n_ht),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            scalar_spec,
            scalar_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias (cout, 1) fp32
        ],
        out_specs=(
            pl.BlockSpec(
                (1, cout, td, th, w_dim),
                lambda bb, dd, hh: (bb, 0, dd, hh, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (cout, 2), lambda bb, dd, hh: (0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, cout, d, h, w_dim), xp.dtype),
            jax.ShapeDtypeStruct((cout, 2), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, cin, td + 2, th + 8, wp), xp.dtype),
            pltpu.VMEM((9 * cin, th * wp), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=_interpret(),
    )(xp, w_packed, a3, t3, bias)


def _boundary_stats_forward(x, w, b, a, t):
    cout = w.shape[4]
    xp = _pad_for_kernel(x)
    w_packed = pack_weights(w).astype(x.dtype)
    out, stats = _conv_boundary_apply_stats(
        xp, w_packed, a, t, b.astype(jnp.float32).reshape(cout, 1),
        cout, x.shape[-1],
    )
    return out, stats[:, 0], stats[:, 1]


@partial(jax.custom_vjp, nondiff_argnums=())
def conv3x3x3_cf_boundary_stats(
    x: jax.Array, w: jax.Array, b: jax.Array, a: jax.Array, t: jax.Array
):
    """conv3x3x3_cf_boundary + fused per-channel output statistics.

    Returns ``(y, s1, s2)`` with ``y = conv(relu(x*a + t)) + b`` and
    ``(s1, s2)`` the per-channel (sum, sumsq) of y accumulated inside
    the forward kernel — the fused DoubleConv's second BatchNorm
    consumes them instead of re-reading the volume with a standalone
    reduce. A/B on the real chip (round 4): NEUTRAL on the full train
    step vs an unfused XLA stats reduce (6.7167 vs 6.7163 samples/s) —
    XLA piggybacks that reduce on the fp32 convert pass the BN apply
    needs anyway; the fusion is kept for the simpler graph, not a
    measured step win. The stats cotangents fold into an effective
    output gradient ``g + gs1 + 2*y*gs2``; the rest of the backward is
    the boundary op's (dx-epilogue kernel + prologue dw kernel)."""
    return _boundary_stats_forward(x, w, b, a, t)


def _boundary_stats_fwd_rule(x, w, b, a, t):
    y, s1, s2 = _boundary_stats_forward(x, w, b, a, t)
    return (y, s1, s2), (x, w, a, t, y)


def _boundary_stats_bwd_rule(res, cts):
    x, w, a, t, y = res
    g, gs1, gs2 = cts
    cin, cout = w.shape[3], w.shape[4]
    g_eff = (
        g.astype(jnp.float32)
        + gs1.reshape(1, -1, 1, 1, 1)
        + 2.0 * y.astype(jnp.float32) * gs2.reshape(1, -1, 1, 1, 1)
    ).astype(g.dtype)
    pg = _pad_for_kernel(g_eff)
    w_flip = w[::-1, ::-1, ::-1, :, :]
    wt_packed = pack_weights(jnp.transpose(w_flip, (0, 1, 2, 4, 3))).astype(
        g_eff.dtype
    )
    dx, da, dt_ = _conv_dx_epilogue(pg, wt_packed, x, a, t)
    xp = _pad_for_kernel(x)
    dw = unpack_weight_grads(
        _conv_dw_prologue(xp, pg, a, t, cout, g.shape[-1]), cin, cout
    ).astype(w.dtype)
    db = jnp.sum(g_eff.astype(jnp.float32), axis=(0, 2, 3, 4)).astype(w.dtype)
    return dx, dw, db, da.astype(a.dtype), dt_.astype(t.dtype)


conv3x3x3_cf_boundary_stats.defvjp(
    _boundary_stats_fwd_rule, _boundary_stats_bwd_rule
)


def conv3x3x3_cf_reference(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """XLA reference implementation (for tests / non-TPU fallback)."""
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w.astype(jnp.float32),
        window_strides=(1, 1, 1),
        padding="SAME",
        dimension_numbers=("NCDHW", "DHWIO", "NCDHW"),
    )
    return (out + b.astype(jnp.float32).reshape(1, -1, 1, 1, 1)).astype(x.dtype)
