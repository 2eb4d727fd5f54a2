"""Halo-exchange spatial sharding for 3x3x3 convs (shard_map + ppermute).

The 192^3 volume's D axis can be sharded over the mesh's 'spatial' axis
— the conv-net analog of sequence parallelism and the memory escape
hatch for full-volume training (SURVEY.md section 2.10; the reference
has no model sharding at all). A SAME 3^3 conv needs one neighbor plane
on each side of every shard boundary. XLA's auto-SPMD partitioner can
insert those halos for ``lax.conv``, but a ``pallas_call`` cannot be
auto-partitioned, so this module makes the exchange explicit:

  * inside a ``shard_map`` manual over ('data', 'spatial'), each shard
    ``ppermute``s its first/last D plane to its neighbors (a ring
    without wraparound — boundary shards receive ppermute's zero fill,
    which is exactly the conv's SAME zero padding);
  * the UNMODIFIED local conv kernel runs on the haloed (Dl+2)-plane
    block — SAME padding along D produces two garbage edge planes that
    are sliced off, trading 2/(D/n_sp) wasted planes for zero new
    kernel code;
  * both conv implementations plug in unchanged: inside the shard_map
    body they see a plain local array, which is precisely how a Pallas
    kernel must execute on a real multi-chip mesh.

Collectives: two (B, C, 1, H, W)-plane ppermutes per conv, riding ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from multimodal_segmentation_project_tpu.parallel.mesh import (
    DATA_AXIS,
    SPATIAL_AXIS,
)


def _exchange_halo_d(xl: jax.Array, n_sp: int) -> jax.Array:
    """(B, C, Dl, H, W) local block -> (B, C, Dl+2, H, W) with neighbor
    planes attached (zeros at the global volume boundary)."""
    fwd = [(i, i + 1) for i in range(n_sp - 1)]  # my last plane -> next shard
    bwd = [(i + 1, i) for i in range(n_sp - 1)]  # my first plane -> prev shard
    from_prev = jax.lax.ppermute(xl[:, :, -1:], SPATIAL_AXIS, fwd)
    from_next = jax.lax.ppermute(xl[:, :, :1], SPATIAL_AXIS, bwd)
    return jnp.concatenate([from_prev, xl, from_next], axis=2)


def halo_conv3(conv_fn, x: jax.Array, w: jax.Array, b: jax.Array, mesh):
    """Run ``conv_fn(x, w, b)`` (a SAME 3x3x3 channel-first conv) with
    x's D axis sharded over the mesh's spatial axis and/or its batch
    axis sharded over 'data'.

    ``conv_fn`` is either the Pallas kernel (ops.pallas_conv.conv3x3x3_cf)
    or the XLA reference conv — any (x, w, b) -> y with SAME padding.
    A pallas_call cannot be auto-partitioned by XLA, so EVERY
    multi-device mesh needs the explicit shard_map island — including
    the data-parallel-only case (n_spatial == 1), where the batch is
    embarrassingly parallel and no halo exchange is issued. The batch
    axis is sharded over 'data' when divisible (training), else
    replicated (e.g. batch-1 full-volume eval, test_model.py protocol).
    """
    n_sp = mesh.shape[SPATIAL_AXIS]
    n_dp = mesh.shape[DATA_AXIS]
    spatial = n_sp > 1 and x.shape[2] % n_sp == 0
    batch = DATA_AXIS if (n_dp > 1 and x.shape[0] % n_dp == 0) else None
    if not spatial and batch is None:
        # nothing shardable (e.g. batch-1 eval on a dp-only mesh, or a
        # tiny bottleneck D on a deep spatial mesh with no batch split):
        # run unsharded semantics and let auto-SPMD place/replicate it
        return conv_fn(x, w, b)
    spec = P(batch, None, SPATIAL_AXIS if spatial else None, None, None)

    def body(xl, wl, bl):
        if spatial:
            xh = _exchange_halo_d(xl, n_sp)
            return conv_fn(xh, wl, bl)[:, :, 1:-1]
        return conv_fn(xl, wl, bl)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, P(), P()),
        out_specs=spec,
        axis_names=frozenset({DATA_AXIS, SPATIAL_AXIS}),
        # pallas_call outputs carry no varying-manual-axes metadata, so
        # the vma checker cannot see through the kernel; the specs above
        # are total, making the check redundant here
        check_vma=False,
    )(x, w, b)
