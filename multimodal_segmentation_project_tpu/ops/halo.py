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
    x's D axis sharded over the mesh's spatial axis.

    ``conv_fn`` is either the Pallas kernel (ops.pallas_conv.conv3x3x3_cf)
    or the XLA reference conv — any (x, w, b) -> y with SAME padding.
    The batch axis is sharded over 'data' when divisible (training),
    else replicated (e.g. batch-1 full-volume eval, test_model.py
    protocol).
    """
    n_sp = mesh.shape[SPATIAL_AXIS]
    n_dp = mesh.shape[DATA_AXIS]
    if n_sp == 1 or x.shape[2] % n_sp != 0:
        # no spatial axis, or D not divisible (tiny bottlenecks on deep
        # meshes): run unsharded semantics and let auto-SPMD place it
        return conv_fn(x, w, b)
    batch = DATA_AXIS if (n_dp > 1 and x.shape[0] % n_dp == 0) else None
    spec = P(batch, None, SPATIAL_AXIS, None, None)

    def body(xl, wl, bl):
        xh = _exchange_halo_d(xl, n_sp)
        y = conv_fn(xh, wl, bl)
        return y[:, :, 1:-1]

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
