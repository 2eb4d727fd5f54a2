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

import jax
import jax.numpy as jnp


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


def _upconv_forward(x, kernel, bias):
    b, cin, d, h, w = x.shape
    cout = kernel.shape[4]
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
