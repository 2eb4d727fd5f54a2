"""Gradient reversal layer (the DANN trick) as a jax.custom_vjp.

Parity target: the reference's torch.autograd.Function
(train_dann.py:22-32): identity forward, ``-lambda * grad`` backward.
On TPU/JAX this is exact and free — no custom autograd machinery, just
a custom VJP that XLA fuses away in the forward pass.
"""

from __future__ import annotations

import jax


@jax.custom_vjp
def grad_reverse(x: jax.Array, lambda_: jax.Array | float) -> jax.Array:
    del lambda_
    return x


def _grad_reverse_fwd(x, lambda_):
    return x, lambda_


def _grad_reverse_bwd(lambda_, g):
    # No gradient flows to lambda_ (reference returns None for it).
    return (-lambda_ * g, None)


grad_reverse.defvjp(_grad_reverse_fwd, _grad_reverse_bwd)
