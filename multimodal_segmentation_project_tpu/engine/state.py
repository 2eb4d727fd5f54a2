"""Train state: params + BN stats + optimizer state + freeze mask + LR.

One functional state container replaces the reference's scattered
mutable objects (model, optimizer, GradScaler, scheduler — e.g.
train_unet.py:377-381). Everything is a pytree, so the whole state is
jit-donatable and checkpointable as a unit.

Design notes:
  * The optimizer is AdamW built with unit learning rate; the actual LR
    is a scalar INSIDE the state (``state.lr``) multiplied onto the
    final updates. This lets the host-side ReduceLROnPlateau scheduler
    change the LR between epochs without re-jitting or digging through
    optax wrapper internals.
  * ``trainable_mask`` is a 0/1 float pytree multiplied onto the final
    updates: frozen params receive neither gradient steps nor weight
    decay — exactly the semantics of the reference's "new optimizer
    over trainable params only" (train_unet.py:45-50). Freezing or
    unfreezing re-initializes the optimizer state, matching the
    reference's fresh-AdamW-at-the-boundary behavior
    (train_unet.py:413-431).
  * Gradient accumulation uses optax.MultiSteps (averaged grads), the
    analog of Accelerate's accumulate-and-skip-step
    (train_unet.py:221-226).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    trainable_mask: Any
    lr: jax.Array
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        updates = jax.tree.map(
            lambda u, m: u * m * self.lr, updates, self.trainable_mask
        )
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )

    # ---- host-side control (between epochs) ----

    def with_lr(self, lr: float) -> "TrainState":
        return self.replace(lr=jnp.asarray(lr, jnp.float32))

    def with_mask(self, mask, reset_optimizer: bool = True) -> "TrainState":
        """Set the trainable mask; optionally fresh optimizer state
        (reference freeze semantics, train_unet.py:45-50,419-430)."""
        opt_state = self.tx.init(self.params) if reset_optimizer else self.opt_state
        return self.replace(trainable_mask=mask, opt_state=opt_state)


def make_optimizer(
    weight_decay: float = 0.01,
    grad_accum_steps: int = 1,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """AdamW with unit LR (the state's ``lr`` scales final updates),
    wrapped in MultiSteps for gradient accumulation."""
    tx = optax.adamw(learning_rate=1.0, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx


def ones_mask(params):
    return jax.tree.map(lambda p: jnp.ones((), p.dtype), params)


def freeze_mask(params, frozen_prefixes: tuple[str, ...]):
    """0/1 mask pytree: 0 for params under any top-level module whose
    name starts with one of ``frozen_prefixes`` (e.g. ('enc',) freezes
    the encoder; ('enc', 'bottleneck') matches finetune_ct.py:270-286)."""

    def mask_module(name, subtree):
        frozen = any(name.startswith(p) for p in frozen_prefixes)
        val = 0.0 if frozen else 1.0
        return jax.tree.map(lambda p: jnp.asarray(val, jnp.float32), subtree)

    return {name: mask_module(name, sub) for name, sub in params.items()}


def create_train_state(
    model,
    rng: jax.Array,
    sample_input: jax.Array,
    tx: optax.GradientTransformation,
    lr: float,
    init_kwargs: dict | None = None,
) -> TrainState:
    variables = model.init({"params": rng}, sample_input, **(init_kwargs or {}))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        trainable_mask=ones_mask(params),
        lr=jnp.asarray(lr, jnp.float32),
        apply_fn=model.apply,
        tx=tx,
    )


def param_count(tree) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(tree))
