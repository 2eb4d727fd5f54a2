"""DANN domain discriminator MLP.

Parity target: the reference's DomainDiscriminator
(train_dann.py:34-49): Linear(in,256) -> ReLU -> Dropout(0.2) ->
Linear(256,128) -> ReLU -> Dropout(0.2) -> Linear(128,64) -> ReLU ->
Linear(64,2). Input is the global-average-pooled bottleneck (B, 256).

Kept fp32 end-to-end: at (B, 256) this MLP is negligible FLOPs and the
adversarial signal benefits from full precision.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class DomainDiscriminator(nn.Module):
    hidden_dims: tuple = (256, 128, 64)
    num_domains: int = 2
    dropout_rate: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = x.astype(self.dtype)
        for i, h in enumerate(self.hidden_dims):
            x = nn.Dense(h, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.relu(x)
            if i < 2:  # dropout after the first two hidden layers only
                x = nn.Dropout(
                    rate=self.dropout_rate, deterministic=not train, name=f"drop{i}"
                )(x)
        return nn.Dense(self.num_domains, dtype=self.dtype, name="out")(x)
