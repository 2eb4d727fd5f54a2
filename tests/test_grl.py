"""Gradient-reversal layer tests (train_dann.py:22-32 semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_segmentation_project_tpu.ops.grl import grad_reverse


def test_identity_forward():
    x = jnp.arange(12.0).reshape(3, 4)
    np.testing.assert_array_equal(np.asarray(grad_reverse(x, 0.3)), np.asarray(x))


@pytest.mark.parametrize("lam", [0.0, 0.2, 1.0, 2.5])
def test_reversed_scaled_gradient(lam):
    x = jnp.array([1.0, -2.0, 3.0])

    def f(x):
        return jnp.sum(grad_reverse(x, lam) * jnp.array([1.0, 2.0, 3.0]))

    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), -lam * np.array([1.0, 2.0, 3.0]), rtol=1e-6)


def test_composes_under_jit_and_downstream_net():
    # lambda applied once in GRL; downstream grads flow reversed through it.
    w = jnp.array([[2.0, 0.0], [0.0, 2.0]])
    x = jnp.array([1.0, 1.0])

    @jax.jit
    def f(x):
        h = grad_reverse(x, 0.5)
        return jnp.sum((h @ w) ** 2)

    g_plain = jax.grad(lambda x: jnp.sum((x @ w) ** 2))(x)
    g_rev = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g_rev), -0.5 * np.asarray(g_plain), rtol=1e-6)
