"""head1x1_cf numerics: forward and gradient parity vs the einsum."""

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_segmentation_project_tpu.ops.head import head1x1_cf


def einsum_ref(x, k, b):
    return jnp.einsum("bidhw,io->bodhw", x.astype(jnp.float32), k) + b.reshape(
        1, -1, 1, 1, 1
    )


def test_head_forward_matches_einsum():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 6, 4, 8, 10)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    got = head1x1_cf(x, k, b)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(einsum_ref(x, k, b)), rtol=1e-5, atol=1e-5
    )


def test_head_grads_match_einsum():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 6, 4, 8, 10)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(1, 4, 4, 8, 10)).astype(np.float32))

    g1 = jax.grad(lambda *a: jnp.sum(head1x1_cf(*a) * ct), argnums=(0, 1, 2))(x, k, b)
    g2 = jax.grad(lambda *a: jnp.sum(einsum_ref(*a) * ct), argnums=(0, 1, 2))(x, k, b)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=1e-4, atol=1e-4)


def test_head_bf16_input():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 6, 4, 8, 8)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    k = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    b = jnp.zeros((4,), jnp.float32)
    out = head1x1_cf(x, k, b)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(einsum_ref(x.astype(jnp.float32), k, b)),
        rtol=0.02, atol=0.02,
    )
