"""Test configuration: force CPU with 8 virtual devices BEFORE jax import.

This is the TPU answer to "test multi-device without a cluster"
(SURVEY.md section 4): all sharding/collective paths run on a virtual
8-device CPU mesh.
"""

import os

# hard override: the image pre-sets JAX_PLATFORMS=axon (remote TPU
# relay) via sitecustomize, which wins over plain env vars; per-op
# dispatch over the tunnel makes tests pathologically slow, and the
# collectives tests need 8 virtual CPU devices anyway. jax.config is
# the only override that sticks.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def logits_labels(rng):
    """Small random multi-class volume batch: logits (B,C,D,H,W), labels (B,D,H,W)."""
    logits = rng.normal(size=(2, 4, 8, 8, 8)).astype(np.float32)
    labels = rng.integers(0, 4, size=(2, 8, 8, 8)).astype(np.int32)
    return logits, labels
