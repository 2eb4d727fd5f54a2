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
# Stability: long full-suite runs intermittently died with a silent
# SIGABRT inside EAGER (unjitted) CPU dispatch of tiny ops late in the
# suite (always an eval-mode model.apply probe after a long jitted
# loop; every individual file passes). Running eager computations
# inline instead of through the async dispatch thread pool removes the
# implicated path; jitted computations are unaffected.
jax.config.update("jax_cpu_enable_async_dispatch", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

if os.environ.get("MMSEG_TEST_RESOURCE_LOG"):
    # diagnostic: log per-test VMA-map and thread counts to find
    # resource leaks that abort the CPU backend late in the suite
    import threading

    @pytest.fixture(autouse=True)
    def _resource_log(request):
        yield
        with open("/proc/self/maps") as f:
            n_maps = sum(1 for _ in f)
        with open(os.environ["MMSEG_TEST_RESOURCE_LOG"], "a") as f:
            f.write(
                f"{n_maps}\t{threading.active_count()}\t{request.node.nodeid}\n"
            )


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def logits_labels(rng):
    """Small random multi-class volume batch: logits (B,C,D,H,W), labels (B,D,H,W)."""
    logits = rng.normal(size=(2, 4, 8, 8, 8)).astype(np.float32)
    labels = rng.integers(0, 4, size=(2, 8, 8, 8)).astype(np.int32)
    return logits, labels
