"""Driver-contract tests for __graft_entry__.py.

The round-1 multi-chip check failed because ``dryrun_multichip`` relied
on its caller to pre-configure the 8-device virtual CPU platform
(MULTICHIP_r01.json: ``mesh 4x2 needs 8 devices, have 1``). These tests
invoke the entry points EXACTLY as the driver does: a fresh subprocess
with the axon sitecustomize on PYTHONPATH, no conftest, no __main__
path, no env overrides.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    """Env as the driver would have it: axon sitecustomize active, none
    of the pytest conftest's platform overrides."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    # the kernel env pins the axon platform (kernel_env.py axon_env);
    # re-pin it explicitly in case the test process mutated it
    env["JAX_PLATFORMS"] = "axon"
    paths = [REPO]
    axon_site = "/root/.axon_site"
    if os.path.isdir(axon_site):
        paths.append(axon_site)
    env["PYTHONPATH"] = os.pathsep.join(paths)
    return env


def test_dryrun_multichip_selfconfigures_like_driver():
    code = (
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=_driver_env(),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "dryrun_multichip ok" in proc.stdout, proc.stdout


def test_ensure_devices_prefers_existing_platform():
    """Round-2 verdict item 5: when the CURRENT platform already has
    >= n_devices devices (a real multi-chip pod), ``_ensure_devices``
    must keep it instead of forcing the virtual-CPU fallback."""
    code = (
        "import os\n"
        "os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert jax.device_count() == 8\n"
        "flags_before = os.environ['XLA_FLAGS']\n"
        "import __graft_entry__ as g\n"
        "g._ensure_devices(4)\n"
        # the existing 8-device platform was kept untouched
        "assert os.environ['XLA_FLAGS'] == flags_before\n"
        "assert jax.device_count() == 8\n"
        "print('kept-existing-platform')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=_driver_env(), cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "kept-existing-platform" in proc.stdout


def test_ensure_devices_falls_back_to_virtual_cpu():
    """When the current platform has too few devices, ``_ensure_devices``
    must self-configure the virtual-CPU platform — even if the backend
    was already initialized by an earlier jax call. (Simulated with a
    1-device CPU platform rather than the axon tunnel so the test does
    not depend on the remote relay being reachable.)"""
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "n = jax.device_count()  # initializes the backend (1 CPU device)\n"
        "assert n == 1, n\n"
        "import __graft_entry__ as g\n"
        "g._ensure_devices(8)\n"
        "assert jax.device_count() >= 8, jax.devices()\n"
        "print('forced-virtual-cpu')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=_driver_env(), cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "forced-virtual-cpu" in proc.stdout


def test_ensure_devices_never_probes_axon_tunnel():
    """The axon platform is a single remote chip behind a relay; a
    multi-device request must NOT initialize it (``jax.device_count()``
    on axon blocks on the relay — an outage would hang the driver's
    multichip check; observed 2026-08-17). With JAX_PLATFORMS=axon and
    no pre-provisioned XLA_FLAGS, ``_ensure_devices(8)`` must go
    straight to the virtual-CPU fallback, relay up or not. The 120 s
    timeout is the hang detector: CPU self-configuration takes ~5 s."""
    code = (
        "import __graft_entry__ as g\n"
        "import jax\n"
        "g._ensure_devices(8)\n"
        "assert jax.device_count() >= 8, jax.devices()\n"
        "assert jax.devices()[0].platform == 'cpu'\n"
        "print('axon-probe-skipped')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=_driver_env(), cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "axon-probe-skipped" in proc.stdout


def test_dryrun_multichip_inprocess():
    """Also callable in-process when the platform is already configured
    (the conftest provides 8 virtual CPU devices)."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)
