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
    env.pop("JAX_PLATFORMS", None)
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


def test_dryrun_multichip_inprocess():
    """Also callable in-process when the platform is already configured
    (the conftest provides 8 virtual CPU devices)."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)
