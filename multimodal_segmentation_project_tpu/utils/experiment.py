"""Experiment bookkeeping: directories, naming, config dump, device log.

Output layout parity with the reference
(``experiments/<name>/{checkpoints,logs,plots}``, train_unet.py:332-354):
a user of the reference finds the same tree, the same ``config.txt``
provenance dump, and a ``device_usage.log`` where the reference appends
``nvidia-smi`` output (train_unet.py:173-176) — here it records TPU HBM
allocator stats from the PJRT client instead.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import datetime, timedelta


def format_time(seconds: float) -> str:
    return str(timedelta(seconds=int(seconds)))


def create_experiment_name(prefix: str, args, extras: str = "") -> str:
    """`<prefix>_<timestamp>_bs{b}_ep{e}_lr{lr}_wd{wd}[extras]` naming,
    mirroring the reference (train_unet.py:23-29, train_dann.py:55-58)."""
    ts = datetime.now().strftime("%Y%m%d_%H%M%S")
    core = f"bs{args.batch_size}_ep{args.epochs}_lr{args.lr}_wd{args.weight_decay}"
    if getattr(args, "freeze_encoder_epoch", None) is not None:
        core += f"_freeze{args.freeze_encoder_epoch}"
    return f"{prefix}_{ts}_{core}{extras}"


@dataclass
class ExperimentPaths:
    root: str
    checkpoints: str
    logs: str
    plots: str

    @classmethod
    def create(
        cls, experiment_dir: str, experiment_name: str, make_dirs: bool = True
    ) -> "ExperimentPaths":
        """``make_dirs=False`` builds the path object without touching
        the filesystem — non-zero ranks on multi-host pods never write
        (the reference gates with accelerator.is_main_process)."""
        root = os.path.join(experiment_dir, experiment_name)
        paths = cls(
            root=root,
            checkpoints=os.path.join(root, "checkpoints"),
            logs=os.path.join(root, "logs"),
            plots=os.path.join(root, "plots"),
        )
        if make_dirs:
            for p in (paths.root, paths.checkpoints, paths.logs, paths.plots):
                os.makedirs(p, exist_ok=True)
        return paths


def write_config(path: str, args) -> None:
    """Dump every arg as `key: value` lines (train_unet.py:346-350)."""
    src = vars(args) if not isinstance(args, dict) else args
    with open(path, "w") as f:
        for k, v in src.items():
            f.write(f"{k}: {v}\n")


def log_device_usage(log_file: str, tag: str = "") -> None:
    """Append per-device memory stats (TPU analog of the nvidia-smi dump).

    Called once at experiment start and once per epoch by the Trainer
    (engine/trainer.py), matching the reference's gpu_usage.log role
    (train_unet.py:173-176,251-252: nvidia-smi every 10 batches).
    ``tag`` labels the row (e.g. ``epoch=3``)."""
    import jax

    head = datetime.now().isoformat()
    lines = [f"{head} {tag}".rstrip()]
    for d in jax.local_devices():
        try:
            stats = d.memory_stats() or {}
        except Exception:
            stats = {}
        used = stats.get("bytes_in_use", 0)
        limit = stats.get("bytes_limit", 0)
        peak = stats.get("peak_bytes_in_use", 0)
        lines.append(
            f"{d}: in_use={used / 1e9:.3f}GB peak={peak / 1e9:.3f}GB "
            f"limit={limit / 1e9:.3f}GB"
        )
    with open(log_file, "a") as f:
        f.write("\n".join(lines) + "\n" + "=" * 80 + "\n")
