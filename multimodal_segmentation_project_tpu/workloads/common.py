"""Shared CLI plumbing for the workload drivers.

The drivers keep the reference's flag names and defaults
(train_unet.py:523-551 etc. of fransiskusbudi/multimodal_segmentation_project)
so existing run_*.sh recipes port with only launcher changes, plus a
small set of TPU-specific extras (``--n_spatial``, ``--no_remat``,
``--resume``, ``--precision``).
"""

from __future__ import annotations

import argparse


def parse_modalities(value):
    """'all' -> None; 'ct,mri' -> ['ct', 'mri'] (train_unet.py:314-319)."""
    if value is None or (isinstance(value, str) and value.lower() == "all"):
        return None
    if isinstance(value, str):
        return [m.strip().lower() for m in value.split(",")]
    return value


def resolve_precision(mixed_precision: str) -> str:
    """Map the reference's --mixed_precision to the TPU policy.

    fp16 loss-scaling is a CUDA artifact; on TPU both 'fp16' and 'bf16'
    select bf16 compute (no GradScaler needed), 'no' selects fp32.
    """
    if mixed_precision in ("fp16", "bf16"):
        return "bf16"
    return "fp32"


def add_common_args(parser: argparse.ArgumentParser, lr_default: float = 1e-3):
    parser.add_argument("--data_root", type=str, required=True,
                        help="Root directory of the dataset splits")
    parser.add_argument("--experiment_dir", type=str, default="experiments")
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--lr", type=float, default=lr_default)
    parser.add_argument("--weight_decay", type=float, default=0.01)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--gradient_accumulation_steps", type=int, default=1)
    parser.add_argument("--mixed_precision", type=str, default="no",
                        choices=["no", "fp16", "bf16"])
    parser.add_argument("--dropout_rate", type=float, default=0.1)
    parser.add_argument("--early_stopping", action="store_true")
    parser.add_argument("--patience", type=int, default=10)
    parser.add_argument("--n_samples", type=int, default=None)
    # TPU-native extras
    parser.add_argument("--n_spatial", type=int, default=1,
                        help="shard the volume D axis over this many devices")
    parser.add_argument("--no_auto_spatial", action="store_true",
                        help="do not auto-raise n_spatial to fill idle chips "
                             "when the global batch is smaller than the mesh")
    parser.add_argument("--n_data", type=int, default=None,
                        help="data-parallel mesh size (default: auto)")
    parser.add_argument("--no_remat", action="store_true",
                        help="disable activation rematerialization")
    parser.add_argument("--resume", type=str, default=None,
                        help="checkpoint to resume training from")
    parser.add_argument("--num_workers", type=int, default=2)
    parser.add_argument("--features", type=str, default="16,32,64,128",
                        help="encoder widths (bottleneck = 2x last)")
    parser.add_argument("--profile", action="store_true",
                        help="jax.profiler trace of the first epoch -> logs/profile")
    parser.add_argument("--no_nan_guard", action="store_true",
                        help="disable skip-update-on-nonfinite-gradients")
    parser.add_argument("--multihost", action="store_true",
                        help="jax.distributed.initialize() for multi-host TPU pods "
                             "(replaces the reference's accelerate/NCCL launcher)")
    return parser


def maybe_init_multihost(args) -> None:
    if getattr(args, "multihost", False):
        import jax

        jax.distributed.initialize()
        print(
            f"[DIST] process {jax.process_index()}/{jax.process_count()} "
            f"with {jax.local_device_count()} local devices"
        )


def parse_features(value) -> tuple:
    if isinstance(value, (tuple, list)):
        return tuple(int(v) for v in value)
    return tuple(int(v) for v in str(value).split(","))
