"""Orchestrator CLI: one entry point routing to the workload drivers.

CLI parity with the reference main.py:179-246 of
fransiskusbudi/multimodal_segmentation_project (`--experiment
{train,finetune,eval,dann,distill,transfer,cyclegan}` plus the shared
mega-namespace). The reference re-serializes the namespace to argv and
spawns each driver as a child process (main.py:8-164) — a launcher
artifact of per-rank CUDA processes. Under single-controller JAX there
is nothing to fork, so the drivers are invoked in-process with a
translated namespace; flags and defaults are unchanged.

`transfer` and `cyclegan` remain declared-but-unimplemented stubs, as in
the reference (main.py:256-258, 265-267).
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Orchestrate multimodal segmentation experiments (TPU)"
    )
    parser.add_argument(
        "--experiment", type=str, default="train",
        choices=["train", "finetune", "eval", "transfer", "dann", "distill", "cyclegan"],
    )
    parser.add_argument("--data_root", type=str, default="datasets/resampled")
    parser.add_argument("--batch_size", type=int, default=2)
    parser.add_argument("--epochs", type=int, default=50)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--experiment_dir", type=str, default="experiments")
    parser.add_argument("--modalities", type=str, default="all")
    parser.add_argument("--weight_decay", type=float, default=0.01)
    parser.add_argument("--pretrained_model", type=str, default=None)
    parser.add_argument("--freeze_encoder", action="store_true")
    parser.add_argument("--freeze_encoder_epoch", type=int, default=None)
    parser.add_argument("--model_path", type=str, default=None)
    parser.add_argument("--model_name", type=str, default="unet")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--gradient_accumulation_steps", type=int, default=1)
    parser.add_argument("--mixed_precision", type=str, default="no",
                        choices=["no", "fp16", "bf16"])
    parser.add_argument("--early_stopping", action="store_true")
    parser.add_argument("--patience", type=int, default=10)
    parser.add_argument("--teacher_model", type=str, default=None)
    parser.add_argument("--alpha", type=float, default=0.7)
    parser.add_argument("--temperature", type=float, default=4.0)
    parser.add_argument("--loss", type=str, default="combined",
                        choices=["combined", "ce", "dice", "tversky", "ce_tversky"])
    parser.add_argument("--dropout_rate", type=float, default=0.1)
    parser.add_argument("--n_samples", type=int, default=None)
    parser.add_argument("--n_add_source", type=int, default=None)
    parser.add_argument("--n_target", type=int, default=None)
    parser.add_argument("--source_modality", type=str, default=None)
    parser.add_argument("--target_modality", type=str, default=None)
    parser.add_argument("--lambda_domain", type=float, default=0.1)
    # TPU extras (forwarded to every driver)
    parser.add_argument("--n_spatial", type=int, default=1)
    parser.add_argument("--no_auto_spatial", action="store_true")
    parser.add_argument("--n_data", type=int, default=None)
    parser.add_argument("--no_remat", action="store_true")
    parser.add_argument("--resume", type=str, default=None)
    parser.add_argument("--num_workers", type=int, default=2)
    parser.add_argument("--features", type=str, default="16,32,64,128")
    return parser


def _sub_args(module, args, overrides=None):
    """Build the driver's namespace from the orchestrator namespace."""
    sub = module.build_parser()
    ns = argparse.Namespace()
    for action in sub._actions:
        if action.dest in ("help",):
            continue
        if hasattr(args, action.dest):
            setattr(ns, action.dest, getattr(args, action.dest))
        else:
            setattr(ns, action.dest, action.default)
    for k, v in (overrides or {}).items():
        setattr(ns, k, v)
    return ns


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    # device banner (the reference prints a GPU banner, main.py:166-177)
    if args.experiment in ("train", "finetune", "eval", "dann", "distill"):
        import jax

        print("\n=== Device Information ===")
        print(f"Backend: {jax.default_backend()}")
        print(f"Devices: {jax.devices()}")
        print(f"Process: {jax.process_index()}/{jax.process_count()}  PID {__import__('os').getpid()}")
        print("==========================\n")

    if args.experiment == "train":
        from multimodal_segmentation_project_tpu.workloads import train_unet

        train_unet.main(_sub_args(train_unet, args))
    elif args.experiment == "finetune":
        if args.pretrained_model is None:
            raise ValueError("--pretrained_model is required for fine-tuning")
        from multimodal_segmentation_project_tpu.workloads import finetune_ct

        finetune_ct.main(_sub_args(finetune_ct, args))
    elif args.experiment == "eval":
        if args.model_path is None:
            raise ValueError("--model_path is required for evaluation")
        from multimodal_segmentation_project_tpu.workloads import test_model

        test_model.main(_sub_args(test_model, args))
    elif args.experiment == "distill":
        if args.teacher_model is None:
            raise ValueError("--teacher_model is required for distillation")
        from multimodal_segmentation_project_tpu.workloads import distill_unet

        distill_unet.main(_sub_args(distill_unet, args))
    elif args.experiment == "dann":
        from multimodal_segmentation_project_tpu.workloads import train_dann

        train_dann.main(_sub_args(train_dann, args))
    elif args.experiment == "transfer":
        print("Transfer learning not implemented yet.")
    elif args.experiment == "cyclegan":
        print("CycleGAN not implemented yet.")


if __name__ == "__main__":
    main()
