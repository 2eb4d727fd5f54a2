"""Knowledge distillation: frozen teacher -> student (workload #3).

CLI parity with the reference distill_unet.py:271-298. The teacher is a
same-architecture UNet3D restored from --teacher_model and held frozen
(distill_unet.py:214-220); the student trains on the KD loss
(alpha * (CE+Tversky) + (1-alpha) * T^2 * KL, utils/metrics.py:169-190).
Validation scores the student with plain combined_loss
(distill_unet.py:149); only the best student is checkpointed
(distill_unet.py:253-256).
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime

import jax
import jax.numpy as jnp

from multimodal_segmentation_project_tpu.data.dataset import (
    CombinedDataset,
    seeded_subset,
)
from multimodal_segmentation_project_tpu.engine import checkpoint as ckpt
from multimodal_segmentation_project_tpu.engine.trainer import (
    Trainer,
    TrainerConfig,
    build_model,
)
from multimodal_segmentation_project_tpu.ops.losses import distillation_loss
from multimodal_segmentation_project_tpu.workloads.common import (
    add_common_args,
    parse_features,
    parse_modalities,
    resolve_precision,
)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Knowledge distillation for 3D U-Net segmentation (TPU)"
    )
    add_common_args(parser)
    parser.add_argument("--teacher_model", type=str, required=True)
    parser.add_argument("--modalities", type=str, default="all")
    parser.add_argument("--alpha", type=float, default=0.7,
                        help="weight of the segmentation term")
    parser.add_argument("--temperature", type=float, default=4.0,
                        help="softening temperature (SLURM recipes use 2.0)")
    parser.add_argument(
        "--loss", type=str, default="combined",
        choices=["combined", "ce", "dice", "tversky", "ce_tversky"],
        help="validation loss (train always uses the KD loss)",
    )
    return parser


def load_teacher(cfg: TrainerConfig, teacher_path: str, sample_shape):
    """Restore frozen teacher variables from a checkpoint."""
    model = build_model(cfg)
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros(sample_shape, jnp.float32)
    )
    params, batch_stats = ckpt.load_params_any(
        teacher_path, variables["params"], variables.get("batch_stats", {})
    )
    return {"params": params, "batch_stats": batch_stats}


def main(args) -> dict:
    from multimodal_segmentation_project_tpu.workloads.common import maybe_init_multihost

    maybe_init_multihost(args)
    modalities = parse_modalities(args.modalities)
    train_dataset = CombinedDataset(
        os.path.join(args.data_root, "train"), modalities=modalities
    )
    val_dataset = CombinedDataset(
        os.path.join(args.data_root, "val"), modalities=modalities
    )
    train_dataset = seeded_subset(train_dataset, args.n_samples, args.seed)

    cfg = TrainerConfig(
        experiment_dir=args.experiment_dir,
        experiment_name=getattr(args, "experiment_name", None)
        or f"distill_{datetime.now().strftime('%Y%m%d_%H%M%S')}",
        epochs=args.epochs,
        batch_size=args.batch_size,
        lr=args.lr,
        weight_decay=args.weight_decay,
        grad_accum=args.gradient_accumulation_steps,
        loss=args.loss,  # validation uses combined_loss (distill_unet.py:149)
        dropout_rate=args.dropout_rate,
        seed=args.seed,
        augment=False,  # reference distill train split has no transform
        use_scheduler=False,
        early_stopping=args.early_stopping,
        patience=args.patience,
        precision=resolve_precision(args.mixed_precision),
        features=parse_features(getattr(args, "features", (16, 32, 64, 128))),
        remat=not args.no_remat,
        nan_guard=not getattr(args, "no_nan_guard", False),
        profile_first_epoch=getattr(args, "profile", False),
        n_spatial=args.n_spatial,
        auto_spatial=not getattr(args, "no_auto_spatial", False),
        n_data=args.n_data,
        resume=args.resume,
        num_workers=args.num_workers,
        log_name="distill_log.csv",
        best_prefix="best_student",
        checkpoint_every=10**9,  # reference saves best-student only
        plot_title="Distillation Metrics",
        extra_config={
            "modalities": args.modalities,
            "n_samples": args.n_samples,
            "teacher_model": args.teacher_model,
            "alpha": args.alpha,
            "temperature": args.temperature,
        },
    )

    img0, _ = train_dataset[0]
    sample_shape = (1,) + img0.shape
    teacher_vars = load_teacher(cfg, args.teacher_model, sample_shape)
    print(f"[START] knowledge distillation (teacher: {args.teacher_model})")

    kd = lambda s, t, y: distillation_loss(
        s, t, y, alpha=args.alpha, temperature=args.temperature
    )
    trainer = Trainer(
        cfg,
        train_dataset,
        val_dataset,
        sample_shape=sample_shape,
        teacher_variables=teacher_vars,
        kd_loss_fn=kd,
    )
    return trainer.run()


if __name__ == "__main__":
    main(build_parser().parse_args())
