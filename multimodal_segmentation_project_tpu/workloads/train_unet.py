"""Baseline supervised 3D U-Net training (reference workload #1).

CLI parity with the reference driver train_unet.py:523-551 of
fransiskusbudi/multimodal_segmentation_project; the loop itself lives in
the shared engine (engine/trainer.py). Training uses on-device
augmentation (the reference wires combined_transform() into the train
split only, train_unet.py:361), a plateau LR scheduler on val dice, and
the experiments/<name>/{checkpoints,logs,plots} output layout.
"""

from __future__ import annotations

import argparse

from multimodal_segmentation_project_tpu.data.dataset import (
    CombinedDataset,
    seeded_subset,
)
from multimodal_segmentation_project_tpu.engine.trainer import Trainer, TrainerConfig
from multimodal_segmentation_project_tpu.utils.experiment import create_experiment_name
from multimodal_segmentation_project_tpu.workloads.common import (
    add_common_args,
    parse_features,
    parse_modalities,
    resolve_precision,
)

import os


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Train UNet3D model (TPU)")
    add_common_args(parser)
    parser.add_argument("--modalities", type=str, default="all")
    parser.add_argument("--freeze_encoder_epoch", type=int, default=None)
    parser.add_argument(
        "--loss", type=str, default="combined",
        choices=["combined", "ce", "dice", "tversky", "ce_tversky"],
    )
    return parser


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
    if args.n_samples is not None:
        print(f"[INFO] limited training dataset to {len(train_dataset)} random samples")

    cfg = TrainerConfig(
        experiment_dir=args.experiment_dir,
        experiment_name=getattr(args, "experiment_name", None)
        or create_experiment_name("exp", args),
        epochs=args.epochs,
        batch_size=args.batch_size,
        lr=args.lr,
        weight_decay=args.weight_decay,
        grad_accum=args.gradient_accumulation_steps,
        loss=args.loss,
        dropout_rate=args.dropout_rate,
        seed=args.seed,
        augment=True,
        use_scheduler=True,  # ReduceLROnPlateau on val dice (train_unet.py:381)
        freeze_encoder_epoch=args.freeze_encoder_epoch,
        freeze_prefixes=("enc",),  # reference freezes encoder only (train_unet.py:31-36)
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
        extra_config={"modalities": args.modalities, "n_samples": args.n_samples},
    )
    print("[START] baseline training\n" + "=" * 50)
    trainer = Trainer(cfg, train_dataset, val_dataset)
    return trainer.run()


if __name__ == "__main__":
    main(build_parser().parse_args())
