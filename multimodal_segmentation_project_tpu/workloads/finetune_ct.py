"""Fine-tuning a pretrained model on limited CT labels (workload #2).

CLI parity with the reference finetune_ct.py:499-530. Differences from
baseline training, matching the reference:
  * init from --pretrained_model (strict load, finetune_ct.py:246-268);
  * optional encoder+bottleneck freeze at start (--freeze_encoder,
    finetune_ct.py:270-286) or scheduled at --freeze_encoder_epoch;
  * NO augmentation on the train split (transform=None,
    finetune_ct.py:355) and NO LR scheduler;
  * default lr 1e-4, modalities 'ct', finetune_log.csv.
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime

from multimodal_segmentation_project_tpu.data.dataset import (
    CombinedDataset,
    seeded_subset,
)
from multimodal_segmentation_project_tpu.engine.trainer import Trainer, TrainerConfig
from multimodal_segmentation_project_tpu.workloads.common import (
    add_common_args,
    parse_features,
    parse_modalities,
    resolve_precision,
)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Fine-tune UNet3D on CT data (TPU)")
    add_common_args(parser, lr_default=1e-4)
    parser.add_argument("--pretrained_model", type=str, required=True)
    parser.add_argument("--modalities", type=str, default="ct")
    parser.add_argument("--freeze_encoder", action="store_true")
    parser.add_argument("--freeze_encoder_epoch", type=int, default=None)
    parser.add_argument(
        "--loss", type=str, default="ce_tversky",
        choices=["combined", "ce", "dice", "tversky", "ce_tversky"],
    )
    return parser


def experiment_name(args) -> str:
    """finetune_<ts>_<base-model>_samples_<n> (finetune_ct.py:32-38)."""
    ts = datetime.now().strftime("%Y%m%d_%H%M%S")
    base = os.path.basename(args.pretrained_model).split(".msgpack")[0].split(".pth")[0]
    return f"finetune_{ts}_{base}_samples_{args.n_samples}"


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
        experiment_name=getattr(args, "experiment_name", None) or experiment_name(args),
        epochs=args.epochs,
        batch_size=args.batch_size,
        lr=args.lr,
        weight_decay=args.weight_decay,
        grad_accum=args.gradient_accumulation_steps,
        loss=args.loss,
        dropout_rate=args.dropout_rate,
        seed=args.seed,
        augment=False,  # finetune_ct.py:355: transform=None
        use_scheduler=False,
        freeze_at_start=args.freeze_encoder,
        freeze_encoder_epoch=args.freeze_encoder_epoch,
        freeze_prefixes=("enc", "bottleneck"),  # finetune_ct.py:270-286
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
        pretrained_model=args.pretrained_model,
        pretrained_strict=True,  # finetune_ct.py:263
        log_name="finetune_log.csv",
        ckpt_prefix="finetune_checkpoint",
        best_prefix="best_finetuned_model",
        plot_title="Fine-tuning Metrics (CT Data)",
        extra_config={"modalities": args.modalities, "n_samples": args.n_samples},
    )
    print("[START] CT fine-tuning\n" + "=" * 50)
    trainer = Trainer(cfg, train_dataset, val_dataset)
    return trainer.run()


if __name__ == "__main__":
    main(build_parser().parse_args())
