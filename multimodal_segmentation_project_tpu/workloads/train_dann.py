"""DANN domain-adversarial adaptation, MRI source -> CT target (workload #4).

CLI parity with the reference train_dann.py:520-543, including its
five-directory data layout (train_dann.py:364-368):

  train/               source-modality labeled volumes
  dann_add_labeled/    extra target-modality labeled volumes (source stream)
  val/                 TARGET-modality validation split
  target/              target-modality unlabeled volumes
  dann_add_unlabeled/  extra target-modality unlabeled volumes

and its subsetting rules: --n_add_source limits both add pools
(train_dann.py:371-378), --n_samples subsets the merged streams
(train_dann.py:386-391). Optional pretrained init is strict=False
(train_dann.py:410-412). The adversarial step semantics (double-lambda
GRL, two AdamW optimizers, single backward) live in
engine/steps.py:make_dann_step.
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime

import numpy as np

from multimodal_segmentation_project_tpu.data.dataset import (
    CombinedDataset,
    ConcatDataset,
    Subset,
)
from multimodal_segmentation_project_tpu.engine.trainer import DannTrainer, TrainerConfig
from multimodal_segmentation_project_tpu.workloads.common import (
    add_common_args,
    parse_features,
    parse_modalities,
    resolve_precision,
)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="DANN training for multimodal segmentation (TPU)"
    )
    add_common_args(parser)
    parser.add_argument("--source_modality", type=str, required=True)
    parser.add_argument("--target_modality", type=str, required=True)
    parser.add_argument("--lambda_domain", type=float, default=0.1)
    parser.add_argument("--n_add_source", type=int, default=None)
    parser.add_argument("--n_target", type=int, default=None)
    parser.add_argument("--pretrained_model", type=str, default=None)
    parser.add_argument("--freeze_encoder_epoch", type=int, default=None)
    parser.add_argument(
        "--loss", type=str, default="ce_tversky",
        choices=["combined", "ce", "dice", "tversky", "ce_tversky"],
    )
    return parser


def _rng_subset(dataset, n, seed):
    if n is None or n >= len(dataset):
        return dataset
    rng = np.random.default_rng(seed) if seed is not None else np.random.default_rng()
    return Subset(dataset, rng.choice(len(dataset), n, replace=False))


def experiment_name(args) -> str:
    ts = datetime.now().strftime("%Y%m%d_%H%M%S")
    return (
        f"dann_{ts}_bs{args.batch_size}_ep{args.epochs}_lr{args.lr}"
        f"_wd{args.weight_decay}_ld{args.lambda_domain}"
        f"_add{args.n_add_source}_ns{args.n_samples}"
    )


def main(args) -> dict:
    from multimodal_segmentation_project_tpu.workloads.common import maybe_init_multihost

    maybe_init_multihost(args)
    src_mod = parse_modalities(args.source_modality)
    tgt_mod = parse_modalities(args.target_modality)
    if isinstance(src_mod, str):
        src_mod = [src_mod]
    if isinstance(tgt_mod, str):
        tgt_mod = [tgt_mod]

    root = args.data_root
    train_src = CombinedDataset(os.path.join(root, "train"), modalities=src_mod)
    add_labeled = CombinedDataset(
        os.path.join(root, "dann_add_labeled"), modalities=tgt_mod
    )
    val_ds = CombinedDataset(os.path.join(root, "val"), modalities=tgt_mod)
    train_tgt = CombinedDataset(os.path.join(root, "target"), modalities=tgt_mod)
    add_unlabeled = CombinedDataset(
        os.path.join(root, "dann_add_unlabeled"), modalities=tgt_mod
    )

    add_labeled = _rng_subset(add_labeled, args.n_add_source, args.seed)
    add_unlabeled = _rng_subset(add_unlabeled, args.n_add_source, args.seed)
    # --n_target: limit volumes drawn from target/ (declared but never
    # wired in the reference, main.py:240 -> train_dann.py parser gap)
    train_tgt = _rng_subset(train_tgt, args.n_target, args.seed)
    source = ConcatDataset([train_src, add_labeled])
    target = ConcatDataset([train_tgt, add_unlabeled])
    source = _rng_subset(source, args.n_samples, args.seed)
    target = _rng_subset(target, args.n_samples, args.seed)

    print(
        f"[INFO] source: {len(train_src)} train + {len(add_labeled)} add = {len(source)}; "
        f"target: {len(train_tgt)} + {len(add_unlabeled)} = {len(target)}; "
        f"val: {len(val_ds)}"
    )

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
        augment=False,  # reference DANN uses transform=None everywhere
        use_scheduler=False,  # commented out in the reference (train_dann.py:424)
        freeze_encoder_epoch=args.freeze_encoder_epoch,
        freeze_prefixes=("enc",),
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
        pretrained_strict=False,  # train_dann.py:410-412
        extra_config={
            "source_modality": args.source_modality,
            "target_modality": args.target_modality,
            "lambda_domain": args.lambda_domain,
            "n_add_source": args.n_add_source,
            "n_samples": args.n_samples,
        },
    )
    print("[START] DANN adversarial training\n" + "=" * 50)
    trainer = DannTrainer(
        cfg,
        source_dataset=source,
        target_dataset=target,
        val_dataset=val_ds,
        lambda_domain=args.lambda_domain,
    )
    return trainer.run()


if __name__ == "__main__":
    main(build_parser().parse_args())
