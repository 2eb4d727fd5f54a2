#!/usr/bin/env python3
"""Quickstart: the full workflow on synthetic data in ~3 minutes.

Script equivalent of the reference's manual-QA notebooks
(notebooks/testing.ipynb, viz_amos.ipynb): generates a tiny synthetic
dataset, trains the baseline for a few epochs, evaluates, and renders
an augmentation before/after comparison (the reference's de-facto
augmentation smoke test, utils/dataloader.py:262-317).

  python examples/quickstart.py --workdir /tmp/quickstart
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from multimodal_segmentation_project_tpu.data.nifti import save_nifti


def make_dataset(root, size=32):
    rng = np.random.default_rng(0)
    for split, n in [("train", 6), ("val", 2), ("test", 2)]:
        img_dir = os.path.join(root, split, "quick_ct", "images")
        lbl_dir = os.path.join(root, split, "quick_ct", "labels")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(lbl_dir, exist_ok=True)
        for i in range(n):
            lbl = np.zeros((size, size, size), np.int16)
            c = rng.integers(4, size - 14, 3)
            lbl[c[0]:c[0] + 10, c[1]:c[1] + 10, c[2]:c[2] + 10] = 2
            lbl[c[0]:c[0] + 4, c[1]:c[1] + 4, c[2]:c[2] + 4] = 1
            img = (lbl > 0) * 150.0 + rng.normal(0, 20, lbl.shape)
            save_nifti(img.astype(np.float32), f"{img_dir}/case{i:02d}.nii.gz")
            save_nifti(lbl, f"{lbl_dir}/case{i:02d}.nii.gz")
    print(f"synthetic dataset at {root}")


def augmentation_demo(root, out_png):
    import jax
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from multimodal_segmentation_project_tpu.data.dataset import CombinedDataset
    from multimodal_segmentation_project_tpu.ops.augment import augment_sample

    ds = CombinedDataset(os.path.join(root, "train"), verbose=False)
    img, lbl = ds[0]
    aug_img, aug_lbl = augment_sample(
        jax.random.key(0), jax.numpy.asarray(img), jax.numpy.asarray(lbl), prob=1.0
    )
    z = img.shape[-1] // 2
    fig, axs = plt.subplots(2, 2, figsize=(10, 9))
    panels = [
        (img[0, :, :, z], "Original image", "gray"),
        (np.asarray(aug_img)[0, :, :, z], "Augmented image", "gray"),
        (lbl[:, :, z], "Original label", "tab10"),
        (np.asarray(aug_lbl)[:, :, z], "Augmented label", "tab10"),
    ]
    for ax, (sl, title, cmap) in zip(axs.flat, panels):
        ax.imshow(sl, cmap=cmap, vmin=0 if cmap == "tab10" else None,
                  vmax=3 if cmap == "tab10" else None)
        ax.set_title(title)
        ax.axis("off")
    plt.tight_layout()
    plt.savefig(out_png)
    print(f"augmentation comparison saved to {out_png}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default="/tmp/quickstart")
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--skip_train", action="store_true")
    args = p.parse_args()

    data_root = os.path.join(args.workdir, "data")
    exp_dir = os.path.join(args.workdir, "experiments")
    make_dataset(data_root)
    augmentation_demo(data_root, os.path.join(args.workdir, "augmentation.png"))
    if args.skip_train:
        return

    from multimodal_segmentation_project_tpu.workloads import test_model, train_unet

    train_args = train_unet.build_parser().parse_args([
        "--data_root", data_root,
        "--experiment_dir", exp_dir,
        "--batch_size", "2",
        "--epochs", str(args.epochs),
        "--loss", "ce_tversky",
        "--modalities", "ct",
        "--features", "8,16",
        "--mixed_precision", "bf16",
    ])
    train_unet.main(train_args)

    best = None
    for sub in sorted(os.listdir(exp_dir)):
        cdir = os.path.join(exp_dir, sub, "checkpoints")
        if os.path.isdir(cdir):
            for f in os.listdir(cdir):
                if f.startswith("best_model") and f.endswith(".msgpack"):
                    best = os.path.join(cdir, f)
    assert best, "training produced no best checkpoint"

    eval_args = test_model.build_parser().parse_args([
        "--model_path", best,
        "--data_root", data_root,
        "--experiment_dir", exp_dir,
        "--model_name", "quickstart",
        "--features", "8,16",
    ])
    test_model.main(eval_args)
    print(f"\nall artifacts under {args.workdir}")


if __name__ == "__main__":
    main()
