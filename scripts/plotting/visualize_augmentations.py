#!/usr/bin/env python3
"""Augmentation visual QA: original vs augmented sample, side by side.

TPU-native analog of the reference's de-facto augmentation smoke test
(utils/dataloader.py:262-317 of
fransiskusbudi/multimodal_segmentation_project): loads one sample via
CombinedDataset, runs the ON-DEVICE augmentation pipeline
(ops/augment.py — the same jitted functions the train step applies)
with an explicit PRNG seed, and renders the reference's 2x2
original/transformed image/label comparison PNG. Headless by default
(``--save``); deterministic given ``--seed``.

Usage:
  python scripts/plotting/visualize_augmentations.py <data_root> \
      [--index 0] [--seed 0] [--axis axial] [--save aug_comparison.png]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

AXES = {"axial": 1, "coronal": 2, "sagittal": 3}  # (D, H, W) volume axes


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("data_root", help="dataset root (CombinedDataset layout)")
    ap.add_argument("--index", type=int, default=0, help="sample index")
    ap.add_argument("--seed", type=int, default=0, help="augmentation PRNG seed")
    ap.add_argument("--modalities", default="ct,mri")
    ap.add_argument("--axis", default="axial", choices=list(AXES))
    ap.add_argument("--save", default="aug_comparison.png",
                    help="output PNG path ('' to show interactively)")
    ap.add_argument("--prob", type=float, default=1.0,
                    help="per-transform probability (default 1.0 so the "
                         "QA image always shows every transform; training "
                         "uses 0.3)")
    ap.add_argument("--platform", default=None,
                    help="JAX platform override (e.g. 'cpu'; plain env "
                         "vars cannot override a sitecustomize-pinned "
                         "platform, jax.config can)")
    args = ap.parse_args()

    import matplotlib
    if args.save:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from multimodal_segmentation_project_tpu.data.dataset import CombinedDataset
    from multimodal_segmentation_project_tpu.ops.augment import augment_batch

    ds = CombinedDataset(
        args.data_root, modalities=args.modalities.split(","), verbose=False
    )
    img, lbl = ds[args.index]  # (1, D, H, W) float32, (D, H, W) int
    images = jnp.asarray(img[None])  # (1, 1, D, H, W)
    labels = jnp.asarray(np.asarray(lbl, np.int32)[None])

    aug_img, aug_lbl = augment_batch(
        jax.random.key(args.seed), images, labels, prob=args.prob
    )
    aug_img = np.asarray(aug_img[0, 0])
    aug_lbl = np.asarray(aug_lbl[0])
    orig_img = np.asarray(images[0, 0])
    orig_lbl = np.asarray(labels[0])

    ax_idx = AXES[args.axis] - 1  # volume is (D, H, W)
    mid = orig_img.shape[ax_idx] // 2

    def get_slice(vol):
        return np.take(vol, mid, axis=ax_idx)

    fig, axs = plt.subplots(2, 2, figsize=(12, 10))
    axs[0, 0].imshow(get_slice(orig_img), cmap="gray")
    axs[0, 0].set_title("Original Image (mid slice)")
    axs[0, 1].imshow(get_slice(aug_img), cmap="gray")
    axs[0, 1].set_title(f"Augmented Image (seed {args.seed})")
    axs[1, 0].imshow(get_slice(orig_lbl), cmap="tab10", vmin=0, vmax=3)
    axs[1, 0].set_title("Original Label (mid slice)")
    axs[1, 1].imshow(get_slice(aug_lbl), cmap="tab10", vmin=0, vmax=3)
    axs[1, 1].set_title("Augmented Label (same slice)")
    for ax in axs.ravel():
        ax.axis("off")
    plt.tight_layout()
    if args.save:
        plt.savefig(args.save, dpi=100)
        print(f"saved {args.save}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
