#!/usr/bin/env python3
"""Interactive NIfTI viewer: scroll through slices of a volume with an
optional prediction/ground-truth overlay.

Capability parity with the reference's visualize_nifti.py:8-119
(slider-based axial browsing, organ overlay colors spleen=red,
liver=orange, kidneys=green), built on this framework's own NIfTI
reader instead of nibabel. Also supports non-interactive PNG export
(--save) for headless TPU VMs.
"""

from __future__ import annotations

import argparse

import numpy as np

from multimodal_segmentation_project_tpu.data.nifti import load_nifti

ORGAN_COLORS = {1: (1.0, 0.0, 0.0), 2: (1.0, 0.65, 0.0), 3: (0.0, 0.5, 0.0)}
AXES = {"sagittal": 0, "coronal": 1, "axial": 2}


def overlay_slice(image_slice, label_slice, alpha=0.6):
    img = image_slice.astype(np.float64)
    img = (img - img.min()) / (img.max() - img.min() + 1e-8)
    rgb = np.repeat(img[..., None], 3, axis=-1)
    if label_slice is not None:
        for cls, color in ORGAN_COLORS.items():
            mask = label_slice == cls
            rgb[mask] = (1 - alpha) * rgb[mask] + alpha * np.array(color)
    return rgb


def main():
    parser = argparse.ArgumentParser(description="Interactive NIfTI slice viewer")
    parser.add_argument("image", help="path to the image volume (.nii/.nii.gz)")
    parser.add_argument("--label", default=None, help="optional label/pred overlay")
    parser.add_argument("--axis", default="axial", choices=list(AXES))
    parser.add_argument("--save", default=None,
                        help="save a PNG of --slice instead of opening a window")
    parser.add_argument("--slice", type=int, default=None, dest="slice_idx")
    args = parser.parse_args()

    image = load_nifti(args.image).data.astype(np.float32)
    label = load_nifti(args.label).data if args.label else None
    axis = AXES[args.axis]
    n = image.shape[axis]
    idx0 = args.slice_idx if args.slice_idx is not None else n // 2

    take = lambda vol, i: np.rot90(np.take(vol, i, axis=axis)) if vol is not None else None

    import matplotlib

    if args.save:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if args.save:
        plt.figure(figsize=(8, 8))
        plt.imshow(overlay_slice(take(image, idx0), take(label, idx0)))
        plt.title(f"{args.axis} slice {idx0}/{n - 1}")
        plt.axis("off")
        plt.savefig(args.save, bbox_inches="tight")
        print(f"saved {args.save}")
        return

    from matplotlib.widgets import Slider

    fig, ax = plt.subplots(figsize=(8, 8))
    plt.subplots_adjust(bottom=0.15)
    im = ax.imshow(overlay_slice(take(image, idx0), take(label, idx0)))
    ax.set_title(f"{args.axis} slice {idx0}/{n - 1}")
    ax.axis("off")
    slider = Slider(
        plt.axes([0.2, 0.05, 0.6, 0.03]), "Slice", 0, n - 1, valinit=idx0, valstep=1
    )

    def update(val):
        i = int(slider.val)
        im.set_data(overlay_slice(take(image, i), take(label, i)))
        ax.set_title(f"{args.axis} slice {i}/{n - 1}")
        fig.canvas.draw_idle()

    slider.on_changed(update)
    plt.show()


if __name__ == "__main__":
    main()
