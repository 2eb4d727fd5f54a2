#!/usr/bin/env python3
"""Voxel-spacing / shape census across a dataset directory.

Script equivalent of the reference's spacing-analysis notebooks
(scripts/resampling/spacing.ipynb, notebooks/spacing.ipynb): reports
per-volume spacing, shape, and orientation codes so resampling targets
can be sanity-checked before preprocessing.

  python scripts/resampling/spacing_report.py datasets/amos22_ct/images
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from multimodal_segmentation_project_tpu.data.nifti import (
    io_orientation,
    load_nifti,
    voxel_spacing,
)

AXCODES = {(0, 1): "R", (0, -1): "L", (1, 1): "A", (1, -1): "P", (2, 1): "S", (2, -1): "I"}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("directory")
    args = p.parse_args()

    spacings, shapes = [], []
    for f in sorted(os.listdir(args.directory)):
        if not f.endswith((".nii", ".nii.gz")):
            continue
        img = load_nifti(os.path.join(args.directory, f))
        sp = voxel_spacing(img.affine)
        ornt = io_orientation(img.affine)
        codes = "".join(AXCODES[(int(a), int(s))] for a, s in ornt)
        spacings.append(sp)
        shapes.append(img.data.shape[:3])
        print(f"{f:40s} shape={img.data.shape!s:18s} "
              f"spacing=({sp[0]:.2f},{sp[1]:.2f},{sp[2]:.2f}) orient={codes}")

    if spacings:
        spacings = np.asarray(spacings)
        shapes = np.asarray(shapes)
        print("\nsummary:")
        print(f"  n volumes : {len(spacings)}")
        print(f"  spacing min {spacings.min(0).round(2)} / "
              f"median {np.median(spacings, 0).round(2)} / max {spacings.max(0).round(2)}")
        print(f"  shape   min {shapes.min(0)} / median {np.median(shapes, 0).astype(int)} "
              f"/ max {shapes.max(0)}")


if __name__ == "__main__":
    main()
