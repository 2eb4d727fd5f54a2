#!/usr/bin/env python3
"""Slice-by-slice label census for saved predictions.

Parity with the reference's npy_reader.py (per-slice unique-value dump
of .npy predictions), extended to also read NIfTI predictions directly.

  python scripts/npy_reader.py experiments/.../predictions/case_pred.nii.gz
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    from multimodal_segmentation_project_tpu.data.nifti import load_nifti

    return load_nifti(path).data


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("path", help=".npy or .nii/.nii.gz prediction volume")
    p.add_argument("--axis", type=int, default=2, help="slice axis (default z)")
    args = p.parse_args()

    vol = np.squeeze(load(args.path))
    print(f"{args.path}: shape {vol.shape}, dtype {vol.dtype}")
    print(f"volume unique values: {np.unique(vol).tolist()}")
    for i in range(vol.shape[args.axis]):
        sl = np.take(vol, i, axis=args.axis)
        uniq, counts = np.unique(sl, return_counts=True)
        organs = {int(u): int(c) for u, c in zip(uniq, counts) if u != 0}
        if organs:
            print(f"slice {i:4d}: {organs}")


if __name__ == "__main__":
    main()
