#!/usr/bin/env python3
"""Offline resampling CLI: RAS reorient + 1 mm isotropic + 192^3.

One parameterized tool replacing the reference's three per-dataset
copies (scripts/resampling/{amos_ct_resample,chaos_resample,
resample_totalseg_ras_mri}.py). Examples:

  # AMOS CT (amos_ct_resample.py recipe)
  python scripts/resampling/resample.py \
      --input_dir datasets/amos22_ct/images \
      --output_dir datasets/resampled/train/amos_ras_ct/images \
      --labels_dir datasets/amos22_ct/labels \
      --labels_out_dir datasets/resampled/train/amos_ras_ct/labels

  # TotalSegmentator: merge per-organ masks first (--merge_masks_dir)
  python scripts/resampling/resample.py --input_dir ... --output_dir ... \
      --merge_masks_root datasets/totalseg/segmentations \
      --labels_out_dir ...

  # device-accelerated bulk preprocessing
  python scripts/resampling/resample.py ... --backend jax
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from multimodal_segmentation_project_tpu.data import resample as rs
from multimodal_segmentation_project_tpu.data.nifti import save_nifti


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--labels_dir", default=None)
    p.add_argument("--labels_out_dir", default=None)
    p.add_argument("--backend", default="scipy", choices=["scipy", "jax"])
    p.add_argument(
        "--merge_masks_root", default=None,
        help="TotalSegmentator layout: <root>/<case>/ contains per-organ masks; "
        "merged label maps are resampled into --labels_out_dir",
    )
    args = p.parse_args()

    if args.merge_masks_root:
        assert args.labels_out_dir, "--labels_out_dir required with --merge_masks_root"
        os.makedirs(args.labels_out_dir, exist_ok=True)
        os.makedirs(args.output_dir, exist_ok=True)
        for case in sorted(os.listdir(args.merge_masks_root)):
            case_dir = os.path.join(args.merge_masks_root, case)
            if not os.path.isdir(case_dir):
                continue
            merged = rs.merge_totalseg_masks(case_dir, backend=args.backend)
            ldata, laffine = rs.resample_volume(
                merged, is_label=True, backend=args.backend
            )
            save_nifti(
                ldata.astype("uint8"),
                os.path.join(args.labels_out_dir, f"{case}.nii.gz"),
                laffine,
            )
            img_path = None
            for ext in (".nii.gz", ".nii"):
                cand = os.path.join(args.input_dir, case + ext)
                if os.path.exists(cand):
                    img_path = cand
                    break
            if img_path:
                rs.process_pair(
                    img_path,
                    os.path.join(args.output_dir, os.path.basename(img_path)),
                    backend=args.backend,
                )
            print(f"merged + resampled {case}")
        return

    n = rs.resample_dataset(
        args.input_dir,
        args.output_dir,
        labels_dir=args.labels_dir,
        labels_out_dir=args.labels_out_dir,
        backend=args.backend,
    )
    print(f"Processed {n} volumes.")


if __name__ == "__main__":
    main()
