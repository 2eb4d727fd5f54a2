"""Offline resampling: RAS reorient -> 1 mm isotropic -> 192^3.

Reproduces the reference preprocessing recipe
(scripts/resampling/amos_ct_resample.py:29-103 and
chaos_resample.py of fransiskusbudi/multimodal_segmentation_project):

  1. reorient to RAS+ axes;
  2. resample to 1 mm isotropic spacing — cubic for images
     (scipy zoom order=3, prefilter=False), nearest for labels;
  3. resize to the 192^3 target grid with the same interpolation;
  4. rewrite the affine to diag(spacing) with the original translation.

Two interchangeable backends:
  * 'scipy'  — scipy.ndimage.zoom, numerically identical to the
    reference pipeline (the parity-critical path);
  * 'jax'    — jax.image.resize on the accelerator ('cubic' = Keys
    kernel, 'nearest' for labels). Much faster for bulk preprocessing;
    interpolation kernel differs slightly from non-prefiltered cubic
    B-splines, so use 'scipy' when bit-parity with reference-trained
    models matters.

Also provides the TotalSegmentator per-organ binary-mask merge
(resample_totalseg_ras_mri.py:77-96): spleen->1, liver->2,
kidney_left/right->3.
"""

from __future__ import annotations

import os

import numpy as np

from multimodal_segmentation_project_tpu.data.nifti import (
    NiftiImage,
    load_nifti,
    reorient_to_ras,
    save_nifti,
    voxel_spacing,
)

TARGET_SPACING = (1.0, 1.0, 1.0)
TARGET_SHAPE = (192, 192, 192)

# TotalSegmentator mask filenames -> harmonized class
TOTALSEG_ORGANS = {
    "spleen": 1,
    "liver": 2,
    "kidney_left": 3,
    "kidney_right": 3,
}


def _zoom_scipy(data: np.ndarray, factors, order: int) -> np.ndarray:
    from scipy.ndimage import zoom

    return zoom(data, factors, order=order, mode="nearest", prefilter=False)


def _zoom_jax(data: np.ndarray, factors, order: int) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    out_shape = tuple(int(round(s * f)) for s, f in zip(data.shape, factors))
    method = "nearest" if order == 0 else "cubic"
    resized = jax.image.resize(jnp.asarray(data), out_shape, method=method)
    return np.asarray(resized).astype(data.dtype, copy=False)


def resample_volume(
    img: NiftiImage,
    is_label: bool = False,
    target_spacing=TARGET_SPACING,
    target_shape=TARGET_SHAPE,
    backend: str = "scipy",
):
    """RAS reorient + two-stage zoom to target spacing then shape.

    Returns (data, new_affine). Matches the reference's two zoom calls
    (spacing first, then exact-shape resize,
    amos_ct_resample.py:60-70) rather than a single fused resample.
    """
    zoom_fn = _zoom_scipy if backend == "scipy" else _zoom_jax
    order = 0 if is_label else 3

    img = reorient_to_ras(img)
    data = img.data.astype(np.float64 if not is_label else img.data.dtype)
    spacing = voxel_spacing(img.affine)

    scale = spacing / np.asarray(target_spacing, dtype=np.float64)
    data = zoom_fn(data, scale, order)

    resize = [t / s for t, s in zip(target_shape, data.shape)]
    data = zoom_fn(data, resize, order)
    # guard off-by-one from rounding
    data = data[: target_shape[0], : target_shape[1], : target_shape[2]]
    if data.shape != tuple(target_shape):
        pad = [(0, t - s) for t, s in zip(target_shape, data.shape)]
        data = np.pad(data, pad, mode="edge")

    new_affine = np.array(img.affine, copy=True)
    new_affine[:3, :3] = np.diag(target_spacing)
    return data, new_affine


def process_pair(
    image_path: str,
    output_path: str,
    label_path: str | None = None,
    label_out_path: str | None = None,
    backend: str = "scipy",
    verbose: bool = True,
) -> None:
    img = load_nifti(image_path)
    if verbose:
        print(f"Processing {os.path.basename(image_path)}: shape {img.data.shape}, "
              f"spacing {np.round(voxel_spacing(img.affine), 3)}")
    data, affine = resample_volume(img, is_label=False, backend=backend)
    save_nifti(data.astype(np.float32), output_path, affine)

    if label_path and os.path.exists(label_path) and label_out_path:
        lbl = load_nifti(label_path)
        ldata, laffine = resample_volume(lbl, is_label=True, backend=backend)
        save_nifti(ldata.astype(np.uint8), label_out_path, laffine)
    elif label_path and verbose:
        print(f"  label missing for {image_path}, skipping label")


def merge_totalseg_masks(mask_dir: str, backend: str = "scipy") -> NiftiImage:
    """Merge TotalSegmentator per-organ binary masks into one label map
    (resample_totalseg_ras_mri.py:77-96)."""
    merged = None
    affine = None
    for organ, cls in TOTALSEG_ORGANS.items():
        path = None
        for ext in (".nii.gz", ".nii"):
            cand = os.path.join(mask_dir, organ + ext)
            if os.path.exists(cand):
                path = cand
                break
        if path is None:
            continue
        m = load_nifti(path)
        if merged is None:
            merged = np.zeros(m.data.shape, dtype=np.uint8)
            affine = m.affine
        merged[m.data > 0] = cls
    if merged is None:
        raise FileNotFoundError(f"no organ masks found in {mask_dir}")
    return NiftiImage(data=merged, affine=affine)


def resample_dataset(
    input_dir: str,
    output_dir: str,
    labels_dir: str | None = None,
    labels_out_dir: str | None = None,
    backend: str = "scipy",
) -> int:
    """Resample every NIfTI under input_dir (reference script main loop)."""
    os.makedirs(output_dir, exist_ok=True)
    if labels_out_dir:
        os.makedirs(labels_out_dir, exist_ok=True)
    n = 0
    for filename in sorted(os.listdir(input_dir)):
        if not (filename.endswith(".nii") or filename.endswith(".nii.gz")):
            continue
        process_pair(
            os.path.join(input_dir, filename),
            os.path.join(output_dir, filename),
            label_path=os.path.join(labels_dir, filename) if labels_dir else None,
            label_out_path=(
                os.path.join(labels_out_dir, filename) if labels_out_dir else None
            ),
            backend=backend,
        )
        n += 1
    return n
