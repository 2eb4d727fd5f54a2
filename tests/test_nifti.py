"""First-party NIfTI-1 IO tests: round-trips, affines, reorientation."""

import numpy as np
import pytest

from multimodal_segmentation_project_tpu.data import nifti


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.float32, np.int16, np.uint8])
def test_roundtrip(tmp_path, suffix, dtype):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.floating):
        data = rng.normal(size=(7, 6, 5)).astype(dtype)
    else:
        data = rng.integers(0, 100, size=(7, 6, 5)).astype(dtype)
    affine = np.diag([1.5, 2.0, 2.5, 1.0])
    affine[:3, 3] = [-10, 20, 5]
    path = str(tmp_path / f"vol{suffix}")
    nifti.save_nifti(data, path, affine)
    img = nifti.load_nifti(path)
    np.testing.assert_array_equal(img.data, data)
    np.testing.assert_allclose(img.affine, affine, atol=1e-5)


def test_header_passthrough_preserves_geometry(tmp_path):
    data = np.zeros((4, 4, 4), np.float32)
    affine = np.eye(4)
    affine[:3, 3] = [1, 2, 3]
    src = str(tmp_path / "src.nii.gz")
    nifti.save_nifti(data, src, affine)
    img = nifti.load_nifti(src)
    # save a prediction with the source header/affine (test_model.py:306-309 analog)
    pred = np.ones((4, 4, 4), np.uint8)
    dst = str(tmp_path / "pred.nii.gz")
    nifti.save_nifti(pred, dst, affine=img.affine, header=img.header_bytes)
    out = nifti.load_nifti(dst)
    np.testing.assert_allclose(out.affine, affine, atol=1e-5)
    np.testing.assert_array_equal(out.data, pred)


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
def test_header_only_probe_matches_full_load(tmp_path, suffix):
    """load_nifti_header must return the same affine/header bytes as the
    full decode, without touching the voxel payload (test_model.py export
    path uses it to avoid a second full gzip inflate per sample)."""
    rng = np.random.default_rng(1)
    data = rng.normal(size=(9, 8, 7)).astype(np.float32)
    affine = np.diag([2.0, 1.5, 1.0, 1.0])
    affine[:3, 3] = [5, -4, 3]
    path = str(tmp_path / f"vol{suffix}")
    nifti.save_nifti(data, path, affine)
    full = nifti.load_nifti(path)
    probe_affine, probe_header = nifti.load_nifti_header(path)
    np.testing.assert_allclose(probe_affine, full.affine, atol=1e-5)
    assert probe_header == full.header_bytes
    # stamping a prediction with the probed header preserves geometry
    dst = str(tmp_path / f"pred{suffix}")
    nifti.save_nifti(
        np.ones_like(data, np.uint8), dst, affine=probe_affine, header=probe_header
    )
    np.testing.assert_allclose(nifti.load_nifti(dst).affine, affine, atol=1e-5)


def test_scl_slope_applied(tmp_path):
    data = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    path = str(tmp_path / "scl.nii")
    nifti.save_nifti(data, path, np.eye(4))
    # patch slope/inter into the header bytes
    raw = open(path, "rb").read()
    import struct

    hdr = bytearray(raw)
    struct.pack_into("<2f", hdr, 112, 2.0, 1.0)
    open(path, "wb").write(bytes(hdr))
    img = nifti.load_nifti(path)
    np.testing.assert_allclose(img.data, data * 2.0 + 1.0)


def test_io_orientation_identity_and_flip():
    assert nifti.io_orientation(np.eye(4)).tolist() == [[0, 1], [1, 1], [2, 1]]
    lps = np.diag([-1.0, -1.0, 1.0, 1.0])  # LPS: flip x and y
    assert nifti.io_orientation(lps).tolist() == [[0, -1], [1, -1], [2, 1]]


def test_reorient_to_ras_flip():
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    affine = np.diag([-1.0, 1.0, 1.0, 1.0])
    affine[0, 3] = 1.0  # origin at the flipped end
    img = nifti.NiftiImage(data=data, affine=affine)
    out = nifti.reorient_to_ras(img)
    np.testing.assert_array_equal(out.data, data[::-1])
    # new affine must be RAS+ with same world positions:
    # voxel (0,0,0) of flipped data = voxel (1,0,0) original = world x=0
    np.testing.assert_allclose(out.affine[:3, :3], np.eye(3), atol=1e-8)
    np.testing.assert_allclose(out.affine[:3, 3], [0, 0, 0], atol=1e-8)


def test_reorient_to_ras_transpose():
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    # axes permuted: data axis 0 -> world S(2), axis 1 -> R(0), axis 2 -> A(1)
    affine = np.zeros((4, 4))
    affine[2, 0] = 1.0
    affine[0, 1] = 1.0
    affine[1, 2] = 1.0
    affine[3, 3] = 1.0
    img = nifti.NiftiImage(data=data, affine=affine)
    out = nifti.reorient_to_ras(img)
    assert out.data.shape == (3, 4, 2)
    np.testing.assert_allclose(out.affine[:3, :3], np.eye(3), atol=1e-8)
    # world position of data value must be preserved:
    # original voxel (i,j,k) at world (j,k,i); new voxel (j,k,i) should hold it
    np.testing.assert_array_equal(out.data[1, 2, 0], data[0, 1, 2])


def test_voxel_spacing():
    affine = np.diag([1.5, 2.0, 2.5, 1.0])
    np.testing.assert_allclose(nifti.voxel_spacing(affine), [1.5, 2.0, 2.5])
