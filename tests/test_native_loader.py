"""Native C++ NIfTI decode path: parity with the Python reader."""

import subprocess

import numpy as np
import pytest

from multimodal_segmentation_project_tpu.data import native
from multimodal_segmentation_project_tpu.data.dataset import preprocess_ct
from multimodal_segmentation_project_tpu.data.nifti import load_nifti, save_nifti


@pytest.fixture(scope="module", autouse=True)
def build_lib():
    # -B: unconditional rebuild (single ~1s translation unit). A plain
    # `make` once shipped a STALE .so here — git checkout restores
    # identical mtimes on the .cpp and a previously-built .so, so
    # mtime-based make considered a pre-fix binary fresh and the suite
    # exercised old native code.
    subprocess.run(["make", "-C", "runtime", "-B"], check=True, capture_output=True)
    # drop any handle dlopen'd by an earlier test module: the rebuild
    # writes a new inode, so re-CDLL picks up the fresh code
    native._lib = None
    assert native.available(), "native library failed to build/load"


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.float32, np.int16, np.uint8])
def test_native_matches_python_reader(tmp_path, rng, suffix, dtype):
    if np.issubdtype(dtype, np.floating):
        data = rng.normal(100, 50, size=(9, 7, 5)).astype(dtype)
    else:
        data = rng.integers(0, 200, size=(9, 7, 5)).astype(dtype)
    affine = np.diag([1.5, 2.0, 2.5, 1.0])
    affine[:3, 3] = [3, -4, 5]
    path = str(tmp_path / f"v{suffix}")
    save_nifti(data, path, affine)

    out = native.load_nifti_f32(path)
    assert out is not None
    ndata, naffine, meta = out
    pdata = load_nifti(path).data
    np.testing.assert_allclose(ndata, pdata.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(naffine, affine, atol=1e-5)


def test_native_fused_ct_window(tmp_path, rng):
    data = rng.uniform(-1000, 2000, size=(8, 8, 8)).astype(np.float32)
    path = str(tmp_path / "ct.nii.gz")
    save_nifti(data, path, np.eye(4))
    out = native.load_nifti_f32(path, norm_mode=native.NORM_CT_WINDOW)
    assert out is not None
    np.testing.assert_allclose(out[0], preprocess_ct(data), rtol=1e-6)


def test_native_missing_file():
    assert native.load_nifti_f32("/nonexistent/x.nii.gz") is None


def test_dataset_uses_native_path(tmp_path, rng):
    # end-to-end: CombinedDataset getitem equals pure-python pipeline
    from multimodal_segmentation_project_tpu.data.dataset import CombinedDataset

    img_dir = tmp_path / "synth_ct" / "images"
    lbl_dir = tmp_path / "synth_ct" / "labels"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    img = rng.uniform(-500, 500, size=(8, 8, 8)).astype(np.float32)
    lbl = rng.integers(0, 4, size=(8, 8, 8)).astype(np.int16)
    save_nifti(img, str(img_dir / "a.nii.gz"), np.eye(4))
    save_nifti(lbl, str(lbl_dir / "a.nii.gz"), np.eye(4))
    ds = CombinedDataset(tmp_path, verbose=False)
    got_img, got_lbl = ds[0]
    np.testing.assert_allclose(got_img[0], preprocess_ct(img), rtol=1e-6)
    np.testing.assert_array_equal(got_lbl, lbl.astype(np.int32))


def test_native_rejects_inconsistent_bitpix(tmp_path, rng):
    """A header whose bitpix disagrees with datatype must be rejected,
    not decoded with the datatype's (larger) element size — the bounds
    check previously used bitpix while decode used sizeof(datatype),
    allowing a heap overread on malformed files."""
    import gzip
    import struct

    data = rng.uniform(-10, 10, size=(4, 4, 4)).astype(np.float64)
    path = str(tmp_path / "bad.nii.gz")
    save_nifti(data, path, np.eye(4))  # float64 -> datatype 64, bitpix 64
    blob = bytearray(gzip.decompress(open(path, "rb").read()))
    # truncate the payload so only bitpix=8-sized data remains, and lie
    # about bitpix; a bitpix-based bounds check would pass
    struct.pack_into("<h", blob, 72, 8)
    blob = blob[: 352 + 64 * 1]
    with gzip.open(path, "wb") as f:
        f.write(bytes(blob))
    assert native.load_nifti_f32(path) is None
