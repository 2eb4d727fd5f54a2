"""Dataset semantics tests on synthetic NIfTI fixtures (16^3 volumes)."""

import numpy as np
import pytest

from multimodal_segmentation_project_tpu.data import dataset as ds
from multimodal_segmentation_project_tpu.data.nifti import save_nifti
from multimodal_segmentation_project_tpu.data.pipeline import DataLoader


def make_split(root, datasets):
    """datasets: dict name -> list of (image ndarray, label ndarray)."""
    for name, samples in datasets.items():
        img_dir = root / name / "images"
        lbl_dir = root / name / "labels"
        img_dir.mkdir(parents=True)
        lbl_dir.mkdir(parents=True)
        for i, (img, lbl) in enumerate(samples):
            save_nifti(img.astype(np.float32), str(img_dir / f"case{i:02d}.nii.gz"))
            save_nifti(lbl.astype(np.int16), str(lbl_dir / f"case{i:02d}.nii.gz"))


@pytest.fixture
def split_dir(tmp_path, rng):
    vol = lambda: rng.normal(1000, 200, size=(16, 16, 16))
    amos_lbl = np.zeros((16, 16, 16))
    amos_lbl[:4] = 1  # spleen stays 1
    amos_lbl[4:6] = 2  # r kidney -> 3
    amos_lbl[6:8] = 3  # l kidney -> 3
    amos_lbl[8:10] = 6  # liver -> 2
    amos_lbl[10:12] = 5  # unmapped organ -> 0
    chaos_lbl = np.zeros((16, 16, 16))
    chaos_lbl[:2] = 63  # liver -> 2
    chaos_lbl[2:4] = 120  # in [110,135] kidney -> 3
    chaos_lbl[4:6] = 189  # kidney -> 3
    chaos_lbl[6:8] = 250  # spleen -> 1
    ts_lbl = np.zeros((16, 16, 16))
    ts_lbl[:3] = 2
    make_split(
        tmp_path,
        {
            "amos_ras_ct": [(vol(), amos_lbl)],
            "chaos_mri": [(vol(), chaos_lbl), (vol(), chaos_lbl)],
            "ts_mri": [(vol(), ts_lbl)],
        },
    )
    return tmp_path


def test_modality_inference():
    assert ds.modality_of("amos_ras_ct") == "ct"
    assert ds.modality_of("chaos_MRI") == "mri"
    assert ds.modality_of("unknown") == "mri"


def test_preprocess_ct_window():
    img = np.array([-500.0, -160.0, 40.0, 240.0, 3000.0])
    out = ds.preprocess_ct(img)
    np.testing.assert_allclose(out, [0.0, 0.0, 0.5, 1.0, 1.0])


def test_preprocess_mri_range(rng):
    img = rng.normal(50, 10, size=(16, 16, 16))
    out = ds.preprocess_mri(img)
    assert out.dtype == np.float32
    assert 0.0 <= out.min() <= 0.05 and 0.95 <= out.max() <= 1.0 + 1e-6
    # values in the 1-99 percentile band map monotonically
    assert out.std() > 0


def test_label_harmonization_amos():
    lbl = np.array([0, 1, 2, 3, 6, 5, 10])
    out = ds.harmonize_labels(lbl, "amos_ras_ct")
    np.testing.assert_array_equal(out, [0, 1, 3, 3, 2, 0, 0])


def test_label_harmonization_chaos_ranges():
    lbl = np.array([0, 55, 70, 110, 135, 175, 200, 240, 255, 100, 220])
    out = ds.harmonize_labels(lbl, "chaos_mri")
    np.testing.assert_array_equal(out, [0, 2, 2, 3, 3, 3, 3, 1, 1, 0, 0])


def test_label_passthrough_ts():
    lbl = np.array([0, 1, 2, 3])
    np.testing.assert_array_equal(ds.harmonize_labels(lbl, "ts_mri"), lbl)


def test_combined_dataset_walk_and_filter(split_dir):
    all_ds = ds.CombinedDataset(split_dir, verbose=False)
    assert len(all_ds) == 4
    ct_only = ds.CombinedDataset(split_dir, modalities=["ct"], verbose=False)
    assert len(ct_only) == 1
    mri_only = ds.CombinedDataset(split_dir, modalities=["mri"], verbose=False)
    assert len(mri_only) == 3


def test_getitem_shapes_and_remap(split_dir):
    d = ds.CombinedDataset(split_dir, modalities=["ct"], verbose=False)
    img, lbl = d[0]
    assert img.shape == (1, 16, 16, 16) and img.dtype == np.float32
    assert lbl.shape == (16, 16, 16) and lbl.dtype == np.int32
    assert set(np.unique(lbl)) <= {0, 1, 2, 3}
    assert img.min() >= 0.0 and img.max() <= 1.0


def test_seeded_subset_reproducible(split_dir):
    d = ds.CombinedDataset(split_dir, verbose=False)
    s1 = ds.seeded_subset(d, 2, seed=42)
    s2 = ds.seeded_subset(d, 2, seed=42)
    assert s1.indices == s2.indices
    assert len(s1) == 2


def test_concat_dataset(split_dir):
    d1 = ds.CombinedDataset(split_dir, modalities=["ct"], verbose=False)
    d2 = ds.CombinedDataset(split_dir, modalities=["mri"], verbose=False)
    cat = ds.ConcatDataset([d1, d2])
    assert len(cat) == 4
    img, _ = cat[3]
    assert img.shape == (1, 16, 16, 16)


@pytest.mark.parametrize("num_workers", [0, 2])
def test_dataloader_batches(split_dir, num_workers):
    d = ds.CombinedDataset(split_dir, verbose=False)
    loader = DataLoader(d, batch_size=2, shuffle=True, seed=0, num_workers=num_workers)
    batches = list(loader)
    assert len(batches) == 2
    imgs, lbls = batches[0]
    assert imgs.shape == (2, 1, 16, 16, 16)
    assert lbls.shape == (2, 16, 16, 16)


def test_dataloader_epoch_reshuffle(split_dir):
    d = ds.CombinedDataset(split_dir, verbose=False)
    loader = DataLoader(d, batch_size=1, shuffle=True, seed=0, num_workers=0)
    e1 = [b[0].sum() for b in loader]
    e2 = [b[0].sum() for b in loader]
    assert sorted(np.round(e1, 3)) == sorted(np.round(e2, 3))  # same data
    # ordering differs between epochs with high probability
    assert any(a != b for a, b in zip(np.round(e1, 3), np.round(e2, 3)))


def test_dataloader_drop_last(split_dir):
    d = ds.CombinedDataset(split_dir, verbose=False)  # 4 samples
    loader = DataLoader(d, batch_size=3, drop_last=True, num_workers=0)
    assert len(loader) == 1
    assert len(list(loader)) == 1
