"""Decode-once volume cache: correctness, invalidation, degradation.

The cache (data/cache.py) must be INVISIBLE semantically: identical
arrays whether entries are cold (decode+store), warm (mmap hit), stale
(source changed), or impossible (unwritable cache dir). The reference
has no cache at all — it re-decodes every epoch behind DataLoader
workers (train_unet.py:372-374) — so equality with the direct decode
path is the whole contract.
"""

import os

import numpy as np
import pytest

from multimodal_segmentation_project_tpu.data import dataset as ds
from multimodal_segmentation_project_tpu.data.cache import VolumeCache
from multimodal_segmentation_project_tpu.data.nifti import save_nifti
from tests.test_dataset import make_split


@pytest.fixture
def split(tmp_path, rng):
    amos_lbl = np.zeros((16, 16, 16))
    amos_lbl[:4] = 1
    amos_lbl[4:6] = 2  # -> kidneys 3
    amos_lbl[8:10] = 6  # -> liver 2
    make_split(
        tmp_path,
        {
            "amos_ct": [(rng.normal(100, 150, (16, 16, 16)), amos_lbl)],
            "ts_mri": [(rng.normal(800, 90, (16, 16, 16)), amos_lbl % 4)],
        },
    )
    return tmp_path


def _materialize(pair):
    img, lbl = pair
    return np.asarray(img), np.asarray(lbl)


def test_cached_equals_uncached_all_modalities(split):
    plain = ds.CombinedDataset(split, verbose=False, cache=None)
    cached = ds.CombinedDataset(split, verbose=False)  # auto
    for i in range(len(plain)):
        ref_img, ref_lbl = _materialize(plain[i])
        for expect in ("miss", "hit"):
            img, lbl = _materialize(cached[i])
            np.testing.assert_array_equal(img, ref_img, err_msg=f"{i}/{expect}")
            np.testing.assert_array_equal(lbl, ref_lbl, err_msg=f"{i}/{expect}")
            assert img.dtype == np.float32 and lbl.dtype == np.int32
    assert cached.cache.hits > 0 and cached.cache.misses == 2 * len(plain)
    assert os.path.isdir(os.path.join(split, ".decoded_cache"))


def test_cache_dir_not_scanned_as_dataset(split):
    cached = ds.CombinedDataset(split, verbose=False)
    cached[0]  # populate -> creates .decoded_cache inside split
    rescan = ds.CombinedDataset(split, verbose=False)
    assert len(rescan) == len(cached)
    assert {s.dataset_name for s in rescan.samples} == {"amos_ct", "ts_mri"}


def test_invalidation_on_source_change(split, rng):
    d = ds.CombinedDataset(split, modalities=["ct"], verbose=False)
    old_img, _ = _materialize(d[0])
    cache_dir = d.cache.cache_dir
    n_before = len(os.listdir(cache_dir))

    # rewrite the source with different content and a different mtime
    src = d.samples[0].image_path
    new_vol = rng.normal(-50, 80, (16, 16, 16)).astype(np.float32)
    save_nifti(new_vol, src)
    os.utime(src, ns=(1_700_000_000_000_000_000, 1_700_000_000_000_000_000))

    fresh = ds.CombinedDataset(split, modalities=["ct"], verbose=False)
    new_img, _ = _materialize(fresh[0])
    assert not np.array_equal(new_img, old_img)
    ref = ds.CombinedDataset(split, modalities=["ct"], verbose=False, cache=None)
    np.testing.assert_array_equal(new_img, _materialize(ref[0])[0])
    # the stale generation was pruned, not accumulated
    assert len(os.listdir(cache_dir)) == n_before


def test_unwritable_cache_dir_degrades_to_decode(split):
    blocker = os.path.join(split, "blocker")
    with open(blocker, "w") as f:
        f.write("not a directory")
    d = ds.CombinedDataset(split, verbose=False, cache=blocker)
    ref = ds.CombinedDataset(split, verbose=False, cache=None)
    img, lbl = _materialize(d[0])
    rimg, rlbl = _materialize(ref[0])
    np.testing.assert_array_equal(img, rimg)
    np.testing.assert_array_equal(lbl, rlbl)
    assert d.cache.cache_dir is None  # permanently degraded, no retry storm


def test_no_cache_env_disables_auto(split, monkeypatch):
    monkeypatch.setenv("MMSEG_NO_CACHE", "1")
    d = ds.CombinedDataset(split, verbose=False)
    assert d.cache.cache_dir is None
    d[0]
    assert not os.path.isdir(os.path.join(split, ".decoded_cache"))


def test_cache_env_dir_override(split, tmp_path_factory, monkeypatch):
    target = tmp_path_factory.mktemp("cache_override")
    monkeypatch.setenv("MMSEG_CACHE_DIR", str(target))
    d = ds.CombinedDataset(split, verbose=False)
    d[0]
    assert len(os.listdir(target)) == 2  # image + label sidecars
    assert not os.path.isdir(os.path.join(split, ".decoded_cache"))


def test_corrupt_entry_recovers(split):
    d = ds.CombinedDataset(split, modalities=["ct"], verbose=False)
    ref_img, _ = _materialize(d[0])
    cache_dir = d.cache.cache_dir
    for name in os.listdir(cache_dir):
        with open(os.path.join(cache_dir, name), "wb") as f:
            f.write(b"garbage")
    img, _ = _materialize(d[0])  # re-decodes and re-stores
    np.testing.assert_array_equal(img, ref_img)
    img2, _ = _materialize(d[0])  # now a clean hit again
    np.testing.assert_array_equal(img2, ref_img)


def test_volume_cache_passthrough_none():
    calls = []
    c = VolumeCache(None)
    out = c.get("/nonexistent", "img-ct", lambda: calls.append(1) or np.ones(3))
    assert len(calls) == 1 and np.array_equal(out, np.ones(3))
