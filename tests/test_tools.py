"""Smoke tests for the host-side tools (viewer export, plots, loader
prefetch)."""

import os
import subprocess
import sys

import numpy as np

from multimodal_segmentation_project_tpu.data.nifti import save_nifti

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_visualize_nifti_save(tmp_path, rng):
    img = rng.uniform(0, 1, size=(12, 12, 12)).astype(np.float32)
    lbl = np.zeros((12, 12, 12), np.uint8)
    lbl[4:8, 4:8, 4:8] = 2
    ipath = str(tmp_path / "img.nii.gz")
    lpath = str(tmp_path / "lbl.nii.gz")
    save_nifti(img, ipath)
    save_nifti(lbl, lpath)
    out = str(tmp_path / "slice.png")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "visualize_nifti.py"),
         ipath, "--label", lpath, "--save", out],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    assert os.path.exists(out)


def test_plot_results_box_and_line(tmp_path):
    csv = tmp_path / "per_sample_metrics.csv"
    csv.write_text(
        "filename,dice_spleen,dice_liver,dice_kidneys,"
        "iou_spleen,iou_liver,iou_kidneys,inference_time\n"
        "a,0.8,0.9,0.7,0.7,0.8,0.6,0.1\n"
        "b,0.82,0.88,0.72,0.71,0.79,0.61,0.1\n"
    )
    # third case: the reference mri_baseline layout (x=run, hue=organ)
    for kind, out, extra in [
        ("box", "box.png", []),
        ("line", "line.png", []),
        ("box", "box_by_run.png", ["--group-by", "run"]),
    ]:
        r = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "scripts", "plotting", "plot_results.py"),
             kind, "--runs", f"{csv}:5", "--out", str(tmp_path / out),
             *extra],
            capture_output=True, text=True, cwd=REPO,
        )
        assert r.returncode == 0, r.stderr
        assert (tmp_path / out).exists()


def test_npy_reader(tmp_path):
    vol = np.zeros((6, 6, 6), np.uint8)
    vol[2:4, 2:4, 2:4] = 3
    path = str(tmp_path / "pred.nii.gz")
    save_nifti(vol, path)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "npy_reader.py"), path],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    assert "{3:" in r.stdout.replace(" ", "").replace("{3", "{3") or "3" in r.stdout


def test_spacing_report(tmp_path):
    save_nifti(np.zeros((5, 6, 7), np.float32), str(tmp_path / "a.nii.gz"),
               np.diag([1.5, 2.0, 2.5, 1.0]))
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "resampling", "spacing_report.py"),
         str(tmp_path)],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    assert "orient=RAS" in r.stdout and "n volumes : 1" in r.stdout


def test_prefetch_to_device():
    from multimodal_segmentation_project_tpu.data.pipeline import prefetch_to_device

    batches = [
        (np.zeros((1, 1, 4, 4, 4), np.float32), np.zeros((1, 4, 4, 4), np.int32))
        for _ in range(2)
    ]
    out = list(prefetch_to_device(iter(batches)))
    assert len(out) == 2
    import jax

    assert isinstance(out[0][0], jax.Array)


def test_visualize_augmentations(tmp_path, rng):
    """Augmentation visual-QA renderer (reference
    utils/dataloader.py:262-317 analog): produces the 2x2
    original-vs-augmented PNG from a CombinedDataset sample."""
    img_dir = tmp_path / "synth_ct" / "images"
    lbl_dir = tmp_path / "synth_ct" / "labels"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    lbl = np.zeros((16, 16, 16), np.int16)
    lbl[4:10, 4:10, 4:10] = 1
    img = lbl * 120.0 + rng.normal(0, 20, lbl.shape)
    save_nifti(img.astype(np.float32), str(img_dir / "c0.nii.gz"))
    save_nifti(lbl, str(lbl_dir / "c0.nii.gz"))
    out = str(tmp_path / "aug.png")
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "plotting", "visualize_augmentations.py"),
         str(tmp_path), "--save", out, "--seed", "3", "--platform", "cpu"],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    assert os.path.exists(out) and os.path.getsize(out) > 10_000
