"""Cross-library golden parity for the reimplemented data/augment numerics.

Round-3 verdict missing item 1: the reference's preprocessing numerics
come from nibabel + MONAI + scipy
(/root/reference/utils/dataloader.py:249-259,
scripts/resampling/amos_ct_resample.py:60-70); this repo's versions are
formula-ported. These tests pin them against INDEPENDENT
implementations:

  * available in this image (scipy): the qform quaternion->affine path
    vs scipy.spatial.transform.Rotation; the jax resampling backend vs
    scipy.ndimage.zoom (the reference's own numerics); the
    histogram-shift's gather-free piecewise evaluation vs np.interp.
  * NOT installable in this image (recorded in ROUND4.md): nibabel and
    MONAI — those tests skip with an explicit reason and run wherever
    the libraries exist.
"""

from __future__ import annotations

import numpy as np
import pytest

from multimodal_segmentation_project_tpu.data.nifti import (
    _quaternion_to_affine,
)


# ---- qform quaternion affine vs scipy Rotation (independent impl) ----

scipy_rot = pytest.importorskip("scipy.spatial.transform")


@pytest.mark.parametrize("qfac", [1.0, -1.0])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_qform_affine_matches_scipy_rotation(seed, qfac):
    """NIfTI-1 Method-2 quaternion path (data/nifti.py) vs
    scipy's quaternion->matrix (scalar reconstruction a =
    sqrt(1-b^2-c^2-d^2) per the spec, qfac flipping the k column)."""
    rng = np.random.default_rng(seed)
    v = rng.normal(size=4)
    v /= np.linalg.norm(v)
    a, b, c, d = np.abs(v[0]), v[1], v[2], v[3]  # spec: a >= 0
    # renormalize (b, c, d) against the reconstructed a
    scale = np.sqrt(1.0 - a * a) / (np.linalg.norm([b, c, d]) + 1e-30)
    b, c, d = b * scale, c * scale, d * scale
    qx, qy, qz = rng.normal(size=3) * 10
    sp = rng.uniform(0.5, 3.0, size=3)
    pixdim = np.array([qfac, sp[0], sp[1], sp[2]])

    got = _quaternion_to_affine(b, c, d, qx, qy, qz, pixdim)

    R = scipy_rot.Rotation.from_quat([b, c, d, a]).as_matrix()  # (x,y,z,w)
    want = np.eye(4)
    want[:3, :3] = R * np.array([sp[0], sp[1], sp[2] * qfac])
    want[:3, 3] = [qx, qy, qz]
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_qform_affine_identity_quaternion():
    """b=c=d=0 (identity rotation): affine is diag(spacing) + offset."""
    got = _quaternion_to_affine(0.0, 0.0, 0.0, 1.0, 2.0, 3.0,
                                np.array([1.0, 1.5, 2.0, 2.5]))
    want = np.diag([1.5, 2.0, 2.5, 1.0])
    want[:3, 3] = [1.0, 2.0, 3.0]
    np.testing.assert_allclose(got, want, atol=1e-12)


# ---- jax resample backend vs scipy.ndimage (the reference numerics) --

def test_jax_zoom_matches_scipy_zoom_golden():
    """resample_volume's jax backend vs the scipy backend — the scipy
    path IS the reference's numerics (scipy.ndimage.zoom order=3
    prefilter=False, amos_ct_resample.py:60-70), so agreement pins the
    TPU-side resampler to the reference."""
    from multimodal_segmentation_project_tpu.data import resample as rs
    from multimodal_segmentation_project_tpu.data.nifti import NiftiImage

    # a smooth field: the two cubic formulations (unprefiltered
    # B-spline smoothing vs interpolating cubic) agree only in the
    # band-limited regime — which is exactly the medical-volume use
    # case; on white noise they are DOCUMENTED to differ
    # (data/resample.py backend note)
    g = np.stack(np.meshgrid(
        np.linspace(0, np.pi, 18), np.linspace(0, np.pi, 22),
        np.linspace(0, np.pi, 26), indexing="ij",
    ))
    data = (50 + 40 * np.cos(g[0]) * np.sin(g[1] * 0.7) * np.cos(g[2] * 0.5)
            ).astype(np.float32)
    img = NiftiImage(data=data, affine=np.diag([2.0, 1.5, 1.0, 1.0]))
    got, _ = rs.resample_volume(
        img, is_label=False, target_shape=(24, 24, 24), backend="jax"
    )
    want, _ = rs.resample_volume(
        img, is_label=False, target_shape=(24, 24, 24), backend="scipy"
    )
    interior = (slice(2, -2),) * 3
    np.testing.assert_allclose(
        got[interior], want[interior],
        atol=0.01 * np.abs(want).max(),
    )


# ---- histogram shift: gather-free piecewise form vs np.interp --------

def test_histogram_shift_matches_np_interp():
    """ops/augment.py random_histogram_shift evaluates its monotone
    piecewise-linear remap segment-by-segment (compare+select; interp's
    searchsorted+gather is ~100 ms on TPU). Golden check: identical to
    np.interp on the same control points."""
    import jax
    import jax.numpy as jnp

    from multimodal_segmentation_project_tpu.ops.augment import (
        random_histogram_shift,
    )

    rng = np.random.default_rng(5)
    img = rng.uniform(-80, 120, size=(1, 8, 8, 8)).astype(np.float32)
    key = jax.random.key(11)
    got = np.asarray(random_histogram_shift(key, jnp.asarray(img)))

    # reproduce the drawn destination control points exactly
    interior = np.sort(np.asarray(jax.random.uniform(key, (3,))))
    dst = np.concatenate([[0.0], interior, [1.0]])
    src = np.linspace(0.0, 1.0, 5)
    lo, hi = img.min(), img.max()
    span = hi - lo + 1e-7
    norm = np.clip((img - lo) / span, 0.0, 1.0)
    want = np.interp(norm, src, dst) * span + lo
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


# ---- nibabel / MONAI goldens: libraries absent in this image ---------

def test_nifti_loader_against_nibabel(tmp_path):
    nib = pytest.importorskip(
        "nibabel",
        reason="nibabel is not installed in this image (no-install "
        "policy; recorded in ROUND4.md) — runs wherever it exists",
    )
    from multimodal_segmentation_project_tpu.data.nifti import (
        load_nifti, save_nifti,
    )

    rng = np.random.default_rng(0)
    data = rng.normal(size=(9, 10, 11)).astype(np.float32)
    aff = np.eye(4)
    aff[:3, 3] = [3.0, -2.0, 1.0]
    p = str(tmp_path / "x.nii.gz")
    save_nifti(data, p, affine=aff)
    ours, ours_aff = load_nifti(p)
    img = nib.load(p)
    np.testing.assert_allclose(ours, np.asarray(img.get_fdata(), np.float32),
                               atol=1e-6)
    np.testing.assert_allclose(ours_aff, img.affine, atol=1e-6)


def test_adjust_contrast_against_monai():
    """ops/augment.py adjust_contrast vs MONAI's deterministic
    AdjustContrast on the same gamma — both compute
    ((img-min)/(range+eps))^gamma rescaled back; MONAI multiplies by
    range where we multiply by range+eps, a <=1e-7-scale difference
    covered by the tolerance."""
    monai_t = pytest.importorskip(
        "monai.transforms",
        reason="MONAI is not installed in this image (no-install "
        "policy; recorded in ROUND5.md) — runs wherever it exists",
    )
    import jax.numpy as jnp

    from multimodal_segmentation_project_tpu.ops.augment import adjust_contrast

    rng = np.random.default_rng(7)
    img = rng.uniform(-40, 260, size=(1, 6, 7, 8)).astype(np.float32)
    for gamma in (0.7, 1.0, 1.42):
        want = np.asarray(monai_t.AdjustContrast(gamma=gamma)(img))
        got = np.asarray(adjust_contrast(jnp.asarray(img), gamma))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_histogram_shift_against_monai():
    """The gather-free piecewise evaluator (apply_histogram_shift) vs
    MONAI's RandHistogramShift applied with MONAI'S OWN drawn control
    points — the cross-library check of the TPU-critical reformulation
    (MONAI evaluates the same monotone remap via np.interp)."""
    monai_t = pytest.importorskip(
        "monai.transforms",
        reason="MONAI is not installed in this image (no-install "
        "policy; recorded in ROUND5.md) — runs wherever it exists",
    )
    import jax.numpy as jnp

    from multimodal_segmentation_project_tpu.ops.augment import (
        apply_histogram_shift,
    )

    rng = np.random.default_rng(3)
    img = rng.uniform(0.0, 1.0, size=(1, 8, 8, 8)).astype(np.float32)
    t = monai_t.RandHistogramShift(num_control_points=5, prob=1.0)
    t.set_random_state(11)
    want = np.asarray(t(img))
    # MONAI keeps the drawn normalized control points on the instance;
    # its reference points are a linspace — the same source-point
    # convention apply_histogram_shift hard-codes
    floating = np.asarray(t.floating_control_points, np.float64)
    reference = np.asarray(t.reference_control_points, np.float64)
    np.testing.assert_allclose(
        reference, np.linspace(reference[0], reference[-1], len(reference)),
        atol=1e-9,
    )
    dst = (floating - reference[0]) / (reference[-1] - reference[0])
    got = np.asarray(apply_histogram_shift(jnp.asarray(img), dst))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)
