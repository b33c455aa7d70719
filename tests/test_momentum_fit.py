"""F5-F7/F9 momentum fitting tests, incl. validation against the
reference's momentum_map.csv fixture and the golden landmark set from its
own test suite (tests/calibrator/test_momentum.py:54-137)."""

from __future__ import annotations

import csv
import os

import numpy as np
import pytest

from sed_binning_spark.calibration.momentum_fit import (
    add_features,
    calibrate_momentum,
    identity_fields,
    peakdetect2d,
    pointset_order,
    pose_adjustment,
    rot_vertex_generator,
    spline_warp_estimate,
    tps_eval,
    tps_fit,
    tps_warp_fields,
    transform_fields,
    warp_image,
)

FIXTURE = "/root/reference/tests/data/calibrator/momentum_map.csv"
needs_fixture = pytest.mark.skipif(
    not os.path.isfile(FIXTURE), reason="reference fixture not present",
)

# the golden landmark set the reference's own splinewarp test feeds for
# this image (tests/calibrator/test_momentum.py:93-103): 6 outer + center
GOLDEN_FEATURES = np.array([
    [203.2, 341.96], [299.16, 345.32], [350.25, 243.70], [304.38, 149.88],
    [199.52, 152.48], [154.28, 242.27], [248.29, 248.62],
])


def _momentum_map() -> np.ndarray:
    rows = []
    with open(FIXTURE, newline="") as f:
        for row in csv.reader(f):
            rows.append([float(v) for v in row])
    return np.asarray(rows).T


# ------------------------------------------------------------- F5 features
def test_peakdetect2d_synthetic():
    img = np.zeros((200, 200))
    rr, cc = np.meshgrid(np.arange(200.0), np.arange(200.0), indexing="ij")
    for r, c in [(50, 60), (150, 40), (100, 170)]:
        img += np.exp(-((rr - r) ** 2 + (cc - c) ** 2) / 18.0)
    peaks = peakdetect2d(img, radius=10)
    got = {tuple(p) for p in peaks}
    assert got == {(50.0, 60.0), (150.0, 40.0), (100.0, 170.0)}


@needs_fixture
def test_peakdetect2d_finds_golden_features():
    """Peak detection on the reference fixture must land within a couple of
    pixels of the landmark set the reference's test suite uses."""
    img = _momentum_map()
    peaks = peakdetect2d(img, radius=20, threshold_rel=0.1)
    assert len(peaks) == 7
    for want in GOLDEN_FEATURES:
        d = np.linalg.norm(peaks - want, axis=1).min()
        assert d < 5.0, f"feature {want} not found (nearest {d:.1f} px)"


def test_peakdetect2d_plateau_yields_one_peak():
    """A flat-topped (saturated) peak must yield exactly one detection at
    its first pixel in scan order, not be rejected for having ties."""
    img = np.zeros((60, 60))
    img[20:23, 30:33] = 5.0          # 3x3 plateau
    img[45, 10] = 4.0                # ordinary strict peak
    peaks = peakdetect2d(img, radius=8, threshold_rel=0.2)
    got = {tuple(p) for p in peaks}
    assert got == {(20.0, 30.0), (45.0, 10.0)}


def test_calibrate_energy_requires_ref_energy():
    from sed_binning_spark.calibration.fitting import calibrate_energy

    with pytest.raises(ValueError, match="ref_energy is required"):
        calibrate_energy(
            landmarks=np.array([100.0, 110.0]),
            biases=np.array([0.0, 1.0]),
            t=np.arange(200.0),
        )


def test_add_features_center_split():
    center, outer, inc = add_features(GOLDEN_FEATURES, rotsym=6)
    assert inc is True
    np.testing.assert_allclose(center, [248.29, 248.62])
    assert outer.shape == (6, 2)
    with pytest.raises(ValueError, match="required"):
        add_features(GOLDEN_FEATURES[:4], rotsym=6)


def test_pointset_order_ccw():
    ang = np.linspace(0, 2 * np.pi, 6, endpoint=False)
    pts = np.column_stack([np.cos(ang), np.sin(ang)])
    shuffled = pts[[3, 0, 5, 1, 4, 2]]
    ordered = pointset_order(shuffled)
    # consecutive angular differences all positive (mod 2pi)
    a = np.arctan2(ordered[:, 1], ordered[:, 0])
    diffs = np.diff(np.unwrap(a))
    assert (diffs > 0).all()


def test_rot_vertex_generator_hexagon():
    targets = rot_vertex_generator((0.0, 0.0), (1.0, 0.0), 6)
    assert targets.shape == (6, 2)
    np.testing.assert_allclose(np.linalg.norm(targets, axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose(targets[0], [1.0, 0.0], atol=1e-12)


# ------------------------------------------------------------------ F6 TPS
def test_tps_interpolates_landmarks_exactly():
    rng = np.random.default_rng(0)
    lm = rng.uniform(0, 100, (8, 2))
    vals = rng.uniform(0, 100, (8, 2))
    spline = tps_fit(lm, vals)
    np.testing.assert_allclose(tps_eval(spline, lm), vals, atol=1e-8)


def test_tps_reproduces_affine():
    """An affine displacement of the landmarks is fitted with zero bending
    energy: the TPS equals the affine map EVERYWHERE, not just at the
    landmarks."""
    rng = np.random.default_rng(1)
    lm = rng.uniform(0, 100, (10, 2))
    amat = np.array([[1.1, 0.05], [-0.04, 0.95]])
    shift = np.array([3.0, -2.0])
    vals = lm @ amat.T + shift
    spline = tps_fit(lm, vals)
    q = rng.uniform(0, 100, (50, 2))
    np.testing.assert_allclose(tps_eval(spline, q), q @ amat.T + shift, atol=1e-6)


def test_tps_warp_fields_identity():
    lm = np.array([[10.0, 10.0], [10.0, 50.0], [50.0, 10.0], [50.0, 50.0], [30.0, 30.0]])
    rdef, cdef = tps_warp_fields(lm, lm, (64, 64))
    rr, cc = identity_fields((64, 64))
    np.testing.assert_allclose(rdef, rr, atol=1e-6)
    np.testing.assert_allclose(cdef, cc, atol=1e-6)


@needs_fixture
def test_spline_warp_symmetrizes_fixture():
    """After the TPS warp the corrected landmark positions form a regular
    hexagon: warped-feature radii from center agree (the symmetrization
    contract of spline_warp_estimate)."""
    img = _momentum_map()
    out = spline_warp_estimate(img, GOLDEN_FEATURES, rotsym=6)
    assert out["rdeform_field"].shape == img.shape
    assert len(out["reference_points"]) == len(out["target_points"]) == 7
    targets = out["target_points"][:6]
    center = out["center_point"]
    radii = np.linalg.norm(targets - center, axis=1)
    np.testing.assert_allclose(radii, radii[0], rtol=1e-9)
    # corrected image exists and preserves gross intensity
    corrected = out["corrected_image"]
    assert corrected.shape == img.shape
    assert corrected.sum() > 0.5 * img.sum()
    # ascale validation mirrors the reference's errors
    with pytest.raises(ValueError, match="rotsym"):
        spline_warp_estimate(img, GOLDEN_FEATURES, rotsym=6, ascale=1.3)
    with pytest.raises(ValueError, match="length"):
        spline_warp_estimate(img, GOLDEN_FEATURES, rotsym=6, ascale=[1.3, 1, 1.3, 1])


# ----------------------------------------------------------------- F7 pose
def test_pose_adjustment_translation_moves_peak():
    img = np.zeros((100, 100))
    img[40, 60] = 1.0
    out = pose_adjustment(img, xtrans=5.0, ytrans=-3.0)
    r, c = np.unravel_index(np.argmax(out["corrected_image"]), img.shape)
    # inverse-map semantics: output pixel (r,c) samples source (r-xtrans,
    # c-ytrans) -> the peak lands at (45, 57)
    assert (r, c) == (45, 57)


def test_pose_adjustment_rotation_90deg():
    img = np.zeros((101, 101))
    img[30, 50] = 1.0  # 20 px above center (50,50) in row terms
    out = pose_adjustment(img, angle=90.0)
    r, c = np.unravel_index(np.argmax(out["corrected_image"]), img.shape)
    d0 = np.array([30 - 50, 50 - 50])
    # output location q satisfies R(angle) (q-center) = d0
    ca, sa = 0.0, 1.0
    want = np.array([ca * d0[0] + sa * d0[1], -sa * d0[0] + ca * d0[1]]) + 50
    assert (r, c) == tuple(np.round(want).astype(int))


def test_pose_adjustment_composition_matches_single():
    """scale→translate composed via field resampling ≈ applying the two
    transforms directly to a smooth image."""
    rr, cc = np.meshgrid(np.arange(80.0), np.arange(80.0), indexing="ij")
    img = np.sin(rr / 7.0) * np.cos(cc / 9.0) + 2.0
    out = pose_adjustment(img, scale=1.1, xtrans=2.0)
    direct1 = pose_adjustment(img, scale=1.1)["corrected_image"]
    direct2 = pose_adjustment(direct1, xtrans=2.0)["corrected_image"]
    inner = np.s_[15:65, 15:65]
    np.testing.assert_allclose(
        out["corrected_image"][inner], direct2[inner], atol=5e-3,
    )


# ------------------------------------------------------------------ F9 2pt
def test_calibrate_momentum_equiscale():
    cal = calibrate_momentum(
        point_a=(356.0, 256.0), point_b=(256.0, 256.0), k_distance=1.3,
        shape=(512, 512), bin_ranges=[(-256, 1792), (-256, 1792)],
    )
    assert cal["kx_scale"] == cal["ky_scale"] == pytest.approx(1.3 / 100.0)
    assert cal["x_center"] == 256.0 and cal["y_center"] == 256.0
    assert cal["rstart"] == -256.0 and cal["rstep"] == pytest.approx(4.0)
    # k axis pins point_b at k=0
    assert cal["kx_axis"][256] == pytest.approx(0.0)


def test_calibrate_momentum_anisotropic_roundtrip(spark):
    """equiscale=False with distinct x/y ratios, then the dict drives
    append_k_axis: the two calibration points land on their k coords."""
    from pyspark.sql import functions as F

    from sed_binning_spark.calibration.momentum import append_k_axis

    cal = calibrate_momentum(
        point_a=(300.0, 316.0), point_b=(256.0, 256.0),
        k_coord_a=(0.8, 1.1), k_coord_b=(0.0, 0.0), equiscale=False,
        shape=(512, 512), bin_ranges=[(0, 512), (0, 512)],
    )
    df = spark.createDataFrame(
        [(300.0, 316.0), (256.0, 256.0)], "X double, Y double",
    )
    out, _ = append_k_axis(df, cal)
    got = out.select(F.round("kx", 9).alias("kx"), F.round("ky", 9).alias("ky")).collect()
    assert (got[0]["kx"], got[0]["ky"]) == (0.8, 1.1)
    assert (got[1]["kx"], got[1]["ky"]) == (0.0, 0.0)


def test_calibrate_momentum_validation():
    with pytest.raises(ValueError, match="k_distance"):
        calibrate_momentum((1, 1), (0, 0))
    with pytest.raises(ValueError, match="k_coord_a"):
        calibrate_momentum((1, 1), (0, 0), equiscale=False)


@needs_fixture
def test_fixture_workflow_dfield_corrects_landmarks(spark):
    """F8 against the reference's momentum fixture workflow
    (tests/calibrator/test_momentum.py:169-206): spline_warp_estimate on the
    golden landmark set -> generate_inverse_dfield -> apply_dfield on events
    AT the landmark positions. The corrected (Xm, Ym) must land on the
    symmetrized target hexagon — a stronger check than the reference's own
    test (which asserts only that the corrected columns appear)."""
    from sed_binning_spark.calibration.momentum import (
        apply_dfield,
        generate_inverse_dfield,
    )

    img = _momentum_map()
    out = spline_warp_estimate(img, GOLDEN_FEATURES, rotsym=6)
    ranges = ((0, img.shape[0]), (0, img.shape[1]))
    inv = generate_inverse_dfield(
        out["rdeform_field"], out["cdeform_field"],
        bin_ranges=ranges, detector_ranges=ranges,
    )
    df = spark.createDataFrame(
        [(float(r), float(c)) for r, c in out["reference_points"]],
        "X double, Y double",
    )
    res = apply_dfield(df, inv, detector_ranges=ranges).toPandas()
    got = res[["Xm", "Ym"]].to_numpy()
    err = np.linalg.norm(got - out["target_points"], axis=1)
    assert err.max() < 2.0, f"landmark correction errors {err}"
    assert err.mean() < 1.0


def test_inverse_dfield_of_forward_rotation_roundtrips():
    """F8 end-to-end: invert a known forward deformation (5° rotation) and
    verify the composition forward∘inverse ≈ identity on the interior —
    the property the reference gets from scipy.griddata resampling."""
    from sed_binning_spark.calibration.momentum import (
        generate_inverse_dfield,
        map_coordinates_bilinear,
    )

    shape = (128, 128)
    fr, fc = transform_fields(shape, "rotation", angle=5.0)
    inv = generate_inverse_dfield(fr, fc, bin_ranges=((0, 128), (0, 128)),
                                  detector_ranges=((0, 128), (0, 128)))
    rr, cc = identity_fields(shape)
    inner = np.s_[30:98, 30:98]
    # forward(inverse(x)) ≈ x: sample the forward field at inverse coords
    back_r = map_coordinates_bilinear(fr, inv[0][inner].ravel(), inv[1][inner].ravel())
    back_c = map_coordinates_bilinear(fc, inv[0][inner].ravel(), inv[1][inner].ravel())
    assert np.abs(back_r - rr[inner].ravel()).max() < 1.0
    assert np.abs(back_c - cc[inner].ravel()).max() < 1.0
    assert np.abs(back_r - rr[inner].ravel()).mean() < 0.35


def test_update_deformation_nan_outside_field():
    """Composed deformation fields are NaN where the transform samples
    outside the source field (reference map_coordinates cval=nan) — a zero
    fill would alias rotated-out pixels to coordinate 0.0 and poison the
    inverse field near the origin."""
    out = pose_adjustment(np.zeros((64, 64)), angle=20.0)
    rd = out["rdeform_field"]
    assert np.isnan(rd[0, 0]) and np.isnan(rd[-1, -1])   # rotated-out corners
    assert np.isfinite(rd[32, 32])                        # center intact
    # the warped image stays finite (NaN coords sample as cval 0)
    assert np.isfinite(out["corrected_image"]).all()


def test_generate_inverse_dfield_stays_nan_outside_hull():
    """The seam-hole fill must not extrapolate past the forward field's
    data hull (reference griddata fill_value=nan): a disk-shaped field
    leaves the far-outside region NaN."""
    from sed_binning_spark.calibration.momentum import generate_inverse_dfield

    n = 64
    rr, cc = np.meshgrid(np.arange(n, dtype=float), np.arange(n, dtype=float),
                         indexing="ij")
    inside = (rr - 32) ** 2 + (cc - 32) ** 2 <= 20.0 ** 2
    fr = np.where(inside, rr, np.nan)
    fc = np.where(inside, cc, np.nan)
    inv = generate_inverse_dfield(
        fr, fc, bin_ranges=((0, n), (0, n)), detector_ranges=((0, n), (0, n)),
    )
    # identity inside the disk ...
    assert abs(inv[0][32, 40] - 32.0) < 1.0
    # ... NaN well outside it (radius > 26: beyond any seam-closing reach)
    far = (rr - 32) ** 2 + (cc - 32) ** 2 >= 27.0 ** 2
    assert np.isnan(inv[0][far]).all() and np.isnan(inv[1][far]).all()
