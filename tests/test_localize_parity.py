"""Reference-parity integration test (SURVEY.md §4 item 2).

Runs the full localization pipeline on the reference's own shipped data
(feature_points_with_annotations.csv + potential_camera_locations.csv for
the 1898 image) and compares the candidate ranking, best-location choice and
PnP pose against an OpenCV oracle that executes the reference *algorithm*
(SURVEY.md §2.4 semantics: east-axis plane projection, cv2.findHomography
RANSAC at 75 px, err2 = inlier plane error + outliers x bound, argmin with
zeros -> 1e6; cv2.solvePnPRansac(5000, 30, 0.99) + LM).  RANSAC is
stochastic, so parity is decision-level (same/nearby argmin, overlapping
rankings, pose within tolerance) not bitwise (SURVEY.md §7.3.6).
"""

import os

import cv2
import numpy as np
import pytest

from ransac_tpu.io.tables import build_scene, read_camera_locations, read_points_data
from ransac_tpu.pipelines.localize import localize
from ransac_tpu.utils.config import LocalizeConfig
from tests.conftest import REFERENCE_DIR, reference_available

pytestmark = [
    pytest.mark.skipif(not reference_available(),
                       reason="reference data absent"),
    # Compile-heavy module: excluded from the quick loop
    # (pytest -m 'not slow'); the default no-filter run includes it.
    pytest.mark.slow,
]

FEATURES = os.path.join(REFERENCE_DIR, "feature_points_with_annotations.csv")
CAMERAS = os.path.join(REFERENCE_DIR, "potential_camera_locations.csv")
IMAGE_SIZE = (2142, 1620)  # 1898.json:6-7


def load_scene():
    feats = read_points_data(FEATURES, "Pixel_x_1898.jpg", "Pixel_y_1898.jpg")
    cams = read_camera_locations(CAMERAS)
    return build_scene(feats, cams)


def cv2_oracle_scores(scene, ransacbound=75.0, seed=1234):
    """Reference algorithm via OpenCV on the same centered data."""
    cv2.setRNGSeed(seed)
    N = len(scene.pixels)
    C = len(scene.cam_locs)
    err1 = np.zeros(C)
    err2 = np.zeros(C)
    for i in range(C):
        loc = scene.cam_locs[i].astype(np.float64)
        p = scene.pos3d.astype(np.float64) - loc
        pos2 = np.stack([p[:, 2] / p[:, 0], p[:, 1] / p[:, 0]], axis=1)
        M, mask = cv2.findHomography(
            pos2, scene.pixels.astype(np.float64), cv2.RANSAC, ransacbound)
        if M is None:
            continue
        mask = mask.ravel().astype(bool)
        pred_pix = cv2.perspectiveTransform(
            pos2.reshape(-1, 1, 2), M).reshape(-1, 2)
        pred_plane = cv2.perspectiveTransform(
            scene.pixels.reshape(-1, 1, 2).astype(np.float64),
            np.linalg.inv(M)).reshape(-1, 2)
        e1 = np.linalg.norm(pred_pix - scene.pixels, axis=1)
        e2 = np.linalg.norm(pred_plane - pos2, axis=1)
        err1[i] = e1[mask].sum()
        err2[i] = e2[mask].sum() + (N - mask.sum()) * ransacbound
    return err1, err2


@pytest.fixture(scope="module")
def scene():
    return load_scene()


@pytest.fixture(scope="module")
def result(scene):
    return localize(scene, IMAGE_SIZE, LocalizeConfig(), seed=0)


@pytest.fixture(scope="module")
def oracle(scene):
    return cv2_oracle_scores(scene)


def test_ingest_counts(scene):
    # 13 annotated features for 1898.jpg; 458 candidates (SURVEY.md §2.1).
    assert len(scene.pixels) == 13
    assert len(scene.cam_locs) == 458
    assert scene.point_mask.sum() == 13


def test_best_location_matches_oracle(scene, result, oracle):
    err1_cv, err2_cv = oracle
    sel = np.where(err2_cv == 0, 1e6, err2_cv)
    best_cv = int(np.argmin(sel))
    best_mine = result.best_index
    # Same decision, or a physically-equivalent near-tie (within 30 m and
    # 2% of the oracle's best score).
    if best_mine != best_cv:
        d = np.linalg.norm(scene.cameras.pos3d_utm[best_mine]
                           - scene.cameras.pos3d_utm[best_cv])
        assert d < 30.0, (best_mine, best_cv, d)
        assert result.err2[best_mine] < sel[best_cv] * 1.02
    else:
        assert best_mine == best_cv


def test_score_ranking_correlates_with_oracle(result, oracle):
    _, err2_cv = oracle
    mine = result.err2
    both = (err2_cv > 0) & (mine > 0)
    # Spearman rank correlation of candidate scores.
    from scipy.stats import spearmanr

    rho, _ = spearmanr(err2_cv[both], mine[both])
    # Tail candidates (hundreds of px of error) rank differently run-to-run
    # even across cv2 seeds; the head of the ranking is what matters.
    assert rho > 0.9, rho
    # Top-10 sets overlap strongly.
    top_cv = set(np.argsort(np.where(err2_cv == 0, 1e6, err2_cv))[:10])
    top_mine = set(np.argsort(np.where(mine == 0, 1e6, mine))[:10])
    assert len(top_cv & top_mine) >= 7, (top_cv, top_mine)


def test_pnp_guard_and_pose_match_cv2(scene, result):
    """On the 1898 data with the reference's film-derived K, OpenCV's own
    solvePnPRansac finds only 5 inliers at 30 px — below the reference's
    >= 6 guard (main_v1.py:504-506), i.e. the reference pipeline *fails*
    PnP on its shipped data.  Parity means: (a) our guard fires too, and
    (b) our underlying RANSAC pose equals OpenCV's."""
    K = result.K
    cv2.setRNGSeed(7)
    ok, rvec, tvec, inl = cv2.solvePnPRansac(
        scene.pos3d.astype(np.float64), scene.pixels.astype(np.float64),
        K, np.zeros(4), iterationsCount=5000, reprojectionError=30.0,
        confidence=0.99)
    assert ok
    n_cv = 0 if inl is None else len(inl)
    if n_cv < 6:
        # Guard parity: both engines refuse the pose.
        assert result.R is None
    else:
        assert result.R is not None

    # Pose parity on the raw RANSAC estimate regardless of the guard.
    import jax
    import jax.numpy as jnp

    from ransac_tpu.models import ransac as ransac_mod
    from ransac_tpu.utils.config import RansacConfig

    res = ransac_mod.ransac_pnp(
        jnp.asarray(scene.pos3d), jnp.asarray(scene.pixels),
        jnp.asarray(K, dtype=jnp.float32), jnp.asarray(scene.point_mask),
        RansacConfig(threshold=30.0, exhaustive=True), jax.random.key(1))
    # Consensus parity: exhaustive enumeration cannot find a smaller
    # consensus than cv2's stochastic best.  On this data several
    # DISTINCT 5-inlier poses tie (the workload genuinely fails PnP), and
    # cv2's pick among ties is seed-dependent, so the models themselves
    # need not match — the sizes must.
    assert int(res.num_inliers) >= n_cv, (int(res.num_inliers), n_cv)
    # Pixel-true threshold parity under the reference's anisotropic K
    # (fx/fy = 1.85): our inlier classification of OUR winning model must
    # equal cv2's own pixel-error rule (projectPoints L2 <= 30 px).
    Rm = np.asarray(res.raw_model[:9], np.float64).reshape(3, 3)
    tm = np.asarray(res.raw_model[9:12], np.float64)
    rv_m, _ = cv2.Rodrigues(Rm)
    pp, _ = cv2.projectPoints(
        scene.pos3d.astype(np.float64), rv_m, tm, K, np.zeros(4))
    err_px = np.linalg.norm(pp[:, 0, :] - scene.pixels, axis=1)
    np.testing.assert_array_equal(
        np.asarray(res.inlier_mask), err_px <= 30.0)


def test_inlier_masks_sane(scene, result):
    # Best candidate must explain most annotated points at 75 px.
    inl = result.inlier_masks[result.best_index]
    assert inl.sum() >= 9


def test_location_csv_export(tmp_path, result):
    from ransac_tpu.io.export import LOCATION_HEADER, write_location_csv

    path = tmp_path / "1898_location.csv"
    write_location_csv(str(path), result.scores_rows)
    import csv as csvmod

    rows = list(csvmod.reader(open(path)))
    assert rows[0] == LOCATION_HEADER
    assert len(rows) == 1 + 458
    # Column layout: id, err1, err2, grid, E, N, z (main_v1.py:283).
    r0 = rows[1]
    assert float(r0[4]) > 7e5 and float(r0[5]) > 2.8e6


def test_second_image_parity_1900_1910():
    """Multi-image path (main_v1.py images_info[1] is the 1900-1910 photo):
    decision parity against the cv2 oracle on the second image's columns."""
    feats = read_points_data(FEATURES, "Pixel_x_1900-1910.jpg",
                             "Pixel_y_1900-1910.jpg")
    cams = read_camera_locations(CAMERAS)
    sc = build_scene(feats, cams)
    assert len(sc.pixels) == 16  # annotated features for this image
    res = localize(sc, (2476, 1920), LocalizeConfig(), seed=0)
    err1_cv, err2_cv = cv2_oracle_scores(sc)
    sel = np.where(err2_cv == 0, 1e6, err2_cv)
    best_cv = int(np.argmin(sel))
    mine = np.where(res.err2 == 0, 1e6, res.err2)
    # This image sits on a broad score plateau: dozens of candidates tie
    # within 0.1% of err2, and the exhaustive search legitimately lands on
    # a (slightly better-scoring) different plateau cluster than OpenCV's
    # randomized search.  Decision parity on a plateau = our winner must
    # dominate the oracle's objective, and the oracle's winner must look
    # equally good under our scoring (mutual near-tie).
    assert mine[res.best_index] <= sel[best_cv] * 1.001, \
        (float(mine[res.best_index]), float(sel[best_cv]))
    assert mine[best_cv] <= sel[best_cv] * 1.01


def test_planar_schema_end_to_end(tmp_path):
    """process.py's alternate CSV schema (planar coords, symbol at col 6,
    camera pos3d=[height,x,y], ransacbound 120, grid_code_min=7 —
    process.py:297-398): synthesize matching CSVs and localize."""
    import csv as csvmod

    import jax.numpy as jnp

    from ransac_tpu.ops import homography as hops

    rng = np.random.default_rng(11)
    cam = np.array([-400.0, 0.0, 30.0])
    X = rng.uniform(-80, 80, size=(12, 3)) + np.array([0, 0, 60.0])
    p = X - cam
    pos2 = np.stack([p[:, 2] / p[:, 0], p[:, 1] / p[:, 0]], 1)
    H_true = np.array([[800.0, 10, 400], [-12, 760, 300], [1e-3, 1e-3, 1]])
    pix = np.asarray(hops.apply_h(jnp.asarray(H_true), jnp.asarray(pos2)))

    fcsv = tmp_path / "features.csv"
    with open(fcsv, "w", newline="") as f:
        w = csvmod.writer(f)
        # planar schema: name col1, height col2, x col3, y col4, elev col5,
        # symbol col6 (process.py:311-314), pixel cols by header name.
        w.writerow(["id", "name", "h", "x", "y", "elev", "sym",
                    "Pixel_x_img", "Pixel_y_img"])
        for i in range(12):
            w.writerow([i, f"name{i}", 1.0, X[i, 0], X[i, 1], X[i, 2] - 1.0,
                        f"S{i}", int(pix[i, 0]), int(pix[i, 1])])
    ccsv = tmp_path / "cams.csv"
    with open(ccsv, "w", newline="") as f:
        w = csvmod.writer(f)
        w.writerow(["id", "pad", "grid", "x", "y", "elev"])
        cands = cam + rng.normal(scale=60.0, size=(10, 3))
        cands[4] = cam
        for i, c in enumerate(cands):
            # grid col2, x col3, y col4, elev col5 (process.py:341-343).
            w.writerow([i, 0, 7 + (i % 3), c[0], c[1], c[2] - 2.0])

    feats = read_points_data(str(fcsv), "Pixel_x_img", "Pixel_y_img",
                             schema="planar")
    cams = read_camera_locations(str(ccsv), schema="planar")
    assert len(feats) == 12 and len(cams) == 10
    scene = build_scene(feats, cams)
    from ransac_tpu.utils.config import RansacConfig

    res = localize(scene, (800, 600), LocalizeConfig(
        ransac=RansacConfig(threshold=120.0), grid_code_min=7), seed=0)
    assert res.best_index == 4
