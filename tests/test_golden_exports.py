"""Golden-file regression of exported CSVs (SURVEY.md §4 item 5).

The committed fixture was produced by the deterministic exhaustive-RANSAC
localization on the reference's shipped CSVs; any semantic drift in ingest,
projection, RANSAC, scoring, or export layout shows up here."""

import csv
import os

import numpy as np
import pytest

from ransac_tpu.pipelines.localize import (export_best_candidate_report,
                                           localize)
from ransac_tpu.utils.config import LocalizeConfig
from tests.conftest import reference_available
from tests.test_localize_parity import IMAGE_SIZE, load_scene

GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures",
                      "1898_location_golden.csv")

pytestmark = [
    pytest.mark.skipif(not reference_available(),
                       reason="reference data absent"),
    # Compile-heavy module: excluded from the quick loop
    # (pytest -m 'not slow'); the default no-filter run includes it.
    pytest.mark.slow,
]


@pytest.fixture(scope="module")
def result():
    scene = load_scene()
    return scene, localize(scene, IMAGE_SIZE, LocalizeConfig(), seed=0)


def _read(path):
    rows = list(csv.reader(open(path)))
    return rows[0], np.array([[float(v) for v in r] for r in rows[1:]])


def test_location_csv_matches_golden(result, tmp_path):
    from ransac_tpu.io.export import write_location_csv

    scene, res = result
    out = tmp_path / "loc.csv"
    write_location_csv(str(out), res.scores_rows)
    h_new, new = _read(str(out))
    h_gold, gold = _read(GOLDEN)
    assert h_new == h_gold
    assert new.shape == gold.shape == (458, 7)
    # Exact static columns.
    np.testing.assert_array_equal(new[:, 0], gold[:, 0])   # ids
    np.testing.assert_array_equal(new[:, 3], gold[:, 3])   # grid codes
    np.testing.assert_allclose(new[:, 4:7], gold[:, 4:7], atol=1e-6)  # UTM
    # Scores: exhaustive RANSAC is deterministic; refit LM is while_loop
    # driven, allow tiny float drift.
    np.testing.assert_allclose(new[:, 1], gold[:, 1], rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(new[:, 2], gold[:, 2], rtol=1e-3, atol=1e-2)
    # Selection invariant.
    sel_new = np.where(new[:, 2] == 0, 1e6, new[:, 2])
    sel_gold = np.where(gold[:, 2] == 0, 1e6, gold[:, 2])
    assert np.argmin(sel_new) == np.argmin(sel_gold) == 56


def test_best_candidate_report_artifacts(result, tmp_path):
    scene, res = result
    out = str(tmp_path / "z1898.jpg")
    acc, corr = export_best_candidate_report(scene, res, out, image=None)
    assert os.path.exists(str(tmp_path / "z1898_accuracies.csv"))
    assert os.path.exists(str(tmp_path / "z1898_correlations.csv"))
    for suffix in ("_output.png", "_err_hist.png", "_rose.png", "_nn.png",
                   "_H.png", "_ransac.png", "_scores.png", "_pose.png"):
        assert os.path.exists(str(tmp_path / ("z1898" + suffix))), suffix
    # Accuracies rows: header + 13 annotated features.
    assert len(acc) == 1 + 13
    # Correlations: header + all distinct-symbol pairs of 13 features.
    assert len(corr) == 1 + 13 * 12 // 2


def test_unannotated_forward_projection(result, tmp_path):
    """VERDICT r1 #7: unannotated landmarks ((0,0)-pixel rows) must be
    forward-projected through the winning H into the accuracies CSV and
    the overlay — main_v1.py:367-383 (actual pixel written as (0,0), calc
    pixel = M^-1 @ [pos2, 1])."""
    from ransac_tpu.io.tables import read_points_data
    from tests.test_localize_parity import FEATURES

    scene, res = result
    feats_all = read_points_data(
        FEATURES, "Pixel_x_1898.jpg", "Pixel_y_1898.jpg",
        keep_unannotated=True)
    assert len(feats_all) == 29  # full landmark table
    out = str(tmp_path / "u1898.jpg")
    acc, corr = export_best_candidate_report(
        scene, res, out, image=None, all_features=feats_all)
    # header + all 29 landmarks.
    assert len(acc) == 1 + 29
    rows = acc[1:]
    annotated = (np.abs(feats_all.pixels) > 0).any(axis=1)
    assert annotated.sum() == 13
    # Unannotated rows: actual pixel (0,0), calc pixel finite (projected).
    for i, r in enumerate(rows):
        if not annotated[i]:
            assert float(r[5]) == 0.0 and float(r[6]) == 0.0
            assert np.isfinite(float(r[7])) and np.isfinite(float(r[8]))
    # Annotated rows agree with the annotated-only report.
    acc13, _ = export_best_candidate_report(
        scene, res, str(tmp_path / "a1898.jpg"), image=None,
        make_plots=False)
    ann_rows = [r for i, r in enumerate(rows) if annotated[i]]
    for r_full, r_ann in zip(ann_rows, acc13[1:]):
        np.testing.assert_allclose(
            [float(v) for v in r_full[3:]],
            [float(v) for v in r_ann[3:]], rtol=1e-4)
    # Correlations include unannotated pairs: header + C(29,2) minus
    # same-symbol pairs (reference pairs distinct symbols only).
    assert len(corr) > 1 + 13 * 12 // 2
