"""Viz smoke tests: every plot function renders headless to a file."""

import numpy as np
import pytest

from ransac_tpu import analytics, viz
from ransac_tpu.io import dem as demio
from ransac_tpu.ops.geodesy import SceneFrame

# Compile-heavy module: excluded from the quick loop (pytest -m 'not slow');
# the default no-filter run still includes it.
pytestmark = pytest.mark.slow


def test_all_plot_functions_render(tmp_path):
    rng = np.random.default_rng(0)
    p = tmp_path

    viz.plot_error_histogram(rng.normal(size=100), save_to=p / "a.png")
    viz.plot_error_boxplot(rng.normal(size=100), save_to=p / "b.png")
    rows = [[i + 1, rng.random() * 100, rng.random() * 300, 1,
             739000 + rng.random() * 500, 2888000 + rng.random() * 500, 700]
            for i in range(50)]
    viz.plot_camera_location_scores(rows, save_to=p / "c.png")
    cam_utm = np.array([[r[4], r[5], r[6]] for r in rows])
    viz.plot_camera_pose(cam_utm, 3, save_to=p / "d.png")
    viz.plot_distance_histogram(rng.random(60) * 50, save_to=p / "e.png")
    viz.plot_angle_rose(rng.random(60) * 360, save_to=p / "f.png")
    viz.plot_nearest_neighbor_distances(rng.random(30), save_to=p / "g.png")
    viz.plot_homography_heatmap(np.eye(3), save_to=p / "h.png")
    viz.plot_ransac_scatter(rng.random((10, 2)), rng.random((4, 2)),
                            save_to=p / "i.png")
    viz.plot_annotated_image(
        np.zeros((50, 80)), rng.random((5, 2)) * 40, list("abcde"),
        rng.random((5, 2)) * 40, np.array([1, 1, 0, 1, 1], bool),
        save_to=p / "j.png")
    viz.plot_pose_triad(np.eye(3), np.zeros(3),
                        rng.random((6, 3)) * 100, list(range(6)),
                        save_to=p / "k.png")
    frame = SceneFrame(anchor=np.zeros(3))
    dem = demio.synthetic_dem(frame, extent_m=500, spacing_m=50)
    viz.plot_terrain_mesh(dem, polygons=[np.array(
        [[0, 0, 120], [100, 0, 120], [100, 100, 120]])], save_to=p / "l.png")

    acc = analytics.accuracy_rows(
        list("abc"), list("ABC"), rng.random((3, 2)),
        rng.random((3, 2)) * 100, rng.random((3, 2)) * 100)
    viz.plot_accuracies(acc, save_to=p / "m.png")
    corr = analytics.correlate_features(
        list("abcd"), rng.random((4, 2)) * 100, rng.random((4, 2)) * 500,
        rng.random((4, 2)) * 500)
    viz.plot_correlation_heatmap(corr, save_to=p / "n.png")

    for name in "abcdefghijklmn":
        f = p / f"{name}.png"
        assert f.exists() and f.stat().st_size > 1000, name
