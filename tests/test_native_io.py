"""Native fastio parser: build, correctness vs the Python csv path."""

import os
import subprocess

import numpy as np
import pytest

from ransac_tpu.io import native
from tests.conftest import REFERENCE_DIR, REPO_ROOT, reference_available


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        if not native.build():
            pytest.skip("no native toolchain")
    assert native.available()


def test_numeric_matches_python_csv(tmp_path):
    import csv as csvmod

    path = str(tmp_path / "t.csv")
    with open(path, "w", newline="") as f:
        w = csvmod.writer(f)
        w.writerow(["id", "a", "b", "name"])
        w.writerow([1, 1.5, "", "x"])
        w.writerow([2, -2.25e3, "7", "quoted,comma"])
        w.writerow([3, "nan-ish", "8.125", "y"])
    m = native.read_numeric(path, [0, 1, 2])
    np.testing.assert_allclose(
        m, [[1, 1.5, 0.0], [2, -2250.0, 7.0], [3, 0.0, 8.125]])
    assert native.count_rows(path) == 3


def test_string_column_with_quotes(tmp_path):
    path = str(tmp_path / "s.csv")
    open(path, "w").write('h1,h2\n"a,b",c\nplain,d\n')
    got = native.read_strings(path, 0)
    assert got == ["a,b", "plain"]


@pytest.mark.skipif(not reference_available(), reason="reference data absent")
def test_native_table_ingest_equals_python():
    from ransac_tpu.io.tables import read_camera_locations, read_points_data

    f = os.path.join(REFERENCE_DIR, "feature_points_with_annotations.csv")
    c = os.path.join(REFERENCE_DIR, "potential_camera_locations.csv")

    fp = read_points_data(f, "Pixel_x_1898.jpg", "Pixel_y_1898.jpg",
                          use_native="never")
    fn = read_points_data(f, "Pixel_x_1898.jpg", "Pixel_y_1898.jpg",
                          use_native="always")
    assert fp.symbols == fn.symbols
    assert fp.names == fn.names
    np.testing.assert_allclose(fp.pixels, fn.pixels)
    np.testing.assert_allclose(fp.pos3d_utm, fn.pos3d_utm, atol=1e-9)

    cp = read_camera_locations(c, use_native="never")
    cn = read_camera_locations(c, use_native="always")
    np.testing.assert_array_equal(cp.grid_codes, cn.grid_codes)
    np.testing.assert_allclose(cp.pos3d_utm, cn.pos3d_utm, atol=1e-9)
