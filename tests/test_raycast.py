"""DEM ray-cast inversion: analytic intersections, correction-mode
semantics, boundary batch conversion, exports."""

import json

import jax.numpy as jnp
import numpy as np

from ransac_tpu.io import dem as demio
from ransac_tpu.io.export import (save_boundary_shapefiles, write_boundary_csv,
                                  write_geojson)
from ransac_tpu.ops import rotation
from ransac_tpu.ops.geodesy import SceneFrame
from ransac_tpu.pipelines import raycast
from ransac_tpu.utils.config import RaycastConfig


def flat_frame():
    return SceneFrame(anchor=np.array([739000.0, 2888000.0, 0.0]))


def camera_looking_down():
    """Camera 300 m up, looking 45 deg downward toward +x (east)."""
    K = np.array([[1000.0, 0, 500.0], [0, 1000.0, 500.0], [0, 0, 1.0]])
    # World->camera: camera z-axis points along (1,0,-1)/sqrt2 in world.
    # Build R s.t. R @ world_dir = [0,0,1] for the optical axis.
    fwd = np.array([1.0, 0.0, -1.0]) / np.sqrt(2)
    up_hint = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up_hint); right /= np.linalg.norm(right)
    down = np.cross(fwd, right) * -1.0
    Rwc = np.stack([right, -down, fwd])  # rows = camera axes in world
    origin = np.array([0.0, 0.0, 300.0])
    return K, Rwc, origin


def test_march_hits_flat_plane_analytically():
    frame = flat_frame()
    dem = demio.synthetic_dem(frame, extent_m=3000, spacing_m=5.0,
                              terrain_fn=lambda X, Y: np.zeros_like(X))
    K, R, origin = camera_looking_down()
    inv = raycast.GeoInverter(
        K=K, R=R, ray_origin=origin, dem=dem,
        control_pixels=np.array([[500.0, 500.0], [400, 400], [600, 600]]),
        control_pos3d=np.array([[300.0, 0, 0], [250, 40, 0], [350, -40, 0]]),
        cfg=RaycastConfig(correction="none", min_hit_step=0, step_m=1.0))
    # Center pixel: ray along (1,0,-1)/sqrt2 from (0,0,300) hits z=0 at
    # x=300.
    utm, hit = inv.pixel_to_geo(np.array([[500.0, 500.0]]))
    assert hit[0]
    local = utm[0] - frame.anchor
    assert abs(local[0] - 300.0) < 2.0, local
    assert abs(local[1]) < 1.0
    assert abs(local[2]) < 2.0


def test_march_min_hit_step_warmup():
    """Reference quirk (main_v1.py:650): with min_hit_step=150 a ray that
    would hit at step < 150 keeps going."""
    frame = flat_frame()
    dem = demio.synthetic_dem(frame, extent_m=3000, spacing_m=5.0,
                              terrain_fn=lambda X, Y: np.zeros_like(X))
    K, R, origin = camera_looking_down()
    origin_low = np.array([0.0, 0.0, 50.0])  # hits at ~70 steps
    base = dict(K=K, R=R, ray_origin=origin_low, dem=dem,
                control_pixels=np.array([[500.0, 500.0]]),
                control_pos3d=np.array([[300.0, 0, 0.0]]))
    inv0 = raycast.GeoInverter(
        cfg=RaycastConfig(correction="none", min_hit_step=0), **base)
    inv150 = raycast.GeoInverter(
        cfg=RaycastConfig(correction="none", min_hit_step=150), **base)
    utm0, hit0 = inv0.pixel_to_geo(np.array([[500.0, 500.0]]))
    utm150, hit150 = inv150.pixel_to_geo(np.array([[500.0, 500.0]]))
    assert hit0[0]
    x0 = utm0[0, 0] - frame.anchor[0]
    assert abs(x0 - 50.0) < 2.0
    if hit150[0]:  # warmup forces the hit to land at >= 150 steps
        x150 = utm150[0, 0] - frame.anchor[0]
        assert x150 >= 100.0


def test_batched_march_many_rays():
    frame = flat_frame()
    dem = demio.synthetic_dem(frame, extent_m=3000, spacing_m=5.0,
                              terrain_fn=lambda X, Y: np.zeros_like(X))
    K, R, origin = camera_looking_down()
    inv = raycast.GeoInverter(
        K=K, R=R, ray_origin=origin, dem=dem,
        control_pixels=np.array([[500.0, 500.0]]),
        control_pos3d=np.array([[300.0, 0, 0.0]]),
        cfg=RaycastConfig(correction="none", min_hit_step=0))
    pix = np.stack(np.meshgrid(np.linspace(300, 700, 9),
                               np.linspace(450, 650, 9)), -1).reshape(-1, 2)
    utm, hit = inv.pixel_to_geo(pix)
    assert hit.mean() > 0.9
    # Every hit must lie on the terrain surface (z ~ 0) within step size.
    z = utm[hit][:, 2] - frame.anchor[2]
    assert np.abs(z).max() < 2.0


def test_weights_semantics():
    q = jnp.asarray([[10.0, 10.0]])
    cps = jnp.asarray([[10.0, 12.0], [100.0, 100.0], [10.0, 10.0 + 0.5]])
    w = np.asarray(raycast.calculate_weights(q, cps, 1.0, 10.0))[0]
    # Nearest (idx 2, dist 0.5) -> 1/0.5 capped at 1.0, then x10.
    assert abs(w[2] - 10.0) < 1e-5
    assert abs(w[0] - 0.5) < 1e-5   # 1/2
    assert w[1] < 0.01               # far point tiny weight


def test_factors_identity_for_perfect_geometry():
    """With exact K, R, origin and control points ON their rays, the
    componentwise factors are ~1 and the corrected ray equals the raw
    ray."""
    K, R, origin = camera_looking_down()
    # Off-axis pixels: the center pixel's ray has a zero y-component, whose
    # ideal/computed ratio is 0/0 — the |f|>2 filter rejects it (the
    # reference would divide by ~0 there, main_v1.py:612).
    pix = np.array([[470.0, 530.0], [480.0, 520.0], [530.0, 470.0]])
    from ransac_tpu.ops import projection as proj

    rays = np.asarray(proj.pixel_to_ray(
        jnp.asarray(pix, jnp.float32), jnp.asarray(K, jnp.float32),
        jnp.asarray(R, jnp.float32)))
    cps = origin + rays * np.array([[400.0], [380.0], [420.0]])
    factors, valid = raycast.compute_optimization_factors(
        jnp.asarray(pix, jnp.float32), jnp.asarray(cps, jnp.float32),
        jnp.asarray(K, jnp.float32), jnp.asarray(R, jnp.float32),
        jnp.asarray(origin, jnp.float32))
    assert np.asarray(valid).all()
    np.testing.assert_allclose(np.asarray(factors), 1.0, atol=1e-3)


def test_lsq_scales_mode_matches_weighted_on_clean_data():
    frame = flat_frame()
    dem = demio.synthetic_dem(frame, extent_m=3000, spacing_m=5.0,
                              terrain_fn=lambda X, Y: np.zeros_like(X))
    K, R, origin = camera_looking_down()
    from ransac_tpu.ops import projection as proj

    pix_cp = np.array([[500.0, 500.0], [450, 540], [560, 460], [520, 530]])
    rays = np.asarray(proj.pixel_to_ray(
        jnp.asarray(pix_cp, jnp.float32), jnp.asarray(K, jnp.float32),
        jnp.asarray(R, jnp.float32)))
    cps = origin + rays * 400.0
    common = dict(K=K, R=R, ray_origin=origin, dem=dem,
                  control_pixels=pix_cp, control_pos3d=cps)
    inv_w = raycast.GeoInverter(cfg=RaycastConfig(
        correction="weighted_factors", min_hit_step=0), **common)
    inv_s = raycast.GeoInverter(cfg=RaycastConfig(
        correction="lsq_scales", min_hit_step=0), **common)
    q = np.array([[505.0, 512.0]])
    utm_w, hw = inv_w.pixel_to_geo(q)
    utm_s, hs = inv_s.pixel_to_geo(q)
    assert hw[0] and hs[0]
    assert np.linalg.norm(utm_w - utm_s) < 3.0


def test_boundary_conversion_and_exports(tmp_path):
    frame = flat_frame()
    dem = demio.synthetic_dem(frame, extent_m=3000, spacing_m=5.0,
                              terrain_fn=lambda X, Y: np.zeros_like(X))
    K, R, origin = camera_looking_down()
    inv = raycast.GeoInverter(
        K=K, R=R, ray_origin=origin, dem=dem,
        control_pixels=np.array([[500.0, 500.0]]),
        control_pos3d=np.array([[300.0, 0, 0.0]]),
        cfg=RaycastConfig(correction="none", min_hit_step=0))
    json_data = {
        "info": {"name": "synthetic"},
        "objects": [{
            "group": 1, "category": "__background__",
            "segmentation": [[400, 480], [600, 480], [600, 560], [400, 560]],
        }],
    }
    geo, pix = inv.convert_boundary(json_data)
    key = (1, "background")
    assert key in geo and len(geo[key]) == 4

    csv_path = tmp_path / "boundary_points_geo.csv"
    write_boundary_csv(str(csv_path), geo, pix)
    lines = open(csv_path).read().strip().splitlines()
    assert len(lines) == 5 and lines[0].startswith("category,group")

    gj = tmp_path / "boundary.geojson"
    write_geojson(str(gj), geo)
    doc = json.load(open(gj))
    assert doc["features"][0]["geometry"]["type"] == "Polygon"

    shp_files = save_boundary_shapefiles(geo, str(tmp_path / "shp"), "synthetic")
    assert len(shp_files) == 1
    import os

    base = shp_files[0][:-4]
    for ext in (".shp", ".shx", ".dbf", ".prj"):
        assert os.path.exists(base + ext), ext


def test_geotiff_roundtrip(tmp_path):
    """load_geotiff reads back a PIL-written GeoTIFF with geo tags."""
    from PIL import Image, TiffImagePlugin

    data = np.linspace(0, 100, 50 * 40).reshape(50, 40).astype(np.float32)
    path = str(tmp_path / "dem.tif")
    info = TiffImagePlugin.ImageFileDirectory_v2()
    info[33550] = (0.001, 0.001, 0.0)          # ModelPixelScale
    info[33922] = (0.0, 0.0, 0.0, 119.3, 26.12, 0.0)  # ModelTiepoint
    Image.fromarray(data).save(path, tiffinfo=info)
    dem = demio.load_geotiff(path)
    assert dem.data.shape == (50, 40)
    assert abs(dem.lon[0] - 119.3) < 1e-9
    # Row 0 is the northernmost (lat0), stored ascending after load.
    assert dem.lat[-1] == max(dem.lat)
    e_rng = dem.utm_x_range
    assert 7.2e5 < e_rng[0] < 7.6e5


def test_utm_resample_consistency():
    """Resampled UTM grid agrees with direct lon/lat interpolation."""
    frame = SceneFrame(anchor=np.array([739000.0, 2888500.0, 0.0]))
    lon = np.linspace(119.37, 119.41, 80)
    lat = np.linspace(26.08, 26.12, 90)
    LON, LAT = np.meshgrid(lon, lat)
    z = (np.sin(LON * 200) * 50 + np.cos(LAT * 300) * 30 + 700).astype(np.float32)
    dem_ll = demio.from_arrays(z, lon, lat)
    dem_utm = demio.resample_to_utm(dem_ll, frame, spacing_m=20.0)
    # Compare at a few interior points.
    from ransac_tpu.ops.geodesy import wgs84_to_utm

    rng = np.random.default_rng(0)
    for _ in range(20):
        lo = rng.uniform(119.38, 119.40)
        la = rng.uniform(26.09, 26.11)
        e, n = wgs84_to_utm(lo, la)
        z_ll = float(dem_ll.interpolate(la, lo))
        z_utm = float(demio.bilinear_sample(
            jnp.asarray(dem_utm.data), dem_utm.x0, dem_utm.y0,
            dem_utm.dx, dem_utm.dy,
            jnp.float32(e - frame.anchor[0]), jnp.float32(n - frame.anchor[1])))
        assert abs(z_ll - z_utm) < 3.0, (z_ll, z_utm)


def test_undistort_image_round_features():
    import cv2

    from ransac_tpu.models.calibration import undistort_image

    rng = np.random.default_rng(3)
    img = rng.random((120, 160)).astype(np.float32)
    K = np.array([[150.0, 0, 80.0], [0, 150.0, 60.0], [0, 0, 1.0]])
    dist = np.array([-0.2, 0.05, 0.0, 0.0, 0.0])
    mine = np.asarray(undistort_image(jnp.asarray(img), jnp.asarray(K),
                                      jnp.asarray(dist)))
    cv = cv2.undistort(img, K, dist)
    # Interior agreement (borders differ by OpenCV's edge handling).
    diff = np.abs(mine[20:-20, 20:-20] - cv[20:-20, 20:-20])
    assert np.median(diff) < 0.02, np.median(diff)


def test_polygon_interior_elevations():
    frame = flat_frame()
    dem = demio.synthetic_dem(
        frame, extent_m=500, spacing_m=10.0,
        terrain_fn=lambda X, Y: 0.01 * X + 100.0)
    poly = np.array([[0.0, 0.0], [200.0, 0.0], [200.0, 200.0], [0.0, 200.0]])
    pts = demio.polygon_interior_elevations(dem, poly, spacing_m=25.0)
    assert len(pts) > 20
    assert (pts[:, 0] >= 0).all() and (pts[:, 0] <= 200).all()
    np.testing.assert_allclose(pts[:, 2], 0.01 * pts[:, 0] + 100.0, atol=0.5)


def test_march_chunk_invariance():
    """Chunked marching (one [R*chunk] gather per while_loop trip) must be
    bit-identical to the single-step reference semantics (chunk=1), incl.
    the min_hit_step warmup, out-of-bounds exits, and the step budget."""
    frame = flat_frame()
    dem = demio.synthetic_dem(
        frame, extent_m=800, spacing_m=5.0,
        terrain_fn=lambda X, Y: 40.0 * np.sin(X / 90.0) * np.cos(Y / 70.0))
    rng = np.random.default_rng(7)
    n = 64
    origins = np.zeros((n, 3), np.float32)
    origins[:, 2] = 250.0
    az = rng.uniform(0, 2 * np.pi, n)
    el = rng.uniform(-0.9, -0.1, n)  # some rays exit the footprint
    dirs = np.stack([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az),
                     np.sin(el)], 1).astype(np.float32)
    args = (jnp.asarray(origins), jnp.asarray(dirs), *dem.device_arrays())
    kw = dict(max_steps=900, step=1.0, min_hit_step=150)
    pos1, hit1 = raycast.march_rays(*args, chunk=1, **kw)
    for chunk in (7, 64, 256):
        posc, hitc = raycast.march_rays(*args, chunk=chunk, **kw)
        np.testing.assert_array_equal(np.asarray(hit1), np.asarray(hitc))
        sel = np.asarray(hit1)
        # Positions agree to f32 accumulation error (chunk=1 accumulates
        # step-by-step additions; chunked forms k*step*dir products) —
        # except rays grazing the surface, whose hit step may shift by one
        # between the two rounding paths (bounded by one step length).
        d = np.linalg.norm(np.asarray(pos1)[sel] - np.asarray(posc)[sel],
                           axis=1)
        assert np.quantile(d, 0.9) < 2e-2, d
        assert d.max() < 1.5 * kw["step"], d
    assert np.asarray(hit1).any() and not np.asarray(hit1).all()


def test_march_mip_matches_plain():
    """Coarse-to-fine mip march must reproduce the plain march exactly:
    same hit masks, same hit step (positions are exact origin + i*step*dir
    in the mip path, so agreement is within one step length)."""
    frame = flat_frame()
    dem = demio.synthetic_dem(
        frame, extent_m=900, spacing_m=5.0,
        terrain_fn=lambda X, Y: 35.0 * np.sin(X / 110.0) * np.cos(Y / 85.0)
        + 0.01 * X)
    rng = np.random.default_rng(11)
    n = 96
    origins = np.zeros((n, 3), np.float32)
    origins[:, 2] = 220.0
    az = rng.uniform(0, 2 * np.pi, n)
    el = rng.uniform(-0.9, -0.05, n)
    dirs = np.stack([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az),
                     np.sin(el)], 1).astype(np.float32)
    args = (jnp.asarray(origins), jnp.asarray(dirs), *dem.device_arrays())
    for warmup in (0, 150):
        kw = dict(max_steps=1200, step=1.0, min_hit_step=warmup)
        pos_p, hit_p = raycast.march_rays(*args, chunk=1, **kw)
        pos_m, hit_m = raycast.march_rays_mip(
            *args, pool=8, seg_steps=32, lookahead=16, **kw)
        np.testing.assert_array_equal(np.asarray(hit_p), np.asarray(hit_m))
        sel = np.asarray(hit_p)
        d = np.linalg.norm(np.asarray(pos_p)[sel] - np.asarray(pos_m)[sel],
                           axis=1)
        # identical hit step modulo the two paths' f32 rounding
        assert d.max() < 1.5 * kw["step"], d.max()
        assert np.quantile(d, 0.9) < 2e-2, d
    assert np.asarray(hit_p).any() and not np.asarray(hit_p).all()


def test_packed_bilinear_matches_plain():
    """Quad-packed one-gather bilinear == the 4-gather reference sampler,
    and both march kernels give identical results through it."""
    rng = np.random.default_rng(11)
    for h, w in ((33, 47), (64, 64)):
        data = rng.standard_normal((h, w)).astype(np.float32) * 10 + 100
        pack = demio.pack_bilinear(data)
        x0, y0, dx, dy = -50.0, -40.0, 2.0, 1.5
        x = jnp.asarray(rng.uniform(-60, x0 + dx * (w - 1) + 10, 500)
                        .astype(np.float32))
        y = jnp.asarray(rng.uniform(-50, y0 + dy * (h - 1) + 10, 500)
                        .astype(np.float32))
        a = np.asarray(demio.bilinear_sample(
            jnp.asarray(data), x0, y0, dx, dy, x, y))
        b = np.asarray(demio.bilinear_sample_packed(
            pack, h, w, x0, y0, dx, dy, x, y))
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-4)

    # March parity on rolling terrain.
    frame = flat_frame()
    gh, gw = 96, 96
    xs = np.linspace(-400, 400, gw)
    ys = np.linspace(-400, 400, gh)
    zz = (40 * np.sin(xs[None, :] / 60.0) * np.cos(ys[:, None] / 80.0)
          + 100).astype(np.float32)
    dem = demio.DemUtm(data=zz, x0=float(xs[0]), y0=float(ys[0]),
                       dx=float(xs[1] - xs[0]), dy=float(ys[1] - ys[0]),
                       frame=frame)
    pack = demio.pack_bilinear(dem.data)
    n = 64
    rng2 = np.random.default_rng(2)
    origins = np.zeros((n, 3), np.float32)
    origins[:, 2] = 220.0
    az = rng2.uniform(0, 2 * np.pi, n)
    el = rng2.uniform(-0.9, -0.05, n)
    dirs = np.stack([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az),
                     np.sin(el)], 1).astype(np.float32)
    args = (jnp.asarray(origins), jnp.asarray(dirs), *dem.device_arrays())
    kw = dict(max_steps=1200, step=1.0, min_hit_step=0)
    pos_a, hit_a = raycast.march_rays(*args, **kw)
    pos_b, hit_b = raycast.march_rays(*args, dem_pack=pack, **kw)
    np.testing.assert_array_equal(np.asarray(hit_a), np.asarray(hit_b))
    np.testing.assert_allclose(np.asarray(pos_a), np.asarray(pos_b),
                               atol=1e-3)
    pos_c, hit_c = raycast.march_rays_mip(*args, pool=8, seg_steps=32, **kw)
    pos_d, hit_d = raycast.march_rays_mip(*args, pool=8, seg_steps=32,
                                          dem_pack=pack, **kw)
    np.testing.assert_array_equal(np.asarray(hit_c), np.asarray(hit_d))
    np.testing.assert_allclose(np.asarray(pos_c), np.asarray(pos_d),
                               atol=1e-3)


def test_second_mip_level_matches_single_level():
    """The level-2 super-segment skip (pool2 > 0) must be an exact
    optimization: same hits, same stop positions as the single-level
    march on rugged terrain with a mix of hitting and sky rays."""
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    frame = flat_frame()
    dem = demio.synthetic_dem(
        frame, extent_m=4000, spacing_m=10.0,
        terrain_fn=lambda X, Y: 40.0 * np.sin(X / 180.0)
        * np.cos(Y / 230.0) + 25.0 * np.sin((X + Y) / 97.0))
    origins = jnp.asarray(
        np.repeat([[0.0, 0.0, 120.0]], 64, 0), jnp.float32)
    d = rng.normal(size=(64, 3))
    d[:, 2] = -np.abs(d[:, 2]) * 0.15
    d[16:32, 2] = np.abs(d[16:32, 2]) * 0.05   # sky rays (never hit)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirs = jnp.asarray(d, jnp.float32)
    arrs = dem.device_arrays()
    kw = dict(max_steps=4000, step=1.0, min_hit_step=0, pool=8,
              seg_steps=32, lookahead=16)
    p1, h1 = raycast.march_rays_mip(origins, dirs, *arrs, **kw, pool2=0)
    p2, h2 = raycast.march_rays_mip(origins, dirs, *arrs, **kw,
                                    pool2=64, lookahead2=8)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-3)
    assert np.asarray(h1).any() and not np.asarray(h1).all()


def test_compact_march_matches_mip():
    """The staged active-ray-compacting march returns bit-identical hit
    masks and stop steps to the single-loop mip march (the compaction
    only reorders which rays march together; every per-ray decision is
    a pure function of the ray and its global step index)."""
    frame = flat_frame()
    dem = demio.synthetic_dem(
        frame, extent_m=900, spacing_m=5.0,
        terrain_fn=lambda X, Y: 35.0 * np.sin(X / 110.0) * np.cos(Y / 85.0)
        + 0.01 * X)
    rng = np.random.default_rng(13)
    n = 128
    origins = np.zeros((n, 3), np.float32)
    origins[:, 2] = 220.0
    az = rng.uniform(0, 2 * np.pi, n)
    # mixed: downward (hit), upward (sky), near-horizontal (graze)
    el = np.concatenate([rng.uniform(-0.9, -0.1, n // 2),
                         rng.uniform(0.05, 0.5, n // 4),
                         rng.uniform(-0.02, 0.02, n - n // 2 - n // 4)])
    dirs = np.stack([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az),
                     np.sin(el)], 1).astype(np.float32)
    args = (jnp.asarray(origins), jnp.asarray(dirs), *dem.device_arrays())
    kw = dict(max_steps=1500, step=1.0, min_hit_step=150, pool=8,
              seg_steps=32, lookahead=16)
    pos_m, hit_m = raycast.march_rays_mip(*args, **kw)
    pos_c, hit_c = raycast.march_rays_mip_compact(*args, stages=(4, 16),
                                                  **kw)
    np.testing.assert_array_equal(np.asarray(hit_m), np.asarray(hit_c))
    np.testing.assert_allclose(np.asarray(pos_m), np.asarray(pos_c),
                               atol=1e-4)
