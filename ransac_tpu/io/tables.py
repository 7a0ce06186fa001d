"""Host-side CSV ingest: feature landmarks and candidate camera grids.

Struct-of-arrays replacement for the reference's list-of-dict ``recs``
(``/root/reference/main_v1.py:689-762``).  All absolute UTM stays float64 on
host; device tensors are produced scene-centered float32 through
``geodesy.SceneFrame`` (SURVEY.md §7.1 coordinate hygiene).

Two schemas:
- ``kuliang`` (main_v1.py:689-729): header-addressed ``Pixel_x_<image>``
  columns, WGS84 lon/lat -> UTM, z from elevation (or height+elevation,
  test_pro.py:725), skip rows whose pixel is (0,0) (main_v1.py:711), empty
  numeric cells read as 0.0 (the committed CSV has empty Height/Elevation
  cells which would crash the reference's bare ``float(row[3])``).
- ``planar`` (process.py:297-348): symbol at column 6, already-planar
  coordinates, no geodesy; camera pos3d stored as [height, x, y].
"""

from __future__ import annotations

import csv
from dataclasses import dataclass, field

import numpy as np

from ransac_tpu.ops.geodesy import GeoTransformer, SceneFrame


def _f(cell: str) -> float:
    cell = (cell or "").strip()
    if not cell:
        return 0.0
    return float(cell)


@dataclass
class FeatureTable:
    symbols: list[str]
    names: list[str]
    pixels: np.ndarray        # [N,2] f64 (annotated pixel, already /scale)
    pos3d_utm: np.ndarray     # [N,3] f64 (easting, northing, z)
    lonlat: np.ndarray        # [N,2] f64 (lon, lat); zeros for planar schema
    heights: np.ndarray       # [N] f64 raw Height column
    elevations: np.ndarray    # [N] f64 raw Elevation column

    def __len__(self) -> int:
        return len(self.symbols)

    @property
    def point_mask(self) -> np.ndarray:
        """Annotated-pixel mask: matches the reference's good[i] test
        (main_v1.py:307) — pixel != (0,0)."""
        return (np.abs(self.pixels) > 0).any(axis=1)


@dataclass
class CameraTable:
    grid_codes: np.ndarray    # [C] int
    pos3d_utm: np.ndarray     # [C,3] f64 (easting, northing, z+observer)
    lonlat: np.ndarray        # [C,2] f64

    def __len__(self) -> int:
        return len(self.grid_codes)


def _native_ok(use_native) -> bool:
    if use_native == "never":
        return False
    from ransac_tpu.io import native

    ok = native.available()
    if use_native == "always" and not ok:
        raise RuntimeError("native fastio requested but libfastio.so is "
                           "not built (make -C native)")
    return ok


def read_points_data(
    filename: str,
    pixel_x: str,
    pixel_y: str,
    scale: float = 1.0,
    z_mode: str = "elevation",
    schema: str = "kuliang",
    zone: int = 50,
    keep_unannotated: bool = False,
    use_native: str = "auto",
) -> FeatureTable:
    """Parse the features CSV.

    ``z_mode``: 'elevation' (main_v1.py:718) or 'height_plus_elevation'
    (test_pro.py:725).  ``keep_unannotated=True`` keeps (0,0)-pixel rows
    (the reference drops them at ingest, main_v1.py:711-712; keeping them
    enables the unannotated-feature forward projection of
    main_v1.py:368-383).
    """
    tr = GeoTransformer(zone=zone)
    symbols, names = [], []
    pixels, pos3d, lonlat, heights, elevations = [], [], [], [], []
    with open(filename, encoding="utf-8-sig") as f:
        header = next(csv.reader(f))
    ix = header.index(pixel_x)
    iy = header.index(pixel_y)

    if schema == "kuliang" and _native_ok(use_native):
        # Native single-pass parse (native/fastio.cpp via ctypes); the
        # Python loop below remains the reference/fallback path.
        from ransac_tpu.io import native

        num = native.read_numeric(filename, [3, 4, 5, 6, ix, iy])
        syms = native.read_strings(filename, 1)
        nams = native.read_strings(filename, 2)
        for i in range(num.shape[0]):
            hgt, lon, lat, elev, px, py = num[i]
            pix = np.array([px, py]) / scale
            if not keep_unannotated and pix[0] == 0 and pix[1] == 0:
                continue
            easting, northing = tr.wgs84_to_utm(lon, lat)
            z = elev if z_mode == "elevation" else hgt + elev
            symbols.append(syms[i])
            names.append(nams[i])
            pixels.append(pix)
            pos3d.append(np.array([easting, northing, z]))
            lonlat.append(np.array([lon, lat]))
            heights.append(hgt)
            elevations.append(elev)
        return FeatureTable(
            symbols=symbols, names=names,
            pixels=np.array(pixels, dtype=np.float64).reshape(-1, 2),
            pos3d_utm=np.array(pos3d, dtype=np.float64).reshape(-1, 3),
            lonlat=np.array(lonlat, dtype=np.float64).reshape(-1, 2),
            heights=np.array(heights, dtype=np.float64),
            elevations=np.array(elevations, dtype=np.float64),
        )

    with open(filename, encoding="utf-8-sig") as f:
        rows = list(csv.reader(f))
    for row in rows[1:]:
        if not row or not row[0].strip():
            continue
        if schema == "planar":
            # process.py:311-314: symbol row[6], name row[1],
            # pos3d=[x,y,height+?]; z = row[5] + row[2].
            sym = row[6]
            name = row[1]
            pix = np.array([_f(row[ix]), _f(row[iy])]) / scale
            z = _f(row[5]) + _f(row[2])
            p3 = np.array([_f(row[3]), _f(row[4]), z])
            ll = np.zeros(2)
            h, e = _f(row[2]), _f(row[5])
        else:
            sym = row[1]
            name = row[2]
            pix = np.array([_f(row[ix]), _f(row[iy])]) / scale
            lon, lat = _f(row[4]), _f(row[5])
            elev = _f(row[6])
            hgt = _f(row[3])
            easting, northing = tr.wgs84_to_utm(lon, lat)
            z = elev if z_mode == "elevation" else hgt + elev
            p3 = np.array([easting, northing, z])
            ll = np.array([lon, lat])
            h, e = hgt, elev
        if not keep_unannotated and pix[0] == 0 and pix[1] == 0:
            continue
        symbols.append(sym)
        names.append(name)
        pixels.append(pix)
        pos3d.append(p3)
        lonlat.append(ll)
        heights.append(h)
        elevations.append(e)
    return FeatureTable(
        symbols=symbols, names=names,
        pixels=np.array(pixels, dtype=np.float64).reshape(-1, 2),
        pos3d_utm=np.array(pos3d, dtype=np.float64).reshape(-1, 3),
        lonlat=np.array(lonlat, dtype=np.float64).reshape(-1, 2),
        heights=np.array(heights, dtype=np.float64),
        elevations=np.array(elevations, dtype=np.float64),
    )


def read_camera_locations(
    filename: str,
    observer_height: float = 2.0,
    schema: str = "kuliang",
    zone: int = 50,
    use_native: str = "auto",
) -> CameraTable:
    """Parse the candidate-camera CSV (main_v1.py:734-762): grid_code col 1,
    lon col 2, lat col 3, elevation col 4, +observer_height meters."""
    tr = GeoTransformer(zone=zone)
    if schema == "kuliang" and _native_ok(use_native):
        from ransac_tpu.io import native

        num = native.read_numeric(filename, [1, 2, 3, 4])
        easting, northing = tr.wgs84_to_utm(num[:, 1], num[:, 2])
        return CameraTable(
            grid_codes=num[:, 0].astype(np.int32),
            pos3d_utm=np.stack(
                [easting, northing, num[:, 3] + observer_height], axis=1),
            lonlat=num[:, 1:3].copy(),
        )
    grid_codes, pos3d, lonlat = [], [], []
    with open(filename, encoding="utf-8-sig") as f:
        rows = list(csv.reader(f))
    for row in rows[1:]:
        if not row or not row[0].strip():
            continue
        if schema == "planar":
            # process.py:341-343: grid row[2], z row[5]+obs,
            # pos3d=[height, x, y] reordered here to [x, y, z].
            gc = int(_f(row[2]))
            z = _f(row[5]) + observer_height
            p3 = np.array([_f(row[3]), _f(row[4]), z])
            ll = np.zeros(2)
        else:
            gc = int(_f(row[1]))
            lon, lat = _f(row[2]), _f(row[3])
            z = _f(row[4]) + observer_height
            easting, northing = tr.wgs84_to_utm(lon, lat)
            p3 = np.array([easting, northing, z])
            ll = np.array([lon, lat])
        grid_codes.append(gc)
        pos3d.append(p3)
        lonlat.append(ll)
    return CameraTable(
        grid_codes=np.array(grid_codes, dtype=np.int32),
        pos3d_utm=np.array(pos3d, dtype=np.float64).reshape(-1, 3),
        lonlat=np.array(lonlat, dtype=np.float64).reshape(-1, 2),
    )


@dataclass
class Scene:
    """Device-ready, scene-centered view of one localization problem."""

    features: FeatureTable
    cameras: CameraTable
    frame: SceneFrame
    pixels: np.ndarray     # [N,2] f32
    pos3d: np.ndarray      # [N,3] f32 centered
    point_mask: np.ndarray  # [N] f32
    cam_locs: np.ndarray   # [C,3] f32 centered
    grid_codes: np.ndarray  # [C] i32


def build_scene(features: FeatureTable, cameras: CameraTable,
                zone: int = 50) -> Scene:
    anchor_src = np.concatenate([features.pos3d_utm, cameras.pos3d_utm], 0)
    frame = SceneFrame.from_points(anchor_src, zone=zone)
    return Scene(
        features=features, cameras=cameras, frame=frame,
        pixels=features.pixels.astype(np.float32),
        pos3d=frame.center(features.pos3d_utm),
        point_mask=features.point_mask.astype(np.float32),
        cam_locs=frame.center(cameras.pos3d_utm),
        grid_codes=cameras.grid_codes,
    )
