"""Robust GeoTIFF ingest tests (VERDICT r1 missing #6 / next-steps #8).

A hand-rolled TIFF writer produces the raster variants GDAL emits for real
DEM products — tiled + Deflate with predictors, nodata, south-up, full
ModelTransformation — and ``ransac_tpu.io.tiff`` / ``load_geotiff`` must
read them all back exactly.  (The reference gets this via GDAL,
``/root/reference/main_v1.py:425-433``.)
"""

import struct
import zlib

import numpy as np
import pytest

from ransac_tpu.io import dem as demio
from ransac_tpu.io import tiff as tifflib


def _packbits_encode(row: bytes) -> bytes:
    # Literal-only PackBits (valid, if not maximally compressed).
    out = bytearray()
    for i in range(0, len(row), 128):
        chunk = row[i:i + 128]
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


def _predict(block: np.ndarray, predictor: int) -> bytes:
    """block: [rows, cols] native-dtype array -> encoded bytes."""
    if predictor == 1:
        return block.tobytes()
    if predictor == 2:
        d = block.copy()
        d[:, 1:] = block[:, 1:] - block[:, :-1]
        return d.tobytes()
    if predictor == 3:
        rows, cols = block.shape
        be = np.frombuffer(
            block.astype(block.dtype.newbyteorder(">")).tobytes(),
            np.uint8).reshape(rows, cols, block.dtype.itemsize)
        planes = np.transpose(be, (0, 2, 1)).reshape(rows, -1)
        d = planes.copy()
        d[:, 1:] = planes[:, 1:] - planes[:, :-1]
        return d.tobytes()
    raise ValueError(predictor)


def write_tiff(path, arr: np.ndarray, *, tile=None, compression=1,
               predictor=1, nodata=None, geo="scale",
               origin=(119.3, 26.12), scale=(0.001, 0.001),
               south_up=False, byteorder="<"):
    """Minimal classic-TIFF writer for test fixtures."""
    arr = np.ascontiguousarray(arr)
    h, w = arr.shape
    kind = {"u": 1, "i": 2, "f": 3}[arr.dtype.kind]
    bits = arr.dtype.itemsize * 8
    bo = byteorder
    arr_bo = arr.astype(arr.dtype.newbyteorder(bo))

    def compress(block: np.ndarray) -> bytes:
        if predictor == 3:
            raw = _predict(block, 3)
        elif predictor == 2:
            raw = _predict(block_int(block), 2)
        else:
            raw = block.astype(block.dtype.newbyteorder(bo)).tobytes()
        if compression in (8, 32946):
            return zlib.compress(raw)
        if compression == 32773:
            return _packbits_encode(raw)
        if compression == 1:
            return raw
        raise ValueError(compression)

    def block_int(block):
        return block.astype(arr.dtype.newbyteorder(bo))

    blocks = []
    if tile:
        tw, th = tile
        for r0 in range(0, h, th):
            for c0 in range(0, w, tw):
                t = np.zeros((th, tw), arr.dtype)
                sub = arr_bo[r0:r0 + th, c0:c0 + tw]
                t[:sub.shape[0], :sub.shape[1]] = sub
                blocks.append(compress(t))
    else:
        rps = max(h // 3, 1)
        for r0 in range(0, h, rps):
            blocks.append(compress(arr_bo[r0:r0 + rps]))

    data = bytearray()
    data += struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM", 42, 0)
    offsets = []
    for b in blocks:
        offsets.append(len(data))
        data += b
        if len(data) % 2:
            data += b"\0"

    entries = []  # (tag, type, count, packed_values_bytes)

    def add(tag, typ, values):
        entries.append((tag, typ, values))

    add(256, 4, [w])
    add(257, 4, [h])
    add(258, 3, [bits])
    add(259, 3, [compression])
    add(262, 3, [1])
    add(277, 3, [1])
    add(339, 3, [kind])
    if predictor != 1:
        add(317, 3, [predictor])
    if tile:
        add(322, 3, [tile[0]])
        add(323, 3, [tile[1]])
        add(324, 4, offsets)
        add(325, 4, [len(b) for b in blocks])
    else:
        add(273, 4, offsets)
        add(278, 4, [max(h // 3, 1)])
        add(279, 4, [len(b) for b in blocks])
    dlat = scale[1] if south_up else -scale[1]
    if geo == "scale":
        add(33550, 12, [scale[0], abs(scale[1]), 0.0])
        # GeoTIFF convention: positive ModelPixelScale sy means north-up;
        # a south-up fixture uses the transform matrix form instead.
        add(33922, 12, [0.0, 0.0, 0.0, origin[0], origin[1], 0.0])
        if south_up:
            raise ValueError("use geo='transform' for south-up fixtures")
    else:
        m = [scale[0], 0.0, 0.0, origin[0],
             0.0, dlat, 0.0, origin[1],
             0.0, 0.0, 0.0, 0.0,
             0.0, 0.0, 0.0, 1.0]
        add(34264, 12, m)
    if nodata is not None:
        add(42113, 2, str(nodata).encode() + b"\0")

    # Lay out out-of-line values after data, then the IFD.
    fmt_for = {3: "H", 4: "I", 12: "d"}
    packed = []
    for tag, typ, values in sorted(entries):
        if typ == 2:
            raw = bytes(values)
            count = len(raw)
        else:
            raw = b"".join(struct.pack(bo + fmt_for[typ], v)
                           for v in values)
            count = len(values)
        packed.append((tag, typ, count, raw))
    value_offsets = {}
    for tag, typ, count, raw in packed:
        if len(raw) > 4:
            if len(data) % 2:
                data += b"\0"
            value_offsets[tag] = len(data)
            data += raw
    if len(data) % 2:
        data += b"\0"
    ifd_off = len(data)
    data += struct.pack(bo + "H", len(packed))
    for tag, typ, count, raw in packed:
        data += struct.pack(bo + "HHI", tag, typ, count)
        if len(raw) > 4:
            data += struct.pack(bo + "I", value_offsets[tag])
        else:
            data += raw + b"\0" * (4 - len(raw))
    data += struct.pack(bo + "I", 0)
    struct.pack_into(bo + "I", data, 4, ifd_off)
    with open(path, "wb") as f:
        f.write(data)


def _terrain(h=45, w=38, dtype=np.float32):
    r = np.arange(h)[:, None]
    c = np.arange(w)[None, :]
    z = 700 + 40 * np.sin(r / 7.0) + 25 * np.cos(c / 5.0) + 0.1 * r * c % 9
    return z.astype(dtype)


def test_tiled_deflate_predictor2_int16(tmp_path):
    z = (_terrain() * 10).astype(np.int16)
    p = str(tmp_path / "t.tif")
    write_tiff(p, z, tile=(16, 16), compression=8, predictor=2)
    out, tags = tifflib.read_tiff(p)
    np.testing.assert_array_equal(out, z)


def test_tiled_deflate_predictor3_float32(tmp_path):
    z = _terrain()
    p = str(tmp_path / "t.tif")
    write_tiff(p, z, tile=(32, 16), compression=8, predictor=3)
    out, tags = tifflib.read_tiff(p)
    np.testing.assert_array_equal(out, z)


def test_strips_packbits_uint16_bigendian(tmp_path):
    z = (_terrain() * 5).astype(np.uint16)
    p = str(tmp_path / "t.tif")
    write_tiff(p, z, compression=32773, byteorder=">")
    out, tags = tifflib.read_tiff(p)
    np.testing.assert_array_equal(out, z)


def test_lzw_strips_pil_written(tmp_path):
    from PIL import Image

    z = (_terrain() % 251).astype(np.uint8)
    p = str(tmp_path / "t.tif")
    Image.fromarray(z).save(p, compression="tiff_lzw")
    out, tags = tifflib.read_tiff(p)
    np.testing.assert_array_equal(out, z)


def test_nodata_masked_to_nan(tmp_path):
    z = _terrain()
    z[3:6, 4:9] = -9999.0
    p = str(tmp_path / "t.tif")
    write_tiff(p, z, tile=(16, 16), compression=8, nodata=-9999.0)
    dem = demio.load_geotiff(p)
    # load flips to ascending lat; count NaNs irrespective of row order.
    assert np.isnan(dem.data).sum() == 15
    assert not np.isnan(dem.data[-1, -1])


def test_south_up_model_transform(tmp_path):
    """South-up raster (dlat > 0 in the transform matrix): row 0 is the
    SOUTHERNMOST; from_arrays must keep lat ascending without flipping."""
    z = _terrain()
    p = str(tmp_path / "t.tif")
    write_tiff(p, z, compression=8, geo="transform", south_up=True,
               origin=(119.3, 26.05))
    dem = demio.load_geotiff(p)
    assert dem.lat[0] == pytest.approx(26.05)
    assert dem.lat[-1] > dem.lat[0]
    np.testing.assert_allclose(dem.data, z, rtol=0, atol=0)


def test_north_up_vs_south_up_same_surface(tmp_path):
    """The same physical surface written north-up and south-up loads to
    identical DemLonLat grids."""
    z = _terrain()
    pn = str(tmp_path / "n.tif")
    ps = str(tmp_path / "s.tif")
    # North-up: row 0 at max lat.
    write_tiff(pn, z, compression=8, geo="transform", south_up=False,
               origin=(119.3, 26.05 + 0.001 * (z.shape[0] - 1)))
    write_tiff(ps, z[::-1].copy(), compression=8, geo="transform",
               south_up=True, origin=(119.3, 26.05))
    dn = demio.load_geotiff(pn)
    ds = demio.load_geotiff(ps)
    np.testing.assert_allclose(dn.lat, ds.lat, atol=1e-12)
    np.testing.assert_allclose(dn.data, ds.data)


def test_rotated_transform_rejected(tmp_path):
    z = _terrain()
    p = str(tmp_path / "t.tif")
    write_tiff(p, z, compression=8, geo="transform")
    # Patch a rotation term into the matrix on disk is fiddly; exercise
    # geotransform() directly instead.
    tags = {34264: (0.001, 5e-4, 0.0, 119.3,
                    2e-4, -0.001, 0.0, 26.12,
                    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0)}
    with pytest.raises(ValueError, match="rotated"):
        tifflib.geotransform(tags)


def test_legacy_deflate_code_32946(tmp_path):
    z = _terrain()
    p = str(tmp_path / "t.tif")
    write_tiff(p, z, compression=32946)
    out, _ = tifflib.read_tiff(p)
    np.testing.assert_array_equal(out, z)


def test_load_geotiff_full_pipeline_compatible(tmp_path):
    """A tiled+deflate+predictor3 DEM feeds resample_to_utm unchanged."""
    lon0, lat_top = 119.37, 26.12
    h, w = 60, 70
    z = _terrain(h, w)
    p = str(tmp_path / "dem.tif")
    write_tiff(p, z, tile=(32, 32), compression=8, predictor=3,
               origin=(lon0, lat_top), scale=(0.0005, 0.0005))
    dem = demio.load_geotiff(p)
    assert dem.data.shape == (h, w)
    # Interpolation at the grid points reproduces the raster (row flip).
    v = float(dem.interpolate(lat_top - 0.0005 * 2, lon0 + 0.0005 * 3))
    assert v == pytest.approx(float(z[2, 3]), abs=1e-3)


def test_srational_signed_and_zero_denominator():
    """ADVICE r2: SRATIONAL must divide by the SIGNED denominator (a
    negative denominator flips the quotient's sign) and a zero
    denominator must skip the tag rather than clamp to 1."""
    # Hand-build one little-endian classic IFD with three out-of-line
    # rational tags; data area starts at byte 64.
    buf = bytearray(96)
    struct.pack_into("<H", buf, 0, 3)  # 3 entries
    for i, (tag, typ, voff) in enumerate(
            [(100, 10, 64), (101, 10, 72), (102, 5, 80)]):
        struct.pack_into("<HHII", buf, 2 + 12 * i, tag, typ, 1, voff)
    struct.pack_into("<I", buf, 2 + 36, 0)      # next IFD
    struct.pack_into("<ii", buf, 64, -3, -2)    # -3/-2 = 1.5
    struct.pack_into("<ii", buf, 72, 5, 0)      # zero denominator
    struct.pack_into("<II", buf, 80, 7, 2)      # 7/2 = 3.5
    entries, nxt = tifflib._read_ifd_entries(bytes(buf), 0, "<", False)
    assert entries[100] == (1.5,)
    assert 101 not in entries
    assert entries[102] == (3.5,)
    assert nxt == 0
