"""Binary codecs: 16-bit grayscale PNG, RGBA8 PNG, HGT, XTH.

Parity with the reference is at the **decoded-pixel** level (SURVEY.md
§2.1 S4/S5): we use zlib + numpy instead of re-implementing Demeton's
from-scratch PNG pipeline, but the height↔uint16 mapping, HGT row
order/overlap and XTH bit packing are bit-exact.

Reference semantics (file:line in /root/reference):
  - height↔uint16 (+offset, 0=missing): Demeton/Srtm/Png.fs:14-39
  - PNG container (sig/IHDR/IDAT/IEND):  Demeton/Png/File.fs:19-53,
                                         Demeton/Png/Chunks.fs:21-213
  - scanline filters (we emit Up, decode all 5): Demeton/Png/Filters.fs:36-120
  - HGT big-endian, north-first rows, 1-px overlap skip:
                                         Demeton/Dem/Hgt.fs:14-129
  - XTH little-endian + water-bit packing: Demeton/Dem/Xth.fs:19-200
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .tiles import DEM_HEIGHT_NONE

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_HEIGHT_OFFSET = 32768  # uint16 = int16 height + 32768; 0 encodes missing


# ---------------------------------------------------------------------------
# height <-> uint16 (Srtm/Png.fs:29-39)
# ---------------------------------------------------------------------------

def heights_to_uint16(heights: np.ndarray) -> np.ndarray:
    """int16 (sentinel) → uint16; DEM_HEIGHT_NONE (-32768) maps to 0."""
    return (heights.astype(np.int32) + _HEIGHT_OFFSET).astype(np.uint16)


def uint16_to_heights(values: np.ndarray) -> np.ndarray:
    """uint16 → int16 heights; 0 maps back to DEM_HEIGHT_NONE."""
    return (values.astype(np.int32) - _HEIGHT_OFFSET).astype(np.int16)


# ---------------------------------------------------------------------------
# minimal PNG container
# ---------------------------------------------------------------------------

def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _encode_png(
    raw: np.ndarray, bit_depth: int, color_type: int, level: int = 6
) -> bytes:
    """Encode a (H, W[, C]) uint8/uint16 array as PNG with the Up filter.

    Up filtering before deflate is what makes smooth terrain compress
    well (the reference picks filters by min-sum-of-abs heuristic,
    Filters.fs:113-120; Up wins on smooth gradients).  ``level`` is the
    deflate effort: decoded pixels are identical at any level, only the
    byte size changes, so throughput-bound sinks pick a low level.
    """
    if raw.ndim == 2:
        h, w = raw.shape
        channels = 1
    else:
        h, w, channels = raw.shape
    if bit_depth == 16:
        body = raw.astype(">u2").tobytes()
        bpr = w * channels * 2
    else:
        body = raw.astype(np.uint8).tobytes()
        bpr = w * channels
    rows = np.frombuffer(body, dtype=np.uint8).reshape(h, bpr)
    prev = np.zeros((1, bpr), dtype=np.uint8)
    up = rows - np.vstack([prev, rows[:-1]])  # uint8 wraparound == mod 256
    filtered = np.empty((h, bpr + 1), dtype=np.uint8)
    filtered[:, 0] = 2  # Up filter
    filtered[:, 1:] = up
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)
    idat = zlib.compress(filtered.tobytes(), level)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    pa = np.abs(b.astype(np.int16) - c)
    pb = np.abs(a.astype(np.int16) - c)
    pc = np.abs(a.astype(np.int16) + b - 2 * c.astype(np.int16))
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _decode_png(data: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a non-interlaced 8/16-bit gray or RGBA PNG.

    Returns (array, bit_depth, color_type); array is (H, W) for gray,
    (H, W, 4) for RGBA.  Handles all 5 scanline filters (Unfilters.fs).
    """
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG stream")
    pos = 8
    width = height = bit_depth = color_type = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    channels = {0: 1, 2: 3, 6: 4}[color_type]
    bytes_per_sample = bit_depth // 8
    bpp = channels * bytes_per_sample
    bpr = width * bpp
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8).reshape(
        height, bpr + 1
    )
    filters = raw[:, 0]
    out = np.empty((height, bpr), dtype=np.uint8)
    # Fast paths for uniform-filter streams (our own encoder always emits
    # Up): unfiltering Up is a column-wise cumulative sum mod 256, which
    # uint8 accumulate gives for free — no per-row Python loop.
    if (filters == 2).all():
        out = np.add.accumulate(raw[:, 1:], axis=0, dtype=np.uint8)
    elif (filters == 0).all():
        out = raw[:, 1:].copy()
    else:
        out = _unfilter_rows(raw, filters, height, bpr, bpp)
    if bit_depth == 16:
        arr = out.reshape(height, width, channels, 2)
        arr = (arr[..., 0].astype(np.uint16) << 8) | arr[..., 1]
    else:
        arr = out.reshape(height, width, channels)
    if channels == 1:
        arr = arr[..., 0] if arr.ndim == 3 else arr.reshape(height, width)
    return arr, bit_depth, color_type


def _unfilter_rows(
    raw: np.ndarray, filters: np.ndarray, height: int, bpr: int, bpp: int
) -> np.ndarray:
    """General per-row unfilter (all 5 PNG filters, Unfilters.fs parity)."""
    out = np.empty((height, bpr), dtype=np.uint8)
    prev = np.zeros(bpr, dtype=np.uint8)
    for y in range(height):
        row = raw[y, 1:].copy()
        f = filters[y]
        if f == 0:
            cur = row
        elif f == 1:  # Sub
            cur = row
            for x in range(bpp, bpr):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif f == 2:  # Up
            cur = (row + prev).astype(np.uint8)
        elif f == 3:  # Average
            cur = row
            for x in range(bpr):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = row
            for x in range(bpr):
                left = cur[x - bpp] if x >= bpp else np.uint8(0)
                ul = prev[x - bpp] if x >= bpp else np.uint8(0)
                cur[x] = (
                    int(cur[x])
                    + int(_paeth(np.uint8(left), prev[x], np.uint8(ul)))
                ) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = cur
        prev = cur
    return out


# ---------------------------------------------------------------------------
# public codecs
# ---------------------------------------------------------------------------

def encode_heights_png(heights: np.ndarray) -> bytes:
    """int16 heights block (row 0 = south) → 16-bit grayscale PNG bytes
    (encodeSrtmHeightsArrayToPng, Srtm/Png.fs:53-70)."""
    return _encode_png(heights_to_uint16(heights), 16, 0)


def decode_heights_png(data: bytes) -> np.ndarray:
    """16-bit grayscale PNG bytes → int16 heights block (Srtm/Png.fs:128-182)."""
    arr, bit_depth, color_type = _decode_png(data)
    if bit_depth != 16 or color_type != 0:
        raise ValueError(
            f"expected 16-bit grayscale PNG, got depth={bit_depth} color={color_type}"
        )
    return uint16_to_heights(arr)


#: default deflate level for rendered output tiles: 6, matching the
#: reference's zlib DEFAULT_COMPRESSION (Png/Chunks.fs:106) so persisted
#: artifacts have the reference's storage characteristics.  The pipeline
#: is encode-bound at level 6 (~1.7s/tile vs ~0.3s shading at 1800²);
#: throughput-bound paths (bench.py) pass png_level=1 explicitly
#: (7.8x faster encode, ~12% larger tiles).
RGBA_PNG_LEVEL = 6
RGBA_PNG_LEVEL_FAST = 1


def encode_rgba_png(image: np.ndarray, level: int = RGBA_PNG_LEVEL) -> bytes:
    """(H, W, 4) uint8 RGBA → PNG bytes (decoded-pixel lossless)."""
    return _encode_png(image, 8, 6, level)


def decode_rgba_png(data: bytes) -> np.ndarray:
    arr, bit_depth, color_type = _decode_png(data)
    if bit_depth != 8 or color_type != 6:
        raise ValueError("expected 8-bit RGBA PNG")
    return arr


def decode_hgt(data: bytes, tile_size: int) -> np.ndarray:
    """HGT bytes → int16 block, row 0 = **south** (DEM orientation).

    HGT files are north-first with a 1-row/col overlap with neighbors:
    (tile_size+1)² big-endian int16 samples.  The reader skips the first
    (northmost) row and the last (eastmost) column and reverses row order
    (Dem/Hgt.fs:30-74); 0x8000 → missing sentinel (Dem/Funcs.fs:311-316).
    """
    side = tile_size + 1
    raw = np.frombuffer(data, dtype=">i2")
    if raw.size == side * side:
        grid = raw.reshape(side, side).astype(np.int16)
        # drop the north overlap row + east overlap col, flip to south-up
        block = grid[1:, :-1][::-1, :].copy()
    elif raw.size == tile_size * tile_size:
        # bare grid as produced by the reference writer (Hgt.fs:95-107)
        block = raw.reshape(tile_size, tile_size).astype(np.int16)[::-1, :].copy()
    else:
        raise ValueError(
            f"HGT payload must be {side}x{side} or {tile_size}x{tile_size} samples"
        )
    block[block == np.int16(-0x8000)] = DEM_HEIGHT_NONE  # 0x8000 == sentinel
    return block


def encode_hgt(heights: np.ndarray) -> bytes:
    """HGT writer parity (Dem/Hgt.fs:95-107): north-first rows (reverse of
    the south-up block), big-endian int16, **no** overlap row/col."""
    return heights[::-1, :].astype(">i2").tobytes()


# --- XTH: little-endian int16 with the water-body flag in the MSB ---------

_XTH_MIN_HEIGHT = -500  # heights offset into the low 15 bits (Dem/Xth.fs)


def encode_xth(heights: np.ndarray, water_mask: np.ndarray) -> bytes:
    """Pack heights + water flags (Dem/Xth.fs:19-200 semantics).

    value = (height - MIN_HEIGHT) | (water << 15), little-endian int16;
    missing heights encode as 0 (below any valid offset height).
    """
    offs = heights.astype(np.int32) - _XTH_MIN_HEIGHT
    offs = np.where(heights == DEM_HEIGHT_NONE, 0, offs)
    packed = (offs | (water_mask.astype(np.int32) << 15)).astype(np.uint16)
    return packed.astype("<u2").tobytes()


def decode_xth(data: bytes, width: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_xth` → (heights int16, water bool)."""
    packed = np.frombuffer(data, dtype="<u2").reshape(-1, width)
    water = (packed >> 15).astype(bool)
    offs = (packed & 0x7FFF).astype(np.int32)
    heights = np.where(
        offs == 0, DEM_HEIGHT_NONE, offs + _XTH_MIN_HEIGHT
    ).astype(np.int16)
    return heights, water


# --- minimal TIFF gray16 (AW3D GeoTIFF ingest, no external libs) ----------

_TIFF_TAGS = {
    256: "width", 257: "height", 258: "bits", 259: "compression",
    273: "strip_offsets", 278: "rows_per_strip", 279: "strip_counts",
    277: "samples_per_pixel", 317: "predictor", 339: "sample_format",
}

#: TIFF compression codes we read: none, LZW, Adobe deflate, legacy
#: deflate, PackBits
_TIFF_COMPRESSION_NONE = 1
_TIFF_COMPRESSION_LZW = 5
_TIFF_COMPRESSION_DEFLATE = 8
_TIFF_COMPRESSION_DEFLATE_OLD = 32946
_TIFF_COMPRESSION_PACKBITS = 32773

_LZW_CLEAR, _LZW_EOI = 256, 257


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW (TIFF 6.0 §13): MSB-first bit packing, 9→12-bit
    codes with EARLY CHANGE (width bumps when the table reaches
    2^width − 1, one code earlier than vanilla LZW), ClearCode 256,
    EOI 257."""
    bits = int.from_bytes(data, "big")
    total = len(data) * 8
    pos = 0
    width = 9
    table: list[bytes] = []
    prev: bytes | None = None
    out = bytearray()
    while pos + width <= total:
        code = (bits >> (total - pos - width)) & ((1 << width) - 1)
        pos += width
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            if not table or code >= len(table):
                raise ValueError("LZW stream must start with ClearCode")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream: code beyond table")
        out += entry
        prev = entry
        # early change, shifted one further because the decoder's table
        # lags the encoder's by exactly one entry: the encoder bumps
        # after ADDING code 2^w-2 (its next_code hits 2^w-1), which is
        # the moment this table holds 2^w-2 entries
        if len(table) >= (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """Inverse of :func:`_lzw_decode` (same early-change variant)."""
    out = bytearray()
    acc = 0
    nacc = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nacc
        acc = (acc << width) | code
        nacc += width
        while nacc >= 8:
            nacc -= 8
            out.append((acc >> nacc) & 0xFF)
        acc &= (1 << nacc) - 1

    def fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(256)}

    width = 9
    emit(_LZW_CLEAR, width)
    table = fresh()
    next_code = 258
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        w = bytes([b])
        if next_code >= 4094:  # table full: restart (TIFF 6.0 §13)
            emit(table[w], width)
            emit(_LZW_CLEAR, width)
            table = fresh()
            next_code = 258
            width = 9
            w = b""
    if w:
        emit(table[w], width)
    emit(_LZW_EOI, width)
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    """TIFF PackBits (TIFF 6.0 §9, the Macintosh RLE scheme): control
    byte n in [0,127] copies the next n+1 literal bytes, n in
    [-127,-1] (two's complement) repeats the next byte 1−n times,
    −128 is a no-op."""
    out = bytearray()
    i, end = 0, len(data)
    while i < end:
        n = data[i] - 256 if data[i] > 127 else data[i]
        i += 1
        if n >= 0:
            if i + n + 1 > end:
                raise ValueError("truncated PackBits literal run")
            out += data[i : i + n + 1]
            i += n + 1
        elif n != -128:
            if i >= end:
                raise ValueError("truncated PackBits repeat run")
            out += data[i : i + 1] * (1 - n)
            i += 1
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """Inverse of :func:`_packbits_decode`.  Standard packer: runs of
    ≥3 identical bytes become repeat packets (max 128), everything
    else literal packets (max 128); a 2-byte run breaking a literal
    stretch is folded into the literal, per the TIFF 6.0 §9 advice."""
    out = bytearray()
    i, end = 0, len(data)
    while i < end:
        # measure the run starting at i
        j = i + 1
        while j < end and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 3 or (j - i == 2 and j == end):
            out.append((257 - (j - i)) & 0xFF)
            out.append(data[i])
            i = j
            continue
        # literal stretch: scan until a run of >=3 begins (or 128 cap)
        lit = i
        while j < end and j - lit < 128:
            if (
                j + 2 < end
                and data[j] == data[j + 1] == data[j + 2]
            ):
                break
            j += 1
        out.append(j - lit - 1)
        out += data[lit:j]
        i = j
    return bytes(out)


def decode_tiff_gray16(
    data: bytes, duplicate_to_width: int | None = None
) -> np.ndarray:
    """Strip-based single-sample int16 TIFF → south-up array.

    Pure-numpy reimplementation of the AW3D reader's semantics
    (/root/reference/Demeton/Aw3d/Funcs.fs:180-261): scanlines are
    north-first in the file and land in reverse row order; half-width
    (high-latitude) tiles duplicate each column when
    ``duplicate_to_width`` is given.  Both endiannesses supported.
    Compression: none (1), LZW strips (5, the common wild-TIFF scheme;
    TIFF 6.0 early-change variant), deflate strips (8 / legacy 32946,
    the scheme real AW3D/GDAL tiles ship with), and PackBits strips
    (32773, the TIFF 6.0 baseline RLE) — each with optional
    horizontal-differencing predictor 2 (per-row 16-bit sample deltas,
    undone by a wrapping cumulative sum).  Other schemes are rejected.
    """
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    u16 = lambda off: int(np.frombuffer(data, f"{bo}u2", 1, off)[0])  # noqa: E731
    u32 = lambda off: int(np.frombuffer(data, f"{bo}u4", 1, off)[0])  # noqa: E731
    if u16(2) != 42:
        raise ValueError("not a TIFF: bad magic")
    ifd = u32(4)
    n_entries = u16(ifd)
    tags: dict[str, list[int]] = {}
    for i in range(n_entries):
        e = ifd + 2 + i * 12
        tag, typ, count = u16(e), u16(e + 2), u32(e + 4)
        size = {1: 1, 3: 2, 4: 4}.get(typ)
        if size is None:
            continue
        if size * count <= 4:
            off = e + 8
        else:
            off = u32(e + 8)
        rd = {1: "u1", 3: "u2", 4: "u4"}[typ]
        vals = np.frombuffer(data, f"{bo}{rd}", count, off).tolist()
        if tag in _TIFF_TAGS:
            tags[_TIFF_TAGS[tag]] = [int(v) for v in vals]
    w, h = tags["width"][0], tags["height"][0]
    compression = tags.get("compression", [_TIFF_COMPRESSION_NONE])[0]
    if compression not in (
        _TIFF_COMPRESSION_NONE,
        _TIFF_COMPRESSION_LZW,
        _TIFF_COMPRESSION_DEFLATE,
        _TIFF_COMPRESSION_DEFLATE_OLD,
        _TIFF_COMPRESSION_PACKBITS,
    ):
        raise ValueError(f"unsupported TIFF compression {compression}")
    if tags.get("bits", [16])[0] != 16 or tags.get("samples_per_pixel", [1])[0] != 1:
        raise ValueError("expected single-sample 16-bit TIFF")
    predictor = tags.get("predictor", [1])[0]
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    signed = tags.get("sample_format", [2])[0] == 2
    dt = f"{bo}i2" if signed else f"{bo}u2"
    rows_per_strip = tags.get("rows_per_strip", [h])[0]
    strip_counts = tags.get("strip_counts", [len(data)] * len(tags["strip_offsets"]))
    rows = []
    for si, off in enumerate(tags["strip_offsets"]):
        n_rows = min(rows_per_strip, h - si * rows_per_strip)
        if compression == _TIFF_COMPRESSION_NONE:
            strip = np.frombuffer(data, dt, n_rows * w, off)
        elif compression == _TIFF_COMPRESSION_LZW:
            raw = _lzw_decode(data[off : off + strip_counts[si]])
            strip = np.frombuffer(raw, dt, n_rows * w)
        elif compression == _TIFF_COMPRESSION_PACKBITS:
            raw = _packbits_decode(data[off : off + strip_counts[si]])
            strip = np.frombuffer(raw, dt, n_rows * w)
        else:
            raw = zlib.decompress(data[off : off + strip_counts[si]])
            strip = np.frombuffer(raw, dt, n_rows * w)
        strip = strip.reshape(n_rows, w)
        if predictor == 2:
            # horizontal differencing over 16-bit samples: undo with a
            # wrapping per-row cumulative sum
            acc = np.cumsum(
                strip.astype(np.int64), axis=1, dtype=np.int64
            ) & 0xFFFF
            strip = acc.astype(np.uint16).view(np.int16) if signed else acc
        rows.append(strip)
    north_up = np.concatenate(rows).astype(np.int16)
    south_up = north_up[::-1, :]  # reverse row order (Funcs.fs:219-222)
    if duplicate_to_width is not None and w != duplicate_to_width:
        if duplicate_to_width != 2 * w:
            raise ValueError("can only duplicate half-width tiles")
        south_up = np.repeat(south_up, 2, axis=1)  # column doubling (:242-245)
    return south_up


def encode_tiff_gray16(
    heights_south_up: np.ndarray,
    compression: int = _TIFF_COMPRESSION_NONE,
    predictor: int = 1,
    zlevel: int = 6,
) -> bytes:
    """Minimal little-endian int16 TIFF (one strip), rows north-first —
    the inverse of :func:`decode_tiff_gray16` for tests and sinks.
    ``compression`` 1 (none), 5 (LZW), 8 (deflate) or 32773
    (PackBits); ``predictor`` 2
    applies per-row horizontal differencing before compression (the
    layout GDAL writes for AW3D-style tiles)."""
    north_up = np.ascontiguousarray(heights_south_up[::-1, :]).astype("<i2")
    h, w = north_up.shape
    payload_arr = north_up
    if predictor == 2:
        u = north_up.view("<u2").astype(np.int64)
        diff = np.empty_like(u)
        diff[:, 0] = u[:, 0]
        diff[:, 1:] = (u[:, 1:] - u[:, :-1]) & 0xFFFF
        payload_arr = diff.astype("<u2")
    elif predictor != 1:
        raise ValueError(f"unsupported predictor {predictor}")
    payload = payload_arr.tobytes()
    if compression in (_TIFF_COMPRESSION_DEFLATE, _TIFF_COMPRESSION_DEFLATE_OLD):
        payload = zlib.compress(payload, zlevel)
    elif compression == _TIFF_COMPRESSION_LZW:
        payload = _lzw_encode(payload)
    elif compression == _TIFF_COMPRESSION_PACKBITS:
        payload = _packbits_encode(payload)
    elif compression != _TIFF_COMPRESSION_NONE:
        raise ValueError(f"unsupported compression {compression}")
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 16),
        (259, 3, 1, compression),
        (273, 4, 1, 0), (277, 3, 1, 1), (278, 3, 1, h),
        (279, 4, 1, len(payload)), (317, 3, 1, predictor), (339, 3, 1, 2),
    ]
    ifd_off = 8
    data_off = ifd_off + 2 + len(entries) * 12 + 4
    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off)
    out += struct.pack("<H", len(entries))
    for tag, typ, count, value in entries:
        if tag == 273:
            value = data_off
        out += struct.pack("<HHI", tag, typ, count)
        out += struct.pack("<I", value) if typ == 4 else struct.pack(
            "<HH", value, 0
        )
    out += struct.pack("<I", 0)  # next IFD
    out += payload
    return bytes(out)


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 65535.0) -> float:
    """Peak signal-to-noise ratio in dB (∞ for identical arrays)."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


# ---------------------------------------------------------------------------
# BMP (Windows DIB): 8-bpp paletted gray + 24-bpp BGR, BI_RGB only.
# No reference counterpart (the reference decodes PNG/TIFF/HGT only) —
# this is multimodal-extras surface: web-corpus image tables carry BMP
# rows and the engine must decode them without a codec library.
# ---------------------------------------------------------------------------

def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → uint8 array: ``(h, w)`` for 8-bpp gray-paletted,
    ``(h, w, 3)`` RGB for 24-bpp.  Uncompressed (BI_RGB) BITMAPINFOHEADER
    (or later, e.g. V4/V5 — header size ≥ 40) only; rows are 4-byte
    padded, bottom-up unless height is negative.  Raises ``ValueError``
    on corrupt/unsupported input (→ multimodal quarantine)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if planes != 1 or compression != 0:
        raise ValueError("only uncompressed (BI_RGB) BMP is supported")
    if w <= 0 or h == 0:
        raise ValueError("bad BMP dimensions")
    bottom_up = h > 0
    h = abs(h)
    if bpp == 8:
        n_colors = struct.unpack_from("<I", data, 46)[0] or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            data[pal_off : pal_off + 4 * n_colors], np.uint8
        ).reshape(-1, 4)  # BGRX
        if len(pal) < n_colors:
            raise ValueError("truncated BMP palette")
        stride = (w + 3) & ~3
        need = stride * h
        raw = np.frombuffer(data[pix_off : pix_off + need], np.uint8)
        if len(raw) < need:
            raise ValueError("truncated BMP pixel data")
        idx = raw.reshape(h, stride)[:, :w]
        # ITU-R 601 luma over the BGRX palette, rounded
        luma = np.round(
            0.114 * pal[:, 0] + 0.587 * pal[:, 1] + 0.299 * pal[:, 2]
        ).astype(np.uint8)
        img = luma[idx]
    elif bpp == 24:
        stride = (3 * w + 3) & ~3
        need = stride * h
        raw = np.frombuffer(data[pix_off : pix_off + need], np.uint8)
        if len(raw) < need:
            raise ValueError("truncated BMP pixel data")
        img = raw.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)[..., ::-1]
    else:
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    return img[::-1].copy() if bottom_up else img.copy()


def encode_bmp_gray8(img: np.ndarray) -> bytes:
    """uint8 ``(h, w)`` → 8-bpp BMP with an identity gray palette."""
    h, w = img.shape
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w] = img
    payload = rows[::-1].tobytes()  # bottom-up
    pal = bytearray()
    for i in range(256):
        pal += bytes((i, i, i, 0))  # BGRX
    pix_off = 14 + 40 + len(pal)
    header = b"BM" + struct.pack(
        "<IHHI", pix_off + len(payload), 0, 0, pix_off
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(payload),
                    2835, 2835, 256, 0)
    return header + bytes(pal) + payload


def encode_bmp_rgb24(img: np.ndarray) -> bytes:
    """uint8 ``(h, w, 3)`` RGB → 24-bpp BMP."""
    h, w, _ = img.shape
    stride = (3 * w + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : 3 * w] = img[..., ::-1].reshape(h, 3 * w)  # RGB → BGR
    payload = rows[::-1].tobytes()
    pix_off = 14 + 40
    header = b"BM" + struct.pack(
        "<IHHI", pix_off + len(payload), 0, 0, pix_off
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(payload),
                    2835, 2835, 0, 0)
    return header + payload


# ---------------------------------------------------------------------------
# GIF 87a/89a: variable-width LSB-first LZW (distinct from the TIFF
# variant above: LSB packing, dynamic min-code-size, no early change),
# global/local palettes, interlace, extension skipping.  First frame only
# (animation frames are rows in the videos table, not one payload).
# ---------------------------------------------------------------------------

def _gif_lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytearray:
    """GIF-variant LZW: LSB-first, width = mcs+1 growing to 12 bits
    (bump AFTER the table fills 2^width, no early change), Clear =
    2^mcs, EOI = 2^mcs + 1."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad GIF LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = []
    prev: bytes | None = None
    out = bytearray()
    acc = 0
    nacc = 0
    for byte in data:
        acc |= byte << nacc
        nacc += 8
        while nacc >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nacc -= width
            if code == eoi:
                return out
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code_size + 1
                prev = None
                continue
            if prev is None:
                if not table:
                    raise ValueError("GIF LZW stream must start with Clear")
                if code >= len(table):
                    raise ValueError("corrupt GIF LZW: first code not literal")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt GIF LZW: code beyond table")
            out += entry
            if len(out) >= max_pixels:
                return out
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out


def _gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Inverse of :func:`_gif_lzw_decode` (greedy longest-match)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nacc = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    width = min_code_size + 1
    emit(clear, width)
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == (1 << 12):
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_frames(data: bytes):
    """Yield composited full-canvas uint8 ``(sh, sw, 3)`` RGB frames.

    Walks the 89a/87a block structure: logical screen descriptor +
    optional global color table, Graphic Control Extensions honoured
    (transparency index skipped during compositing; disposal methods
    1 leave / 2 restore-background / 3 restore-previous), local
    palettes and interlacing honoured, other extensions skipped.
    Raises ``ValueError`` on corrupt streams."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    sw, sh, flags, bg_idx = struct.unpack_from("<HHBB", data, 6)
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        global_pal = np.frombuffer(data[pos : pos + 3 * n], np.uint8)
        if len(global_pal) < 3 * n:
            raise ValueError("truncated GIF global color table")
        global_pal = global_pal.reshape(n, 3)
        pos += 3 * n

    bg_rgb = (
        global_pal[bg_idx]
        if global_pal is not None and bg_idx < len(global_pal)
        else np.zeros(3, np.uint8)
    )
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    # GCE state for the NEXT image descriptor
    transparent = -1
    disposal = 0

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(data):
                raise ValueError("truncated GIF sub-blocks")
            size = data[p]
            p += 1
            if size == 0:
                return p
            p += size

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("truncated GIF extension")
            label = data[pos]
            if label == 0xF9 and pos + 6 <= len(data) and data[pos + 1] == 4:
                gflags = data[pos + 2]
                disposal = (gflags >> 2) & 7
                transparent = data[pos + 5] if gflags & 1 else -1
            pos = skip_subblocks(pos + 1)
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated GIF image descriptor")
        ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if ix + iw > sw or iy + ih > sh:
            raise ValueError("GIF frame outside logical screen")
        pal = global_pal
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            pal = np.frombuffer(data[pos : pos + 3 * n], np.uint8)
            if len(pal) < 3 * n:
                raise ValueError("truncated GIF local color table")
            pal = pal.reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image with no color table")
        if pos >= len(data):
            raise ValueError("truncated GIF image data")
        mcs = data[pos]
        pos += 1
        chunks = []
        while True:
            if pos >= len(data):
                raise ValueError("truncated GIF sub-blocks")
            size = data[pos]
            pos += 1
            if size == 0:
                break
            chunks.append(data[pos : pos + size])
            if len(chunks[-1]) < size:
                raise ValueError("truncated GIF sub-block")
            pos += size
        idx = _gif_lzw_decode(b"".join(chunks), mcs, iw * ih)
        if len(idx) < iw * ih:
            raise ValueError("GIF pixel data underrun")
        grid = np.frombuffer(bytes(idx[: iw * ih]), np.uint8).reshape(ih, iw)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            out_rows = np.empty_like(grid)
            src = 0
            for start, step in _GIF_INTERLACE_PASSES:
                n_rows = len(range(start, ih, step))
                out_rows[start::step] = grid[src : src + n_rows]
                src += n_rows
            grid = out_rows
        opaque = grid != transparent if transparent >= 0 else slice(None)
        if int(grid[opaque].max(initial=0)) >= len(pal):
            raise ValueError("GIF index beyond palette")
        prev = canvas.copy() if disposal == 3 else None
        rect = canvas[iy : iy + ih, ix : ix + iw]
        if transparent >= 0:
            rect[opaque] = pal[grid[opaque]]
        else:
            rect[:] = pal[grid]
        yield canvas.copy()
        if disposal == 2:  # restore rect to background
            canvas[iy : iy + ih, ix : ix + iw] = bg_rgb
        elif disposal == 3:  # restore to pre-frame canvas
            canvas = prev
        transparent, disposal = -1, 0
    raise ValueError("GIF stream missing trailer")


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → uint8 ``(h, w, 3)`` RGB (first composited frame)."""
    for frame in _gif_frames(data):
        return frame
    raise ValueError("GIF stream has no image descriptor")


def decode_gif_frames(data: bytes) -> list[np.ndarray]:
    """Animated GIF bytes → every composited uint8 ``(h, w, 3)`` frame.

    Animated GIF is the one real video container decodable from public
    spec without a codec library; this backs the engine's video
    frame-sampling path (multimodal.frame_sample fmt='gif')."""
    frames = list(_gif_frames(data))
    if not frames:
        raise ValueError("GIF stream has no image descriptor")
    return frames


def encode_gif_gray(img: np.ndarray, interlace: bool = False) -> bytes:
    """uint8 ``(h, w)`` → single-frame GIF89a with a 256-gray global
    palette (test/fixture generator for the decoder above)."""
    h, w = img.shape
    pal = bytearray()
    for i in range(256):
        pal += bytes((i, i, i))
    grid = img
    if interlace:
        rows = []
        for start, step in _GIF_INTERLACE_PASSES:
            rows.append(img[start::step])
        grid = np.concatenate(rows, axis=0)
    lzw = _gif_lzw_encode(grid.tobytes(), 8)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 7, 0, 0)  # global pal, 256
    out += pal
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    out.append(8)  # LZW min code size
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def encode_gif_anim(
    frames: list,
    rects: list | None = None,
    disposals: list | None = None,
    transparent: int = -1,
    bg_index: int = 0,
) -> bytes:
    """Animated GIF89a fixture generator for :func:`decode_gif_frames`.

    ``frames`` are uint8 gray arrays (256-gray global palette).  Frame
    ``k > 0`` may be a sub-rectangle placed at ``rects[k] = (ix, iy)``;
    ``disposals[k]`` is the GCE disposal method applied AFTER frame k
    (0/1 leave, 2 restore-background, 3 restore-previous); pixels equal
    to ``transparent`` are transparent in frames > 0."""
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 7, bg_index, 0)
    for i in range(256):
        out += bytes((i, i, i))
    for k, frame in enumerate(frames):
        ix, iy = (rects[k] if rects and rects[k] else (0, 0))
        disposal = disposals[k] if disposals else 0
        gflags = (disposal & 7) << 2
        tr = 0
        if transparent >= 0 and k > 0:
            gflags |= 1
            tr = transparent
        out += b"\x21\xf9\x04" + bytes((gflags, 0, 0, tr)) + b"\x00"
        fh, fw = frame.shape
        out += b"\x2c" + struct.pack("<HHHHB", ix, iy, fw, fh, 0)
        out.append(8)
        lzw = _gif_lzw_encode(frame.tobytes(), 8)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
