"""Pure-numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

From-scratch like the reference's PNG implementation
(/root/reference/Demeton/Png/Chunks.fs:21-213,
/root/reference/Demeton/Png/FileFormat.fs) — no codec library exists in
this container, and the multimodal decode contract needs a real second
image codec next to PNG/TIFF/HGT.  Scope: baseline sequential DCT,
8-bit samples, Huffman entropy coding.

- :func:`decode_jpeg` — grayscale and 3-component YCbCr (any sampling
  factors incl. 4:4:4 / 4:2:0), restart intervals, 8/16-bit
  quantization tables.  Returns ``uint8 (h, w)`` for grayscale or
  ``(h, w, 3)`` RGB for color.  Corrupt streams raise ``ValueError``
  (the quarantine path in :mod:`demeton_spark.multimodal`).
- :func:`encode_gray_jpeg` / :func:`encode_rgb_jpeg` — baseline encoder
  (Annex K tables, IJG quality scaling; color uses 4:2:0 chroma
  subsampling), used by the round-trip tests.

Everything is spec-public: quantization/Huffman tables are ITU-T T.81
Annex K; the IDCT is the exact orthonormal float DCT-II matrix, so
round-trip error comes only from quantization (PSNR >= 40 dB at
quality 90 on smooth rasters, the input_hint's lossy-parity bar).
"""

from __future__ import annotations

import numpy as np

# zigzag index -> raster index within an 8x8 block (T.81 Figure 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 base quantization tables (raster order)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix A: coeffs = A @ block @ A.T."""
    x = np.arange(8, dtype=np.float64)
    u = x[:, None]
    a = np.cos((2.0 * x[None, :] + 1.0) * u * np.pi / 16.0) / 2.0
    a[0, :] /= np.sqrt(2.0)
    return a


_A = _dct_matrix()


def _build_huffman_codes(bits, vals) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: value -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_huffman_decoder(bits, vals) -> dict[tuple[int, int], int]:
    """Canonical Huffman: (length, code) -> value."""
    return {
        (length, code): v
        for v, (code, length) in _build_huffman_codes(bits, vals).items()
    }


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    stuffing; surfaces RSTn markers and stops at any other marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("read past marker in entropy-coded data")
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy-coded data")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated after 0xFF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                # marker reached: un-consume, flag, feed zero bits (some
                # encoders rely on padding at segment end)
                self.pos -= 1
                self.marker = nxt
                raise ValueError("hit marker while expecting bits")
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self, n: int) -> None:
        """Byte-align and consume the RSTn marker (restart interval)."""
        self.bitbuf = 0
        self.nbits = 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + (n & 7)
        ):
            raise ValueError("expected restart marker RST%d" % (n & 7))
        self.pos += 2


def _decode_huff(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code")


def _extend(v: int, n: int) -> int:
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG -> uint8 array: (h, w) gray or (h, w, 3) RGB."""
    data = bytes(data)
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> decoder
    comps: list[dict] = []
    width = height = 0
    restart_interval = 0
    scan: list[dict] = []
    sos_pos = -1

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("expected marker at offset %d" % pos)
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > len(data):
            raise ValueError("truncated segment header")
        seglen = int.from_bytes(data[pos : pos + 2], "big")
        seg = data[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated segment body")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                n = 64 * (2 if pq else 1)
                raw = seg[i : i + n]
                if len(raw) < n:
                    raise ValueError("truncated DQT")
                vals = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int64)
                    if pq
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                )
                q = np.zeros(64, dtype=np.int64)
                q[ZIGZAG] = vals
                qtables[tq] = q.reshape(8, 8)
                i += n
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                if len(vals) < nv:
                    raise ValueError("truncated DHT")
                htables[(tc, th)] = _build_huffman_decoder(bits, vals)
                i += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported SOF marker 0xFF%02X (baseline only)" % marker
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next((k for k in comps if k["id"] == cs), None)
                if comp is None:
                    raise ValueError("scan references unknown component")
                scan.append({"comp": comp, "dc": tt >> 4, "ac": tt & 15})
            sos_pos = pos + seglen
            break
        # APPn / COM / anything else: skip
        pos += seglen

    if not comps or sos_pos < 0 or width == 0 or height == 0:
        raise ValueError("missing SOF/SOS")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1:
        raise ValueError("invalid sampling factors")
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
        for c in comps
    }

    reader = _BitReader(data, sos_pos)
    pred = {s["comp"]["id"]: 0 for s in scan}
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            reader.align_and_expect_rst(rst)
            rst = (rst + 1) & 7
            pred = {k: 0 for k in pred}
        my, mx = divmod(m, mcux)
        for s in scan:
            comp = s["comp"]
            dc_tab = htables.get((0, s["dc"]))
            ac_tab = htables.get((1, s["ac"]))
            q = qtables.get(comp["tq"])
            if dc_tab is None or ac_tab is None or q is None:
                raise ValueError("missing Huffman/quant table")
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    zz = np.zeros(64, dtype=np.int64)
                    t = _decode_huff(reader, dc_tab)
                    diff = _extend(reader.receive(t), t)
                    pred[comp["id"]] += diff
                    zz[0] = pred[comp["id"]]
                    k = 1
                    while k < 64:
                        rs = _decode_huff(reader, ac_tab)
                        r, sz = rs >> 4, rs & 15
                        if sz == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        zz[k] = _extend(reader.receive(sz), sz)
                        k += 1
                    block = np.zeros(64, dtype=np.float64)
                    block[ZIGZAG] = zz * q[ZIGZAG // 8, ZIGZAG % 8]
                    spatial = _A.T @ block.reshape(8, 8) @ _A + 128.0
                    y0 = (my * comp["v"] + by) * 8
                    x0 = (mx * comp["h"] + bx) * 8
                    planes[comp["id"]][y0 : y0 + 8, x0 : x0 + 8] = spatial

    out_planes = []
    for c in comps:
        p = planes[c["id"]]
        # upsample to full resolution (box), then crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:height, :width])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    if len(out_planes) != 3:
        raise ValueError("only 1- or 3-component images supported")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.bitbuf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.bitbuf = (self.bitbuf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.bitbuf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.bitbuf &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # 1-pad to byte boundary
        return bytes(self.out)


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255)


def _encode_blocks(
    writer: _BitWriter, plane: np.ndarray, q: np.ndarray,
    dc_codes: dict, ac_codes: dict, pred: int,
) -> int:
    """Encode one 8x8 block (plane is exactly 8x8, level-shifted)."""
    coeffs = _A @ plane @ _A.T
    zz = np.round(coeffs / q).astype(np.int64).reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    mag = int(abs(diff)).bit_length()
    code, length = dc_codes[mag]
    writer.write(code, length)
    if mag:
        writer.write(diff if diff >= 0 else diff + (1 << mag) - 1, mag)
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz) else 0
    k = 1
    while k <= last_nz:
        run = 0
        while zz[k] == 0:
            run += 1
            k += 1
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        v = int(zz[k])
        mag = abs(v).bit_length()
        code, length = ac_codes[(run << 4) | mag]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << mag) - 1, mag)
        k += 1
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return pred


def _pad_to_blocks(plane: np.ndarray, by: int = 8) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -(-h // by) * by, -(-w // by) * by
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _dht_segment(tc: int, th: int, bits, vals) -> bytes:
    body = bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + (len(body) + 2).to_bytes(2, "big") + body


def _dqt_segment(tq: int, q: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(v) for v in q.reshape(-1)[ZIGZAG])
    return b"\xff\xdb" + (len(body) + 2).to_bytes(2, "big") + body


def encode_gray_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """uint8 (h, w) -> baseline grayscale JPEG."""
    img = np.asarray(img)
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("encode_gray_jpeg wants uint8 (h, w)")
    h, w = img.shape
    q = _quality_scale(QT_LUMA, quality).reshape(8, 8).astype(np.float64)
    dc = _build_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac = _build_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    plane = _pad_to_blocks(img.astype(np.float64) - 128.0)
    writer = _BitWriter()
    pred = 0
    for y0 in range(0, plane.shape[0], 8):
        for x0 in range(0, plane.shape[1], 8):
            pred = _encode_blocks(
                writer, plane[y0 : y0 + 8, x0 : x0 + 8], q, dc, ac, pred
            )
    sof = (
        b"\xff\xc0" + (11).to_bytes(2, "big") + bytes([8])
        + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0])
    )
    sos = b"\xff\xda" + (8).to_bytes(2, "big") + bytes([1, 1, 0x00, 0, 63, 0])
    return (
        b"\xff\xd8"
        + _dqt_segment(0, q.astype(np.int64))
        + _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + _dht_segment(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + sof + sos + writer.flush() + b"\xff\xd9"
    )


def encode_rgb_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """uint8 (h, w, 3) RGB -> baseline YCbCr 4:2:0 JPEG."""
    img = np.asarray(img)
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_rgb_jpeg wants uint8 (h, w, 3)")
    h, w = img.shape[:2]
    f = img.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    cb = 128.0 - 0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2]
    cr = 128.0 + 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2]
    # 4:2:0: chroma planes subsampled 2x2 (box mean) over the 16-padded Y
    yp = _pad_to_blocks(y - 128.0, 16)
    cbp = _pad_to_blocks(cb, 16)
    crp = _pad_to_blocks(cr, 16)
    sub = lambda p: (  # noqa: E731
        p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))
        - 128.0
    )
    cbs, crs = sub(cbp), sub(crp)
    ql = _quality_scale(QT_LUMA, quality).reshape(8, 8).astype(np.float64)
    qc = _quality_scale(QT_CHROMA, quality).reshape(8, 8).astype(np.float64)
    dcl = _build_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    acl = _build_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dcc = _build_huffman_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    acc = _build_huffman_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    writer = _BitWriter()
    preds = [0, 0, 0]
    for my in range(yp.shape[0] // 16):
        for mx in range(yp.shape[1] // 16):
            for by in range(2):
                for bx in range(2):
                    y0, x0 = my * 16 + by * 8, mx * 16 + bx * 8
                    preds[0] = _encode_blocks(
                        writer, yp[y0 : y0 + 8, x0 : x0 + 8], ql,
                        dcl, acl, preds[0],
                    )
            y0, x0 = my * 8, mx * 8
            preds[1] = _encode_blocks(
                writer, cbs[y0 : y0 + 8, x0 : x0 + 8], qc, dcc, acc, preds[1]
            )
            preds[2] = _encode_blocks(
                writer, crs[y0 : y0 + 8, x0 : x0 + 8], qc, dcc, acc, preds[2]
            )
    sof = (
        b"\xff\xc0" + (17).to_bytes(2, "big") + bytes([8])
        + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    )
    sos = (
        b"\xff\xda" + (12).to_bytes(2, "big")
        + bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    )
    return (
        b"\xff\xd8"
        + _dqt_segment(0, ql.astype(np.int64))
        + _dqt_segment(1, qc.astype(np.int64))
        + _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + _dht_segment(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        + _dht_segment(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
        + sof + sos + writer.flush() + b"\xff\xd9"
    )
