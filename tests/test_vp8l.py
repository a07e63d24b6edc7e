"""From-scratch lossless WebP (VP8L) codec round trips and container
handling.  The reference decodes PNG/TIFF/HGT only (Png/File.fs:19-53,
Aw3d/Funcs.fs:180-261); VP8L is LLM-extras surface for web-corpus image
tables — see demeton_spark/vp8l.py module docstring."""

import struct

import numpy as np
import pytest

from demeton_spark import vp8l


def _rand_rgba(shape, seed):
    return np.random.default_rng(seed).integers(
        0, 256, size=shape + (4,), dtype=np.uint8
    )


@pytest.mark.parametrize("shape", [(1, 1), (3, 5), (16, 16), (33, 17), (7, 64)])
def test_roundtrip_shapes(shape):
    img = _rand_rgba(shape, sum(shape))
    out = vp8l.decode_webp(vp8l.encode_webp(img))
    assert out.shape == shape + (4,)
    assert np.array_equal(out, img)


@pytest.mark.parametrize("subtract_green", [False, True])
@pytest.mark.parametrize("cache_bits", [0, 1, 4, 8])
@pytest.mark.parametrize("rle", [False, True])
def test_roundtrip_encoder_options(subtract_green, cache_bits, rle):
    """Every encoder path (subtract-green transform, color cache sizes,
    distance-1 LZ77 runs) exercises a distinct decoder branch."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(13, 9, 4), dtype=np.uint8)
    # inject runs so rle=True actually emits backward references
    img[4:7, :] = img[4, 0]
    blob = vp8l.encode_webp(
        img, subtract_green=subtract_green, cache_bits=cache_bits, rle=rle
    )
    assert np.array_equal(vp8l.decode_webp(blob), img)


def test_roundtrip_gray_and_rgb_inputs():
    g = np.arange(48, dtype=np.uint8).reshape(6, 8)
    out = vp8l.decode_webp(vp8l.encode_webp(g))
    assert np.array_equal(out[..., 0], g)
    assert np.array_equal(out[..., 1], g)
    assert np.array_equal(out[..., 2], g)
    assert (out[..., 3] == 255).all()

    rgb = _rand_rgba((5, 7), 2)[..., :3].copy()
    out = vp8l.decode_webp(vp8l.encode_webp(rgb))
    assert np.array_equal(out[..., :3], rgb)
    assert (out[..., 3] == 255).all()


def test_low_entropy_image_hits_simple_codes():
    """A constant image drives 1-symbol alphabets (the 'simple' prefix
    code form) through both the writer and the reader."""
    img = np.full((9, 9, 4), 77, dtype=np.uint8)
    blob = vp8l.encode_webp(img)
    assert np.array_equal(vp8l.decode_webp(blob), img)
    # and with a run-length encoder the whole payload is one literal +
    # backref chain (1-symbol codes make both forms ~0 bits/px already)
    blob2 = vp8l.encode_webp(img, rle=True)
    assert np.array_equal(vp8l.decode_webp(blob2), img)


def test_container_skips_unknown_chunks_and_pads_odd_sizes():
    img = _rand_rgba((4, 4), 5)
    blob = vp8l.encode_webp(img)
    # splice an odd-sized unknown chunk between the header and VP8L
    vp8l_off = blob.index(b"VP8L")
    extra = b"XTRA" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    spliced = blob[:vp8l_off] + extra + blob[vp8l_off:]
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    assert np.array_equal(vp8l.decode_webp(spliced), img)


def test_container_rejections():
    with pytest.raises(ValueError):
        vp8l.decode_webp(b"\x01\x02")
    with pytest.raises(ValueError):
        vp8l.decode_webp(b"RIFF\x04\x00\x00\x00WAVE")
    # lossy VP8 chunk → explicit rejection (quarantine upstream)
    lossy = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " + struct.pack("<I", 0)
    with pytest.raises(ValueError, match="lossy"):
        vp8l.decode_webp(lossy)
    # RIFF/WEBP with no VP8L chunk at all
    empty = b"RIFF" + struct.pack("<I", 4) + b"WEBP"
    with pytest.raises(ValueError):
        vp8l.decode_webp(empty)
    # truncated VP8L payload mid-bitstream
    img = _rand_rgba((8, 8), 6)
    blob = vp8l.encode_webp(img)
    with pytest.raises(Exception):
        vp8l.decode_webp(blob[: len(blob) - 6])
    # bad VP8L signature byte
    off = blob.index(b"VP8L") + 8
    bad = bytearray(blob)
    bad[off] = 0x30
    with pytest.raises(ValueError):
        vp8l.decode_webp(bytes(bad))


def test_inv_subtract_green_inverts_forward():
    rng = np.random.default_rng(8)
    argb = rng.integers(0, 2**32, size=(6, 6), dtype=np.uint64).astype(np.uint32)
    g = (argb >> 8) & 0xFF
    r = (((argb >> 16) & 0xFF) - g) & 0xFF
    b = ((argb & 0xFF) - g) & 0xFF
    fwd = (argb & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b
    assert np.array_equal(vp8l._inv_subtract_green(fwd), argb)


def test_palette_width_bits_boundaries():
    assert vp8l._palette_width_bits(2) == 3
    assert vp8l._palette_width_bits(3) == 2
    assert vp8l._palette_width_bits(4) == 2
    assert vp8l._palette_width_bits(5) == 1
    assert vp8l._palette_width_bits(16) == 1
    assert vp8l._palette_width_bits(17) == 0


def test_inv_color_indexing_bundled_pixels():
    """4-entry palette → 2-bit indices, 4 pixels bundled per green byte
    (spec §4.4 pixel bundling)."""
    palette = np.array(
        [0xFF000000, 0xFF0000FF, 0xFF00FF00, 0xFFFF0000], dtype=np.uint32
    )
    # one bundled pixel holding indices [1, 0, 3, 2] (LSB-first in green)
    green = 1 | (0 << 2) | (3 << 4) | (2 << 6)
    img = np.array([[np.uint32(green) << 8]], dtype=np.uint32)
    out = vp8l._inv_color_indexing(img, palette, 4)
    assert out.tolist() == [[0xFF0000FF, 0xFF000000, 0xFFFF0000, 0xFF00FF00]]
    # width smaller than the bundle truncates
    out3 = vp8l._inv_color_indexing(img, palette, 3)
    assert out3.shape == (1, 3)


def test_decode_images_webp_via_spark(spark):
    """End-to-end through the mapInPandas decode path."""
    from demeton_spark import multimodal

    rgba = _rand_rgba((6, 5), 13)
    rows = [("w0", bytearray(vp8l.encode_webp(rgba)), 5, 6, "webp", "cap", 0)]
    df = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )
    out = multimodal.decode_images(df).collect()
    assert len(out) == 1
    want = np.round(
        0.299 * rgba[..., 0].astype(np.float64)
        + 0.587 * rgba[..., 1]
        + 0.114 * rgba[..., 2]
    ).astype(np.int16)
    have = np.frombuffer(out[0]["pixels"], dtype=np.int16).reshape(6, 5)
    assert np.array_equal(have, want)
