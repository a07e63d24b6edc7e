"""Baseline JPEG codec: round-trip PSNR, marker/stream robustness, and
the multimodal decode path (real decode + quarantine on corrupt data)."""

import numpy as np
import pytest

from demeton_spark import jpeg


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def _smooth_gray(h: int, w: int) -> np.ndarray:
    """Terrain-like smooth raster (the engine's actual payload shape)."""
    yy, xx = np.mgrid[0:h, 0:w]
    z = 128 + 90 * np.sin(2 * np.pi * xx / 97.0) * np.cos(
        2 * np.pi * yy / 83.0
    )
    return np.clip(np.round(z), 0, 255).astype(np.uint8)


def test_gray_roundtrip_psnr40():
    img = _smooth_gray(60, 60)  # non-multiple-of-8 exercises edge padding
    data = jpeg.encode_gray_jpeg(img, quality=90)
    out = jpeg.decode_jpeg(data)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert _psnr(img, out) >= 40.0  # the input_hint lossy-parity bar


def test_gray_flat_block_is_lossless():
    img = np.full((16, 24), 77, dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_gray_jpeg(img, quality=75))
    assert np.array_equal(out, img)


def test_gray_quality_ladder_monotone():
    img = _smooth_gray(48, 40)
    psnrs = [
        _psnr(img, jpeg.decode_jpeg(jpeg.encode_gray_jpeg(img, quality=q)))
        for q in (25, 50, 90)
    ]
    assert psnrs[0] <= psnrs[1] <= psnrs[2]
    assert psnrs[2] >= 40.0


def test_color_roundtrip_420():
    h, w = 34, 50  # exercises 16-px MCU padding on both axes
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack(
        [
            128 + 80 * np.sin(2 * np.pi * xx / 37.0),
            128 + 80 * np.cos(2 * np.pi * yy / 29.0),
            np.full((h, w), 96.0),
        ],
        axis=-1,
    )
    rgb = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_rgb_jpeg(rgb, quality=90))
    assert out.shape == (h, w, 3)
    # chroma is 4:2:0-subsampled; luma reconstruction is what matters
    luma = lambda a: (  # noqa: E731
        0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    )
    assert _psnr(luma(rgb), luma(out)) >= 38.0
    assert _psnr(rgb, out) >= 30.0


def test_decoder_rejects_corrupt_streams():
    img = _smooth_gray(24, 24)
    good = jpeg.encode_gray_jpeg(img)
    for bad in (
        b"",
        b"\x01\x02",
        b"\xff\xd8\xff\xd9",  # SOI+EOI, no SOF/SOS
        good[: len(good) // 2],  # truncated entropy data
        b"\xff\xd8" + b"\xff\xc2" + good[4:],  # progressive SOF2
    ):
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(bad)


def test_decoder_skips_app_segments():
    img = _smooth_gray(16, 16)
    data = jpeg.encode_gray_jpeg(img)
    # splice an APP0/JFIF header after SOI, as real camera files carry
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01" + bytes(7)
    spliced = data[:2] + app0 + data[2:]
    assert np.array_equal(jpeg.decode_jpeg(spliced), jpeg.decode_jpeg(data))


def test_multimodal_decodes_real_jpeg(spark):
    """fmt='jpeg' rows decode through the real baseline decoder; corrupt
    payloads route to quarantine (on_error='skip')."""
    from demeton_spark import multimodal

    img = _smooth_gray(20, 20)
    payload = jpeg.encode_gray_jpeg(img, quality=90)
    rows = [
        ("good", bytearray(payload), 20, 20, "jpeg", "x", 0),
        ("corrupt", bytearray(b"\x01\x02\x03"), 20, 20, "jpeg", "x", 0),
    ]
    df = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
    with pytest.raises(Exception):
        multimodal.decode_images(df).collect()
    ok = multimodal.decode_images(df, on_error="skip").collect()
    assert [r["image_id"] for r in ok] == ["good"]
    got = np.frombuffer(ok[0]["pixels"], dtype=np.int16).reshape(20, 20)
    assert _psnr(img, got) >= 40.0
