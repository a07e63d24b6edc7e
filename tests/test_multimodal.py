"""Multimodal plumbing: real png16/hgt decode, per-row phash/caption
invariant, area-weighted resize vs the numpy kernel, feature extraction,
deterministic-fake frame sampling, and quarantine routing."""

import numpy as np
import pytest

from demeton_spark import kernels, multimodal, synth
from demeton_spark.synth import WorldSpec

SPEC = WorldSpec(lon0=13, lat0=45, n_tiles_x=2, n_tiles_y=1, tile_size=30, block_size=10)


@pytest.fixture(scope="module")
def images(spark):
    df = synth.images_df(spark, SPEC, num_partitions=3).cache()
    df.count()
    return df


def test_decode_images_roundtrip(spark, images):
    decoded = multimodal.decode_images(images)
    rows = {r["image_id"]: r for r in decoded.collect()}
    assert len(rows) == SPEC.n_rows
    src = {r["image_id"]: r for r in images.collect()}
    for iid, r in rows.items():
        block = np.frombuffer(r["pixels"], dtype=np.int16)
        assert block.shape == (r["w"] * r["h"],)
        assert r["caption"] == src[iid]["caption"]


def test_verify_images_invariant(spark, images):
    v = multimodal.verify_images(images)
    agg = v.selectExpr(
        "count(*) as n",
        "sum(cast(phash_ok as int)) as p_ok",
        "sum(cast(caption_ok as int)) as c_ok",
    ).collect()[0]
    assert agg["n"] == SPEC.n_rows
    assert agg["p_ok"] == SPEC.n_rows  # decoded pixels hash to phash
    assert agg["c_ok"] == SPEC.n_rows


def test_resize_matches_numpy_oracle(spark, images):
    decoded = multimodal.decode_images(images)
    resized = multimodal.resize_images(decoded, 4, 4)
    got = {r["image_id"]: r for r in resized.collect()}
    for r in decoded.collect():
        block = np.frombuffer(r["pixels"], dtype=np.int16).reshape(
            r["h"], r["w"]
        )
        want = kernels.resample_area_weighted(block, 4, 4)
        have = np.frombuffer(got[r["image_id"]]["pixels"], dtype=np.int16).reshape(4, 4)
        assert np.array_equal(have, want), r["image_id"]


def test_image_features(spark, images):
    feats = multimodal.image_features(multimodal.decode_images(images))
    rows = feats.collect()
    assert len(rows) == SPEC.n_rows
    for r in rows:
        assert r["min_h"] <= r["max_h"]
        assert r["grad_energy"] >= 0.0
    # blocks with holes report missing pixels
    assert any(r["missing_px"] > 0 for r in rows)


def test_webp_decode_and_quarantine(spark):
    from demeton_spark import vp8l

    rgba = np.random.default_rng(3).integers(0, 256, size=(4, 4, 4), dtype=np.uint8)
    blob = vp8l.encode_webp(rgba)
    rows = [
        ("a", bytearray(blob), 4, 4, "webp", "x", 0),
        ("b", bytearray(b"\x01\x02"), 4, 4, "flac", "x", 0),  # unknown fmt
        ("c", bytearray(b"\x01\x02"), 4, 4, "jpeg", "x", 0),  # corrupt
        ("d", bytearray(b"\x01\x02"), 4, 4, "webp", "x", 0),  # corrupt
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
    )
    # unknown format / corrupt payloads raise through by default…
    with pytest.raises(Exception):
        multimodal.decode_images(df).collect()
    # …and are skippable (quarantine-style); real webp decodes via the
    # from-scratch VP8L codec (jpeg likewise — tests/test_jpeg.py)
    ok = multimodal.decode_images(df, on_error="skip").collect()
    assert [r["image_id"] for r in ok] == ["a"]
    want = np.round(
        0.299 * rgba[..., 0].astype(np.float64)
        + 0.587 * rgba[..., 1]
        + 0.114 * rgba[..., 2]
    ).astype(np.int16)
    have = np.frombuffer(ok[0]["pixels"], dtype=np.int16).reshape(4, 4)
    assert np.array_equal(have, want)


def test_frame_sample(spark):
    frames = np.arange(3 * 2 * 2, dtype=np.int16)  # 3 frames of 2×2
    df = spark.createDataFrame(
        [("v0", bytearray(frames.tobytes()))], "video_id string, bytes binary"
    )
    out = multimodal.frame_sample(df, 2, 2, every_k=2).collect()
    assert [(r["video_id"], r["frame_idx"]) for r in out] == [("v0", 0), ("v0", 2)]
    f0 = np.frombuffer(out[0]["frame"], dtype=np.int16)
    assert f0.tolist() == [0, 1, 2, 3]


def test_frame_sample_animated_gif(spark):
    """Real video path: animated GIF rows decode frame-by-frame via the
    from-scratch decoder; compositing means frame k is the full canvas."""
    from demeton_spark import codec

    base = np.full((4, 6), 10, np.uint8)
    patch = np.full((2, 2), 250, np.uint8)
    frames = [base] + [patch] * 4  # 5 frames, patches at varying spots
    rects = [None, (0, 0), (2, 1), (4, 2), (1, 0)]
    blob = codec.encode_gif_anim(frames, rects=rects)
    rows = [
        ("g0", bytearray(blob), "gif"),
        ("bad", bytearray(b"GIF89a\x00"), "gif"),
        ("r0", bytearray(np.arange(24 * 2, dtype=np.int16).tobytes()), "rawi16"),
        ("h264", bytearray(b"\x00\x00\x01"), "h264"),  # unsupported codec
    ]
    df = spark.createDataFrame(rows, "video_id string, bytes binary, fmt string")
    with pytest.raises(Exception):
        multimodal.frame_sample(df, 6, 4, every_k=2).collect()
    out = multimodal.frame_sample(df, 6, 4, every_k=2, on_error="skip").collect()
    got = {(r["video_id"], r["frame_idx"]): r["frame"] for r in out}
    assert set(got) == {("g0", 0), ("g0", 2), ("g0", 4), ("r0", 0)}
    # frame 2 = base + patch at (x=2, y=1) composited over patch@(0,0)
    want = base.astype(np.int16).copy()
    want[0:2, 0:2] = 250
    want[1:3, 2:4] = 250
    have = np.frombuffer(got[("g0", 2)], dtype=np.int16).reshape(4, 6)
    assert np.array_equal(have, want)
    # canvas-size mismatch is a decode error → quarantined under skip
    df_bad_size = spark.createDataFrame(
        [("g1", bytearray(blob), "gif")], "video_id string, bytes binary, fmt string"
    )
    assert multimodal.frame_sample(df_bad_size, 5, 5, on_error="skip").count() == 0


def test_audio_features_end_to_end(spark):
    """audio_features decodes real WAV/PCM payloads via mapInPandas and
    quarantines corrupt containers under on_error='skip'."""
    from demeton_spark import audio as audio_codec

    t = np.arange(8000)
    tone = np.round(
        12000.0 * np.sin(2 * np.pi * 440.0 * t / 8000.0)
    ).astype(np.int16)
    rows = [
        ("a0", bytearray(audio_codec.encode_wav(tone, 8000))),
        ("bad", bytearray(b"OggS" + b"\x00" * 64)),
    ]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary")
    out = {r["audio_id"]: r for r in multimodal.audio_features(df, on_error="skip").collect()}
    assert set(out) == {"a0"}  # corrupt row quarantined
    r = out["a0"]
    assert r["n_samples"] == 8000 and r["sample_rate"] == 8000
    assert r["duration_ms"] == 1000.0
    assert abs(r["spectral_centroid_hz"] - 440.0) < 2.0
    with pytest.raises(Exception):  # raise mode surfaces the decode error
        multimodal.audio_features(df).collect()


def test_decode_tiff_format(spark):
    from demeton_spark import codec as _codec

    arr = np.arange(16, dtype=np.int16).reshape(4, 4)
    rows = [("t0", bytearray(_codec.encode_tiff_gray16(arr)), 4, 4, "tiff", "x", 0)]
    df = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )
    out = multimodal.decode_images(df).collect()
    got = np.frombuffer(out[0]["pixels"], dtype=np.int16).reshape(4, 4)
    assert np.array_equal(got, arr)


def test_phash_near_dup_matches_bruteforce(spark):
    """phash_near_dup_pairs (16x4-bit Hamming banding over signed int64)
    must equal the brute-force all-pairs oracle, including negative
    hashes and planted 1/2-bit flips."""
    import itertools

    from demeton_spark.queries import phash_near_dup_pairs

    rng = np.random.default_rng(7)
    base = rng.integers(-(2**62), 2**62, size=6, dtype=np.int64)
    rows = []
    for g, b in enumerate(base):
        rows.append((f"g{g}_orig", int(b)))
        rows.append((f"g{g}_flip1", int(b ^ np.int64(1 << int(rng.integers(0, 63))))))
        p1, p2 = rng.choice(63, size=2, replace=False)
        rows.append((f"g{g}_flip2", int(b ^ np.int64(1 << int(p1)) ^ np.int64(1 << int(p2)))))
    df = spark.createDataFrame(rows, "image_id string, phash long")
    got = {
        (r["image_id_a"], r["image_id_b"], r["hamming"])
        for r in phash_near_dup_pairs(df, max_hamming=2).collect()
    }
    expect = set()
    for (ia, ha), (ib, hb) in itertools.combinations(rows, 2):
        d = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
        if d <= 2:
            a, b = sorted((ia, ib))
            expect.add((a, b, d))
    assert got == expect
    assert len(expect) >= 6  # every group's orig<->flip1 pair at least


def test_phash_banding_complete_under_both_layouts(spark):
    """Completeness holds under BOTH corpus-scaled band layouts
    (16x4 small-corpus, 8x8 production): every pair at hamming <= h is
    found because h < n_bands leaves a clean shared band (pigeonhole).
    Exercises h up to 5 with planted multi-bit flips that straddle band
    boundaries."""
    import itertools

    from demeton_spark.queries import (
        phash_bands_for_corpus,
        phash_near_dup_pairs,
    )

    assert phash_bands_for_corpus(10**6, 2) == (16, 4)
    assert phash_bands_for_corpus(10**6 + 1, 2) == (8, 8)

    rng = np.random.default_rng(23)
    base = rng.integers(-(2**62), 2**62, size=4, dtype=np.int64)
    rows = []
    for g, b in enumerate(base):
        rows.append((f"g{g}_orig", int(b)))
        for k in (1, 3, 5):  # k-bit flips, positions crossing 4/8-bit bands
            v = int(b)
            for p in rng.choice(64, size=k, replace=False):
                v ^= 1 << int(p)
                v = (v + 2**63) % 2**64 - 2**63  # keep signed-int64 range
            rows.append((f"g{g}_flip{k}", v))
    df = spark.createDataFrame(rows, "image_id string, phash long")
    expect = set()
    for (ia, ha), (ib, hb) in itertools.combinations(rows, 2):
        d = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
        if d <= 5:
            a, b = sorted((ia, ib))
            expect.add((a, b, d))
    for corpus in (10**6, 10**7):  # 16x4 and 8x8 layouts
        got = {
            (r["image_id_a"], r["image_id_b"], r["hamming"])
            for r in phash_near_dup_pairs(
                df, max_hamming=5, corpus_rows=corpus
            ).collect()
        }
        assert got == expect, f"corpus={corpus}"
    assert len(expect) >= 12


def test_phash_bands_reject_incomplete_hamming():
    from demeton_spark.queries import phash_bands_for_corpus

    with pytest.raises(ValueError):
        phash_bands_for_corpus(100, 8)


def test_bmp_gif_decode_through_spark(spark):
    """BMP and GIF rows decode through the mapInPandas path (from-scratch
    codecs in demeton_spark.codec); color payloads land as ITU-R 601
    luma int16 blocks, corrupt payloads quarantine under skip."""
    from demeton_spark import codec

    rng = np.random.default_rng(77)
    gray = rng.integers(0, 256, (6, 5), dtype=np.uint8)
    rgb = rng.integers(0, 256, (4, 7, 3), dtype=np.uint8)
    rows = [
        ("bmp_g", bytearray(codec.encode_bmp_gray8(gray)), 5, 6, "bmp", "c", 0),
        ("bmp_c", bytearray(codec.encode_bmp_rgb24(rgb)), 7, 4, "bmp", "c", 0),
        ("gif_g", bytearray(codec.encode_gif_gray(gray, interlace=True)), 5, 6, "gif", "c", 0),
        ("gif_bad", bytearray(b"GIF89a\x00\x00"), 5, 6, "gif", "c", 0),
    ]
    df = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )
    got = {r["image_id"]: r for r in multimodal.decode_images(df, on_error="skip").collect()}
    assert sorted(got) == ["bmp_c", "bmp_g", "gif_g"]
    g = np.frombuffer(got["bmp_g"]["pixels"], np.int16).reshape(6, 5)
    assert np.array_equal(g, gray.astype(np.int16))
    gi = np.frombuffer(got["gif_g"]["pixels"], np.int16).reshape(6, 5)
    assert np.array_equal(gi, gray.astype(np.int16))
    luma = np.round(
        0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    ).astype(np.int16)
    c = np.frombuffer(got["bmp_c"]["pixels"], np.int16).reshape(4, 7)
    assert np.array_equal(c, luma)
