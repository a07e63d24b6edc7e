"""From-scratch RIFF/WAVE codec + audio feature pins: container
round-trips for PCM16/PCM8/float32 mono+stereo, chunk-walking past
unknown chunks, corrupt-container rejection, and closed-form feature
oracles (pure tones read back their own frequency, RMS amplitude/√2,
and 2f−1-ish zero crossings)."""

import numpy as np
import pytest

from demeton_spark import audio


def _tone(freq=440.0, rate=8000, n=8000, amp=12000.0):
    t = np.arange(n)
    return np.round(amp * np.sin(2 * np.pi * freq * t / rate)).astype(np.int16)


def test_wav_pcm16_round_trip_mono():
    s = _tone()
    data = audio.encode_wav(s, 8000)
    got, rate = audio.decode_wav(data)
    assert rate == 8000
    assert got.shape == (8000, 1)
    assert np.array_equal(np.round(got[:, 0] * 32768).astype(np.int16), s)


def test_wav_pcm16_round_trip_stereo():
    left, right = _tone(440), _tone(880)
    s = np.stack([left, right], axis=1)
    got, rate = audio.decode_wav(audio.encode_wav(s, 44100))
    assert rate == 44100
    assert got.shape == (8000, 2)
    assert np.array_equal(np.round(got * 32768).astype(np.int16), s)


def test_wav_float32_round_trip():
    s = (_tone().astype(np.float32)) / 32768.0
    got, rate = audio.decode_wav(audio.encode_wav(s, 16000, fmt=3))
    assert rate == 16000
    np.testing.assert_allclose(got[:, 0], s.astype(np.float64), atol=1e-7)


def test_wav_skips_unknown_chunks_and_word_aligns():
    s = _tone(n=601)  # odd payload length → pad byte
    data = bytearray(audio.encode_wav(s, 8000))
    # splice a LIST chunk (odd length → padded) between fmt and data
    list_chunk = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    insert_at = data.find(b"data")
    data[insert_at:insert_at] = list_chunk
    data[4:8] = (len(data) - 8).to_bytes(4, "little")
    got, rate = audio.decode_wav(bytes(data))
    assert np.array_equal(np.round(got[:, 0] * 32768).astype(np.int16), s)


def test_wav_rejects_corrupt():
    with pytest.raises(ValueError, match="RIFF"):
        audio.decode_wav(b"OggS" + b"\x00" * 40)
    good = audio.encode_wav(_tone(n=100), 8000)
    with pytest.raises(ValueError, match="truncated"):
        audio.decode_wav(good[:40])
    # fmt chunk present but data chunk missing
    no_data = good[: good.find(b"data")]
    no_data = no_data[:4] + (len(no_data) - 8).to_bytes(4, "little") + no_data[8:]
    with pytest.raises(ValueError, match="missing"):
        audio.decode_wav(no_data)
    with pytest.raises(ValueError, match="unsupported"):
        # format tag 85 = mp3-in-wav
        bad = bytearray(good)
        bad[good.find(b"fmt ") + 8] = 85
        audio.decode_wav(bytes(bad))


def test_features_pure_tone_closed_form():
    rate, n, freq, amp = 8000, 8000, 400.0, 16000.0
    f = audio.wav_features(audio.encode_wav(_tone(freq, rate, n, amp), rate))
    assert f["n_samples"] == n
    assert f["duration_ms"] == 1000.0
    # RMS of a sine is amp/√2 (rounding to int16 costs < 1)
    assert abs(f["rms"] - amp / np.sqrt(2)) < 1.0
    assert abs(f["peak"] - amp) <= 1
    # 400 Hz over 1 s crosses zero ~800 times
    assert abs(f["zero_crossings"] - 2 * freq) <= 2
    # an integral number of periods puts all rfft energy in one bin
    assert abs(f["spectral_centroid_hz"] - freq) < 2.0


def test_features_silence_and_dc():
    rate = 8000
    silent = np.zeros(100, dtype=np.int16)
    f = audio.wav_features(audio.encode_wav(silent, rate))
    assert f["rms"] == 0.0 and f["peak"] == 0 and f["zero_crossings"] == 0
    assert f["spectral_centroid_hz"] == 0.0
    dc = np.full(100, 5000, dtype=np.int16)
    f = audio.wav_features(audio.encode_wav(dc, rate))
    assert f["zero_crossings"] == 0
    # DC bin is excluded → no spectral content
    assert f["spectral_centroid_hz"] == pytest.approx(0.0, abs=1e-6)


def test_features_stereo_downmix():
    left = _tone(440, amp=10000)
    anti = (-left).astype(np.int16)
    s = np.stack([left, anti], axis=1)  # downmix cancels to (near) zero
    f = audio.wav_features(audio.encode_wav(s, 8000))
    assert f["rms"] < 1.0


def test_pcm8_decode():
    s16 = _tone(amp=15000)
    u8 = ((s16.astype(np.int32) + 32768) // 256).astype(np.uint8)
    # hand-build an 8-bit PCM container
    import struct

    fmt_chunk = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    payload = u8.tobytes()
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    got, rate = audio.decode_wav(data)
    assert rate == 8000
    # 8-bit quantization error ≤ 1/128 of full scale
    np.testing.assert_allclose(
        got[:, 0], s16.astype(np.float64) / 32768.0, atol=1 / 127
    )


def test_audio_contract_query_matches_duckdb_oracle(spark):
    """Full parity: q_audio_features decodes WAV bytes in Spark while
    the DuckDB oracle regenerates the integer sample series from the
    (a, n, rate) params — identical rows out of both engines."""
    import duckdb
    import pandas as pd

    from demeton_spark.queries import SQL_AUDIO_FEATURES, q_audio_features

    got = (
        q_audio_features(spark, "/root/testdata/sf0.001")
        .toPandas()
        .sort_values("audio_id")
        .reset_index(drop=True)
    )
    sql = SQL_AUDIO_FEATURES.replace("sf0.01", "sf0.001")
    want = (
        duckdb.connect()
        .execute(sql)
        .df()
        .sort_values("audio_id")
        .reset_index(drop=True)[got.columns]
    )
    assert len(got) == 50  # audio_clips_for_sf(0.001)
    pd.testing.assert_frame_equal(
        got.astype({"sample_rate": "int32", "peak": "int32"}),
        want.astype({"sample_rate": "int32", "peak": "int32"}),
    )


def test_audio_generator_deterministic():
    from demeton_spark.synth import audio_clip_params, audio_clip_samples

    a, n, rate = audio_clip_params(7)
    s1, s2 = audio_clip_samples(a, n), audio_clip_samples(a, n)
    assert np.array_equal(s1, s2)
    assert s1.dtype == np.int16 and len(s1) == n
    # the series touches zero sometimes (exercises the ZCR zero-removal)
    all_samples = np.concatenate(
        [audio_clip_samples(*audio_clip_params(i)[:2]) for i in range(50)]
    )
    assert (all_samples == 0).any()
