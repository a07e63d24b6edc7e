"""From-scratch RIFF/WAVE PCM codec + numpy audio features.

The reference engine has no audio path at all (it decodes PNG/TIFF/HGT
rasters only — /root/reference/Demeton/Png/File.fs:19-53,
Aw3d/Funcs.fs:180-261); this module is part of the LLM-training-data
extras: multimodal tables carry audio as opaque ``binary`` columns and
the engine must decode + featurize them at scale.  WAV/PCM is a real
container + sample format and needs no codec library, so — mirroring
the reference's from-scratch PNG ethos — both the container walk and
the sample decode are implemented here in pure numpy: RIFF chunk
parsing (unknown chunks skipped, word-aligned), PCM 16-bit / unsigned
8-bit (format 1) and IEEE float32 (format 3), mono or interleaved
multi-channel.  Compressed audio (mp3/aac/ogg/flac) stays out of
scope: those DO need entropy-coder DSP stacks that would dwarf the
engine, and the tables this engine targets carry raw or
WAV-wrapped PCM.

Features are the standard corpus-curation set: duration, RMS energy,
peak, zero-crossing count (waveform-domain) and spectral centroid
(one rfft over the mean-channel signal).  All but the centroid are
SQL-expressible, so the ``audio_features`` contract query gets a full
DuckDB oracle; the centroid is pinned against closed-form tones in
pytest.
"""

from __future__ import annotations

import struct

import numpy as np

_WAVE_FORMAT_PCM = 1
_WAVE_FORMAT_IEEE_FLOAT = 3


def encode_wav(
    samples: np.ndarray, sample_rate: int, fmt: int = _WAVE_FORMAT_PCM
) -> bytes:
    """Samples → canonical RIFF/WAVE bytes.

    ``samples`` is int16 (PCM) or float32 (IEEE float), shape ``(n,)``
    mono or ``(n, channels)`` interleaved on write.
    """
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    if fmt == _WAVE_FORMAT_PCM:
        payload = np.ascontiguousarray(samples.astype("<i2")).tobytes()
        bits = 16
    elif fmt == _WAVE_FORMAT_IEEE_FLOAT:
        payload = np.ascontiguousarray(samples.astype("<f4")).tobytes()
        bits = 32
    else:
        raise ValueError(f"unsupported WAVE format {fmt}")
    block_align = channels * bits // 8
    fmt_chunk = struct.pack(
        "<HHIIHH",
        fmt,
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    body = (
        b"WAVEfmt "
        + struct.pack("<I", len(fmt_chunk))
        + fmt_chunk
        + b"data"
        + struct.pack("<I", len(payload))
        + payload
    )
    if len(payload) % 2:
        body += b"\x00"  # RIFF chunks are word-aligned
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → ``(samples, sample_rate)``.

    Samples come back as float64 in [-1, 1) regardless of the on-disk
    format (int16 ÷ 32768, uint8 recentered ÷ 128, float32 as-is) with
    shape ``(n, channels)``.  Walks the chunk list properly — unknown
    chunks (LIST, fact, cue…) are skipped with word alignment — and
    raises ``ValueError`` on corrupt containers so the multimodal
    quarantine path can route poison rows.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    riff_len = struct.unpack_from("<I", data, 4)[0]
    if 8 + riff_len > len(data):
        raise ValueError("truncated WAVE stream (declared RIFF length exceeds data)")
    end = 8 + riff_len
    pos = 12
    fmt_info: tuple[int, int, int, int] | None = None
    payload: bytes | None = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        clen = struct.unpack_from("<I", data, pos + 4)[0]
        cstart = pos + 8
        if cstart + clen > end:
            raise ValueError(f"truncated WAVE chunk {cid!r}")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("fmt chunk too short")
            wf, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", data, cstart
            )
            if wf == 0xFFFE and clen >= 26:  # WAVE_FORMAT_EXTENSIBLE
                wf = struct.unpack_from("<H", data, cstart + 24)[0]
            fmt_info = (wf, channels, rate, bits)
        elif cid == b"data":
            payload = data[cstart : cstart + clen]
        pos = cstart + clen + (clen & 1)  # word-aligned
    if fmt_info is None or payload is None:
        raise ValueError("WAVE stream missing fmt or data chunk")
    wf, channels, rate, bits = fmt_info
    if channels < 1:
        raise ValueError("WAVE stream with zero channels")
    if wf == _WAVE_FORMAT_PCM and bits == 16:
        flat = np.frombuffer(
            payload[: len(payload) // 2 * 2], "<i2"
        ).astype(np.float64) / 32768.0
    elif wf == _WAVE_FORMAT_PCM and bits == 8:
        flat = (
            np.frombuffer(payload, np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    elif wf == _WAVE_FORMAT_IEEE_FLOAT and bits == 32:
        flat = np.frombuffer(
            payload[: len(payload) // 4 * 4], "<f4"
        ).astype(np.float64)
    else:
        raise ValueError(f"unsupported WAVE format {wf} / {bits}-bit")
    n = len(flat) // channels
    return flat[: n * channels].reshape(n, channels), rate


def wav_features(data: bytes) -> dict[str, float]:
    """Decode a WAV payload and compute the curation feature set.

    Multi-channel audio is mean-downmixed first.  ``zero_crossings``
    counts sign flips over the zero-removed sample sequence (the
    standard ZCR convention — a sample sitting exactly on zero joins
    its neighbours rather than breaking the crossing; in SQL this is a
    lag over the ``value != 0`` subsequence, still fully
    oracle-expressible); ``rms``/``peak`` are computed on the raw
    integer-scaled domain (×32768) so PCM16 features are integers the
    oracle can reproduce without float division.
    """
    samples, rate = decode_wav(data)
    mono = samples.mean(axis=1)
    raw = np.round(mono * 32768.0)  # back to the PCM16 lattice
    n = len(raw)
    nz = raw[raw != 0.0]
    zc = int(np.sum(nz[1:] * nz[:-1] < 0)) if len(nz) > 1 else 0
    centroid = spectral_centroid(mono, rate)
    return {
        "n_samples": n,
        "sample_rate": rate,
        "duration_ms": n * 1000.0 / rate if rate else 0.0,
        "rms": float(np.sqrt(np.mean(raw**2))) if n else 0.0,
        "peak": int(np.max(np.abs(raw))) if n else 0,
        "zero_crossings": zc,
        "spectral_centroid_hz": centroid,
    }


def spectral_centroid(mono: np.ndarray, rate: int) -> float:
    """Magnitude-weighted mean frequency of one rfft over the whole
    clip (DC bin excluded so silence/offset doesn't read as 0 Hz
    content).  Pure tones read back their own frequency to within the
    rfft bin width — pinned in tests."""
    if len(mono) < 2 or not rate:
        return 0.0
    # demean so a DC offset contributes exactly zero (excluding bin 0
    # alone leaves ~1e-13 numerical leakage whose weighted mean is junk)
    mag = np.abs(np.fft.rfft(mono - mono.mean()))[1:]
    total = mag.sum()
    if total == 0.0:
        return 0.0
    freqs = np.fft.rfftfreq(len(mono), d=1.0 / rate)[1:]
    return float((freqs * mag).sum() / total)
