"""Minimal real WAV (RIFF) codec — stdlib (struct + wave) + numpy.

Companion to :mod:`k8e_fetch_spark.operators.png`: the multimodal
mandate (SURVEY.md §2.6) covers audio as well as images, and the
container ships no audio library — but RIFF/WAVE is fully parseable
with ``struct``. Real bytes in, exact sample values out; no fake.

Decode handles the encodings a web corpus actually carries: PCM
(WAVE_FORMAT_PCM) at 8-bit unsigned / 16 / 24 / 32-bit signed,
IEEE float32 (WAVE_FORMAT_IEEE_FLOAT), and the WAVE_FORMAT_EXTENSIBLE
wrapper around either. All depths FOLD TO THE 16-BIT SCALE on return
(8-bit shifts up, 24/32-bit shift down, float scales by 32767), so
downstream statistics normalize by one constant regardless of source
precision — the same contract the original 16-bit-only decoder had.
Unsupported encodings (ADPCM, mu-law, ...) raise ValueError — the
decode stage quarantines those rows rather than failing the task.

Used by ``decode_media_wav`` (operators/multimodal.py) inside the same
iterator-``mapInPandas`` Arrow stage as the image path; pinned by
round-trip and independent-stats tests in tests/test_multimodal.py.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

_FMT_PCM = 1
_FMT_FLOAT = 3
_FMT_EXTENSIBLE = 0xFFFE


def encode_wav(
    sample_rate: int, channels: int, samples: list[int], sample_width: int = 2
) -> bytes:
    """Write a real PCM WAV. ``samples`` is interleaved frames (len
    divisible by ``channels``) AT THE 16-BIT SCALE (-32768..32767)
    regardless of ``sample_width`` — width 1 stores the top byte as
    unsigned 8-bit, width 3/4 shift up into 24/32-bit. The default
    16-bit path is byte-identical to previous releases."""
    if len(samples) % channels:
        raise ValueError("sample count not divisible by channel count")
    if sample_width == 2:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(2)
            w.setframerate(sample_rate)
            w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
        return buf.getvalue()
    arr = np.asarray(samples, dtype=np.int64)
    # fail loud on out-of-range input (the struct.pack path for width 2
    # raises struct.error; the numpy casts below would silently wrap,
    # producing corrupt audio bytes instead of an error)
    if arr.size and (arr.min() < -32768 or arr.max() > 32767):
        raise ValueError("sample out of 16-bit range (-32768..32767)")
    if sample_width == 1:
        raw = (((arr >> 8) + 128) & 0xFF).astype(np.uint8).tobytes()
    elif sample_width == 3:
        # low 3 little-endian bytes of each (s << 8) int32
        quads = (arr.astype(np.int32) << 8).astype("<i4").view(np.uint8).reshape(-1, 4)
        raw = quads[:, :3].tobytes()
    elif sample_width == 4:
        raw = (arr.astype(np.int32) << 16).astype("<i4").tobytes()
    else:
        raise ValueError(f"unsupported sample width {sample_width}")
    return _riff(sample_rate, channels, sample_width * 8, _FMT_PCM, raw)


def encode_wav_float32(sample_rate: int, channels: int, samples: list[float]) -> bytes:
    """Write an IEEE float32 WAV (WAVE_FORMAT_IEEE_FLOAT), samples in
    [-1.0, 1.0] interleaved."""
    if len(samples) % channels:
        raise ValueError("sample count not divisible by channel count")
    raw = struct.pack(f"<{len(samples)}f", *samples)
    return _riff(sample_rate, channels, 32, _FMT_FLOAT, raw)


def _riff(rate: int, channels: int, bits: int, fmt: int, raw: bytes) -> bytes:
    block = channels * bits // 8
    fmt_body = struct.pack("<HHIIHH", fmt, channels, rate, rate * block, block, bits)
    data = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    data += b"data" + struct.pack("<I", len(raw)) + raw + (b"\x00" if len(raw) & 1 else b"")
    return b"RIFF" + struct.pack("<I", 4 + len(data)) + b"WAVE" + data


def decode_wav(data: bytes) -> tuple[int, int, int, list[int]]:
    """Parse a WAV and return ``(sample_rate, channels, n_frames,
    samples)`` with samples interleaved ints AT THE 16-BIT SCALE
    (see module docstring for the per-depth folding). Raises
    ValueError for non-WAV bytes or unsupported encodings."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt_body = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("WAV: truncated chunk")
        if cid == b"fmt ":
            fmt_body = body
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)
    if fmt_body is None or raw is None:
        raise ValueError("WAV: missing fmt or data chunk")
    if len(fmt_body) < 16:
        raise ValueError("WAV: short fmt chunk")
    fmt, channels, rate, _byterate, _block, bits = struct.unpack("<HHIIHH", fmt_body[:16])
    if fmt == _FMT_EXTENSIBLE:
        # subformat GUID's leading 2 bytes carry the wrapped format tag
        if len(fmt_body) < 26:
            raise ValueError("WAV: short extensible fmt chunk")
        (fmt,) = struct.unpack("<H", fmt_body[24:26])
    if channels < 1 or rate < 1:
        raise ValueError("WAV: bad fmt fields")
    width = bits // 8
    # depth folding vectorized (numpy) — semantics identical to the
    # per-sample loops this replaces: arithmetic >> on signed ints,
    # round-half-even + clamp for float (np.rint == Python round here)
    if fmt == _FMT_PCM and bits == 8:
        a = np.frombuffer(raw, dtype=np.uint8)
        samples = ((a.astype(np.int16) - 128) << 8).tolist()
    elif fmt == _FMT_PCM and bits == 16:
        n = len(raw) // 2
        samples = np.frombuffer(raw[: 2 * n], dtype="<i2").tolist()
    elif fmt == _FMT_PCM and bits == 24:
        n = len(raw) // 3
        trip = np.frombuffer(raw[: 3 * n], dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        v = trip[:, 0] | (trip[:, 1] << 8) | (trip[:, 2] << 16)
        v -= (v & 0x800000) << 1  # sign-extend 24 -> 32
        samples = (v >> 8).tolist()
    elif fmt == _FMT_PCM and bits == 32:
        n = len(raw) // 4
        samples = (np.frombuffer(raw[: 4 * n], dtype="<i4") >> 16).tolist()
    elif fmt == _FMT_FLOAT and bits == 32:
        n = len(raw) // 4
        v = np.frombuffer(raw[: 4 * n], dtype="<f4").astype(np.float64) * 32767.0
        if not np.isfinite(v).all():
            raise ValueError("WAV: non-finite float sample")  # quarantine, not garbage
        samples = np.clip(np.rint(v), -32768, 32767).astype(np.int64).tolist()
    else:
        raise ValueError(f"WAV: unsupported encoding (format {fmt}, {bits}-bit)")
    n_frames = len(samples) // channels
    return rate, channels, n_frames, samples[: n_frames * channels]
