"""Minimal real WAV (RIFF/PCM) codec — stdlib only (`wave` + struct).

Companion to :mod:`k8e_fetch_spark.operators.png`: the multimodal
mandate (SURVEY.md §2.6) covers audio as well as images, and the
container ships no audio library — but 16-bit PCM WAV is fully
parseable with the standard library's ``wave`` module (RIFF chunk
walk) plus ``struct`` for the sample words. Real bytes in, exact
sample values out; no fake.

Used by ``decode_media_wav`` (operators/multimodal.py) inside the same
iterator-``mapInPandas`` Arrow stage as the image path; pinned by
round-trip and independent-stats tests in tests/test_multimodal.py.
"""

from __future__ import annotations

import io
import struct
import wave


def encode_wav(sample_rate: int, channels: int, samples: list[int]) -> bytes:
    """Write a real 16-bit PCM WAV. ``samples`` is interleaved frames
    (len divisible by ``channels``), each in -32768..32767."""
    if len(samples) % channels:
        raise ValueError("sample count not divisible by channel count")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, int, int, list[int]]:
    """Parse a WAV and return ``(sample_rate, channels, n_frames,
    samples)`` with samples interleaved 16-bit ints. Raises ValueError
    for non-WAV bytes or non-16-bit encodings (the decode stage
    quarantines those rows rather than failing the task)."""
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            if w.getsampwidth() != 2:
                raise ValueError(f"unsupported sample width {w.getsampwidth()}")
            rate = w.getframerate()
            channels = w.getnchannels()
            n_frames = w.getnframes()
            raw = w.readframes(n_frames)
    except wave.Error as e:
        raise ValueError(f"not a PCM WAV: {e}") from e
    n = len(raw) // 2
    return rate, channels, n_frames, list(struct.unpack(f"<{n}h", raw[: 2 * n]))
