"""Minimal real AVI (RIFF) container codec — stdlib struct only.

Completes the multimodal container trilogy (PNG images, WAV audio —
both real): video was the one modality whose bytes were fully stubbed
("no ffmpeg in this container"). An AVI is the SAME RIFF framing as
WAV, so the container layer — chunk walk, header parse, per-frame
indexing — is fully implementable with the standard library. What
stays stubbed is only the per-frame pixel codec (the '00dc' payloads
are opaque compressed frames); the frame INDEX this parser returns is
exactly what frame-sampling needs, and sampling frames out of a video
never decodes the skipped ones in production either.

Layout written/parsed::

    RIFF 'AVI ' {
      LIST 'hdrl' { 'avih' <56-byte main header> }
      LIST 'movi' { '00dc' <frame bytes> ... }
    }

``decode_avi`` validates the RIFF/AVI magic, every chunk's declared
size against the buffer, and the avih frame count against the frames
actually present — any mismatch raises ValueError so the decode stage
quarantines the row instead of emitting garbage.
"""

from __future__ import annotations

import struct

_AVIH_FMT = "<14I"  # dwMicroSecPerFrame, dwMaxBytesPerSec, dwPaddingGranularity,
# dwFlags, dwTotalFrames, dwInitialFrames, dwStreams, dwSuggestedBufferSize,
# dwWidth, dwHeight, dwReserved[4]


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def encode_avi(
    width: int, height: int, us_per_frame: int, frames: list[bytes]
) -> bytes:
    """Write a minimal real AVI: RIFF framing, 'avih' main header, one
    '00dc' chunk per frame payload."""
    avih = struct.pack(
        _AVIH_FMT,
        us_per_frame,
        0,
        0,
        0,
        len(frames),
        0,
        1,
        0,
        width,
        height,
        0,
        0,
        0,
        0,
    )
    hdrl = _chunk(b"LIST", b"hdrl" + _chunk(b"avih", avih))
    movi = _chunk(b"LIST", b"movi" + b"".join(_chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(data: bytes, pos: int, end: int):
    """Yield (tag, body_start, body_len) for the chunk run in [pos, end)."""
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        body_start = pos + 8
        if body_start + length > end:
            raise ValueError("chunk overruns container")
        yield tag, body_start, length
        pos = body_start + length + (length % 2)  # RIFF pads to even


def decode_avi(data: bytes) -> tuple[int, int, int, int, list[int]]:
    """Parse an AVI container and return ``(width, height,
    us_per_frame, n_frames, frame_sizes)`` — the per-frame byte index.
    Raises ValueError on anything that is not a consistent AVI."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    (riff_len,) = struct.unpack_from("<I", data, 4)
    if 8 + riff_len > len(data):
        raise ValueError("RIFF length overruns buffer")
    width = height = us_per_frame = -1
    declared_frames = -1
    frame_sizes: list[int] = []
    for tag, start, length in _walk(data, 12, 8 + riff_len):
        if tag != b"LIST":
            continue
        list_type = data[start : start + 4]
        if list_type == b"hdrl":
            for t2, s2, l2 in _walk(data, start + 4, start + length):
                if t2 == b"avih":
                    if l2 < struct.calcsize(_AVIH_FMT):
                        raise ValueError("truncated avih header")
                    vals = struct.unpack_from(_AVIH_FMT, data, s2)
                    us_per_frame, declared_frames = vals[0], vals[4]
                    width, height = vals[8], vals[9]
        elif list_type == b"movi":
            for t2, s2, l2 in _walk(data, start + 4, start + length):
                if t2 in (b"00dc", b"00db"):
                    frame_sizes.append(l2)
    if width < 0:
        raise ValueError("missing avih header")
    if declared_frames != len(frame_sizes):
        raise ValueError(
            f"avih declares {declared_frames} frames, movi holds {len(frame_sizes)}"
        )
    return width, height, us_per_frame, len(frame_sizes), frame_sizes
