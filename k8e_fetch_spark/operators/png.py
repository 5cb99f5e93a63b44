"""Minimal real PNG codec — stdlib only (zlib + struct).

The multimodal decode stage (SURVEY.md §2.6) needs to demonstrably
handle ACTUAL image bytes, not only the deterministic stub codec, and
this container ships no imaging library. PNG is simple enough to do
for real from the public spec (RFC 2083 / W3C PNG): chunked container
with CRC32, DEFLATE-compressed scanlines, five per-row predictor
filters. This module implements:

- :func:`encode_png` — writes a valid 8-bit PNG (gray / RGB / RGBA),
  cycling through ALL five filter types row by row so decoders (ours
  included) must implement real unfiltering, not just filter 0;
- :func:`decode_png` — parses the chunk stream (signature, IHDR, IDAT
  concatenation, CRC verification), inflates, and reverses the Sub /
  Up / Average / Paeth predictors to recover exact pixel bytes.

Pure functions of bytes, importable on executors: the Arrow-batched
``decode_media_png`` stage (operators/multimodal.py) calls
:func:`decode_png` per payload inside ``mapInPandas``. Outputs are
byte-exact (pinned by round-trip tests over gradient images in
tests/test_multimodal.py, including a ``binaryFile``-source read of
files on disk).
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# channels per color type (8-bit depth only — the common web case)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}

# Hard cap on the IHDR-declared filtered pixel buffer (~64 Mpx RGBA +
# filter bytes). Corpus images beyond this are not plausible training
# inputs; decode_png raises (→ quarantine) rather than allocating.
_MAX_PIXEL_BYTES = 256 * 1024 * 1024


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(width: int, height: int, pixels: bytes, color_type: int = 2) -> bytes:
    """Write a real PNG. ``pixels`` is row-major packed bytes,
    ``width * height * channels`` long. Each row is filtered with
    ``row_index % 5`` (None/Sub/Up/Average/Paeth), so the output
    exercises the full filter suite on decode."""
    ch = _CHANNELS[color_type]
    if len(pixels) != width * height * ch:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, want {width * height * ch}"
        )
    stride = width * ch
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        ftype = y % 5
        raw.append(ftype)
        if ftype == 0:  # None
            raw += row
        elif ftype == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - ch] if i >= ch else 0)) & 0xFF
                for i in range(stride)
            )
        elif ftype == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif ftype == 3:  # Average
            raw += bytes(
                (row[i] - (((row[i - ch] if i >= ch else 0) + prev[i]) >> 1)) & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            raw += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - ch] if i >= ch else 0,
                        prev[i],
                        prev[i - ch] if i >= ch else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Parse a PNG and return ``(width, height, channels, pixel_bytes)``
    with pixels row-major, filters reversed. Supports 8-bit depth,
    color types 0/2/4/6, no interlace — raises ValueError otherwise
    (the decode stage surfaces that as a per-row error, it does not
    crash the task)."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = color_type = -1
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width < 0:
        raise ValueError("missing IHDR")
    ch = _CHANNELS[color_type]
    stride = width * ch
    # Bounded inflate: the IHDR already fixes the exact decompressed
    # size, so cap decompression there instead of trusting the stream —
    # an unbounded zlib.decompress lets a kilobyte DEFLATE bomb claim
    # gigabytes and OOM the executor (MemoryError would bypass the
    # quarantine catch in decode_media_png and kill the task).
    # The IHDR itself is attacker-controlled too: the 4-byte dimension
    # fields can declare up to ~2^35 pixel bytes, so a consistent
    # large-IHDR bomb would still materialize gigabytes before the
    # length check. Cap the declared pixel buffer outright — rows above
    # it quarantine via the same ValueError path.
    expected = (stride + 1) * height
    if expected > _MAX_PIXEL_BYTES:
        raise ValueError(
            f"declared pixel buffer {expected} B exceeds cap {_MAX_PIXEL_BYTES} B"
        )
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), expected + 1)
    if d.unconsumed_tail:
        raw += d.decompress(d.unconsumed_tail, 1)
    if len(raw) != expected:
        raise ValueError("IDAT length does not match dimensions")
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = bytes(line)
    return width, height, ch, bytes(out)
