"""Minimal real GIF codec — stdlib only.

Completes the image-codec set (PNG, baseline JPEG, GIF — the three
formats the magic-byte router distinguishes): GIF87a/89a is fully
specified publicly (the GIF89a specification and the underlying
LZW-variable-width scheme), needs no external libraries, and is the
one image container here with first-class MULTI-FRAME semantics — so
``n_frames`` in the decode schema means something real for images,
not just for AVI.

- :func:`encode_gif` — writes a valid GIF89a from indexed frames
  (global palette, real variable-width LZW compression with clear-code
  dictionary resets, optional per-frame interlacing, loop/delay
  metadata via the standard graphics-control extension);
- :func:`decode_gif` — parses the logical screen descriptor and block
  stream, LZW-decompresses each image descriptor's sub-blocks,
  de-interlaces, applies local-over-global palettes, and returns every
  frame as RGB.

GIF pixel data is lossless over indexed input, so round-trips are
byte-exact (pinned in tests/test_multimodal.py, including interlaced
and multi-frame paths). Malformed streams raise ValueError — the same
quarantine contract as the PNG/JPEG decoders.
"""

from __future__ import annotations

import struct

_MAX_PIXELS = 64 * 1024 * 1024  # same bomb-cap contract as png/jpeg


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable width, LSB-first, clear/end codes)


def _lzw_encode(min_code_size: int, data: bytes) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w])
        # the decoder appends one table entry for EVERY data code after
        # the first — including this final one, for which the encoder
        # adds nothing. Mirror that phantom entry in the width
        # bookkeeping, or the decoder's width grows one step early and
        # the END code desyncs (surfaced as 'truncated LZW stream' on
        # runs whose last code lands exactly on a width boundary).
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF: truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF: bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF: LZW code out of range")
        out += entry
        if len(out) > max_pixels:
            raise ValueError("GIF: decoded size exceeds cap")
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry


# interlace pass row schedule (GIF89a appendix E)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list[int]:
    order: list[int] = []
    for start, step in _INTERLACE:
        order.extend(range(start, h, step))
    return order


def _subblocks(body: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(body):
        out.append(len(body[i : i + 255]))
        out += body[i : i + 255]
        i += 255
    out.append(0)
    return bytes(out)


def encode_gif(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    frames: list[bytes],
    delays_cs: list[int] | None = None,
    interlace: bool = False,
) -> bytes:
    """Write a GIF89a. ``palette``: up to 256 RGB triples (padded to a
    power of two >= 2); ``frames``: per-frame palette-index bytes,
    each exactly width*height long; ``delays_cs``: per-frame delay in
    centiseconds (emits a graphics-control extension when given);
    ``interlace`` writes every frame with the 4-pass row schedule."""
    if not frames:
        raise ValueError("encode_gif needs at least one frame")
    if not 1 <= len(palette) <= 256:
        raise ValueError("palette must have 1..256 entries")
    size = 1
    while (1 << size) < max(len(palette), 2):
        size += 1
    n_colors = 1 << size
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (size - 1), 0, 0)
    for i in range(n_colors):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        out += bytes((r, g, b))
    min_code = max(2, size)
    for fi, frame in enumerate(frames):
        if len(frame) != width * height:
            raise ValueError("frame length != width*height")
        if delays_cs is not None:
            out += b"\x21\xf9\x04\x00" + struct.pack("<H", delays_cs[fi]) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0x40 if interlace else 0)
        if interlace:
            rows = [frame[r * width : (r + 1) * width] for r in _interlace_order(height)]
            frame = b"".join(rows)
        out.append(min_code)
        out += _subblocks(_lzw_encode(min_code, frame))
    out += b"\x3b"
    return bytes(out)


def decode_gif(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """Decode a GIF. Returns (width, height, n_frames, frames) where
    each frame is width*height*3 RGB bytes on the logical screen
    (frames smaller than the screen are composited onto the background
    color; transparency via the 89a graphics-control extension maps
    the transparent index to the background). Raises ValueError on
    malformed streams — the quarantine contract."""
    if len(data) < 13 or data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF")
    w, h, packed, bg, _ = struct.unpack("<HHBBB", data[6:13])
    if w * h > _MAX_PIXELS:
        raise ValueError("GIF: declared size exceeds cap")
    pos = 13
    global_pal: list[bytes] = []
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_pal = [data[pos + 3 * i : pos + 3 * i + 3] for i in range(n)]
        pos += 3 * n
    frames: list[bytes] = []
    transparent: int | None = None
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9 and data[pos] >= 4:
                gce_packed = data[pos + 1]
                transparent = data[pos + 4] if gce_packed & 0x01 else None
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            left, top, fw, fh, ipacked = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
            pos += 10
            pal = global_pal
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = [data[pos + 3 * i : pos + 3 * i + 3] for i in range(n)]
                pos += 3 * n
            if not pal:
                raise ValueError("GIF: no color table")
            if pos >= len(data):
                raise ValueError("GIF: truncated image block")
            min_code = data[pos]
            pos += 1
            if not 2 <= min_code <= 11:
                raise ValueError("GIF: bad LZW minimum code size")
            lzw = bytearray()
            while pos < len(data) and data[pos] != 0:
                n = data[pos]
                lzw += data[pos + 1 : pos + 1 + n]
                pos += 1 + n
            if pos >= len(data):
                raise ValueError("GIF: unterminated sub-blocks")
            pos += 1
            idx = _lzw_decode(min_code, bytes(lzw), _MAX_PIXELS)
            if len(idx) < fw * fh:
                raise ValueError("GIF: short frame data")
            idx = idx[: fw * fh]
            if ipacked & 0x40:  # interlaced: invert the pass order
                deinter = bytearray(fw * fh)
                for src_row, dst_row in enumerate(_interlace_order(fh)):
                    deinter[dst_row * fw : (dst_row + 1) * fw] = idx[
                        src_row * fw : (src_row + 1) * fw
                    ]
                idx = bytes(deinter)
            bg_rgb = global_pal[bg] if bg < len(global_pal) else b"\x00\x00\x00"
            canvas = bytearray(bg_rgb * (w * h))
            for row in range(fh):
                if not 0 <= top + row < h:
                    continue
                for col in range(fw):
                    if not 0 <= left + col < w:
                        continue
                    ci = idx[row * fw + col]
                    if transparent is not None and ci == transparent:
                        continue
                    if ci >= len(pal):
                        raise ValueError("GIF: palette index out of range")
                    off = ((top + row) * w + (left + col)) * 3
                    canvas[off : off + 3] = pal[ci]
            frames.append(bytes(canvas))
            transparent = None
        else:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF: no image data")
    return w, h, len(frames), frames
