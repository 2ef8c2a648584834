"""Minimal pure-Python PNG codec (stdlib zlib + struct only).

Exists so the multimodal resize path has a REAL pixel decoder in
environments without an image library: 8-bit non-interlaced PNGs
(grayscale / gray+alpha / RGB / RGBA), all five scanline filters on
decode, filter-0 on encode, nearest-neighbor resampling. PIL remains
the preferred path when installed (any format, proper resampling);
this covers the common PNG case so "resize a PNG" never needs a fake.

Runs inside mapInPandas workers — pure function of bytes, no state.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (8-bit, non-palette)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(data: bytes) -> tuple[int, int, int, bytearray]:
    """→ (width, height, n_channels, raw pixels row-major)."""
    if not data.startswith(_SIG):
        raise ValueError("not a PNG")
    pos, idat = len(_SIG), []
    width = height = None
    channels = 0
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, ctype, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8 or ctype not in _CHANNELS or interlace != 0:
                raise ValueError(
                    f"unsupported PNG: depth={depth} color={ctype} "
                    f"interlace={interlace}"
                )
            channels = _CHANNELS[ctype]
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG")
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    out = bytearray(height * stride)
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, channels, out


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body))
    )


def encode_png(
    width: int, height: int, channels: int, pixels: bytes | bytearray
) -> bytes:
    """8-bit, filter-0 scanlines. channels ∈ {1, 2, 3, 4}."""
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    stride = width * channels
    raw = b"".join(
        b"\x00" + bytes(pixels[y * stride : (y + 1) * stride])
        for y in range(height)
    )
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def resize_png(data: bytes, width: int, height: int) -> tuple[bytes, int, int]:
    """Nearest-neighbor resize → (new PNG bytes, src_w, src_h)."""
    sw, sh, ch, px = decode_png(data)
    out = bytearray(width * height * ch)
    for y in range(height):
        sy = min(sh - 1, y * sh // height)
        for x in range(width):
            sx = min(sw - 1, x * sw // width)
            so = (sy * sw + sx) * ch
            do = (y * width + x) * ch
            out[do : do + ch] = px[so : so + ch]
    return encode_png(width, height, ch, out), sw, sh
