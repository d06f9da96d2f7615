"""Minimal pure-stdlib PNG codec (RFC 2083 / ISO 15948 subset).

Third member of the lite-codec family (xlsx_lite, pdf_lite): PNG's
container is zlib + per-scanline filters, both fully implementable on
the standard library, so the image operators (S11 metadata, K10
resize / image->PDF) run for real without Pillow.

Subset: 8-bit samples, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), non-interlaced. ``decode_png`` returns
``None`` for anything else (16-bit, Adam7) — callers keep their gated
path for exotic files, exactly like pdf_lite returns [] for image-only
PDFs. All five scanline filters (None/Sub/Up/Average/Paeth) are
implemented, so files from real encoders decode correctly.

Decoded form: (width, height, mode, pixels) with mode 'L'/'LA'/'RGB'/
'RGBA' (palette expands to RGB) and pixels one flat bytearray,
row-major, ``len = w*h*channels`` — the natural shape for the
nearest-neighbor resize and the PDF image XObject embed.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_MODE = {0: "L", 2: "RGB", 4: "LA", 6: "RGBA"}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes):
    """-> (width, height, mode, pixels) or None when not in-subset OR
    structurally corrupt — the None contract is what lets the Spark
    operators fall to their stub path instead of failing the task on
    one bad file in a binaryFile ingest."""
    try:
        return _decode_png_inner(data)
    except (struct.error, IndexError, ValueError, MemoryError, OverflowError):
        return None


def _decode_png_inner(data: bytes):
    if not data.startswith(_SIG):
        return None
    pos, ihdr, idat, plte = len(_SIG), None, [], b""
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + body + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        return None
    w, h, depth, ctype_i, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        return None
    if ctype_i not in _CHANNELS:
        return None
    ch = _CHANNELS[ctype_i]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w * ch
    if len(raw) < h * (stride + 1):
        return None
    out = bytearray(h * stride)
    prev = bytearray(stride)
    for y in range(h):
        off = y * (stride + 1)
        f = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif f != 0:
            return None
        out[y * stride : (y + 1) * stride] = line
        prev = line
    if ctype_i == 3:  # palette -> RGB
        rgb = bytearray(w * h * 3)
        for i, idx in enumerate(out):
            if 3 * idx + 3 > len(plte):
                return None  # out-of-range palette index: corrupt file
            rgb[3 * i : 3 * i + 3] = plte[3 * idx : 3 * idx + 3]
        return w, h, "RGB", rgb
    return w, h, _MODE[ctype_i], out


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(w: int, h: int, mode: str, pixels: bytes) -> bytes:
    """Filter-0 encoder for mode 'L'/'LA'/'RGB'/'RGBA'."""
    ctype = {"L": 0, "RGB": 2, "LA": 4, "RGBA": 6}[mode]
    ch = len(mode)
    stride = w * ch
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += pixels[y * stride : (y + 1) * stride]
    return (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(
    w: int, h: int, mode: str, pixels: bytes, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resample (the deterministic kernel — bilinear
    is Pillow's job when installed)."""
    ch = len(mode)
    out = bytearray(new_w * new_h * ch)
    for y in range(new_h):
        sy = min(y * h // new_h, h - 1)
        src_row = sy * w * ch
        dst_row = y * new_w * ch
        for x in range(new_w):
            sx = min(x * w // new_w, w - 1)
            out[dst_row + x * ch : dst_row + (x + 1) * ch] = pixels[
                src_row + sx * ch : src_row + (sx + 1) * ch
            ]
    return bytes(out)


def flatten_to_rgb(w: int, h: int, mode: str, pixels: bytes) -> bytes:
    """Composite alpha on white / expand gray — the same normalization
    the reference applies before JPEG/PDF output (main.py:893-897)."""
    n = w * h
    out = bytearray(n * 3)
    if mode == "RGB":
        return bytes(pixels)
    if mode == "L":
        for i in range(n):
            out[3 * i] = out[3 * i + 1] = out[3 * i + 2] = pixels[i]
    elif mode == "LA":
        for i in range(n):
            g, a = pixels[2 * i], pixels[2 * i + 1]
            v = (g * a + 255 * (255 - a)) // 255
            out[3 * i] = out[3 * i + 1] = out[3 * i + 2] = v
    elif mode == "RGBA":
        for i in range(n):
            r, g, b, a = pixels[4 * i : 4 * i + 4]
            inv = 255 - a
            out[3 * i] = (r * a + 255 * inv) // 255
            out[3 * i + 1] = (g * a + 255 * inv) // 255
            out[3 * i + 2] = (b * a + 255 * inv) // 255
    else:
        raise ValueError(f"unsupported mode {mode!r}")
    return bytes(out)
