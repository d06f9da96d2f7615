"""Minimal pure-Python baseline TIFF decoder (TIFF 6.0 subset).

Sixth lite codec: baseline TIFF is fully specified in the public
TIFF 6.0 specification — little/big-endian headers, IFD tag walks,
strip organization, and the three baseline compressions (none,
PackBits §9, LZW §13 with the MSB-first packing + early-change quirk
that distinguishes TIFF-LZW from GIF-LZW) are all implementable on
``struct`` alone. Reference main.py:886-905 accepts .tif/.tiff through
Pillow; this un-gates that path for the baseline subset.

Decoder subset: single-image (first IFD), 8-bit samples, grayscale
(black/white-is-zero), RGB, and palette-color, strip-based AND tiled
(TIFF 6.0 §15 — round 6: full-size edge-padded tiles blitted into the
raster, predictor reset per tile row), Compression 1/5/32773,
Predictor 1/2 (horizontal differencing for LZW), chunky planar layout
only. Out-of-subset files return None so callers keep their PIL gate —
the same bail-out contract as every other lite codec.
"""

from __future__ import annotations

import struct


def _packbits(data: bytes, expected: int) -> bytes | None:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        b = data[i]
        i += 1
        if b < 128:  # literal run of b+1 bytes
            if i + b + 1 > n:
                return None
            out += data[i : i + b + 1]
            i += b + 1
        elif b > 128:  # repeat next byte 257-b times
            if i >= n:
                return None
            out += bytes([data[i]]) * (257 - b)
            i += 1
        # b == 128: no-op
    return bytes(out[:expected]) if len(out) >= expected else None


def _tiff_lzw(data: bytes, expected: int) -> bytes | None:
    """TIFF §13 LZW: MSB-first bit order, Clear=256, EOI=257, first
    table code 258, and the EARLY-CHANGE quirk — the code width bumps
    when the next table index is 2^width - 1 (one code sooner than
    GIF's LSB-first variant)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    acc = nbits = 0
    pos = 0
    prev: bytes | None = None

    def read_code() -> int | None:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return None
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        return code

    while len(out) < expected:
        code = read_code()
        if code is None or code == EOI:
            break
        if code == CLEAR:
            table = table[:258]
            width = 9
            prev = None
            continue
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:  # conformant encoders CLEAR at 4094
                table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            return None
        out += entry
        prev = entry
        # early change, decoder side: the decoder's table lags the
        # encoder's by one assignment, so it widens at size
        # 2^width - 2 (when the encoder's next code hit 2^width - 1)
        if len(table) + 2 >= (1 << width) and width < 12:
            width += 1
    return bytes(out[:expected]) if len(out) >= expected else None


def decode_tiff(data: bytes):
    """-> (w, h, mode, pixels) for the baseline subset (strips or
    tiles), None otherwise (planar layout, multi-bit-depth, other
    compressions, broken structure)."""
    if len(data) < 8 or data[:2] not in (b"II", b"MM"):
        return None
    bo = "<" if data[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack(bo + "HI", data[2:8])
    if magic != 42:
        return None
    try:
        n_tags = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])[0]
        tags: dict[int, tuple[int, int, bytes]] = {}
        for i in range(n_tags):
            at = ifd_off + 2 + 12 * i
            tag, typ, cnt = struct.unpack(bo + "HHI", data[at : at + 8])
            tags[tag] = (typ, cnt, data[at + 8 : at + 12])
    except struct.error:
        return None

    sizes = {1: 1, 2: 1, 3: 2, 4: 4}

    def values(tag: int) -> list[int] | None:
        if tag not in tags:
            return None
        typ, cnt, raw = tags[tag]
        if typ not in sizes:
            return None
        total = sizes[typ] * cnt
        buf = raw[:total] if total <= 4 else None
        if buf is None:
            off = struct.unpack(bo + "I", raw)[0]
            buf = data[off : off + total]
        fmt = {1: "B", 2: "B", 3: "H", 4: "I"}[typ]
        try:
            return list(struct.unpack(bo + fmt * cnt, buf))
        except struct.error:
            return None

    def one(tag: int, default: int | None = None) -> int | None:
        v = values(tag)
        return v[0] if v else default

    w = one(256)
    h = one(257)
    comp = one(259, 1)
    photo = one(262)
    spp = one(277, 1)
    bits = values(258) or [1]
    predictor = one(317, 1)
    tiled = 322 in tags
    if tiled:
        offsets = values(324)
        counts = values(325)
    else:
        offsets = values(273)
        counts = values(279)
    rows_per_strip = one(278, h or 0)
    if (
        not w
        or not h
        or photo is None
        or offsets is None
        or counts is None
        or len(offsets) != len(counts)
        or comp not in (1, 5, 32773)
        or predictor not in (1, 2)
        or any(b != 8 for b in bits)
        or one(284, 1) != 1  # planar (separate-plane) layout: out of subset
    ):
        return None
    if photo == 2 and spp < 3:
        return None
    if photo == 3 and spp != 1:
        return None

    def _segment(raw: bytes, expected: int, row_w: int, rows: int) -> bytes | None:
        """Decompress + un-predict one strip or tile; ``row_w`` is the
        SEGMENT's row width in samples (tile width for tiles — the
        predictor resets per segment row, TIFF 6.0 §14)."""
        if comp == 1:
            dec = raw[:expected] if len(raw) >= expected else None
        elif comp == 32773:
            dec = _packbits(raw, expected)
        else:
            dec = _tiff_lzw(raw, expected)
        if dec is None:
            return None
        if predictor == 2:
            buf = bytearray(dec)
            for r in range(rows):
                base = r * row_w * spp
                for x in range(spp, row_w * spp):
                    buf[base + x] = (buf[base + x] + buf[base + x - spp]) & 0xFF
            dec = bytes(buf)
        return dec

    if tiled:
        # TIFF 6.0 §15: tiles run left-to-right, top-to-bottom; every
        # tile decompresses to the FULL tile size (right/bottom edge
        # tiles are padded) and the valid region blits into the raster
        tile_w = one(322)
        tile_h = one(323)
        if not tile_w or not tile_h:
            return None
        tiles_x = -(-w // tile_w)
        tiles_y = -(-h // tile_h)
        if len(offsets) < tiles_x * tiles_y:
            return None
        raster = bytearray(w * h * spp)
        for ti in range(tiles_x * tiles_y):
            off, cnt = offsets[ti], counts[ti]
            dec = _segment(data[off : off + cnt], tile_w * tile_h * spp, tile_w, tile_h)
            if dec is None:
                return None
            tx, ty = ti % tiles_x, ti // tiles_x
            x0, y0 = tx * tile_w, ty * tile_h
            n_cols = min(tile_w, w - x0) * spp
            for r in range(min(tile_h, h - y0)):
                dst = ((y0 + r) * w + x0) * spp
                src = r * tile_w * spp
                raster[dst : dst + n_cols] = dec[src : src + n_cols]
    else:
        raster = bytearray()
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            rows = min(rows_per_strip, h - si * rows_per_strip)
            dec = _segment(data[off : off + cnt], rows * w * spp, w, rows)
            if dec is None:
                return None
            raster += dec
    if len(raster) < h * w * spp:
        return None

    if photo == 3:  # palette: ColorMap is 3 x 2^bits 16-bit values
        cmap = values(320)
        if not cmap or len(cmap) < 3 * 256:
            return None
        out = bytearray(w * h * 3)
        for i in range(w * h):
            p = raster[i]
            out[3 * i] = cmap[p] >> 8
            out[3 * i + 1] = cmap[256 + p] >> 8
            out[3 * i + 2] = cmap[512 + p] >> 8
        return w, h, "RGB", bytes(out)
    if photo in (0, 1) and spp == 1:
        px = bytes(raster[: w * h])
        if photo == 0:  # WhiteIsZero -> invert
            px = bytes(255 - b for b in px)
        return w, h, "L", px
    if photo == 2:
        if spp == 3:
            return w, h, "RGB", bytes(raster[: w * h * 3])
        # extra samples (e.g. alpha): keep RGB bytes, drop extras
        out = bytearray(w * h * 3)
        for i in range(w * h):
            out[3 * i : 3 * i + 3] = raster[spp * i : spp * i + 3]
        return w, h, "RGB", bytes(out)
    return None
