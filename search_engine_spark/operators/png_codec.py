"""Dependency-free PNG codec (stdlib zlib + struct + binascii only).

Round-3 item #7: the multimodal featurize seam previously import-gated
real decoding on pillow (absent in this environment). PNG needs no
external codec — IDAT is zlib, filters are simple per-scanline integer
predictors (RFC 2083 / ISO 15948 §9) — so the decode path is now REAL
for PNG payloads: `png_decode` parses chunks (CRC-checked), inflates
IDAT, and reverses all five filter types; `png_encode` writes valid
PNGs (used by tests and the deterministic image-synthesis fixture, with
a cycling row filter so decoding exercises every unfilter branch).

Supported: bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette,
PLTE), 4 (gray+alpha), 6 (RGBA), non-interlaced. Adam7 interlacing and
sub-byte depths raise NotImplementedError — web-scale training corpora
re-encode to canonical form upstream; the error is loud, never a wrong
pixel.

Scale note: this runs inside mapInPandas workers, one image at a time —
pure CPU over bytes already on the executor, no shuffle implications.
The per-row Python loop is bounded by image height; the per-pixel loops
only run for filter types 3/4 (numpy vectorizes 0/1/2).
"""

from __future__ import annotations

import binascii
import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> (channels, mode label — pillow's naming, so decode_image
# reports the same mode string with or without PIL)
_COLOR_TYPES = {0: (1, "L"), 2: (3, "RGB"), 3: (1, "P"), 4: (2, "LA"), 6: (4, "RGBA")}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = binascii.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_row(raw: np.ndarray, prev: np.ndarray, ftype: int, bpp: int) -> np.ndarray:
    """Apply filter `ftype` to one raw scanline (uint8 1-D)."""
    raw16 = raw.astype(np.int16)
    left = np.zeros_like(raw16)
    left[bpp:] = raw16[:-bpp]
    up = prev.astype(np.int16)
    if ftype == 0:
        out = raw16
    elif ftype == 1:
        out = raw16 - left
    elif ftype == 2:
        out = raw16 - up
    elif ftype == 3:
        out = raw16 - (left + up) // 2
    elif ftype == 4:
        ul = np.zeros_like(up)
        ul[bpp:] = up[:-bpp]
        out = raw16.copy()
        for x in range(raw.size):
            a = int(raw16[x - bpp]) if x >= bpp else 0
            b = int(up[x])
            c = int(ul[x])
            out[x] = raw16[x] - _paeth(a, b, c)
    else:
        raise ValueError(f"unknown PNG filter type {ftype}")
    return (out % 256).astype(np.uint8)


def _unfilter_row(
    filt: np.ndarray, prev: np.ndarray, ftype: int, bpp: int
) -> np.ndarray:
    """Reverse filter `ftype` for one scanline — exact spec recursions."""
    n = filt.size
    up = prev.astype(np.int16)
    if ftype == 0:
        return filt.copy()
    if ftype == 2:
        return ((filt.astype(np.int16) + up) % 256).astype(np.uint8)
    out = np.zeros(n, dtype=np.int16)
    if ftype == 1:
        for x in range(n):
            a = int(out[x - bpp]) if x >= bpp else 0
            out[x] = (int(filt[x]) + a) % 256
    elif ftype == 3:
        for x in range(n):
            a = int(out[x - bpp]) if x >= bpp else 0
            out[x] = (int(filt[x]) + (a + int(up[x])) // 2) % 256
    elif ftype == 4:
        for x in range(n):
            a = int(out[x - bpp]) if x >= bpp else 0
            b = int(up[x])
            c = int(up[x - bpp]) if x >= bpp else 0
            out[x] = (int(filt[x]) + _paeth(a, b, c)) % 256
    else:
        raise ValueError(f"unknown PNG filter type {ftype}")
    return out.astype(np.uint8)


def png_encode(
    pixels: np.ndarray,
    color_type: int | None = None,
    filter_mode: str | int = "cycle",
) -> bytes:
    """Encode an (h, w) or (h, w, channels) uint8 array as a valid PNG.

    filter_mode: an int pins every scanline to that filter type;
    "cycle" uses row % 5 so a decode round-trip exercises all five
    unfilter branches (the test/fixture default)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, np.newaxis]
    h, w, ch = px.shape
    if color_type is None:
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    expect_ch, _ = _COLOR_TYPES[color_type]
    if ch != expect_ch:
        raise ValueError(f"color type {color_type} needs {expect_ch} channels, got {ch}")
    bpp = ch
    raw = px.reshape(h, w * ch)
    lines = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for r in range(h):
        ftype = (r % 5) if filter_mode == "cycle" else int(filter_mode)
        lines.append(ftype)
        lines.extend(_filter_row(raw[r], prev, ftype, bpp).tobytes())
        prev = raw[r]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> tuple[np.ndarray, str]:
    """Decode PNG bytes → ((h, w, channels) uint8 array, mode label).

    Palette images are expanded through PLTE to RGB (mode stays "P" to
    report the source format). Raises ValueError on a malformed stream
    (bad signature, CRC mismatch, truncated/overlong pixel data) and
    NotImplementedError on interlacing or non-8-bit depth."""
    buf = bytes(data)
    if buf[:8] != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        tag = buf[pos + 4 : pos + 8]
        payload = buf[pos + 8 : pos + 8 + length]
        if len(payload) != length or pos + 12 + length > len(buf):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", buf[pos + 8 + length : pos + 12 + length])
        if binascii.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    if depth != 8:
        raise NotImplementedError(f"bit depth {depth} not supported (8 only)")
    if color_type not in _COLOR_TYPES:
        raise ValueError(f"unknown PNG color type {color_type}")
    ch, mode = _COLOR_TYPES[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"pixel data length {len(raw)} != expected {h * (stride + 1)}"
        )
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        off = r * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1)
        out[r] = _unfilter_row(line, prev, ftype, ch)
        prev = out[r]
    px = out.reshape(h, w, ch)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        px = plte[px[:, :, 0]]
    return px, mode
