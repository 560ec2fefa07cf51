"""Pure-stdlib image codecs (PNG + BMP) for the multimodal decode path.

The container has no PIL/opencv, but PNG is just zlib (stdlib) over
filtered scanlines and BMP is raw pixels — so the two most common
LOSSLESS formats decode for real with ``struct`` + ``zlib`` alone. This
turns ``multimodal.decode_image`` from a stub into a genuine decoder
for PNG (bit depth 8: gray / gray+alpha / RGB / RGBA, non-interlaced)
and BMP (24bpp uncompressed); JPEG and friends still fall back (a DCT
codec is out of scope for stdlib).

The encoder exists so tests can round-trip REAL images — including
per-row filter types 1-4 (Sub/Up/Average/Paeth), which exercises every
branch of the unfilter logic against its exact inverse.

Formats are public specifications (PNG: RFC 2083 / ISO 15948; BMP:
Windows BITMAPINFOHEADER).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_COLORTYPE_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # 3 = palette index


def sniff_image(data: bytes) -> str | None:
    """'png' | 'bmp' | None (unknown)."""
    if data is None:
        return None
    if data[:8] == PNG_SIG:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    return None


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """PNG -> uint8 array (h, w) for grayscale or (h, w, channels).

    Supports bit depth 8, color types 0/2/3 (palette, resolved to RGB
    via PLTE)/4/6, non-interlaced — the shapes ~every
    generated/screenshot PNG uses. Other depths raise ValueError
    (caller falls back).
    """
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = b""
    plte = None
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IHDR":
            w, h, depth, colortype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if colortype not in _COLORTYPE_CHANNELS:
                raise ValueError(f"unsupported color type {colortype}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    ch = _COLORTYPE_CHANNELS[colortype]
    raw = zlib.decompress(idat)
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("scanline data size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = bytearray(raw[row_start + 1:row_start + 1 + stride])
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
                line[i] = (line[i] + ((a + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = int(prev[i - ch]) if i >= ch else 0
                line[i] = (line[i] + _paeth(a, int(prev[i]), c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
        prev = out[y]
    img = out.reshape(h, w, ch)
    if colortype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        return plte[np.clip(img[:, :, 0], 0, len(plte) - 1)]
    return img[:, :, 0] if ch == 1 else img


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 array (h, w) or (h, w, {1,2,3,4}) -> PNG bytes.

    ``filter_type`` applies one filter (0-4) to every row — the exact
    inverse of the decoder's unfilter — so tests can exercise each
    branch with round-trips.
    """
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int16)
    lines = []
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        row = flat[y]
        if filter_type == 0:
            enc = row
        elif filter_type == 1:
            left = np.concatenate([np.zeros(ch, np.int16), row[:-ch]])
            enc = row - left
        elif filter_type == 2:
            enc = row - prev
        elif filter_type == 3:
            left = np.concatenate([np.zeros(ch, np.int16), row[:-ch]])
            enc = row - ((left + prev) >> 1)
        elif filter_type == 4:
            enc = np.zeros(stride, dtype=np.int16)
            for i in range(stride):
                a = int(row[i - ch]) if i >= ch else 0
                c = int(prev[i - ch]) if i >= ch else 0
                enc[i] = row[i] - _paeth(a, int(prev[i]), c)
        else:
            raise ValueError(f"bad filter type {filter_type}")
        lines.append(bytes([filter_type]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = row

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    return PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def decode_bmp(data: bytes) -> np.ndarray:
    """24bpp uncompressed BMP -> uint8 RGB array (h, w, 3).

    Handles the BITMAPINFOHEADER layout, 4-byte row padding, bottom-up
    (positive height) and top-down (negative height) row order, and the
    file's BGR byte order (converted to RGB).
    """
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pixel_offset,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h_raw = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    h = abs(h_raw)
    row_size = (w * 3 + 3) & ~3
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for row in range(h):
        start = pixel_offset + row * row_size
        line = np.frombuffer(data[start:start + w * 3], dtype=np.uint8).reshape(w, 3)
        y = (h - 1 - row) if h_raw > 0 else row  # bottom-up vs top-down
        out[y] = line[:, ::-1]  # BGR -> RGB
    return out


def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 RGB array (h, w, 3) -> 24bpp bottom-up BMP bytes."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, ch = img.shape
    if ch != 3:
        raise ValueError("BMP encoder takes (h, w, 3) RGB")
    row_size = (w * 3 + 3) & ~3
    pad = b"\x00" * (row_size - w * 3)
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        rows.append(img[y, :, ::-1].tobytes() + pad)  # RGB -> BGR
    pixels = b"".join(rows)
    pixel_offset = 14 + 40
    file_size = pixel_offset + len(pixels)
    header = (
        b"BM"
        + struct.pack("<IHHI", file_size, 0, 0, pixel_offset)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    )
    return header + pixels
