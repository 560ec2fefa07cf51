"""Test-side GIF encoder, independent of
indexlab_spark.functions.imagecodec — the cross-implementation net for
the round-16 GIF decoder, same discipline as tests/jpeggen.py and
tests/chmgen.py.

Emits real GIF87a/89a files from index arrays + palettes: variable-
width LZW (clear code at stream start, width growth when the table
crosses a power of two, configurable behavior at the 4096-entry cap —
emit CLEAR or freeze the table, both legal per the spec and both paths
the decoder must handle), 255-byte data sub-blocks, optional 4-pass
interlacing, global and per-frame local color tables, and the 89a
graphic control extension (transparency index, disposal method).

GIF is lossless, so round trips assert exact pixel equality.
"""

from __future__ import annotations

import struct

import numpy as np


class _LZWWriter:
    """LSB-first variable-width code packer."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def code(self, c: int, width: int) -> None:
        self.acc |= c << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def lzw_compress(indices: bytes, min_code_size: int,
                 reset_on_full: bool = True) -> bytes:
    """GIF-variant LZW: dictionary of byte strings, CLEAR emitted
    first, width grows AFTER the table size crosses the current width
    (mirroring the decoder's early-change-free growth rule). At 4096
    entries either emit CLEAR and reset (default) or freeze the table
    and keep coding with the static dictionary (reset_on_full=False,
    the 'deferred clear' path)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _LZWWriter()

    def fresh():
        return {bytes([k]): k for k in range(clear)}, clear + 2, min_code_size + 1

    table, next_code, width = fresh()
    w.code(clear, width)
    cur = b""
    for b in bytes(indices):
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        w.code(table[cur], width)
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        elif reset_on_full:
            w.code(clear, width)
            table, next_code, width = fresh()
        cur = bytes([b])
    if cur:
        w.code(table[cur], width)
    w.code(eoi, width)
    return w.flush()


_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def interlace_rows(idx: np.ndarray) -> np.ndarray:
    """Reorder rows into GIF 4-pass interlace transmission order."""
    rows = []
    for start, step in _INTERLACE:
        for r in range(start, idx.shape[0], step):
            rows.append(idx[r])
    return np.stack(rows)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _palette_block(palette: np.ndarray) -> tuple[bytes, int]:
    """Pad a (n,3) palette up to a power of two >= 2; returns
    (raw bytes, size_field) with size_field = log2(n)-1."""
    n = len(palette)
    size = 1
    while (2 << size) < n:
        size += 1
    full = np.zeros((2 << size, 3), dtype=np.uint8)
    full[:n] = palette
    return full.tobytes(), size


def build_gif(
    w: int,
    h: int,
    frames: list[dict],
    global_palette: np.ndarray | None = None,
    bg_index: int = 0,
    version: bytes = b"GIF89a",
    reset_on_full: bool = True,
) -> bytes:
    """Assemble a GIF. Each frame dict: ``indices`` (fh, fw) uint8
    (required), ``palette`` (n,3) local table (optional if a global
    table is given), ``left``/``top`` offsets, ``transparent`` index,
    ``disposal`` method, ``interlace`` bool, ``min_code_size``
    override."""
    out = bytearray(version)
    packed = 0
    gct = b""
    if global_palette is not None:
        gct, size = _palette_block(np.asarray(global_palette, np.uint8))
        packed = 0x80 | size
    out += struct.pack("<HHBBB", w, h, packed, bg_index, 0)
    out += gct
    for fr in frames:
        idx = np.asarray(fr["indices"], dtype=np.uint8)
        fh, fw = idx.shape
        if fr.get("transparent") is not None or fr.get("disposal"):
            gce_packed = ((fr.get("disposal", 0) & 7) << 2) | (
                1 if fr.get("transparent") is not None else 0
            )
            out += bytes([0x21, 0xF9, 4, gce_packed, 0, 0,
                          fr.get("transparent") or 0, 0])
        fpacked = 0
        lct = b""
        if fr.get("palette") is not None:
            lct, size = _palette_block(np.asarray(fr["palette"], np.uint8))
            fpacked |= 0x80 | size
        if fr.get("interlace"):
            fpacked |= 0x40
            idx = interlace_rows(idx)
        out += bytes([0x2C]) + struct.pack(
            "<HHHHB", fr.get("left", 0), fr.get("top", 0), fw, fh, fpacked
        )
        out += lct
        ncolors = len(fr["palette"]) if fr.get("palette") is not None else (
            len(global_palette) if global_palette is not None else 2
        )
        mcs = fr.get("min_code_size") or max(
            2, int(ncolors - 1).bit_length()
        )
        out += bytes([mcs])
        out += _sub_blocks(
            lzw_compress(idx.tobytes(), mcs, reset_on_full=reset_on_full)
        )
    out += b"\x3b"
    return bytes(out)
