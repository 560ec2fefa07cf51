"""Test-side baseline JPEG encoder (ITU-T T.81), independent of
indexlab_spark.functions.imagecodec — the cross-implementation net for
the round-15 JPEG decoder, same discipline as tests/chmgen.py.

Emits real baseline sequential JPEGs: SOI/DQT/SOF0/DHT/SOS/EOI, FDCT +
quantization (Annex K tables by default, custom tables accepted — an
all-ones table makes the codec near-lossless for tight assertions),
per-image canonical Huffman tables (fixed-length codes, never the
reserved all-ones code), 4:4:4 or 4:2:0 sampling with box-averaged
chroma, optional restart intervals, 0xFF byte stuffing.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# ITU-T T.81 Annex K.1 example quantization tables (natural order)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99]
    + [99] * 32,
    dtype=np.int64,
)

_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _fdct2(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)


class _Writer:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, val: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def pad_align(self) -> None:
        while self.n:
            self.bits(1, 1)  # pad with 1-bits per T.81

    def raw(self, b: bytes) -> None:
        assert self.n == 0
        self.out += b


def _category(v: int) -> tuple[int, int]:
    """T.81 F.1.2.1: (size, raw bits) for a signed value."""
    t = abs(v).bit_length()
    bits = v if v >= 0 else v + (1 << t) - 1
    return t, bits


def _fixed_table(symbols: list[int]) -> tuple[list[int], list[int], dict]:
    """Give every used symbol the same code length L with 2^L > n
    (so the reserved all-ones code is never assigned). Returns
    (counts[16], symbol_list, {sym: (code, L)})."""
    syms = sorted(set(symbols))
    n = len(syms)
    L = 1
    while (1 << L) <= n:
        L += 1
    counts = [0] * 16
    counts[L - 1] = n
    codes = {s: (i, L) for i, s in enumerate(syms)}
    return counts, syms, codes


def _blocks_for_plane(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Pad a plane (edge-replicate) to (bh*8, bw*8) and split into a
    (bh*bw, 8, 8) stack in raster order."""
    h, w = plane.shape
    padded = np.pad(
        plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge"
    )
    return (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def encode_jpeg(
    img: np.ndarray,
    qtable_luma: np.ndarray = QT_LUMA,
    qtable_chroma: np.ndarray = QT_CHROMA,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB -> baseline JPEG."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]

    if gray:
        planes = [img.astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qsel = [0]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128
        if subsample == "420":
            # box-average 2x2 (pad odd dims by edge replication first)
            def _down(p):
                ph = p if h % 2 == 0 else np.pad(p, ((0, 1), (0, 0)), "edge")
                ph = ph if w % 2 == 0 else np.pad(ph, ((0, 0), (0, 1)), "edge")
                return (
                    ph.reshape(ph.shape[0] // 2, 2, ph.shape[1] // 2, 2)
                    .mean(axis=(1, 3))
                )

            planes = [y - 128.0, _down(cb) - 128.0, _down(cr) - 128.0]
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsample == "444":
            planes = [y - 128.0, cb - 128.0, cr - 128.0]
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(subsample)
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qtables = [qtable_luma, qtable_chroma][: (1 if gray else 2)]

    # --- pass 1: quantized coefficients per component, MCU raster order
    comp_blocks = []
    for ci, plane in enumerate(planes):
        ch, cv = samp[ci]
        bh, bw = mcuy * cv, mcux * ch
        blocks = _blocks_for_plane(plane, bh, bw)
        coef = _fdct2(blocks)
        q = qtables[qsel[ci]].reshape(8, 8)
        quant = np.round(coef / q).astype(np.int64)
        zz = quant.reshape(-1, 64)[:, ZIGZAG]
        comp_blocks.append((zz, bw, ch, cv))

    # --- symbol gathering (with restart-aware DC prediction)
    dc_syms = [[] for _ in planes]
    ac_syms = [[] for _ in planes]

    def _iter_mcu_blocks():
        mcu_i = 0
        preds = [0] * len(planes)
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_i and (
                    mcu_i % restart_interval == 0
                ):
                    preds = [0] * len(planes)
                    yield ("RST", None, None, None)
                mcu_i += 1
                for ci, (zz, bw, ch, cv) in enumerate(comp_blocks):
                    for by in range(cv):
                        for bx in range(ch):
                            row = (my * cv + by) * bw + (mx * ch + bx)
                            blk = zz[row]
                            diff = int(blk[0]) - preds[ci]
                            preds[ci] = int(blk[0])
                            yield (ci, blk, diff, row)

    for item in _iter_mcu_blocks():
        if item[0] == "RST":
            continue
        ci, blk, diff, _ = item
        dc_syms[ci].append(_category(diff)[0])
        k = 1
        run = 0
        for k in range(1, 64):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ac_syms[ci].append(0xF0)
                run -= 16
            s, _b = _category(v)
            ac_syms[ci].append((run << 4) | s)
            run = 0
        if run:
            ac_syms[ci].append(0x00)

    # two table classes: luma (component 0) and chroma (1,2 merged)
    def _merge(lists, idxs):
        out = []
        for i in idxs:
            out += lists[i]
        return out

    classes = [[0]] if gray else [[0], [1, 2]]
    dc_tables, ac_tables = [], []
    for idxs in classes:
        dc_tables.append(_fixed_table(_merge(dc_syms, idxs) or [0]))
        ac_tables.append(_fixed_table(_merge(ac_syms, idxs) or [0]))

    # --- emit
    out = bytearray(b"\xff\xd8")
    for tq, q in enumerate(qtables):
        zzq = np.asarray(q).reshape(64)[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">HB", 2 + 1 + 64, tq)
        out += bytes(int(x) for x in zzq)
    out += b"\xff\xc0" + struct.pack(
        ">HBHHB", 8 + 3 * len(planes), 8, h, w, len(planes)
    )
    for ci in range(len(planes)):
        out += struct.pack(
            ">BBB", ci + 1, (samp[ci][0] << 4) | samp[ci][1], qsel[ci]
        )
    for tc, tables in ((0, dc_tables), (1, ac_tables)):
        for th, (counts, syms, _codes) in enumerate(tables):
            out += b"\xff\xc4" + struct.pack(
                ">HB", 2 + 1 + 16 + len(syms), (tc << 4) | th
            )
            out += bytes(counts) + bytes(syms)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(planes), len(planes))
    tclass = [0] if gray else [0, 1, 1]
    for ci in range(len(planes)):
        out += struct.pack(">BB", ci + 1, (tclass[ci] << 4) | tclass[ci])
    out += b"\x00\x3f\x00"  # Ss, Se, AhAl

    wtr = _Writer()
    rst_i = 0
    for item in _iter_mcu_blocks():
        if item[0] == "RST":
            wtr.pad_align()
            wtr.raw(bytes([0xFF, 0xD0 + (rst_i % 8)]))
            rst_i += 1
            continue
        ci, blk, diff, _ = item
        tcl = tclass[ci] if not gray else 0
        _c, _s, dc_codes = dc_tables[tcl]
        _c, _s, ac_codes = ac_tables[tcl]
        t, bitsv = _category(diff)
        wtr.bits(*dc_codes[t])
        if t:
            wtr.bits(bitsv, t)
        run = 0
        for k in range(1, 64):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                wtr.bits(*ac_codes[0xF0])
                run -= 16
            s, b = _category(v)
            wtr.bits(*ac_codes[(run << 4) | s])
            wtr.bits(b, s)
            run = 0
        if run:
            wtr.bits(*ac_codes[0x00])
    wtr.pad_align()
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)
