"""Test-side baseline JPEG encoder (ITU-T T.81), independent of
indexlab_spark.functions.imagecodec — the cross-implementation net for
the round-15 JPEG decoder, same discipline as tests/chmgen.py.

Emits real baseline sequential JPEGs: SOI/DQT/SOF0/DHT/SOS/EOI, FDCT +
quantization (Annex K tables by default, custom tables accepted — an
all-ones table makes the codec near-lossless for tight assertions),
per-image canonical Huffman tables (fixed-length codes, never the
reserved all-ones code), 4:4:4 or 4:2:0 sampling with box-averaged
chroma, optional restart intervals, 0xFF byte stuffing.

``encode_jpeg_progressive`` emits real progressive (SOF2) streams the
same way — T.81 Annex G spectral selection + successive approximation:
interleaved DC first scan, per-component per-band AC first scans with
EOB-run coding, then DC (raw-bit) and AC refinement scan waves, each
scan with its own DHT.
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


def _prepare(img, qtable_luma, qtable_chroma, subsample):
    """Color transform + sampling + FDCT + quantization: everything
    shared by the baseline and progressive emitters. Returns a dict
    with per-component quantized zigzag block stacks on the MCU-padded
    grid plus all the geometry both scan orders need."""
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

    return {
        "gray": gray, "h": h, "w": w, "samp": samp, "qsel": qsel,
        "hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy,
        "qtables": qtables, "comp_blocks": comp_blocks,
        "nplanes": len(planes),
    }


def encode_jpeg(
    img: np.ndarray,
    qtable_luma: np.ndarray = QT_LUMA,
    qtable_chroma: np.ndarray = QT_CHROMA,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB -> baseline JPEG."""
    prep = _prepare(img, qtable_luma, qtable_chroma, subsample)
    gray = prep["gray"]
    h, w = prep["h"], prep["w"]
    samp, qsel = prep["samp"], prep["qsel"]
    mcux, mcuy = prep["mcux"], prep["mcuy"]
    qtables = prep["qtables"]
    comp_blocks = prep["comp_blocks"]
    nplanes = prep["nplanes"]

    # --- symbol gathering (with restart-aware DC prediction)
    dc_syms = [[] for _ in range(nplanes)]
    ac_syms = [[] for _ in range(nplanes)]

    def _iter_mcu_blocks():
        mcu_i = 0
        preds = [0] * nplanes
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_i and (
                    mcu_i % restart_interval == 0
                ):
                    preds = [0] * nplanes
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
        ">HBHHB", 8 + 3 * nplanes, 8, h, w, nplanes
    )
    for ci in range(nplanes):
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
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nplanes, nplanes)
    tclass = [0] if gray else [0, 1, 1]
    for ci in range(nplanes):
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


# ---------------------------------------------------------------------------
# Progressive (SOF2) emitter — T.81 Annex G, spectral selection +
# successive approximation, written against the spec independently of
# the decoder (same discipline as the baseline emitter above).
# ---------------------------------------------------------------------------


def _shift_mag(v: int, n: int) -> int:
    """AC point transform: arithmetic shift of the MAGNITUDE (G.1.2.2)."""
    return -((-v) >> n) if v < 0 else v >> n


class _ScanWriter:
    """Two-pass scan emission: pass 1 records symbols (bits dropped),
    pass 2 writes Huffman codes + raw bits through a _Writer."""

    def __init__(self, wtr=None, codes=None):
        self.wtr = wtr
        self.codes = codes
        self.symbols = []

    def sym(self, s):
        if self.wtr is None:
            self.symbols.append(s)
        else:
            self.wtr.bits(*self.codes[s])

    def bits(self, val, n):
        if self.wtr is not None and n:
            self.wtr.bits(val, n)


def _dc_first_scan(prep, al, restart_interval, sw):
    mcux, mcuy = prep["mcux"], prep["mcuy"]
    preds = [0] * prep["nplanes"]
    rst_i = 0
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                preds = [0] * prep["nplanes"]
                if sw.wtr is not None:
                    sw.wtr.pad_align()
                    sw.wtr.raw(bytes([0xFF, 0xD0 + (rst_i % 8)]))
                rst_i += 1
            mcu_i += 1
            for ci, (zz, bw, ch, cv) in enumerate(prep["comp_blocks"]):
                for by in range(cv):
                    for bx in range(ch):
                        row = (my * cv + by) * bw + (mx * ch + bx)
                        v = int(zz[row][0]) >> al  # arithmetic shift
                        diff = v - preds[ci]
                        preds[ci] = v
                        t, b = _category(diff)
                        sw.sym(t)
                        sw.bits(b, t)


def _dc_refine_scan(prep, al, restart_interval, wtr):
    """DC refinement: ONE raw bit per block, no Huffman coding."""
    mcux, mcuy = prep["mcux"], prep["mcuy"]
    rst_i = 0
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                wtr.pad_align()
                wtr.raw(bytes([0xFF, 0xD0 + (rst_i % 8)]))
                rst_i += 1
            mcu_i += 1
            for zz, bw, ch, cv in prep["comp_blocks"]:
                for by in range(cv):
                    for bx in range(ch):
                        row = (my * cv + by) * bw + (mx * ch + bx)
                        wtr.bits((int(zz[row][0]) >> al) & 1, 1)


def _noninterleaved_rows(prep, ci):
    """Raster-order block rows of component ci on its OWN grid
    (T.81 A.2.2) — can be smaller than the MCU-padded storage grid."""
    zz, bw, ch, cv = prep["comp_blocks"][ci]
    cw = -(-(prep["w"] * ch) // prep["hmax"])
    chh = -(-(prep["h"] * cv) // prep["vmax"])
    nbw, nbh = -(-cw // 8), -(-chh // 8)
    return [by * bw + bx for by in range(nbh) for bx in range(nbw)]


def _ac_first_scan(prep, ci, ss, se, al, restart_interval, sw):
    zz = prep["comp_blocks"][ci][0]
    eobrun = 0
    rst_i = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            rr = eobrun.bit_length() - 1
            sw.sym(rr << 4)
            sw.bits(eobrun - (1 << rr), rr)
            eobrun = 0

    rows = _noninterleaved_rows(prep, ci)
    for u, row in enumerate(rows):
        if restart_interval and u and u % restart_interval == 0:
            flush_eob()
            if sw.wtr is not None:
                sw.wtr.pad_align()
                sw.wtr.raw(bytes([0xFF, 0xD0 + (rst_i % 8)]))
            rst_i += 1
        band = [_shift_mag(int(zz[row][k]), al) for k in range(ss, se + 1)]
        if any(band):
            flush_eob()
            r = 0
            for v in band:
                if v == 0:
                    r += 1
                    continue
                while r > 15:
                    sw.sym(0xF0)
                    r -= 16
                s, b = _category(v)
                sw.sym((r << 4) | s)
                sw.bits(b, s)
                r = 0
            if r:
                eobrun += 1
        else:
            eobrun += 1
        if eobrun == 0x7FFF:
            flush_eob()
    flush_eob()


def _ac_refine_scan(prep, ci, ss, se, al, restart_interval, sw):
    """AC refinement (G.1.2.3 encoder side): correction bits for
    already-significant coefficients ride along with the NEXT emitted
    symbol's walk (ZRL spans split them at the 16th zero); band tails
    fold into the shared EOB run with their correction bits buffered
    until the EOBn flush — mirror of the decoder's consumption order."""
    ah = al + 1
    zz = prep["comp_blocks"][ci][0]
    eobrun = 0
    bebits: list[int] = []
    rst_i = 0

    def flush_eob():
        nonlocal eobrun, bebits
        if eobrun:
            rr = eobrun.bit_length() - 1
            sw.sym(rr << 4)
            sw.bits(eobrun - (1 << rr), rr)
            for b in bebits:
                sw.bits(b, 1)
            eobrun = 0
            bebits = []

    rows = _noninterleaved_rows(prep, ci)
    for u, row in enumerate(rows):
        if restart_interval and u and u % restart_interval == 0:
            flush_eob()
            if sw.wtr is not None:
                sw.wtr.pad_align()
                sw.wtr.raw(bytes([0xFF, 0xD0 + (rst_i % 8)]))
            rst_i += 1
        # events since the last emitted symbol: ('Z',) zero-history
        # position, ('H', bit) correction bit of a significant one
        evq: list[tuple] = []
        emitted_any = False
        for k in range(ss, se + 1):
            v = int(zz[row][k])
            mag = _shift_mag(abs(v), al)
            hist = abs(v) >> ah
            if hist:
                evq.append(("H", mag & 1))
            elif mag:
                # newly significant (mag == 1 by construction)
                flush_eob()  # pending EOB run must close first
                zcount = sum(1 for e in evq if e[0] == "Z")
                while zcount > 15:
                    sw.sym(0xF0)  # ZRL: spans exactly 16 zeros
                    z = 0
                    while z < 16:
                        ev = evq.pop(0)
                        if ev[0] == "Z":
                            z += 1
                        else:
                            sw.bits(ev[1], 1)
                    zcount -= 16
                sw.sym((zcount << 4) | 1)
                sw.bits(1 if v > 0 else 0, 1)
                for ev in evq:
                    if ev[0] == "H":
                        sw.bits(ev[1], 1)
                evq = []
                emitted_any = True
            else:
                evq.append(("Z",))
        if evq or not emitted_any:
            # band tail (or whole band) covered by the EOB run
            eobrun += 1
            bebits += [ev[1] for ev in evq if ev[0] == "H"]
        if eobrun == 0x7FFF:
            flush_eob()
    flush_eob()


def encode_jpeg_progressive(
    img: np.ndarray,
    qtable_luma: np.ndarray = QT_LUMA,
    qtable_chroma: np.ndarray = QT_CHROMA,
    subsample: str = "444",
    point_transform: int = 1,
    bands: tuple = ((1, 5), (6, 63)),
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB -> progressive (SOF2)
    JPEG: interleaved DC first scan, per-component AC first scans per
    spectral band (EOB-run coded), then DC + AC refinement scan waves
    from Al=point_transform-1 down to 0.  point_transform=0 emits a
    spectral-selection-only stream with no refinement scans."""
    prep = _prepare(img, qtable_luma, qtable_chroma, subsample)
    h, w = prep["h"], prep["w"]
    nplanes = prep["nplanes"]
    pt = point_transform

    out = bytearray(b"\xff\xd8")
    for tq, q in enumerate(prep["qtables"]):
        zzq = np.asarray(q).reshape(64)[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">HB", 2 + 1 + 64, tq)
        out += bytes(int(x) for x in zzq)
    out += b"\xff\xc2" + struct.pack(
        ">HBHHB", 8 + 3 * nplanes, 8, h, w, nplanes
    )
    for ci in range(nplanes):
        samp = prep["samp"][ci]
        out += struct.pack(
            ">BBB", ci + 1, (samp[0] << 4) | samp[1], prep["qsel"][ci]
        )
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    def emit_scan(comp_ids, ss, se, ah, al, encoder, tc):
        """DHT (if Huffman-coded) + SOS + entropy data for one scan.
        encoder(sw) runs twice: symbol pass, then bit pass."""
        nonlocal out
        if encoder is not None:
            pass1 = _ScanWriter()
            encoder(pass1)
            counts, syms, codes = _fixed_table(pass1.symbols or [0])
            out += b"\xff\xc4" + struct.pack(
                ">HB", 2 + 1 + 16 + len(syms), (tc << 4) | 0
            )
            out += bytes(counts) + bytes(syms)
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_ids), len(comp_ids))
        for cid in comp_ids:
            out += struct.pack(">BB", cid, 0)  # DC table 0 / AC table 0
        out += bytes([ss, se, (ah << 4) | al])
        wtr = _Writer()
        if encoder is not None:
            encoder(_ScanWriter(wtr, codes))
        else:
            # DC refinement: raw bits only
            _dc_refine_scan(prep, al, restart_interval, wtr)
        wtr.pad_align()
        out += wtr.out

    all_ids = list(range(1, nplanes + 1))
    # DC first (interleaved), then AC first per component per band
    emit_scan(
        all_ids, 0, 0, 0, pt,
        lambda sw: _dc_first_scan(prep, pt, restart_interval, sw), 0,
    )
    for ci in range(nplanes):
        for ss, se in bands:
            emit_scan(
                [ci + 1], ss, se, 0, pt,
                lambda sw, ci=ci, ss=ss, se=se: _ac_first_scan(
                    prep, ci, ss, se, pt, restart_interval, sw
                ), 1,
            )
    # refinement waves pt-1 .. 0
    for al in range(pt - 1, -1, -1):
        emit_scan(all_ids, 0, 0, al + 1, al, None, 0)
        for ci in range(nplanes):
            for ss, se in bands:
                emit_scan(
                    [ci + 1], ss, se, al + 1, al,
                    lambda sw, ci=ci, ss=ss, se=se, al=al: _ac_refine_scan(
                        prep, ci, ss, se, al, restart_interval, sw
                    ), 1,
                )
    out += b"\xff\xd9"
    return bytes(out)
