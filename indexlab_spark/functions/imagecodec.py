"""Pure-stdlib image codecs (PNG + BMP + Huffman JPEG + GIF) for the
multimodal decode path.

The container has no PIL/opencv, but PNG is just zlib (stdlib) over
filtered scanlines, BMP is raw pixels, Huffman JPEG (ITU-T T.81) is
Huffman + dequant + IDCT, and GIF is LZW + palettes — all
implementable on ``struct`` + ``zlib`` + numpy. This turns
``multimodal.decode_image`` from a stub into a genuine decoder for
PNG (bit depth 8: gray / gray+alpha / RGB / RGBA, non-interlaced),
BMP (24bpp uncompressed), JPEG (baseline sequential SOF0/SOF1 since
r15, progressive SOF2 — Annex G spectral selection + successive
approximation — since r16; gray or JFIF YCbCr, sampling factors to
4x4, restart intervals; arithmetic/12-bit stay gated) and GIF
(87a/89a since r16: variable-width LZW, global/local color tables,
4-pass interlacing, multi-frame compositing with transparency and
disposal methods 0-3).

The encoder exists so tests can round-trip REAL images — including
per-row filter types 1-4 (Sub/Up/Average/Paeth), which exercises every
branch of the unfilter logic against its exact inverse.

Formats are public specifications (PNG: RFC 2083 / ISO 15948; BMP:
Windows BITMAPINFOHEADER; GIF: CompuServe 89a / W3C note).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_COLORTYPE_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # 3 = palette index


def sniff_image(data: bytes) -> str | None:
    """'png' | 'bmp' | 'jpeg' | 'gif' | None (unknown)."""
    if data is None:
        return None
    if data[:8] == PNG_SIG:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
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


# =====================================================================
# Baseline JPEG (ITU-T T.81 / JFIF) — pure stdlib + numpy
# =====================================================================
#
# Added round 15, same blocked->built move as the CHM/LZX reader: the
# container has no PIL, but baseline sequential JPEG is a public
# specification (ITU-T T.81, Annex F decode procedure; Annex K
# reference tables) and decodes fine on struct + numpy. Supported:
# SOF0 (baseline), 8-bit samples, 1 component (grayscale) or 3
# components (JFIF YCbCr) with sampling factors up to 4x4 (covers
# 4:4:4 / 4:2:2 / 4:2:0 / 4:1:1), restart intervals, 8/16-bit DQT.
# Round 16 added progressive (SOF2): T.81 Annex G spectral selection +
# successive approximation, DC/AC first + refinement scans with EOB
# runs, interleaved DC and non-interleaved AC ordering. Arithmetic
# coding, 12-bit, and CMYK stay gated with a loud NotImplementedError.
# Attested by an independent test-side encoder (tests/jpeggen.py —
# baseline AND progressive emitters) + hand-built one-MCU vectors.

_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Orthonormal 8-point DCT-II basis: C[u, x] = a(u) cos((2x+1)u pi / 16)
_DCT_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _DCT_C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _idct2(blocks: np.ndarray) -> np.ndarray:
    """Inverse 2-D DCT over an (n, 8, 8) stack: C^T B C, vectorized."""
    return np.einsum("ux,nuv,vy->nxy", _DCT_C, blocks, _DCT_C)


class _JpegBits:
    """T.81 entropy bitstream: bytes MSB-first; 0xFF is followed by a
    0x00 stuffing byte (dropped) or a marker (ends the segment)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.n = 0
        self.marker = None

    def read_bit(self) -> int:
        if self.n == 0:
            if self.marker is not None:
                return 1  # pad with 1-bits past a marker (T.81 F.2.2.5)
            d = self.data
            p = self.pos
            if p >= len(d):
                raise ValueError("truncated JPEG entropy stream")
            b = d[p]
            p += 1
            if b == 0xFF:
                nxt = d[p] if p < len(d) else 0xD9
                if nxt == 0x00:
                    p += 1
                else:
                    # a real marker ends the entropy segment; leave pos
                    # AT the 0xFF and pad with 1-bits from here on
                    self.marker = nxt
                    return 1
            self.buf = b
            self.n = 8
            self.pos = p
        self.n -= 1
        return (self.buf >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Consume an RSTn marker at a restart boundary (the encoder
        byte-aligns before emitting it; fill 0xFF bytes allowed)."""
        self.buf = 0
        self.n = 0
        d, p = self.data, self.pos
        while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xFF:
            p += 1
        if p + 1 < len(d) and d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
            self.pos = p + 2
            self.marker = None
        else:
            raise ValueError("missing JPEG restart marker")


def _build_huff(counts: list[int], symbols: bytes) -> dict:
    """T.81 Annex C canonical code: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(bits: _JpegBits, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | bits.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Huffman JPEG bytes (baseline SOF0/1 or progressive SOF2) ->
    uint8 array: (h, w) grayscale or (h, w, 3) RGB (JFIF YCbCr -> RGB,
    chroma box-upsampled).

    Malformed input raises ValueError (the multimodal dispatch maps
    that to its deterministic fake); genuinely unsupported PROFILES
    (arithmetic, 12-bit, CMYK) raise NotImplementedError
    — a gate, not a parse failure."""
    try:
        return _decode_jpeg(data)
    except (struct.error, IndexError, KeyError, ZeroDivisionError) as e:
        # KeyError: a scan referencing an undefined Huffman/quant table
        # or a component id absent from SOF; ZeroDivisionError: a zero
        # sampling factor.  All are malformed input, not profile gates.
        raise ValueError(f"malformed JPEG: {e!r}") from e


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None

    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        # runs of 0xFF before a marker are legal fill bytes
        # (T.81 B.1.1.2): FF FF DB is one DQT marker, not marker 0xFF
        # followed by a bogus segment length
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            if marker == 0xD9:
                break
            continue
        (seg_len,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2:pos + seg_len]
        next_pos = pos + seg_len
        if marker == 0xDB:  # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0xF
                sp += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[sp:sp + 64], dtype=np.uint8)
                    sp += 64
                else:
                    tbl = np.frombuffer(
                        seg[sp:sp + 128], dtype=">u2"
                    )
                    sp += 128
                qtables[tq] = tbl.astype(np.int64)
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0xF
                counts = list(seg[sp + 1:sp + 17])
                n = sum(counts)
                symbols = seg[sp + 17:sp + 17 + n]
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huff(
                    counts, symbols
                )
                sp += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker in (0xC0, 0xC1, 0xC2):
            # SOF0/1 (both Huffman sequential) or SOF2 (Huffman
            # progressive, T.81 Annex G) — same frame header layout
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG unsupported")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG unsupported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * ci)
                sh, sv = hv >> 4, hv & 0xF
                if nc == 1:
                    # a single-component scan is non-interleaved: data
                    # units come in plain raster order, ignoring the
                    # declared sampling factors (T.81 A.2.2) — decoding
                    # on the interleaved MCU grid would expect the
                    # wrong block count/order
                    sh = sv = 1
                if not (1 <= sh <= 4 and 1 <= sv <= 4):
                    raise ValueError(
                        f"invalid JPEG sampling factors {sh}x{sv}"
                    )
                comps.append({"id": cid, "h": sh, "v": sv, "tq": tq})
            frame = {
                "h": h, "w": w, "comps": comps,
                "progressive": marker == 0xC2,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only Huffman baseline/progressive JPEG (SOF0/1/2) is "
                "supported"
            )
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            by_id = {c["id"]: c for c in frame["comps"]}
            scan_sel = {}
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                if cs not in by_id:
                    raise ValueError(
                        f"JPEG scan references unknown component {cs}"
                    )
                scan_sel[cs] = (tt >> 4, tt & 0xF)

            if not frame["progressive"]:
                if ns != len(frame["comps"]):
                    raise NotImplementedError(
                        "non-interleaved multi-scan baseline JPEG "
                        "unsupported"
                    )
                for c in frame["comps"]:
                    if c["id"] not in scan_sel:
                        raise ValueError(
                            f"JPEG scan omits frame component {c['id']}"
                        )
                    dc_t, ac_t = scan_sel[c["id"]]
                    if dc_t not in huff_dc or ac_t not in huff_ac:
                        raise ValueError(
                            f"JPEG scan references undefined Huffman "
                            f"table (dc={dc_t}, ac={ac_t})"
                        )
                    if c["tq"] not in qtables:
                        raise ValueError(
                            f"JPEG component references undefined quant "
                            f"table {c['tq']}"
                        )
                return _decode_scan(
                    data, next_pos, frame, scan_sel, qtables,
                    huff_dc, huff_ac, restart_interval,
                )

            # ---- progressive scan (T.81 Annex G)
            ss = seg[1 + 2 * ns]
            se = seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if "coef" not in frame["comps"][0]:
                _init_geometry(frame)
            scan_comps = [by_id[cs] for cs in scan_sel]
            for cs, (dc_t, ac_t) in scan_sel.items():
                by_id[cs]["dc_t"], by_id[cs]["ac_t"] = dc_t, ac_t
            pos = _decode_progressive_scan(
                data, next_pos, frame, scan_comps, ss, se, ah, al,
                huff_dc, huff_ac, restart_interval,
            )
            frame["scanned"] = True
            continue
        pos = next_pos
    if frame is not None and frame.get("scanned"):
        return _assemble(frame, qtables)
    raise ValueError("JPEG has no SOS scan")


def _init_geometry(frame):
    """Block geometry + zeroed coefficient planes for every component:
    the interleaved (MCU-padded) grid bw x bh, plus the non-interleaved
    grid nbw x nbh a single-component scan walks in raster order
    (T.81 A.2.2 — the component's true block count, which can be
    smaller than the MCU-padded grid when sampling factors > 1)."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    frame["hmax"], frame["vmax"] = hmax, vmax
    frame["mcux"], frame["mcuy"] = mcux, mcuy
    for c in comps:
        c["bw"] = mcux * c["h"]          # blocks per row (padded grid)
        c["bh"] = mcuy * c["v"]
        cw = -(-(w * c["h"]) // hmax)     # component sample width
        chh = -(-(h * c["v"]) // vmax)    # component sample height
        c["nbw"] = -(-cw // 8)
        c["nbh"] = -(-chh // 8)
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)
        c["pred"] = 0


def _assemble(frame, qtables):
    """Dequantize + IDCT the accumulated coefficient planes and stitch
    the final image (shared by the baseline and progressive paths)."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    planes = []
    for c in comps:
        if c["tq"] not in qtables:
            raise ValueError(
                f"JPEG component references undefined quant table {c['tq']}"
            )
        q = qtables[c["tq"]]
        dq = np.zeros((c["coef"].shape[0], 64), dtype=np.float64)
        dq[:, _ZIGZAG] = c["coef"] * q  # de-zigzag + dequant
        pix = _idct2(dq.reshape(-1, 8, 8)) + 128.0
        plane = (
            pix.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # upsample to full resolution (box/nearest, JFIF-typical)
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_scan(data, pos, frame, scan_sel, qtables, huff_dc, huff_ac,
                 restart_interval):
    comps = frame["comps"]
    _init_geometry(frame)
    mcux, mcuy = frame["mcux"], frame["mcuy"]
    for c in comps:
        c["dc_t"], c["ac_t"] = scan_sel[c["id"]]

    bits = _JpegBits(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                bits.sync_restart()
                for c in comps:
                    c["pred"] = 0
            mcu_count += 1
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, dtype=np.int64)
                        t = _huff_decode(bits, huff_dc[c["dc_t"]])
                        diff = _extend(bits.read_bits(t), t)
                        c["pred"] += diff
                        blk[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(bits, huff_ac[c["ac_t"]])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break        # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run overflow")
                            blk[k] = _extend(bits.read_bits(s), s)
                            k += 1
                        row = (my * c["v"] + by) * c["bw"] + (mx * c["h"] + bx)
                        c["coef"][row] = blk

    return _assemble(frame, qtables)


def _decode_progressive_scan(data, pos, frame, comps, ss, se, ah, al,
                             huff_dc, huff_ac, restart_interval):
    """One SOF2 scan (T.81 Annex G): DC first/refinement (interleaved
    or single-component) or AC first/refinement (single-component
    only, per G.1.1.1.1). Accumulates into each component's ``coef``
    plane; returns the stream position after the scan's entropy data
    (AT the terminating 0xFF if a marker ended it, so the caller's
    marker loop resumes cleanly)."""
    if al > 13 or ah > 13:
        raise ValueError("JPEG successive approximation out of range")
    bits = _JpegBits(data, pos)
    if ss == 0:
        # ---- DC scan (Se must be 0; DC refinement is raw bits)
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        if ah == 0:
            for c in comps:
                if c["dc_t"] not in huff_dc:
                    raise ValueError(
                        f"JPEG scan references undefined DC table "
                        f"{c['dc_t']}"
                    )
                c["pred"] = 0
        elif al != ah - 1:
            raise ValueError("progressive DC refinement needs Al == Ah-1")

        def dc_unit(c, row):
            blk = c["coef"][row]
            if ah == 0:
                t = _huff_decode(bits, huff_dc[c["dc_t"]])
                c["pred"] += _extend(bits.read_bits(t), t)
                blk[0] = c["pred"] << al
            elif bits.read_bit():
                blk[0] |= 1 << al

        interleaved = len(comps) > 1
        if interleaved:
            mcux = frame["mcux"]
            units = mcux * frame["mcuy"]
        else:
            c0 = comps[0]
            units = c0["nbw"] * c0["nbh"]
        for u in range(units):
            if restart_interval and u and u % restart_interval == 0:
                bits.sync_restart()
                for c in comps:
                    c["pred"] = 0
            if interleaved:
                my, mx = divmod(u, mcux)
                for c in comps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            dc_unit(
                                c,
                                (my * c["v"] + by) * c["bw"]
                                + mx * c["h"] + bx,
                            )
            else:
                by, bx = divmod(u, c0["nbw"])
                dc_unit(c0, by * c0["bw"] + bx)
        return bits.pos

    # ---- AC scan: always non-interleaved (T.81 G.1.1.1.1)
    if len(comps) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if not (1 <= ss <= se <= 63):
        raise ValueError(f"bad JPEG spectral band {ss}..{se}")
    c = comps[0]
    if c["ac_t"] not in huff_ac:
        raise ValueError(
            f"JPEG scan references undefined AC table {c['ac_t']}"
        )
    table = huff_ac[c["ac_t"]]
    eobrun = 0
    units = c["nbw"] * c["nbh"]
    for u in range(units):
        if restart_interval and u and u % restart_interval == 0:
            bits.sync_restart()
            eobrun = 0
        by, bx = divmod(u, c["nbw"])
        blk = c["coef"][by * c["bw"] + bx]
        if ah == 0:
            eobrun = _ac_first(bits, blk, ss, se, al, table, eobrun)
        else:
            if al != ah - 1:
                raise ValueError(
                    "progressive AC refinement needs Al == Ah-1"
                )
            eobrun = _ac_refine(bits, blk, ss, se, al, table, eobrun)
    return bits.pos


def _ac_first(bits, blk, ss, se, al, table, eobrun):
    """G.1.2.2 — first AC scan of a band: (run, size) codes shifted by
    the point transform, plus EOBn end-of-band run codes that cover
    whole blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(bits, table)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += bits.read_bits(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("JPEG AC band overflow")
        blk[k] = _extend(bits.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine(bits, blk, ss, se, al, table, eobrun):
    """G.1.2.3 — AC refinement scan: each already-nonzero coefficient
    passed over consumes one correction bit; (run, 1) codes place
    newly significant coefficients at +-2^Al; EOBn covers the band
    tails of whole blocks (correction bits included)."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(k):
        if bits.read_bit() and not (blk[k] & p1):
            blk[k] += p1 if blk[k] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(bits, table)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += bits.read_bits(r)
                    break
                # r == 15: skip 16 zero-history positions
            elif s == 1:
                val = p1 if bits.read_bit() else m1
            else:
                raise ValueError("bad JPEG refinement magnitude")
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


# =====================================================================
# GIF (87a / 89a) — pure stdlib + numpy
# =====================================================================
#
# Round 16: GIF is the third big web-corpus image format after JPEG
# and PNG, and it is pure public specification (GIF89a, CompuServe
# 1990 / W3C note): LZW with variable code width, global/local color
# tables, 4-pass interlacing, and 89a animation extensions (graphic
# control, transparency, disposal methods). Attested by an
# independent test-side encoder (tests/gifgen.py) — GIF is lossless,
# so round trips assert EXACT pixel equality.


def _gif_lzw_decode(min_code_size: int, data: bytes, npix: int) -> bytearray:
    """GIF-variant LZW: codes packed LSB-first, width starts
    min_code_size+1, CLEAR resets the dictionary, width grows when the
    next entry would overflow the current width (cap 12 bits; a full
    4096-entry dictionary stays static until the next CLEAR)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # dictionary as (prefix_code, last_byte); roots are (-1, k)
    prefix = [-1] * 4096
    suffix = [0] * 4096

    def reset():
        for k in range(clear):
            prefix[k] = -1
            suffix[k] = k
        return clear + 2, min_code_size + 1

    next_code, width = reset()
    buf = 0
    nbits = 0
    pos = 0
    prev = -1
    first_byte = 0
    while len(out) < npix:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            buf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = buf & ((1 << width) - 1)
        buf >>= width
        nbits -= width
        if code == clear:
            next_code, width = reset()
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            if code >= clear:
                raise ValueError("bad first GIF LZW code")
            out.append(code)
            prev = code
            first_byte = code
            continue
        if code < next_code:
            entry_code = code
        elif code == next_code:
            entry_code = -2  # KwKwK: prev + first byte of prev
        else:
            raise ValueError("GIF LZW code out of range")
        # expand entry
        chunk = bytearray()
        if entry_code == -2:
            c = prev
        else:
            c = entry_code
        while c >= 0:
            chunk.append(suffix[c])
            c = prefix[c]
        chunk.reverse()
        if entry_code == -2:
            chunk.append(first_byte)
        first_byte = chunk[0]
        out += chunk
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = first_byte
            next_code += 1
            # the decoder's table lags the encoder's by ONE entry (the
            # encoder adds entry i when emitting code i; the decoder
            # learns entry i only from code i+1), so the decoder must
            # widen at 2^width - 1 where the encoder widens at 2^width
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
        prev = code if entry_code != -2 else next_code - 1
    return out


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    out = np.empty_like(idx)
    src = 0
    for start, step in _GIF_INTERLACE:
        for row in range(start, h, step):
            out[row] = idx[src]
            src += 1
    return out


def _parse_gif(data: bytes):
    """Parse container: (w, h, gct, bg_index, frames) where each frame
    is a dict {left, top, w, h, indices (h,w) uint8, palette (n,3),
    transparent (int|None), disposal (int)}."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (missing GIF87a/89a signature)")
    w, h, packed, bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(data[pos:pos + 3 * n], dtype=np.uint8)
        if len(gct) < 3 * n:
            raise ValueError("truncated GIF global color table")
        gct = gct.reshape(n, 3).copy()
        pos += 3 * n
    frames = []
    transparent = None
    disposal = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            subs = []
            while True:
                if pos >= len(data):
                    raise ValueError("truncated GIF extension")
                ln = data[pos]
                pos += 1
                if ln == 0:
                    break
                subs.append(data[pos:pos + ln])
                pos += ln
            if label == 0xF9 and subs:  # graphic control
                gce = subs[0]
                disposal = (gce[0] >> 2) & 7
                transparent = gce[3] if (gce[0] & 1) else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        fl, ft, fw, fh, fpacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        palette = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 7)
            palette = np.frombuffer(
                data[pos:pos + 3 * n], dtype=np.uint8
            )
            if len(palette) < 3 * n:
                raise ValueError("truncated GIF local color table")
            palette = palette.reshape(n, 3).copy()
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF frame with no color table")
        min_code = data[pos]
        pos += 1
        if not (2 <= min_code <= 11):
            raise ValueError(f"bad GIF LZW min code size {min_code}")
        lzw = bytearray()
        while True:
            if pos >= len(data):
                raise ValueError("truncated GIF image data")
            ln = data[pos]
            pos += 1
            if ln == 0:
                break
            lzw += data[pos:pos + ln]
            pos += ln
        idx = np.frombuffer(
            _gif_lzw_decode(min_code, bytes(lzw), fw * fh), dtype=np.uint8
        )[: fw * fh]
        if len(idx) < fw * fh:
            raise ValueError("GIF frame pixel data underrun")
        idx = idx.reshape(fh, fw)
        if fpacked & 0x40:
            idx = _gif_deinterlace(idx)
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("GIF pixel index outside color table")
        frames.append({
            "left": fl, "top": ft, "w": fw, "h": fh, "indices": idx,
            "palette": palette, "transparent": transparent,
            "disposal": disposal,
        })
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF has no image frames")
    return w, h, gct, bg, frames


def gif_frames(data: bytes, max_frames: int | None = None) -> list[np.ndarray]:
    """Decode GIF bytes into composited RGB frames ((h, w, 3) uint8
    each): the canvas starts at the background color (black if the
    background index is transparent or there is no global table),
    frames draw at their offsets honoring per-frame transparency, and
    disposal methods 0/1 (keep), 2 (restore background) and 3
    (restore previous) apply between frames."""
    try:
        w, h, gct, bg, frames = _parse_gif(data)
    except (struct.error, IndexError) as e:
        # truncated headers/descriptors are malformed input, not a gate
        raise ValueError(f"malformed GIF: {e!r}") from e
    if gct is not None and bg < len(gct):
        bg_rgb = gct[bg]
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    canvas = np.broadcast_to(bg_rgb, (h, w, 3)).copy()
    out = []
    for fr in frames:
        if fr["disposal"] == 3:
            saved = canvas.copy()
        x0, y0 = fr["left"], fr["top"]
        x1, y1 = min(x0 + fr["w"], w), min(y0 + fr["h"], h)
        if x1 > x0 and y1 > y0:
            idx = fr["indices"][: y1 - y0, : x1 - x0]
            rgb = fr["palette"][idx]
            region = canvas[y0:y1, x0:x1]
            if fr["transparent"] is not None:
                mask = (idx != fr["transparent"])[..., None]
                region[...] = np.where(mask, rgb, region)
            else:
                region[...] = rgb
        out.append(canvas.copy())
        if len(out) == (max_frames or 0):
            break
        if fr["disposal"] == 2:
            canvas[y0:y1, x0:x1] = bg_rgb
        elif fr["disposal"] == 3:
            canvas = saved
    return out


def decode_gif(data: bytes, frame: int = 0) -> np.ndarray:
    """GIF bytes -> (h, w, 3) uint8 RGB of the requested composited
    frame (frames up to ``frame`` are applied with their disposal
    methods, matching what a viewer shows at that point)."""
    frames = gif_frames(data, max_frames=frame + 1)
    if frame >= len(frames):
        raise ValueError(
            f"GIF has {len(frames)} frames, requested {frame}"
        )
    return frames[frame]


class _GifLzwWriter:
    """LSB-first variable-width code packer for :func:`encode_gif`."""

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
        return bytes(self.out)


def _gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW compressor: CLEAR first, width grows when the
    table crosses 2^width (the encoder side of the asymmetry the
    decoder compensates at 2^width - 1), CLEAR + reset at the
    4096-entry cap."""
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _GifLzwWriter()

    def fresh():
        return (
            {bytes([k]): k for k in range(clear)},
            clear + 2,
            min_code_size + 1,
        )

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
        else:
            w.code(clear, width)
            table, next_code, width = fresh()
        cur = bytes([b])
    if cur:
        w.code(table[cur], width)
    w.code(eoi, width)
    return w.flush()


def encode_gif(
    indices: np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
    transparent: int | None = None,
) -> bytes:
    """(h, w) uint8 index array + (n, 3) uint8 palette -> single-frame
    GIF89a bytes (optionally 4-pass interlaced; GIF is lossless so
    ``decode_gif(encode_gif(idx, pal)) == pal[idx]`` exactly). The
    write-side sibling of :func:`encode_png` / :func:`encode_bmp` for
    palette imagery."""
    idx = np.ascontiguousarray(indices, dtype=np.uint8)
    if idx.ndim != 2:
        raise ValueError("encode_gif needs a 2-D index array")
    pal = np.ascontiguousarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or not (1 <= len(pal) <= 256):
        raise ValueError("palette must be (n, 3) with 1 <= n <= 256")
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError("index outside palette")
    h, w = idx.shape
    size = 1
    while (2 << size) < len(pal):
        size += 1
    full = np.zeros((2 << size, 3), dtype=np.uint8)
    full[: len(pal)] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size, 0, 0)
    out += full.tobytes()
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    packed = 0x40 if interlace else 0
    out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, w, h, packed)
    if interlace:
        rows = [idx[r] for start, step in _GIF_INTERLACE
                for r in range(start, h, step)]
        idx = np.stack(rows)
    mcs = max(2, int(len(pal) - 1).bit_length())
    out += bytes([mcs])
    lzw = _gif_lzw_encode(idx.tobytes(), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out += bytes([len(chunk)])
        out += chunk
    out += bytes([0, 0x3B])
    return bytes(out)
