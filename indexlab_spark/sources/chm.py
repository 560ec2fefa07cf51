"""S5 — CHM (Compiled HTML Help) reader, pure stdlib.

The reference decompiles .chm by shelling out to ``hh.exe -decompile``
or 7-Zip and then walking the extracted tree (reference
``app/ingest/reader.py:44-83``; walk + caps at ``reader.py:100-133``).
Neither binary exists in this environment — and shelling out is the
wrong shape for a data-plane reader anyway — so this module implements
the container and its compression directly from the PUBLIC format
documentation:

- ITSS/CHM container layout (ITSF file header, ITSP directory header,
  PMGL listing chunks, ENCINT varints, ``::DataSpace`` metafiles):
  Microsoft's unpublished-but-long-documented format, as described in
  the widely mirrored "Microsoft's HTML Help (.chm) format"
  unofficial specification and implemented by open-source readers
  (chmlib, 7-Zip, KchmViewer).
- LZX compression (the MSCompressed content section): Microsoft's
  public MS-PATCH "LZX DELTA Compression" specification; the CHM
  profile ("LZXC" control data: reset intervals, window size in
  0x8000 units) from the same unofficial CHM notes.

Everything here is hand-written against those documents on stdlib
``struct`` only — no external binaries, no third-party packages.
Correctness is attested the same way as the zlib/BPE nets: the test
suite BUILDS its own CHM archives (container writer + a from-scratch
LZX encoder emitting uncompressed, verbatim and aligned-offset blocks)
and round-trips them through this reader, plus hand-computed bitstream
vectors for each LZX block type.

Scale note: a .chm is a single driver-side file capped by the
reference contract at 10k member files / 100 MB extracted — driver
extraction + ``spark.createDataFrame`` over the member rows is the
right distribution boundary (the expensive part, HTML→text over
members, runs distributed downstream).
"""

from __future__ import annotations

import struct
from typing import Iterator

# Reference caps (reference reader.py:7-8) — enforced by the caller
# (sources/reader.read_chm) on the EXTRACTED members, mirrored here as
# parse-time guards against hostile directories.
MAX_CHM_FILES = 10_000
MAX_CHM_BYTES = 100 * 1024 * 1024


class ChmFormatError(ValueError):
    """Raised when the bytes are not a well-formed CHM archive."""


# =====================================================================
# LZX decompressor (MS-PATCH profile used by CHM's LZXC sections)
# =====================================================================

# Position slots: extra_bits[slot] = 0 for slots 0-3, then
# (slot >> 1) - 1 capped at 17 (MS-PATCH §2.3; slots beyond 36 all use
# 17 extra bits). position_base is the running sum of 1 << extra_bits.
_EXTRA_BITS = [0 if i < 4 else min(17, (i >> 1) - 1) for i in range(51)]
_POSITION_BASE = [0] * 51
for _i in range(50):
    _POSITION_BASE[_i + 1] = _POSITION_BASE[_i] + (1 << _EXTRA_BITS[_i])

_PRETREE_SYMS = 20
_ALIGNED_SYMS = 8
_NUM_CHARS = 256
_PRIMARY_LENS = 7
_LENGTH_SYMS = 249
_MIN_MATCH = 2
_MAX_CODE_BITS = 16

_BLOCK_VERBATIM = 1
_BLOCK_ALIGNED = 2
_BLOCK_UNCOMPRESSED = 3


class _Bits:
    """MS-PATCH bit order: the stream is a sequence of little-endian
    16-bit words; bits are consumed MSB-first within each word. Reads
    past the end pad with zero words (the encoder flushes to a word
    boundary, so trailing zero-padding is part of the contract)."""

    __slots__ = ("data", "pos", "buf", "n")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.n = 0

    def _ensure(self, nbits: int) -> None:
        while self.n < nbits:
            p = self.pos
            d = self.data
            if p + 1 < len(d):
                w = d[p] | (d[p + 1] << 8)
            elif p < len(d):
                w = d[p]
            else:
                w = 0
            self.pos = p + 2
            self.buf = ((self.buf << 16) | w) & 0xFFFFFFFFFFFF
            self.n += 16

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        self._ensure(nbits)
        self.n -= nbits
        return (self.buf >> self.n) & ((1 << nbits) - 1)

    def peek16(self) -> int:
        self._ensure(_MAX_CODE_BITS)
        return (self.buf >> (self.n - _MAX_CODE_BITS)) & 0xFFFF

    def drop(self, nbits: int) -> None:
        self.n -= nbits

    def bit_position(self) -> int:
        """Absolute bit offset of the next unread bit."""
        return self.pos * 8 - self.n


def _build_table(lengths: list[int]) -> list | None:
    """Canonical Huffman decode table (MS-PATCH: shorter codes first,
    ties by symbol index, codes assigned MSB-first): a flat 2^16 array
    mapping the next 16 peeked bits to (symbol, code_length). Returns
    None for an empty tree (all lengths zero — legal for e.g. an
    unused length tree)."""
    max_bits = _MAX_CODE_BITS
    bl_count = [0] * (max_bits + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    if not any(bl_count):
        return None
    next_code = [0] * (max_bits + 1)
    code = 0
    for b in range(1, max_bits + 1):
        code = (code + bl_count[b - 1]) << 1
        next_code[b] = code
    table: list = [None] * (1 << max_bits)
    for sym, ln in enumerate(lengths):
        if not ln:
            continue
        c = next_code[ln]
        next_code[ln] = c + 1
        if c >> ln:
            raise ChmFormatError("over-subscribed Huffman code lengths")
        start = c << (max_bits - ln)
        entry = (sym, ln)
        for i in range(start, start + (1 << (max_bits - ln))):
            table[i] = entry
    return table


def _read_sym(bits: _Bits, table: list) -> int:
    entry = table[bits.peek16()]
    if entry is None:
        raise ChmFormatError("invalid Huffman code in LZX stream")
    bits.drop(entry[1])
    return entry[0]


def _read_lengths(bits: _Bits, lens: list[int], first: int, last: int) -> None:
    """MS-PATCH delta length encoding: a 20-symbol pretree (4-bit
    lengths) codes the new lengths as (prev - sym) mod 17, with run
    symbols 17 (zeros, 4+4 bits), 18 (zeros, 5+20 bits) and 19
    (repeat a delta, 1+4 bits then one more pretree symbol)."""
    pre = [bits.read(4) for _ in range(_PRETREE_SYMS)]
    pretable = _build_table(pre)
    if pretable is None:
        raise ChmFormatError("empty pretree")
    x = first
    while x < last:
        z = _read_sym(bits, pretable)
        if z == 17:
            run = bits.read(4) + 4
            for _ in range(run):
                if x < last:
                    lens[x] = 0
                    x += 1
        elif z == 18:
            run = bits.read(5) + 20
            for _ in range(run):
                if x < last:
                    lens[x] = 0
                    x += 1
        elif z == 19:
            run = bits.read(1) + 4
            z2 = _read_sym(bits, pretable)
            val = (lens[x] - z2) % 17 if x < last else 0
            for _ in range(run):
                if x < last:
                    lens[x] = val
                    x += 1
        else:
            lens[x] = (lens[x] - z) % 17
            x += 1


def lzx_decompress(data: bytes, out_len: int, window_bits: int) -> bytes:
    """Decompress ONE LZX stream (i.e. one reset span of a CHM LZXC
    section — fresh Huffman state, R0=R1=R2=1, its own E8 header bit)
    to exactly ``out_len`` bytes.

    Implements all three MS-PATCH block types (verbatim, aligned
    offset, uncompressed) and the Intel E8 call translation
    preprocessing (applied per 32 KiB frame when the header declares a
    nonzero translation size)."""
    if not 15 <= window_bits <= 21:
        raise ChmFormatError(f"LZX window bits out of range: {window_bits}")
    if window_bits == 20:
        posn_slots = 42
    elif window_bits == 21:
        posn_slots = 50
    else:
        posn_slots = window_bits << 1
    main_syms = _NUM_CHARS + (posn_slots << 3)

    bits = _Bits(data)
    # Stream header: 1 bit E8 flag; if set, 32-bit translation size
    # (high 16 bits first).
    intel_size = 0
    if bits.read(1):
        hi = bits.read(16)
        lo = bits.read(16)
        intel_size = (hi << 16) | lo

    out = bytearray()
    main_lens = [0] * main_syms
    length_lens = [0] * _LENGTH_SYMS
    r0 = r1 = r2 = 1

    while len(out) < out_len:
        block_type = bits.read(3)
        block_len = bits.read(24)
        if block_len == 0:
            raise ChmFormatError("zero-length LZX block")

        if block_type == _BLOCK_UNCOMPRESSED:
            # Align to a 16-bit boundary, then 12 bytes of new R0/R1/R2
            # (32-bit LE each), then the raw bytes, then a pad byte if
            # block_len is odd.  MS-PATCH specifies 1-16 pad bits (not
            # 0-15): a stream already on a word boundary still carries a
            # full 16-bit pad word (libmspack/chmlib skip 16 bits when
            # bits_left == 0).
            misalign = bits.bit_position() & 15
            bits.read(16 - misalign if misalign else 16)
            p = bits.bit_position() >> 3
            if p + 12 + block_len > len(data):
                raise ChmFormatError("uncompressed LZX block overruns input")
            r0, r1, r2 = struct.unpack_from("<III", data, p)
            if r0 == 0 or r1 == 0 or r2 == 0:
                raise ChmFormatError("zero repeated offset in LZX stream")
            p += 12
            out += data[p:p + block_len]
            p += block_len + (block_len & 1)
            bits = _Bits(data, p)
            continue

        if block_type == _BLOCK_ALIGNED:
            aligned_lens = [bits.read(3) for _ in range(_ALIGNED_SYMS)]
            aligned_table = _build_table(aligned_lens)
        elif block_type == _BLOCK_VERBATIM:
            aligned_table = None
        else:
            raise ChmFormatError(f"bad LZX block type {block_type}")

        # Main tree arrives in two delta-coded halves (literals, then
        # match elements), each with its own pretree; then the length
        # tree. Deltas are against the PREVIOUS block's lengths.
        _read_lengths(bits, main_lens, 0, _NUM_CHARS)
        _read_lengths(bits, main_lens, _NUM_CHARS, main_syms)
        main_table = _build_table(main_lens)
        if main_table is None:
            raise ChmFormatError("empty LZX main tree")
        _read_lengths(bits, length_lens, 0, _LENGTH_SYMS)
        length_table = _build_table(length_lens)

        # Hot loop: the bit state lives in locals (CPython attribute
        # access dominates otherwise — measured 1.5 -> ~5 MB/s), with
        # ensure/peek/drop inlined; semantics identical to _Bits +
        # _read_sym. State is written back to `bits` after the block
        # so the next block header decodes through the shared reader.
        d = data
        dlen = len(d)
        p, buf, n = bits.pos, bits.buf, bits.n
        extra_bits = _EXTRA_BITS
        position_base = _POSITION_BASE
        is_aligned = block_type == _BLOCK_ALIGNED
        togo = block_len
        while togo > 0:
            while n < 16:
                if p + 1 < dlen:
                    w = d[p] | (d[p + 1] << 8)
                elif p < dlen:
                    w = d[p]
                else:
                    w = 0
                p += 2
                buf = ((buf << 16) | w) & 0xFFFFFFFFFFFF
                n += 16
            entry = main_table[(buf >> (n - 16)) & 0xFFFF]
            if entry is None:
                raise ChmFormatError("invalid Huffman code in LZX stream")
            sym, ln = entry
            n -= ln
            if sym < 256:
                out.append(sym)
                togo -= 1
                continue
            sym -= 256
            match_len = sym & 7
            if match_len == 7:
                if length_table is None:
                    raise ChmFormatError("secondary length with empty tree")
                while n < 16:
                    if p + 1 < dlen:
                        w = d[p] | (d[p + 1] << 8)
                    elif p < dlen:
                        w = d[p]
                    else:
                        w = 0
                    p += 2
                    buf = ((buf << 16) | w) & 0xFFFFFFFFFFFF
                    n += 16
                entry = length_table[(buf >> (n - 16)) & 0xFFFF]
                if entry is None:
                    raise ChmFormatError("invalid Huffman code in LZX stream")
                match_len += entry[0]
                n -= entry[1]
            match_len += 2
            slot = sym >> 3
            if slot == 0:
                offset = r0
            elif slot == 1:
                offset = r1
                r1 = r0
                r0 = offset
            elif slot == 2:
                offset = r2
                r2 = r0
                r0 = offset
            else:
                extra = extra_bits[slot]
                if is_aligned and extra >= 3:
                    # low 3 offset bits come from the aligned tree
                    if aligned_table is None:
                        raise ChmFormatError(
                            "aligned offset with empty aligned tree"
                        )
                    offset = position_base[slot] - 2
                    if extra > 3:
                        k = extra - 3
                        while n < k:
                            if p + 1 < dlen:
                                w = d[p] | (d[p + 1] << 8)
                            elif p < dlen:
                                w = d[p]
                            else:
                                w = 0
                            p += 2
                            buf = ((buf << 16) | w) & 0xFFFFFFFFFFFF
                            n += 16
                        n -= k
                        offset += ((buf >> n) & ((1 << k) - 1)) << 3
                    while n < 16:
                        if p + 1 < dlen:
                            w = d[p] | (d[p + 1] << 8)
                        elif p < dlen:
                            w = d[p]
                        else:
                            w = 0
                        p += 2
                        buf = ((buf << 16) | w) & 0xFFFFFFFFFFFF
                        n += 16
                    entry = aligned_table[(buf >> (n - 16)) & 0xFFFF]
                    if entry is None:
                        raise ChmFormatError(
                            "invalid Huffman code in LZX stream"
                        )
                    offset += entry[0]
                    n -= entry[1]
                else:
                    # verbatim blocks, and aligned blocks with < 3
                    # extra bits (slots 3-7), read the bits directly
                    offset = position_base[slot] - 2
                    if extra:
                        while n < extra:
                            if p + 1 < dlen:
                                w = d[p] | (d[p + 1] << 8)
                            elif p < dlen:
                                w = d[p]
                            else:
                                w = 0
                            p += 2
                            buf = ((buf << 16) | w) & 0xFFFFFFFFFFFF
                            n += 16
                        n -= extra
                        offset += (buf >> n) & ((1 << extra) - 1)
                r2 = r1
                r1 = r0
                r0 = offset
            opos = len(out)
            if offset > opos:
                raise ChmFormatError("LZX match before window start")
            if match_len > togo:
                raise ChmFormatError("LZX match overruns block")
            start = opos - offset
            if offset >= match_len:
                out += out[start:start + match_len]  # non-overlapping
            else:
                for i in range(match_len):
                    out.append(out[start + i])
            togo -= match_len
        bits.pos, bits.buf, bits.n = p, buf, n

    if len(out) != out_len:
        raise ChmFormatError(
            f"LZX stream decoded {len(out)} bytes, expected {out_len}"
        )
    if intel_size:
        _e8_untranslate(out, intel_size)
    return bytes(out)


def _e8_untranslate(buf: bytearray, filesize: int) -> None:
    """Reverse the Intel E8 call-offset preprocessing, per 32 KiB
    frame; the last 10 bytes of a frame (6 of the whole stream per
    MS-PATCH, 10 in practice per the reference decoders) are left
    untouched. No-op streams (translation size 0) never reach here.
    Positions are absolute within THIS LZX stream (one reset span) —
    real CHM sections virtually always carry translation size 0, so
    the cross-span accumulation subtlety never arises; a nonzero-size
    multi-span section would need span-base offsets threaded in."""
    frame = 0x8000
    for base in range(0, len(buf), frame):
        end = min(base + frame, len(buf)) - 10
        i = base
        while i < end:
            if buf[i] != 0xE8:
                i += 1
                continue
            abs_off = int.from_bytes(buf[i + 1:i + 5], "little", signed=True)
            cur = i  # absolute position within the stream
            if -cur <= abs_off < filesize:
                rel = (
                    abs_off - cur if abs_off >= 0 else abs_off + filesize
                )
                buf[i + 1:i + 5] = (rel & 0xFFFFFFFF).to_bytes(4, "little")
            i += 5


# =====================================================================
# ITSS container
# =====================================================================


def _read_encint(data: bytes, pos: int) -> tuple[int, int]:
    """ENCINT: big-endian base-128 varint (high bit = continuation)."""
    val = 0
    for _ in range(9):
        if pos >= len(data):
            raise ChmFormatError("truncated ENCINT")
        b = data[pos]
        pos += 1
        val = (val << 7) | (b & 0x7F)
        if not b & 0x80:
            return val, pos
    raise ChmFormatError("ENCINT too long")


def parse_chm_directory(data: bytes) -> dict:
    """Parse the ITSF header + ITSP directory listing.

    Returns ``{"entries": {name: (section, offset, length)},
    "content_offset": int}`` where ``content_offset`` is the absolute
    file offset of content section 0's data."""
    if data[:4] != b"ITSF":
        raise ChmFormatError("not a CHM file (missing ITSF signature)")
    version, _hdr_len = struct.unpack_from("<II", data, 4)
    if version < 2:
        raise ChmFormatError(f"unsupported ITSF version {version}")
    # Two (offset, length) qword pairs follow the 0x38-byte fixed part:
    # header section 0 (file-size record) and section 1 (directory).
    sec0_off, _sec0_len, dir_off, dir_len = struct.unpack_from(
        "<QQQQ", data, 0x38
    )
    if version >= 3:
        (content_offset,) = struct.unpack_from("<Q", data, 0x58)
    else:
        content_offset = dir_off + dir_len

    if data[dir_off:dir_off + 4] != b"ITSP":
        raise ChmFormatError("missing ITSP directory signature")
    (
        _itsp_ver,
        itsp_hdr_len,
        _u1,
        chunk_size,
        _density,
        _depth,
        _root_idx,
        _first_pmgl,
        _last_pmgl,
        _u2,
        num_chunks,
    ) = struct.unpack_from("<IIIIIIiiiiI", data, dir_off + 4)
    if chunk_size == 0 or num_chunks > 1_000_000:
        raise ChmFormatError("implausible ITSP directory geometry")

    entries: dict[str, tuple[int, int, int]] = {}
    chunks_base = dir_off + itsp_hdr_len
    for ci in range(num_chunks):
        cbase = chunks_base + ci * chunk_size
        tag = data[cbase:cbase + 4]
        if tag != b"PMGL":
            continue  # PMGI index chunks only accelerate lookups
        (quickref_len,) = struct.unpack_from("<I", data, cbase + 4)
        pos = cbase + 0x14
        end = cbase + chunk_size - quickref_len
        while pos < end:
            name_len, pos = _read_encint(data, pos)
            if name_len == 0 or pos + name_len > end:
                break
            name = data[pos:pos + name_len].decode("utf-8", errors="replace")
            pos += name_len
            section, pos = _read_encint(data, pos)
            offset, pos = _read_encint(data, pos)
            length, pos = _read_encint(data, pos)
            entries[name] = (section, offset, length)
            if len(entries) > MAX_CHM_FILES * 4:
                raise ChmFormatError("CHM directory exceeds sanity cap")
    return {"entries": entries, "content_offset": content_offset}


def _section_names(data: bytes, entries: dict, content_offset: int) -> list:
    """Decode ::DataSpace/NameList (UTF-16LE words): content section
    index → section name ('Uncompressed', 'MSCompressed', ...)."""
    meta = entries.get("::DataSpace/NameList")
    if meta is None:
        return ["Uncompressed"]
    section, offset, length = meta
    if section != 0:
        raise ChmFormatError("NameList must live in section 0")
    raw = data[content_offset + offset: content_offset + offset + length]
    if len(raw) < 4:
        raise ChmFormatError("truncated NameList")
    (_total_words, count) = struct.unpack_from("<HH", raw, 0)
    names = []
    pos = 4
    for _ in range(count):
        (n_words,) = struct.unpack_from("<H", raw, pos)
        pos += 2
        names.append(raw[pos:pos + n_words * 2].decode("utf-16-le"))
        pos += n_words * 2 + 2  # skip the null terminator word
    return names


class _MSCompressedSection:
    """Lazy decompressor for one MSCompressed content section: parses
    LZXC ControlData + the reset table, then decompresses reset span
    by reset span on demand (each span is an independent LZX stream —
    that independence is exactly what the reset table exists for)."""

    def __init__(self, data: bytes, entries: dict, content_offset: int,
                 section_name: str):
        prefix = f"::DataSpace/Storage/{section_name}/"
        content = entries.get(prefix + "Content")
        control = entries.get(prefix + "ControlData")
        reset = None
        for name, meta in entries.items():
            if name.startswith(prefix + "Transform/") and name.endswith(
                "/InstanceData/ResetTable"
            ):
                reset = meta
        if content is None or control is None or reset is None:
            raise ChmFormatError(
                f"incomplete {section_name} section metadata"
            )
        if content[0] != 0 or control[0] != 0 or reset[0] != 0:
            raise ChmFormatError("compressed-section metafiles must be raw")

        self._comp = data[
            content_offset + content[1]:
            content_offset + content[1] + content[2]
        ]

        ctl = data[content_offset + control[1]:
                   content_offset + control[1] + control[2]]
        if len(ctl) < 0x18 or ctl[4:8] != b"LZXC":
            raise ChmFormatError("missing LZXC control data")
        version, reset_interval, window_size, windows_per_reset = (
            struct.unpack_from("<IIII", ctl, 8)
        )
        if version == 2:
            # version 2 stores both in units of 0x8000 bytes
            reset_interval *= 0x8000
            window_size *= 0x8000
        elif version != 1:
            raise ChmFormatError(f"unsupported LZXC version {version}")
        self._window_bits = max(15, window_size.bit_length() - 1)
        if (1 << self._window_bits) != window_size:
            raise ChmFormatError(
                f"LZX window {window_size:#x} is not a power of two"
            )
        if reset_interval == 0 or windows_per_reset == 0:
            raise ChmFormatError("bad LZXC reset geometry")
        # bytes of uncompressed data per independent LZX stream
        self._span = reset_interval * windows_per_reset

        rt = data[content_offset + reset[1]:
                  content_offset + reset[1] + reset[2]]
        if len(rt) < 0x28:
            raise ChmFormatError("truncated LZX reset table")
        (_rt_ver, n_entries, entry_size, header_size) = struct.unpack_from(
            "<IIII", rt, 0
        )
        (self._uncomp_len, _comp_len, block_len) = struct.unpack_from(
            "<QQQ", rt, 0x10
        )
        if entry_size != 8 or block_len == 0:
            raise ChmFormatError("unsupported reset table geometry")
        self._block_len = block_len
        self._block_offsets = [
            struct.unpack_from("<Q", rt, header_size + 8 * i)[0]
            for i in range(n_entries)
        ]
        if self._span % block_len:
            raise ChmFormatError("reset span not a multiple of block size")
        self._cache: dict[int, bytes] = {}

    def read(self, offset: int, length: int) -> bytes:
        """Read ``length`` uncompressed bytes at ``offset``, touching
        only the reset spans that cover the range."""
        if offset + length > self._uncomp_len:
            raise ChmFormatError("read past end of compressed section")
        blocks_per_span = self._span // self._block_len
        out = bytearray()
        span_i = offset // self._span
        while len(out) < length:
            if span_i not in self._cache:
                first_block = span_i * blocks_per_span
                if first_block >= len(self._block_offsets):
                    raise ChmFormatError("reset table too short for read")
                c_start = self._block_offsets[first_block]
                next_block = first_block + blocks_per_span
                c_end = (
                    self._block_offsets[next_block]
                    if next_block < len(self._block_offsets)
                    else len(self._comp)
                )
                span_out = min(
                    self._span, self._uncomp_len - span_i * self._span
                )
                self._cache[span_i] = lzx_decompress(
                    self._comp[c_start:c_end], span_out, self._window_bits
                )
            chunk = self._cache[span_i]
            lo = max(0, offset - span_i * self._span)
            if not out:
                take = chunk[lo:lo + length]
            else:
                take = chunk[:length - len(out)]
            out += take
            span_i += 1
        return bytes(out)


def extract_chm(
    data: bytes,
    max_files: int = MAX_CHM_FILES,
    max_bytes: int = MAX_CHM_BYTES,
    want=None,
) -> Iterator[tuple[str, bytes]]:
    """Yield ``(member_path, member_bytes)`` for every regular member
    of a CHM archive, in directory order, honoring the reference's
    10k-file / 100 MB extraction caps (reference reader.py:100-133 —
    the walk stops when either cap trips, and counts only the files it
    keeps; pass ``want`` (a predicate over the member path) to mirror
    that: filtered-out members consume no budget and are never
    decompressed). Metafiles (``::``-prefixed) and directory
    placeholders (``/``-suffixed, zero-length) are skipped."""
    parsed = parse_chm_directory(data)
    entries = parsed["entries"]
    content_offset = parsed["content_offset"]
    names = _section_names(data, entries, content_offset)

    sections: dict[int, object] = {}

    def _section(idx: int):
        if idx in sections:
            return sections[idx]
        if idx >= len(names):
            raise ChmFormatError(f"entry references unknown section {idx}")
        if names[idx] == "Uncompressed":
            sections[idx] = None
        else:
            sections[idx] = _MSCompressedSection(
                data, entries, content_offset, names[idx]
            )
        return sections[idx]

    n_files = 0
    n_bytes = 0
    for name, (section, offset, length) in entries.items():
        if name.startswith("::") or name.endswith("/"):
            continue
        if want is not None and not want(name.lstrip("/")):
            continue
        if n_files >= max_files:
            break
        n_bytes += length
        if n_bytes > max_bytes:
            break
        sec = _section(section)
        if sec is None:
            start = content_offset + offset
            if start + length > len(data):
                raise ChmFormatError(f"member {name!r} overruns archive")
            content = data[start:start + length]
        else:
            content = sec.read(offset, length)
        n_files += 1
        yield name.lstrip("/"), content
