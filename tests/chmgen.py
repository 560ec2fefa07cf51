"""Test-side CHM writer + LZX encoder.

Builds real CHM archives (ITSF v3 container, single-PMGL directory,
optional MSCompressed/LZXC content section) entirely from the public
format documents, INDEPENDENTLY of indexlab_spark.sources.chm — the
same cross-implementation discipline as the zlib/BPE nets: the reader
under test never sees these structures except through the bytes.

The LZX encoder here is deliberately simple but emits fully valid
streams of all three block types:

- ``lzx_compress_literals``: one verbatim block, every literal coded
  at 8 bits (a complete 256-symbol canonical tree), no matches.
- ``lzx_encode_tokens``: hand-driven token streams (literals +
  (length, offset) matches incl. repeated-offset slots and
  aligned-offset blocks) for targeted decoder vectors.
- ``lzx_store_uncompressed``: a type-3 (uncompressed) block.
"""

from __future__ import annotations

import struct

# ----------------------------------------------------------------- bits


class BitWriter:
    """MS-PATCH bit order: MSB-first within little-endian 16-bit words."""

    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.n = 0

    def write(self, val: int, nbits: int) -> None:
        while nbits:
            take = min(16 - self.n, nbits)
            self.cur = (self.cur << take) | (
                (val >> (nbits - take)) & ((1 << take) - 1)
            )
            self.n += take
            nbits -= take
            if self.n == 16:
                self.out += struct.pack("<H", self.cur)
                self.cur = 0
                self.n = 0

    def align16(self) -> None:
        if self.n:
            self.write(0, 16 - self.n)

    def pad16(self) -> None:
        """MS-PATCH uncompressed-block padding: 1-16 bits, so a stream
        already on a word boundary still carries a full 16-bit pad word
        (libmspack/chmlib skip 16 bits when bits_left == 0)."""
        self.write(0, 16 - self.n if self.n else 16)

    def bitpos(self) -> int:
        return len(self.out) * 8 + self.n

    def raw_bytes(self, b: bytes) -> None:
        assert self.n == 0, "raw bytes only at a word boundary"
        self.out += b

    def getvalue(self) -> bytes:
        self.align16()
        return bytes(self.out)


def canonical_codes(lengths):
    """Same canonical assignment the decoder documents: shorter codes
    first, ties by symbol index, MSB-first."""
    maxbits = max([l for l in lengths if l], default=0)
    bl_count = [0] * (maxbits + 1)
    for l in lengths:
        if l:
            bl_count[l] += 1
    next_code = [0] * (maxbits + 1)
    code = 0
    for b in range(1, maxbits + 1):
        code = (code + bl_count[b - 1]) << 1
        next_code[b] = code
    codes = {}
    for sym, l in enumerate(lengths):
        if l:
            codes[sym] = (next_code[l], l)
            next_code[l] += 1
    return codes


# ----------------------------------------------------------------- LZX

_EXTRA_BITS = [0 if i < 4 else min(17, (i >> 1) - 1) for i in range(51)]
_POSITION_BASE = [0] * 51
for _i in range(50):
    _POSITION_BASE[_i + 1] = _POSITION_BASE[_i] + (1 << _EXTRA_BITS[_i])


def _write_tree_deltas(w: BitWriter, old, new) -> None:
    """Delta-encode ``new`` lengths against ``old`` with a pretree that
    codes exactly the delta symbols we emit (plain deltas only — runs
    are a size optimization the decoder must support but an encoder
    may skip)."""
    deltas = [(o - n) % 17 for o, n in zip(old, new)]
    used = sorted(set(deltas))
    # give every used delta symbol the same code length (complete tree
    # not required; the decoder maps only emitted prefixes)
    nbits = max(1, (len(used) - 1).bit_length())
    pre_lens = [0] * 20
    for s in used:
        pre_lens[s] = nbits
    pre_codes = canonical_codes(pre_lens)
    for s in pre_lens:
        w.write(s, 4)
    for d in deltas:
        w.write(*pre_codes[d])


def lzx_encode_tokens(
    tokens,
    out_len: int,
    *,
    aligned: bool = False,
    window_bits: int = 16,
    intel_size: int = 0,
):
    """Encode one LZX stream holding a single verbatim (or aligned)
    block. ``tokens`` is a list of ints (literal bytes) and tuples
    ``(length, offset)`` where offset is a real match distance or one
    of the strings 'R0'/'R1'/'R2'. Trees: literals used get 9 bits,
    match elements used get 9 bits, secondary lengths 8 bits — all
    emitted as plain deltas."""
    if window_bits == 20:
        posn_slots = 42
    elif window_bits == 21:
        posn_slots = 50
    else:
        posn_slots = window_bits << 1
    main_syms = 256 + (posn_slots << 3)

    # --- plan symbols
    r = [1, 1, 1]
    plan = []  # (main_sym, [(value, nbits) extras], length_sym or None)
    used_main, used_len = set(), set()
    for tok in tokens:
        if isinstance(tok, int):
            plan.append((tok, [], None))
            used_main.add(tok)
            continue
        length, offset = tok
        if offset == "R0":
            slot, extras, real = 0, [], r[0]
        elif offset == "R1":
            slot, extras, real = 1, [], r[1]
            r[0], r[1] = r[1], r[0]
        elif offset == "R2":
            slot, extras, real = 2, [], r[2]
            r[0], r[2] = r[2], r[0]
        else:
            # formatted offset = real + 2; slots 0-2 are the repeat
            # slots, so formatted >= 3 always lands in slot >= 3 with
            # base[slot] <= formatted < base[slot+1]; the decoder
            # reverses via real = base[slot] - 2 + residue.
            real = offset
            formatted = offset + 2
            slot = 3
            while slot + 1 < len(_POSITION_BASE) and (
                _POSITION_BASE[slot + 1] <= formatted
            ):
                slot += 1
            extra = _EXTRA_BITS[slot]
            residue = formatted - _POSITION_BASE[slot]
            assert 0 <= residue < max(1, 1 << extra)
            if aligned and extra >= 3:
                extras = [("v", residue >> 3, extra - 3), ("a", residue & 7)]
            else:
                extras = [("v", residue, extra)]
            r[2], r[1], r[0] = r[1], r[0], real
        len_header = length - 2
        if len_header >= 7:
            len_sym = len_header - 7
            assert 0 <= len_sym < 249
            used_len.add(len_sym)
            main_sym = 256 + (slot << 3) + 7
        else:
            len_sym = None
            main_sym = 256 + (slot << 3) + len_header
        used_main.add(main_sym)
        plan.append((main_sym, extras, len_sym))

    main_lens = [9 if s in used_main else 0 for s in range(main_syms)]
    len_lens = [8 if s in used_len else 0 for s in range(249)]
    main_codes = canonical_codes(main_lens)
    len_codes = canonical_codes(len_lens)
    aligned_lens = [3] * 8
    aligned_codes = canonical_codes(aligned_lens)

    w = BitWriter()
    # stream header: E8 flag (+ translation size)
    if intel_size:
        w.write(1, 1)
        w.write(intel_size >> 16, 16)
        w.write(intel_size & 0xFFFF, 16)
    else:
        w.write(0, 1)
    w.write(2 if aligned else 1, 3)  # block type
    w.write(out_len, 24)
    if aligned:
        for l in aligned_lens:
            w.write(l, 3)
    _write_tree_deltas(w, [0] * 256, main_lens[:256])
    _write_tree_deltas(w, [0] * (main_syms - 256), main_lens[256:])
    _write_tree_deltas(w, [0] * 249, len_lens)
    for main_sym, extras, len_sym in plan:
        w.write(*main_codes[main_sym])
        if len_sym is not None:
            w.write(*len_codes[len_sym])
        for ex in extras:
            if ex[0] == "v":
                if ex[2]:
                    w.write(ex[1], ex[2])
            else:
                w.write(*aligned_codes[ex[1]])
    return w.getvalue()


def lzx_compress_literals(data: bytes, window_bits: int = 16) -> bytes:
    """All-literals verbatim stream: complete 8-bit literal tree (code
    == byte value), empty match half, empty length tree."""
    if window_bits == 20:
        posn_slots = 42
    elif window_bits == 21:
        posn_slots = 50
    else:
        posn_slots = window_bits << 1
    main_syms = 256 + (posn_slots << 3)
    w = BitWriter()
    w.write(0, 1)  # no E8 translation
    w.write(1, 3)  # verbatim
    w.write(len(data), 24)
    _write_tree_deltas(w, [0] * 256, [8] * 256)
    _write_tree_deltas(w, [0] * (main_syms - 256), [0] * (main_syms - 256))
    _write_tree_deltas(w, [0] * 249, [0] * 249)
    for b in data:
        w.write(b, 8)  # canonical: all len 8 => code == symbol
    return w.getvalue()


def lzx_store_uncompressed(data: bytes, r=(1, 1, 1)) -> bytes:
    """Single type-3 (uncompressed) block stream."""
    w = BitWriter()
    w.write(0, 1)
    w.write(3, 3)
    w.write(len(data), 24)
    w.pad16()
    w.raw_bytes(struct.pack("<III", *r))
    w.raw_bytes(data)
    if len(data) & 1:
        w.raw_bytes(b"\x00")
    return w.getvalue()


# ------------------------------------------------------------ container


def _encint(val: int) -> bytes:
    groups = []
    while True:
        groups.append(val & 0x7F)
        val >>= 7
        if not val:
            break
    out = bytearray()
    for i, g in enumerate(reversed(groups)):
        out.append(g | (0x80 if i < len(groups) - 1 else 0))
    return bytes(out)


def build_chm(members: dict, compress: bool = False) -> bytes:
    """Assemble a CHM archive. ``members`` maps paths (no leading
    slash) to bytes. With ``compress=True`` all member content goes
    into an MSCompressed/LZXC section (window 64 KiB, one LZX reset
    span per 0x8000-byte block, each span an all-literals stream);
    otherwise everything is stored in section 0."""
    entries = []  # (name, section, offset, length)

    sec0 = bytearray()

    if compress:
        # uncompressed stream of section 1 = member concat
        stream = bytearray()
        for path, content in sorted(members.items()):
            entries.append(("/" + path, 1, len(stream), len(content)))
            stream += content
        block_len = 0x8000
        n_blocks = max(1, -(-len(stream) // block_len))
        comp = bytearray()
        block_offsets = []
        for bi in range(n_blocks):
            block_offsets.append(len(comp))
            comp += lzx_compress_literals(
                bytes(stream[bi * block_len:(bi + 1) * block_len])
            )

        # ::DataSpace/NameList (UTF-16LE)
        def _u16(s):
            return s.encode("utf-16-le")

        namelist = bytearray()
        body = bytearray()
        for nm in ("Uncompressed", "MSCompressed"):
            body += struct.pack("<H", len(nm)) + _u16(nm) + b"\x00\x00"
        namelist += struct.pack("<HH", (4 + len(body)) // 2, 2) + body

        control = struct.pack(
            "<I4sIIIII", 6, b"LZXC",
            2,    # version 2: units of 0x8000
            1,    # reset interval = 0x8000 bytes
            2,    # window = 0x10000
            1,    # windows per reset
            0,
        )
        reset = bytearray(
            struct.pack(
                "<IIII", 2, n_blocks, 8, 0x28
            )
            + struct.pack("<QQQ", len(stream), len(comp), block_len)
        )
        for off in block_offsets:
            reset += struct.pack("<Q", off)

        metas = [
            ("::DataSpace/NameList", bytes(namelist)),
            ("::DataSpace/Storage/MSCompressed/Content", bytes(comp)),
            ("::DataSpace/Storage/MSCompressed/ControlData", control),
            (
                "::DataSpace/Storage/MSCompressed/Transform/"
                "{7FC28940-9D31-11D0-9B27-00A0C91E9C7C}/InstanceData/"
                "ResetTable",
                bytes(reset),
            ),
        ]
        for nm, content in metas:
            entries.append((nm, 0, len(sec0), len(content)))
            sec0 += content
    else:
        for path, content in sorted(members.items()):
            entries.append(("/" + path, 0, len(sec0), len(content)))
            sec0 += content

    # ---- directory: as many PMGL chunks as the entries need, plus a
    # PMGI index chunk when there is more than one PMGL (real CHMs do
    # this; the reader must walk every PMGL and skip the PMGI)
    chunk_size = 0x1000
    quickref_len = 2
    max_body = chunk_size - 0x14 - quickref_len
    groups: list[list[tuple[str, bytes]]] = [[]]
    cur_len = 0
    for name, section, offset, length in sorted(entries):
        ent = (
            _encint(len(name.encode()))
            + name.encode()
            + _encint(section)
            + _encint(offset)
            + _encint(length)
        )
        if cur_len + len(ent) > max_body and groups[-1]:
            groups.append([])
            cur_len = 0
        groups[-1].append((name, ent))
        cur_len += len(ent)

    n_pmgl = len(groups)
    chunks = bytearray()
    for gi, group in enumerate(groups):
        body = b"".join(ent for _n, ent in group)
        pmgl = bytearray()
        pmgl += b"PMGL"
        pmgl += struct.pack(
            "<IIii",
            quickref_len,
            0,
            gi - 1 if gi else -1,
            gi + 1 if gi + 1 < n_pmgl else -1,
        )
        pmgl += body
        pmgl += b"\x00" * (chunk_size - len(pmgl) - 2)
        pmgl += struct.pack("<H", len(group))
        chunks += pmgl

    root_index = -1
    num_chunks = n_pmgl
    depth = 1
    if n_pmgl > 1:
        # PMGI: (first entry name of each PMGL, ENCINT chunk number)
        ibody = bytearray()
        for gi, group in enumerate(groups):
            nm = group[0][0].encode()
            ibody += _encint(len(nm)) + nm + _encint(gi)
        assert 0x0C + len(ibody) + quickref_len <= chunk_size
        pmgi = bytearray()
        pmgi += b"PMGI" + struct.pack("<I", quickref_len)
        pmgi += ibody
        pmgi += b"\x00" * (chunk_size - len(pmgi) - 2)
        pmgi += struct.pack("<H", n_pmgl)
        chunks += pmgi
        root_index = n_pmgl
        num_chunks = n_pmgl + 1
        depth = 2

    itsp = bytearray()
    itsp += b"ITSP"
    itsp += struct.pack(
        "<IIIIIIiiiiI",
        1, 0x54, 0x0A, chunk_size, 2, depth,
        root_index, 0, n_pmgl - 1, -1, num_chunks,
    )
    itsp += struct.pack("<I", 0x0409)
    itsp += b"\x00" * 16  # guid
    itsp += struct.pack("<Iiii", 0x54, -1, -1, -1)
    assert len(itsp) == 0x54
    directory = bytes(itsp) + bytes(chunks)

    # ---- ITSF v3 header
    hdr_len = 0x60
    hs0_off = hdr_len
    hs0_len = 0x18
    dir_off = hs0_off + hs0_len
    content_offset = dir_off + len(directory)
    total = content_offset + len(sec0)

    itsf = bytearray()
    itsf += b"ITSF"
    itsf += struct.pack("<III", 3, hdr_len, 1)
    itsf += struct.pack("<II", 0, 0x0409)  # timestamp, language
    itsf += b"\x00" * 32  # two guids
    itsf += struct.pack("<QQQQ", hs0_off, hs0_len, dir_off, len(directory))
    itsf += struct.pack("<Q", content_offset)
    assert len(itsf) == hdr_len

    hs0 = struct.pack("<IIQII", 0x01FE, 0, total, 0, 0)
    assert len(hs0) == hs0_len

    return bytes(itsf) + hs0 + directory + bytes(sec0)
