"""Stdlib legacy-Excel (.xls, BIFF8) reader — closes the S2 gap the
container's missing xlrd left open (reference app/ingest/reader.py:153-154
routes .xls through pandas.read_excel, which needs xlrd).

Two public-format layers, both parsed with ``struct`` alone:

1. **OLE2 / Compound File Binary** (MS-CFB, public spec): 512-byte
   header with a DIFAT, a FAT chain of 512-byte sectors, a directory
   stream of 128-byte entries, and a mini-FAT/mini-stream for streams
   under 4096 bytes. We locate the ``Workbook`` (or ``Book``) stream.
2. **BIFF8** (MS-XLS, public spec): a record stream. Globals substream
   carries the SST (shared strings, with CONTINUE-record splits) and
   BOUNDSHEET offsets; the first worksheet substream carries the cell
   records — NUMBER, RK, MULRK, LABELSST, LABEL, BOOLERR, BLANK.

``parse_xls(path) -> (header, rows)`` matches the stdlib xlsx parser's
contract (first sheet, first row = header). ``write_xls`` emits a
minimal-but-valid BIFF8 workbook so tests round-trip real .xls bytes
without any third-party engine; deliberately unsupported shapes
(encrypted workbooks, BIFF5) raise ValueError for the caller's gate.
"""

from __future__ import annotations

import struct

OLE_SIG = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE


# ------------------------------------------------------------------ OLE2/CFB
def _read_chain(data: bytes, fat: list[int], start: int, sec_size: int,
                offset: int) -> bytes:
    """Sector ``i`` begins at ``(i + 1) * sec_size`` per MS-CFB (the
    header occupies the whole first sector) — callers pass
    ``offset=sec_size``, which is 512 for v3 files AND correct for v4's
    4096-byte sectors (the old ``512 + i*sec_size`` form was v3-only)."""
    out, sect, seen = [], start, set()
    while sect not in (ENDOFCHAIN, FREESECT):
        if sect in seen:
            raise ValueError("cyclic FAT chain")
        seen.add(sect)
        pos = offset + sect * sec_size
        out.append(data[pos:pos + sec_size])
        if sect >= len(fat):
            raise ValueError("FAT chain out of range")
        sect = fat[sect]
    return b"".join(out)


def _ole_open_stream(data: bytes, *names: str) -> bytes:
    """Extract the first directory stream whose name matches ``names``."""
    if data[:8] != OLE_SIG:
        raise ValueError("not an OLE2 compound file")
    sec_shift, mini_shift = struct.unpack("<HH", data[30:34])
    sec_size, mini_size = 1 << sec_shift, 1 << mini_shift
    (n_fat,) = struct.unpack("<I", data[44:48])
    (dir_start,) = struct.unpack("<I", data[48:52])
    (mini_cutoff,) = struct.unpack("<I", data[56:60])
    (minifat_start,) = struct.unpack("<I", data[60:64])
    (n_minifat,) = struct.unpack("<I", data[64:68])
    (difat_start,) = struct.unpack("<I", data[68:72])
    (n_difat,) = struct.unpack("<I", data[72:76])

    difat = list(struct.unpack("<109I", data[76:512]))
    sect = difat_start
    for _ in range(n_difat):
        if sect in (ENDOFCHAIN, FREESECT):
            break
        pos = (sect + 1) * sec_size
        vals = struct.unpack(f"<{sec_size // 4}I", data[pos:pos + sec_size])
        difat.extend(vals[:-1])
        sect = vals[-1]
    fat: list[int] = []
    for fs in difat:
        if fs in (ENDOFCHAIN, FREESECT):
            continue
        pos = (fs + 1) * sec_size
        fat.extend(struct.unpack(f"<{sec_size // 4}I", data[pos:pos + sec_size]))

    dir_data = _read_chain(data, fat, dir_start, sec_size, sec_size)
    root_start = root_size = None
    target = None
    wanted = {n.lower() for n in names}
    for off in range(0, len(dir_data) - 127, 128):
        ent = dir_data[off:off + 128]
        (name_len,) = struct.unpack("<H", ent[64:66])
        if name_len < 2:
            continue
        name = ent[:name_len - 2].decode("utf-16-le", errors="ignore")
        etype = ent[66]
        (start,) = struct.unpack("<I", ent[116:120])
        (size,) = struct.unpack("<I", ent[120:124])
        if etype == 5:  # root: holds the mini stream
            root_start, root_size = start, size
        elif etype == 2 and name.lower() in wanted and target is None:
            target = (start, size)
    if target is None:
        raise ValueError(f"OLE2 stream {names} not found")
    start, size = target
    if size >= mini_cutoff:
        return _read_chain(data, fat, start, sec_size, sec_size)[:size]
    # mini-stream: FAT-of-minisectors over the root entry's stream
    if root_start is None:
        raise ValueError("mini stream without root entry")
    mini_fat: list[int] = []
    sect = minifat_start
    for _ in range(n_minifat):
        if sect in (ENDOFCHAIN, FREESECT):
            break
        pos = (sect + 1) * sec_size
        mini_fat.extend(
            struct.unpack(f"<{sec_size // 4}I", data[pos:pos + sec_size])
        )
        sect = fat[sect]
    mini_stream = _read_chain(data, fat, root_start, sec_size, sec_size)[:root_size]
    out, sect, seen = [], start, set()
    while sect not in (ENDOFCHAIN, FREESECT):
        if sect in seen:
            raise ValueError("cyclic mini-FAT chain")
        seen.add(sect)
        out.append(mini_stream[sect * mini_size:(sect + 1) * mini_size])
        sect = mini_fat[sect]
    return b"".join(out)[:size]


# -------------------------------------------------------------------- BIFF8
def _records(stream: bytes, pos: int = 0):
    while pos + 4 <= len(stream):
        rt, ln = struct.unpack("<HH", stream[pos:pos + 4])
        yield rt, stream[pos + 4:pos + 4 + ln], pos
        pos += 4 + ln


def _read_unicode_string(buf: bytes, pos: int, cch: int,
                         conts: list[bytes], cont_i: list[int]):
    """Read a BIFF8 XLUnicodeString's character data, spilling into
    CONTINUE records (each continuation restarts with its own grbit
    byte). Returns (text, pos) with pos relative to the CURRENT buffer
    (callers track buffer switches via cont_i)."""
    grbit = buf[pos]
    pos += 1
    rich = grbit & 0x08
    ext = grbit & 0x04
    n_rich = cb_ext = 0
    if rich:
        (n_rich,) = struct.unpack("<H", buf[pos:pos + 2])
        pos += 2
    if ext:
        (cb_ext,) = struct.unpack("<I", buf[pos:pos + 4])
        pos += 4
    chars = []
    remaining = cch
    wide = bool(grbit & 0x01)
    while remaining:
        avail = (len(buf) - pos) // (2 if wide else 1)
        take = min(remaining, avail)
        if take:
            raw = buf[pos:pos + take * (2 if wide else 1)]
            chars.append(
                raw.decode("utf-16-le") if wide
                else raw.decode("latin-1")
            )
            pos += take * (2 if wide else 1)
            remaining -= take
        if remaining:
            if cont_i[0] >= len(conts):
                raise ValueError("SST continuation truncated")
            buf = conts[cont_i[0]]
            cont_i[0] += 1
            wide = bool(buf[0] & 0x01)  # continuation's own grbit
            pos = 1
    skip = n_rich * 4 + cb_ext
    while skip:
        avail = len(buf) - pos
        take = min(skip, avail)
        pos += take
        skip -= take
        if skip:
            if cont_i[0] >= len(conts):
                raise ValueError("SST rich/ext data truncated")
            buf = conts[cont_i[0]]
            cont_i[0] += 1
            pos = 0
    return "".join(chars), buf, pos


def _parse_sst(body: bytes, conts: list[bytes]) -> list[str]:
    (_total, n_unique) = struct.unpack("<II", body[:8])
    out: list[str] = []
    buf, pos, cont_i = body, 8, [0]
    for _ in range(n_unique):
        if pos + 3 > len(buf):
            if cont_i[0] >= len(conts):
                raise ValueError("SST truncated")
            buf = conts[cont_i[0]]
            cont_i[0] += 1
            pos = 0
        (cch,) = struct.unpack("<H", buf[pos:pos + 2])
        pos += 2
        text, buf, pos = _read_unicode_string(buf, pos, cch, conts, cont_i)
        out.append(text)
    return out


def _decode_rk(rk: int) -> float | int:
    f_x100 = rk & 0x01
    f_int = rk & 0x02
    if f_int:
        v = rk >> 2
        if v & 0x20000000:  # sign-extend 30-bit
            v -= 0x40000000
        val: float | int = v
    else:
        (val,) = struct.unpack("<d", struct.pack("<Q", (rk & ~0x3) << 32))
    if f_x100:
        val = val / 100
        if isinstance(val, float) and val.is_integer():
            val = int(val)
    return val


def parse_xls(path: str) -> tuple[list[str], list[list]]:
    """BIFF8 .xls -> (header, rows), first sheet, first row = header —
    the same contract as the stdlib xlsx parser."""
    data = open(path, "rb").read()
    wb = _ole_open_stream(data, "Workbook", "Book")

    # globals substream: SST + first BOUNDSHEET offset
    sst: list[str] = []
    first_sheet_pos = None
    recs = list(_records(wb))
    for idx, (rt, body, pos) in enumerate(recs):
        if rt == 0x0809 and pos > 0:
            break  # next substream begins; globals done
        if rt == 0x0085 and first_sheet_pos is None:  # BOUNDSHEET
            (first_sheet_pos,) = struct.unpack("<I", body[:4])
        elif rt == 0x00FC:  # SST (+ its CONTINUEs)
            conts = []
            for rt2, body2, _ in recs[idx + 1:]:
                if rt2 != 0x003C:
                    break
                conts.append(body2)
            sst = _parse_sst(body, conts)
        elif rt == 0x002F:  # FILEPASS: encrypted
            raise ValueError("encrypted .xls unsupported")
    if first_sheet_pos is None:
        raise ValueError("no BOUNDSHEET record (not a BIFF8 workbook?)")

    cells: dict[tuple[int, int], object] = {}
    for rt, body, _ in _records(wb, first_sheet_pos):
        if rt == 0x000A:  # EOF: end of this sheet substream
            break
        if rt == 0x0203:  # NUMBER
            rw, col, _ixfe = struct.unpack("<HHH", body[:6])
            (num,) = struct.unpack("<d", body[6:14])
            cells[(rw, col)] = int(num) if num.is_integer() else num
        elif rt == 0x027E:  # RK
            rw, col, _ixfe, rk = struct.unpack("<HHHI", body[:10])
            cells[(rw, col)] = _decode_rk(rk)
        elif rt == 0x00BD:  # MULRK
            rw, col_first = struct.unpack("<HH", body[:4])
            n = (len(body) - 6) // 6
            for i in range(n):
                (rk,) = struct.unpack("<I", body[4 + i * 6 + 2:4 + i * 6 + 6])
                cells[(rw, col_first + i)] = _decode_rk(rk)
        elif rt == 0x00FD:  # LABELSST
            rw, col, _ixfe, isst = struct.unpack("<HHHI", body[:10])
            cells[(rw, col)] = sst[isst] if isst < len(sst) else ""
        elif rt == 0x0204:  # LABEL (inline BIFF8 unicode string)
            rw, col, _ixfe, cch = struct.unpack("<HHHH", body[:8])
            text, _, _ = _read_unicode_string(body, 8, cch, [], [0])
            cells[(rw, col)] = text
        elif rt == 0x0205:  # BOOLERR
            rw, col, _ixfe, val, is_err = struct.unpack("<HHHBB", body[:8])
            cells[(rw, col)] = None if is_err else bool(val)
        # BLANK/ROW/other records carry no values

    if not cells:
        raise ValueError("first sheet has no cells")
    n_rows = max(r for r, _ in cells) + 1
    n_cols = max(c for _, c in cells) + 1
    grid = [[cells.get((r, c)) for c in range(n_cols)] for r in range(n_rows)]
    header = [str(h) if h is not None else f"col{i}"
              for i, h in enumerate(grid[0])]
    return header, grid[1:]


# ------------------------------------------------- minimal writer (tests)
def _rec(rt: int, body: bytes) -> bytes:
    return struct.pack("<HH", rt, len(body)) + body


def _biff_workbook_stream(header: list[str], rows: list[list]) -> bytes:
    """Globals substream (BOF, SST, BOUNDSHEET, EOF) + one worksheet
    substream with NUMBER/LABELSST/BOOLERR cells."""
    grid = [list(header)] + [list(r) for r in rows]
    strings: list[str] = []
    index: dict[str, int] = {}
    n_str_cells = 0
    for row in grid:
        for v in row:
            if isinstance(v, str):
                n_str_cells += 1
                if v not in index:
                    index[v] = len(strings)
                    strings.append(v)
    sst_body = struct.pack("<II", n_str_cells, len(strings))
    for s in strings:
        enc = s.encode("utf-16-le")
        sst_body += struct.pack("<HB", len(s), 0x01) + enc
    if len(sst_body) > 8000:
        raise ValueError("test writer keeps the SST in one record")

    sheet = _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))
    for r, row in enumerate(grid):
        for c, v in enumerate(row):
            if v is None:
                continue
            if isinstance(v, bool):
                sheet += _rec(
                    0x0205, struct.pack("<HHHBB", r, c, 15, int(v), 0)
                )
            elif isinstance(v, (int, float)):
                sheet += _rec(
                    0x0203, struct.pack("<HHH", r, c, 15)
                    + struct.pack("<d", float(v))
                )
            else:
                sheet += _rec(
                    0x00FD, struct.pack("<HHHI", r, c, 15, index[str(v)])
                )
    sheet += _rec(0x000A, b"")

    name = "Sheet1".encode("latin-1")
    bs_body_len = 4 + 2 + 1 + 1 + len(name)
    globals_len = (
        len(_rec(0x0809, b"\x00" * 16))
        + len(_rec(0x0085, b"\x00" * bs_body_len))
        + len(_rec(0x00FC, sst_body))
        + len(_rec(0x000A, b""))
    )
    bs = struct.pack("<IHBB", globals_len, 0, len(name), 0) + name
    out = _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
    out += _rec(0x0085, bs)
    out += _rec(0x00FC, sst_body)
    out += _rec(0x000A, b"")
    assert len(out) == globals_len
    return out + sheet


def write_xls(path: str, header: list[str], rows: list[list]) -> None:
    """Write a spec-shaped OLE2+BIFF8 .xls. Streams >= 4096 bytes live
    in the main FAT; smaller workbooks go through the root entry's
    mini-stream + mini-FAT exactly as real writers emit them — so small
    test files exercise the reader's mini path and large ones the FAT
    path."""
    write_ole_workbook(path, _biff_workbook_stream(header, rows))


def write_ole_workbook(path: str, wb: bytes) -> None:
    """Wrap an arbitrary BIFF stream in the OLE2 container (exposed so
    tests can exercise reader record branches — RK/MULRK/LABEL — the
    minimal writer never emits)."""
    sec, mini = 512, 64

    def dirent(name: str, etype: int, start: int, size: int) -> bytes:
        n = name.encode("utf-16-le") + b"\x00\x00"
        ent = n + b"\x00" * (64 - len(n))
        ent += struct.pack("<HBB", len(n), etype, 1)
        ent += struct.pack("<III", FREESECT, FREESECT, FREESECT)
        ent += b"\x00" * 16 + struct.pack("<I", 0)  # clsid + state
        ent += b"\x00" * 16  # times
        ent += struct.pack("<II", start, size)
        ent += b"\x00" * 4
        assert len(ent) == 128
        return ent

    fat = [FREESECT] * (sec // 4)
    fat[0] = 0xFFFFFFFD  # FAT sector marker
    fat[1] = ENDOFCHAIN  # directory chain
    if len(wb) >= 4096:
        # layout: 0 = FAT, 1 = directory, 2.. = workbook stream
        wb_padded = wb + b"\x00" * (-len(wb) % sec)
        n_wb = len(wb_padded) // sec
        for i in range(n_wb):
            fat[2 + i] = 2 + i + 1 if i < n_wb - 1 else ENDOFCHAIN
        directory = (
            dirent("Root Entry", 5, ENDOFCHAIN, 0)
            + dirent("Workbook", 2, 2, len(wb))
            + b"\x00" * 256
        )
        minifat_start, n_minifat = ENDOFCHAIN, 0
        tail = wb_padded
    else:
        # layout: 0 = FAT, 1 = directory, 2 = mini-FAT, 3.. = ministream
        ms = wb + b"\x00" * (-len(wb) % mini)
        n_minisec = len(ms) // mini
        ms_padded = ms + b"\x00" * (-len(ms) % sec)
        n_ms_sec = len(ms_padded) // sec
        fat[2] = ENDOFCHAIN  # mini-FAT sector chain (one sector)
        for i in range(n_ms_sec):
            fat[3 + i] = 3 + i + 1 if i < n_ms_sec - 1 else ENDOFCHAIN
        mf = [FREESECT] * (sec // 4)
        for i in range(n_minisec):
            mf[i] = i + 1 if i < n_minisec - 1 else ENDOFCHAIN
        minifat_sector = struct.pack(f"<{sec // 4}I", *mf)
        directory = (
            dirent("Root Entry", 5, 3, len(ms))  # ministream holder
            + dirent("Workbook", 2, 0, len(wb))  # start = minisector 0
            + b"\x00" * 256
        )
        minifat_start, n_minifat = 2, 1
        tail = minifat_sector + ms_padded

    fat_sector = struct.pack(f"<{sec // 4}I", *fat)
    header_bytes = OLE_SIG + b"\x00" * 16
    header_bytes += struct.pack("<HHHHH", 0x003E, 0x0003, 0xFFFE, 9, 6)
    header_bytes += b"\x00" * 6  # reserved (bytes 34-39)
    header_bytes += struct.pack("<II", 0, 1)  # n dir sectors (v3: 0), n FAT
    header_bytes += struct.pack("<I", 1)  # directory start sector
    header_bytes += struct.pack("<I", 0)  # transaction
    header_bytes += struct.pack("<I", 4096)  # mini cutoff
    header_bytes += struct.pack("<II", minifat_start, n_minifat)
    header_bytes += struct.pack("<II", ENDOFCHAIN, 0)  # difat start/count
    difat = [0] + [FREESECT] * 108
    header_bytes += struct.pack("<109I", *difat)
    assert len(header_bytes) == 512
    with open(path, "wb") as f:
        f.write(header_bytes + fat_sector + directory + tail)
