"""S5 — CHM reader tests (sources/chm.py + reader.read_chm).

Attestation model: the reference shells out to hh.exe/7-Zip
(reference reader.py:44-83), which don't exist here, and no real .chm
fixture ships in the container — so, like the zlib/BPE nets, the
suite BUILDS its own archives with an INDEPENDENT writer + LZX
encoder (tests/chmgen.py, written from the same public format
documents but sharing no code with the reader) and round-trips them.
Every LZX block type, offset-slot class and container layout the
decoder implements is exercised by at least one vector."""

import os
import struct
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import chmgen  # noqa: E402
from indexlab_spark.sources.chm import (  # noqa: E402
    ChmFormatError,
    extract_chm,
    lzx_decompress,
    parse_chm_directory,
)


# ---------------------------------------------------------------- LZX unit


class TestLZX:
    def test_all_literals_verbatim(self):
        data = bytes(range(256)) * 5 + b"trailing odd tail"
        comp = chmgen.lzx_compress_literals(data)
        assert lzx_decompress(comp, len(data), 16) == data

    def test_uncompressed_block(self):
        data = b"seven b"  # odd length exercises the pad byte
        comp = chmgen.lzx_store_uncompressed(data)
        assert lzx_decompress(comp, len(data), 16) == data

    def test_uncompressed_block_sets_repeat_offsets(self):
        # R0 is carried INTO the next block: store 'ab' with R0=2,
        # then a verbatim block whose first match uses R0.
        part1 = chmgen.lzx_store_uncompressed(b"ab", r=(2, 1, 1))
        part2 = chmgen.lzx_encode_tokens([(4, "R0")], 4)
        # both parts are word-aligned so concatenation is one stream
        # — but each encoder output starts with its own E8 header, so
        # splice at the block level instead: re-encode as one stream.
        w = chmgen.BitWriter()
        w.write(0, 1)           # E8 header
        w.write(3, 3)           # uncompressed block
        w.write(2, 24)
        w.pad16()
        w.raw_bytes(struct.pack("<III", 2, 1, 1))
        w.raw_bytes(b"ab")
        # verbatim block: match (len 4, R0=2) -> 'ababab'[2:]
        used_main = 256 + (0 << 3) + (4 - 2)
        w.write(1, 3)
        w.write(4, 24)
        chmgen._write_tree_deltas(
            w, [0] * 256, [0] * 256
        )
        rest = [0] * ((16 << 1) << 3)
        rest[used_main - 256] = 1
        chmgen._write_tree_deltas(w, [0] * len(rest), rest)
        chmgen._write_tree_deltas(w, [0] * 249, [0] * 249)
        w.write(0, 1)  # the single main symbol's canonical 1-bit code
        out = lzx_decompress(w.getvalue(), 6, 16)
        assert out == b"ababab"
        assert part1 and part2  # silence unused (documented splice note)

    def test_uncompressed_pad_when_word_aligned(self):
        # MS-PATCH pads 1-16 bits (NOT 0-15) before an uncompressed
        # block's R0/R1/R2: a header that already ends on a 16-bit
        # boundary still carries a FULL pad word (libmspack/chmlib skip
        # 16 bits when bits_left == 0).  Hand-build a verbatim block
        # whose bit length puts the next uncompressed header exactly on
        # a word boundary and check the decoder skips the pad word
        # rather than reading it as R0 data.
        data2 = b"0123456789ABCDEF"
        main_syms = 256 + ((16 << 1) << 3)
        main_lens = [0] * 256
        main_lens[ord("A")] = 8   # 8-bit code
        main_lens[ord("B")] = 9   # 9-bit code: odd width tunes parity
        codes = chmgen.canonical_codes(main_lens)
        found = None
        for n_b in range(16):
            for n_a in range(1, 3):
                data1 = b"A" * n_a + b"B" * n_b
                w = chmgen.BitWriter()
                w.write(0, 1)                 # no E8 translation
                w.write(1, 3)                 # verbatim
                w.write(len(data1), 24)
                chmgen._write_tree_deltas(w, [0] * 256, main_lens)
                chmgen._write_tree_deltas(
                    w, [0] * (main_syms - 256), [0] * (main_syms - 256)
                )
                chmgen._write_tree_deltas(w, [0] * 249, [0] * 249)
                for b in data1:
                    w.write(*codes[b])
                if (w.bitpos() + 27) % 16 == 0:
                    found = (data1, w)
                    break
            if found:
                break
        assert found, "no literal mix lands the header word-aligned"
        data1, w = found
        w.write(3, 3)                         # uncompressed block
        w.write(len(data2), 24)
        assert w.bitpos() % 16 == 0           # the interesting case
        w.pad16()                             # full 16-bit pad word
        w.raw_bytes(struct.pack("<III", 1, 1, 1))
        w.raw_bytes(data2)
        total = data1 + data2
        assert lzx_decompress(w.getvalue(), len(total), 16) == total

    @pytest.mark.parametrize("aligned", [False, True])
    def test_matches_all_slot_classes(self, aligned):
        text = bytes((i * 37 + 11) % 251 for i in range(5000))
        toks = list(text) + [
            (257, 4096),   # max match length (secondary length tree)
            (20, "R0"),
            (5, 700),
            (4, "R1"),
            (4, "R2"),
            (3, 1),        # smallest real offset (slot 3, 0 extra bits)
        ]
        # R-history trace: (257,4096) -> R=[4096,1,1]; R0 stays;
        # (5,700) -> R=[700,4096,1]; R1 swaps -> R=[4096,700,1];
        # R2 is STILL the initial 1 -> swaps -> R=[1,700,4096].
        expect = bytearray(text)
        for ln, off in [(257, 4096), (20, 4096), (5, 700),
                        (4, 4096), (4, 1), (3, 1)]:
            start = len(expect) - off
            for i in range(ln):
                expect.append(expect[start + i])
        comp = chmgen.lzx_encode_tokens(toks, len(expect), aligned=aligned)
        assert lzx_decompress(comp, len(expect), 16) == bytes(expect)

    def test_e8_untranslation(self):
        raw = bytearray(b"\x90" * 64)
        raw[10] = 0xE8
        filesize, cur, rel = 100_000, 10, 5_000
        raw[11:15] = struct.pack("<i", rel + cur)
        comp = chmgen.lzx_encode_tokens(
            list(raw), len(raw), intel_size=filesize
        )
        out = lzx_decompress(comp, len(raw), 16)
        assert struct.unpack_from("<i", out, 11)[0] == rel
        # translation size 0 => bytes untouched
        comp0 = chmgen.lzx_encode_tokens(list(raw), len(raw))
        assert lzx_decompress(comp0, len(raw), 16) == bytes(raw)

    def test_window_bits_validation(self):
        with pytest.raises(ChmFormatError, match="window"):
            lzx_decompress(b"\x00\x00", 0, 22)

    def test_truncated_stream_raises(self):
        data = bytes(range(200))
        comp = chmgen.lzx_compress_literals(data)
        with pytest.raises(ChmFormatError):
            lzx_decompress(comp[: len(comp) // 4], len(data), 16)


# ------------------------------------------------------------- container


MEMBERS = {
    "index.htm": b"<html><body>Hello <b>CHM</b> world</body></html>",
    "pages/deep.html": b"<p>deep page</p>" * 40,
    "toc.hhc": b"<ul><li>entry</li></ul>",
    "style.css": b"body { margin: 0 }",
}


class TestContainer:
    @pytest.mark.parametrize("compress", [False, True])
    def test_roundtrip(self, compress):
        blob = chmgen.build_chm(MEMBERS, compress=compress)
        assert dict(extract_chm(blob)) == MEMBERS

    def test_multi_span_compressed(self):
        # > 0x8000 bytes => several independent LZX reset spans; the
        # member read must stitch spans back together exactly.
        big = {
            "big.htm": b"<html>"
            + bytes((i % 93) + 33 for i in range(200_000))
            + b"</html>"
        }
        blob = chmgen.build_chm(big, compress=True)
        assert dict(extract_chm(blob)) == big

    def test_member_spanning_span_boundary(self):
        members = {
            "a.htm": b"A" * 0x7F00,
            "b.htm": b"B" * 0x300,  # crosses the 0x8000 reset boundary
            "c.htm": b"C" * 10,
        }
        blob = chmgen.build_chm(members, compress=True)
        assert dict(extract_chm(blob)) == members

    def test_want_filter_and_caps(self):
        blob = chmgen.build_chm(MEMBERS, compress=False)
        html_only = dict(
            extract_chm(
                blob, want=lambda n: n.lower().endswith((".htm", ".html"))
            )
        )
        assert set(html_only) == {"index.htm", "pages/deep.html"}
        # file cap: keeps directory order, stops after max_files
        capped = dict(extract_chm(blob, max_files=2))
        assert len(capped) == 2
        # byte cap: the member that would exceed it is excluded and
        # the walk stops (reference reader.py:118-121 semantics)
        tiny = dict(extract_chm(blob, max_bytes=60))
        assert all(len(v) <= 60 for v in tiny.values())
        assert len(tiny) < len(MEMBERS)

    def test_not_a_chm_raises(self):
        with pytest.raises(ChmFormatError, match="ITSF"):
            parse_chm_directory(b"PK\x03\x04 definitely a zip")

    def test_directory_parse_fields(self):
        blob = chmgen.build_chm(MEMBERS, compress=True)
        parsed = parse_chm_directory(blob)
        entries = parsed["entries"]
        assert "/index.htm" in entries
        assert "::DataSpace/NameList" in entries
        section, _off, length = entries["/index.htm"]
        assert section == 1  # compressed members live in section 1
        assert length == len(MEMBERS["index.htm"])


# ------------------------------------------------------------ Spark path


class TestReadChm:
    @pytest.fixture(scope="class")
    def chm_path(self, tmp_path_factory):
        p = tmp_path_factory.mktemp("chm") / "help.chm"
        p.write_bytes(chmgen.build_chm(MEMBERS, compress=True))
        return str(p)

    def test_read_chm_rows(self, spark, chm_path):
        from indexlab_spark.sources.reader import read_chm

        rows = {r["path"]: r["text"] for r in read_chm(spark, chm_path).collect()}
        # html members only, css excluded, text stripped of tags
        # (S6 contract: tags become line breaks, non-empty lines joined)
        assert set(rows) == {"index.htm", "pages/deep.html", "toc.hhc"}
        assert rows["index.htm"] == "Hello\nCHM\nworld"
        assert "deep page" in rows["pages/deep.html"]
        assert "<p>" not in rows["pages/deep.html"]

    def test_read_any_dispatch(self, spark, chm_path):
        from indexlab_spark.sources.reader import read_any

        df = read_any(spark, chm_path)
        assert df.columns == ["path", "text"]
        assert df.count() == 3

    def test_sniff_magic(self):
        from indexlab_spark.sources.reader import sniff_format

        assert sniff_format("help.chm", b"") == "chm"
        assert sniff_format("renamed.bin", b"ITSF\x03\x00") == "chm"

    def test_legacy_charsets(self, spark, tmp_path):
        # Real-world CHM HTML is very commonly windows-1252 (or another
        # legacy charset declared in <meta>); the reference's bs4 path
        # honors the declaration.  utf-8 errors='ignore' would silently
        # DROP these bytes — assert the characters survive instead.
        members = {
            # declared charset wins
            "decl.htm": (
                b'<html><head><meta http-equiv="Content-Type" '
                b'content="text/html; charset=windows-1252"></head>'
                b"<body>caf\xe9 \x93quoted\x94</body></html>"
            ),
            # no declaration, invalid UTF-8 -> cp1252 fallback
            "plain.htm": b"<p>na\xefve \x97 em-dash</p>",
            # valid UTF-8 stays UTF-8
            "utf8.htm": "<p>héllo — ü</p>".encode("utf-8"),
            # UTF-8 BOM honored
            "bom.htm": b"\xef\xbb\xbf" + "<p>bömped</p>".encode("utf-8"),
        }
        from indexlab_spark.sources.reader import read_chm

        p = tmp_path / "charset.chm"
        p.write_bytes(chmgen.build_chm(members, compress=True))
        rows = {r["path"]: r["text"] for r in read_chm(spark, str(p)).collect()}
        assert rows["decl.htm"] == "caf\xe9 “quoted”"
        assert rows["plain.htm"] == "na\xefve — em-dash"
        assert rows["utf8.htm"] == "héllo — ü"
        assert rows["bom.htm"] == "bömped"

    def test_empty_result_schema_stable(self, spark, tmp_path):
        # an archive with no HTML members yields 0 rows, same schema
        from indexlab_spark.sources.reader import read_chm

        p = tmp_path / "nohtml.chm"
        p.write_bytes(chmgen.build_chm({"data.css": b"x{}"}))
        df = read_chm(spark, str(p))
        assert df.columns == ["path", "text"]
        assert df.count() == 0


class TestMultiChunkDirectory:
    def test_many_members_span_pmgl_chunks_with_pmgi(self):
        """Enough members to overflow one 0x1000 PMGL chunk: the
        builder emits several PMGLs + a PMGI index chunk; the reader
        must walk every PMGL and skip the PMGI."""
        members = {
            f"dir{i // 50}/page_{i:04d}_{'x' * 40}.htm":
                f"<p>page {i}</p>".encode()
            for i in range(200)
        }
        blob = chmgen.build_chm(members, compress=False)
        parsed = parse_chm_directory(blob)
        # sanity: the directory really is multi-chunk (ITSP num_chunks
        # counts PMGLs + the PMGI; at least 3 PMGLs expected here)
        n_chunks = struct.unpack_from("<I", blob, blob.index(b"ITSP") + 48)[0]
        assert n_chunks >= 4
        assert len(parsed["entries"]) == len(members)
        assert dict(extract_chm(blob)) == members

    def test_many_members_compressed(self):
        members = {
            f"p{i:03d}_{'y' * 50}.html": (f"<b>{i}</b>" * 30).encode()
            for i in range(150)
        }
        blob = chmgen.build_chm(members, compress=True)
        assert dict(extract_chm(blob)) == members
