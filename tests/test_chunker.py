"""C1-C4 parity tests — fixtures derived from the reference semantics
(/root/reference/app/ingest/chunker.py:14-51); see SURVEY §2.3."""

import string

from hypothesis import given, settings, strategies as st

from indexlab_spark.operators.chunk import (
    chunk_by_headings,
    chunk_fixed,
    chunk_sentences,
    chunk_text,
)

TEXT = (
    "Nimbus One is a compact network appliance. It draws 45W under load! "
    "Does it support PoE? Yes, on ports 1-4.\n\n"
    "# Power\nInput 100-240VAC, 50/60Hz. Max draw 65W.\n"
    "## Thermal\nOperating range 0-40C."
)


def test_chunk_fixed_basic():
    out = chunk_fixed("abcdefghij", 4, 1)
    # windows: [0:4] -> advance to 3, [3:7] -> 6, [6:10] ends
    assert out == ["abcd", "defg", "ghij"]


def test_chunk_fixed_no_overlap():
    assert chunk_fixed("abcdefghij", 5, 0) == ["abcde", "fghij"]


def test_chunk_fixed_short_text():
    assert chunk_fixed("ab", 10, 2) == ["ab"]


def test_chunk_fixed_empty():
    assert chunk_fixed("", 10, 2) == []


def test_chunk_fixed_overlap_ge_size_terminates():
    # the i+1 floor guards the infinite loop (chunker.py:20)
    out = chunk_fixed("abcdef", 3, 5)
    assert out[0] == "abc"
    assert out[-1].endswith("f")
    assert len(out) == 4  # starts 0,1,2,3


def test_chunk_sentences_packing():
    text = "One. Two. Three. Four."
    # size fits two sentences per chunk
    out = chunk_sentences(text, 10, 0)
    assert out == ["One. Two.", "Three.", "Four."]


def test_chunk_sentences_overlap_from_original():
    text = "Alpha beta. Gamma delta. Epsilon zeta."
    packed = chunk_sentences(text, 12, 0)
    overlapped = chunk_sentences(text, 12, 4)
    assert len(packed) == len(overlapped)
    # overlap prefix comes from the ORIGINAL previous chunk (no compounding)
    for i in range(1, len(packed)):
        assert overlapped[i] == packed[i - 1][-4:] + packed[i]


def test_chunk_sentences_oversized_sentence_kept_whole():
    text = "Short. " + "x" * 50 + ". End."
    out = chunk_sentences(text, 10, 0)
    assert any(len(c) > 10 for c in out)


def test_chunk_by_headings_sections():
    text = "intro text\n# Head\nsection one body\n## Sub\nsection two body"
    out = chunk_by_headings(text, 1000, 0)
    # the '#' token is consumed as the boundary; the heading TEXT stays
    # with the following section (verified against the reference impl)
    assert out == ["intro text", "Head\nsection one body", "Sub\nsection two body"]


def test_chunk_by_headings_leading_heading_quirk():
    # whole text starts with '#' and contains no split point -> discarded
    assert chunk_by_headings("# Title only", 100, 0) == []


def test_mode_dispatch_unknown_falls_back_to_fixed():
    assert chunk_text(TEXT, "bogus", 50, 10) == chunk_fixed(TEXT, 50, 10)


@given(
    text=st.text(alphabet=string.printable, max_size=500),
    size=st.integers(min_value=1, max_value=50),
    overlap=st.integers(min_value=0, max_value=60),
)
@settings(max_examples=200, deadline=None)
def test_chunk_fixed_properties(text, size, overlap):
    out = chunk_fixed(text, size, overlap)
    if not text:
        assert out == []
        return
    assert all(out), "no empty chunks"
    assert all(len(c) <= size for c in out)
    # first chunk starts at 0; last chunk reaches the end
    assert text.startswith(out[0])
    assert text.endswith(out[-1])
    if overlap == 0:
        assert "".join(out) == text


@given(
    text=st.text(alphabet=string.printable, max_size=400),
    size=st.integers(min_value=5, max_value=80),
)
@settings(max_examples=100, deadline=None)
def test_chunk_fixed_stride_formula(text, size):
    """For size > overlap the closed-form start positions (used by
    chunk_fixed_expr and the DuckDB oracle) equal the iterative port."""
    overlap = size // 3
    stride = size - overlap
    out = chunk_fixed(text, size, overlap)
    n = len(text)
    if n == 0:
        assert out == []
        return
    import math

    k_last = max(0, math.ceil((n - size) / stride))
    expected = [text[k * stride : k * stride + size] for k in range(k_last + 1)]
    assert out == expected


def test_chunk_sentences_oracle_sql_matches_port():
    """The r12 chunk_sentences oracle (recursive sentence-packing fold,
    __spark_entry__._chunk_sentences_sql) must equal the python port on
    MULTI-sentence documents — the gate corpus is single-sentence, so
    this test is what actually exercises the fold's packing, overflow,
    trailing-space, empty-doc and overlap branches cross-engine."""
    import sys

    import duckdb

    sys.path.insert(0, ".")
    import __spark_entry__ as entry_mod

    docs = [
        (1, "Hello world. This is a test! Another sentence? Short. "
            "A much longer sentence that will certainly overflow the "
            "buffer size limit here. End."),
        (2, "One sentence only no punctuation"),
        (3, ""),
        (4, "A. B. C. D. E. F. G. H. I. J. K. L."),
        (5, "Trailing spaces after punct.   Next piece.  "),
        (6, "x" * 300 + ". tail bit."),
        (7, "Exact fit ab. cd ef gh ij kl mn op qr st uv wx yz 12 34."),
    ]
    size, overlap = 60, 15
    ref = {}
    for d, t in docs:
        for k, c in enumerate(chunk_sentences(t, size, overlap)):
            ref[(d, k)] = c

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?,?)", docs)
    sql = entry_mod._chunk_sentences_sql(size=size, overlap=overlap)
    got = {
        (r[0], r[1]): r[3] for r in con.execute(sql).fetchall()
    }
    assert got == ref
