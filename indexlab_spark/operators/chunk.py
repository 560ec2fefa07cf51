"""Chunking operators (SURVEY §2.3, C1-C7) — the reference's row-expanding
transform surface.

Reference semantics (/root/reference/app/ingest/chunker.py:14-51), preserved
exactly including the observable quirks:

- C1 ``chunk_fixed``: char windows ``text[i:i+size]``; advance
  ``i = max(j - overlap, i + 1)`` (the ``i+1`` floor guards the
  overlap >= size infinite loop); stop after the window that reaches the
  end. Empty text -> no chunks.
- C2 ``chunk_sentences``: split on ``(?<=[.!?])\\s+``; greedy pack into
  <= size chars joined by single spaces; then each chunk i>0 gets the last
  ``overlap`` chars of the previous *pre-overlap* chunk prefixed (the
  reference's list comprehension reads the original list, so overlap text
  does NOT compound). Output chunks may exceed ``size`` — by design.
- C3 ``chunk_by_headings``: split on ``\\n\\s*(#+|<h[1-3]>|</h[1-3]>)``;
  heading tokens are consumed as section boundaries; note a leading
  heading with no preceding newline makes the whole first segment start
  with '#' and be discarded as a boundary — quirk preserved.
- C4 mode dispatch: unknown mode falls back to fixed
  (/root/reference/app/ingest/pipeline.py:25-32).

Two execution strategies:

1. ``chunk_udf`` — exact Python port wrapped in an Arrow-batched
   pandas_udf returning array<string>, then ``posexplode``. Char-exact
   parity for all three modes; one Arrow batch per task, no per-row
   pickling; used when parity matters more than raw throughput.
2. ``chunk_fixed_expr`` — a pure Catalyst expression
   (sequence -> transform -> substring) equal to C1 whenever
   ``size > overlap`` (the only regime the reference's defaults use:
   1000/150). Stays inside whole-stage codegen — no Python in the hot
   path; this is the 100 TB path and is also directly expressible in the
   DuckDB oracle.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

_SENTENCE_SPLIT = re.compile(r"(?<=[\.!?])\s+")
_HEADING_SPLIT = re.compile(r"\n\s*(#+|\<h[1-3]\>|\</h[1-3]\>)")


# ---------------------------------------------------------------- pure ports
def chunk_fixed(text: str, size: int, overlap: int) -> list[str]:
    """C1 — chunker.py:14-21 parity."""
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        j = min(i + size, n)
        out.append(text[i:j])
        if j >= n:
            break
        i = max(j - overlap, i + 1)
    return out


def chunk_sentences(text: str, size: int, overlap: int) -> list[str]:
    """C2 — chunker.py:25-37 parity (overlap from pre-overlap neighbor)."""
    sents = _SENTENCE_SPLIT.split(text)
    packed: list[str] = []
    cur = ""
    for s in sents:
        if len(cur) + len(s) + 1 <= size:
            cur = (cur + " " + s).strip()
        else:
            if cur:
                packed.append(cur)
            cur = s
    if cur:
        packed.append(cur)
    if overlap > 0 and len(packed) > 1:
        return [packed[0]] + [
            packed[i - 1][-overlap:] + packed[i] for i in range(1, len(packed))
        ]
    return packed


def chunk_by_headings(text: str, size: int, overlap: int) -> list[str]:
    """C3 — chunker.py:39-51 parity (split tokens consumed as boundaries)."""
    parts = _HEADING_SPLIT.split(text)
    sections: list[str] = []
    buf = ""
    for p in parts:
        if p and p.strip().startswith(("#", "<h", "</h")):
            if buf:
                sections.append(buf.strip())
                buf = ""
        else:
            buf += "\n" + p
    if buf:
        sections.append(buf.strip())
    out: list[str] = []
    for sect in sections:
        out.extend(chunk_fixed(sect, size, overlap))
    return out


_MODES = {
    "fixed_chars": chunk_fixed,
    "sentences": chunk_sentences,
    "headings": chunk_by_headings,
}


def chunk_text(text: str, mode: str, size: int, overlap: int) -> list[str]:
    """C4 mode dispatch; unknown mode -> fixed (pipeline.py:25-32)."""
    return _MODES.get(mode, chunk_fixed)(text, size, overlap)


# ------------------------------------------------------------- Spark surface
def chunk_udf(mode: str, size: int, overlap: int):
    """Exact-parity chunker as an Arrow-batched pandas_udf -> array<string>.

    Same verbatim ports underneath; the wrapper is a Series->Series
    pandas_udf so the sentences/headings ingest modes pay one Arrow
    batch transfer per task instead of per-row pickling (the fixed mode
    normally bypasses this entirely via ``chunk_fixed_expr``)."""
    fn = _MODES.get(mode, chunk_fixed)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _chunk(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: fn(t if isinstance(t, str) else "", size, overlap))

    return _chunk


def chunk_fixed_expr(text: Column | str, size: int, overlap: int) -> Column:
    """C1 as a pure Catalyst expression (valid for size > overlap).

    Chunk starts are k*stride for stride = size-overlap; the last chunk is
    the first whose window reaches the end: k_last = ceil((n-size)/stride)
    clamped at >= 0. Runs fully inside whole-stage codegen — this is the
    scale path and the DuckDB-oracle-expressible formulation.
    """
    if size <= overlap:
        raise ValueError("chunk_fixed_expr requires size > overlap; use chunk_udf")
    c = F.col(text) if isinstance(text, str) else text
    stride = size - overlap
    n = F.length(c)
    k_last = F.greatest(
        F.lit(0), F.ceil((n - F.lit(size)) / F.lit(float(stride))).cast("int")
    )
    seq = F.sequence(F.lit(0), k_last)
    chunks = F.transform(
        seq, lambda k: F.substring(c, k * stride + 1, size)
    )
    # empty text -> no chunks (reference returns [] for "")
    return F.when(n > 0, chunks).otherwise(F.array().cast("array<string>"))


def explode_chunks(
    df: DataFrame,
    text_col: str = "text",
    mode: str = "fixed_chars",
    size: int = 1000,
    overlap: int = 150,
    doc_no_col: str = "doc_no",
    use_expr: bool | None = None,
) -> DataFrame:
    """Document rows -> chunk rows with (doc_no, chunk_no, doc_id, text).

    ``doc_id = concat(doc_no, '#', chunk_no)`` (P4, pipeline.py:56).
    Uses the codegen expression for fixed_chars when size > overlap,
    otherwise the parity UDF.

    Fans out under-partitioned inputs first (plans.colocate.fan_out):
    single-file sources arrive as one partition, which would run the
    chunk expression AND every downstream Arrow stage (embedding) as a
    single task. Row-wise semantics are unaffected — doc_no is already
    a column, chunk_no is per-row.
    """
    from indexlab_spark.plans.colocate import fan_out

    df = fan_out(df)
    if use_expr is None:
        use_expr = mode == "fixed_chars" and size > overlap
    arr = (
        chunk_fixed_expr(F.col(text_col), size, overlap)
        if use_expr
        else chunk_udf(mode, size, overlap)(F.col(text_col))
    )
    exploded = df.select(
        F.col(doc_no_col).cast("long").alias("doc_no"),
        F.posexplode(arr).alias("chunk_no", "chunk_text"),
    )
    return exploded.select(
        "doc_no",
        F.col("chunk_no").cast("int").alias("chunk_no"),
        F.concat_ws("#", F.col("doc_no"), F.col("chunk_no")).alias("doc_id"),
        F.col("chunk_text").alias("text"),
    )


def chunk_stats(chunks_df: DataFrame, text_col: str = "text") -> DataFrame:
    """C5 — count/avg/min/max of chunk char lengths
    (/root/reference/app/api/chunk_preview.py:24-28)."""
    ln = F.length(F.col(text_col))
    return chunks_df.agg(
        F.count(F.lit(1)).alias("count"),
        F.avg(ln).alias("avg_len"),
        F.min(ln).alias("min_len"),
        F.max(ln).alias("max_len"),
    )


PREVIEW_CAP = 2_000_000  # chunk_preview.py:13


def preview_sample(
    df: DataFrame,
    text_col: str,
    full_file: bool,
    rows_to_sample: int = 50,
    order_col: str | None = None,
) -> str:
    """C7 — preview text assembly (chunk_preview.py:118-139).

    full_file: join the whole text column with blank lines, truncated at
    2,000,000 chars; else the first ``rows_to_sample`` non-blank rows
    under the same cap. Driver-side by contract (it feeds an interactive
    preview) but assembled with one aggregation, not a row loop.
    """
    src = df
    if order_col:
        src = src.orderBy(order_col)
    nonblank = src.filter(F.trim(F.col(text_col)) != "")
    if not full_file:
        nonblank = nonblank.limit(rows_to_sample)
    if order_col:
        # collect_list does NOT preserve a prior global sort across the
        # aggregation shuffle (partial buffers merge in fetch-completion
        # order) — collect (order, text) structs and sort the ARRAY
        agg = F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(order_col), F.col(text_col)))
                ),
                lambda s: s[text_col],
            ),
            "\n\n",
        )
    else:
        agg = F.concat_ws("\n\n", F.collect_list(F.col(text_col)))
    joined = nonblank.agg(agg.alias("t")).collect()[0]["t"]
    return joined[:PREVIEW_CAP]


def paginate(df: DataFrame, order_cols: list[str], page: int, page_size: int) -> DataFrame:
    """C6 — 1-based page, page_size clamped to [1, 500]
    (/root/reference/app/api/chunk_preview.py:146-151).

    Numbering via global_order_index (range shuffle + parallel
    per-partition numbering) — the previous un-partitioned
    row_number() window funneled the ENTIRE table through one task per
    page request, the exact single-partition defect that helper exists
    to remove. Same 0-based global ranks, so page contents are
    identical."""
    from indexlab_spark.functions.text import global_order_index

    page = max(1, page)
    page_size = min(500, max(1, page_size))
    start = (page - 1) * page_size
    return (
        global_order_index(df, order_cols, "_rn")
        .filter((F.col("_rn") >= start) & (F.col("_rn") < start + page_size))
        .drop("_rn")
    )
