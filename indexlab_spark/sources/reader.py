"""Source readers (SURVEY §2.1, S1-S8).

Reference: /root/reference/app/ingest/reader.py (pandas readers + CHM
decompile + HTML strip) and app/api/chunk_preview.py:66-101 (format
sniffing). Re-expressed Spark-first:

- CSV/JSON/text go through ``spark.read`` — distributed scans with
  schema inference, predicate pushdown and column pruning for free.
- Excel has no native Spark reader here: driver-side pandas.read_excel
  gated behind an import-try (openpyxl/xlrd are not installed in this
  container) feeding ``spark.createDataFrame`` — the file is one
  upload, driver-side is the honest scale story anyway.
- CHM decompilation needs hh.exe / 7-Zip (reader.py:44-83): stubbed with
  NotImplementedError; the post-extraction HTML walk IS implemented
  (``read_html_tree``) over ``binaryFile`` — the distributed part.
- HTML -> text strips script/style/noscript and joins non-empty lines
  (reader.py:10-20); bs4 is unavailable so a regex-based stripper with
  the same contract is used (import-try keeps bs4 preferred when
  present).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHM_MAX_FILES = 10_000  # reference reader.py:7
CHM_MAX_BYTES = 100 * 1024 * 1024  # reference reader.py:8

_EXT_CSV = {".csv"}
_EXT_EXCEL = {".xls", ".xlsx"}
_EXT_JSON = {".json"}
_EXT_HTML = {".htm", ".html", ".hhc", ".hhk"}


# ------------------------------------------------------------------ S6 HTML
def html_to_text(html: str) -> str:
    """S6 — drop script/style/noscript, strip tags, join non-empty lines
    (reader.py:10-20 contract). Uses bs4 when available, else a regex
    stripper with the same observable behavior on well-formed HTML."""
    try:
        from bs4 import BeautifulSoup  # type: ignore

        soup = BeautifulSoup(html, "html.parser")
        for tag in soup(["script", "style", "noscript"]):
            tag.decompose()
        text = soup.get_text("\n")
    except ImportError:
        no_blocks = re.sub(
            r"<(script|style|noscript)\b[^>]*>.*?</\1\s*>",
            " ",
            html,
            flags=re.IGNORECASE | re.DOTALL,
        )
        no_tags = re.sub(r"<[^>]+>", "\n", no_blocks)
        text = (
            no_tags.replace("&nbsp;", " ")
            .replace("&amp;", "&")
            .replace("&lt;", "<")
            .replace("&gt;", ">")
            .replace("&quot;", '"')
        )
    lines = [ln.strip() for ln in text.splitlines()]
    return "\n".join(ln for ln in lines if ln)


# ------------------------------------------------------------------ S7 sniff
def sniff_format(filename: str, head: bytes) -> str:
    """S7 — extension first, then magic bytes
    (chunk_preview.py:66-101 semantics): PK zip -> xlsx, OLE2 -> xls,
    '{'/'[' -> json, comma+newline heuristics -> csv, else txt."""
    ext = os.path.splitext(filename)[1].lower()
    if ext in _EXT_CSV:
        return "csv"
    if ext in _EXT_EXCEL:
        return "excel"
    if ext in _EXT_JSON:
        return "json"
    if ext in _EXT_HTML:
        return "html"
    if ext == ".chm":
        return "chm"
    if ext in {".txt", ".md"}:
        return "text"
    if head.startswith(b"PK"):
        return "excel"
    if head.startswith(b"\xd0\xcf\x11\xe0"):
        return "excel"
    stripped = head.lstrip()
    if stripped[:1] in (b"{", b"["):
        return "json"
    try:
        sample = head.decode("utf-8", errors="ignore")
    except Exception:
        sample = ""
    first_line = sample.splitlines()[0] if sample.splitlines() else ""
    if "," in first_line and "\n" in sample:
        return "csv"
    return "text"


# ------------------------------------------------------------------- read_any
def read_any(spark: SparkSession, path: str) -> DataFrame:
    """S1-S5 dispatch — one DataFrame per source file, schema inferred
    (reader.py:136-161 contract)."""
    with open(path, "rb") as f:
        head = f.read(4096)
    fmt = sniff_format(os.path.basename(path), head)
    if fmt == "csv":
        return (
            spark.read.option("header", True)
            .option("inferSchema", True)
            .csv(path)
        )
    if fmt == "json":
        return spark.read.option("multiLine", True).json(path)
    if fmt == "excel":
        return _read_excel_driver(spark, path)
    if fmt == "html":
        txt = html_to_text(
            open(path, "r", encoding="utf-8", errors="ignore").read()
        )
        return spark.createDataFrame([(txt,)], "text string")
    if fmt == "chm":
        raise NotImplementedError(
            "CHM decompilation requires hh.exe or 7-Zip (reference "
            "reader.py:44-83); decompile externally and use read_html_tree "
            "on the extracted directory"
        )
    # text/markdown: whole file -> one row, utf-8 errors ignored
    # (reader.py:157-159)
    txt = open(path, "r", encoding="utf-8", errors="ignore").read()
    return spark.createDataFrame([(txt,)], "text string")


def _read_excel_driver(spark: SparkSession, path: str) -> DataFrame:
    """S2 — driver-side pandas.read_excel -> createDataFrame. Gated:
    openpyxl/xlrd are not installed in this container."""
    try:
        import pandas as pd

        pdf = pd.read_excel(path)
    except ImportError as e:
        raise NotImplementedError(
            f"Excel reading needs openpyxl/xlrd (not installed): {e}"
        ) from e
    return spark.createDataFrame(pdf)


# --------------------------------------------------------- S5 HTML tree walk
def read_html_tree(spark: SparkSession, root_dir: str) -> DataFrame:
    """S5 (post-decompile part) — walk .htm/.html/.hhc/.hhk under a
    directory, strip HTML, one row per file: (path, text). Caps: 10k
    files / 100 MB (reader.py:7-8,100-133).

    Distributed: ``binaryFile`` scan + decode/strip per file. The
    pathGlobFilter pushes the extension filter into the file listing.
    """
    bin_df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{htm,html,hhc,hhk}")
        .option("recursiveFileLookup", True)
        .load(root_dir)
        .limit(CHM_MAX_FILES)
    )

    @F.udf("string")
    def _strip(content: bytes) -> str:
        if content is None or len(content) > CHM_MAX_BYTES:
            return ""
        return html_to_text(content.decode("utf-8", errors="ignore"))

    return bin_df.select(
        F.col("path"), _strip(F.col("content")).alias("text")
    ).filter(F.trim("text") != "")


# ------------------------------------------------------------------- S8 gold
def load_gold(spark: SparkSession, path: str) -> DataFrame:
    """S8 — gold set loader (eval_api.py:22-48): case-insensitive
    ``question``/``expected_id`` headers, str-trim values, drop empties."""
    df = read_any(spark, path)
    lower = {c.lower().strip(): c for c in df.columns}
    missing = {"question", "expected_id"} - set(lower)
    if missing:
        raise ValueError(
            f"gold file must have question/expected_id columns, missing {missing}"
        )
    out = df.select(
        F.trim(F.col(lower["question"]).cast("string")).alias("question"),
        F.trim(F.col(lower["expected_id"]).cast("string")).alias("expected_id"),
    )
    return out.filter((F.col("question") != "") & (F.col("expected_id") != ""))
