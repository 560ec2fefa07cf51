"""Spark-side chunking: expression path == Python parity port (C1)."""

from pyspark.sql import functions as F

from indexlab_spark.operators.chunk import (
    chunk_fixed,
    chunk_fixed_expr,
    chunk_udf,
    explode_chunks,
)


def test_expr_matches_python_port(spark, tables):
    docs = tables["documents"].select("doc_id", "text").limit(50)
    got = (
        docs.select("doc_id", chunk_fixed_expr(F.col("text"), 100, 20).alias("c"))
        .orderBy("doc_id")
        .collect()
    )
    for r in got:
        text = docs.filter(F.col("doc_id") == r["doc_id"]).collect()[0]["text"]
        assert r["c"] == chunk_fixed(text, 100, 20), f"doc {r['doc_id']}"


def test_udf_matches_python_port(spark, tables):
    docs = tables["documents"].select("doc_id", "text").limit(20)
    pdf = docs.toPandas()
    got = docs.select(
        "doc_id", chunk_udf("sentences", 120, 30)(F.col("text")).alias("c")
    ).toPandas()
    merged = pdf.merge(got, on="doc_id")
    from indexlab_spark.operators.chunk import chunk_sentences

    for _, row in merged.iterrows():
        assert list(row["c"]) == chunk_sentences(row["text"], 120, 30)


def test_explode_chunks_doc_ids(spark):
    df = spark.createDataFrame(
        [(0, "a" * 250), (1, "b" * 90), (2, "")], "doc_no long, text string"
    )
    out = explode_chunks(df, size=100, overlap=20).orderBy("doc_no", "chunk_no")
    rows = out.collect()
    # doc 0: n=250, stride=80 -> k_last=ceil(150/80)=2 -> 3 chunks
    assert [r["doc_id"] for r in rows] == ["0#0", "0#1", "0#2", "1#0"]
    assert rows[0]["text"] == "a" * 100
    assert rows[3]["text"] == "b" * 90


def test_preview_sample(spark):
    from indexlab_spark.operators.chunk import preview_sample

    df = spark.createDataFrame(
        [(0, "alpha"), (1, "  "), (2, "beta"), (3, "gamma")], "i long, text string"
    )
    assert preview_sample(df, "text", full_file=True, order_col="i") == \
        "alpha\n\nbeta\n\ngamma"
    assert preview_sample(df, "text", full_file=False, rows_to_sample=2,
                          order_col="i") == "alpha\n\nbeta"
