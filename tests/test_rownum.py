"""Scale-safe row numbering (VERDICT r1 task 5): zip_index /
global_order_index must match the old global-window numbering exactly
while keeping Exchange SinglePartition out of the physical plan."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from indexlab_spark.functions.text import global_order_index, zip_index


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_zip_index_matches_global_window(spark):
    df = spark.range(0, 1000, 1, 8).select(
        (F.col("id") * 37 % 1000).alias("payload")
    )
    got = zip_index(df, "rn")
    want = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.monotonically_increasing_id())) - 1
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_zip_index_no_single_partition_exchange(spark):
    df = spark.range(0, 1000, 1, 8).select(F.col("id").alias("payload"))
    out = zip_index(df, "rn")
    out.collect()
    assert "SinglePartition" not in _plan(out)


def test_global_order_index_matches_window_rank(spark):
    df = spark.range(0, 2000, 1, 8).select(
        (F.col("id") % 111).alias("doc_no"), (F.col("id") / 111).cast("int").alias("chunk_no")
    )
    got = global_order_index(df, ["doc_no", "chunk_no"], "pos")
    w = Window.orderBy("doc_no", "chunk_no")
    want = df.withColumn("pos", F.row_number().over(w).cast("long") - 1)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_global_order_index_no_single_partition_exchange(spark):
    df = spark.range(0, 2000, 1, 8).select(
        (F.col("id") % 111).alias("doc_no"), (F.col("id") / 111).cast("int").alias("chunk_no")
    )
    out = global_order_index(df, ["doc_no", "chunk_no"], "pos")
    out.collect()
    assert "SinglePartition" not in _plan(out)


def test_zip_index_empty_frame(spark):
    df = spark.range(0).select(F.col("id").alias("payload"))
    assert zip_index(df, "rn").count() == 0
