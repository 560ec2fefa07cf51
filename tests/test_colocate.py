"""Bucketed co-located joins + salted skew joins (plans/colocate.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from indexlab_spark.plans.colocate import (
    bucketed_join,
    exchange_count,
    salted_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, tables, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucket_wh")
    write_bucketed(
        tables["orders"], "orders_b", "o_orderkey", buckets=8,
        path=str(wh / "orders_b"),
    )
    write_bucketed(
        tables["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        buckets=8,
        path=str(wh / "lineitem_b"),
    )
    yield ("orders_b", "lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_no_exchange(spark, tables, bucketed_tables):
    lt, rt = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, lt, rt, "o_orderkey").groupBy(
            "o_orderstatus"
        ).agg(F.round(F.sum("l_quantity"), 6).alias("qty"))
        # join itself: zero exchanges (bucket-aligned SortMergeJoin);
        # the final tiny groupBy exchange is the only one in the plan
        join_only = bucketed_join(spark, lt, rt, "o_orderkey")
        join_only.collect()
        assert exchange_count(join_only) == 0
        # correctness vs plain dataframe join
        got = {tuple(r) for r in j.collect()}
        expect = {
            tuple(r)
            for r in tables["orders"]
            .join(
                tables["lineitem"],
                tables["orders"]["o_orderkey"] == tables["lineitem"]["l_orderkey"],
            )
            .groupBy("o_orderstatus")
            .agg(F.round(F.sum("l_quantity"), 6).alias("qty"))
            .collect()
        }
        assert got == expect
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_plain_join_has_exchanges(spark, bucketed_tables, tables):
    """Control: the same join on NON-bucketed frames shuffles both sides."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = tables["orders"].join(
            tables["lineitem"],
            tables["orders"]["o_orderkey"] == tables["lineitem"]["l_orderkey"],
        )
        j.collect()
        assert exchange_count(j) >= 2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_salted_join_matches_plain(spark):
    # heavily skewed: one hot key with 5000 rows, 50 cold keys
    big = spark.range(5000).select(
        F.when(F.col("id") < 4950, F.lit(1)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(50)], ["k", "name"]
    )
    got = salted_join(big, small, "k", n_salt=8)
    plain = big.join(small, "k")
    assert got.count() == plain.count()
    g = {(r["k"], r["payload"], r["name"]) for r in got.collect()}
    p = {(r["k"], r["payload"], r["name"]) for r in plain.collect()}
    assert g == p


def test_salted_join_left_outer(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (99, "c")], ["k", "v"])
    small = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "w"])
    got = {(r["k"], r["v"], r["w"])
           for r in salted_join(big, small, "k", n_salt=4, how="left").collect()}
    assert got == {(1, "a", "x"), (2, "b", "y"), (99, "c", None)}
