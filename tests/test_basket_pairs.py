"""r17: the co-purchase edge builds (and association_rules' pair pass)
moved from a basket self-join to dedup.basket_pairs (array i<j
combinations). The rewrite must be OUTPUT-IDENTICAL to the self-join —
including duplicate-items-per-basket multiplicity, the subtle case the
r16 verdict required a dedicated parity test for."""

from pyspark.sql import functions as F

from indexlab_spark.operators.dedup import basket_pairs


def _selfjoin_pairs(df, basket_col, item_col):
    a, b = df.alias("a"), df.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{basket_col}") == F.col(f"b.{basket_col}"))
            & (F.col(f"a.{item_col}") < F.col(f"b.{item_col}")),
        )
        .select(
            F.col(f"a.{basket_col}").alias(basket_col),
            F.col(f"a.{item_col}").alias("a"),
            F.col(f"b.{item_col}").alias("b"),
        )
    )


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_multiplicity_matches_selfjoin(spark):
    # basket 1 carries a DUPLICATE item (10 twice): the self-join
    # counts (10, 20) twice (m_a * m_b = 2) and (10, 10) zero times
    df = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 10), (1, 30), (2, 5), (2, 5), (3, 7),
         (4, 2), (4, 1), (4, 2), (4, 3), (4, 1)],
        "bk long, it long",
    )
    assert _sorted_rows(basket_pairs(df, "bk", "it")) == _sorted_rows(
        _selfjoin_pairs(df, "bk", "it")
    )


def test_distinct_items_equals_deduped_selfjoin(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 10), (1, 30), (2, 5), (2, 5)],
        "bk long, it long",
    )
    assert _sorted_rows(
        basket_pairs(df, "bk", "it", distinct_items=True)
    ) == _sorted_rows(_selfjoin_pairs(df, "bk", "it").distinct())


def test_copurchase_edges_match_selfjoin_build(spark, sf_dir):
    """The shared entry helper reproduces the old self-join edge build
    on real lineitem data, for both the support>=2 and distinct
    variants."""
    import __spark_entry__ as entry

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    a, b = li.alias("a"), li.alias("b")
    old_support = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("id_a"),
            F.col("b.l_partkey").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .drop("cnt")
    )
    new_support = entry._copurchase_edges(spark, sf_dir)
    assert _sorted_rows(new_support) == _sorted_rows(old_support)

    old_distinct = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("id_a"),
            F.col("b.l_partkey").alias("id_b"),
        )
        .distinct()
    )
    new_distinct = entry._copurchase_edges(spark, sf_dir, distinct=True)
    assert _sorted_rows(new_distinct) == _sorted_rows(old_distinct)
