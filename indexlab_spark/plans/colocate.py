"""Join co-location strategies for 100 TB fact-fact joins.

Two patterns Spark offers beyond broadcast (small side) and plain
shuffled SMJ (both sides move every query):

- **Bucketing** (`write_bucketed` + `bucketed_join`): pay the shuffle
  ONCE at write time — both tables hash-bucketed and sorted on the join
  key produce a SortMergeJoin with ZERO Exchange (and no Sort) at read
  time. The right layout for a fact table joined on the same key query
  after query (orders ⨝ lineitem on orderkey). Verified by plan
  inspection in tests (`exchange_count == 0`).

- **Salting** (`salted_join`): when one join key is pathologically hot,
  a plain shuffle sends the whole hot key to one task. Salting splits
  the BIG side's rows across ``n_salt`` sub-keys and replicates the
  small-but-not-broadcastable side once per salt, bounding any task at
  ~1/n_salt of the hot key. AQE's skew-join splitting (enabled in
  session.py) handles moderate skew automatically; explicit salting is
  the deterministic fallback for extreme single-key skew or for
  aggregations AQE can't split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed AND sorted on ``key`` (parquet,
    session catalog; external table at ``path`` if given — bucket
    METADATA lives in the catalog either way). Joins/aggregations on
    ``key`` between tables bucketed with the SAME bucket count then need
    no Exchange and no Sort — the write-time shuffle is amortized over
    every later query."""
    spark = df.sparkSession
    if (
        path is None
        and "." not in table
        and mode == "overwrite"
        and not spark.catalog.tableExists(table)
        and not spark.catalog.tableExists(f"default.{table}")
    ):
        # Stale-location recovery: an in-memory catalog forgets managed
        # tables between sessions while their warehouse directories
        # survive, and saveAsTable then fails with
        # LOCATION_ALREADY_EXISTS. Only the exact orphaned location for
        # THIS unqualified table name is handled, only when NEITHER the
        # current database NOR default knows the table (an unqualified
        # managed location always lives under default, so checking the
        # current database alone could hit live data of default.<table>
        # while currentDatabase is elsewhere), and ONLY for
        # mode='overwrite' — append/error modes never clobber state, so
        # they must not trigger recovery either. The orphan is RENAMED
        # aside (<table>.orphan-N), not deleted: recovery stays
        # non-destructive even if the catalog check was wrong (e.g. a
        # concurrent app's warehouse — don't share one warehouse dir
        # across simultaneously-writing apps).
        import os
        from urllib.parse import urlparse

        # Resolve the warehouse dir the way Spark itself does (a
        # RELATIVE spark.sql.warehouse.dir is resolved by the JVM
        # against Spark's working dir, which can differ from the Python
        # CWD that urlparse-of-the-conf-string would imply).
        try:
            wh = urlparse(
                str(spark._jsparkSession.sessionState().conf().warehousePath())
            ).path
        except Exception:  # py4j hiccup: conf string is the best we have
            wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        orphan = f"{wh.rstrip('/')}/{table.lower()}"
        if os.path.isdir(orphan):
            n = 0
            while os.path.exists(f"{orphan}.orphan-{n}"):
                n += 1
            try:
                os.rename(orphan, f"{orphan}.orphan-{n}")
            except OSError:
                pass  # unwritable warehouse: saveAsTable will report it
    w = df.write.mode(mode).bucketBy(buckets, key).sortBy(key).format("parquet")
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle/broadcast-exchange) nodes in the
    EXECUTED physical plan — the testable definition of 'co-located'."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "ReusedExchange" not in line
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the big side gets a row-spread salt in
    [0, n_salt); the small side is replicated once per salt value; the
    join runs on (key, salt). Row multiplicity is exactly that of the
    plain join — only the shuffle distribution changes (any single key's
    work is spread over n_salt tasks at the cost of an n_salt-times
    larger small side).

    The salt uses monotonically_increasing_id so duplicate big-side rows
    still spread; it is partition-dependent (NOT reproducible run to
    run) which is fine — the salt never reaches the output.
    """
    big_s = big.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salt)).cast("int")
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salt - 1))
    ).alias("_salt")
    small_s = small.select("*", salts)
    out = big_s.join(small_s, [key, "_salt"], how)
    return out.drop("_salt")


def fan_out(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Ensure a frame headed into a CPU-heavy stage uses the cluster.

    A single-file parquet source (or any narrow lineage) arrives as 1-2
    partitions; every downstream Arrow/pandas stage then runs on that
    many TASKS — on local[32] that is a 32x parallelism loss that no
    amount of operator tuning recovers (measured: the chunk+embed ingest
    over a 1-partition corpus ran 8.2s vs 2.2s after fan-out). If the
    current partition count is below ``min_fraction`` of
    ``defaultParallelism``, round-robin repartition to the full
    parallelism; otherwise return the frame unchanged (no gratuitous
    shuffle for already-distributed inputs — at 100 TB sources arrive
    in thousands of splits and this is a no-op).
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(1, int(parallelism * min_fraction)):
        return df.repartition(parallelism)
    return df
