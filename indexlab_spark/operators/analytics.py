"""Analytics & catalog aggregations (SURVEY §2.7, A1-A9).

Reference (/root/reference/app/api/analytics.py:86-213) computes chunk
length stats in driver Python; here they are single aggregations over the
chunks table — the histogram and percentile reproduce the reference's
exact formulas (NOT width_bucket / percentile_approx, whose edge and
interpolation semantics differ).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from indexlab_spark.config import HIST_BINS


def length_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """A1+A2+A3 — count/min/max/avg/p95 of text char lengths.

    p95 uses Spark's exact ``percentile`` (linear interpolation:
    a[f] + (a[c]-a[f])*(k-f), matching analytics.py:106-115 and
    percentile_cont/quantile_cont).
    """
    ln = F.length(F.col(text_col))
    return df.agg(
        F.count(F.lit(1)).alias("count"),
        F.min(ln).alias("min_len"),
        F.max(ln).alias("max_len"),
        F.avg(ln).alias("avg_len"),
        F.expr(f"percentile(length({text_col}), 0.95)").alias("p95_len"),
    )


def histogram(
    df: DataFrame, value_col: Column | str, bins: int = HIST_BINS,
    dense: bool = False,
) -> DataFrame:
    """A4 — reference-exact integer-step BINNING (analytics.py:118-135).

    step = max(1, ceil((max-min)/bins)); value==max goes to the last
    bin, else bin = min(bins-1, (x-min) div step). The single-value
    corpus degenerates to one bin (the reference's {bins:[v,v]} spike).
    Returns (bin, lo, hi, cnt) ordered by bin; lo/hi are the reference's
    edge values for that bin.

    NOTE on shape: by default only OBSERVED bins are returned (sparse).
    The reference returns a dense counts array including zero bins —
    pass ``dense=True`` for that shape (a left join of the bin range,
    constant-sized, against the observed counts).

    Scale: two passes — a min/max agg whose TWO scalars come back to the
    driver and are inlined as literals (the documented small-side
    pattern; cheaper than the earlier broadcast-crossJoin of the stats
    row, which added a BroadcastExchange job per call), then one binning
    scan + groupBy on <= bins keys. No sort, no skew risk.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    vals = df.select(v.cast("long").alias("val"))
    srow = vals.agg(F.min("val").alias("vmin"), F.max("val").alias("vmax")).collect()
    if not srow or srow[0]["vmin"] is None:
        return df.sparkSession.createDataFrame(
            [], "bin int, lo long, hi long, cnt long"
        )
    vmin, vmax = int(srow[0]["vmin"]), int(srow[0]["vmax"])
    import math as _math

    step = max(1, _math.ceil((vmax - vmin) / float(bins)))
    if vmin == vmax:
        bin_expr = F.lit(0)
    else:
        bin_expr = F.when(F.col("val") == vmax, F.lit(bins - 1)).otherwise(
            F.least(F.lit(bins - 1), F.expr(f"(val - {vmin}) div {step}"))
        )
    out = (
        vals.select(bin_expr.cast("int").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if dense:
        n_bins = 1 if vmin == vmax else bins
        all_bins = df.sparkSession.range(n_bins).select(
            F.col("id").cast("int").alias("bin")
        )
        out = (
            all_bins.join(out, "bin", "left").na.fill({"cnt": 0})
        )
    hi = (
        F.lit(vmax)
        if vmin == vmax
        else F.when(F.col("bin") == bins - 1, F.lit(vmax)).otherwise(
            F.lit(vmin) + (F.col("bin") + 1) * F.lit(step)
        )
    )
    return out.select(
        "bin",
        (F.lit(vmin) + F.col("bin") * F.lit(step)).cast("long").alias("lo"),
        hi.cast("long").alias("hi"),
        "cnt",
    ).orderBy("bin")


def index_stats(
    chunks_df: DataFrame, manifests_df: DataFrame, index_name: str, version: str | None = None
) -> DataFrame:
    """A5 — count + length stats + flattened manifest fields for one
    index version (analytics.py:140-213). Partition pruning on
    (index_name, version) makes this a metadata-cheap scan."""
    ch = chunks_df.filter(F.col("index_name") == index_name)
    mf = manifests_df.filter(F.col("index_name") == index_name)
    if version:
        ch = ch.filter(F.col("version") == version)
        mf = mf.filter(F.col("version") == version)
    else:
        latest = mf.agg(F.max("version").alias("version"))
        mf = mf.join(F.broadcast(latest), "version")
        ch = ch.join(F.broadcast(latest), "version")
    stats = length_stats(ch)
    return stats.crossJoin(
        F.broadcast(
            mf.select(
                "index_name", "version", "model", "dim", "backend",
                "normalize", "chunking", "created_at",
            )
        )
    )


def sum_source_rows(manifests_df: DataFrame) -> DataFrame:
    """A6 — total rows across the manifest sources map
    (pipeline.py:142-146)."""
    return manifests_df.select(
        "index_name",
        "version",
        F.aggregate(
            F.map_values(F.col("sources")),
            F.lit(0).cast("long"),
            lambda acc, s: acc + F.coalesce(s["rows"], F.lit(0)),
        ).alias("total_rows"),
    )


def catalog(manifests_df: DataFrame) -> DataFrame:
    """A7 — index catalog listing (sources.py:72-113): latest version per
    index with count/model/backend/created_at/chunking, sorted by name."""
    latest = manifests_df.groupBy("index_name").agg(
        F.max_by(
            F.struct("version", "count", "model", "backend", "created_at",
                     "chunking", "sources"),
            F.struct("created_at", "version"),
        ).alias("m")
    )
    return latest.select(
        "index_name",
        F.col("m.version").alias("latest_version"),
        F.col("m.count").alias("count"),
        F.col("m.model").alias("model"),
        F.col("m.backend").alias("backend"),
        F.col("m.created_at").alias("created_at"),
        F.col("m.chunking").alias("chunking"),
        F.col("m.sources").isNotNull().alias("has_sources"),
    ).orderBy("index_name")


def list_versions(manifests_df: DataFrame, index_name: str) -> DataFrame:
    """A9 — versions of one index, deduped, (created_at, version) desc
    (versions.py:25-52)."""
    return (
        manifests_df.filter(F.col("index_name") == index_name)
        .dropDuplicates(["version"])
        .select("index_name", "version", "count", "backend", "created_at")
        .orderBy(F.desc("created_at"), F.desc("version"))
    )


def time_gapfill_locf(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hourly rollup with gap filling + last-observation-carried-forward
    (the timeseries-store `time_bucket_gapfill`/`locf` pattern).

    Per type: aggregate to hour buckets, densify to the type's full
    [min, max] hour range via sequence+explode, then carry the last
    non-null sum forward with an IGNORE NULLS window. One agg shuffle +
    one window shuffle, both keyed by type; the calendar explode is
    bounded by hours-in-range, not event count, so densification cost
    is independent of data volume.
    """
    b = df.groupBy(
        F.col(type_col).alias("event_type"),
        F.date_trunc("hour", F.col(ts_col)).alias("bk"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(value_col), 6).alias("sum_value"),
    )
    ext = b.groupBy("event_type").agg(F.min("bk").alias("mn"), F.max("bk").alias("mx"))
    cal = ext.select(
        "event_type",
        F.explode(F.expr("sequence(mn, mx, INTERVAL 1 HOUR)")).alias("bk"),
    )
    j = cal.join(b, ["event_type", "bk"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("bk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "event_type",
        F.date_format("bk", "yyyy-MM-dd HH:00").alias("bucket_hour"),
        F.coalesce("n", F.lit(0)).alias("n"),
        "sum_value",
        F.last("sum_value", ignorenulls=True).over(w).alias("locf_value"),
        F.col("sum_value").isNull().alias("is_gap"),
    )


def profile_table(
    df,
    columns: list[str] | None = None,
    distinct: str = "approx",
) -> "DataFrame":
    """One-pass per-column data profile — the table-inspection primitive
    every warehouse UI needs: row count, null count, distinct count,
    and min/max per column, one OUTPUT ROW per column.

    ``distinct="approx"`` (default) uses HyperLogLog
    (approx_count_distinct) so the whole profile is ONE map-side-
    combined aggregation pass regardless of column count — the 100 TB
    path. ``distinct="exact"`` uses count(DISTINCT) for every column,
    which Spark executes via an Expand of the input (one replica per
    distinct aggregate): exact answers, input x n_columns rows through
    the shuffle — fine for sampled profiling, documented cost at scale.

    min/max come back in TWO typed column pairs so the output schema is
    uniform without lossy string formatting: ``min_num/max_num`` (double;
    numerics directly, timestamps as epoch seconds, dates as days since
    1970-01-01, 6dp) and ``min_str/max_str`` (string columns verbatim).
    Complex-typed columns profile counts only.
    """
    from pyspark.sql.types import (
        BooleanType,
        DateType,
        NumericType,
        StringType,
        TimestampType,
    )

    if distinct not in ("approx", "exact"):
        raise ValueError(f"distinct must be approx|exact, got {distinct!r}")
    cols = columns or df.columns
    aggs = []
    for c in cols:
        dt = df.schema[c].dataType
        aggs.append(F.count(F.lit(1)).alias(f"{c}__n"))
        aggs.append(F.count(F.col(c)).alias(f"{c}__nn"))
        if distinct == "exact":
            aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__nd"))
        else:
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"{c}__nd"))
        if isinstance(dt, (NumericType, BooleanType, TimestampType, DateType)):
            if isinstance(dt, DateType):
                # DATE cannot cast to DOUBLE directly; profile as days
                # since the epoch (unix_date), mirroring the
                # epoch-seconds convention used for timestamps.
                num = F.unix_date(F.col(c)).cast("double")
            else:
                num = F.col(c).cast("double")
            aggs.append(F.round(F.min(num), 6).alias(f"{c}__mnn"))
            aggs.append(F.round(F.max(num), 6).alias(f"{c}__mxn"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__mnn"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__mxn"))
        if isinstance(dt, StringType):
            aggs.append(F.min(F.col(c)).alias(f"{c}__mns"))
            aggs.append(F.max(F.col(c)).alias(f"{c}__mxs"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"{c}__mns"))
            aggs.append(F.lit(None).cast("string").alias(f"{c}__mxs"))
    one = df.agg(*aggs)  # 1 row x 7C columns; the stack below is trivial
    stack = ", ".join(
        f"'{c}', `{c}__n`, `{c}__nn`, `{c}__nd`, `{c}__mnn`, `{c}__mxn`, "
        f"`{c}__mns`, `{c}__mxs`"
        for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack}) AS "
        "(column, n, n_notnull, n_distinct, min_num, max_num, min_str, max_str)"
    ).selectExpr(
        "column",
        "n",
        "n - n_notnull AS n_null",
        "n_distinct",
        "min_num",
        "max_num",
        "min_str",
        "max_str",
    )


def mad_outliers(
    df,
    group_col: str,
    value_col: str,
    k: float = 3.5,
) -> "DataFrame":
    """Robust per-group outlier detection via median/MAD (Iglewicz &
    Hoaglin 1993, public): modified z-score
    ``0.6745 * (x - median) / MAD`` with ``|z| > k`` flagging — the
    robust companion to the mean/stddev z-score (which a single extreme
    value can mask by inflating its own stddev).

    Returns the flagged rows with group stats and the modified z-score
    (6dp). Groups with MAD = 0 (over half the group identical) flag
    nothing — division would be undefined and the convention matches
    the reference formula.

    Plan: two keyed aggregations (median, then MAD over the residuals —
    exact ``percentile``, sort-based within groups) and one join-back of
    group-level stats; the fact rows shuffle only on the group key, and
    the stats frames are group-cardinality-sized.
    """
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("_med")
    )
    with_med = df.join(med, group_col)
    mad = (
        with_med.groupBy(group_col)
        .agg(
            F.expr(f"percentile(abs({value_col} - _med), 0.5)").alias("_mad")
        )
    )
    scored = (
        with_med.join(mad, group_col)
        .filter(F.col("_mad") > 0)
        .withColumn(
            "robust_z",
            F.round(
                F.lit(0.6745)
                * (F.col(value_col) - F.col("_med"))
                / F.col("_mad"),
                6,
            ),
        )
        .filter(F.abs(F.col("robust_z")) > k)
    )
    return scored.select(
        *df.columns,
        F.round("_med", 6).alias("group_median"),
        F.round("_mad", 6).alias("group_mad"),
        "robust_z",
    )


def check_rules(df, rules: dict) -> "DataFrame":
    """Data-quality rule audit — the declarative constraint checker every
    warehouse ingest needs (the check-suite pattern popularized by Deequ,
    public): each rule is a boolean Column that must hold for every row;
    the result is ONE row per rule with violation counts.

    A row where the rule evaluates NULL counts as a VIOLATION (a
    constraint that cannot be proven true is not satisfied — the
    conservative reading, and the one that catches unexpected NULLs).

    Output: (rule, n_rows, n_violations, violation_rate 6dp).

    Plan: all rules evaluate in ONE map-side-combined aggregation pass
    over the table (codegen conditionals, no UDFs, no Expand — unlike
    exact-distinct profiling, rule checking needs no per-rule input
    replica); the stack() unpivot runs on the single 1-row result.
    """
    if not rules:
        raise ValueError("rules must be a non-empty dict of name -> Column")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, cond in rules.items():
        aggs.append(
            F.sum(F.when(cond, 0).otherwise(1)).alias(f"{name}__v")
        )
    one = df.agg(*aggs)
    stack = ", ".join(f"'{name}', `{name}__v`" for name in rules)
    return one.selectExpr(
        "__n", f"stack({len(rules)}, {stack}) AS (rule, n_violations)"
    ).select(
        "rule",
        F.col("__n").alias("n_rows"),
        "n_violations",
        F.round(F.col("n_violations") / F.col("__n"), 6).alias(
            "violation_rate"
        ),
    )


def embedding_drift(
    old: "DataFrame",
    new: "DataFrame",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> "DataFrame":
    """Per-group centroid drift between two embedding snapshots — the
    model/data-drift monitor for an embedding pipeline: when a new
    embedding model version (or a new data slice) moves a class's
    centroid, retrieval quality shifts before any eval catches it.

    Output per label present in BOTH snapshots: ``(label, n_old, n_new,
    centroid_cosine, l2_shift)`` — cosine of the two centroids (0 when
    either is the zero vector) and the euclidean distance between them,
    both 6dp.

    Plan: each side reduces to a (label x dim)-sized centroid frame
    (posexplode + avg — map-side combined; at corpus scale the same
    reduction runs as an Arrow partial-sum per partition), the two tiny
    frames join on (label, pos), and one more label-keyed agg folds the
    dim axis into dot/norm/shift scalars. No row-level join anywhere.
    """
    def cent(df, tag):
        pos = df.select(
            F.col(label_col).alias("label"),
            F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                "pos", "v"
            ),
        )
        return pos.groupBy("label", "pos").agg(
            F.avg("v").alias(f"c_{tag}"),
            F.count(F.lit(1)).alias(f"n_{tag}"),
        )

    j = cent(old, "old").join(cent(new, "new"), ["label", "pos"])
    per = j.groupBy("label").agg(
        F.max("n_old").alias("n_old"),
        F.max("n_new").alias("n_new"),
        F.sum(F.col("c_old") * F.col("c_new")).alias("_dot"),
        F.sum(F.col("c_old") * F.col("c_old")).alias("_no"),
        F.sum(F.col("c_new") * F.col("c_new")).alias("_nn"),
        F.sum(
            (F.col("c_old") - F.col("c_new"))
            * (F.col("c_old") - F.col("c_new"))
        ).alias("_sq"),
    )
    cos = F.when(
        (F.col("_no") > 0) & (F.col("_nn") > 0),
        F.col("_dot") / (F.sqrt("_no") * F.sqrt("_nn")),
    ).otherwise(F.lit(0.0))
    return per.select(
        "label",
        "n_old",
        "n_new",
        F.round(cos, 6).alias("centroid_cosine"),
        F.round(F.sqrt("_sq"), 6).alias("l2_shift"),
    )


def sketch_rollup(
    df: "DataFrame",
    group_cols: list[str],
    distinct_col: str,
    lg_k: int = 12,
) -> "DataFrame":
    """Pre-aggregated distinct-count SKETCH table (Apache DataSketches
    HLL via Spark's built-ins) — the mergeable-state pattern that makes
    "distinct users per arbitrary date range" an O(ranges) metadata
    query at 100 TB instead of a full re-scan: store one sketch per
    fine-grained group; any coarser rollup is a sketch UNION, never a
    re-read of the raw data (sketches are commutative/associative —
    exactly what partial aggregation needs; count(DISTINCT) is not
    mergeable and re-scans every time).

    Output: group_cols + ``sketch`` (binary) + ``estimate`` (the
    group's own approx distinct, for direct use).
    """
    agg = df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(distinct_col), F.lit(lg_k)).alias("sketch")
    )
    return agg.withColumn(
        "estimate", F.hll_sketch_estimate("sketch").cast("long")
    )


def sketch_union_estimate(
    rollup: "DataFrame",
    group_cols: list[str],
) -> "DataFrame":
    """Merge a sketch-rollup table up to coarser ``group_cols`` (subset
    of the rollup's grain, possibly empty for a grand total): one
    map-side-combinable sketch-union agg over the SKETCH column — the
    raw table is never touched. Returns group_cols + ``estimate``."""
    if group_cols:
        agg = rollup.groupBy(*group_cols)
    else:
        agg = rollup.groupBy()
    return agg.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).cast("long").alias(
            "estimate"
        )
    )


def psi_drift(
    old: "DataFrame",
    new: "DataFrame",
    value_col: str,
    n_buckets: int = 10,
    eps: float = 1e-6,
) -> "DataFrame":
    """Population Stability Index between two snapshots of a numeric
    column (the standard distribution-drift monitor, public:
    PSI = sum over buckets of (p_new - p_old) * ln(p_new / p_old);
    rule-of-thumb <0.1 stable, 0.1-0.25 shifting, >0.25 drifted) — the
    scalar companion to embedding_drift for text statistics (lengths,
    quality scores, token counts).

    Buckets are the OLD side's exact quantile edges (percentile, so
    both engines interpolate identically); each side's proportions come
    from one map-side-combined bucketed count; ``eps`` floors empty
    buckets so the log stays finite (the standard smoothing). Output:
    one row per bucket (bucket, lo, hi, p_old 6dp, p_new 6dp,
    contrib 6dp) plus the total as bucket = -1 — so the drifted
    REGION is visible, not just the scalar.

    Plan: one percentile agg over old (bucket-count-sized result,
    broadcast as literals), one bucketed count per side, one tiny join.
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    edges_row = old.agg(
        F.expr(
            f"percentile({value_col}, array({', '.join(str(q) for q in qs)}))"
        ).alias("e")
    ).first()
    if edges_row["e"] is None:
        raise ValueError(
            "psi_drift: the OLD snapshot has no non-null values — no "
            "bucket edges to compare against"
        )
    edges = [float(x) for x in edges_row["e"]]
    return _psi_table(
        old.sparkSession,
        edges,
        _psi_props(psi_bucket_counts(old, value_col, edges), "p_old"),
        _psi_props(psi_bucket_counts(new, value_col, edges), "p_new"),
        n_buckets,
        eps,
    )


def psi_bucket_counts(
    df: "DataFrame", value_col: str, edges: list[float]
) -> "DataFrame":
    """PSI's binning step alone — (bucket, _n) counts against FIXED
    edges, one map-side-combined agg. Shared by :func:`psi_drift`
    (edges from the old snapshot) and the streaming PSI monitor
    (frozen reference edges, counts are LINEAR so per-batch partitions
    sum). Bucket = number of edges strictly below the value; NULLs
    land in bucket 0 (the psi_drift contract)."""
    b = F.lit(0)
    for i, e in enumerate(edges):
        b = F.when(F.col(value_col) > F.lit(e), F.lit(i + 1)).otherwise(b)
    return (
        df.select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("_n"))
    )


def _psi_props(counts: "DataFrame", name: str) -> "DataFrame":
    """Bucket counts -> proportions; broadcast 1-row total instead of
    an unpartitioned window — same bounded math, no WindowExec
    single-partition warning."""
    total = counts.agg(F.sum("_n").alias("_t"))
    return counts.crossJoin(F.broadcast(total)).select(
        "bucket", (F.col("_n") / F.col("_t")).alias(name)
    )


def _psi_table(
    spark,
    edges: list[float],
    p_old_df: "DataFrame",
    p_new_df: "DataFrame",
    n_buckets: int,
    eps: float,
) -> "DataFrame":
    """PSI detail + total from two proportion frames (shared tail of
    psi_drift and the streaming monitor's totals read)."""
    base = spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    j = (
        base.join(p_old_df, "bucket", "left")
        .join(p_new_df, "bucket", "left")
        .na.fill({"p_old": 0.0, "p_new": 0.0})
    )
    po = F.greatest(F.col("p_old"), F.lit(eps))
    pn = F.greatest(F.col("p_new"), F.lit(eps))
    contrib = (pn - po) * F.log(pn / po)
    lo = F.when(F.col("bucket") == 0, F.lit(None).cast("double")).otherwise(
        F.element_at(F.lit(edges), F.col("bucket"))
    )
    hi = F.when(
        F.col("bucket") == n_buckets - 1, F.lit(None).cast("double")
    ).otherwise(F.element_at(F.lit(edges), F.col("bucket") + 1))
    detail = j.select(
        "bucket",
        F.round(lo, 6).alias("lo"),
        F.round(hi, 6).alias("hi"),
        F.round("p_old", 6).alias("p_old"),
        F.round("p_new", 6).alias("p_new"),
        F.round(contrib, 6).alias("contrib"),
    )
    total = j.agg(
        F.round(F.sum(contrib), 6).alias("contrib")
    ).select(
        F.lit(-1).alias("bucket"),
        F.lit(None).cast("double").alias("lo"),
        F.lit(None).cast("double").alias("hi"),
        F.lit(None).cast("double").alias("p_old"),
        F.lit(None).cast("double").alias("p_new"),
        "contrib",
    )
    return detail.unionByName(total)


def psi_reference(
    df: "DataFrame", value_col: str, n_buckets: int = 10
) -> dict:
    """Freeze a PSI baseline from a reference snapshot: exact-quantile
    ``edges`` plus integer per-bucket ``counts`` (and their total) —
    the driver-sized contract the streaming PSI monitor carries so
    every micro-batch bins against the SAME frozen reference the
    alerts are defined on. Integer counts (not proportions) so the
    totals read rebuilds p_old with the identical division psi_drift
    performs."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    edges_row = df.agg(
        F.expr(
            f"percentile({value_col}, array({', '.join(str(q) for q in qs)}))"
        ).alias("e")
    ).first()
    if edges_row is None or edges_row["e"] is None:
        raise ValueError(
            "psi_reference: no non-null values in the reference snapshot"
        )
    edges = [float(x) for x in edges_row["e"]]
    counts = {
        int(r["bucket"]): int(r["_n"])
        for r in psi_bucket_counts(df, value_col, edges).collect()
    }
    return {
        "edges": edges,
        "counts": [counts.get(i, 0) for i in range(n_buckets)],
        "n_buckets": n_buckets,
    }


def quantile_sketch_rollup(
    df: "DataFrame",
    group_cols: list[str],
    value_col: str,
    id_col: str,
    k: int = 256,
) -> "DataFrame":
    """Pre-aggregated QUANTILE sketch table — the quantile companion to
    :func:`sketch_rollup`'s HLL distinct sketches: store a bounded
    per-fine-group sample; any coarser quantile estimate merges samples
    instead of re-reading the raw table.

    The sketch is a deterministic bottom-k row sample: every row gets
    rank = md5("qs|" + id) (a uniform permutation proxy — same trick as
    the MinHash signatures), and each fine group keeps the k
    smallest-rank (rank, value) pairs. Bottom-k is EXACTLY mergeable
    over disjoint groups — bottom_k(A ∪ B) == bottom_k(bottom_k(A) ∪
    bottom_k(B)), because each of the union's k smallest ranks is
    necessarily within its own group's k smallest — so a coarser-grain
    estimate from merged sketches equals the estimate computed directly
    from the raw table with the same k. That makes the rollup path
    oracle-checkable: the gate's DuckDB oracle computes the DIRECT
    bottom-k per coarse group while Spark goes through the fine-grained
    sketch table, and the hash match attests the merge property itself.

    Error: the sample is a uniform k-subset per group, so an estimated
    q-quantile sits at true rank q ± O(sqrt(q(1-q)/k)) — ~3% rank error
    at k=256, constant regardless of group size (3-sigma bound pinned
    in tests against exact percentiles).

    Plan: one keyed exchange (the per-group row_number window) whose
    HashPartitioning the follow-up collect_list agg reuses — the
    collected state is capped at k rows per group BEFORE the agg by the
    window filter, so no unbounded collect_list state anywhere. NULL
    values are excluded (a NULL carries no quantile information).

    Output: group_cols + ``sample`` array<struct<rank,value>> sorted by
    rank + ``n_sampled``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    rank = F.md5(
        F.concat_ws("|", F.lit("qs"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(*group_cols).orderBy("rank")
    kept = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *group_cols,
            rank.alias("rank"),
            F.col(value_col).cast("double").alias("value"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    return kept.groupBy(*group_cols).agg(
        F.array_sort(
            F.collect_list(F.struct("rank", "value"))
        ).alias("sample"),
        F.count(F.lit(1)).alias("n_sampled"),
    )


def quantile_union_estimate(
    rollup: "DataFrame",
    group_cols: list[str],
    qs: tuple = (0.5, 0.95, 0.99),
    k: int = 256,
) -> "DataFrame":
    """Merge a quantile-sketch table up to coarser ``group_cols``
    (subset of the rollup's grain, possibly empty for a grand total)
    and estimate quantiles: explode the bounded samples, keep the k
    smallest ranks per coarse group (the bottom-k merge), exact
    interpolated percentile over the survivors. The raw table is never
    touched — the exploded frame is at most k x n_fine_groups rows, so
    even the grand-total single-partition window is sketch-sized, not
    data-sized.

    ``k`` must equal the rollup's k for the direct-equality contract
    (a smaller k still yields a valid coarser sketch — bottom-k of a
    bottom-k — just a different one than direct-at-k).

    Output: group_cols + one ``q<NN>`` column per requested quantile,
    rounded to 6dp.
    """
    ex = rollup.select(
        *group_cols, F.explode("sample").alias("s")
    ).select(*group_cols, F.col("s.rank").alias("rank"),
             F.col("s.value").alias("value"))
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy("rank")
        grouped = lambda d: d.groupBy(*group_cols)  # noqa: E731
    else:
        w = Window.partitionBy(F.lit(1)).orderBy("rank")
        grouped = lambda d: d.groupBy()  # noqa: E731
    kept = ex.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    aggs = [
        F.round(
            F.expr(f"percentile(value, {q!r})"), 6
        ).alias(f"q{int(round(q * 100)):02d}")
        for q in qs
    ]
    return grouped(kept).agg(*aggs)


def skew_report(
    df: "DataFrame",
    key_cols: list[str],
    top_n: int = 10,
) -> "DataFrame":
    """Shuffle-key skew diagnostic — the pre-flight check before keying
    a 100 TB join or aggregation on ``key_cols``: per-key row counts
    for the ``top_n`` heaviest keys, each annotated with the global
    skew metrics that decide whether the key needs salting or AQE skew
    handling (n_keys, mean/max key size, max/mean ratio, coefficient of
    variation, and the share of all rows owned by the single hottest
    key).

    Plan: one map-side-combined count per key, one scalar-stats agg
    over the (n_keys)-row count frame (broadcast back as a single row),
    TakeOrderedAndProject for the top-n. Nothing is ever data-sized
    after the first agg.

    Output: key_cols + cnt + share + rank + n_keys + mean_cnt +
    max_cnt + skew_ratio (max/mean) + cv (stddev_pop/mean), rounded to
    6dp; ordered by rank.
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("cnt"))
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
        F.avg("cnt").alias("mean_cnt"),
        F.max("cnt").alias("max_cnt"),
        F.stddev_pop("cnt").alias("sd_cnt"),
    )
    order = [F.col("cnt").desc()] + [F.col(c).asc() for c in key_cols]
    # top-n via sort+limit (TakeOrderedAndProject — distributed partial
    # top-k, never a single-partition sort of the n_keys-sized count
    # frame); the rank window then runs over the <= top_n-row result, a
    # bounded single partition by construction
    topk = counts.orderBy(*order).limit(top_n).withColumn(
        "rank", F.row_number().over(Window.orderBy(*order))
    )
    return topk.crossJoin(F.broadcast(stats)).select(
        *key_cols,
        "cnt",
        F.round(F.col("cnt") / F.col("total_rows"), 6).alias("share"),
        "rank",
        "n_keys",
        F.round("mean_cnt", 6).alias("mean_cnt"),
        "max_cnt",
        F.round(F.col("max_cnt") / F.col("mean_cnt"), 6).alias("skew_ratio"),
        F.round(F.col("sd_cnt") / F.col("mean_cnt"), 6).alias("cv"),
    )


def transition_matrix(
    df: "DataFrame",
    seq_col: str,
    order_col: str,
    state_col: str,
) -> "DataFrame":
    """First-order Markov transition statistics over per-sequence event
    streams (user behavior modeling / synthetic-sequence QA: does the
    generated data's transition structure match production's?): for
    each (from_state, to_state) pair, the transition count and the
    row-conditional probability P(to | from).

    Plan: ONE keyed exchange on the sequence id (the lag window), then
    a map-side-combined pair count; the probability normalization joins
    the (from_state)-level totals back — a states^2-sized frame, never
    data-sized. Deterministic: ties in ``order_col`` break by
    ``state_col`` so concurrent events yield a stable order.

    Output: (from_state, to_state, cnt, prob 6dp), one row per observed
    pair.
    """
    w = Window.partitionBy(seq_col).orderBy(
        F.col(order_col).asc(), F.col("to_state").asc()
    )
    pairs = (
        df.select(
            F.col(seq_col),
            F.col(order_col),
            F.col(state_col).alias("to_state"),
        )
        .withColumn("from_state", F.lag("to_state").over(w))
        .filter(F.col("from_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = pairs.groupBy("from_state").agg(F.sum("cnt").alias("_tot"))
    return pairs.join(F.broadcast(totals), "from_state").select(
        "from_state",
        "to_state",
        "cnt",
        F.round(F.col("cnt") / F.col("_tot"), 6).alias("prob"),
    )


def quantile_sketch_merge(
    a: "DataFrame",
    b: "DataFrame",
    group_cols: list[str],
    k: int = 256,
) -> "DataFrame":
    """Merge two quantile-sketch tables grain-wise — the incremental
    maintenance path: a new batch's sketch table (over only the batch)
    merges into the persisted state without ever re-reading the old
    corpus, the same contract as bm25_refresh / exact_dedup_incremental
    / ivf_append. Because the bottom-k sample is exactly associative,
    merged state == the sketch built from scratch over old ∪ new,
    IDENTICALLY (pinned in tests and attested by the gate oracle, which
    computes the direct bottom-k over the union).

    Groups present on only one side pass through (their bottom-k is
    already correct). The exploded union is sketch-sized (<= 2k rows
    per group), never data-sized.

    The merge is also IDEMPOTENT under row replay: a rank is
    md5-derived from the source row's id, so a replayed batch
    contributes byte-identical (rank, value) rows, which the
    per-(group, rank) dedup below collapses before the bottom-k window
    — without it, duplicate copies of a surviving rank would displace
    genuinely distinct ranks from the k smallest and corrupt the
    sample (pinned by the streaming replay test).

    Output schema matches :func:`quantile_sketch_rollup`.
    """
    cols = [*group_cols, F.explode("sample").alias("s")]
    ex = (
        a.select(*cols)
        .unionByName(b.select(*cols))
        .select(
            *group_cols,
            F.col("s.rank").alias("rank"),
            F.col("s.value").alias("value"),
        )
        # Deterministic per-(group, rank) collapse: min(value), not
        # dropDuplicates (which keeps an ARBITRARY row). For exact
        # replays the values are byte-identical so this is the same
        # row; if an id reappears with an UPDATED value the merge still
        # picks one deterministically — min — so merge order and
        # partitioning can never change the sketch.
        .groupBy(*group_cols, "rank")
        .agg(F.min("value").alias("value"))
    )
    w = Window.partitionBy(*group_cols).orderBy("rank")
    kept = ex.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    return kept.groupBy(*group_cols).agg(
        F.array_sort(
            F.collect_list(F.struct("rank", "value"))
        ).alias("sample"),
        F.count(F.lit(1)).alias("n_sampled"),
    )


def join_explosion_report(
    a: "DataFrame",
    b: "DataFrame",
    key_cols: list[str],
    top_n: int = 10,
) -> "DataFrame":
    """Join-output pre-flight — estimate an equi-join's output size and
    find the keys that would explode it BEFORE running the join (the
    companion to :func:`skew_report` for two-sided fan-out: a key with
    1k rows on each side emits 1M rows; at 100 TB this is the
    difference between a plan that finishes and one that fills every
    disk). Exact arithmetic, never runs the join: per-key counts on
    each side (two map-combined aggs), inner-join of the two KEY-level
    frames (key-cardinality-sized, not row-sized), out_rows = cnt_a *
    cnt_b per key, global total broadcast back.

    Output: top_n keys by out_rows — key_cols + cnt_a + cnt_b +
    out_rows + share (of the estimated join output) + rank +
    est_total_rows + n_join_keys; ordered by rank.
    """
    ca = a.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("cnt_a"))
    cb = b.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("cnt_b"))
    per_key = ca.join(cb, list(key_cols)).withColumn(
        "out_rows", F.col("cnt_a") * F.col("cnt_b")
    )
    stats = per_key.agg(
        F.sum("out_rows").alias("est_total_rows"),
        F.count(F.lit(1)).alias("n_join_keys"),
    )
    order = [F.col("out_rows").desc()] + [F.col(c).asc() for c in key_cols]
    topk = per_key.orderBy(*order).limit(top_n).withColumn(
        "rank", F.row_number().over(Window.orderBy(*order))
    )
    return topk.crossJoin(F.broadcast(stats)).select(
        *key_cols,
        "cnt_a",
        "cnt_b",
        "out_rows",
        F.round(F.col("out_rows") / F.col("est_total_rows"), 6).alias(
            "share"
        ),
        "rank",
        "est_total_rows",
        "n_join_keys",
    )


def sketch_rollup_merge(
    a: "DataFrame",
    b: "DataFrame",
    group_cols: list[str],
) -> "DataFrame":
    """Merge two HLL sketch-rollup tables grain-wise — incremental
    maintenance for :func:`sketch_rollup`, completing the incremental
    family (exact dedup, MinHash, BM25, IVF/PQ/SQ8, quantile sketches,
    now distinct sketches): a new batch is sketched alone and unioned
    into the persisted state; the old corpus is never re-read. HLL
    registers are element-wise maxima, so union is associative,
    commutative AND idempotent — merged state estimates equal the
    from-scratch rebuild's exactly, and replayed batches are no-ops
    (pinned in tests).

    Output schema matches :func:`sketch_rollup`.
    """
    cols = [*group_cols, "sketch"]
    agg = (
        a.select(*cols)
        .unionByName(b.select(*cols))
        .groupBy(*group_cols)
        .agg(F.hll_union_agg("sketch").alias("sketch"))
    )
    return agg.withColumn(
        "estimate", F.hll_sketch_estimate("sketch").cast("long")
    )


def theta_sketch_build(
    df: "DataFrame",
    group_cols: list[str],
    key_col: str,
    k: int = 4096,
) -> "DataFrame":
    """Per-group KMV/theta distinct sketch — the SET-ALGEBRA member of
    the sketch family. HLL (:func:`sketch_rollup`) unions but cannot
    intersect; a theta sketch (Dasgupta et al., the DataSketches Theta
    framework) supports union AND intersection/difference estimates
    ("how many distinct users did A and B share?") from bounded state,
    because it keeps the actual smallest hash values rather than
    register maxima.

    The sketch is the k smallest DISTINCT md5-derived hash points of
    the group's keys, mapped to doubles in [0, 1) (first 15 hex chars
    / 16^15 — deterministic and portable, the same md5-permutation
    trick as the MinHash/quantile sketches). ``theta`` is 1.0 while
    the group holds fewer than k distinct keys — the EXACT regime,
    where every estimate (including intersections) is an exact
    distinct count, which is what makes the gate query
    oracle-checkable against plain COUNT(DISTINCT) SQL — and the k-th
    smallest hash once saturated, where estimates carry the standard
    ~1/sqrt(k) relative error (deterministic per corpus: the "noise"
    is fixed by md5, pinned in tests).

    Plan: one distinct-hash agg + one per-group bottom-k window (the
    keyed exchange); output is sketch-sized — group_cols + ``sample``
    (sorted array<double>, <= k), ``theta``, ``n_retained``,
    ``est`` (exact count or (k-1)/theta, rounded 2dp).
    """
    if k < 2:
        raise ValueError(f"theta_sketch_build: k must be >= 2, got {k}")
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.lit("th"), F.col(key_col).cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("double")
        / float(16**15)
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    kept = (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, h.alias("h"))
        .distinct()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    agg = kept.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list("h")).alias("sample"),
        F.count(F.lit(1)).alias("n_retained"),
    )
    theta = F.when(
        F.col("n_retained") < k, F.lit(1.0)
    ).otherwise(F.element_at("sample", -1))
    return agg.withColumn("theta", theta).withColumn(
        "est",
        F.round(
            F.when(
                F.col("theta") < 1.0,
                (F.col("n_retained") - 1) / F.col("theta"),
            ).otherwise(F.col("n_retained").cast("double")),
            2,
        ),
    )


def theta_sketch_union(
    sketches: "DataFrame",
    group_cols: list[str],
    k: int = 4096,
) -> "DataFrame":
    """Merge a theta-sketch table up to coarser ``group_cols`` (subset
    of the build grain, possibly empty for a grand total) — same rollup
    discipline as :func:`quantile_union_estimate`: theta' = min of the
    member thetas, survivors = distinct hashes < theta', bottom-k of
    the survivors with the saturation rule re-applied. The raw table is
    never touched; every frame here is sketch-sized.

    Output schema matches :func:`theta_sketch_build`. For disjoint
    member groups below saturation the union is EXACT, so coarser
    estimates equal direct builds — the oracle-checkable contract.
    """
    ex = sketches.select(
        *group_cols,
        F.col("theta").alias("_t"),
        F.explode("sample").alias("h"),
    )
    if group_cols:
        tmin = ex.groupBy(*group_cols).agg(F.min("_t").alias("_tmin"))
        ex = ex.join(tmin, group_cols)
        w = Window.partitionBy(*group_cols).orderBy("h")
        grouped = ex.filter(F.col("h") < F.col("_tmin"))
    else:
        tmin = ex.agg(F.min("_t").alias("_tmin"))
        ex = ex.crossJoin(F.broadcast(tmin))
        w = Window.partitionBy(F.lit(1)).orderBy("h")
        grouped = ex.filter(F.col("h") < F.col("_tmin"))
    kept = (
        grouped.select(*group_cols, "h", "_tmin")
        .distinct()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
    )
    agg = kept.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list("h")).alias("sample"),
        F.count(F.lit(1)).alias("n_retained"),
        F.min("_tmin").alias("_tmin"),
    )
    theta = F.when(F.col("n_retained") < k, F.col("_tmin")).otherwise(
        F.element_at("sample", -1)
    )
    return (
        agg.withColumn("theta", theta)
        .withColumn(
            "est",
            F.round(
                F.when(
                    F.col("theta") < 1.0,
                    F.when(
                        F.col("n_retained") == k,
                        (F.col("n_retained") - 1) / F.col("theta"),
                    ).otherwise(F.col("n_retained") / F.col("theta")),
                ).otherwise(F.col("n_retained").cast("double")),
                2,
            ),
        )
        .drop("_tmin")
    )


def theta_sketch_merge(
    a: "DataFrame",
    b: "DataFrame",
    group_cols: list[str],
    k: int = 4096,
) -> "DataFrame":
    """Merge two theta-sketch tables grain-wise — incremental
    maintenance for :func:`theta_sketch_build` (the same role
    :func:`sketch_rollup_merge` plays for HLL and
    :func:`quantile_sketch_merge` for quantiles): a new batch is
    sketched alone and unioned into the persisted state; the old
    corpus is never re-read. Hash points are VALUES (the union
    dedups them), so the merge is associative, commutative AND
    idempotent — replayed batches are exact no-ops, which is what
    lets the streaming monitor skip batch bookkeeping.

    Output schema matches :func:`theta_sketch_build`.
    """
    cols = [*group_cols, "sample", "theta", "n_retained", "est"]
    return theta_sketch_union(
        a.select(*cols).unionByName(b.select(*cols)), group_cols, k=k
    )


def theta_sketch_intersect(
    a: "DataFrame",
    b: "DataFrame",
    on: list[str] | None = None,
) -> "DataFrame":
    """Intersection/difference estimates between two theta-sketch
    frames — the query HLL fundamentally cannot answer. theta =
    min(theta_a, theta_b); below that cut BOTH samples are complete,
    so membership tests are exact over the retained points:
    est_common = |A ∩ B ∩ [0, theta)| / theta, est_a_only /
    est_b_only likewise (A∖B, B∖A). In the exact regime (both thetas
    1.0) all three are exact distinct counts.

    ``on`` joins the frames on shared group keys (the old-vs-new
    snapshot-per-segment shape); ``on=None`` cross-pairs every group
    of ``a`` with every group of ``b`` (the pairwise-overlap shape —
    rename the group columns apart first). Either way both sides are
    sketch-sized, so even the cross join is sketch² frame work,
    nothing data-sized. Output: the non-sketch columns of both sides
    + est_common, est_a_only, est_b_only, theta (estimates 2dp).
    """

    def prep(df, s, t):
        return (
            df.withColumnRenamed("sample", s)
            .withColumnRenamed("theta", t)
            .drop("n_retained", "est")
        )

    aa = prep(a, "_sa", "_ta")
    bb = prep(b, "_sb", "_tb")
    j = aa.join(bb, on) if on else aa.crossJoin(bb)
    theta = F.least("_ta", "_tb")
    cut = lambda c: F.filter(c, lambda x: x < theta)  # noqa: E731
    n_common = F.size(F.array_intersect(cut("_sa"), cut("_sb")))
    n_a = F.size(F.array_except(cut("_sa"), cut("_sb")))
    n_b = F.size(F.array_except(cut("_sb"), cut("_sa")))
    est = lambda n: F.round(n / theta, 2)  # noqa: E731
    keep = [c for c in j.columns if c not in ("_sa", "_ta", "_sb", "_tb")]
    return j.select(
        *keep,
        est(n_common).alias("est_common"),
        est(n_a).alias("est_a_only"),
        est(n_b).alias("est_b_only"),
        theta.alias("theta"),
    )


def ks_drift(
    old: "DataFrame",
    new: "DataFrame",
    value_col: str,
    n_buckets: int = 32,
) -> "DataFrame":
    """EXACT two-sample Kolmogorov-Smirnov statistic between snapshots
    — the nonparametric companion to :func:`psi_drift` (PSI needs a
    bucket count choice; KS is the sup of |CDF_old - CDF_new| over the
    actual data and detects any distributional change, with the
    classical null quantiles available for thresholding).

    The scalable part is the global cumulative sum the CDFs need:
    NEVER a single-partition window over the data. The per-value count
    frame (distinct values x 2 counts — the only data-sized frame) is
    range-bucketed by driver-literal quantile edges, cumsummed with a
    window over each bucket shard (parallel, bounded), and the
    per-bucket totals (n_buckets rows) are offset-cumsummed and
    broadcast back — the same two-level pattern as
    curation.token_budget_mix. The sup and its location come from one
    max(struct) aggregate.

    Output: one row — ks_stat (6dp), at_value (the smallest value
    achieving the sup), n_old, n_new.
    """
    def side(df, name):
        return (
            df.select(F.col(value_col).cast("double").alias("v"))
            .filter(F.col("v").isNotNull())
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias(name))
        )

    counts = (
        side(old, "c_old")
        .join(side(new, "c_new"), "v", "full_outer")
        .na.fill({"c_old": 0, "c_new": 0})
    )
    tot = counts.agg(
        F.sum("c_old").alias("n_old"), F.sum("c_new").alias("n_new")
    ).first()
    n_old, n_new = int(tot["n_old"] or 0), int(tot["n_new"] or 0)
    if n_old == 0 or n_new == 0:
        raise ValueError("ks_drift: both snapshots need non-null values")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    edges_row = counts.agg(
        F.expr(
            f"percentile(v, array({', '.join(str(q) for q in qs)}))"
        ).alias("e")
    ).first()
    edges = sorted({float(x) for x in edges_row["e"]})
    b = F.lit(0)
    for i, e in enumerate(edges):
        b = F.when(F.col("v") > F.lit(e), F.lit(i + 1)).otherwise(b)
    bucketed = counts.withColumn("bucket", b)
    w = Window.partitionBy("bucket").orderBy("v")
    cum = bucketed.select(
        "bucket", "v",
        F.sum("c_old").over(w).alias("cum_old"),
        F.sum("c_new").over(w).alias("cum_new"),
    )
    btot = bucketed.groupBy("bucket").agg(
        F.sum("c_old").alias("bo"), F.sum("c_new").alias("bn")
    )
    bw = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )  # single-partition window over <= n_buckets rows — bounded
    offsets = btot.select(
        "bucket",
        F.coalesce(F.sum("bo").over(bw), F.lit(0)).alias("off_old"),
        F.coalesce(F.sum("bn").over(bw), F.lit(0)).alias("off_new"),
    )
    diff = (
        (F.col("off_old") + F.col("cum_old")) / F.lit(float(n_old))
        - (F.col("off_new") + F.col("cum_new")) / F.lit(float(n_new))
    )
    best = cum.join(F.broadcast(offsets), "bucket").select(
        F.abs(diff).alias("d"), "v"
    ).agg(
        F.max(F.struct(F.col("d"), (-F.col("v")).alias("nv"))).alias("m")
    )
    return best.select(
        F.round(F.col("m.d"), 6).alias("ks_stat"),
        (-F.col("m.nv")).alias("at_value"),
        F.lit(n_old).alias("n_old"),
        F.lit(n_new).alias("n_new"),
    )


def cm_sketch_build(
    df: "DataFrame",
    key_col: str,
    width: int = 1024,
    depth: int = 4,
) -> "DataFrame":
    """Count-Min sketch of key frequencies (Cormode & Muthukrishnan
    2005, public) — the bounded-memory approximate count table for
    UNBOUNDED key domains: depth x width counters regardless of
    cardinality, estimates never undercount, overcount bounded by
    n/width per row with high probability. The linear-sketch
    counterpart of the HLL rollup (counts instead of distincts).

    Hashing is the repo's portable md5 scheme (functions/hashing), so
    a DuckDB oracle reproduces every counter exactly. The d-way fan-out
    happens BEFORE a map-side-combined count, so the exchange carries
    at most depth x width rows per map task, never data-sized.

    Output: (j, bucket, cnt, width, depth) — the counter table,
    <= depth*width rows. width/depth ride along as constant columns so
    estimate/merge can VALIDATE the hash contract instead of silently
    remapping probe buckets against a table built with different
    parameters (which can return estimates BELOW the true count,
    breaking the never-undercount guarantee).
    """
    from indexlab_spark.functions.hashing import md5_long

    rows = df.select(F.col(key_col).cast("string").alias("k")).select(
        "k",
        F.explode(
            F.array(*[F.lit(i) for i in range(depth)])
        ).alias("j"),
    )
    bucket = F.pmod(
        md5_long(
            F.concat_ws("|", F.lit("cm"), F.col("j").cast("string"),
                        F.col("k"))
        ),
        F.lit(width),
    )
    return (
        rows.withColumn("bucket", bucket)
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("width", F.lit(int(width)))
        .withColumn("depth", F.lit(int(depth)))
    )


def _cm_params(cm: "DataFrame", what: str) -> tuple[int, int]:
    """Read the (width, depth) contract off a Count-Min table; raise if
    the table is inconsistent (a union of incompatible sketches) or
    predates the carried-params schema."""
    if "width" not in cm.columns or "depth" not in cm.columns:
        raise ValueError(
            f"{what}: sketch table lacks width/depth columns — rebuild "
            "with cm_sketch_build (params are carried in the table)"
        )
    rows = cm.select("width", "depth").distinct().collect()
    if len(rows) != 1:
        raise ValueError(
            f"{what}: sketch table mixes incompatible (width, depth) "
            f"contracts: {sorted((r[0], r[1]) for r in rows)}"
        )
    return int(rows[0][0]), int(rows[0][1])


def cm_sketch_merge(a: "DataFrame", b: "DataFrame") -> "DataFrame":
    """Merge two Count-Min tables (same width/depth/hash contract):
    counters ADD — CM is a linear sketch, so merged state equals the
    sketch of the concatenated data EXACTLY (not just approximately;
    pinned in tests). The incremental-maintenance path for streaming
    frequency state. Both sides must carry the SAME (width, depth) —
    adding counters from differently-shaped tables would silently
    corrupt every estimate, so a mismatch raises."""
    wa, da = _cm_params(a, "cm_sketch_merge (left)")
    wb, db = _cm_params(b, "cm_sketch_merge (right)")
    if (wa, da) != (wb, db):
        raise ValueError(
            "cm_sketch_merge: incompatible sketches — left is "
            f"{wa}x{da}, right is {wb}x{db}"
        )
    return (
        a.select("j", "bucket", "cnt")
        .unionByName(b.select("j", "bucket", "cnt"))
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn("width", F.lit(wa))
        .withColumn("depth", F.lit(da))
    )


def cm_sketch_estimate(
    cm: "DataFrame",
    keys_df: "DataFrame",
    key_col: str,
    width: int | None = None,
    depth: int | None = None,
) -> "DataFrame":
    """Point-estimate key frequencies from a Count-Min table: for each
    key, min over the depth rows of its counters (absent counter = 0).
    The counter table (<= depth*width rows) broadcasts; the keys frame
    never shuffles beyond its own dedup.

    width/depth are read OFF the sketch table (cm_sketch_build carries
    them); passing them explicitly only asserts they match — probing
    with mismatched parameters used to silently remap buckets and
    could return estimates BELOW the true count.

    Output: (key, est) — est >= true count always; est - true bounded
    by the sketch's collision mass.
    """
    from indexlab_spark.functions.hashing import md5_long

    tw, td = _cm_params(cm, "cm_sketch_estimate")
    if (width is not None and width != tw) or (
        depth is not None and depth != td
    ):
        raise ValueError(
            f"cm_sketch_estimate: sketch table is {tw}x{td} but caller "
            f"asked for {width}x{depth}"
        )
    width, depth = tw, td
    keys = keys_df.select(
        F.col(key_col).cast("string").alias("key")
    ).distinct()
    probes = keys.select(
        "key",
        F.explode(
            F.array(*[F.lit(i) for i in range(depth)])
        ).alias("j"),
    ).withColumn(
        "bucket",
        F.pmod(
            md5_long(
                F.concat_ws("|", F.lit("cm"), F.col("j").cast("string"),
                            F.col("key"))
            ),
            F.lit(width),
        ),
    )
    joined = probes.join(F.broadcast(cm), ["j", "bucket"], "left").na.fill(
        {"cnt": 0}
    )
    return joined.groupBy("key").agg(F.min("cnt").alias("est"))


def segment_trend(
    df: "DataFrame",
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> "DataFrame":
    """Per-segment ordinary-least-squares trend — slope, intercept, R^2
    and n for every group in ONE map-side-combined aggregation (the
    regr_* aggregates are sum-of-moments state, so the exchange carries
    one moment tuple per group, never rows). The monitoring question
    this answers at 100 TB: which segments are trending up/down, and
    how well does a line explain them — without ever fitting per-group
    models driver-side.

    Groups with zero x-variance return NULL slope/intercept/r2 (the
    SQL-standard regr_* behavior in both engines).
    """
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    return df.groupBy(*group_cols).agg(
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.regr_count(y, x).alias("n"),
    )


def sketch_overlap(
    rollup_a: "DataFrame",
    rollup_b: "DataFrame",
    group_cols: list[str],
) -> "DataFrame":
    """Estimate per-group set OVERLAP between two HLL sketch-rollup
    tables (audience/corpus intersection without re-reading either
    side): inclusion-exclusion over mergeable sketches —
    |A ∩ B| ≈ |A| + |B| - |A ∪ B|, with the union estimated by
    hll_union of the stored sketches. Everything is sketch-frame-sized.

    Inclusion-exclusion compounds the HLL error of three estimates, so
    the intersection estimate is clamped at 0 and should be read with
    ~3x the single-sketch relative error (bounds pinned in tests).
    Output: group_cols + est_a, est_b, est_union, est_intersection,
    jaccard_est (6dp).
    """
    a = rollup_a.select(
        *group_cols,
        F.col("sketch").alias("sk_a"),
        F.col("estimate").alias("est_a"),
    )
    b = rollup_b.select(
        *group_cols,
        F.col("sketch").alias("sk_b"),
        F.col("estimate").alias("est_b"),
    )
    j = a.join(b, list(group_cols))
    union_est = F.hll_sketch_estimate(
        F.hll_union("sk_a", "sk_b")
    ).cast("long")
    out = j.select(
        *group_cols,
        "est_a",
        "est_b",
        union_est.alias("est_union"),
    ).withColumn(
        "est_intersection",
        F.greatest(
            F.lit(0).cast("long"),
            F.col("est_a") + F.col("est_b") - F.col("est_union"),
        ),
    )
    return out.withColumn(
        "jaccard_est",
        F.round(
            F.when(
                F.col("est_union") > 0,
                F.col("est_intersection") / F.col("est_union"),
            ).otherwise(F.lit(0.0)),
            6,
        ),
    )


def rfm_segments(
    orders: "DataFrame",
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    n_tiles: int = 5,
) -> "DataFrame":
    """RFM (recency / frequency / monetary) customer segmentation — the
    classic warehouse scoring, shaped for scale: scores come from exact
    PERCENTILE EDGES over the per-customer frame, NOT ntile(), because
    a global ntile is a single-partition sort of every customer. Here:
    one keyed agg to the per-customer (recency_days, frequency,
    monetary) frame, one 3x(n_tiles-1)-scalar percentile agg whose
    edges come back as driver literals, then a map-only bucket compare.
    Ties land in the lower bucket on both engines (score = 1 + count of
    edges strictly below the value), so the assignment is deterministic
    and oracle-checkable, unlike ntile's position-dependent splits.

    Scores are 1..n_tiles, higher = better (more recent / more
    frequent / more spend). Output: cust + recency_days + frequency +
    monetary + r_score + f_score + m_score + rfm (the concatenated
    segment label).
    """
    per_cust = orders.groupBy(F.col(cust_col).alias("cust")).agg(
        F.max(F.col(date_col).cast("date")).alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col(amount_col).cast("double")).alias("monetary"),
    )
    anchor = per_cust.agg(F.max("last_order").alias("a")).first()["a"]
    if anchor is None:
        raise ValueError("rfm_segments: no orders")
    per_cust = per_cust.withColumn(
        "recency_days",
        F.datediff(F.lit(anchor).cast("date"), F.col("last_order")),
    )
    qs = [i / n_tiles for i in range(1, n_tiles)]
    qlist = ", ".join(str(q) for q in qs)
    edges_row = per_cust.agg(
        F.expr(f"percentile(-recency_days, array({qlist}))").alias("r"),
        F.expr(f"percentile(frequency, array({qlist}))").alias("f"),
        F.expr(f"percentile(monetary, array({qlist}))").alias("m"),
    ).first()

    def score(col, edges):
        s = F.lit(1)
        for e in edges:
            s = s + F.when(col > F.lit(float(e)), 1).otherwise(0)
        return s

    out = per_cust.select(
        "cust",
        "recency_days",
        "frequency",
        F.round("monetary", 2).alias("monetary"),
        score(-F.col("recency_days"), edges_row["r"]).alias("r_score"),
        score(F.col("frequency"), edges_row["f"]).alias("f_score"),
        score(F.col("monetary"), edges_row["m"]).alias("m_score"),
    )
    return out.withColumn(
        "rfm",
        F.concat_ws("", "r_score", "f_score", "m_score"),
    )


def window_funnel(
    df: "DataFrame",
    seq_col: str,
    ts_col: str,
    state_col: str,
    steps: list[str],
    window_seconds: int,
) -> "DataFrame":
    """ClickHouse-style ``windowFunnel``: per sequence (user), the
    deepest funnel level k such that there EXISTS a strictly
    time-increasing chain steps[0] < steps[1] < ... < steps[k-1] whose
    last event falls within ``window_seconds`` of its FIRST (the
    anchor). This is the time-bounded variant of the repo's
    events_funnel (which has no window constraint) — "did the user
    view -> click -> purchase within an hour", not just "eventually".

    Exact semantics via a per-sequence O(n * k) scan (Arrow
    applyInPandas, events sorted per user): dynamic programming where
    A[i] holds the MAXIMUM anchor timestamp over all valid chains
    reaching step i — maximizing the anchor is optimal because it
    maximizes remaining window slack, so reachability under the DP
    equals chain-existence (pinned against a brute-force
    enumerate-all-chains reference, including equal-timestamp batches,
    which update from the pre-batch state so a chain can never use two
    events at the same instant). The per-user payload is that user's
    step events only — the naive alternative, a k-way self-join, fans
    out combinatorially on active users, which is why ClickHouse also
    runs the scan.

    Output: (seq_col, level) — one row per sequence that has at least
    one step event; level in [1, len(steps)].
    """
    import pandas as pd

    if not steps:
        raise ValueError("window_funnel: steps must be non-empty")
    step_ix = {s: i for i, s in enumerate(steps)}
    k = len(steps)
    # integer MICROseconds throughout: int64 nanos (~1.7e18) exceed
    # float64's 2^53 exact range, and a lossy cast could flip a
    # window-boundary or equal-timestamp compare vs the SQL oracle
    w = int(window_seconds) * 1_000_000

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for key, g in pdf.groupby("_seq", sort=False):
            ts = (
                pd.to_datetime(g["_ts"]).astype("int64").to_numpy() // 1000
            )
            ix = g["_ix"].to_numpy()
            order = ts.argsort(kind="mergesort")
            ts, ix = ts[order], ix[order]
            best = [None] * k  # A[i]: max anchor reaching step i+1
            i = 0
            n = len(ts)
            while i < n:
                j = i
                while j < n and ts[j] == ts[i]:
                    j += 1
                prev = list(best)  # ties update from pre-batch state
                for e in range(i, j):
                    s = int(ix[e])
                    t = ts[e]
                    if s == 0:
                        if best[0] is None or t > best[0]:
                            best[0] = t
                    elif prev[s - 1] is not None and t - prev[s - 1] <= w:
                        a = prev[s - 1]
                        if best[s] is None or a > best[s]:
                            best[s] = a
                i = j
            level = 0
            for i2 in range(k):
                if best[i2] is not None:
                    level = i2 + 1
            if level:
                out.append((key, level))
        return pd.DataFrame(out, columns=["seq", "level"]) if out else (
            pd.DataFrame({"seq": pd.Series([], dtype=object),
                          "level": pd.Series([], dtype="int32")})
        )

    ev = (
        df.filter(F.col(state_col).isin(*steps))
        .select(
            F.col(seq_col).alias("_seq"),
            F.col(ts_col).alias("_ts"),
            F.coalesce(
                *[
                    F.when(F.col(state_col) == s, F.lit(i))
                    for s, i in step_ix.items()
                ]
            ).alias("_ix"),
        )
    )
    # output key type follows the input sequence column (a hardcoded
    # long would break string/other sequence ids)
    seq_type = df.schema[seq_col].dataType.simpleString()
    return ev.groupBy("_seq").applyInPandas(
        fn, schema=f"seq {seq_type}, level int"
    ).withColumnRenamed("seq", seq_col)


def cusum_changepoints(
    df: "DataFrame",
    group_cols: list[str],
    order_col: str,
    value_col: str,
    k_sigmas: float = 0.5,
    h_sigmas: float = 4.0,
) -> "DataFrame":
    """Tabular CUSUM changepoint detection per segment (Page 1954,
    public — the standard drift-ONSET monitor: PSI/KS say "the
    distributions differ", CUSUM says "it started HERE"): per group,
    the one-sided cumulative sums
    S+_t = max(0, S+_{t-1} + (x_t - mean - k)) and
    S-_t = max(0, S-_{t-1} - (x_t - mean + k)) with k = k_sigmas * sd,
    flagging points where either exceeds h = h_sigmas * sd. mean/sd are
    the group's own (the self-baselined retrospective form).

    The max(0, ...) recurrence is a running-reset fold that plain
    window sums cannot express; it runs as an Arrow per-group pass
    (applyInPandas) over the group's ORDERED series — appropriate
    because the input is a pre-aggregated series (daily revenue,
    hourly counts): rows per group = time buckets, bounded by calendar,
    not by raw data volume. Group stats ride along from one
    map-combined agg; ties on ``order_col`` break by value then
    position for determinism.

    Output: group_cols + order_col + value + cusum_pos + cusum_neg
    (6dp) + flag (boolean), every input row.
    """
    import pandas as pd

    stats = df.groupBy(*group_cols).agg(
        F.avg(F.col(value_col)).alias("_mu"),
        F.coalesce(F.stddev_pop(F.col(value_col)), F.lit(0.0)).alias("_sd"),
    )
    joined = df.join(F.broadcast(stats), list(group_cols)).select(
        *group_cols,
        F.col(order_col).alias("_ord"),
        F.col(value_col).cast("double").alias("_val"),
        "_mu",
        "_sd",
    )
    out_fields = ", ".join(
        f"`{c}` {dict(df.dtypes)[c]}" for c in group_cols
    )
    ord_type = dict(df.dtypes)[order_col]

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_ord", "_val"], kind="mergesort")
        mu = float(pdf["_mu"].iloc[0])
        sd = float(pdf["_sd"].iloc[0])
        kk = k_sigmas * sd
        h = h_sigmas * sd
        sp = sn = 0.0
        pos, neg, flag = [], [], []
        for x in pdf["_val"]:
            sp = max(0.0, sp + (x - mu - kk))
            sn = max(0.0, sn - (x - mu) - kk)
            pos.append(round(sp, 6))
            neg.append(round(sn, 6))
            flag.append(bool(sd > 0 and (sp > h or sn > h)))
        res = pdf[[*group_cols, "_ord", "_val"]].copy()
        res["cusum_pos"] = pos
        res["cusum_neg"] = neg
        res["flag"] = flag
        return res

    return (
        joined.groupBy(*group_cols)
        .applyInPandas(
            fn,
            schema=(
                f"{out_fields}, `_ord` {ord_type}, `_val` double, "
                "cusum_pos double, cusum_neg double, flag boolean"
            ),
        )
        .withColumnRenamed("_ord", order_col)
        .withColumnRenamed("_val", value_col)
    )


def transition_paths(
    df: "DataFrame",
    seq_col: str,
    order_col: str,
    state_col: str,
    depth: int = 3,
) -> "DataFrame":
    """Consecutive state PATHS of length ``depth`` per sequence — the
    higher-order companion to :func:`transition_matrix` (order-1 pairs
    miss structure like a->b->a ping-pong vs a->b->c progression; path
    mining over user journeys is the standard product-analytics view).

    ONE keyed exchange (the per-sequence window; all ``depth - 1`` lags
    share it), then a map-side-combined count over observed paths —
    output is bounded by distinct state^depth combinations actually
    seen, never row count. Ties on ``order_col`` break by state for
    run-to-run determinism. Output: s1..s<depth> + cnt + share (of all
    complete paths, 6dp).
    """
    if depth < 2:
        raise ValueError(f"transition_paths: depth must be >= 2, got {depth}")
    w = Window.partitionBy(seq_col).orderBy(
        F.col(order_col).asc(), F.col("_s").asc()
    )
    base = df.select(
        F.col(seq_col),
        F.col(order_col),
        F.col(state_col).alias("_s"),
    )
    cols = {f"s{depth}": F.col("_s")}
    for i in range(depth - 1, 0, -1):
        cols[f"s{i}"] = F.lag("_s", depth - i).over(w)
    lagged = base.select(
        *[cols[f"s{i}"].alias(f"s{i}") for i in range(1, depth + 1)]
    ).filter(F.col("s1").isNotNull())
    counts = lagged.groupBy(
        *[f"s{i}" for i in range(1, depth + 1)]
    ).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("_t"))
    return counts.crossJoin(F.broadcast(total)).select(
        *[f"s{i}" for i in range(1, depth + 1)],
        "cnt",
        F.round(F.col("cnt") / F.col("_t"), 6).alias("share"),
    )


def ab_test_report(
    df: "DataFrame",
    variant_col: str,
    metric_col: str,
    conv_col: str,
    variant_a: str = "a",
    variant_b: str = "b",
    z_crit: float = 1.96,
) -> "DataFrame":
    """Two-arm experiment readout over a PER-UNIT frame (one row per
    user/session — aggregate to units first; testing raw events
    violates the independence assumption): Welch's unequal-variance
    t-test on the metric and the two-proportion pooled z-test on the
    conversion flag, the two numbers every A/B dashboard starts with.

    Reported as TEST STATISTICS plus fixed-threshold significance
    flags (|stat| > ``z_crit``, the normal-approximation cut both
    engines can evaluate exactly) rather than p-values — neither Spark
    SQL nor the oracle has erf, and at experiment sample sizes the
    normal approximation to Welch's t is the standard dashboard
    treatment anyway.

    ONE map-side-combined aggregation over the unit frame (filtered
    aggregates per arm — no self-join, no pivot shuffle); the single
    reduced row then gets the closed-form arithmetic as a codegen
    projection. At 100 TB of units this is a corpus scan plus a
    one-row exchange.

    Output (one row, 6dp): n_a, n_b, mean_a, mean_b, t_stat, t_df
    (Welch-Satterthwaite), t_sig, conv_a, conv_b, z_stat, z_sig.
    Degenerate arms (n < 2 or zero variance on both sides / pooled
    rate 0 or 1) yield NULL statistics and false flags.

    NULL contract (single denominator per arm): a unit row with a NULL
    ``metric_col`` is dropped from BOTH tests — it contributes to
    neither n/mean/var nor the conversion numerator/denominator — so
    ``n_a``/``n_b`` are the one sample size both statistics share. A
    NULL ``conv_col`` on a kept row counts as not-converted.
    """
    v = F.col(variant_col)
    x = F.col(metric_col).cast("double")
    c = F.col(conv_col).cast("double")
    # The NULL contract above: null-metric units leave both tests, so
    # the z-test denominator is exactly the t-test's n per arm.
    df = df.filter(F.col(metric_col).isNotNull())

    def arm(val, expr, agg):
        return agg(F.when(v == F.lit(val), expr))

    agg = df.agg(
        arm(variant_a, x, F.count).alias("n_a"),
        arm(variant_b, x, F.count).alias("n_b"),
        arm(variant_a, x, F.avg).alias("mean_a"),
        arm(variant_b, x, F.avg).alias("mean_b"),
        arm(variant_a, x, F.var_samp).alias("var_a"),
        arm(variant_b, x, F.var_samp).alias("var_b"),
        arm(variant_a, c, F.sum).alias("k_a"),
        arm(variant_b, c, F.sum).alias("k_b"),
    )
    se2 = F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")
    t_stat = (F.col("mean_a") - F.col("mean_b")) / F.sqrt(se2)
    t_df = (se2 * se2) / (
        (F.col("var_a") / F.col("n_a")) * (F.col("var_a") / F.col("n_a"))
        / (F.col("n_a") - 1)
        + (F.col("var_b") / F.col("n_b")) * (F.col("var_b") / F.col("n_b"))
        / (F.col("n_b") - 1)
    )
    p_a = F.col("k_a") / F.col("n_a")
    p_b = F.col("k_b") / F.col("n_b")
    p_pool = (F.col("k_a") + F.col("k_b")) / (F.col("n_a") + F.col("n_b"))
    z_den = F.sqrt(
        p_pool * (1 - p_pool) * (1 / F.col("n_a") + 1 / F.col("n_b"))
    )
    z_stat = F.when(z_den > 0, (p_a - p_b) / z_den)
    ok_t = (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se2 > 0)
    return agg.select(
        "n_a",
        "n_b",
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round(F.when(ok_t, t_stat), 6).alias("t_stat"),
        F.round(F.when(ok_t, t_df), 6).alias("t_df"),
        F.coalesce(
            F.when(ok_t, F.abs(t_stat) > F.lit(z_crit)), F.lit(False)
        ).alias("t_sig"),
        F.round(p_a, 6).alias("conv_a"),
        F.round(p_b, 6).alias("conv_b"),
        F.round(z_stat, 6).alias("z_stat"),
        F.coalesce(F.abs(z_stat) > F.lit(z_crit), F.lit(False)).alias(
            "z_sig"
        ),
    )


def association_rules(
    df: "DataFrame",
    basket_col: str,
    item_col: str,
    min_support: float = 0.01,
    min_pair_support: float | None = None,
) -> "DataFrame":
    """Market-basket association rules — frequent item PAIRS with
    support / confidence / lift (the Agrawal-Srikant Apriori level-2
    pass, which is where the warehouse value lives: "customers who
    bought brand A also bought brand B"). Items below ``min_support``
    are pruned BEFORE pairing (the Apriori monotonicity cut:
    an infrequent item cannot appear in a frequent pair), pairs below
    ``min_pair_support`` (defaults to ``min_support``) are dropped
    after counting.

    Output, one row per unordered frequent pair (item_a < item_b):
    ``n_ab``, ``support`` (n_ab / n_baskets), ``conf_a_to_b`` (n_ab /
    n_a), ``conf_b_to_a``, ``lift`` (support / (supp_a * supp_b)),
    all 6dp.

    Plan: distinct (basket, item) — one keyed exchange — then item
    counts (map-combined agg; frequent set broadcast back via a
    semi-joinable frame), then the self-join ON BASKET restricted to
    frequent items: the only quadratic is per-basket over FREQUENT
    items, bounded by basket width × frequency cut, never corpus². The
    basket total rides a broadcast one-row frame — no driver scalars.
    At 100 TB: hot baskets are the skew risk; the frequent-item
    restriction caps the per-basket width the join squares, and the
    basket key distributes the pair counting.
    """
    if not (0.0 < min_support <= 1.0):
        raise ValueError(
            f"association_rules: min_support in (0, 1], got {min_support}"
        )
    mps = min_support if min_pair_support is None else min_pair_support
    bi = (
        df.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .filter(F.col("item").isNotNull())
        .distinct()
        # the basket-item frame feeds the basket total, the item
        # counts and BOTH sides of the pair self-join — without a
        # checkpoint every consumer re-derives it through the
        # caller's (often join-built) lineage; the r10 scan audit
        # measured 14 source scans on the co-purchase gate (the
        # assortativity multi-consumer lesson)
        .localCheckpoint(eager=False)
    )
    totals = bi.agg(
        F.countDistinct("basket").alias("n_baskets")
    ).localCheckpoint(eager=False)
    item_counts = bi.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    freq = (
        item_counts.crossJoin(F.broadcast(totals))
        .filter(F.col("n_item") >= F.col("n_baskets") * F.lit(min_support))
        .select("item", "n_item")
        .localCheckpoint(eager=False)
    )
    kept = bi.join(freq, "item")
    a = kept.select("basket", F.col("item").alias("item_a"),
                    F.col("n_item").alias("n_a"))
    b = kept.select("basket", F.col("item").alias("item_b"),
                    F.col("n_item").alias("n_b"))
    pairs = (
        a.join(b, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(
            F.count(F.lit(1)).alias("n_ab"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
    )
    x = pairs.crossJoin(F.broadcast(totals)).filter(
        F.col("n_ab") >= F.col("n_baskets") * F.lit(mps)
    )
    supp = F.col("n_ab") / F.col("n_baskets")
    lift = (
        supp
        / (
            (F.col("n_a") / F.col("n_baskets"))
            * (F.col("n_b") / F.col("n_baskets"))
        )
    )
    return x.select(
        "item_a",
        "item_b",
        "n_ab",
        F.round(supp, 6).alias("support"),
        F.round(F.col("n_ab") / F.col("n_a"), 6).alias("conf_a_to_b"),
        F.round(F.col("n_ab") / F.col("n_b"), 6).alias("conf_b_to_a"),
        F.round(lift, 6).alias("lift"),
    )


def multi_touch_attribution(
    df: "DataFrame",
    user_col: str,
    ts_col: str,
    type_col: str,
    conversion_type: str,
    touch_types: list[str] | None = None,
    window_seconds: int = 3600,
    model: str = "linear",
    half_life_seconds: int = 600,
) -> "DataFrame":
    """Multi-touch conversion attribution — split each conversion's
    credit across the touchpoints that preceded it within
    ``window_seconds`` (the marketing-analytics companion to
    window_funnel/conversion_lag: not "did they convert" but "which
    channel gets the credit"). Models: ``linear`` (1/n to each touch),
    ``first_touch`` / ``last_touch`` (winner takes 1; deterministic
    (ts, event id) tie-break), ``position`` (40% first, 40% last, 20%
    split over the middles; 1.0 / 0.5-0.5 for 1- and 2-touch paths),
    ``time_decay`` (weight 2^(-age/half_life_seconds) from raw
    microsecond ages, normalized per conversion — recency earns
    credit on a continuous clock instead of by rank; credit still
    conserves at exactly 1 per credited conversion).

    Output, one row per touch type: ``touch_type``, ``credit`` (sum of
    weights over conversions, 6dp), ``touches`` (touch rows used),
    ``conversions`` (distinct conversions the type got credit for).

    Plan: ONE user-keyed join (conversions × touches, fan-out bounded
    by the time window), per-conversion weights via a conv-keyed
    window (second keyed exchange, conversion-sized), map-combined
    final agg. At 100 TB the user key distributes both sides and the
    window bound keeps the per-user pairing linear in events per
    window, never per-history quadratic.
    """
    if model not in (
        "linear", "first_touch", "last_touch", "position", "time_decay"
    ):
        raise ValueError(f"multi_touch_attribution: unknown model {model!r}")
    if model == "time_decay" and half_life_seconds <= 0:
        raise ValueError(
            "multi_touch_attribution: half_life_seconds must be > 0, "
            f"got {half_life_seconds}"
        )
    t = F.col(type_col)
    conv = df.filter(t == conversion_type).select(
        F.col(user_col).alias("_u"),
        F.monotonically_increasing_id().alias("_cid"),
        F.col(ts_col).alias("_cts"),
    )
    touch = df.filter(
        t.isin(list(touch_types)) if touch_types is not None
        else t != conversion_type
    ).select(
        F.col(user_col).alias("_u"),
        t.alias("touch_type"),
        F.col(ts_col).alias("_tts"),
    )
    j = conv.join(touch, "_u").filter(
        (F.col("_tts") < F.col("_cts"))
        & (
            F.col("_tts")
            >= F.col("_cts") - F.expr(f"INTERVAL {int(window_seconds)} SECOND")
        )
    )
    wspec = Window.partitionBy("_cid")
    order = [F.col("_tts").asc(), F.col("touch_type").asc()]
    rn = F.row_number().over(wspec.orderBy(*order))
    n = F.count(F.lit(1)).over(wspec)
    if model == "linear":
        w = F.lit(1.0) / n
    elif model == "first_touch":
        w = F.when(rn == 1, F.lit(1.0)).otherwise(F.lit(0.0))
    elif model == "last_touch":
        w = F.when(rn == n, F.lit(1.0)).otherwise(F.lit(0.0))
    elif model == "position":  # U-shaped
        w = (
            F.when(n == 1, F.lit(1.0))
            .when(n == 2, F.lit(0.5))
            .otherwise(
                F.when((rn == 1) | (rn == n), F.lit(0.4)).otherwise(
                    F.lit(0.2) / (n - 2)
                )
            )
        )
    else:  # time_decay: 2^(-age/half_life), normalized per conversion
        age_s = (
            F.unix_micros(F.col("_cts")) - F.unix_micros(F.col("_tts"))
        ).cast("double") / F.lit(1_000_000.0)
        raw = F.pow(F.lit(0.5), age_s / F.lit(float(half_life_seconds)))
        w = raw / F.sum(raw).over(wspec)
    weighted = j.withColumn("_w", w)
    return (
        weighted.groupBy("touch_type")
        .agg(
            F.round(F.sum("_w"), 6).alias("credit"),
            F.count(F.lit(1)).alias("touches"),
            F.countDistinct(
                F.when(F.col("_w") > 0, F.col("_cid"))
            ).alias("conversions"),
        )
        .orderBy("touch_type")
    )


def seasonal_anomalies(
    series: "DataFrame",
    ts_col: str,
    value_col: str,
    z_thresh: float = 2.5,
) -> "DataFrame":
    """Seasonal-profile anomaly detection over a PRE-AGGREGATED time
    series (same pre-aggregated-series-only discipline as
    psi_drift/cusum: roll raw events to buckets first) — the
    calendar-aware companion to the plain z-score monitor: each
    observation is scored against the mean/std of ITS (day-of-week,
    hour) slot across the series' weeks, so "Monday 9am is always
    busy" stops being an anomaly and "THIS Monday 9am is 3 sigma off
    every other Monday 9am" starts.

    Simple in-sample profile (each point contributes to its own
    baseline — the standard dashboard treatment; at >= 4 weeks of data
    the self-contribution bias is small). Slots with fewer than 2
    observations or zero variance yield NULL z and a false flag.

    Plan: one map-combined agg to the 7 x 24 slot profile (tiny),
    broadcast back onto the series, codegen z — the series is scanned
    twice and nothing row-sized shuffles.

    Output: the input rows + ``dow`` (0=Sunday), ``hour``,
    ``expected``, ``z`` (6dp), ``anomaly``.
    """
    ts = F.col(ts_col)
    dow = (F.dayofweek(ts) - 1).alias("dow")
    hour = F.hour(ts).alias("hour")
    base = series.select(
        ts.alias("_ts"),
        F.col(value_col).cast("double").alias("_v"),
        dow,
        hour,
    )
    prof = base.groupBy("dow", "hour").agg(
        F.avg("_v").alias("_mean"),
        F.stddev_samp("_v").alias("_std"),
        F.count(F.lit(1)).alias("_n"),
    )
    j = base.join(F.broadcast(prof), ["dow", "hour"])
    ok = (F.col("_n") >= 2) & (F.col("_std") > 0)
    z = F.when(ok, (F.col("_v") - F.col("_mean")) / F.col("_std"))
    return j.select(
        F.col("_ts").alias(ts_col),
        F.col("_v").alias(value_col),
        "dow",
        "hour",
        F.round("_mean", 6).alias("expected"),
        F.round(z, 6).alias("z"),
        F.coalesce(F.abs(z) >= F.lit(z_thresh), F.lit(False)).alias(
            "anomaly"
        ),
    )


def survival_curve(
    df: "DataFrame",
    duration_col: str,
    event_col: str,
    group_cols: list[str] | None = None,
) -> "DataFrame":
    """Kaplan-Meier survival estimator over right-censored durations —
    the time-to-event summary (signup→conversion, install→churn) that
    a plain average of durations gets WRONG whenever observation
    windows truncate: censored subjects (``event_col`` = 0) leave the
    risk set at their duration without counting as events, exactly the
    KM product-limit treatment (Kaplan & Meier 1958).

    Input: one row per subject — ``duration_col`` (time observed) and
    ``event_col`` (1 = event occurred at that time, 0 = censored
    there). Optional ``group_cols`` produce one curve per group.

    Output, one row per distinct duration (per group): ``t``,
    ``n_risk`` (subjects with duration >= t), ``d`` (events at t),
    ``censored`` (censorings at t), ``survival`` = Π_{t_i <= t}
    (1 - d_i/n_i), 6dp; exactly 0 from the first time the risk set is
    wiped out.

    Plan: one keyed agg to the distinct-duration grain (the only
    data-sized exchange), then cumulative windows over that
    curve-sized frame: cumulative removals give n_risk, the product
    runs as exp(Σ ln) with NULLIF guarding the wipe-out row and a
    cumulative dead-flag pinning survival to zero after it. Nothing
    row-sized shuffles twice; the per-group window frame is
    curve-sized, not subject-sized.
    """
    g = list(group_cols or [])
    ev = F.col(event_col).cast("double")
    agg = df.groupBy(
        *g, F.col(duration_col).alias("t")
    ).agg(
        F.sum(ev).cast("bigint").alias("d"),
        F.sum(1 - ev).cast("bigint").alias("censored"),
    )
    if g:
        w_all = Window.partitionBy(*g)
        w_cum = Window.partitionBy(*g).orderBy("t")
    else:
        w_all = Window.partitionBy(F.lit(1))
        w_cum = Window.partitionBy(F.lit(1)).orderBy("t")
    removed = F.col("d") + F.col("censored")
    total = F.sum(removed).over(w_all)
    before = F.coalesce(
        F.sum(removed).over(
            w_cum.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    n_risk = (total - before).cast("bigint")
    x = agg.withColumn("n_risk", n_risk)
    lnterm = F.log(
        F.nullif(
            F.lit(1.0) - F.col("d") / F.col("n_risk"), F.lit(0.0)
        )
    )
    cum_ln = F.sum(lnterm).over(w_cum)
    dead = F.max(
        F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
    ).over(w_cum)
    surv = F.when(dead == 1, F.lit(0.0)).otherwise(
        F.round(F.exp(F.coalesce(cum_ln, F.lit(0.0))), 6)
    )
    return x.select(
        *g, "t", "n_risk", "d", "censored", surv.alias("survival")
    )


def holt_forecast(
    df: "DataFrame",
    group_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 7,
) -> "DataFrame":
    """Holt linear-trend forecast per segment (double exponential
    smoothing, Holt 1957, public) — the forward-looking member of the
    timeseries family: seasonal_anomalies profiles the calendar shape,
    cusum_changepoints locates the level shift, and this extrapolates
    the level + trend ``horizon`` steps ahead.

    Per group, over the ORDERED series x_1..x_n (classic init:
    l_1 = x_1, b_1 = x_2 - x_1, or 0 when n == 1):

        l_t = alpha * x_t + (1 - alpha) * (l_{t-1} + b_{t-1})
        b_t = beta * (l_t - l_{t-1}) + (1 - beta) * b_{t-1}

    with the one-step-ahead fit yhat_t = l_{t-1} + b_{t-1} and
    h-step forecast l_n + h * b_n.

    The coupled (l, b) recurrence is a linear fold no window sum can
    express; like ``cusum_changepoints`` it runs as ONE Arrow
    per-group pass (applyInPandas) — appropriate because the input is
    a pre-aggregated series (daily revenue, hourly counts) whose
    per-group length is calendar-bounded, not data-volume-bounded.
    One keyed exchange total; output is horizon-sized per group, never
    series-sized. Ties on ``order_col`` break by value then position
    (mergesort), the CUSUM determinism discipline.

    Output: one row per group per step h in 1..horizon —
    group_cols + h + forecast + level + trend + n_obs + sse (sum of
    squared one-step-ahead errors over t >= 2; model-fit quality),
    all doubles rounded 6dp.
    """
    import pandas as pd

    base = df.select(
        *group_cols,
        F.col(order_col).alias("_ord"),
        F.col(value_col).cast("double").alias("_val"),
    )
    out_fields = ", ".join(
        f"`{c}` {dict(df.dtypes)[c]}" for c in group_cols
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_ord", "_val"], kind="mergesort")
        xs = [float(v) for v in pdf["_val"]]
        n = len(xs)
        lvl = xs[0]
        trd = (xs[1] - xs[0]) if n > 1 else 0.0
        sse = 0.0
        for x in xs[1:]:
            yhat = lvl + trd
            err = x - yhat
            sse += err * err
            lvl_new = alpha * x + (1 - alpha) * (lvl + trd)
            trd = beta * (lvl_new - lvl) + (1 - beta) * trd
            lvl = lvl_new
        rows = []
        head = [pdf[c].iloc[0] for c in group_cols]
        for h in range(1, horizon + 1):
            rows.append(
                head
                + [
                    h,
                    round(lvl + h * trd, 6),
                    round(lvl, 6),
                    round(trd, 6),
                    n,
                    round(sse, 6),
                ]
            )
        return pd.DataFrame(
            rows,
            columns=[*group_cols, "h", "forecast", "level", "trend",
                     "n_obs", "sse"],
        )

    return base.groupBy(*group_cols).applyInPandas(
        fn,
        schema=(
            f"{out_fields}, h int, forecast double, level double, "
            "trend double, n_obs bigint, sse double"
        ),
    )


def acf(
    df: "DataFrame",
    group_cols: list[str],
    order_col: str,
    value_col: str,
    max_lag: int = 7,
) -> "DataFrame":
    """Per-segment autocorrelation function (Box & Jenkins): r_k for
    lags 1..max_lag of an ORDERED, PRE-AGGREGATED series — the
    seasonality/memory diagnostic that tells you WHICH lag structure a
    forecast (holt_forecast) or anomaly profile (seasonal_anomalies)
    should model. r_k = sum_{t>k}(x_t - mean)(x_{t-k} - mean) /
    sum_t (x_t - mean)^2 — the standard biased estimator (numerator
    over n-k terms, denominator over all n), so r_0 = 1 and
    |r_k| <= 1.

    Distributed shape: ONE exchange on the group keys serves
    everything — an unbounded window mean, one ordered window
    producing all max_lag lagged centered values in a single sort,
    then a map-side-combined agg whose per-lag numerators skip the
    first k rows for free (NULL lag products drop out of sum());
    ``posexplode`` of the per-lag array emits the long-format result.
    No self-joins, nothing per-group on the driver. The series must be
    pre-aggregated (one row per group x order value — the
    holt_forecast/cusum discipline); at 100 TB that frame is
    calendar-bounded, not corpus-bounded.

    Output: group_cols + lag, autocorr (6dp), n (series length).
    Groups with zero variance (constant series) return NULL autocorr.
    """
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    g = Window.partitionBy(*group_cols)
    w = g.orderBy(order_col)
    xc = (F.col(value_col).cast("double") - F.avg(
        F.col(value_col).cast("double")
    ).over(g)).alias("_xc")
    lagged = df.select(
        *group_cols,
        F.col(order_col),
        xc,
    ).select(
        *group_cols,
        "_xc",
        *[
            F.lag("_xc", k).over(w).alias(f"_l{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    aggd = lagged.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_xc") * F.col("_xc")).alias("_den"),
        *[
            F.sum(F.col("_xc") * F.col(f"_l{k}")).alias(f"_n{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    pairs = F.array(
        *[
            F.try_divide(F.col(f"_n{k}"), F.col("_den"))
            for k in range(1, max_lag + 1)
        ]
    )
    return aggd.select(
        *group_cols,
        "n",
        F.posexplode(pairs).alias("_pos", "_r"),
    ).select(
        *group_cols,
        (F.col("_pos") + 1).alias("lag"),
        F.round(F.col("_r"), 6).alias("autocorr"),
        "n",
    )


def theilsen_trend(
    df: "DataFrame",
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> "DataFrame":
    """Per-segment Theil-Sen robust trend (Theil 1950 / Sen 1968) —
    slope = median of all pairwise slopes, intercept = median of
    ``y - slope * x`` — the outlier-proof companion to
    :func:`segment_trend`: one corrupted day barely moves it (~29%
    breakdown point), where OLS follows the outlier.

    Distributed shape: the pairwise slope set is a self-join KEYED ON
    THE GROUP (one exchange; map-side pair generation within each
    group's partition), exact-``percentile`` median per group, then the
    group-sized slope frame broadcasts back for the intercept's second
    small agg. O(n^2) pairs per group is the algorithm's nature — the
    input must be a PRE-AGGREGATED series (the segment_trend/
    holt_forecast discipline: daily points per segment, so n is
    calendar-bounded; 365 days = 66k pairs per group, trivial; never
    feed raw events).

    Pairs with equal x are skipped (vertical slopes), matching scipy's
    theilslopes. Groups with < 2 distinct x values drop from the
    output. Output: group_cols + n, slope, intercept (6dp).
    """
    base = df.select(
        *group_cols,
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    )
    a = base
    b = base.select(
        *[F.col(c).alias(f"_b_{c}") for c in group_cols],
        F.col("_x").alias("_x2"),
        F.col("_y").alias("_y2"),
    )
    cond = F.lit(True)
    for c in group_cols:
        cond = cond & (F.col(c) == F.col(f"_b_{c}"))
    pairs = a.join(b, cond & (F.col("_x") < F.col("_x2")))
    slopes = pairs.groupBy(*group_cols).agg(
        F.expr("percentile((_y2 - _y) / (_x2 - _x), 0.5)").alias("_slope")
    )
    resid = base.join(F.broadcast(slopes), list(group_cols)).groupBy(
        *group_cols
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.first("_slope"), 6).alias("slope"),
        F.round(
            F.expr("percentile(_y - _slope * _x, 0.5)"), 6
        ).alias("intercept"),
    )
    return resid


def gini_concentration(
    df: "DataFrame",
    group_cols: list[str],
    weight_col: str,
) -> "DataFrame":
    """Per-group Gini coefficient of a weight column — HOW CONCENTRATED
    is revenue across customers, tokens across sources, traffic across
    users: 0 = perfectly even, ->1 = one entity holds everything. The
    one-number companion to skew_preflight (which names the heavy keys;
    this scores the whole distribution) and the standard diversity
    check on a training-mix (a high-Gini source mix is a deduplication
    / upsampling decision waiting to happen).

    Formula (sorted ascending, i = 1..n):
    G = 2 * sum(i * x_i) / (n * sum(x_i)) - (n + 1) / n — exact, no
    binning. Ties may be ranked in any order (equal values permute to
    the same sum), so the result is deterministic even though
    row_number over ties is not.

    Distributed shape: one group-keyed exchange; ranks from a window
    sort WITHIN each group, then a map-side-combined agg. The input
    contract is ENTITY-level weights (one row per customer/source —
    i.e. pre-aggregate raw events first), so the per-group sort is
    bounded by entity count, not event count; for a group too large to
    sort in one task, pre-aggregate entities into value buckets first
    (the histogram discipline) and accept binned Gini.

    Output: group_cols + n, total (6dp), gini (6dp). Negative weights
    are a contract violation (Gini is undefined); NULL weights are
    excluded. Single-entity groups return gini = 0. ``total`` sums the
    weight column in its ORIGINAL type — pass integer (e.g. cents) or
    decimal weights when the total must be exactly reproducible; a
    float-summed total at 1e8+ magnitude is not stable to 6dp across
    engines/partitionings (the gini ratio itself is).
    """
    w = Window.partitionBy(*group_cols).orderBy(F.col("_w"))
    base = df.filter(F.col(weight_col).isNotNull()).select(
        *group_cols,
        # total sums the ORIGINAL column (exact for decimal/integer
        # weights — a 6dp round of a cross-engine double sum at 1e8+
        # magnitude is not reproducible); doubles only in the rank
        # products, where the result is a ratio
        F.col(weight_col).alias("_worig"),
        F.col(weight_col).cast("double").alias("_w"),
    )
    ranked = base.withColumn("_i", F.row_number().over(w))
    return ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("_worig"), 6).cast("double").alias("total"),
        F.round(
            F.try_divide(
                F.lit(2.0) * F.sum(F.col("_i") * F.col("_w")),
                F.count(F.lit(1)) * F.sum("_w"),
            )
            - (F.count(F.lit(1)) + F.lit(1.0)) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


def benford_test(
    df: "DataFrame",
    value_col: str,
) -> "DataFrame":
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated-numbers / broken-ETL screen for a positive
    measure column (Benford 1938; Nigrini's audit use is the public
    standard): natural multi-magnitude data has P(d) = log10(1 + 1/d);
    a generator that draws uniformly, truncates, or stitches sources
    shows up as a large chi-square. A DQ rule beside dq_checks — the
    point is the DIAGNOSTIC table, so it reports the per-digit
    contributions, not a boolean.

    The first digit comes from the value's STRING form (first [1-9]
    match) — exact and engine-portable, where floor(x / 10^floor(
    log10 x)) can mis-digit on log10 edge cases (1000 -> 2.999...).
    Rows with no nonzero digit (NULL, zero) are excluded; negatives
    contribute their magnitude's digit (the sign is stripped by the
    regex).

    Distributed shape: ONE map-side-combined digit count (9-row
    exchange), broadcast total, digit-frame math — the psi_drift
    shape. Output: one row per digit 1..9 (digit, n, p_obs, p_benford,
    chi2_contrib; 6dp) + a total row at digit = -1 carrying N and the
    chi-square statistic (8 dof).
    """
    spark = df.sparkSession
    d = F.regexp_extract(F.col(value_col).cast("string"), "[1-9]", 0)
    counts = (
        df.select(d.alias("_d"))
        .filter(F.col("_d") != "")
        .select(F.col("_d").cast("int").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("_n"))
        # <= 9 rows, consumed by the detail branch, the total branch
        # AND the total crossJoin. No checkpoint: the digit-count
        # exchange is identical in every branch, so ReuseExchange
        # dedupes it to ONE corpus scan natively (final AQE plan shows
        # 2 ReusedExchange nodes); the r10 localCheckpoint here cost
        # an extra RDD job and doubled the sf0.1 time (0.68s -> 1.36s
        # cold) while saving nothing.
    )
    total = counts.agg(F.sum("_n").alias("_t"))
    base = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    j = (
        base.join(counts, "digit", "left")
        .na.fill({"_n": 0})
        .crossJoin(F.broadcast(total))
    )
    p_exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    expected = F.col("_t") * p_exp
    contrib = (F.col("_n") - expected) * (F.col("_n") - expected) / expected
    detail = j.select(
        "digit",
        F.col("_n").alias("n"),
        F.round(F.col("_n") / F.col("_t"), 6).alias("p_obs"),
        F.round(p_exp, 6).alias("p_benford"),
        F.round(contrib, 6).alias("chi2_contrib"),
    )
    tot = (
        j.groupBy()
        .agg(
            F.first("_t").alias("n"),
            F.round(F.sum(contrib), 6).alias("chi2_contrib"),
        )
        .select(
            F.lit(-1).alias("digit"),
            "n",
            F.lit(None).cast("double").alias("p_obs"),
            F.lit(None).cast("double").alias("p_benford"),
            "chi2_contrib",
        )
    )
    return detail.unionByName(tot)


def contingency_stats(
    df: "DataFrame",
    col_a: str,
    col_b: str,
) -> "DataFrame":
    """Association between two CATEGORICAL columns — Pearson
    chi-square of independence, Cramér's V, and mutual information in
    one pass: the feature-leakage / redundancy diagnostic (is
    event_type just weekday in disguise? does lang determine source?)
    that decides whether a column adds signal to a mix or a model.

    Distributed shape: the corpus shuffles ONCE into the joint
    (a, b, count) contingency frame — map-side-combined, bounded by
    the category-pair count, never row-sized; marginals, the full
    zero-included cell grid (marginal x marginal cross of two tiny
    frames), and all three statistics derive from it. The input
    contract is genuinely categorical columns (bounded cardinality);
    a high-cardinality id column makes the grid its own join
    explosion — run profile/distinct_counts first.

    Definitions: chi2 over ALL grid cells (expected = ra*rb/N, zero
    observed included); dof = (|A|-1)(|B|-1); Cramér's V =
    sqrt(chi2 / (N * min(|A|-1, |B|-1))); MI in NATS over observed
    cells = sum (O/N) ln(O*N / (ra*rb)) (zero cells contribute 0 by
    continuity). NULL categories are excluded from both columns.

    Output: one row — n, n_a, n_b, dof, chi2, cramers_v, mi_nats
    (6dp).
    """
    joint = (
        df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(
            F.col(col_a).cast("string").alias("_a"),
            F.col(col_b).cast("string").alias("_b"),
        )
        .agg(F.count(F.lit(1)).alias("_o"))
    )
    ma = joint.groupBy("_a").agg(F.sum("_o").alias("_ra"))
    mb = joint.groupBy("_b").agg(F.sum("_o").alias("_rb"))
    tot = joint.agg(F.sum("_o").alias("_n"))
    grid = (
        ma.crossJoin(mb)
        .join(joint, ["_a", "_b"], "left")
        .na.fill({"_o": 0})
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("_ra") * F.col("_rb") / F.col("_n")
    chi_cell = (F.col("_o") - e) * (F.col("_o") - e) / e
    mi_cell = F.when(
        F.col("_o") > 0,
        (F.col("_o") / F.col("_n"))
        * F.log(
            F.col("_o").cast("double")
            * F.col("_n")
            / (F.col("_ra") * F.col("_rb"))
        ),
    ).otherwise(F.lit(0.0))
    agg = grid.agg(
        F.first("_n").alias("n"),
        F.countDistinct("_a").alias("n_a"),
        F.countDistinct("_b").alias("n_b"),
        F.sum(chi_cell).alias("_chi2"),
        F.sum(mi_cell).alias("_mi"),
    )
    dof = (F.col("n_a") - 1) * (F.col("n_b") - 1)
    v = F.sqrt(
        F.try_divide(
            F.col("_chi2"),
            F.col("n")
            * F.least(F.col("n_a") - 1, F.col("n_b") - 1),
        )
    )
    return agg.select(
        "n",
        "n_a",
        "n_b",
        dof.alias("dof"),
        F.round("_chi2", 6).alias("chi2"),
        F.round(v, 6).alias("cramers_v"),
        F.round("_mi", 6).alias("mi_nats"),
    )


def _midrank_map_grouped(
    counts: "DataFrame", n_buckets: int, group_col: str = "_g"
) -> "tuple[DataFrame, dict]":
    """Grouped twin of :func:`_midrank_map` (r17, r16 VERDICT item 6):
    given a distinct-value frame ``(group, v, c_a, c_b)``, return
    ``(group, v, c_a, t, rank)`` where ``rank`` is the midrank of v
    WITHIN its group — all groups computed through ONE agg/window
    chain and ONE driver edges job, instead of one full chain (with
    its own approx_percentile action) per group. Midranks are exact
    for ANY bucketing (the _midrank_map argument), so per-group
    results are identical to running _midrank_map per group.
    Callers: spearman_corr (groups = the two columns), quantile_map
    (groups = new/ref)."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    edges_rows = counts.groupBy(group_col).agg(
        F.expr(
            "approx_percentile(v, array("
            f"{', '.join(str(q) for q in qs)}), 1000)"
        ).alias("e"),
        F.sum(F.col("c_a") + F.col("c_b")).alias("n"),
    ).collect()
    group_edges = {
        r[group_col]: sorted({float(x) for x in (r["e"] or [])})
        for r in edges_rows
    }
    group_n = {r[group_col]: int(r["n"] or 0) for r in edges_rows}
    b = F.lit(0)
    for g, edges in group_edges.items():
        gb = F.lit(0)
        for i, e in enumerate(edges):
            gb = F.when(F.col("v") > F.lit(e), F.lit(i + 1)).otherwise(gb)
        b = F.when(F.col(group_col) == F.lit(g), gb).otherwise(b)
    bucketed = counts.withColumn("bucket", b).withColumn(
        "t", F.col("c_a") + F.col("c_b")
    )
    w = Window.partitionBy(group_col, "bucket").orderBy("v")
    cum = bucketed.select(
        group_col, "bucket", "v", "c_a", "t",
        F.sum("t").over(w).alias("cum_incl"),
    )
    bw = Window.partitionBy(group_col).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )  # <= n_buckets rows per group — bounded
    offsets = (
        bucketed.groupBy(group_col, "bucket")
        .agg(F.sum("t").alias("bt"))
        .select(
            group_col, "bucket",
            F.coalesce(F.sum("bt").over(bw), F.lit(0)).alias("off"),
        )
    )
    avg_rank = (
        F.col("off") + F.col("cum_incl") - F.col("t")
        + (F.col("t") + 1) / 2.0
    )
    out = cum.join(F.broadcast(offsets), [group_col, "bucket"]).select(
        group_col, "v", "c_a", "t", avg_rank.alias("rank")
    )
    return out, group_n


def _spearman_rank_maps(base: "DataFrame", n_buckets: int):
    """Both per-column rank maps of spearman_corr from ONE stacked
    chain (scan -> grouped counts -> grouped midranks), pinned because
    both filters consume it."""
    from indexlab_spark.functions.cache import pin as _pin_

    stacked = base.select(
        F.explode(
            F.array(
                F.struct(F.lit("a").alias("_g"), F.col("_a").alias("v")),
                F.struct(F.lit("b").alias("_g"), F.col("_b").alias("v")),
            )
        ).alias("_s")
    ).select("_s._g", "_s.v")
    counts = stacked.groupBy("_g", "v").agg(
        F.count(F.lit(1)).alias("c_a")
    ).withColumn("c_b", F.lit(0))
    rmap, _ = _midrank_map_grouped(counts, n_buckets)
    rmap = _pin_(rmap, deser=True)  # consumed by both rank joins
    ra = rmap.filter(F.col("_g") == "a").select(
        F.col("v").alias("_a"), F.col("rank").alias("_r_a")
    )
    rb = rmap.filter(F.col("_g") == "b").select(
        F.col("v").alias("_b"), F.col("rank").alias("_r_b")
    )
    return ra, rb


def _midrank_map(counts: "DataFrame", n_buckets: int) -> "DataFrame":
    """Shared rank engine for :func:`mann_whitney_u` / :func:`roc_auc`
    / :func:`spearman_corr`: given a distinct-value frame ``(v, c_a,
    c_b)``, return ``(v, c_a, t, rank)`` where ``rank`` is the global
    MIDRANK of value v and ``t`` its tie count, via the ks_drift
    two-level bucketed cumsum — per-bucket parallel windows plus an
    n_buckets-row offset frame, never a single-partition window over
    data. Edges come from approx_percentile: they only balance the
    bucket shards — the cumsum is exact for ANY bucketing, so the
    midranks (and every downstream statistic) are identical whatever
    the sketch returns; the exact `percentile` here was the single
    most expensive line in the spearman bench point (a one-buffer
    sort of the whole value domain, 9.3s -> measured after the swap
    in bench_full.json)."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    edges_row = counts.agg(
        F.expr(
            "approx_percentile(v, array("
            f"{', '.join(str(q) for q in qs)}), 1000)"
        ).alias("e")
    ).first()
    edges = sorted({float(x) for x in edges_row["e"]})
    b = F.lit(0)
    for i, e in enumerate(edges):
        b = F.when(F.col("v") > F.lit(e), F.lit(i + 1)).otherwise(b)
    bucketed = counts.withColumn("bucket", b).withColumn(
        "t", F.col("c_a") + F.col("c_b")
    )
    w = Window.partitionBy("bucket").orderBy("v")
    cum = bucketed.select(
        "bucket", "v", "c_a", "t", F.sum("t").over(w).alias("cum_incl")
    )
    bw = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )  # single-partition window over <= n_buckets rows — bounded
    offsets = (
        bucketed.groupBy("bucket")
        .agg(F.sum("t").alias("bt"))
        .select(
            "bucket",
            F.coalesce(F.sum("bt").over(bw), F.lit(0)).alias("off"),
        )
    )
    avg_rank = (
        F.col("off") + F.col("cum_incl") - F.col("t")
        + (F.col("t") + 1) / 2.0
    )
    return cum.join(F.broadcast(offsets), "bucket").select(
        "v", "c_a", "t", avg_rank.alias("rank")
    )


def _midrank_sums(counts: "DataFrame", n_buckets: int) -> "DataFrame":
    """Rank-sum + tie-term reduction over :func:`_midrank_map` — the
    1-row frame (r_a = sum of c_a * midrank, tie = sum(t^3 - t)) that
    mann_whitney_u / roc_auc consume."""
    return _midrank_map(counts, n_buckets).agg(
        F.sum(F.col("c_a") * F.col("rank")).alias("r_a"),
        F.sum(
            F.col("t").cast("double") * F.col("t") * F.col("t")
            - F.col("t")
        ).alias("tie"),
    )


def mann_whitney_u(
    df: "DataFrame",
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    z_crit: float = 1.96,
    continuity: bool = True,
    n_buckets: int = 32,
) -> "DataFrame":
    """Mann-Whitney U rank-sum test (Mann & Whitney 1947) — the
    nonparametric companion to :func:`ab_test_report`'s Welch t: it
    compares two samples by RANKS, so a heavy-tailed metric (revenue,
    latency) with a few enormous outliers cannot swamp the statistic
    the way it swamps a mean. Tie-corrected normal approximation with
    optional continuity correction (the standard large-sample
    treatment); reported as a z statistic plus a fixed-threshold flag,
    not a p-value, for the same no-erf reason as ab_test_report.

    Scale design (the :func:`ks_drift` discipline): ranks are computed
    on the DISTINCT-VALUE frame, never the row frame — one map-combined
    (value -> per-group counts) aggregation is the only corpus-sized
    pass. The global rank cumsum over distinct values is two-level
    bucketed (per-bucket parallel windows + an n_buckets-row offset
    frame), NEVER a single-partition window over data; with t rows
    tied at a value, every one gets the midrank cum_before + (t+1)/2,
    which is exactly what one agg over the value frame can then fold
    into R_a and the tie term sum(t^3 - t).

    Output (one row, 6dp): n_a, n_b, u_a, u_b, mu (= n_a*n_b/2),
    sigma (tie-corrected), z_stat (continuity-corrected toward the
    mean when ``continuity``), z_sig (|z| > ``z_crit``). Degenerate
    inputs (an empty arm, or every value tied so sigma = 0) yield
    NULL u/mu/sigma/z and a false flag, matching ab_test_report's
    degenerate-arm contract.
    """
    g = F.col(group_col)
    counts = (
        df.select(g.alias("_g"), F.col(value_col).cast("double").alias("v"))
        .filter(F.col("v").isNotNull() & g.isin(group_a, group_b))
        .groupBy("v")
        .agg(
            F.count(F.when(F.col("_g") == F.lit(group_a), 1)).alias("c_a"),
            F.count(F.when(F.col("_g") == F.lit(group_b), 1)).alias("c_b"),
        )
    )
    tot = counts.agg(
        F.sum("c_a").alias("n_a"), F.sum("c_b").alias("n_b")
    ).first()
    n_a, n_b = int(tot["n_a"] or 0), int(tot["n_b"] or 0)
    n = n_a + n_b
    if n_a == 0 or n_b == 0 or n < 2:
        return df.sparkSession.range(1).select(
            F.lit(n_a).alias("n_a"),
            F.lit(n_b).alias("n_b"),
            *[
                F.lit(None).cast("double").alias(c)
                for c in ("u_a", "u_b", "mu", "sigma", "z_stat")
            ],
            F.lit(False).alias("z_sig"),
        )
    sums = _midrank_sums(counts, n_buckets)
    u_a = F.col("r_a") - F.lit(n_a * (n_a + 1) / 2.0)
    u_b = F.lit(float(n_a) * n_b) - u_a
    mu = F.lit(n_a * n_b / 2.0)
    sigma = F.sqrt(
        F.lit(n_a * n_b / 12.0)
        * (F.lit(float(n + 1)) - F.col("tie") / F.lit(float(n) * (n - 1)))
    )
    diff = u_a - mu
    cc = (
        F.when(diff > 0, -0.5).when(diff < 0, F.lit(0.5)).otherwise(0.0)
        if continuity
        else F.lit(0.0)
    )
    z = F.when(sigma > 0, (diff + cc) / sigma)
    return sums.select(
        F.lit(n_a).alias("n_a"),
        F.lit(n_b).alias("n_b"),
        F.round(u_a, 6).alias("u_a"),
        F.round(u_b, 6).alias("u_b"),
        F.round(mu, 6).alias("mu"),
        F.round(F.when(sigma > 0, sigma), 6).alias("sigma"),
        F.round(z, 6).alias("z_stat"),
        F.coalesce(F.abs(z) > F.lit(z_crit), F.lit(False)).alias("z_sig"),
    )


# Poisson(1) CDF at k = 0..7 — the inverse-CDF thresholds for the
# deterministic bootstrap weights; the SAME literals appear verbatim in
# the bootstrap oracle SQL so both engines draw identical integers.
_POIS1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033253,
)


def bootstrap_ci(
    df: "DataFrame",
    value_col: str,
    id_col: str,
    n_boot: int = 200,
    level: float = 0.95,
    seed: int = 1,
) -> "DataFrame":
    """Poisson-bootstrap confidence interval for the mean (the
    distributed bootstrap of Chamandy et al. / Kleiner et al.'s
    lineage: resampling n-out-of-n at scale is infeasible because no
    worker knows n up front, but multinomial counts converge to
    independent Poisson(1) weights, so each row draws its replicate
    weights LOCALLY) — the uncertainty companion to
    :func:`ab_test_report`: a CI on any mean metric without normality
    assumptions or a closed-form variance.

    Fully deterministic and oracle-replayable: replicate ``b``'s
    weight for a row is the Poisson(1) inverse CDF applied to the
    md5-derived uniform of ``seed|b|id`` (the weighted_sample /
    stratified_split md5 discipline; CDF thresholds in
    ``_POIS1_CDF``, weights capped at 8 where the CDF tail is < 1e-5).

    ONE corpus pass: rows explode ``b = 0..n_boot`` MAP-SIDE (b=0
    carries weight 1, making the point estimate and n part of the same
    aggregation) and combine into a (n_boot+1)-row keyed frame — the
    shuffle is replicate-count-sized, never corpus-sized. The CI is
    the exact interpolated percentile pair over the replicate means
    (a second agg over n_boot rows).

    Output (one row): n, mean (6dp), lo, hi (6dp bootstrap percentile
    bounds at ``level``), n_boot, level. Empty input yields n=0 and
    NULL mean/lo/hi. Replicates with all-zero weight (vanishing
    probability for n more than a few rows) drop from the percentile.
    """
    if n_boot < 1:
        raise ValueError(f"bootstrap_ci: n_boot must be >= 1, got {n_boot}")
    if not (0.0 < level < 1.0):
        raise ValueError(f"bootstrap_ci: level in (0, 1), got {level}")
    from indexlab_spark.functions.hashing import md5_long

    x = F.col(value_col).cast("double")
    base = df.select(
        x.alias("x"), F.col(id_col).cast("string").alias("_id")
    ).filter(F.col("x").isNotNull())
    rep = base.select(
        "x",
        "_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_boot))).alias("b"),
    )
    u = md5_long(
        F.concat(
            F.lit(f"{seed}|"), F.col("b").cast("string"), F.lit("|"),
            F.col("_id"),
        )
    ) / F.lit(2.0**60)
    pois = F.lit(len(_POIS1_CDF))
    for k in reversed(range(len(_POIS1_CDF))):
        pois = F.when(u < F.lit(_POIS1_CDF[k]), F.lit(k)).otherwise(pois)
    w = F.when(F.col("b") == 0, F.lit(1)).otherwise(pois).cast("double")
    means = rep.select("b", w.alias("w"), "x").groupBy("b").agg(
        F.sum(F.col("w") * F.col("x")).alias("sx"),
        F.sum("w").alias("sw"),
    )
    alpha = (1.0 - level) / 2.0
    stats = means.agg(
        F.max(
            F.when(F.col("b") == 0, F.col("sx") / F.col("sw"))
        ).alias("_mean"),
        F.max(F.when(F.col("b") == 0, F.col("sw"))).alias("_n"),
        F.expr(
            "percentile(CASE WHEN b >= 1 AND sw > 0 THEN sx / sw END,"
            f" array({alpha!r}, {1.0 - alpha!r}))"
        ).alias("_q"),
    )
    return stats.select(
        F.coalesce(F.col("_n"), F.lit(0.0)).cast("long").alias("n"),
        F.round("_mean", 6).alias("mean"),
        F.round(F.col("_q")[0], 6).alias("lo"),
        F.round(F.col("_q")[1], 6).alias("hi"),
        F.lit(n_boot).alias("n_boot"),
        F.lit(float(level)).alias("level"),
    )


def fd_discovery(
    df: "DataFrame",
    pairs: list[tuple[str, str]],
) -> "DataFrame":
    """Approximate functional-dependency check over candidate column
    pairs — the g3 error of Kivinen & Mannila 1995 (the standard
    approximate-FD measure, what profilers like Metanome report): for
    a candidate ``det -> dep``, the violation count is the minimum
    number of rows to delete so the FD holds exactly, i.e. per
    determinant value everything outside the majority dependent value.
    The data-modeling / broken-ETL screen the one-pass profiler can't
    express: "is o_orderkey really a key for o_custkey", "does zip
    still determine state after the merge".

    Per pair: one (det, dep)-keyed map-combined count, one det-keyed
    (sum, max) agg, one scalar reduction — each scan column-pruned to
    the two columns, nothing row-sized leaves the executors. Pairs run
    as independent branches of one returned plan (a pair list is
    human-sized; a grouping-sets fusion would serialize the hot path
    through one wide shuffle instead of k narrow ones).

    NULL contract: rows with a NULL determinant are excluded (an FD
    says nothing about missing keys — documented to match the oracle);
    a NULL dependent is a VALUE (two rows with the same det, one NULL
    and one 'x', violate).

    Output, one row per pair: determinant, dependent, n (rows with
    non-null det), n_keys (distinct det), violations, violating_keys,
    violation_rate (g3, 6dp, NULL when n = 0), holds (violations = 0).
    """
    if not pairs:
        raise ValueError("fd_discovery: pairs must be non-empty")
    from functools import reduce

    outs = []
    for det, dep in pairs:
        g = (
            df.filter(F.col(det).isNotNull())
            .groupBy(
                F.col(det).alias("_det"), F.col(dep).alias("_dep")
            )
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        per_det = g.groupBy("_det").agg(
            F.sum("_c").alias("_tot"), F.max("_c").alias("_mx")
        )
        agg = per_det.agg(
            F.coalesce(F.sum("_tot"), F.lit(0)).alias("n"),
            F.count(F.lit(1)).alias("n_keys"),
            F.coalesce(
                F.sum(F.col("_tot") - F.col("_mx")), F.lit(0)
            ).alias("violations"),
            F.coalesce(
                F.sum(
                    F.when(F.col("_tot") > F.col("_mx"), 1).otherwise(0)
                ),
                F.lit(0),
            ).alias("violating_keys"),
        )
        outs.append(
            agg.select(
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                F.col("n").cast("long").alias("n"),
                F.col("n_keys").cast("long").alias("n_keys"),
                F.col("violations").cast("long").alias("violations"),
                F.col("violating_keys").cast("long").alias(
                    "violating_keys"
                ),
                F.round(
                    F.try_divide(
                        F.col("violations").cast("double"), F.col("n")
                    ),
                    6,
                ).alias("violation_rate"),
                (F.col("violations") == 0).alias("holds"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), outs)


def roc_auc(
    df: "DataFrame",
    label_col: str,
    score_col: str,
    n_buckets: int = 32,
) -> "DataFrame":
    """Exact tie-aware ROC-AUC via the rank identity AUC = (R_pos -
    n_pos(n_pos+1)/2) / (n_pos * n_neg) — AUC IS the Mann-Whitney U
    statistic normalized (ties contribute 1/2, matching
    sklearn.roc_auc_score's trapezoidal treatment) — the headline
    ranking metric for every scorer in the repo (quality classifier,
    target encoding, dedup scores) WITHOUT materializing a ROC curve
    or sorting the corpus: the same distinct-value midrank engine as
    :func:`mann_whitney_u` (one map-combined value agg is the only
    corpus pass; :func:`_midrank_sums` two-level cumsum for ranks).

    Label contract: rows are classified by ``label == 1`` /
    ``label == 0`` after a double cast; anything else — non-binary
    labels, NULL labels, NULL scores — is EXCLUDED, with n_pos/n_neg
    reporting only the used rows (pinned in tests).

    Output (one row): n_pos, n_neg, auc (6dp), gini (2*auc - 1, 6dp).
    Degenerate input (an empty class) yields NULL auc/gini.
    """
    y = F.col(label_col).cast("double")
    counts = (
        df.select(y.alias("_y"), F.col(score_col).cast("double").alias("v"))
        .filter(F.col("v").isNotNull() & F.col("_y").isin(0.0, 1.0))
        .groupBy("v")
        .agg(
            F.count(F.when(F.col("_y") == 1.0, 1)).alias("c_a"),
            F.count(F.when(F.col("_y") == 0.0, 1)).alias("c_b"),
        )
    )
    tot = counts.agg(
        F.sum("c_a").alias("np"), F.sum("c_b").alias("nn")
    ).first()
    n_pos, n_neg = int(tot["np"] or 0), int(tot["nn"] or 0)
    if n_pos == 0 or n_neg == 0:
        return df.sparkSession.range(1).select(
            F.lit(n_pos).alias("n_pos"),
            F.lit(n_neg).alias("n_neg"),
            F.lit(None).cast("double").alias("auc"),
            F.lit(None).cast("double").alias("gini"),
        )
    sums = _midrank_sums(counts, n_buckets)
    auc = (F.col("r_a") - F.lit(n_pos * (n_pos + 1) / 2.0)) / F.lit(
        float(n_pos) * n_neg
    )
    return sums.select(
        F.lit(n_pos).alias("n_pos"),
        F.lit(n_neg).alias("n_neg"),
        F.round(auc, 6).alias("auc"),
        F.round(2.0 * auc - 1.0, 6).alias("gini"),
    )


def reliability_curve(
    df: "DataFrame",
    label_col: str,
    prob_col: str,
    n_bins: int = 10,
) -> "DataFrame":
    """Calibration / reliability table + expected calibration error
    (Naeini et al. 2015's ECE, the standard calibration readout) — the
    EVALUATION companion to the isotonic calibrator: does predicted
    probability p actually mean "right p of the time"? Equal-width
    bins over [0, 1] (bin = floor(p * n_bins), the 1.0 edge clamped
    into the last bin); per bin the mean predicted probability
    (confidence), observed positive rate (accuracy) and signed gap;
    ECE = sum over bins of (n_b / N) * |acc_b - conf_b|.

    ONE map-combined (bin -> count, sum p, sum y) aggregation over the
    scored frame; the ECE total rides a second n_bins-row agg unioned
    in as the ``bin = -1`` summary row (the benford_test total-row
    shape). Rows with NULL p, p outside [0, 1], or a label other than
    0/1 are EXCLUDED (the roc_auc contract).

    Output: (bin, lo, hi, n, conf, acc, gap, ece) — ece is NULL on
    per-bin rows and carries the total on the bin = -1 row (lo/hi
    NULL there); all floats 6dp. Empty input yields just the summary
    row with n = 0 and NULL ece.
    """
    if n_bins < 1:
        raise ValueError(f"reliability_curve: n_bins >= 1, got {n_bins}")
    y = F.col(label_col).cast("double")
    p = F.col(prob_col).cast("double")
    base = df.select(y.alias("_y"), p.alias("_p")).filter(
        F.col("_p").isNotNull()
        & (F.col("_p") >= 0.0)
        & (F.col("_p") <= 1.0)
        & F.col("_y").isin(0.0, 1.0)
    )
    binned = base.withColumn(
        "bin",
        F.least(
            F.floor(F.col("_p") * n_bins).cast("int"), F.lit(n_bins - 1)
        ),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("_p").alias("_conf"),
        F.avg("_y").alias("_acc"),
    )
    rows = per_bin.select(
        "bin",
        F.round(F.col("bin") / F.lit(float(n_bins)), 6).alias("lo"),
        F.round((F.col("bin") + 1) / F.lit(float(n_bins)), 6).alias("hi"),
        "n",
        F.round("_conf", 6).alias("conf"),
        F.round("_acc", 6).alias("acc"),
        F.round(F.col("_acc") - F.col("_conf"), 6).alias("gap"),
        F.lit(None).cast("double").alias("ece"),
    )
    total = per_bin.agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("n"),
        F.round(
            F.sum(
                F.col("n") * F.abs(F.col("_acc") - F.col("_conf"))
            )
            / F.sum("n"),
            6,
        ).alias("_ece"),
    ).select(
        F.lit(-1).alias("bin"),
        F.lit(None).cast("double").alias("lo"),
        F.lit(None).cast("double").alias("hi"),
        "n",
        F.lit(None).cast("double").alias("conf"),
        F.lit(None).cast("double").alias("acc"),
        F.lit(None).cast("double").alias("gap"),
        F.col("_ece").alias("ece"),
    )
    return rows.unionByName(total)


def woe_iv(
    df: "DataFrame",
    cat_col: str,
    label_col: str,
    smoothing: float = 0.5,
) -> "DataFrame":
    """Weight of Evidence / Information Value feature screen — the
    credit-scoring-standard univariate strength measure for a
    categorical predictor against a binary target (Siddiqi 2006):
    WOE_c = ln((pos_c / pos_tot) / (neg_c / neg_tot)), IV = sum over
    categories of (pos_share - neg_share) * WOE. The conventional
    reading: IV < 0.02 useless, 0.1-0.3 medium, > 0.5 suspicious
    (leakage). Add-lambda ``smoothing`` on both counts keeps
    zero-count cells finite (the unigram_jsd discipline); shares are
    smoothed consistently so they still sum to 1.

    ONE map-combined (category -> pos, neg) agg; totals ride a
    broadcast one-row frame; IV total emitted as the ``<ALL>`` row
    (the unigram_jsd / benford shape). Label contract: rows with a
    label other than exactly 0/1 after double cast are excluded; NULL
    category is a real group.

    Output: (category string, n_pos, n_neg, woe, iv_contrib, iv) —
    woe/iv_contrib NULL on the <ALL> row, iv only there; 6dp.
    """
    if smoothing < 0:
        raise ValueError(f"woe_iv: smoothing >= 0, got {smoothing}")
    y = F.col(label_col).cast("double")
    per_cat = (
        df.select(F.col(cat_col).cast("string").alias("_cat"), y.alias("_y"))
        .filter(F.col("_y").isin(0.0, 1.0))
        .groupBy("_cat")
        .agg(
            F.count(F.when(F.col("_y") == 1.0, 1)).alias("n_pos"),
            F.count(F.when(F.col("_y") == 0.0, 1)).alias("n_neg"),
        )
        # category-sized, but consumed by the detail rows, the totals
        # agg and the <ALL> IV row — each re-derived the corpus scan
        # before the r10 scan audit (4 scans -> 1)
        .localCheckpoint(eager=False)
    )
    lam = float(smoothing)
    tot = per_cat.agg(
        F.sum("n_pos").alias("_tp"),
        F.sum("n_neg").alias("_tn"),
        F.count(F.lit(1)).alias("_k"),
    )
    j = per_cat.crossJoin(F.broadcast(tot))
    pg = (F.col("n_pos") + F.lit(lam)) / (
        F.col("_tp") + F.lit(lam) * F.col("_k")
    )
    pb = (F.col("n_neg") + F.lit(lam)) / (
        F.col("_tn") + F.lit(lam) * F.col("_k")
    )
    woe = F.log(pg / pb)
    scored = j.select(
        F.coalesce(F.col("_cat"), F.lit("<NULL>")).alias("category"),
        "n_pos",
        "n_neg",
        F.round(woe, 6).alias("woe"),
        F.round((pg - pb) * woe, 6).alias("iv_contrib"),
        F.lit(None).cast("double").alias("iv"),
        ((pg - pb) * woe).alias("_ivc"),
    )
    total = scored.agg(
        F.coalesce(F.sum("n_pos"), F.lit(0)).alias("n_pos"),
        F.coalesce(F.sum("n_neg"), F.lit(0)).alias("n_neg"),
        F.round(F.sum("_ivc"), 6).alias("_iv"),
    ).select(
        F.lit("<ALL>").alias("category"),
        "n_pos",
        "n_neg",
        F.lit(None).cast("double").alias("woe"),
        F.lit(None).cast("double").alias("iv_contrib"),
        F.col("_iv").alias("iv"),
    )
    return scored.drop("_ivc").unionByName(total)


def corr_matrix(
    df: "DataFrame",
    cols: list[str],
) -> "DataFrame":
    """Pairwise Pearson correlation matrix over a column list in ONE
    map-side-combined pass — the multi-column companion to the
    profiler: k columns need k sums, k sums of squares and k(k-1)/2
    cross-products, all living in a single aggregation (never k² scans,
    never a driver-side loop over collect()ed columns).

    NULL contract: LISTWISE deletion — a row with a NULL in ANY of
    ``cols`` is dropped entirely, so every pair shares one n and the
    matrix is guaranteed positive semi-definite (pairwise-complete
    matrices are not; documented to match the oracle).

    Output: one row per unordered pair (col_a < col_b in list order):
    col_a, col_b, corr (6dp; NULL when either column is constant), n.
    """
    if len(cols) < 2:
        raise ValueError(f"corr_matrix: need >= 2 cols, got {len(cols)}")
    if len(set(cols)) != len(cols):
        raise ValueError("corr_matrix: duplicate columns")
    base = df.select(
        *[F.col(c).cast("double").alias(c) for c in cols]
    ).na.drop()
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.col(c)).alias(f"_s_{c}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).alias(f"_q_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"_x_{a}_{b}"))
    m = base.agg(*aggs)
    # every pair unpacks from the SAME 1-row aggregate via one
    # explode(array(struct...)) — a union of per-pair selects would
    # replay the corpus scan once per pair
    n = F.col("_n").cast("double")
    structs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            cov = n * F.col(f"_x_{a}_{b}") - F.col(f"_s_{a}") * F.col(
                f"_s_{b}"
            )
            va = n * F.col(f"_q_{a}") - F.col(f"_s_{a}") * F.col(f"_s_{a}")
            vb = n * F.col(f"_q_{b}") - F.col(f"_s_{b}") * F.col(f"_s_{b}")
            structs.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.round(
                        F.when((va > 0) & (vb > 0), cov / F.sqrt(va * vb)),
                        6,
                    ).alias("corr"),
                )
            )
    return m.select(
        F.explode(F.array(*structs)).alias("_p"), F.col("_n").alias("n")
    ).select("_p.col_a", "_p.col_b", "_p.corr", "n")


def lift_table(
    df: "DataFrame",
    score_col: str,
    label_col: str,
    n_tiles: int = 10,
) -> "DataFrame":
    """Decile lift / gains table — the campaign-targeting readout for
    a propensity score ("mail the top 2 deciles"): tile 1 holds the
    HIGHEST scores; per tile the response rate, lift vs the global
    rate, and the cumulative capture (gains) walking down from the
    top. The actionable companion to :func:`roc_auc` — AUC says the
    ranking is good, the gains table says where to cut it.

    Scale shape (the rfm_segments discipline): tile edges are exact
    interpolated percentiles fetched once as DRIVER LITERALS, so tile
    assignment is a codegen projection — never an ntile window (a
    global sort). Per-tile stats are ONE map-combined agg; the
    cumulative walk is a bounded window over <= n_tiles rows with
    global totals on a broadcast 1-row frame. Rows tied at an edge
    share a tile (tile sizes are then uneven — determinism over
    cosmetic equal counts; documented, matches the oracle).

    Label/score contract as :func:`roc_auc`: non-binary labels and
    NULL scores are excluded. Output per tile: tile (1 = top), n,
    responders, rate, lift, cum_n, cum_responders, cum_capture,
    cum_lift (floats 6dp). Raises on empty input or zero responders
    (a lift table against nothing is meaningless).
    """
    if n_tiles < 2:
        raise ValueError(f"lift_table: n_tiles >= 2, got {n_tiles}")
    y = F.col(label_col).cast("double")
    s = F.col(score_col).cast("double")
    base = df.select(s.alias("_s"), y.alias("_y")).filter(
        F.col("_s").isNotNull() & F.col("_y").isin(0.0, 1.0)
    )
    qs = [i / n_tiles for i in range(1, n_tiles)]
    edges_row = base.agg(
        F.expr(
            f"percentile(_s, array({', '.join(str(q) for q in qs)}))"
        ).alias("e")
    ).first()
    if edges_row["e"] is None:
        raise ValueError("lift_table: no usable rows")
    edges = [float(x) for x in edges_row["e"]]
    asc = F.lit(1)
    for e in edges:
        asc = asc + F.when(F.col("_s") > F.lit(e), 1).otherwise(0)
    per_tile = (
        base.withColumn("tile", F.lit(n_tiles + 1) - asc)
        .groupBy("tile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_y").cast("long").alias("responders"),
        )
    )
    tot = per_tile.agg(
        F.sum("n").alias("_tn"), F.sum("responders").alias("_tr")
    ).first()  # tile-frame-sized scalar probe (ks_drift discipline)
    if not tot["_tn"]:
        raise ValueError("lift_table: no usable rows")
    if not tot["_tr"]:
        raise ValueError("lift_table: zero responders")
    t_n, t_r = float(tot["_tn"]), float(tot["_tr"])
    w = Window.orderBy("tile").rowsBetween(
        Window.unboundedPreceding, 0
    )  # single-partition window over <= n_tiles rows — bounded
    out = per_tile.select(
        "tile",
        "n",
        "responders",
        F.sum("n").over(w).alias("cum_n"),
        F.sum("responders").over(w).alias("cum_responders"),
    )
    rate = F.col("responders") / F.col("n")
    grate = F.lit(t_r / t_n)
    return out.select(
        "tile",
        "n",
        "responders",
        F.round(rate, 6).alias("rate"),
        F.round(rate / grate, 6).alias("lift"),
        "cum_n",
        "cum_responders",
        F.round(F.col("cum_responders") / F.lit(t_r), 6).alias(
            "cum_capture"
        ),
        F.round(
            (F.col("cum_responders") / F.col("cum_n")) / grate, 6
        ).alias("cum_lift"),
    ).orderBy("tile")


def cuped_ab(
    df: "DataFrame",
    variant_col: str,
    metric_col: str,
    covariate_col: str,
    variant_a: str = "a",
    variant_b: str = "b",
    z_crit: float = 1.96,
) -> "DataFrame":
    """CUPED-adjusted two-arm experiment readout (Deng, Xu, Kohavi &
    Walker 2013, public): regress out a pre-experiment covariate
    (``y_adj = y - theta * (x - mean(x))``, theta = cov(x, y) /
    var(x) pooled over both arms) before the Welch t — the industry-
    standard variance-reduction layer on top of
    :func:`ab_test_report`; with a well-correlated pre-period metric
    it cuts required sample sizes by rho^2.

    ONE map-side-combined aggregation (the ab_test_report shape):
    global and per-arm moment sums (n, sum x, sum y, sum x^2,
    sum y^2, sum xy) in a single filtered-aggregate pass; theta, the
    adjusted means, the adjusted per-arm variances (var_y - 2 theta
    cov + theta^2 var_x — adjustment never rescans the data) and the
    Welch statistic are all closed-form projections of that one row.

    NULL contract (mirrors ab_test_report): a unit with a NULL metric
    OR a NULL covariate leaves entirely. Degenerate inputs (an arm
    with n < 2, zero pooled covariate variance, or zero adjusted
    variance on both arms) yield NULL statistics and a false flag.

    Output (one row, 6dp): theta, rho2 (fraction of metric variance
    the covariate explains = achieved variance reduction), n_a, n_b,
    mean_a_adj, mean_b_adj, t_stat, t_df, t_sig.
    """
    v = F.col(variant_col)
    y = F.col(metric_col).cast("double")
    x = F.col(covariate_col).cast("double")
    base = df.filter(
        y.isNotNull() & x.isNotNull() & v.isin(variant_a, variant_b)
    )

    def arm(val, expr, agg):
        return agg(F.when(v == F.lit(val), expr))

    agg = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("qx"),
        F.sum(x * y).alias("xy"),
        *[
            e
            for val, tag in ((variant_a, "a"), (variant_b, "b"))
            for e in (
                arm(val, y, F.count).alias(f"n_{tag}"),
                arm(val, y, F.sum).alias(f"sy_{tag}"),
                arm(val, x, F.sum).alias(f"sx_{tag}"),
                arm(val, y * y, F.sum).alias(f"qy_{tag}"),
                arm(val, x * x, F.sum).alias(f"qx_{tag}"),
                arm(val, x * y, F.sum).alias(f"xy_{tag}"),
            )
        ],
        F.sum(y * y).alias("qy"),
    )
    n = F.col("n").cast("double")
    var_x_n = n * F.col("qx") - F.col("sx") * F.col("sx")
    cov_n = n * F.col("xy") - F.col("sx") * F.col("sy")
    var_y_n = n * F.col("qy") - F.col("sy") * F.col("sy")
    theta = F.when(var_x_n > 0, cov_n / var_x_n)
    rho2 = F.when(
        (var_x_n > 0) & (var_y_n > 0),
        (cov_n * cov_n) / (var_x_n * var_y_n),
    )
    xbar = F.col("sx") / n

    def adj(tag):
        na = F.col(f"n_{tag}").cast("double")
        my = F.col(f"sy_{tag}") / na
        mx = F.col(f"sx_{tag}") / na
        mean_adj = my - theta * (mx - xbar)
        # sample (n-1) variances/covariance of the arm
        vy = (F.col(f"qy_{tag}") - na * my * my) / (na - 1)
        vx = (F.col(f"qx_{tag}") - na * mx * mx) / (na - 1)
        cxy = (F.col(f"xy_{tag}") - na * mx * my) / (na - 1)
        var_adj = vy - 2 * theta * cxy + theta * theta * vx
        return mean_adj, var_adj

    mean_a, var_a = adj("a")
    mean_b, var_b = adj("b")
    se2 = var_a / F.col("n_a") + var_b / F.col("n_b")
    t_stat = (mean_a - mean_b) / F.sqrt(se2)
    t_df = (se2 * se2) / (
        (var_a / F.col("n_a")) * (var_a / F.col("n_a"))
        / (F.col("n_a") - 1)
        + (var_b / F.col("n_b")) * (var_b / F.col("n_b"))
        / (F.col("n_b") - 1)
    )
    ok = (
        (F.col("n_a") >= 2)
        & (F.col("n_b") >= 2)
        & theta.isNotNull()
        & (se2 > 0)
    )
    return agg.select(
        F.round(theta, 6).alias("theta"),
        F.round(rho2, 6).alias("rho2"),
        F.col("n_a"),
        F.col("n_b"),
        F.round(F.when(theta.isNotNull(), mean_a), 6).alias("mean_a_adj"),
        F.round(F.when(theta.isNotNull(), mean_b), 6).alias("mean_b_adj"),
        F.round(F.when(ok, t_stat), 6).alias("t_stat"),
        F.round(F.when(ok, t_df), 6).alias("t_df"),
        F.coalesce(
            F.when(ok, F.abs(t_stat) > F.lit(z_crit)), F.lit(False)
        ).alias("t_sig"),
    )


def classification_report(
    df: "DataFrame",
    label_col: str,
    pred_col: str,
) -> "DataFrame":
    """Multi-class classification report — per-class precision /
    recall / F1 with support, plus accuracy, macro-F1 and Cohen's
    kappa on a summary row: the evaluation staple for every
    categorical scorer in the repo (quality classifier, language ID,
    cluster-vs-label checks).

    ONE map-combined (label, pred) contingency aggregation is the
    only corpus pass — the confusion matrix is class²-sized, and every
    metric (TP per class, row/column marginals, the kappa expected
    agreement Σ row_i·col_i / n²) derives from it without touching the
    data again (the contingency_stats discipline). Rows with a NULL
    label or NULL prediction are excluded; classes appearing only in
    predictions still get a row (precision defined, recall NULL).

    Output: (class, support, precision, recall, f1) per class sorted
    by class name, then a ``<ALL>`` row where support = n, precision
    column carries ACCURACY, recall carries Cohen's KAPPA and f1
    carries MACRO-F1 (documented convention — one stable schema
    instead of a ragged union; 6dp). Zero-denominator cells are NULL;
    macro-F1 averages classes with a defined f1.
    """
    cells = (
        df.select(
            F.col(label_col).cast("string").alias("_y"),
            F.col(pred_col).cast("string").alias("_p"),
        )
        .filter(F.col("_y").isNotNull() & F.col("_p").isNotNull())
        .groupBy("_y", "_p")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    classes = (
        cells.select(F.col("_y").alias("cls"))
        .unionByName(cells.select(F.col("_p").alias("cls")))
        .distinct()
    )
    row_m = cells.groupBy(F.col("_y").alias("cls")).agg(
        F.sum("_c").alias("support")
    )
    col_m = cells.groupBy(F.col("_p").alias("cls")).agg(
        F.sum("_c").alias("predicted")
    )
    diag = cells.filter(F.col("_y") == F.col("_p")).select(
        F.col("_y").alias("cls"), F.col("_c").alias("tp")
    )
    per = (
        classes.join(row_m, "cls", "left")
        .join(col_m, "cls", "left")
        .join(diag, "cls", "left")
        .na.fill({"support": 0, "predicted": 0, "tp": 0})
    )
    prec = F.try_divide(F.col("tp").cast("double"), F.col("predicted"))
    rec = F.try_divide(F.col("tp").cast("double"), F.col("support"))
    f1 = F.try_divide(2 * prec * rec, prec + rec)
    scored = per.select(
        F.col("cls").alias("class"),
        F.col("support"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
        prec.alias("_prec"),
        rec.alias("_rec"),
        (F.col("support").cast("double") * F.col("predicted")).alias(
            "_rc"
        ),
        F.col("tp"),
    )
    total = scored.agg(
        F.coalesce(F.sum("support"), F.lit(0)).alias("n"),
        F.sum("tp").alias("_tp"),
        F.sum("_rc").alias("_sum_rc"),
        F.avg(
            F.when(
                (F.col("_prec") + F.col("_rec")) > 0,
                2 * F.col("_prec") * F.col("_rec")
                / (F.col("_prec") + F.col("_rec")),
            )
        ).alias("_macro_f1"),
    )
    n = F.col("n").cast("double")
    acc = F.try_divide(F.col("_tp").cast("double"), n)
    pe = F.try_divide(F.col("_sum_rc"), n * n)
    kappa = F.try_divide(acc - pe, 1 - pe)
    summary = total.select(
        F.lit("<ALL>").alias("class"),
        F.col("n").alias("support"),
        F.round(acc, 6).alias("precision"),
        F.round(kappa, 6).alias("recall"),
        F.round("_macro_f1", 6).alias("f1"),
    )
    return (
        scored.select("class", "support", "precision", "recall", "f1")
        .unionByName(summary)
        .orderBy("class")
    )


def spearman_corr(
    df: "DataFrame",
    col_a: str,
    col_b: str,
    n_buckets: int = 32,
) -> "DataFrame":
    """Spearman rank correlation — Pearson on midranks (tie-correct by
    construction), the monotone-relationship companion to
    :func:`corr_matrix`'s Pearson: a perfectly monotone but curved
    relationship scores rho = 1 here while Pearson under-reads it, and
    outliers move ranks by at most their count.

    Scale shape: each column reduces to its DISTINCT-VALUE frame (one
    map-combined count agg per column), midranks come from the shared
    :func:`_midrank_map` two-level bucketed cumsum, and the rank maps
    join back to the row frame by value — two keyed joins on the
    (usually far smaller) value domain, then ONE moment aggregation.
    No global sort, no single-partition window, no row-level rank
    window.

    NULL contract: listwise (a row missing either value drops — the
    corr_matrix contract). Output one row: n, rho (6dp; NULL when a
    column is constant or n < 2).
    """
    from indexlab_spark.functions.cache import pin as _pin_

    # r16: base feeds three consumers (both distinct-value count aggs
    # and the rank join) — pin it so the scan+cast runs once, not 3x.
    # r17 (VERDICT item 6): deser — every consumer is a JVM agg/join;
    # and BOTH rank maps now come from one stacked grouped-midrank
    # chain (one counts exchange + one edges job, was two of each)
    base = _pin_(
        df.select(
            F.col(col_a).cast("double").alias("_a"),
            F.col(col_b).cast("double").alias("_b"),
        ).na.drop(),
        deser=True,
    )
    ra, rb = _spearman_rank_maps(base, n_buckets)
    ranked = base.join(ra, "_a").join(rb, "_b")
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_r_a").alias("sa"),
        F.sum("_r_b").alias("sb"),
        F.sum(F.col("_r_a") * F.col("_r_a")).alias("qa"),
        F.sum(F.col("_r_b") * F.col("_r_b")).alias("qb"),
        F.sum(F.col("_r_a") * F.col("_r_b")).alias("xab"),
    )
    n = F.col("n").cast("double")
    cov = n * F.col("xab") - F.col("sa") * F.col("sb")
    va = n * F.col("qa") - F.col("sa") * F.col("sa")
    vb = n * F.col("qb") - F.col("sb") * F.col("sb")
    return m.select(
        F.col("n"),
        F.round(
            F.when((va > 0) & (vb > 0), cov / F.sqrt(va * vb)), 6
        ).alias("rho"),
    )


def sliding_distinct(
    df: "DataFrame",
    ts_col: str,
    key_col: str,
    window_days: int = 28,
    sketch: bool = False,
) -> "DataFrame":
    """Trailing-window distinct entities per day — the "28-day MAU"
    computation a naive GROUP BY cannot express incrementally (distinct
    is not additive, so you cannot sum dailies). Two scale paths:

    - **exact** (default): the (key, day) DISTINCT frame — far smaller
      than the event stream — expands map-side to the ``window_days``
      cover days each activity day serves (the standard cover-day
      trick: key k active on day d counts for every day in
      [d, d + w - 1]); one distinct-combine shuffle of (cover_day,
      key), then a map-combined per-day count. Cost is bounded by
      |key-day pairs| x window, never events x window.
    - **sketch=True**: per-day HLL sketches (hll_sketch_agg) unioned
      over each trailing window via a bounded day x window range join
      of the DAY-sized sketch frame — state is days x sketch bytes,
      the path for windows x cardinalities where even the cover-day
      frame is too hot. Estimates, not exact (same contract as
      sketch_rollup; pinned within tolerance in tests).

    Output: (day date, distinct_keys long, window_days int), one row
    per day (up to the max activity day) whose trailing window covers
    at least one activity — a day with NO active keys in its window
    has no row (count 0 by absence; pinned in tests). Early days are
    partial windows by construction ("28-day MAU as of day d"). NULL
    keys/timestamps are excluded.
    """
    if window_days < 1:
        raise ValueError(
            f"sliding_distinct: window_days >= 1, got {window_days}"
        )
    kd = (
        df.select(
            F.col(key_col).alias("_k"),
            F.to_date(F.col(ts_col).cast("timestamp")).alias("_d"),
        )
        .filter(F.col("_k").isNotNull() & F.col("_d").isNotNull())
        .distinct()
    )
    bounds = kd.agg(
        F.min("_d").alias("lo"), F.max("_d").alias("hi")
    ).first()
    if bounds["lo"] is None:
        return df.sparkSession.createDataFrame(
            [], "day date, distinct_keys long, window_days int"
        )
    if sketch:
        daily = kd.groupBy("_d").agg(
            F.expr("hll_sketch_agg(_k)").alias("sk")
        )
        cover = daily.select(
            F.explode(
                F.expr(
                    f"sequence(_d, date_add(_d, {window_days - 1}),"
                    " interval 1 day)"
                )
            ).alias("day"),
            "sk",
        ).filter(F.col("day") <= F.lit(bounds["hi"]))
        out = cover.groupBy("day").agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk))")
            .cast("long")
            .alias("distinct_keys")
        )
    else:
        cover = kd.select(
            "_k",
            F.explode(
                F.expr(
                    f"sequence(_d, date_add(_d, {window_days - 1}),"
                    " interval 1 day)"
                )
            ).alias("day"),
        ).filter(F.col("day") <= F.lit(bounds["hi"]))
        out = (
            cover.distinct()
            .groupBy("day")
            .agg(F.count(F.lit(1)).alias("distinct_keys"))
        )
    return out.select(
        "day",
        F.col("distinct_keys").cast("long").alias("distinct_keys"),
        F.lit(window_days).alias("window_days"),
    )


def fk_check(
    child: "DataFrame",
    parent: "DataFrame",
    keys: list[tuple[str, str]],
) -> "DataFrame":
    """Referential-integrity audit — the CROSS-TABLE member of the DQ
    family (:func:`check_rules` is single-table): how many child rows
    point at a parent key that does not exist ("orphaned lineitems",
    the classic broken-backfill symptom). Standard SQL FK semantics:
    a child row with ANY NULL key column passes vacuously (excluded
    from the check, counted separately).

    Plan: the child reduces to its KEY-LEVEL count frame first (one
    map-combined agg), so the anti-join against the parent's distinct
    keys is key-cardinality-sized on both sides — never a row-level
    child x parent join; at 100 TB the join cost tracks key counts,
    not table sizes.

    Output (one row): n_child (rows with fully non-null keys),
    n_null_keys (rows excluded by the NULL rule), n_keys (distinct
    child keys), n_orphans (child ROWS violating), n_orphan_keys,
    orphan_rate (6dp over n_child, NULL when n_child = 0), ok.
    """
    if not keys:
        raise ValueError("fk_check: keys must be non-empty")
    ck = [c for c, _ in keys]
    nn = None
    for c in ck:
        cond = F.col(c).isNotNull()
        nn = cond if nn is None else (nn & cond)
    child_rows = child.select(*ck)
    null_cnt = child_rows.filter(~nn).count()
    ckeys = (
        child_rows.filter(nn)
        .groupBy(*ck)
        .agg(F.count(F.lit(1)).alias("_c"))
        # key-sized, but consumed by the anti-join, the totals agg and
        # (via orphans) the orphan agg — each re-derived the child
        # scan before the r10 scan audit
        .localCheckpoint(eager=False)
    )
    pk = parent.select(
        *[F.col(p).alias(c) for c, p in keys]
    ).distinct()
    orphans = ckeys.join(pk, ck, "left_anti")
    agg = ckeys.agg(
        F.coalesce(F.sum("_c"), F.lit(0)).alias("n_child"),
        F.count(F.lit(1)).alias("n_keys"),
    ).crossJoin(
        orphans.agg(
            F.coalesce(F.sum("_c"), F.lit(0)).alias("n_orphans"),
            F.count(F.lit(1)).alias("n_orphan_keys"),
        )
    )
    return agg.select(
        F.col("n_child").cast("long").alias("n_child"),
        F.lit(int(null_cnt)).cast("long").alias("n_null_keys"),
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("n_orphans").cast("long").alias("n_orphans"),
        F.col("n_orphan_keys").cast("long").alias("n_orphan_keys"),
        F.round(
            F.try_divide(
                F.col("n_orphans").cast("double"), F.col("n_child")
            ),
            6,
        ).alias("orphan_rate"),
        (F.col("n_orphans") == 0).alias("ok"),
    )


def conformal_interval(
    cal_df: "DataFrame",
    y_col: str,
    yhat_col: str,
    alpha: float = 0.1,
    n_buckets: int = 32,
) -> "DataFrame":
    """Split-conformal prediction half-width (Vovk et al. / the
    standard split-conformal recipe): from a CALIBRATION frame of
    (actual, predicted) pairs, the finite-sample-corrected quantile
    q_hat of absolute residuals such that ``yhat ± q_hat`` covers a
    fresh point with probability >= 1 - alpha, distribution-free —
    the uncertainty band for ANY point predictor in the repo
    (holt_forecast, segment_trend, target_encode scorers).

    q_hat is the k-th smallest |y - yhat| with k = ceil((n+1)(1-alpha))
    — an EXACT order statistic, found without a global sort: the
    residual distinct-value count frame feeds the shared
    :func:`_midrank_map` two-level cumsum and q_hat is the smallest
    value whose through-cumulative reaches k (min-aggregate over the
    value frame). Raises when the calibration set is too small for
    the requested level (k > n — the standard conformal requirement
    n >= (1-alpha)/alpha points).

    Output (one row): n, k, q_hat (6dp), alpha.
    """
    if not (0.0 < alpha < 1.0):
        raise ValueError(f"conformal_interval: alpha in (0,1), got {alpha}")
    import math

    r = F.abs(
        F.col(y_col).cast("double") - F.col(yhat_col).cast("double")
    )
    counts = (
        cal_df.select(r.alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c_a"))
        .withColumn("c_b", F.lit(0))
        # value-domain-sized, but consumed by the scalar n probe AND
        # the midrank cumsum — each re-derived the corpus scan before
        # the r10 scan audit
        .localCheckpoint(eager=False)
    )
    n = counts.agg(F.sum("c_a")).first()[0] or 0
    k = math.ceil((n + 1) * (1.0 - alpha))
    if n == 0 or k > n:
        raise ValueError(
            f"conformal_interval: calibration set too small (n={n}, "
            f"need k={k} <= n for alpha={alpha})"
        )
    ranked = _midrank_map(counts, n_buckets)
    # through-cumulative from the midrank: cum(v) = rank + (t-1)/2
    qhat = ranked.filter(
        (F.col("rank") + (F.col("t") - 1) / 2.0) >= F.lit(float(k))
    ).agg(F.min("v").alias("q"))
    return qhat.select(
        F.lit(int(n)).cast("long").alias("n"),
        F.lit(int(k)).cast("long").alias("k"),
        F.round("q", 6).alias("q_hat"),
        F.lit(float(alpha)).alias("alpha"),
    )


def winsorize(
    df: "DataFrame",
    value_col: str,
    lower: float = 0.01,
    upper: float = 0.99,
    group_cols: list[str] | None = None,
) -> "DataFrame":
    """Winsorization — clamp a metric to its [lower, upper] exact
    interpolated percentiles, per group when ``group_cols`` is given:
    the standard heavy-tail taming transform before means/OLS/scalers
    (the transform-side companion to :func:`mad_outliers`, which only
    FLAGS; a winsorized mean keeps the row count while a trimmed mean
    drops data).

    ONE map-combined percentile aggregation per group (exact
    interpolated `percentile`, the rfm_segments/theilsen discipline —
    group-count-sized output), broadcast-joined back; the clamp is a
    codegen projection. NULL values pass through unclamped (nothing
    to clamp; documented to match the oracle).

    Output: input columns + ``<value_col>_w`` (clamped, 6dp) + the
    group's ``_lo`` / ``_hi`` bounds (6dp) for auditability.
    """
    if not (0.0 <= lower < upper <= 1.0):
        raise ValueError(
            f"winsorize: need 0 <= lower < upper <= 1, got "
            f"({lower}, {upper})"
        )
    v = F.col(value_col).cast("double")
    gcols = list(group_cols or [])
    agg = F.expr(
        f"percentile({value_col}, array({lower!r}, {upper!r}))"
    ).alias("_b")
    if gcols:
        bounds = df.groupBy(*gcols).agg(agg)
        joined = df.join(F.broadcast(bounds), gcols, "left")
    else:
        bounds = df.agg(agg)
        joined = df.crossJoin(F.broadcast(bounds))
    lo = F.col("_b")[0]
    hi = F.col("_b")[1]
    clamped = F.when(v < lo, lo).when(v > hi, hi).otherwise(v)
    return joined.select(
        *df.columns,
        F.round(clamped, 6).alias(f"{value_col}_w"),
        F.round(lo, 6).alias("_lo"),
        F.round(hi, 6).alias("_hi"),
    )


def k_anonymity(
    df: "DataFrame",
    qi_cols: list[str],
    k: int = 5,
    sensitive_col: str | None = None,
) -> "DataFrame":
    """k-anonymity audit (Sweeney 2002) — the privacy screen for a
    training-data release: every row should be indistinguishable from
    at least k-1 others on its quasi-identifier combination (zip x
    age x gender is the canonical re-identification vector). Reports
    how far the table is from k-anonymous, and — when
    ``sensitive_col`` is given — the l-diversity floor (min distinct
    sensitive values within any equivalence class; a k-anonymous
    class with ONE diagnosis still leaks it).

    ONE map-combined (QI-combination -> size [+ distinct-sensitive])
    aggregation — equivalence classes ARE the group-by; the audit
    then reduces the class frame (class-count-sized, never row-sized)
    to a single row. NULL is a QI value (two rows with NULL zip are
    indistinguishable from each other — grouped, not dropped).

    Output (one row): n, n_classes, k (the threshold), min_class_size,
    n_violating_rows (rows in classes smaller than k),
    violating_share (6dp), anonymous (true iff no violations), and
    with ``sensitive_col``: l_min (the l-diversity floor) else NULL.
    """
    if not qi_cols:
        raise ValueError("k_anonymity: qi_cols must be non-empty")
    if k < 2:
        raise ValueError(f"k_anonymity: k must be >= 2, got {k}")
    aggs = [F.count(F.lit(1)).alias("_sz")]
    if sensitive_col:
        aggs.append(
            F.countDistinct(F.col(sensitive_col)).alias("_l")
        )
    classes = df.groupBy(*qi_cols).agg(*aggs)
    out = classes.agg(
        F.coalesce(F.sum("_sz"), F.lit(0)).alias("n"),
        F.count(F.lit(1)).alias("n_classes"),
        F.min("_sz").alias("min_class_size"),
        F.coalesce(
            F.sum(F.when(F.col("_sz") < k, F.col("_sz"))), F.lit(0)
        ).alias("n_violating_rows"),
        *(
            [F.min("_l").alias("l_min")]
            if sensitive_col
            else [F.min(F.lit(None).cast("long")).alias("l_min")]
        ),
    )
    return out.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_classes").cast("long").alias("n_classes"),
        F.lit(k).alias("k"),
        F.col("min_class_size").cast("long").alias("min_class_size"),
        F.col("n_violating_rows").cast("long").alias("n_violating_rows"),
        F.round(
            F.try_divide(
                F.col("n_violating_rows").cast("double"), F.col("n")
            ),
            6,
        ).alias("violating_share"),
        (F.col("n_violating_rows") == 0).alias("anonymous"),
        F.col("l_min").cast("long").alias("l_min"),
    )


def ab_power(
    df: "DataFrame",
    variant_col: str,
    metric_col: str,
    variant_a: str = "a",
    variant_b: str = "b",
    mde_rel: float = 0.02,
    z_alpha: float = 1.96,
    z_beta: float = 0.84,
) -> DataFrame:
    """Sample-size / power readout for a two-arm experiment — the
    PLANNING member of the experimentation family (ab_test_report
    reads a finished test, cuped_ab shrinks its variance, this one
    says how long to run the NEXT one): from the measured metric mean
    and variance, the per-arm n required to detect a relative lift of
    ``mde_rel`` at the z_alpha/z_beta normal approximation,
    ``n = 2 * (z_alpha + z_beta)^2 * var / delta^2`` (the standard
    two-sample formula), plus the detectable-lift curve inverted at
    the CURRENT sample size ("what MDE do we already have power
    for").

    ONE map-side-combined moment aggregation over the unit frame
    (pooled across both arms — planning uses the best variance
    estimate available); everything else is a closed-form projection.
    NULL metrics drop (the ab_test_report contract).

    Output (one row, 6dp): n_units, mean, variance, mde_rel,
    n_required_per_arm (ceil), mde_detectable_rel (the relative lift
    the current per-arm n already powers). Degenerate inputs (zero
    mean or zero variance) yield NULL sizing.
    """
    if not (0.0 < mde_rel):
        raise ValueError(f"ab_power: mde_rel must be > 0, got {mde_rel}")
    v = F.col(variant_col)
    x = F.col(metric_col).cast("double")
    base = df.filter(x.isNotNull() & v.isin(variant_a, variant_b))
    agg = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(x).alias("mean"),
        F.var_samp(x).alias("var"),
        (
            F.count(F.when(v == F.lit(variant_a), 1)) / 2
            + F.count(F.when(v == F.lit(variant_b), 1)) / 2
        ).alias("_n_arm_avg"),
    )
    kappa = F.lit(2.0 * (z_alpha + z_beta) ** 2)
    delta = F.abs(F.col("mean")) * F.lit(mde_rel)
    ok = (F.col("var") > 0) & (delta > 0)
    n_req = F.ceil(kappa * F.col("var") / (delta * delta))
    mde_det = F.sqrt(
        kappa * F.col("var") / F.col("_n_arm_avg")
    ) / F.abs(F.col("mean"))
    return agg.select(
        F.col("n").cast("long").alias("n_units"),
        F.round("mean", 6).alias("mean"),
        F.round("var", 6).alias("variance"),
        F.lit(float(mde_rel)).alias("mde_rel"),
        F.when(ok, n_req).cast("long").alias("n_required_per_arm"),
        F.round(
            F.when(ok & (F.col("_n_arm_avg") > 0), mde_det), 6
        ).alias("mde_detectable_rel"),
    )


def holt_winters_forecast(
    df: "DataFrame",
    group_cols: list[str],
    order_col: str,
    value_col: str,
    period: int,
    alpha: float = 0.5,
    beta: float = 0.3,
    gamma: float = 0.3,
    horizon: int = 7,
) -> "DataFrame":
    """Holt-Winters ADDITIVE seasonal forecast per segment (triple
    exponential smoothing, Winters 1960) — the seasonal completion of
    :func:`holt_forecast`: level + trend + an m-slot seasonal state,
    the right model when seasonal_anomalies / acf show a strong
    period (daily cycle in hourly events, weekly cycle in dailies).

    Classic init over the ordered series x_1..x_n (requires
    n >= 2 * period): l = mean of season 1, b = the mean
    season-over-season step ((x_{m+i} - x_i) / m averaged), s_i =
    x_i - l. Then the textbook additive recurrences::

        l_t = alpha * (x_t - s_{t-m}) + (1 - alpha) * (l + b)
        b_t = beta * (l_t - l) + (1 - beta) * b
        s_t = gamma * (x_t - l_t) + (1 - gamma) * s_{t-m}

    h-step forecast: l_n + h * b_n + s from the matching seasonal
    slot. A perfectly periodic series reproduces itself EXACTLY
    (zero-trend fixpoint of the recurrences — pinned in tests).

    Same execution discipline as holt_forecast / cusum: the coupled
    (l, b, s[1..m]) fold is ONE Arrow per-group pass over a
    pre-aggregated calendar-bounded series; one keyed exchange,
    horizon-sized output per group; (order, value) mergesort ties.
    SQL-replayable after all: the m+2-wide state rides a recursive
    CTE as a list column (the gate's oracle is bit-exact vs this
    fold, sse included); pure-python parity also pinned in tests.

    Output per group per h in 1..horizon: group_cols + h + forecast +
    level + trend + seasonal (the slot used) + n_obs + sse (one-step
    fit errors over t > m), 6dp.
    """
    import pandas as pd

    if period < 2:
        raise ValueError(
            f"holt_winters_forecast: period >= 2, got {period}"
        )
    if horizon < 1:
        raise ValueError(
            f"holt_winters_forecast: horizon >= 1, got {horizon}"
        )
    m = int(period)
    base = df.select(
        *group_cols,
        F.col(order_col).alias("_ord"),
        F.col(value_col).cast("double").alias("_val"),
    )
    out_fields = ", ".join(
        f"`{c}` {dict(df.dtypes)[c]}" for c in group_cols
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_ord", "_val"], kind="mergesort")
        xs = [float(v) for v in pdf["_val"]]
        n = len(xs)
        head = [pdf[c].iloc[0] for c in group_cols]
        if n < 2 * m:
            # under-determined seasonal state: emit nothing rather
            # than a fake season (documented; callers fall back to
            # holt_forecast)
            return pd.DataFrame(
                columns=[*group_cols, "h", "forecast", "level",
                         "trend", "seasonal", "n_obs", "sse"]
            )
        lvl = sum(xs[:m]) / m
        trd = sum((xs[m + i] - xs[i]) / m for i in range(m)) / m
        season = [xs[i] - lvl for i in range(m)]
        sse = 0.0
        for t in range(m, n):
            s_old = season[t % m]
            yhat = lvl + trd + s_old
            err = xs[t] - yhat
            sse += err * err
            lvl_new = alpha * (xs[t] - s_old) + (1 - alpha) * (lvl + trd)
            trd = beta * (lvl_new - lvl) + (1 - beta) * trd
            season[t % m] = gamma * (xs[t] - lvl_new) + (1 - gamma) * s_old
            lvl = lvl_new
        rows = []
        for h in range(1, horizon + 1):
            s_h = season[(n + h - 1) % m]
            rows.append(
                head
                + [
                    h,
                    round(lvl + h * trd + s_h, 6),
                    round(lvl, 6),
                    round(trd, 6),
                    round(s_h, 6),
                    n,
                    round(sse, 6),
                ]
            )
        return pd.DataFrame(
            rows,
            columns=[*group_cols, "h", "forecast", "level", "trend",
                     "seasonal", "n_obs", "sse"],
        )

    return base.groupBy(*group_cols).applyInPandas(
        fn,
        schema=(
            f"{out_fields}, h int, forecast double, level double, "
            "trend double, seasonal double, n_obs bigint, sse double"
        ),
    )


def sequence_pairs(
    df: "DataFrame",
    seq_col: str,
    ts_col: str,
    event_col: str,
    min_support: float = 0.01,
    top_n: int = 50,
) -> "DataFrame":
    """GAP-ALLOWED sequential pattern mining at length 2 (the level-2
    AprioriAll/GSP pass, Agrawal & Srikant 1995) — "users who do A
    eventually do B", with ANY number of events between: the member
    of the behavioral family event_transitions (adjacent bigrams) and
    window_funnel (fixed step list) cannot express.

    The scalable trick: sequence s supports A -> B iff min_ts(A in s)
    < max_ts(B in s) — one per-(sequence, event) min/max aggregation
    (the only corpus pass), then a self-join ON SEQUENCE over the
    per-sequence TYPE frame, whose fan-out is bounded by (distinct
    event types per sequence)², never events². A == B is supported
    exactly when the event repeats (min < max handles it with no
    special case). Strictly-less means simultaneous timestamps never
    support an order (deterministic under ties).

    Output: top_n rows (antecedent, consequent, n_seqs, support =
    n_seqs / sequences-with-any-event, 6dp), support >= min_support,
    ordered by support desc then antecedent, consequent; ties at the
    cut resolve by that total order. The cut is sort+limit
    (TakeOrderedAndProject — distributed per-partition partial top-n,
    the join_explosion pattern above), NOT an unpartitioned rank
    window: the pair frame is (distinct event types)²-bounded by the
    contract, but a caller with 10⁴+ types would otherwise funnel
    ~10⁸ support-filtered pairs through one window task (r12 VERDICT
    item 4).
    """
    if not (0.0 < min_support <= 1.0):
        raise ValueError(
            f"sequence_pairs: min_support in (0, 1], got {min_support}"
        )
    if top_n < 1:
        raise ValueError(f"sequence_pairs: top_n >= 1, got {top_n}")
    se = (
        df.select(
            F.col(seq_col).alias("_s"),
            F.col(event_col).cast("string").alias("_e"),
            F.col(ts_col).cast("timestamp").alias("_ts"),
        )
        .filter(F.col("_e").isNotNull() & F.col("_ts").isNotNull())
        .groupBy("_s", "_e")
        .agg(F.min("_ts").alias("_mn"), F.max("_ts").alias("_mx"))
    )
    n_seqs_total = se.select("_s").distinct().count()
    if n_seqs_total == 0:
        return df.sparkSession.createDataFrame(
            [],
            "antecedent string, consequent string, n_seqs long,"
            " support double",
        )
    a = se.select(
        F.col("_s"), F.col("_e").alias("antecedent"), F.col("_mn")
    )
    b = se.select(
        F.col("_s"), F.col("_e").alias("consequent"), F.col("_mx")
    )
    pairs = (
        a.join(b, "_s")
        .filter(F.col("_mn") < F.col("_mx"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).alias("n_seqs"))
        .withColumn(
            "support",
            F.round(F.col("n_seqs") / F.lit(float(n_seqs_total)), 6),
        )
        .filter(F.col("support") >= min_support)
    )
    return pairs.orderBy(
        F.desc("support"), F.asc("antecedent"), F.asc("consequent")
    ).limit(top_n)


def cohort_ltv(
    df: "DataFrame",
    seq_col: str,
    ts_col: str,
    value_col: str,
) -> "DataFrame":
    """Cohort lifetime-value triangle — the REVENUE companion to the
    count-based retention triangle: cohort = the Monday week of an
    entity's first event; each (cohort, week offset) cell carries
    that week's revenue from the cohort's members, the running
    cumulative, and LTV-per-user (cumulative / cohort size) — the
    curve whose plateau says what a user is worth and whose
    cohort-over-cohort shift says whether acquisition quality moved.

    One (entity -> first ts) keyed agg, one keyed join back, one
    (cohort, offset) map-combined revenue agg; the cumulative is a
    per-cohort window over <= calendar-weeks rows (bounded, the
    ks_drift offset discipline). NULL values count 0 revenue but
    still mark activity.

    Output: cohort_week (date string yyyy-MM-dd), week_offset int,
    n_users (cohort size), revenue, cum_revenue, ltv (6dp), ordered
    by cohort then offset.
    """
    ev = df.select(
        F.col(seq_col).alias("_u"),
        F.to_date(F.col(ts_col).cast("timestamp")).alias("_d"),
        F.coalesce(F.col(value_col).cast("double"), F.lit(0.0)).alias(
            "_v"
        ),
    ).filter(F.col("_u").isNotNull() & F.col("_d").isNotNull())
    # the entity-sized first-activity frame feeds the cohort sizes AND
    # the join back onto the event stream — each re-derived the event
    # scan before the r10 scan audit
    first = ev.groupBy("_u").agg(
        F.date_trunc("week", F.min("_d")).cast("date").alias("_cw")
    ).localCheckpoint(eager=False)
    sizes = first.groupBy("_cw").agg(F.count(F.lit(1)).alias("n_users"))
    cells = (
        ev.join(first, "_u")
        .withColumn(
            "week_offset",
            (F.datediff(F.col("_d"), F.col("_cw")) / 7).cast("int"),
        )
        .groupBy("_cw", "week_offset")
        .agg(F.sum("_v").alias("_rev"))
    )
    w = Window.partitionBy("_cw").orderBy("week_offset")
    out = (
        cells.withColumn("_cum", F.sum("_rev").over(w))
        .join(sizes, "_cw")
        .select(
            F.date_format("_cw", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_users",
            F.round("_rev", 6).alias("revenue"),
            F.round("_cum", 6).alias("cum_revenue"),
            F.round(F.col("_cum") / F.col("n_users"), 6).alias("ltv"),
        )
    )
    return out.orderBy("cohort_week", "week_offset")


def ewma_control(
    df: "DataFrame",
    group_cols: list[str],
    order_col: str,
    value_col: str,
    lam: float = 0.2,
    L: float = 3.0,
) -> "DataFrame":
    """EWMA control chart per segment (Roberts 1959, the SPC
    standard for detecting SMALL sustained shifts that a Shewhart
    3-sigma rule misses and that CUSUM locates but does not bound):
    z_t = lam * x_t + (1 - lam) * z_{t-1} with z_0 = the series mean,
    against time-varying control limits mean +/- L * sigma *
    sqrt(lam / (2 - lam) * (1 - (1 - lam)^(2t))) — the exact
    finite-start variance, so early points get the tighter limits
    they deserve. Phase-I convention: mean and sigma (sample) come
    from the series itself.

    The z recurrence is a linear fold (the cusum/holt discipline):
    ONE keyed exchange into an Arrow per-group pass over the
    pre-aggregated calendar-bounded series; (order, value) mergesort
    ties. Output is series-sized per group (each point gets its z and
    limits — the chart IS the output).

    Output per (group, point): group_cols + order_col + value + z +
    ucl + lcl + breach (|z - mean| beyond the limit), 6dp. Groups
    with n < 2 or zero variance emit rows with NULL limits and
    breach = false (nothing to bound).
    """
    import pandas as pd

    if not (0.0 < lam <= 1.0):
        raise ValueError(f"ewma_control: lam in (0, 1], got {lam}")
    if L <= 0:
        raise ValueError(f"ewma_control: L > 0, got {L}")
    base = df.select(
        *group_cols,
        F.col(order_col).alias("_ord"),
        F.col(value_col).cast("double").alias("_val"),
    )
    dtypes = dict(df.dtypes)
    out_fields = ", ".join(f"`{c}` {dtypes[c]}" for c in group_cols)
    ord_type = dtypes[order_col]

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        pdf = pdf.sort_values(["_ord", "_val"], kind="mergesort")
        xs = [float(v) for v in pdf["_val"]]
        n = len(xs)
        mean = sum(xs) / n
        var = (
            sum((x - mean) ** 2 for x in xs) / (n - 1) if n > 1 else None
        )
        sd = math.sqrt(var) if var and var > 0 else None
        head = [pdf[c].iloc[0] for c in group_cols]
        z = mean
        rows = []
        for t, x in enumerate(xs, start=1):
            z = lam * x + (1 - lam) * z
            if sd is not None:
                half = (
                    L
                    * sd
                    * math.sqrt(
                        lam / (2 - lam) * (1 - (1 - lam) ** (2 * t))
                    )
                )
                ucl, lcl = mean + half, mean - half
                breach = z > ucl or z < lcl
            else:
                ucl = lcl = None
                breach = False
            rows.append(
                head
                + [
                    pdf["_ord"].iloc[t - 1],
                    round(x, 6),
                    round(z, 6),
                    round(ucl, 6) if ucl is not None else None,
                    round(lcl, 6) if lcl is not None else None,
                    breach,
                ]
            )
        return pd.DataFrame(
            rows,
            columns=[*group_cols, "_ord", "value", "z", "ucl", "lcl",
                     "breach"],
        )

    out = base.groupBy(*group_cols).applyInPandas(
        fn,
        schema=(
            f"{out_fields}, `_ord` {ord_type}, value double, z double,"
            " ucl double, lcl double, breach boolean"
        ),
    )
    return out.withColumnRenamed("_ord", order_col)


def pr_auc(
    df: "DataFrame",
    label_col: str,
    score_col: str,
    n_buckets: int = 32,
) -> "DataFrame":
    """Average precision (PR-AUC, the sklearn
    ``average_precision_score`` step definition) — the ranking metric
    that matters when positives are RARE: ROC-AUC stays flattering
    under class imbalance (false positives barely move its FPR axis),
    precision-recall does not. Identity used: over distinct score
    thresholds v (descending), AP = sum_v [c_pos(v) / n_pos] *
    precision(v) with precision(v) = TP(v) / (TP(v) + FP(v)) and
    TP(v) = positives scoring >= v — every term derives from the
    distinct-value count frame and its cumulative sums, so ties are
    handled exactly as sklearn's threshold semantics, not
    arbitrarily.

    Scale shape (the roc_auc discipline): one map-combined
    (score -> pos, neg counts) agg is the only corpus pass; the
    ascending cumulatives come from the same two-level bucketed
    cumsum pattern (per-bucket parallel windows + an n_buckets-row
    offset frame — never a single-partition data window); AP is one
    final aggregate over the value frame. Label/exclusion contract as
    roc_auc (non-binary / NULL rows excluded).

    Output (one row): n_pos, n_neg, pr_auc (6dp), prevalence
    (n_pos / n — the random-classifier baseline AP). Degenerate
    single-class input yields NULL pr_auc.
    """
    y = F.col(label_col).cast("double")
    counts = (
        df.select(y.alias("_y"), F.col(score_col).cast("double").alias("v"))
        .filter(F.col("v").isNotNull() & F.col("_y").isin(0.0, 1.0))
        .groupBy("v")
        .agg(
            F.count(F.when(F.col("_y") == 1.0, 1)).alias("c_a"),
            F.count(F.when(F.col("_y") == 0.0, 1)).alias("c_b"),
        )
    )
    tot = counts.agg(
        F.sum("c_a").alias("np"), F.sum("c_b").alias("nn")
    ).first()
    n_pos, n_neg = int(tot["np"] or 0), int(tot["nn"] or 0)
    if n_pos == 0 or n_neg == 0:
        return df.sparkSession.range(1).select(
            F.lit(n_pos).alias("n_pos"),
            F.lit(n_neg).alias("n_neg"),
            F.lit(None).cast("double").alias("pr_auc"),
            F.lit(None).cast("double").alias("prevalence"),
        )
    qs = [i / n_buckets for i in range(1, n_buckets)]
    edges_row = counts.agg(
        F.expr(
            "approx_percentile(v, array("
            f"{', '.join(str(q) for q in qs)}), 1000)"
        ).alias("e")
    ).first()
    edges = sorted({float(x) for x in edges_row["e"]})
    b = F.lit(0)
    for i, e in enumerate(edges):
        b = F.when(F.col("v") > F.lit(e), F.lit(i + 1)).otherwise(b)
    bucketed = counts.withColumn("bucket", b)
    w = Window.partitionBy("bucket").orderBy("v")
    cum = bucketed.select(
        "bucket", "v", "c_a", "c_b",
        F.sum("c_a").over(w).alias("ca_i"),
        F.sum("c_b").over(w).alias("cb_i"),
    )
    bw = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )  # single-partition window over <= n_buckets rows — bounded
    offsets = (
        bucketed.groupBy("bucket")
        .agg(F.sum("c_a").alias("ba"), F.sum("c_b").alias("bb"))
        .select(
            "bucket",
            F.coalesce(F.sum("ba").over(bw), F.lit(0)).alias("oa"),
            F.coalesce(F.sum("bb").over(bw), F.lit(0)).alias("ob"),
        )
    )
    tp = F.lit(n_pos) - (F.col("oa") + F.col("ca_i")) + F.col("c_a")
    fp = F.lit(n_neg) - (F.col("ob") + F.col("cb_i")) + F.col("c_b")
    ap = (
        cum.join(F.broadcast(offsets), "bucket")
        .agg(
            F.sum(
                F.col("c_a")
                / F.lit(float(n_pos))
                * (tp.cast("double") / (tp + fp))
            ).alias("_ap")
        )
    )
    return ap.select(
        F.lit(n_pos).alias("n_pos"),
        F.lit(n_neg).alias("n_neg"),
        F.round("_ap", 6).alias("pr_auc"),
        F.round(
            F.lit(float(n_pos) / (n_pos + n_neg)), 6
        ).alias("prevalence"),
    )


def quantile_map(
    new_df: "DataFrame",
    ref_df: "DataFrame",
    value_col: str,
    n_buckets: int = 32,
) -> "DataFrame":
    """Quantile mapping — re-express a column on a REFERENCE
    distribution's scale (``mapped = Q_ref(F_new(v))``, the Q-Q /
    quantile-matching normalization of bias correction and
    cross-model score calibration): after mapping, the new column's
    distribution matches the reference's, so scores from different
    models/shards/eras become comparable and thresholds tuned on the
    reference transfer.

    F_new via Hazen plotting positions on the NEW distinct-value
    midranks (p = (midrank - 0.5) / n, the shared
    :func:`_midrank_map` engine — ties map identically by
    construction); Q_ref is the exact type-7 interpolated quantile,
    evaluated WITHOUT sorting the reference: the two bracketing order
    statistics per target (floor/ceil of p * (n_ref - 1)) resolve
    against the reference's cumulative-range frame through a
    POSITION-BUCKETED equi join — ranges replicate only to the
    buckets they overlap (<= n_buckets + #distinct-values extra
    rows), every join is keyed, nothing single-partitions.

    Output: the new frame's distinct values ``(value, p, mapped)``
    (6dp) — join back on ``value`` to transform row frames (kept
    value-level so the result is reusable as a calibration table).
    Raises on an empty reference; empty new input yields no rows.
    """
    from indexlab_spark.functions.cache import pin as _pin_

    def _counts(src):
        return (
            src.select(F.col(value_col).cast("double").alias("v"))
            .filter(F.col("v").isNotNull())
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("c_a"))
            .withColumn("c_b", F.lit(0))
        )

    # r17 (r16 VERDICT item 7): the two sizing .first() jobs and the
    # two per-distribution approx_percentile actions fold into ONE
    # grouped-midrank chain over the tagged union — one driver job
    # (edges + totals per group) and one agg/window chain total.
    counts = (
        _counts(new_df).withColumn("_g", F.lit("new"))
        .unionByName(_counts(ref_df).withColumn("_g", F.lit("ref")))
    )
    rmap, group_n = _midrank_map_grouped(counts, n_buckets)
    n_ref = group_n.get("ref", 0)
    n_new = group_n.get("new", 0)
    if n_ref == 0:
        raise ValueError("quantile_map: empty reference distribution")
    if n_new == 0:
        return new_df.sparkSession.createDataFrame(
            [], "value double, p double, mapped double"
        )
    rmap = _pin_(rmap, deser=True)  # feeds targets AND ref_ranges
    # targets: Hazen p per distinct new value, bracketing ref positions
    targets = rmap.filter(F.col("_g") == "new").select(
        F.col("v").alias("value"),
        ((F.col("rank") - 0.5) / F.lit(float(n_new))).alias("p"),
    ).withColumn(
        "_h", F.col("p") * F.lit(float(n_ref - 1))
    ).withColumn(
        "_k0", F.floor("_h").cast("long")
    ).withColumn(
        "_k1", F.least(F.col("_k0") + 1, F.lit(n_ref - 1))
    ).withColumn(
        "_frac", F.col("_h") - F.col("_k0")
    )
    # reference cumulative ranges [lo, hi] of 0-indexed positions per
    # distinct value (midrank encodes the range: lo = rank-(t+1)/2,
    # hi = lo + t - 1)
    ref_ranges = rmap.filter(F.col("_g") == "ref").select(
        F.col("v").alias("_rv"),
        (F.col("rank") - (F.col("t") + 1) / 2.0).cast("long").alias("_lo"),
        (F.col("rank") + (F.col("t") + 1) / 2.0 - 2).cast("long").alias(
            "_hi"
        ),
    )
    width = max(1, -(-int(n_ref) // 1024))  # <= 1024 position buckets
    ref_bucketed = ref_ranges.select(
        "_rv", "_lo", "_hi",
        F.explode(
            F.sequence(
                (F.col("_lo") / width).cast("long"),
                (F.col("_hi") / width).cast("long"),
            )
        ).alias("_pb"),
    )

    def lookup(k_col, alias):
        need = targets.select(
            "value", F.col(k_col).alias("_k")
        ).withColumn("_pb", (F.col("_k") / width).cast("long"))
        hit = need.join(ref_bucketed, "_pb").filter(
            (F.col("_k") >= F.col("_lo")) & (F.col("_k") <= F.col("_hi"))
        )
        return hit.select("value", F.col("_rv").alias(alias))

    a0 = lookup("_k0", "_a0")
    a1 = lookup("_k1", "_a1")
    return (
        targets.join(a0, "value").join(a1, "value")
        .select(
            "value",
            F.round("p", 6).alias("p"),
            F.round(
                F.col("_a0") * (1 - F.col("_frac"))
                + F.col("_a1") * F.col("_frac"),
                6,
            ).alias("mapped"),
        )
    )


def srm_check(
    df: "DataFrame",
    variant_col: str,
    expected: dict[str, float],
    crit: float = 3.841,
) -> DataFrame:
    """Sample-ratio-mismatch guardrail for an experiment assignment
    (the standard pre-read validity check: if the observed arm split
    deviates from the DESIGNED split, the readout is untrustworthy —
    randomization, logging, or bot filtering broke). Chi-square
    goodness-of-fit of the observed per-arm unit counts against the
    expected shares, per-arm contribution rows plus a ``<ALL>`` total
    row carrying the statistic and the flag (the benford_test shape).

    Distributed shape: ONE map-side-combined count aggregation to the
    arm-sized frame (arms are the group-by — never more than a handful
    of rows), expected shares as a broadcast literal frame, total as a
    broadcast one-row sum. Nothing row-sized leaves the executors.

    ``crit`` is the chi-square critical value; the 3.841 default is
    df=1 at alpha=0.05, i.e. a TWO-arm design — pass the right
    quantile for more arms (5.991 for 3, 7.815 for 4). The flag lives
    only on the total row; arm rows carry NULL srm. Units whose
    variant is not in ``expected`` fail loudly (an unknown arm IS a
    mismatch) rather than being silently dropped — they surface as an
    ``<UNEXPECTED>`` row whose contribution uses expected share 0 and
    therefore forces the flag when present.

    Output: variant, n (long), expected_share, expected_n,
    chi2_contrib (6dp), and the total row (variant='<ALL>') with
    chi2 = sum of contributions and srm = chi2 > crit.
    """
    _srm_validate(expected)
    known = list(expected)
    v = F.col(variant_col)
    counts = df.select(
        F.when(v.isin(known), v).otherwise(F.lit("<UNEXPECTED>")).alias(
            "variant"
        )
    ).groupBy("variant").agg(F.count(F.lit(1)).alias("n"))
    return _srm_table(counts, expected, crit)


def _srm_validate(expected: dict[str, float]) -> None:
    if not expected:
        raise ValueError("srm_check: expected shares must be non-empty")
    tot_share = sum(expected.values())
    if abs(tot_share - 1.0) > 1e-9:
        raise ValueError(
            f"srm_check: expected shares must sum to 1, got {tot_share}"
        )
    if any(s <= 0 for s in expected.values()):
        raise ValueError("srm_check: expected shares must be > 0")


def _srm_table(
    counts: "DataFrame", expected: dict[str, float], crit: float
) -> DataFrame:
    """Shared SRM tail over a (variant, n) counts frame — srm_check
    feeds it the batch aggregation, the streaming monitor's totals
    reader feeds it the folded per-batch state, so drained-stream
    results EXACTLY equal the one-shot check."""
    spark = counts.sparkSession
    exp = spark.createDataFrame(
        [(k, float(s)) for k, s in expected.items()],
        "variant string, expected_share double",
    )
    # outer join: designed arms with ZERO observed units still appear
    # (n=0 against a positive expectation is the worst mismatch).
    cells = counts.join(F.broadcast(exp), "variant", "full_outer").select(
        "variant",
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        F.coalesce("expected_share", F.lit(0.0)).alias("expected_share"),
    )
    # the grand total via a window over the ARM-SIZED cells frame —
    # an agg + crossJoin-back would re-derive cells and re-scan the
    # corpus (Spark does not share common subplans across branches);
    # the unpartitioned window is over arms+1 rows, not data
    cells = cells.withColumn(
        "_tot",
        F.sum("n").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    exp_n = F.col("expected_share") * F.col("_tot")
    contrib = F.when(
        exp_n > 0,
        F.try_divide((F.col("n") - exp_n) * (F.col("n") - exp_n), exp_n),
    ).otherwise(
        # unexpected arm: expected 0 -> infinite chi2 in theory; carry
        # the count itself so the total always breaches a finite crit
        F.when(F.col("n") > 0, F.lit(float(crit)) + F.col("n"))
        .otherwise(F.lit(0.0))
    )
    # arm rows AND the <ALL> total in ONE pass: a rollup over the
    # arm-sized cells frame — a union of two branches would re-derive
    # cells and RE-SCAN the corpus for the total row (audited via
    # explain; rollup's Expand merely doubles the arm-sized frame)
    scored = cells.select(
        "variant", "n", "expected_share", exp_n.alias("_en"),
        contrib.alias("_c"),
    )
    g = scored.rollup("variant").agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("expected_share").alias("_sh"),
        F.sum("_en").alias("_ens"),
        F.sum("_c").alias("_cs"),
        F.grouping("variant").alias("_g"),
    )
    is_tot = F.col("_g") == 1
    return g.select(
        F.coalesce("variant", F.lit("<ALL>")).alias("variant"),
        "n",
        F.round("_sh", 6).alias("expected_share"),
        F.round("_ens", 6).alias("expected_n"),
        F.when(~is_tot, F.round("_cs", 6)).alias("chi2_contrib"),
        F.when(is_tot, F.round("_cs", 6)).alias("chi2"),
        F.when(is_tot, F.col("_cs") > F.lit(float(crit))).alias("srm"),
    )


def delta_method_ratio(
    df: "DataFrame",
    variant_col: str,
    num_col: str,
    den_col: str,
    variant_a: str = "a",
    variant_b: str = "b",
    z_crit: float = 1.96,
) -> DataFrame:
    """Ratio-metric two-arm readout with delta-method variance (Deng,
    Knoblich & Lu 2018, public): metrics like revenue-per-session or
    clicks-per-view are RATIOS of two per-unit sums, R = sum(x) /
    sum(y), and treating the per-unit ratio as the metric is both a
    different estimand and biased for small denominators. The delta
    method gives Var(R) ~= (var_x - 2 R cov_xy + R^2 var_y) /
    (n * ybar^2) from per-unit moments — the missing member between
    ab_test_report (per-unit means) and cuped_ab (adjusted means).

    ONE filtered-aggregate moment reduction over the unit frame (the
    cuped_ab shape): per arm n, sum x, sum y, sum x^2, sum y^2,
    sum xy; the ratios, delta-method variances, lift and the z test
    are all closed-form projections of that single row. The
    corpus is never rescanned or self-joined.

    NULL contract: units with NULL numerator or denominator leave
    entirely (ab_test_report); an arm with n < 2, a zero denominator
    sum, or zero combined variance yields NULL statistics and a false
    flag. Output (one row, 6dp): n_a, n_b, ratio_a, ratio_b, lift_rel,
    se, z_stat, z_sig.
    """
    v = F.col(variant_col)
    x = F.col(num_col).cast("double")
    y = F.col(den_col).cast("double")
    base = df.filter(
        x.isNotNull() & y.isNotNull() & v.isin(variant_a, variant_b)
    )

    def arm(val, expr, agg):
        return agg(F.when(v == F.lit(val), expr))

    agg = base.agg(
        *[
            e
            for val, tag in ((variant_a, "a"), (variant_b, "b"))
            for e in (
                arm(val, x, F.count).alias(f"n_{tag}"),
                arm(val, x, F.sum).alias(f"sx_{tag}"),
                arm(val, y, F.sum).alias(f"sy_{tag}"),
                arm(val, x * x, F.sum).alias(f"qx_{tag}"),
                arm(val, y * y, F.sum).alias(f"qy_{tag}"),
                arm(val, x * y, F.sum).alias(f"xy_{tag}"),
            )
        ],
    )

    def ratio_var(tag):
        # try_divide throughout: ANSI mode + codegen common-subexpression
        # elimination can evaluate a guarded branch's divisions even when
        # the F.when guard is false.
        na = F.col(f"n_{tag}").cast("double")
        mx = F.try_divide(F.col(f"sx_{tag}"), na)
        my = F.try_divide(F.col(f"sy_{tag}"), na)
        r = F.try_divide(F.col(f"sx_{tag}"), F.col(f"sy_{tag}"))
        vx = F.try_divide(F.col(f"qx_{tag}") - na * mx * mx, na - 1)
        vy = F.try_divide(F.col(f"qy_{tag}") - na * my * my, na - 1)
        cxy = F.try_divide(F.col(f"xy_{tag}") - na * mx * my, na - 1)
        var_r = F.try_divide(
            vx - 2 * r * cxy + r * r * vy, na * my * my
        )
        return r, var_r

    r_a, var_a = ratio_var("a")
    r_b, var_b = ratio_var("b")
    se2 = var_a + var_b
    z = F.try_divide(r_b - r_a, F.sqrt(se2))
    ok = (
        (F.col("n_a") >= 2)
        & (F.col("n_b") >= 2)
        & (F.col("sy_a") != 0)
        & (F.col("sy_b") != 0)
        & (se2 > 0)
    )
    return agg.select(
        F.col("n_a"),
        F.col("n_b"),
        F.round(F.when(F.col("sy_a") != 0, r_a), 6).alias("ratio_a"),
        F.round(F.when(F.col("sy_b") != 0, r_b), 6).alias("ratio_b"),
        F.round(
            F.when(ok & (r_a != 0), F.try_divide(r_b - r_a, F.abs(r_a))),
            6,
        ).alias("lift_rel"),
        F.round(F.when(ok, F.sqrt(se2)), 6).alias("se"),
        F.round(F.when(ok, z), 6).alias("z_stat"),
        F.coalesce(
            F.when(ok, F.abs(z) > F.lit(float(z_crit))), F.lit(False)
        ).alias("z_sig"),
    )


def did_readout(
    df: "DataFrame",
    group_col: str,
    period_col: str,
    value_col: str,
    treat_value: str,
    post_value: str,
    z_crit: float = 1.96,
) -> DataFrame:
    """Difference-in-differences readout over a 2x2 (group x period)
    design (Card & Krueger 1994 lineage, public) — the
    QUASI-experiment member of the family: when you could not
    randomize (a rollout hit one region, one platform, one cohort),
    the treated group's pre->post change minus the control group's
    pre->post change removes both the stable group gap and the shared
    time shock, under the parallel-trends assumption (stated, not
    tested here).

    did = (mean_t_post - mean_t_pre) - (mean_c_post - mean_c_pre),
    se = sqrt(sum over the 4 cells of var_cell / n_cell) (unequal-
    variance normal approximation, the ab_test_report convention).

    ONE filtered-aggregate moment reduction: all four cells' (n, sum,
    sum of squares) in a single map-side-combined pass over the unit
    frame — never a groupBy-then-pivot, never four scans. NULL values
    leave; rows whose group/period is neither the treat/post value
    nor a remaining observed value are just the control/pre side (any
    non-treat group is control, any non-post period is pre).

    Output (one row, 6dp): n per cell, the four cell means, did, se,
    z_stat, z_sig. Any cell with n < 2 yields NULL statistics and a
    false flag.
    """
    g = F.col(group_col)
    p = F.col(period_col)
    val = F.col(value_col).cast("double")
    base = df.filter(val.isNotNull())
    is_t = (g == F.lit(treat_value)).cast("int")
    is_post = (p == F.lit(post_value)).cast("int")

    cells = (("c", "pre"), ("c", "post"), ("t", "pre"), ("t", "post"))

    def cell_cond(gt, pp):
        c = is_t == F.lit(1 if gt == "t" else 0)
        c = c & (is_post == F.lit(1 if pp == "post" else 0))
        return c

    agg = base.agg(
        *[
            e
            for gt, pp in cells
            for e in (
                F.count(F.when(cell_cond(gt, pp), val)).alias(
                    f"n_{gt}_{pp}"
                ),
                F.sum(F.when(cell_cond(gt, pp), val)).alias(
                    f"s_{gt}_{pp}"
                ),
                F.sum(F.when(cell_cond(gt, pp), val * val)).alias(
                    f"q_{gt}_{pp}"
                ),
            )
        ]
    )

    def mean_var(gt, pp):
        # try_divide: empty / single-unit cells must yield NULL, and
        # ANSI + codegen subexpression elimination evaluates divisions
        # even under a false F.when guard.
        n = F.col(f"n_{gt}_{pp}").cast("double")
        m = F.try_divide(F.col(f"s_{gt}_{pp}"), n)
        var = F.try_divide(F.col(f"q_{gt}_{pp}") - n * m * m, n - 1)
        return m, var, n

    m_c_pre, v_c_pre, n_c_pre = mean_var("c", "pre")
    m_c_post, v_c_post, n_c_post = mean_var("c", "post")
    m_t_pre, v_t_pre, n_t_pre = mean_var("t", "pre")
    m_t_post, v_t_post, n_t_post = mean_var("t", "post")
    did = (m_t_post - m_t_pre) - (m_c_post - m_c_pre)
    se2 = (
        F.try_divide(v_c_pre, n_c_pre)
        + F.try_divide(v_c_post, n_c_post)
        + F.try_divide(v_t_pre, n_t_pre)
        + F.try_divide(v_t_post, n_t_post)
    )
    ok = se2.isNotNull() & (se2 > 0)
    for gt, pp in cells:
        ok = ok & (F.col(f"n_{gt}_{pp}") >= 2)
    z = F.try_divide(did, F.sqrt(se2))
    return agg.select(
        F.col("n_c_pre"),
        F.col("n_c_post"),
        F.col("n_t_pre"),
        F.col("n_t_post"),
        F.round(m_c_pre, 6).alias("mean_c_pre"),
        F.round(m_c_post, 6).alias("mean_c_post"),
        F.round(m_t_pre, 6).alias("mean_t_pre"),
        F.round(m_t_post, 6).alias("mean_t_post"),
        F.round(F.when(ok, did), 6).alias("did"),
        F.round(F.when(ok, F.sqrt(se2)), 6).alias("se"),
        F.round(F.when(ok, z), 6).alias("z_stat"),
        F.coalesce(
            F.when(ok, F.abs(z) > F.lit(float(z_crit))), F.lit(False)
        ).alias("z_sig"),
    )


def seasonal_decompose(
    df: "DataFrame",
    group_cols: list[str],
    order_col: str,
    value_col: str,
    period: int,
) -> "DataFrame":
    """Classical additive seasonal decomposition per segment (the
    moving-average method of Macaulay 1931, the `statsmodels
    seasonal_decompose` classic): value = trend + seasonal + resid.
    The DIAGNOSTIC member of the seasonal family — seasonal_anomalies
    scores against a calendar profile, holt_winters_forecast predicts
    with one, this one SHOWS the decomposition so you can see whether
    the trend or the cycle moved.

    trend = centered moving average of length ``period`` (for even
    periods the standard 2xm MA: half-weight endpoints); defined only
    where the full window exists (edge rows carry NULL trend —
    statsmodels parity). seasonal = per-slot (index mod period) mean
    of the detrended series, centered so the seasonal components sum
    to ~zero over one cycle. resid = value - trend - seasonal.

    Distributed shape: the row-number index and MA window ride one
    exchange on the group keys; slot means and their centering are
    WINDOWS over the same calendar-bounded frame (a (group, slot)
    window plus a one-representative-per-slot group-window average —
    exactly the mean of slot means), so there is NO join and the
    input is derived exactly once (a groupBy + join-back would
    re-derive a lazily-corpus-derived input a second time). The input
    must be a PRE-AGGREGATED series (one row per group x order value —
    the holt/cusum discipline), so every frame is calendar-bounded at
    any corpus size.

    Output: group_cols + order_col, value, trend, seasonal, resid
    (all 6dp), slot. Groups shorter than period + 1 rows have no full
    MA window -> NULL trend/seasonal/resid everywhere (documented;
    they still emit their rows).
    """
    if period < 2:
        raise ValueError(f"seasonal_decompose: period >= 2, got {period}")
    m = int(period)
    h = m // 2
    w = Window.partitionBy(*group_cols).orderBy(order_col)
    x = F.col(value_col).cast("double")
    base = df.select(
        *group_cols,
        F.col(order_col),
        x.alias("_x"),
        (F.row_number().over(w) - 1).alias("_idx"),
    )
    if m % 2 == 1:
        frame = w.rowsBetween(-h, h)
        full = F.count(F.lit(1)).over(frame) == m
        trend = F.when(full, F.avg("_x").over(frame))
    else:
        # 2 x m MA: (0.5*x_{t-h} + x_{t-h+1..t+h-1} + 0.5*x_{t+h}) / m
        inner = F.sum("_x").over(w.rowsBetween(-(h - 1), h - 1))
        lo = F.lag("_x", h).over(w)
        hi = F.lead("_x", h).over(w)
        cnt = F.count(F.lit(1)).over(w.rowsBetween(-(h - 1), h - 1))
        full = lo.isNotNull() & hi.isNotNull() & (cnt == m - 1)
        trend = F.when(full, (0.5 * lo + inner + 0.5 * hi) / m)
    with_trend = base.withColumn("_trend", trend).withColumn(
        "_slot", F.col("_idx") % m
    )
    # slot means + centering via WINDOWS over the (already tiny,
    # calendar-bounded) keyed frame — a groupBy + join-back would
    # re-derive the input (often a lazy corpus aggregation) a second
    # time (the srm_check single-scan lesson, audited r10). The
    # centering averages ONE representative row per slot, which is
    # exactly the mean of slot means (slots with no defined detrended
    # value stay NULL and drop from the window avg, the groupBy
    # semantics).
    sw = Window.partitionBy(*group_cols, "_slot")
    gw = Window.partitionBy(*group_cols)
    slotted = with_trend.select(
        "*",
        F.avg(F.col("_x") - F.col("_trend")).over(sw).alias("_raw_seas"),
        F.row_number().over(
            sw.orderBy("_idx")
        ).alias("_slot_rn"),
    )
    joined = slotted.withColumn(
        "_seas",
        F.col("_raw_seas")
        - F.avg(
            F.when(F.col("_slot_rn") == 1, F.col("_raw_seas"))
        ).over(gw),
    )
    return joined.select(
        *group_cols,
        F.col(order_col),
        F.round("_x", 6).alias("value"),
        F.round("_trend", 6).alias("trend"),
        F.round("_seas", 6).alias("seasonal"),
        F.round(
            F.col("_x") - F.col("_trend") - F.col("_seas"), 6
        ).alias("resid"),
        F.col("_slot").alias("slot"),
    )


def ccf(
    df: "DataFrame",
    group_cols: list[str],
    order_col: str,
    x_col: str,
    y_col: str,
    max_lag: int = 7,
) -> "DataFrame":
    """Per-segment cross-correlation function between two aligned
    series (Box & Jenkins) — the LEAD-LAG diagnostic acf cannot give:
    does x move BEFORE y (marketing spend before purchases, errors
    before churn)? r_k = sum_t (x_t - xbar)(y_{t+k} - ybar) /
    sqrt(sum (x-xbar)^2 * sum (y-ybar)^2) for k in -max_lag..max_lag;
    positive lag means x LEADS y by k steps. The denominator is the
    full-series normalizer (the acf estimator's convention), so
    |r_k| <= 1 and r at lag 0 is the ordinary Pearson correlation.

    Distributed shape (the acf discipline): ONE exchange on the group
    keys serves the unbounded window means and a single ordered
    window producing all 2*max_lag+1 shifted centered values; one
    map-side-combined aggregate sums every lag's products (NULL
    products at the series edges drop out of sum()); posexplode emits
    long format. Input must be a pre-aggregated series with BOTH
    columns on each row (one row per group x order value).

    Output: group_cols + lag (-max_lag..max_lag), ccf (6dp), n.
    Groups where either series has zero variance return NULL ccf.
    """
    if max_lag < 1:
        raise ValueError(f"ccf: max_lag must be >= 1, got {max_lag}")
    g = Window.partitionBy(*group_cols)
    w = g.orderBy(order_col)
    xc = (F.col(x_col).cast("double") - F.avg(
        F.col(x_col).cast("double")
    ).over(g)).alias("_xc")
    yc = (F.col(y_col).cast("double") - F.avg(
        F.col(y_col).cast("double")
    ).over(g)).alias("_yc")
    lags = list(range(-max_lag, max_lag + 1))

    def shifted(k):
        if k > 0:
            return F.lead("_yc", k).over(w)
        if k < 0:
            return F.lag("_yc", -k).over(w)
        return F.col("_yc")

    lagged = df.select(
        *group_cols, F.col(order_col), xc, yc
    ).select(
        *group_cols,
        "_xc",
        "_yc",
        *[shifted(k).alias(f"_s{k + max_lag}") for k in lags],
    )
    aggd = lagged.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_xc") * F.col("_xc")).alias("_dx"),
        F.sum(F.col("_yc") * F.col("_yc")).alias("_dy"),
        *[
            F.sum(F.col("_xc") * F.col(f"_s{k + max_lag}")).alias(
                f"_n{k + max_lag}"
            )
            for k in lags
        ],
    )
    den = F.sqrt(F.col("_dx") * F.col("_dy"))
    pairs = F.array(
        *[
            F.when(den > 0, F.try_divide(F.col(f"_n{k + max_lag}"), den))
            for k in lags
        ]
    )
    return aggd.select(
        *group_cols,
        "n",
        F.posexplode(pairs).alias("_pos", "_r"),
    ).select(
        *group_cols,
        (F.col("_pos") - max_lag).alias("lag"),
        F.round(F.col("_r"), 6).alias("ccf"),
        "n",
    )


def amoc_changepoint(
    df: "DataFrame",
    group_cols: list[str],
    order_col: str,
    value_col: str,
    min_seg: int = 2,
) -> "DataFrame":
    """At-most-one changepoint per segment by exact least-squares
    (the AMOC case of binary segmentation, Scott & Knott 1974 /
    Hinkley 1970): the single split that minimizes
    SSE(left) + SSE(right), i.e. the maximum-likelihood mean-shift
    location — the LOCATOR companion to cusum_changepoints (CUSUM
    flags the onset under a known baseline; this one finds the best
    split with no baseline at all) and to ewma_control (which bounds,
    but does not locate).

    Every split cost comes from prefix sums: SSE(1..i) = q_i -
    s_i^2 / i with s, q the cumulative sum and sum of squares, so the
    whole scan is ONE ordered cumulative window (the group totals are
    a full-frame window on the SAME exchange — zero joins, the input
    derived exactly once) + one map-side-combined min_by aggregation
    per group — never a per-split rescan, nothing per-row on the
    driver. The input must be a pre-aggregated series (the cusum/holt
    discipline). Both engines fold the cumulative in the same order,
    so the argmin is arithmetic-identical and oracle-checkable.

    ``min_seg`` bounds both segment lengths (>= min_seg points each).
    Ties on cost pick the EARLIEST split. Groups with n < 2 * min_seg
    drop from the output.

    Output per group (6dp): n, cp_index (1-based last index of the
    left segment), cp_order (order value at cp_index), mean_left,
    mean_right, sse_total, sse_best, reduction, reduction_ratio
    (NULL when sse_total == 0).
    """
    if min_seg < 1:
        raise ValueError(
            f"amoc_changepoint: min_seg must be >= 1, got {min_seg}"
        )
    w = Window.partitionBy(*group_cols).orderBy(order_col)
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    x = F.col(value_col).cast("double")
    # group totals via a FULL-FRAME window on the same keyed exchange
    # the cumsum already pays — a groupBy + broadcast join-back would
    # re-derive the (possibly lazily corpus-derived) input frame a
    # second time (the srm_check single-scan lesson, audited r10)
    full = Window.partitionBy(*group_cols)
    base = df.select(
        *group_cols,
        F.col(order_col).alias("_ord"),
        x.alias("_x"),
        F.row_number().over(w).alias("_i"),
        F.sum(x).over(cum).alias("_s"),
        F.sum(x * x).over(cum).alias("_q"),
    )
    joined = base.select(
        "*",
        F.count(F.lit(1)).over(full).alias("_n"),
        F.max_by("_s", "_i").over(full).alias("_st"),
        F.max_by("_q", "_i").over(full).alias("_qt"),
    )
    i = F.col("_i").cast("double")
    nn = F.col("_n").cast("double")
    sse_l = F.col("_q") - F.col("_s") * F.col("_s") / i
    sse_r = (F.col("_qt") - F.col("_q")) - (
        (F.col("_st") - F.col("_s")) * (F.col("_st") - F.col("_s"))
        / (nn - i)
    )
    cand = joined.filter(
        (F.col("_i") >= min_seg) & (F.col("_i") <= F.col("_n") - min_seg)
    ).select(
        *group_cols,
        "_n",
        "_st",
        "_qt",
        F.struct(
            (sse_l + sse_r).alias("cost"),
            F.col("_i").alias("i"),
            F.col("_ord").alias("ord"),
            (F.col("_s") / i).alias("mean_l"),
            ((F.col("_st") - F.col("_s")) / (nn - i)).alias("mean_r"),
        ).alias("_c"),
    )
    best = cand.groupBy(*group_cols).agg(
        F.first("_n").alias("n"),
        F.first("_st").alias("_st"),
        F.first("_qt").alias("_qt"),
        F.min("_c").alias("_b"),
    )
    sse_tot = F.col("_qt") - F.col("_st") * F.col("_st") / F.col("n")
    red = sse_tot - F.col("_b.cost")
    return best.select(
        *group_cols,
        F.col("n").cast("long").alias("n"),
        F.col("_b.i").cast("long").alias("cp_index"),
        F.col("_b.ord").alias("cp_order"),
        F.round("_b.mean_l", 6).alias("mean_left"),
        F.round("_b.mean_r", 6).alias("mean_right"),
        F.round(sse_tot, 6).alias("sse_total"),
        F.round("_b.cost", 6).alias("sse_best"),
        F.round(red, 6).alias("reduction"),
        F.round(
            F.when(sse_tot > 0, F.try_divide(red, sse_tot)), 6
        ).alias("reduction_ratio"),
    )


def amoc_changepoint_exact(
    df: "DataFrame",
    group_cols: list[str],
    order_col: str,
    value_col: str,
    min_seg: int = 2,
    scale: int = 6,
) -> "DataFrame":
    """:func:`amoc_changepoint` with EXACT scaled-integer prefix sums
    (the gini_customers discipline) for inputs already rounded to
    ``scale`` decimal places.

    The double pipeline's SSE = q - s^2/n is a catastrophic
    cancellation (~3e10 prefixes collapsing to ~5e7) whose window-sum
    ordering differs per engine, leaving ~1e-5 cross-engine noise that
    no output quantum fully absorbs (ADVICE r14 item 3). Here every
    prefix is exact: values become integers in 10^-scale units
    (DECIMAL(18,0) — exact because the input is scale-dp-rounded), the
    cumulative s and q fold in DECIMAL(28,0)/DECIMAL(38,0) with zero
    rounding, and each candidate's cost numerators

        numL = q_i * i - s_i^2
        numR = (q_tot - q_i)(n - i) - (s_tot - s_i)^2

    are integer-exact. Only THEN does double arithmetic start: the
    rank key double(numL)/i + double(numR)/(n-i) is built from
    identical integers with identical IEEE ops on any engine, so the
    argmin — and every output column derived the same way — is
    bit-for-bit reproducible (DuckDB replays with HUGEINT). Headroom:
    numerators stay below 10^38 while s_tot*10^scale < 10^17 — five
    orders above the sf0.1 series (s_tot ~ 1e12 micro-units).

    Same plan shape as :func:`amoc_changepoint` (ONE keyed exchange:
    cumulative + full-frame windows, then a map-side-combined min
    agg); same output schema, with the sse/mean/reduction columns
    emitted at 6dp via engine-portable scaled-floor rounding.
    """
    if min_seg < 1:
        raise ValueError(
            f"amoc_changepoint_exact: min_seg must be >= 1, got {min_seg}"
        )
    unit = float(10 ** scale)
    w = Window.partitionBy(*group_cols).orderBy(order_col)
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    full = Window.partitionBy(*group_cols)
    r = F.round(F.col(value_col).cast("double") * unit, 0).cast(
        "decimal(18,0)"
    )
    base = df.select(
        *group_cols,
        F.col(order_col).alias("_ord"),
        F.row_number().over(w).alias("_i"),
        F.sum(r).over(cum).alias("_s"),          # decimal(28,0), exact
        F.sum(r * r).over(cum).alias("_q"),      # decimal(38,0), exact
    )
    joined = base.select(
        "*",
        F.count(F.lit(1)).over(full).alias("_n"),
        F.max_by("_s", "_i").over(full).alias("_st"),
        F.max_by("_q", "_i").over(full).alias("_qt"),
    )
    i = F.col("_i").cast("double")
    nn = F.col("_n").cast("double")
    num_l = (F.col("_q") * F.col("_i") - F.col("_s") * F.col("_s")).cast(
        "double"
    )
    num_r = (
        (F.col("_qt") - F.col("_q")) * (F.col("_n") - F.col("_i"))
        - (F.col("_st") - F.col("_s")) * (F.col("_st") - F.col("_s"))
    ).cast("double")
    cost_key = num_l / i + num_r / (nn - i)
    cand = joined.filter(
        (F.col("_i") >= min_seg) & (F.col("_i") <= F.col("_n") - min_seg)
    ).select(
        *group_cols,
        "_n",
        "_st",
        "_qt",
        F.struct(
            cost_key.alias("cost"),
            F.col("_i").alias("i"),
            F.col("_ord").alias("ord"),
            (F.col("_s").cast("double") / i).alias("mean_l"),
            ((F.col("_st") - F.col("_s")).cast("double") / (nn - i)).alias(
                "mean_r"
            ),
        ).alias("_c"),
    )
    best = cand.groupBy(*group_cols).agg(
        F.first("_n").alias("n"),
        F.first("_st").alias("_st"),
        F.first("_qt").alias("_qt"),
        F.min("_c").alias("_b"),
    )
    n_d = F.col("n").cast("double")
    sq = unit * unit
    sse_tot = (
        (F.col("_qt") * F.col("n") - F.col("_st") * F.col("_st")).cast(
            "double"
        )
        / n_d
        / sq
    )
    sse_best = F.col("_b.cost") / sq
    red = sse_tot - sse_best

    def r6(c, name):
        # engine-portable 6dp scaled-floor; guarded because Spark's
        # floor(double) returns LONG and clamps at 2^63 — above
        # 9e9 * 1e6 a double carries <= 2^-1 ulp of fractional part
        # anyway, so both engines pass the value through unchanged
        return (
            F.when(F.abs(c) < 9e9, F.floor(c * 1e6 + F.lit(0.5)) / 1e6)
            .otherwise(c)
            .alias(name)
        )

    return best.select(
        *group_cols,
        F.col("n").cast("long").alias("n"),
        F.col("_b.i").cast("long").alias("cp_index"),
        F.col("_b.ord").alias("cp_order"),
        r6(F.col("_b.mean_l") / unit, "mean_left"),
        r6(F.col("_b.mean_r") / unit, "mean_right"),
        r6(sse_tot, "sse_total"),
        r6(sse_best, "sse_best"),
        r6(red, "reduction"),
        r6(
            F.when(sse_tot > 0, F.try_divide(red, sse_tot)),
            "reduction_ratio",
        ),
    )


def dp_noisy_counts(
    df: "DataFrame",
    group_cols: list[str],
    epsilon: float = 1.0,
    seed: str = "dp",
    clamp_nonneg: bool = True,
) -> DataFrame:
    """Laplace-mechanism count release (Dwork, McSherry, Nissim &
    Smith 2006, public) — the RELEASE member of the privacy family
    (k_anonymity AUDITS a table you intend to publish; this publishes
    only noisy aggregate counts with an epsilon budget): per-group
    count + Laplace(1/epsilon) noise, the calibrated mechanism for
    sensitivity-1 counting queries.

    SENSITIVITY CONTRACT: each underlying unit must contribute at
    most ONE row to ONE group (pre-deduplicate units first — e.g.
    one row per user), or the 1/epsilon calibration understates the
    privacy loss. DETERMINISM CAVEAT, stated loudly: the noise here
    is a SEEDED md5 inverse-CDF draw (the weighted_sample /
    bootstrap_ci discipline) so tests and the SQL oracle can replay
    it bit-for-bit — real differential privacy requires FRESH SECRET
    randomness; in production pass a random, never-reused,
    never-published seed per release, and the mechanism's calibration
    is then the textbook one.

    Laplace draw: u = md5-uniform(seed | group key) in (0, 1),
    noise = -(1/eps) * sign(u - 1/2) * ln(1 - 2|u - 1/2|) — the
    standard inverse CDF. ONE map-side-combined count aggregation to
    the group-sized frame; the noise is a codegen projection of the
    group key. Negative releases clamp at 0 by default (count
    post-processing, no privacy cost).

    Output: group_cols + n_released (6dp), epsilon, scale.
    """
    from indexlab_spark.functions.hashing import md5_long

    if epsilon <= 0:
        raise ValueError(
            f"dp_noisy_counts: epsilon must be > 0, got {epsilon}"
        )
    if not group_cols:
        raise ValueError("dp_noisy_counts: group_cols must be non-empty")
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_n"))
    key = F.concat_ws(
        "|", F.lit(seed), *[F.col(c).cast("string") for c in group_cols]
    )
    u = (md5_long(key).cast("double") + F.lit(1.0)) / F.lit(
        float(2**60 + 2)
    )
    c = u - F.lit(0.5)
    scale = 1.0 / float(epsilon)
    noise = (
        F.lit(-scale)
        * F.signum(c)
        * F.log(F.lit(1.0) - 2.0 * F.abs(c))
    )
    released = F.col("_n").cast("double") + noise
    if clamp_nonneg:
        released = F.greatest(released, F.lit(0.0))
    return counts.select(
        *group_cols,
        F.round(released, 6).alias("n_released"),
        F.lit(float(epsilon)).alias("epsilon"),
        F.lit(scale).alias("scale"),
    )


def weighted_quantiles(
    df: "DataFrame",
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    probs: list[float] = (0.5,),
) -> DataFrame:
    """Exact WEIGHTED quantiles per group — the quantile the curation
    stack actually needs once rows carry importance weights (DSIR
    weights, temperature-resample rates, dedup survivor multiplicities):
    q_p = the smallest value whose cumulative weight reaches p * W
    (the type-1 / inverse-CDF definition, which replication-equivalence
    makes canonical for weights: integer weights give exactly the
    quantile of the exploded multiset — pinned in tests). Plain
    ``percentile`` can't express this for fractional weights.

    Distributed shape: ONE map-side-combined (group, value) -> weight
    sum aggregation collapses the corpus to its value domain, an
    ordered window cumsum over that domain-sized frame (same keyed
    exchange), then every requested p reduces via
    ``min(value WHERE cumw >= p * W)`` in a single agg — all probs in
    one pass, nothing row-sized to the driver, never a global sort of
    the corpus. Rows with NULL values or NULL/non-positive weights are
    excluded (the weighted_sample mass contract).

    Output: group_cols + p, quantile — long format, one row per
    group x prob. Groups with zero total weight drop.
    """
    ps = [float(p) for p in probs]
    if not ps or any(not (0.0 < p <= 1.0) for p in ps):
        raise ValueError(
            f"weighted_quantiles: probs must be in (0, 1], got {probs}"
        )
    v = F.col(value_col)
    w = F.col(weight_col).cast("double")
    base = df.filter(v.isNotNull() & w.isNotNull() & (w > 0))
    dom = base.groupBy(*group_cols, v.alias("_v")).agg(
        F.sum(w).alias("_w")
    )
    win = Window.partitionBy(*group_cols).orderBy("_v")
    gw = Window.partitionBy(*group_cols)
    cum = dom.select(
        *group_cols,
        "_v",
        F.sum("_w").over(
            win.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("_cw"),
        F.sum("_w").over(gw).alias("_tw"),
    )
    aggs = [
        F.min(
            F.when(F.col("_cw") >= F.lit(p) * F.col("_tw"), F.col("_v"))
        ).alias(f"_q{i}")
        for i, p in enumerate(ps)
    ]
    wide = cum.groupBy(*group_cols).agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(p).alias("p"), F.col(f"_q{i}").alias("quantile")
            )
            for i, p in enumerate(ps)
        ]
    )
    return wide.select(*group_cols, F.explode(pairs).alias("_e")).select(
        *group_cols, F.col("_e.p").alias("p"),
        F.col("_e.quantile").alias("quantile"),
    )


def binseg_changepoints(
    df: "DataFrame",
    group_cols: list[str],
    order_col: str,
    value_col: str,
    max_cp: int = 5,
    min_seg: int = 2,
    min_reduction_ratio: float = 0.01,
) -> "DataFrame":
    """MULTIPLE changepoints per segment by greedy binary segmentation
    (Scott & Knott 1974; the standard first-line multi-changepoint
    method): repeatedly apply the :func:`amoc_changepoint` split to
    whichever current segment offers the largest SSE reduction, until
    ``max_cp`` splits are placed or the best admissible split's
    reduction falls below ``min_reduction_ratio`` x total SSE (the
    stopping penalty — 0 accepts any strictly positive reduction).
    Deterministic throughout: among segments the largest reduction
    wins, ties break to the smallest index.

    Execution is the cusum/holt discipline: ONE keyed exchange into an
    Arrow per-group pass over the PRE-AGGREGATED, calendar-bounded
    series; prefix sums make every candidate split O(1), so a greedy
    pass is O(n * max_cp) per group. Not SQL-replayable (the greedy
    recursion's segment state) -> rows-only gate; exact pure-python
    parity and planted-step recovery pinned in tests, and max_cp=1
    agrees with amoc_changepoint by construction.

    Output: one row per placed changepoint — group_cols + cp_rank
    (1 = largest reduction, the order placed), cp_index (1-based index
    of the last point of the left side, GLOBAL over the group's
    series), cp_order (the order value there), reduction (6dp), n.
    Groups with no admissible split emit nothing.
    """
    import pandas as pd

    if max_cp < 1:
        raise ValueError(
            f"binseg_changepoints: max_cp must be >= 1, got {max_cp}"
        )
    if min_seg < 1:
        raise ValueError(
            f"binseg_changepoints: min_seg must be >= 1, got {min_seg}"
        )
    if min_reduction_ratio < 0:
        raise ValueError(
            "binseg_changepoints: min_reduction_ratio must be >= 0, "
            f"got {min_reduction_ratio}"
        )
    base = df.select(
        *group_cols,
        F.col(order_col).alias("_ord"),
        F.col(value_col).cast("double").alias("_val"),
    )
    out_fields = ", ".join(
        f"`{c}` {dict(df.dtypes)[c]}" for c in group_cols
    )
    ord_type = dict(df.dtypes)[order_col]

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_ord", "_val"], kind="mergesort")
        xs = [float(v) for v in pdf["_val"]]
        n = len(xs)
        s = [0.0]
        q = [0.0]
        for x in xs:
            s.append(s[-1] + x)
            q.append(q[-1] + x * x)

        def sse(a, b):  # half-open [a, b)
            if b <= a:
                return 0.0
            d = s[b] - s[a]
            return (q[b] - q[a]) - d * d / (b - a)

        def best_split(a, b):
            """(reduction, i) for the best split of [a, b); i is the
            global 1-based index of the left side's last point."""
            if b - a < 2 * min_seg:
                return None
            whole = sse(a, b)
            best = None
            for i in range(a + min_seg, b - min_seg + 1):
                red = whole - sse(a, i) - sse(i, b)
                if best is None or red > best[0] + 1e-12:
                    best = (red, i)
            return best

        thresh = min_reduction_ratio * sse(0, n)
        segments = [(0, n)]
        found = []
        for _ in range(max_cp):
            cand = None
            for seg in segments:
                bs = best_split(*seg)
                if bs is None:
                    continue
                if (
                    cand is None
                    or bs[0] > cand[0][0] + 1e-12
                    or (abs(bs[0] - cand[0][0]) <= 1e-12
                        and bs[1] < cand[0][1])
                ):
                    cand = (bs, seg)
            if cand is None or cand[0][0] <= max(thresh, 0.0) + 1e-12:
                break
            (red, i), seg = cand
            segments.remove(seg)
            segments.extend([(seg[0], i), (i, seg[1])])
            found.append((i, red))
        rows = []
        gvals = [pdf[c].iloc[0] for c in group_cols]
        for rank, (i, red) in enumerate(found, start=1):
            rows.append(
                [*gvals, rank, i, pdf["_ord"].iloc[i - 1],
                 round(red, 6), n]
            )
        return pd.DataFrame(
            rows,
            columns=[*group_cols, "cp_rank", "cp_index", "cp_order",
                     "reduction", "n"],
        )

    return base.groupBy(*group_cols).applyInPandas(
        fn,
        schema=(
            f"{out_fields}, cp_rank long, cp_index long, "
            f"cp_order {ord_type}, reduction double, n long"
        ),
    )


def decayed_sum(
    df: "DataFrame",
    group_cols: list[str],
    ts_col: str,
    value_col: str,
    half_life_seconds: float,
    as_of=None,
) -> DataFrame:
    """Exponentially time-decayed aggregate per group — the standard
    recency-weighted feature (activity scores, decayed revenue,
    trending mass): ``sum(value * 2^(-(as_of - ts) / half_life))``,
    so yesterday counts half as much as today at a one-day half-life.
    The feature-engineering companion to the time_decay attribution
    model (same kernel, group-level instead of per-conversion).

    ``as_of`` anchors the decay (a timestamp literal / column name);
    None uses each GROUP's latest event (self-anchored recency —
    deterministic, no wall clock, the Date.now-free contract). Events
    after ``as_of`` are excluded (they haven't happened yet).

    ONE map-side-combined aggregation when ``as_of`` is given; the
    self-anchored form adds one group-keyed max-ts aggregate joined
    back (group-sized, broadcastable). Pure codegen arithmetic —
    microsecond-exact ages, no UDF.

    Output: group_cols + n (rows in window), decayed (6dp), raw_sum
    (undecayed, 6dp), anchor_ts.
    """
    if half_life_seconds <= 0:
        raise ValueError(
            "decayed_sum: half_life_seconds must be > 0, "
            f"got {half_life_seconds}"
        )
    v = F.col(value_col).cast("double")
    ts = F.col(ts_col)
    if as_of is None:
        anchors = df.groupBy(*group_cols).agg(
            F.max(ts).alias("_anchor")
        )
        base = df.join(F.broadcast(anchors), list(group_cols))
    else:
        if isinstance(as_of, str):
            # a string naming an existing column anchors per-row on
            # that column; any other string is a timestamp literal
            # (docstring contract — without this branch a column-name
            # string cast as a literal yields a NULL anchor that
            # silently filters out every row)
            anchor = (
                F.col(as_of)
                if as_of in df.columns
                else F.lit(as_of).cast("timestamp")
            )
        else:
            anchor = as_of
        base = df.withColumn("_anchor", anchor)
    age_s = (
        F.unix_micros(F.col("_anchor")) - F.unix_micros(ts)
    ).cast("double") / F.lit(1_000_000.0)
    w = F.pow(F.lit(0.5), age_s / F.lit(float(half_life_seconds)))
    inwin = base.filter(age_s >= 0)
    return inwin.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(v * w), 6).alias("decayed"),
        F.round(F.sum(v), 6).alias("raw_sum"),
        F.max("_anchor").alias("anchor_ts"),
    )


def stratified_ab(
    df: "DataFrame",
    variant_col: str,
    stratum_col: str,
    metric_col: str,
    variant_a: str = "a",
    variant_b: str = "b",
    z_crit: float = 1.96,
) -> DataFrame:
    """Post-stratified two-arm readout (Miratrix, Sekhon & Yu 2013
    lineage, public): weight each stratum's within-stratum arm delta
    by the stratum's population share — the NONPARAMETRIC cousin of
    cuped_ab (CUPED needs a numeric pre-period covariate and a linear
    relationship; post-stratification needs only a categorical
    stratum — country, platform, signup cohort) and removes the
    between-strata variance component from the readout.

    estimate = sum_s w_s * (mean_b_s - mean_a_s) with w_s = n_s / n;
    se^2 = sum_s w_s^2 * (var_a_s / n_a_s + var_b_s / n_b_s) (the
    standard post-stratified variance under proportional weights).

    Distributed shape: ONE map-side-combined (stratum) aggregation
    with filtered per-arm moments — the corpus shuffles once to the
    stratum-sized frame, everything after is frame-local arithmetic
    plus a one-row reduction. Strata where either arm has n < 2 are
    EXCLUDED from both the estimate and the weights (their delta is
    undefined; n_excluded reports how much mass dropped — documented,
    never silent). NULL metrics leave (the ab_test_report contract).

    Output (one row, 6dp): n_strata, n_used, n_excluded_units,
    estimate, se, z_stat, z_sig, plus the UNSTRATIFIED delta for
    comparison (the variance the stratification removed is visible).
    """
    v = F.col(variant_col)
    y = F.col(metric_col).cast("double")
    base = df.filter(y.isNotNull() & v.isin(variant_a, variant_b))

    def arm(val, expr, agg):
        return agg(F.when(v == F.lit(val), expr))

    strata = base.groupBy(F.col(stratum_col).alias("_s")).agg(
        F.count(F.lit(1)).alias("n_s"),
        *[
            e
            for val, tag in ((variant_a, "a"), (variant_b, "b"))
            for e in (
                arm(val, y, F.count).alias(f"n_{tag}"),
                arm(val, y, F.sum).alias(f"s_{tag}"),
                arm(val, y * y, F.sum).alias(f"q_{tag}"),
            )
        ],
    )
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2)

    def mv(tag):
        n = F.col(f"n_{tag}").cast("double")
        m = F.try_divide(F.col(f"s_{tag}"), n)
        var = F.try_divide(F.col(f"q_{tag}") - n * m * m, n - 1)
        return m, var, n

    m_a, v_a, n_a = mv("a")
    m_b, v_b, n_b = mv("b")
    scored = strata.select(
        "n_s",
        ok.alias("_ok"),
        (m_b - m_a).alias("_delta"),
        (F.try_divide(v_a, n_a) + F.try_divide(v_b, n_b)).alias("_se2"),
        F.col("s_a"),
        F.col("s_b"),
        F.col("n_a"),
        F.col("n_b"),
    )
    agg = scored.agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum(F.when(F.col("_ok"), 1).otherwise(0)).cast("long").alias(
            "n_used"
        ),
        F.sum(
            F.when(~F.col("_ok"), F.col("n_s")).otherwise(0)
        ).cast("long").alias("n_excluded_units"),
        F.sum(F.when(F.col("_ok"), F.col("n_s"))).alias("_n_tot"),
        F.sum(
            F.when(F.col("_ok"), F.col("n_s") * F.col("_delta"))
        ).alias("_wd"),
        F.sum(
            F.when(
                F.col("_ok"),
                F.col("n_s") * F.col("n_s") * F.col("_se2"),
            )
        ).alias("_wse"),
        # unstratified comparison from the same pass
        F.sum("s_a").alias("_sa"),
        F.sum("s_b").alias("_sb"),
        F.sum("n_a").alias("_na"),
        F.sum("n_b").alias("_nb"),
    )
    est = F.try_divide(F.col("_wd"), F.col("_n_tot"))
    se = F.sqrt(
        F.try_divide(F.col("_wse"), F.col("_n_tot") * F.col("_n_tot"))
    )
    z = F.try_divide(est, se)
    raw_delta = F.try_divide(F.col("_sb"), F.col("_nb")) - F.try_divide(
        F.col("_sa"), F.col("_na")
    )
    valid = (F.col("n_used") > 0) & se.isNotNull() & (se > 0)
    return agg.select(
        F.col("n_strata").cast("long").alias("n_strata"),
        "n_used",
        "n_excluded_units",
        F.round(F.when(F.col("n_used") > 0, est), 6).alias("estimate"),
        F.round(F.when(valid, se), 6).alias("se"),
        F.round(F.when(valid, z), 6).alias("z_stat"),
        F.coalesce(
            F.when(valid, F.abs(z) > F.lit(float(z_crit))), F.lit(False)
        ).alias("z_sig"),
        F.round(raw_delta, 6).alias("unstratified_delta"),
    )


def partial_corr_matrix(
    df: "DataFrame",
    cols: list[str],
) -> DataFrame:
    """Pairwise PARTIAL correlations controlling for all the other
    listed columns (the precision-matrix identity: p_ij =
    -P_ij / sqrt(P_ii * P_jj) with P = R^-1) — the confounder screen
    corr_matrix can't give: two features both driven by a third show
    a large marginal correlation and a near-zero partial one, which
    is exactly the redundancy call feature selection needs.

    The distributed work is :func:`corr_matrix`'s single moment pass;
    the k x k inversion is driver math on the pair frame (k is a
    column LIST by contract — tens, never thousands), the standard
    small-state/driver-scalar split (PCA's eigh discipline). Columns
    whose correlation is undefined (constant) or a singular matrix
    (exactly collinear columns) raise loudly rather than emitting
    garbage. SQL-replayable at small fixed k after all: the
    determinant cancels in p_ij = -C_ij/sqrt(C_ii*C_jj), so the k=4
    gate replays as closed-form 3x3 cofactors over the same rounded
    correlations; exact numpy/reference parity pinned in tests.

    Output: one row per unordered pair (list order): col_a, col_b,
    corr (the marginal, for contrast), partial_corr (6dp), n.
    """
    import numpy as np

    pairs = corr_matrix(df, cols).collect()
    if not pairs:
        raise ValueError("partial_corr_matrix: empty input")
    n = pairs[0]["n"]
    k = len(cols)
    r = np.eye(k)
    idx = {c: i for i, c in enumerate(cols)}
    for row in pairs:
        if row["corr"] is None:
            raise ValueError(
                "partial_corr_matrix: constant column "
                f"{row['col_a']}/{row['col_b']} has undefined correlation"
            )
        i, j = idx[row["col_a"]], idx[row["col_b"]]
        r[i, j] = r[j, i] = row["corr"]
    try:
        p = np.linalg.inv(r)
    except np.linalg.LinAlgError as exc:
        raise ValueError(
            "partial_corr_matrix: correlation matrix is singular "
            "(exactly collinear columns) — drop one of them"
        ) from exc
    spark = df.sparkSession
    out = []
    for a in range(k):
        for b in range(a + 1, k):
            out.append(
                (
                    cols[a],
                    cols[b],
                    float(r[a, b]),
                    round(float(-p[a, b] / np.sqrt(p[a, a] * p[b, b])), 6),
                    int(n),
                )
            )
    return spark.createDataFrame(
        out,
        "col_a string, col_b string, corr double, partial_corr double,"
        " n long",
    )


def brier_decomposition(
    df: "DataFrame",
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Murphy (1973) decomposition of the Brier score into
    RELIABILITY − RESOLUTION + UNCERTAINTY over equal-width score
    bins — the diagnosis reliability_curve's ECE can't give:
    uncertainty is the data's irreducible floor, resolution is how
    much the scorer actually separates outcomes, reliability is pure
    miscalibration (the only part isotonic_calibrate can fix). Two
    scorers with equal Brier can differ entirely in WHY.

    brier = mean((p - y)^2); REL = sum_b n_b (conf_b - acc_b)^2 / n;
    RES = sum_b n_b (acc_b - ybar)^2 / n; UNC = ybar (1 - ybar);
    identity brier = REL - RES + UNC holds exactly only for binned
    (discrete) forecasts; with continuous scores binned at their
    bin-mean confidence the EXACT generalized identity (Stephenson,
    Coelho & Jolliffe 2008 lineage) is
    ``brier = REL - RES + UNC + WBV - 2 * WBC`` with WBV the
    within-bin score variance and WBC the within-bin score-outcome
    covariance — both reported, and the exact identity is pinned in
    tests (no silently-approximate decomposition).

    ONE map-side-combined (bin -> n, sum p, sum y, sum p^2, sum p*y)
    aggregation (the reliability_curve shape; 1.0 clamps into the
    last bin), then bin-frame arithmetic against broadcast totals.
    Rows with NULL/out-of-range scores or non-binary labels are
    excluded (the roc_auc contract). Output: one row — n, brier,
    reliability, resolution, uncertainty, within_bin_var,
    within_bin_cov (6dp).
    """
    if n_bins < 2:
        raise ValueError(
            f"brier_decomposition: n_bins must be >= 2, got {n_bins}"
        )
    p = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    base = df.filter(
        p.isNotNull() & (p >= 0) & (p <= 1) & y.isin(0.0, 1.0)
    )
    b = F.least(
        F.floor(p * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    bins = base.groupBy(b.alias("_b")).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(p).alias("_sp"),
        F.sum(y).alias("_sy"),
        F.sum(p * p).alias("_spp"),
        F.sum(p * y).alias("_spy"),
    )
    tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    scored = bins.select(
        "_n",
        "_sp",
        "_sy",
        "_spp",
        "_spy",
        F.sum("_n").over(tot).alias("_totn"),
        F.sum("_sy").over(tot).alias("_totsy"),
    )
    nn = F.col("_n").cast("double")
    conf = F.col("_sp") / nn
    acc = F.col("_sy") / nn
    ybar = F.col("_totsy") / F.col("_totn")
    agg = scored.agg(
        F.first("_totn").cast("long").alias("n"),
        F.round(
            F.sum(
                F.col("_spp") - 2 * F.col("_spy") + F.col("_sy")
            ) / F.first("_totn"),
            6,
        ).alias("brier"),
        F.round(
            F.sum(nn * (conf - acc) * (conf - acc)) / F.first("_totn"), 6
        ).alias("reliability"),
        F.round(
            F.sum(nn * (acc - ybar) * (acc - ybar)) / F.first("_totn"), 6
        ).alias("resolution"),
        F.round(
            F.first(ybar * (1 - ybar)), 6
        ).alias("uncertainty"),
        F.round(
            F.sum(F.col("_spp") - nn * conf * conf) / F.first("_totn"), 6
        ).alias("within_bin_var"),
        F.round(
            F.sum(F.col("_spy") - conf * F.col("_sy")) / F.first("_totn"),
            6,
        ).alias("within_bin_cov"),
    )
    return agg


def stationary_distribution(
    df: "DataFrame",
    seq_col: str,
    order_col: str,
    state_col: str,
    damping: float = 0.99,
    max_iter: int = 500,
    tol: float | None = 1e-12,
) -> DataFrame:
    """Long-run state occupancy of the empirical Markov chain — the
    FORWARD-looking companion to :func:`transition_matrix` (the
    matrix says where each state leads next; the stationary
    distribution says where the population ENDS UP if the observed
    dynamics persist — the steady-state funnel mix, the equilibrium
    page/feature occupancy). pi solves pi P = pi.

    The distributed work is transition_matrix's single keyed
    exchange; the chain itself is a states^2-sized frame, so the
    fixed-point runs as driver numpy (the partial_corr / PCA
    small-state discipline). The observed chain may be reducible or
    have absorbing states (pi then isn't unique), so the chain is
    DAMPED exactly like PageRank: P' = damping * P + (1 - damping)/n,
    with rows for states that never transition OUT (sinks observed
    only as destinations) set uniform — strictly positive and
    irreducible, hence a unique pi. damping=1.0 is allowed for
    chains the caller knows are ergodic. The residual
    ||pi P' - pi||_1 at stop is reported, never hidden.

    ``tol=None`` runs EXACTLY max_iter rounds and returns (the
    pagerank fixed-iteration contract): with a fixed round count the
    damped power iteration is a bounded recursive-CTE replay, which
    is what upgraded this operator's gate from rows-only to
    hash-checked; the tolerance mode stays for callers who want
    convergence semantics.

    Output: state, pi (6dp), n_states, n_iter, residual.
    Closed-form two-state parity, doubly-stochastic-uniform and
    numpy-eig parity pinned in tests.
    """
    import numpy as np

    if not (0.0 < damping <= 1.0):
        raise ValueError(
            f"stationary_distribution: damping in (0, 1], got {damping}"
        )
    tm = transition_matrix(df, seq_col, order_col, state_col).collect()
    if not tm:
        raise ValueError("stationary_distribution: no transitions")
    states = sorted(
        {r["from_state"] for r in tm} | {r["to_state"] for r in tm}
    )
    idx = {s: i for i, s in enumerate(states)}
    n = len(states)
    p = np.zeros((n, n))
    for r in tm:
        # rebuild row-stochastic P from counts (prob is rounded 6dp;
        # counts are exact)
        p[idx[r["from_state"]], idx[r["to_state"]]] = r["cnt"]
    row = p.sum(axis=1)
    sink = row == 0
    p[sink] = 1.0 / n
    p[~sink] = p[~sink] / row[~sink, None]
    pd_ = damping * p + (1.0 - damping) / n
    pi = np.full(n, 1.0 / n)
    it = 0
    res = np.inf
    for it in range(1, max_iter + 1):
        nxt = pi @ pd_
        res = float(np.abs(nxt - pi).sum())
        pi = nxt
        if tol is not None and res < tol:
            break
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (str(s), round(float(pi[idx[s]]), 6), n, it, float(res))
            for s in states
        ],
        "state string, pi double, n_states int, n_iter int,"
        " residual double",
    )


def theil_index(
    df: "DataFrame",
    group_cols: list[str],
    weight_col: str,
) -> "DataFrame":
    """Per-group Theil T inequality index of a weight column — the
    entropy-based companion to :func:`gini_concentration` (Theil 1967,
    public): 0 = perfectly even, ln(n) = one entity holds everything.
    Unlike Gini it is ADDITIVELY DECOMPOSABLE across subgroups
    (between + within), which is why mix audits report both: Gini for
    the familiar scale, Theil when the question is "how much of the
    token concentration is between sources vs within one".

    Algebra chosen for ONE pass: T = (1/n) sum (x/mu) ln(x/mu)
    = sum(x ln x) / (n mu) - ln(mu), so a single map-side-combined
    aggregation per group (n, sum x, sum x ln x) suffices — no rank
    window, no second scan (the corr_matrix moment discipline). Zero
    weights contribute 0 (the x->0 limit of x ln x); NULL weights are
    excluded; negative weights are a contract violation as in Gini.
    Single-entity groups return theil = 0 exactly (mu = x).

    Output: group_cols + n, mean (6dp), theil (6dp).
    """
    x = F.col(weight_col).cast("double")
    base = df.filter(x.isNotNull()).select(*group_cols, x.alias("_x"))
    agg = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("_sx"),
        F.sum(
            F.when(F.col("_x") > 0, F.col("_x") * F.log(F.col("_x")))
            .otherwise(F.lit(0.0))
        ).alias("_sxlx"),
    )
    mu = F.col("_sx") / F.col("n")
    # all-zero-weight groups have mu = 0: the index is 0 by the x->0
    # limit, and the division must not trip ANSI DIVIDE_BY_ZERO (the
    # gini try_divide discipline)
    t = F.try_divide(F.col("_sxlx"), F.col("n") * mu) - F.log(mu)
    return agg.select(
        *group_cols,
        "n",
        F.round(mu, 6).alias("mean"),
        # clamp the -1e-16-class float residue of single-entity /
        # all-equal groups so the index is exactly 0 there; coalesce
        # covers the mu = 0 group (try_divide NULL, log NULL)
        F.round(
            F.coalesce(F.greatest(t, F.lit(0.0)), F.lit(0.0)), 6
        ).alias("theil"),
    )


def sprt_test(
    df: "DataFrame",
    variant_col: str,
    order_col: str,
    success_col: str,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.2,
) -> "DataFrame":
    """Wald's Sequential Probability Ratio Test (Wald 1945, public)
    per experiment arm over a Bernoulli outcome stream — the
    ALWAYS-VALID companion to ab_test/srm_check: instead of one
    fixed-horizon readout, the log-likelihood ratio is tracked event
    by event and the arm STOPS the moment it crosses a boundary,
    with type-I/II error held at (alpha, beta) regardless of when you
    peek. The standard guardrail-metric monitor shape.

    Per observation: llr += ln(p1/p0) on success, ln((1-p1)/(1-p0))
    on failure. Boundaries: accept H1 (rate is p1) at llr >=
    ln((1-beta)/alpha); accept H0 (rate is p0) at llr <=
    ln(beta/(1-alpha)); otherwise 'continue'. The DECISION is taken
    at the FIRST crossing (sequential semantics — later observations
    cannot un-decide), and the first-crossing row is reported even
    though the full stream's final llr is also emitted.

    Distributed shape: one variant-keyed window cumsum (rows ordered
    by (order, success) — remaining ties are exchangeable: equal
    increments commute, so the first-crossing INDEX is deterministic)
    + one map-side-combined agg per variant. Sequential semantics are
    inherently ordered per arm — the same per-group scan contract as
    cusum_revenue; arms are few, events per arm bound the task.

    Output per variant: n, successes, llr_final (6dp), decision
    ('accept_h1' | 'accept_h0' | 'continue'), n_decision (1-based
    observation index of the first crossing; NULL if none),
    llr_decision (6dp; NULL if none).
    """
    for name, v in (("p0", p0), ("p1", p1)):
        if not (0.0 < v < 1.0):
            raise ValueError(f"sprt_test: {name} in (0, 1), got {v}")
    if p0 == p1:
        raise ValueError("sprt_test: p0 and p1 must differ")
    if not (0.0 < alpha < 1.0 and 0.0 < beta < 1.0):
        raise ValueError("sprt_test: alpha/beta in (0, 1)")
    import math

    inc_s = math.log(p1 / p0)
    inc_f = math.log((1.0 - p1) / (1.0 - p0))
    up = math.log((1.0 - beta) / alpha)
    lo = math.log(beta / (1.0 - alpha))
    s = F.col(success_col).cast("int")
    # NULL order is excluded like the other sequential operators
    # (mann_kendall, croston): "sequential" is undefined for an
    # unordered observation, and engines disagree on NULL sort
    # placement (Spark NULLS FIRST vs SQL NULLS LAST)
    base = df.filter(
        s.isNotNull() & F.col(order_col).isNotNull()
    ).select(
        F.col(variant_col).alias("_v"),
        F.col(order_col).alias("_ord"),
        s.alias("_s"),
    )
    w = Window.partitionBy("_v").orderBy("_ord", "_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    walked = base.select(
        "_v",
        "_s",
        F.count(F.lit(1)).over(w).alias("_i"),
        (
            F.sum(
                F.when(F.col("_s") == 1, F.lit(inc_s)).otherwise(
                    F.lit(inc_f)
                )
            ).over(w)
        ).alias("_llr"),
    )
    crossed = F.when(F.col("_llr") >= up, F.lit("accept_h1")).when(
        F.col("_llr") <= lo, F.lit("accept_h0")
    )
    return (
        walked.withColumn("_dec", crossed)
        .groupBy(F.col("_v").alias(variant_col))
        .agg(
            F.max("_i").alias("n"),
            F.sum("_s").cast("long").alias("successes"),
            F.round(F.max_by("_llr", "_i"), 6).alias("llr_final"),
            F.min(F.when(F.col("_dec").isNotNull(), F.col("_i"))).alias(
                "n_decision"
            ),
            F.coalesce(
                F.min_by(
                    "_dec",
                    F.when(F.col("_dec").isNotNull(), F.col("_i")),
                ),
                F.lit("continue"),
            ).alias("decision"),
            F.round(
                F.min_by(
                    "_llr",
                    F.when(F.col("_dec").isNotNull(), F.col("_i")),
                ),
                6,
            ).alias("llr_decision"),
        )
        .select(
            variant_col, "n", "successes", "llr_final", "decision",
            "n_decision", "llr_decision",
        )
    )


def mann_kendall_trend(
    df: "DataFrame",
    group_cols: list[str],
    order_col: str,
    value_col: str,
    z_crit: float = 1.959964,
) -> "DataFrame":
    """Mann-Kendall monotonic-trend test per group (Mann 1945, Kendall
    1975, public) — the NONPARAMETRIC member of the trend family:
    theilsen_revenue estimates the slope, this one answers "is there a
    monotonic trend AT ALL" with no linearity or distribution
    assumption, robust to outliers and exactly right for the daily /
    hourly series the other calendar ops emit.

    S = sum over ordered pairs i < j of sign(x_j - x_i); the normal
    approximation uses the tie-corrected variance
    Var(S) = [n(n-1)(2n+5) - sum_t t(t-1)(2t+5)] / 18 over tie groups
    of size t, and the continuity-corrected
    Z = (S-1)/sqrt(Var) if S > 0, 0 if S = 0, (S+1)/sqrt(Var) if S < 0.

    Input contract: a PRE-AGGREGATED series per group (daily revenue,
    hourly volume — the acf_daily discipline), so the within-group
    pair join is calendar-bounded (n^2 over ~10^2-10^3 points), never
    event-sized. Distributed shape: one group-keyed self-join on
    order_i < order_j + ONE map-side-combined sign agg; the tie
    correction is a second tiny (group, value)-keyed agg. Rows with
    NULL order or value are excluded. Groups need n >= 2 (smaller
    groups emit n with NULL z).

    Output: group_cols + n, s (long), var_s (6dp), z (6dp; NULL when
    Var = 0 — an all-tied series has no trend information), trend
    ('increasing' | 'decreasing' | 'no_trend' at |z| > z_crit).
    """
    v = F.col(value_col).cast("double")
    base = (
        df.filter(v.isNotNull() & F.col(order_col).isNotNull())
        .select(*group_cols, F.col(order_col).alias("_o"), v.alias("_x"))
        # four consumers (both pair-join sides, counts, ties) on
        # DIFFERENT keys, so ReuseExchange cannot share them — without
        # this the upstream series derivation re-scans its source per
        # branch (measured: 6 corpus scans on the daily-revenue gate).
        # The input contract is a pre-aggregated calendar-bounded
        # series, so materializing it once is series-sized.
        .localCheckpoint(eager=False)
    )
    a = base.alias("a")
    b = base.alias("b")
    on = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in group_cols]
    pairs = a.join(b, on + [F.col("a._o") < F.col("b._o")])
    s_agg = pairs.groupBy(
        *[F.col(f"a.{c}").alias(c) for c in group_cols]
    ).agg(
        F.sum(F.signum(F.col("b._x") - F.col("a._x")))
        .cast("long")
        .alias("s")
    )
    counts = base.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))
    ties = (
        base.groupBy(*group_cols, "_x")
        .agg(F.count(F.lit(1)).alias("_t"))
        .filter(F.col("_t") > 1)
        .groupBy(*group_cols)
        .agg(
            F.sum(
                F.col("_t") * (F.col("_t") - 1) * (2 * F.col("_t") + 5)
            ).alias("_tie_sum")
        )
    )
    n = F.col("n").cast("double")
    var_s = (
        n * (n - 1) * (2 * n + 5)
        - F.coalesce(F.col("_tie_sum"), F.lit(0)).cast("double")
    ) / F.lit(18.0)
    sd = F.col("s").cast("double")
    z = F.when(F.col("var_s_raw") <= 0, F.lit(None).cast("double")).when(
        F.col("s") > 0, (sd - 1) / F.sqrt(F.col("var_s_raw"))
    ).when(
        F.col("s") < 0, (sd + 1) / F.sqrt(F.col("var_s_raw"))
    ).otherwise(F.lit(0.0))
    out = (
        counts.join(s_agg, list(group_cols), "left")
        .join(ties, list(group_cols), "left")
        .withColumn("var_s_raw", var_s)
        .withColumn("_z", z)
    )
    return out.select(
        *group_cols,
        "n",
        F.coalesce(F.col("s"), F.lit(0)).alias("s"),
        F.round("var_s_raw", 6).alias("var_s"),
        F.round("_z", 6).alias("z"),
        F.when(F.col("_z").isNull(), "no_trend")
        .when(F.col("_z") > z_crit, "increasing")
        .when(F.col("_z") < -z_crit, "decreasing")
        .otherwise("no_trend")
        .alias("trend"),
    )


def croston_forecast(
    df: "DataFrame",
    group_cols: list[str],
    order_col: str,
    demand_col: str,
    alpha: float = 0.1,
    sba: bool = False,
) -> "DataFrame":
    """Croston's method for INTERMITTENT demand per group (Croston
    1972; SBA bias correction Syntetos & Boylan 2005 — both public):
    the member of the forecast family holt/holt_winters get wrong by
    construction, because smoothing a mostly-zero series drags the
    level to ~0 between demands. Croston smooths TWO series instead —
    nonzero demand size z and inter-demand interval p — and forecasts
    demand-per-period as z/p (SBA multiplies by 1 - alpha/2).

    Input contract: a DENSE pre-aggregated series per group (every
    period present, zero demand as 0 — build it on a calendar spine),
    ordered by ``order_col``. Init at the first nonzero demand d at
    1-based position k: z = d, p = k. Then for each later period with
    demand d > 0 arriving q periods after the previous nonzero:
    z = alpha*d + (1-alpha)*z; p = alpha*q + (1-alpha)*p. Zero
    periods only advance q. Groups with no nonzero demand emit
    nothing (documented — there is no demand process to forecast).

    Distributed shape: the fold touches ONLY the nonzero rows — q is
    reconstructible from consecutive nonzero positions — so the Arrow
    per-group pass runs on the sparse frame (intermittent means MOSTLY
    ZEROS: the shuffle carries the nonzero fraction, the dense zeros
    never leave the scan); one keyed exchange, one output row per
    group (the holt_forecast discipline). (order, demand) mergesort
    ties. SQL-replayable: the same fold is a linear recursion over the
    nonzero rows (the ewma_volumes oracle discipline).

    Output: group_cols + n_periods, n_nonzero, z (6dp), p (6dp),
    forecast (6dp) = (1 - alpha/2 if sba else 1) * z / p.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"croston_forecast: alpha in (0, 1], got {alpha}")
    import pandas as pd

    d = F.col(demand_col).cast("double")
    base = df.filter(d.isNotNull() & F.col(order_col).isNotNull()).select(
        *group_cols, F.col(order_col).alias("_ord"), d.alias("_d")
    )
    w = Window.partitionBy(*group_cols).orderBy("_ord", "_d")
    pos = base.select(
        *group_cols, "_ord", "_d",
        F.count(F.lit(1)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("_pos"),
    )
    totals = pos.groupBy(*group_cols).agg(
        F.max("_pos").alias("n_periods")
    )
    nz = pos.filter(F.col("_d") > 0).select(
        *group_cols, "_ord", "_d", "_pos"
    )
    out_fields = ", ".join(
        f"`{c}` {dict(df.dtypes)[c]}" for c in group_cols
    )
    factor = (1.0 - alpha / 2.0) if sba else 1.0

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_pos"], kind="mergesort")
        head = [pdf[c].iloc[0] for c in group_cols]
        z = p = None
        last = None
        for ppos, dd in zip(pdf["_pos"], pdf["_d"]):
            if z is None:
                z, p = float(dd), float(ppos)
            else:
                q = float(ppos - last)
                z = alpha * float(dd) + (1 - alpha) * z
                p = alpha * q + (1 - alpha) * p
            last = ppos
        return pd.DataFrame(
            [head + [int(len(pdf)), round(z, 6), round(p, 6),
                     round(factor * z / p, 6)]],
            columns=[*group_cols, "n_nonzero", "z", "p", "forecast"],
        )

    folded = nz.groupBy(*group_cols).applyInPandas(
        fold,
        schema=(
            f"{out_fields}, n_nonzero long, z double, p double,"
            " forecast double"
        ),
    )
    return folded.join(totals, list(group_cols)).select(
        *group_cols, "n_periods", "n_nonzero", "z", "p", "forecast"
    )


def fdr_bh(
    df: "DataFrame",
    test_col: str,
    p_col: str,
    q: float = 0.05,
) -> "DataFrame":
    """Benjamini-Hochberg step-up FDR correction (Benjamini &
    Hochberg 1995, public) over a frame of test p-values — the
    multiple-testing guard every metrics dashboard needs the moment it
    watches more than one number: at q = 0.05 and 40 metrics, two
    "significant" results are EXPECTED under pure noise; BH bounds the
    false-discovery RATE instead of the per-test error.

    Step-up rule over p-values sorted ascending with rank i of m:
    critical_i = i * q / m; k = the LARGEST i with p_(i) <=
    critical_i; reject tests with rank <= k (note: rejected tests can
    individually sit above their own critical value — that is the
    step-UP part and is correct).

    Input contract: one row per TEST (a metrics frame, never
    event-sized — tests are tens-to-thousands), so the rank window's
    single-partition sort is bounded by the test count, the same
    small-frame contract as eval_compare. NULL p-values are excluded
    from m (they carry no test). Ties sort by (p, test id) —
    deterministic, and tied p-values share the outcome because the
    step-up k is a function of the sorted sequence.

    Output: test_col, p (6dp), rank, m, bh_critical (6dp), rejected.
    """
    if not (0.0 < q < 1.0):
        raise ValueError(f"fdr_bh: q in (0, 1), got {q}")
    p = F.col(p_col).cast("double")
    base = (
        df.filter(p.isNotNull())
        .select(F.col(test_col).alias("_t"), p.alias("_p"))
        # the test frame feeds four branches (rank, m, the step-up k,
        # the output) on different shapes, so ReuseExchange cannot
        # share them — without this pin the caller's p-value pipeline
        # (often a corpus-sized aggregation) re-runs per branch
        # (measured: 4 corpus scans on the weekday-chi2 gate). The
        # input contract is a TEST frame, so the pin is tiny.
        .localCheckpoint(eager=False)
    )
    w = Window.orderBy("_p", "_t")
    ranked = base.select(
        "_t", "_p", F.row_number().over(w).alias("rank")
    ).crossJoin(
        F.broadcast(base.groupBy().agg(F.count(F.lit(1)).alias("m")))
    )
    crit = F.col("rank") * F.lit(q) / F.col("m")
    marked = ranked.withColumn(
        "_cross", F.when(F.col("_p") <= crit, F.col("rank"))
    )
    k = marked.groupBy().agg(F.max("_cross").alias("_k"))
    return (
        marked.crossJoin(F.broadcast(k))
        .select(
            F.col("_t").alias(test_col),
            F.round("_p", 6).alias("p"),
            "rank",
            "m",
            F.round(crit, 6).alias("bh_critical"),
            F.coalesce(
                F.col("rank") <= F.col("_k"), F.lit(False)
            ).alias("rejected"),
        )
    )


def eb_shrinkage(
    df: "DataFrame",
    group_cols: list[str],
    successes_col: str,
    trials_col: str,
) -> "DataFrame":
    """Empirical-Bayes shrinkage of per-item binomial rates toward a
    method-of-moments Beta prior (Robbins 1956 lineage; the
    moment-matched Beta-binomial is the standard public recipe) — the
    fix for every "this part has a 100% return rate (n=1)" leaderboard:
    small-sample items shrink hard toward the global prior, large
    items barely move.

    Prior fit: mu and sigma^2 are the UNWEIGHTED mean/variance of the
    observed per-item rates (items with trials > 0);
    alpha = mu * (mu(1-mu)/sigma^2 - 1), beta = (1-mu)/mu * alpha.
    Posterior mean per item: (successes + alpha) / (trials + alpha +
    beta). When the moments give no valid prior (sigma^2 = 0 or
    sigma^2 >= mu(1-mu) — under- or over-dispersed beyond Beta), the
    prior columns are NULL and shrunk_rate = raw rate (documented
    fallback, never a garbage prior).

    Distributed shape: ONE map-side-combined moment agg over the item
    frame -> a broadcast 1-row prior -> a codegen projection. The
    item frame is the input contract (pre-aggregate raw events
    first), so nothing here is event-sized.

    Output: group_cols + successes, trials, rate (6dp), shrunk_rate
    (6dp), prior_alpha (6dp), prior_beta (6dp).
    """
    s = F.col(successes_col).cast("double")
    t = F.col(trials_col).cast("double")
    base = df.filter(t > 0).select(
        *group_cols,
        s.alias("_s"),
        t.alias("_t"),
        (s / t).alias("_r"),
    )
    mom = base.groupBy().agg(
        F.avg("_r").alias("_mu"),
        F.var_pop("_r").alias("_var"),
    )
    mu, var = F.col("_mu"), F.col("_var")
    valid = (var > 0) & (var < mu * (1 - mu))
    alpha = F.when(valid, mu * (mu * (1 - mu) / var - 1))
    beta = F.when(valid, (1 - mu) * (mu * (1 - mu) / var - 1))
    prior = mom.select(alpha.alias("_a"), beta.alias("_b"))
    out = base.crossJoin(F.broadcast(prior))
    shrunk = F.when(
        F.col("_a").isNotNull(),
        (F.col("_s") + F.col("_a"))
        / (F.col("_t") + F.col("_a") + F.col("_b")),
    ).otherwise(F.col("_r"))
    return out.select(
        *group_cols,
        F.col("_s").cast("long").alias("successes"),
        F.col("_t").cast("long").alias("trials"),
        F.round("_r", 6).alias("rate"),
        F.round(shrunk, 6).alias("shrunk_rate"),
        F.round("_a", 6).alias("prior_alpha"),
        F.round("_b", 6).alias("prior_beta"),
    )


def ipw_ate(
    df: "DataFrame",
    treat_col: str,
    outcome_col: str,
    score_col: str,
) -> "DataFrame":
    """Inverse-propensity-weighted average treatment effect (Horvitz &
    Thompson 1952 weighting; the Hajek-normalized estimator reported
    here is the standard stabilized form) — the OBSERVATIONAL member
    of the causal family beside did_ab (parallel trends) and
    cuped/stratified_ab (randomized + variance reduction): when
    treatment was NOT randomized but a propensity score e(x) is
    available, weighting treated units by 1/e and controls by 1/(1-e)
    reweights both arms to the full population.

    ATE = sum(w y | treated)/sum(w | treated) - same for control
    (Hajek normalization — self-normalizing, robust to weight scale).
    The weight diagnostics every IPW readout must carry ride along:
    effective sample size ESS = (sum w)^2 / sum w^2 per arm (extreme
    propensities crater it — THE overlap warning) and the max weight.
    Rows with scores outside (0, 1) or NULL outcome/treatment are
    excluded and counted (documented; a clipped/trimmed score is the
    caller's policy decision).

    ONE map-side-combined aggregation over the unit frame (filtered
    aggregates per arm, the ab_test shape); one output row.

    Output (6dp): n_treated, n_control, n_excluded, mean_treated,
    mean_control, ate, ess_treated, ess_control, max_weight.
    """
    tr = F.col(treat_col).cast("int")
    y = F.col(outcome_col).cast("double")
    e = F.col(score_col).cast("double")
    ok = (
        tr.isNotNull() & y.isNotNull() & e.isNotNull()
        & (e > 0) & (e < 1)
    )
    w = F.when(tr == 1, 1.0 / e).otherwise(1.0 / (1.0 - e))
    base = df.select(
        tr.alias("_tr"), y.alias("_y"),
        F.when(ok, w).alias("_w"),
    )
    is_t = F.col("_tr") == 1
    agg = base.groupBy().agg(
        F.count(F.when(is_t & F.col("_w").isNotNull(), 1)).alias(
            "n_treated"
        ),
        F.count(F.when(~is_t & F.col("_w").isNotNull(), 1)).alias(
            "n_control"
        ),
        F.count(F.when(F.col("_w").isNull(), 1)).alias("n_excluded"),
        F.sum(F.when(is_t, F.col("_w") * F.col("_y"))).alias("_swy_t"),
        F.sum(F.when(is_t, F.col("_w"))).alias("_sw_t"),
        F.sum(F.when(is_t, F.col("_w") * F.col("_w"))).alias("_sww_t"),
        F.sum(F.when(~is_t, F.col("_w") * F.col("_y"))).alias("_swy_c"),
        F.sum(F.when(~is_t, F.col("_w"))).alias("_sw_c"),
        F.sum(F.when(~is_t, F.col("_w") * F.col("_w"))).alias("_sww_c"),
        F.max("_w").alias("_wmax"),
    )
    mt = F.col("_swy_t") / F.col("_sw_t")
    mc = F.col("_swy_c") / F.col("_sw_c")
    return agg.select(
        "n_treated",
        "n_control",
        "n_excluded",
        F.round(mt, 6).alias("mean_treated"),
        F.round(mc, 6).alias("mean_control"),
        F.round(mt - mc, 6).alias("ate"),
        F.round(
            F.col("_sw_t") * F.col("_sw_t") / F.col("_sww_t"), 6
        ).alias("ess_treated"),
        F.round(
            F.col("_sw_c") * F.col("_sw_c") / F.col("_sww_c"), 6
        ).alias("ess_control"),
        F.round("_wmax", 6).alias("max_weight"),
    )


def qini_curve(
    df: "DataFrame",
    treat_col: str,
    outcome_col: str,
    score_col: str,
    n_tiles: int = 10,
) -> "DataFrame":
    """Qini curve per score decile (Radcliffe 2007, public) — the
    UPLIFT completion of :func:`lift_table`: a propensity/lift table
    scores "who responds", a Qini curve scores "who responds BECAUSE
    treated", which is the targeting question an uplift model answers.
    Walking down the score ranking, cumulative incremental responses
    Q_i = cum_resp_treated_i - cum_resp_control_i * (cum_n_t_i /
    cum_n_c_i); the random-targeting baseline is the straight line to
    Q_final, and the gap between curve and line is the model's value.

    Scale shape is lift_table's: tile edges are exact interpolated
    percentiles fetched once as driver literals (codegen tile
    assignment, never an ntile global sort); per-tile stats are ONE
    map-combined agg; the cumulative walk is a window over <= n_tiles
    rows. Ties at an edge share a tile (documented, matches the
    oracle). Rows with NULL score/outcome/treatment are excluded.
    Raises on empty input or an empty arm (uplift needs both). A
    zero-control PREFIX (top tiles all-treated) emits NULL qini for
    those tiles — no defined uplift yet — rather than crashing.

    Output per tile (1 = top scores): tile, n_treated, n_control,
    resp_treated, resp_control, cum_n_treated, cum_n_control,
    cum_resp_treated, cum_resp_control, qini (6dp), qini_random
    (6dp — the random-targeting line at this tile's population
    fraction).
    """
    if n_tiles < 2:
        raise ValueError(f"qini_curve: n_tiles >= 2, got {n_tiles}")
    tr = F.col(treat_col).cast("int")
    y = F.col(outcome_col).cast("double")
    s = F.col(score_col).cast("double")
    base = df.select(
        tr.alias("_tr"), y.alias("_y"), s.alias("_s")
    ).filter(
        F.col("_tr").isNotNull()
        & F.col("_y").isNotNull()
        & F.col("_s").isNotNull()
    )
    qs = [i / n_tiles for i in range(1, n_tiles)]
    edges_row = base.agg(
        F.expr(
            f"percentile(_s, array({', '.join(str(q) for q in qs)}))"
        ).alias("e")
    ).first()
    if edges_row["e"] is None:
        raise ValueError("qini_curve: no usable rows")
    edges = [float(x) for x in edges_row["e"]]
    asc = F.lit(1)
    for e in edges:
        asc = asc + F.when(F.col("_s") > F.lit(e), 1).otherwise(0)
    is_t = F.col("_tr") == 1
    per_tile = (
        base.withColumn("tile", F.lit(n_tiles + 1) - asc)
        .groupBy("tile")
        .agg(
            F.count(F.when(is_t, 1)).alias("n_treated"),
            F.count(F.when(~is_t, 1)).alias("n_control"),
            F.round(
                F.coalesce(F.sum(F.when(is_t, F.col("_y"))), F.lit(0.0)),
                6,
            ).alias("resp_treated"),
            F.round(
                F.coalesce(F.sum(F.when(~is_t, F.col("_y"))), F.lit(0.0)),
                6,
            ).alias("resp_control"),
        )
        # <= n_tiles rows feeding the cumulative window AND the final
        # total — pin so the corpus agg runs once (the fdr_bh lesson)
        .localCheckpoint(eager=False)
    )
    tot = per_tile.agg(
        F.sum("n_treated").alias("_nt"), F.sum("n_control").alias("_nc")
    ).first()
    if not tot["_nt"] or not tot["_nc"]:
        raise ValueError("qini_curve: both arms must be non-empty")
    w = Window.orderBy("tile").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_tile.select(
        "tile",
        "n_treated",
        "n_control",
        "resp_treated",
        "resp_control",
        F.sum("n_treated").over(w).alias("cum_n_treated"),
        F.sum("n_control").over(w).alias("cum_n_control"),
        F.sum("resp_treated").over(w).alias("cum_resp_treated"),
        F.sum("resp_control").over(w).alias("cum_resp_control"),
    )
    # a zero-control prefix (top tiles all-treated) has no defined
    # uplift yet: NULL qini there, never an ANSI divide-by-zero crash
    qini = F.col("cum_resp_treated") - F.col("cum_resp_control") * (
        F.try_divide(F.col("cum_n_treated"), F.col("cum_n_control"))
    )
    # Q_final via a window over the full (bounded) tile frame, so the
    # random-targeting line needs no second pass
    wall = Window.orderBy("tile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    q_final = F.last(qini).over(wall)
    frac = (F.col("cum_n_treated") + F.col("cum_n_control")) / F.lit(
        float(tot["_nt"] + tot["_nc"])
    )
    return cum.select(
        "tile",
        "n_treated",
        "n_control",
        "resp_treated",
        "resp_control",
        "cum_n_treated",
        "cum_n_control",
        "cum_resp_treated",
        "cum_resp_control",
        F.round(qini, 6).alias("qini"),
        F.round(q_final * frac, 6).alias("qini_random"),
    ).orderBy("tile")


def markov_attribution(
    df: "DataFrame",
    user_col: str,
    ts_col: str,
    type_col: str,
    conversion_type: str,
    n_iter: int = 60,
    max_channels: int = 200,
) -> "DataFrame":
    """Data-driven Markov-chain attribution via removal effects
    (Anderl, Becker, von Wangenheim & Schumann 2014, public) — the
    model-based completion of :func:`multi_touch_attribution`'s
    heuristics: build the first-order journey chain START -> channels
    -> {CONV, NULL}, and credit each channel by how much the
    conversion probability DROPS when that channel is removed
    (redirected to NULL). The heuristic models assert a credit shape;
    this one measures it from the observed paths.

    Journey contract (deterministic): per user, events ordered by
    (ts, type); the journey is cut at the FIRST ``conversion_type``
    event, which becomes the CONV absorber; users who never convert
    end with an explicit (last channel -> NULL) step. Self-loops
    (A -> A) are kept, per the published model.

    Distributed shape: ONE user-keyed window pass builds transitions
    (lag + first-conversion cut), one map-combined (src, dst) count —
    everything after that operates on the channels²-bounded count
    frame: the (``max_channels``-guarded) matrix collects to the
    driver, and the absorption probabilities run ``n_iter`` FIXED
    iterations of x <- r + Q x per removal scenario in plain Python
    doubles — fixed-iteration by design so the whole solve is
    replayable (the pagerank_parts discipline; a tolerance stop would
    not be).

    Output per channel: channel, removal_effect (6dp, 1 -
    p_removed/p_base), share (6dp, normalized over positive removal
    effects), attributed_conversions (6dp, share x conversions),
    n_conversions, p_conv (6dp, the base chain's conversion
    probability from START).
    """
    if n_iter < 1:
        raise ValueError(f"markov_attribution: n_iter >= 1, got {n_iter}")
    w = Window.partitionBy("_u").orderBy("_ts", "_st")
    base = df.select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.when(F.col(type_col) == conversion_type, F.lit("CONV"))
        .otherwise(F.col(type_col).cast("string"))
        .alias("_st"),
    ).filter(F.col("_st").isNotNull() & F.col("_ts").isNotNull())
    rn = base.select(
        "_u",
        "_st",
        F.row_number().over(w).alias("_rn"),
        F.min(F.when(F.col("_st") == "CONV", F.row_number().over(w))).over(
            Window.partitionBy("_u")
        ).alias("_conv_rn"),
        F.max(F.row_number().over(w)).over(
            Window.partitionBy("_u")
        ).alias("_last_rn"),
    )
    cut = rn.filter(
        F.col("_conv_rn").isNull() | (F.col("_rn") <= F.col("_conv_rn"))
    )
    steps = cut.select(
        "_u",
        F.coalesce(
            F.lag("_st").over(Window.partitionBy("_u").orderBy("_rn")),
            F.lit("START"),
        ).alias("src"),
        F.col("_st").alias("dst"),
        "_rn",
        "_conv_rn",
        "_last_rn",
    )
    terminal = cut.filter(
        F.col("_conv_rn").isNull() & (F.col("_rn") == F.col("_last_rn"))
    ).select(F.col("_st").alias("src"), F.lit("NULL").alias("dst"))
    trans = (
        steps.select("src", "dst")
        .unionByName(terminal)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rows = trans.collect()  # channels²-bounded by the guard below
    states = sorted(
        ({r["src"] for r in rows} | {r["dst"] for r in rows})
        - {"START", "CONV", "NULL"}
    )
    if len(states) > max_channels:
        raise ValueError(
            f"markov_attribution: {len(states)} channels exceeds "
            f"max_channels={max_channels} — pre-bucket the channel "
            "column (the driver matrix contract)"
        )
    transient = ["START"] + states
    counts: dict = {}
    outs: dict = {}
    for r in rows:
        counts[(r["src"], r["dst"])] = counts.get(
            (r["src"], r["dst"]), 0
        ) + int(r["n"])
        outs[r["src"]] = outs.get(r["src"], 0) + int(r["n"])

    # probabilities precomputed ONCE — they are identical across all
    # removal scenarios, and recomputing them inside the iteration
    # loop would cost O(n_iter * k^3) dict lookups at the
    # max_channels guard (review finding, r11)
    def prob(s: str, d: str) -> float:
        tot = outs.get(s, 0)
        return counts.get((s, d), 0) / tot if tot else 0.0

    r_conv = {s: prob(s, "CONV") for s in transient}
    p_mat = {
        s: [(d, prob(s, d)) for d in transient if d != "START"]
        for s in transient
    }

    def p_conv(removed: str | None) -> float:
        x = {s: 0.0 for s in transient}
        for _ in range(n_iter):
            nxt = {}
            for s_ in transient:
                if s_ == removed:
                    nxt[s_] = 0.0
                    continue
                acc = r_conv[s_]
                for d_, p_ in p_mat[s_]:
                    if d_ == removed:
                        continue
                    acc += p_ * x[d_]
                nxt[s_] = acc
            x = nxt
        return x["START"]

    p_base = p_conv(None)
    n_conversions = sum(
        v for (s_, d_), v in counts.items() if d_ == "CONV"
    )
    effects = []
    for c in states:
        pr = p_conv(c)
        re = 1.0 - (pr / p_base) if p_base > 0 else 0.0
        effects.append((c, re))
    pos_total = sum(max(e, 0.0) for _, e in effects)
    out_rows = []
    for c, re in effects:
        share = (max(re, 0.0) / pos_total) if pos_total > 0 else 0.0
        out_rows.append(
            (
                c,
                round(re, 6),
                round(share, 6),
                round(share * n_conversions, 6),
                int(n_conversions),
                round(p_base, 6),
            )
        )
    spark = df.sparkSession
    return spark.createDataFrame(
        out_rows,
        "channel string, removal_effect double, share double,"
        " attributed_conversions double, n_conversions long,"
        " p_conv double",
    )


def diversity_index(
    df: "DataFrame",
    group_cols: list[str],
    class_col: str,
) -> "DataFrame":
    """Per-group categorical diversity profile — Shannon entropy
    (nats), the Gini-Simpson index 1 - sum p^2 (probability two draws
    differ) and Pielou evenness H / ln(richness) (all public,
    Shannon 1948 / Simpson 1949 / Pielou 1966): the data-mix
    diagnostics a training-corpus audit runs per source (is this
    source one language in disguise? did dedup collapse the topic
    mix?), complementing theil/gini which score WEIGHT concentration
    over entities rather than CLASS diversity.

    Distributed shape: one (group, class) map-side-combined count,
    one group agg over the class-sized frame — no windows, no joins.
    NULL classes are excluded. Single-class groups have evenness NULL
    (ln 1 = 0; no evenness to speak of), entropy and simpson exactly
    0.

    Output: group_cols + n (rows), richness (classes), shannon (6dp),
    simpson (6dp), evenness (6dp).
    """
    base = df.filter(F.col(class_col).isNotNull())
    cc = base.groupBy(*group_cols, F.col(class_col).alias("_c")).agg(
        F.count(F.lit(1)).alias("_m")
    )
    return _diversity_table(cc, group_cols)


def _diversity_table(cc: "DataFrame", group_cols: list[str]) -> "DataFrame":
    """Shared tail of diversity_index and the streaming diversity
    monitor: the entropy/evenness algebra over a (group_cols, _c, _m)
    class-count frame — class counts are LINEAR, so the stream's
    summed batch partitions feed the IDENTICAL tail and drained
    totals equal the one-shot profile exactly (the _srm_table
    discipline)."""
    g = cc.groupBy(*group_cols).agg(
        F.sum("_m").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("richness"),
        F.sum(F.col("_m") * F.log(F.col("_m"))).alias("_sml"),
        F.sum(F.col("_m") * F.col("_m")).cast("double").alias("_sm2"),
    )
    n = F.col("n").cast("double")
    shannon = F.log(n) - F.col("_sml") / n
    return g.select(
        *group_cols,
        "n",
        "richness",
        # clamp the 1e-16-class float residue of single-class groups
        F.round(F.greatest(shannon, F.lit(0.0)), 6).alias("shannon"),
        F.round(F.lit(1.0) - F.col("_sm2") / (n * n), 6).alias("simpson"),
        F.round(
            F.when(
                F.col("richness") > 1,
                F.greatest(shannon, F.lit(0.0))
                / F.log(F.col("richness").cast("double")),
            ),
            6,
        ).alias("evenness"),
    )


def wasserstein_1d(
    old: "DataFrame",
    new: "DataFrame",
    value_col: str,
    n_buckets: int = 32,
) -> "DataFrame":
    """EXACT 1-D Wasserstein-1 (earth mover's) distance between two
    numeric snapshots — the MAGNITUDE member of the drift family:
    KS reports the largest CDF gap (where), PSI a binned divergence,
    W1 the integral of |CDF_old - CDF_new| — the average distance a
    unit of probability mass must MOVE, in the column's own units
    (a 2x price shift reads as dollars, not as a capped sup).

    Scale shape is ks_drift's two-level cumsum: the per-value count
    frame (distinct values x 2 counts — the only data-sized frame) is
    range-bucketed by driver-literal quantile edges, cumsummed within
    buckets in parallel, and stitched with broadcast per-bucket
    offsets. The integral needs each value's PREDECESSOR: within a
    bucket that is one lag; across the boundary it is the previous
    bucket's max value, carried on the same broadcast offset frame —
    never a single-partition window over the data. CDFs at the
    predecessor come for free as (offset + cum - own count), no
    second lag.

    Output: one row — wasserstein (6dp), n_old, n_new.
    """
    def side(df, name):
        return (
            df.select(F.col(value_col).cast("double").alias("v"))
            .filter(F.col("v").isNotNull())
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias(name))
        )

    counts = (
        side(old, "c_old")
        .join(side(new, "c_new"), "v", "full_outer")
        .na.fill({"c_old": 0, "c_new": 0})
    )
    tot = counts.agg(
        F.sum("c_old").alias("n_old"), F.sum("c_new").alias("n_new")
    ).first()
    n_old, n_new = int(tot["n_old"] or 0), int(tot["n_new"] or 0)
    if n_old == 0 or n_new == 0:
        raise ValueError(
            "wasserstein_1d: both snapshots need non-null values"
        )
    qs = [i / n_buckets for i in range(1, n_buckets)]
    edges_row = counts.agg(
        F.expr(
            f"percentile(v, array({', '.join(str(q) for q in qs)}))"
        ).alias("e")
    ).first()
    edges = sorted({float(x) for x in edges_row["e"]})
    b = F.lit(0)
    for i, e in enumerate(edges):
        b = F.when(F.col("v") > F.lit(e), F.lit(i + 1)).otherwise(b)
    bucketed = counts.withColumn("bucket", b)
    w = Window.partitionBy("bucket").orderBy("v")
    cum = bucketed.select(
        "bucket", "v", "c_old", "c_new",
        F.sum("c_old").over(w).alias("cum_old"),
        F.sum("c_new").over(w).alias("cum_new"),
        F.lag("v").over(w).alias("_pv"),
    )
    btot = bucketed.groupBy("bucket").agg(
        F.sum("c_old").alias("bo"),
        F.sum("c_new").alias("bn"),
        F.max("v").alias("bmax"),
    )
    bw = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )  # single-partition window over <= n_buckets rows — bounded
    offsets = btot.select(
        "bucket",
        F.coalesce(F.sum("bo").over(bw), F.lit(0)).alias("off_old"),
        F.coalesce(F.sum("bn").over(bw), F.lit(0)).alias("off_new"),
        F.lag("bmax").over(Window.orderBy("bucket")).alias("prev_bmax"),
    )
    joined = cum.join(F.broadcast(offsets), "bucket")
    prev_v = F.coalesce(F.col("_pv"), F.col("prev_bmax"))
    cdf_prev_old = (
        F.col("off_old") + F.col("cum_old") - F.col("c_old")
    ) / F.lit(float(n_old))
    cdf_prev_new = (
        F.col("off_new") + F.col("cum_new") - F.col("c_new")
    ) / F.lit(float(n_new))
    term = F.abs(cdf_prev_old - cdf_prev_new) * (F.col("v") - prev_v)
    out = joined.agg(
        F.round(
            F.coalesce(
                F.sum(F.when(prev_v.isNotNull(), term)), F.lit(0.0)
            ),
            6,
        ).alias("wasserstein")
    )
    return out.select(
        "wasserstein",
        F.lit(n_old).alias("n_old"),
        F.lit(n_new).alias("n_new"),
    )


def pacf(
    df: "DataFrame",
    group_cols: list[str],
    order_col: str,
    value_col: str,
    max_lag: int = 7,
) -> "DataFrame":
    """Per-segment PARTIAL autocorrelation function via the
    Durbin-Levinson recursion (Durbin 1960, public) — the AR-order
    diagnostic that completes :func:`acf`: the ACF of an AR(p) series
    tails off forever, its PACF cuts off sharply after lag p, which is
    the Box-Jenkins readout that picks the model order.

    The distributed work is :func:`acf`'s single keyed exchange plus
    one more keyed exchange for the per-group recursion:
    Durbin-Levinson runs EXECUTOR-SIDE via ``applyInPandas`` over each
    group's max_lag-sized autocorrelation vector (r11 VERDICT item 2 —
    the prior driver-side collect was groups-sized, a funnel for
    high-cardinality groupings at 100 TB; the distributed form carries
    no per-group state to the driver at all). The recursion consumes
    THE 6dp-ROUNDED acf values in plain Python doubles — the published
    recursion on inputs both engines share exactly, so the gate
    replays bit-for-bit (the partial_corr rounded-input trick), and
    the executor-side path is value-identical to the old driver-side
    one because the arithmetic is byte-for-byte the same.
    phi_mm = (rho_m - sum_j phi_{m-1,j} rho_{m-j}) /
    (1 - sum_j phi_{m-1,j} rho_j); a degenerate denominator (|den| <
    1e-12, numerically non-stationary series) yields NULL pacf from
    that lag on rather than garbage. Groups whose acf is NULL
    (constant series) emit NULL pacf at every lag.

    Output: group_cols + lag (1..max_lag), pacf (6dp), n (series
    length).
    """
    import pandas as pd

    rho_df = acf(df, group_cols, order_col, value_col, max_lag)

    def _durbin_levinson(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("lag")
        key = tuple(pdf.iloc[0][c] for c in group_cols)
        n = int(pdf["n"].iloc[0])
        rho = {
            int(lag): (None if pd.isna(r) else float(r))
            for lag, r in zip(pdf["lag"], pdf["autocorr"])
        }
        k = max(rho)
        out = []
        if any(rho.get(m) is None for m in range(1, k + 1)):
            for m in range(1, k + 1):
                out.append(key + (m, None, n))
        else:
            phi_prev: list = []
            pacfs: list = []
            dead = False
            for m in range(1, k + 1):
                if dead:
                    pacfs.append(None)
                    continue
                num = rho[m] - sum(
                    phi_prev[j] * rho[m - 1 - j] for j in range(m - 1)
                )
                den = 1.0 - sum(
                    phi_prev[j] * rho[j + 1] for j in range(m - 1)
                )
                if abs(den) < 1e-12:
                    dead = True
                    pacfs.append(None)
                    continue
                phi_mm = num / den
                phi_prev = [
                    phi_prev[j] - phi_mm * phi_prev[m - 2 - j]
                    for j in range(m - 1)
                ] + [phi_mm]
                pacfs.append(phi_mm)
            for m in range(1, k + 1):
                v = pacfs[m - 1]
                out.append(
                    key + (m, round(v, 6) if v is not None else None, n)
                )
        return pd.DataFrame(
            out, columns=list(group_cols) + ["lag", "pacf", "n"]
        )

    fields = ", ".join(
        f"`{c}` {dict(df.dtypes)[c]}" for c in group_cols
    )
    return rho_df.groupBy(*group_cols).applyInPandas(
        _durbin_levinson, f"{fields}, lag int, pacf double, n bigint"
    )
