"""As-of join — an operator Spark lacks natively (task mandate: custom
operators as compositions of existing DataFrame ops when semantics
allow).

``asof_join(left, right)``: for each left row (key, t), attach the most
recent right row with the same key and right.t <= left.t (backward
as-of, the kdb/pandas/DuckDB default), with ``direction="forward"``
the EARLIEST right row with right.t >= left.t, or with
``direction="nearest"`` whichever of the two sits closer; ``tolerance``
bounds the time gap in every direction (FULL pandas ``merge_asof``
direction x exact x tolerance parity — pinned against pandas itself in
tests/test_asof.py).

Implementation is the union-sort trick, NOT a range join:

  union(left-tagged, right-tagged)
  window over (key) ordered by (t, tag) rows unbounded preceding
  last non-null right-payload  ->  filter back to left rows

(forward direction orders the window DESCENDING — "earliest following"
is "last preceding" of the reversed sequence; same single shuffle.)

One shuffle on the key, linear scan per partition — no quadratic
candidate pairs, no skew-prone inequality join. At 100 TB this is the
same cost as a groupBy over (key) — the optimal shape for this
operator. Right-side ties on (key, t): pass ``tie_col`` to resolve to
the row with the LARGEST tie_col value (deterministic); without it,
whichever tied row the sort happens to place last wins.

DuckDB's native ASOF JOIN is the correctness oracle in
__spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
    strict: bool = False,
    tie_col: str | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join with pandas ``merge_asof`` semantics.

    left:  any columns including ``by`` keys and ``on`` (orderable).
    right: ``by`` + ``on`` + payload columns.
    strict=False matches right.t <= left.t (backward) / >= (forward);
    strict=True excludes equality (pandas ``allow_exact_matches=False``).
    direction: "backward" (default), "forward", or "nearest" (min
    |left.t - right.t|; exact-distance ties prefer the backward match —
    pinned against pandas itself).
    tolerance: maximum |left.t - right.t| for a match, in the units of
    ``on`` cast to double (epoch SECONDS for timestamps); matches
    farther away come back NULL, exactly like pandas' ``tolerance``.
    tie_col: right payload column used to break (key, t) ties — the row
    with the largest tie_col wins (ascending sort, last-non-null fill).

    Returns left columns + right payload columns renamed ``<col><suffix>``
    (null when no matching right row exists). Right rows with a NULL
    ``on`` value are EXCLUDED — a NULL timestamp would otherwise sort
    first and become a universal "earliest" match, where DuckDB's
    native ASOF JOIN (the oracle) drops NULL-key rows.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    by = [by] if isinstance(by, str) else list(by)
    value_cols = value_cols or [
        c for c in right.columns if c not in set(by) | {on}
    ]
    right = right.filter(F.col(on).isNotNull())
    # tag: the right row must sort BEFORE the left row it may match at
    # equal t when equality is allowed, AFTER it when strict — in the
    # window's scan order (ascending for backward, descending for
    # forward), so the tags are direction-independent
    right_tag, left_tag = (0, 1) if not strict else (1, 0)
    # The whole right row travels as ONE struct (matched timestamp +
    # every payload column) so the fill is atomic: a NULL payload value
    # on the matched row stays NULL instead of last(ignorenulls) sliding
    # past it to an older/newer right row — pandas merge_asof returns
    # the matched row's NULL, and with tolerance set the slid-to row
    # could even lie outside the tolerance (r5 ADVICE finding).
    rt_field = "_rt_"
    while rt_field in value_cols:  # paranoia: avoid payload-name clash
        rt_field += "_"
    from pyspark.sql.types import StructField, StructType

    rp_type = StructType(
        [StructField(rt_field, right.schema[on].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    l_tagged = left.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(left_tag).alias("_tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(rp_type).alias("_rp"),
    )
    r_tagged = right.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(right_tag).alias("_tag"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
        F.struct(
            F.col(on).alias(rt_field),
            *[F.col(c).alias(c) for c in value_cols],
        ).alias("_rp"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    def _order(descending: bool):
        order = [
            F.col("_t").desc() if descending else F.col("_t").asc(),
            F.col("_tag").asc(),
        ]
        if tie_col is not None:
            # tied right rows order ascending by tie_col; last-non-null
            # fill then deterministically picks the max-tie_col row
            # (left rows have a NULL _rp → NULL tie value → sort first,
            # before any tied right row, preserving the tag contract)
            order.append(F.col("_rp").getField(tie_col).asc())
        return order

    def _window(descending: bool):
        return (
            Window.partitionBy(*by)
            .orderBy(*_order(descending))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    def _gap(struct_col):
        return F.abs(
            F.col("_t").cast("double")
            - struct_col.getField(rt_field).cast("double")
        )

    if direction == "nearest":
        # both directional fills over ONE keyed exchange (same
        # partitionBy, opposite orderings — Spark adds a second Sort,
        # not a second shuffle), then pick the smaller gap; exact-gap
        # ties prefer the BACKWARD match (pinned vs pandas itself)
        filled = unioned.select(
            *by,
            "_t",
            "_tag",
            "_l",
            F.last("_rp", ignorenulls=True).over(_window(False)).alias("_fb"),
            F.last("_rp", ignorenulls=True).over(_window(True)).alias("_ff"),
        )
        b_ok = F.col("_fb").isNotNull()
        f_ok = F.col("_ff").isNotNull()
        chosen = (
            F.when(
                b_ok & (~f_ok | (_gap(F.col("_fb")) <= _gap(F.col("_ff")))),
                F.col("_fb"),
            )
            .when(f_ok, F.col("_ff"))
            .otherwise(F.lit(None).cast(rp_type))
        )
        filled = filled.select(*by, "_t", "_tag", "_l", chosen.alias("_f_rp"))
    else:
        filled = unioned.select(
            *by,
            "_t",
            "_tag",
            "_l",
            F.last("_rp", ignorenulls=True)
            .over(_window(direction == "forward"))
            .alias("_f_rp"),
        )
    # a NULL left `on` never matches (pandas/DuckDB contract). Backward
    # gets this for free (NULLs sort FIRST ascending, before any right
    # row); forward scans descending where NULLs sort LAST and would see
    # every right row — guard both directions uniformly.
    matched = F.col("_t").isNotNull() & F.col("_f_rp").isNotNull()
    if tolerance is not None:
        # the matched right timestamp is a field of the SAME struct the
        # payload comes from, so the gap check and the emitted values
        # always describe the same right row; a match farther than the
        # tolerance nulls the payload (pandas contract), it does NOT
        # fall back to an earlier/later row
        matched = matched & (_gap(F.col("_f_rp")) <= F.lit(float(tolerance)))
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns] + [
        F.when(matched, F.col("_f_rp").getField(c)).alias(f"{c}{suffix}")
        for c in value_cols
    ]
    return filled.filter(F.col("_tag") == left_tag).select(*out_cols)
