"""As-of join — an operator Spark lacks natively (task mandate: custom
operators as compositions of existing DataFrame ops when semantics
allow).

``asof_join(left, right)``: for each left row (key, t), attach the most
recent right row with the same key and right.t <= left.t (backward
as-of, the kdb/pandas/DuckDB default).

Implementation is the union-sort trick, NOT a range join:

  union(left-tagged, right-tagged)
  window over (key) ordered by (t, tag) rows unbounded preceding
  last non-null right-payload  ->  filter back to left rows

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
) -> DataFrame:
    """Backward as-of join.

    left:  any columns including ``by`` keys and ``on`` (orderable).
    right: ``by`` + ``on`` + payload columns.
    strict=False matches right.t <= left.t; strict=True right.t < left.t.
    tie_col: right payload column used to break (key, t) ties — the row
    with the largest tie_col wins (ascending sort, last-non-null fill).

    Returns left columns + right payload columns renamed ``<col><suffix>``
    (null when no earlier right row exists). Right rows with a NULL
    ``on`` value are EXCLUDED — a NULL timestamp would otherwise sort
    first and become a universal "earliest" match, where DuckDB's
    native ASOF JOIN (the oracle) drops NULL-key rows.
    """
    by = [by] if isinstance(by, str) else list(by)
    value_cols = value_cols or [
        c for c in right.columns if c not in set(by) | {on}
    ]
    right = right.filter(F.col(on).isNotNull())
    # tag: right rows sort BEFORE left rows at equal t for <=, AFTER for <
    right_tag, left_tag = (0, 1) if not strict else (1, 0)
    l_tagged = left.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(left_tag).alias("_tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(right_tag).alias("_tag"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    order = ["_t", "_tag"]
    if tie_col is not None:
        # tied right rows order ascending by tie_col; last-non-null fill
        # then deterministically picks the max-tie_col row
        order.append(f"_r_{tie_col}")
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *by,
        "_t",
        "_tag",
        "_l",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_rf_{c}")
            for c in value_cols
        ],
    )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns] + [
        F.col(f"_rf_{c}").alias(f"{c}{suffix}") for c in value_cols
    ]
    return filled.filter(F.col("_tag") == left_tag).select(*out_cols)
