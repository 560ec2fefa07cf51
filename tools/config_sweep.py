"""Config-robustness sweep (r12 VERDICT item 9, standing): re-compare
EVERY oracle-backed registry entry against its DuckDB oracle under a
grid of (sf_dir, spark.sql.shuffle.partitions) cells — the sweep that
caught text_embed_knn flapping ±1 ulp with partitioning (BLAS dgemm
blocking follows Arrow batch shape follows partitioning) in round 12.
A query whose result depends on the partition count is exactly the
class of bug that stays invisible at one config and bites at 1000
executors, so this is the permanent reproduction command:

    python tools/config_sweep.py                     # sf0.01 x {4, 32}
    python tools/config_sweep.py --sf-dirs /root/testdata/sf0.001,/root/testdata/sf0.01 \
        --partitions 4,32                            # the full r12 sweep
    python tools/config_sweep.py --partitions 4 text_embed_knn knn_ip

shuffle.partitions is a RUNTIME conf (spark.conf.set), so one session
serves every cell; rows-only entries are skipped (nothing to compare).
Exit 0 = every oracle-backed entry hash-green in every cell.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry_mod
from driver_sim import TABLES, canon
from indexlab_spark.session import get_spark


def run_cell(spark, con, sf_dir: str, partitions: int, only: set[str]):
    """One (sf_dir, partitions) cell: compare every oracle-backed entry.
    Returns the list of failing entry names."""
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue  # rows-only: no oracle to compare against
        n_run += 1
        try:
            sdf = fn(spark, sf_dir).toPandas()
            s_vals, s_cols = canon(sdf)
            odf = con.execute(oracles[name]).fetchdf()
            o_vals, o_cols = canon(odf)
        except Exception as e:  # noqa: BLE001 - mirror driver_sim's capture
            print(f"  {name}: ERR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if s_cols != o_cols or s_vals != o_vals:
            ndiff = sum(1 for a, b in zip(s_vals, o_vals) if a != b)
            print(
                f"  {name}: MISMATCH (rows {len(s_vals)} vs {len(o_vals)}, "
                f"{ndiff} differing)"
            )
            failures.append(name)
    print(
        f"  cell done: {n_run - len(failures)}/{n_run} green"
        + (f", FAILURES: {failures}" if failures else "")
    )
    return failures


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--sf-dirs", default="/root/testdata/sf0.01",
        help="comma-separated parquet dirs (default sf0.01)",
    )
    ap.add_argument(
        "--partitions", default="4,32",
        help="comma-separated shuffle-partition counts (default 4,32)",
    )
    ap.add_argument("only", nargs="*", help="restrict to these entries")
    args = ap.parse_args()

    spark = get_spark("config-sweep")
    only = set(args.only)
    all_failures: dict[str, list[str]] = {}
    for sf_dir in args.sf_dirs.split(","):
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        for p in args.partitions.split(","):
            t0 = time.time()
            print(f"cell: sf_dir={sf_dir} shuffle_partitions={p}")
            fails = run_cell(spark, con, sf_dir, int(p), only)
            print(f"  ({time.time() - t0:.0f}s)")
            if fails:
                all_failures[f"{sf_dir}@{p}"] = fails
        con.close()
    if all_failures:
        print("SWEEP FAILED:", all_failures)
        sys.exit(1)
    print("SWEEP ALL OK")


if __name__ == "__main__":
    main()
