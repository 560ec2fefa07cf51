"""Simulate the driver's verify loop locally: smoke entry(spark), then run
every queries() entry at sf0.01 against its oracle_sql() via DuckDB and
compare row-count, column names, and order-insensitive values (floats
rounded to 6dp). Usage: python tools/driver_sim.py [sf_dir] [query ...]
(extra args restrict the run to those query names and skip the entry smoke)."""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entry_mod
from indexlab_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def df_to_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    # repr-keyed sort: total order even with None/mixed-type cells
    return sorted(normed, key=repr), [cols[i] for i in idx]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("driver-sim", shuffle_partitions=8)

    if not only:
        t0 = time.time()
        df = entry_mod.entry(spark)
        n = df.count()
        print(f"entry: {n} rows, schema={df.columns}, {time.time()-t0:.1f}s")
        assert n >= 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        s_vals, s_cols = df_to_rows(scols, [tuple(r) for r in srows])
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows-only check, {len(srows)} rows, {t_spark:.1f}s")
            continue
        t0 = time.time()
        ores = con.execute(oracles[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        o_vals, o_cols = df_to_rows(ocols, orows)
        t_duck = time.time() - t0
        status = []
        if len(srows) != len(orows):
            status.append(f"ROWCOUNT {len(srows)} vs {len(orows)}")
        if s_cols != o_cols:
            status.append(f"SCHEMA {s_cols} vs {o_cols}")
        if not status and s_vals != o_vals:
            ndiff = sum(1 for a, b in zip(s_vals, o_vals) if a != b)
            status.append(f"VALUES ({ndiff}/{len(s_vals)} rows differ)")
            for a, b in list(zip(s_vals, o_vals))[:200]:
                if a != b:
                    status.append(f"  spark={a}\n  duck ={b}")
                    break
        ok = "OK" if not status else "MISMATCH: " + "; ".join(status[:3])
        print(f"{name}: {ok} ({len(srows)} rows, spark {t_spark:.1f}s, duck {t_duck:.1f}s)")
        if status:
            failures.append(name)
    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
