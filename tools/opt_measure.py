"""Round-16 optimization measurement harness (guide §1).

Times registry queries with the NOOP SINK (guide §1.4 — computes every
column of every row, no optimizer pruning, no driver transfer) and writes
each query's .explain('formatted') to plans/r16/<name>_<tag>.txt so plan
claims are auditable without running Spark.

Usage:
  python tools/opt_measure.py <tag> [query ...]        # default top set
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 ...          # data dir

Prints one JSON line: {"tag": ..., "queries": {name: {"first": s,
"min2": s}}, "total_min2": s}. Timing is cold-first + second-run (the
bench's own rationale: a cold query really pays plan/codegen floors;
the second run shows the steady-state plan). Plans are captured AFTER
the timed runs so explain cost never pollutes the timing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from indexlab_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The suite's priciest rows at r16 HEAD (bench_r16_exclusive.json),
# every one >= ~2s — the additive tail the round targets.
DEFAULT = [
    "quality_classifier", "dedup_clusters", "lonely_late_supplier",
    "bloom_decontaminate", "bpe_merges", "assoc_brands",
    "part_assortativity", "part_kcore", "theta_users",
    "spearman_lineitem", "rake_docs", "sliding_windows",
    "quantile_map_events", "stateful_sessions", "common_ngrams",
    "trigram_logprob", "nation_value_share", "cross_source_dups",
    "dedup_survival", "minhash_lsh",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    spark = get_spark("opt-measure")
    qs = entry_mod.queries()
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r16",
    )
    os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict[str, float]] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"opt-measure:{name}")
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        first = time.time() - t0
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        second = time.time() - t0
        out[name] = {"first": round(first, 3), "min2": round(min(first, second), 3)}
        # plan capture (post-timing)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, SF_DIR).explain("formatted")
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"{name}: first={first:.2f}s min2={out[name]['min2']:.2f}s", file=sys.stderr)
    spark.sparkContext.setJobDescription(None)
    total = round(sum(v["min2"] for v in out.values()), 3)
    print(json.dumps({"tag": tag, "sf_dir": SF_DIR, "queries": out,
                      "total_min2": total}))


if __name__ == "__main__":
    main()
