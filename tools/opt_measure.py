"""Optimization measurement harness (guide §1) — r17 edition.

Times registry queries with the NOOP SINK (guide §1.4 — computes every
column of every row, no optimizer pruning, no driver transfer) and writes
each query's .explain('formatted') to plans/<round>/<name>_<tag>.txt so
plan claims are auditable without running Spark.

r17 upgrade (r16 VERDICT item 8): static formatted explains duplicate
InMemoryRelation subtrees, so a query that got FASTER by pinning can show
MORE static Exchange nodes. Each timed run now also records RUNTIME
evidence from the SQL status store's final (post-AQE) executed plan:
Exchange / ReusedExchange / Python-eval node counts and the job count of
the execution — the numbers a "fewer exchanges" claim is checked against.

Usage:
  python tools/opt_measure.py <tag> [query ...]        # default top set
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 ...          # data dir
  SPARK_GRAFT_PLANS_ROUND=r17 ...                      # plans subdir

Prints one JSON line: {"tag": ..., "queries": {name: {"first": s,
"min2": s, "exchanges": n, "reused_exchanges": n, "python_evals": n,
"jobs": n}}, "total_min2": s}. Timing is cold-first + second-run (the
bench's own rationale: a cold query really pays plan/codegen floors; the
second run shows the steady-state plan). Plans are captured AFTER the
timed runs so explain cost never pollutes the timing.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from indexlab_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_ROUND = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r17")

# The suite's priciest rows at r16 close — the additive tail this round
# targets (driver bench_full.json + VERDICT's untouched-block list).
DEFAULT = [
    "part_kcore", "assoc_brands", "part_assortativity",
    "dedup_clusters", "theta_users", "quantile_map_events",
    "lonely_late_supplier", "sliding_windows", "stateful_sessions",
    "trigram_logprob", "spearman_lineitem", "dedup_survival",
    "minhash_lsh", "conformal_orders", "contingency_events",
    "cross_source_dups", "rake_docs", "bloom_decontaminate",
]

# Runtime node names that mean "a Python boundary ran here"
_PY_NODES = (
    "BatchEvalPython", "ArrowEvalPython", "MapInPandas", "MapInArrow",
    "FlatMapGroupsInPandas", "AggregateInPandas",
)


def _last_execution_evidence(spark) -> dict:
    """Final (post-AQE) plan node counts + job count of the most recent
    SQL execution, from the SQLAppStatusStore (populated by the always-
    registered listener even with the UI disabled). Best-effort: {}
    when the Py4J surface differs."""
    try:
        store = spark._jsparkSession.sharedState().statusStore()
        execs = store.executionsList()
        if execs.isEmpty():
            return {}
        last = execs.apply(execs.size() - 1)
        desc = last.physicalPlanDescription()
        # operator lines look like "+- Exchange hashpartitioning(...)";
        # count node NAMES so "ReusedExchange" is not double-counted by
        # the "Exchange" pattern
        n_ex = len(re.findall(r"(?<![A-Za-z])Exchange ", desc))
        n_reuse = len(re.findall(r"ReusedExchange", desc))
        n_py = sum(desc.count(n) for n in _PY_NODES)
        jobs = last.jobs().size()
        return {
            "exchanges": n_ex,
            "reused_exchanges": n_reuse,
            "python_evals": n_py,
            "jobs": jobs,
        }
    except Exception as e:  # pragma: no cover - Py4J surface drift
        return {"evidence_err": str(e)[:120]}


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    spark = get_spark("opt-measure")
    qs = entry_mod.queries()
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", PLANS_ROUND,
    )
    os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"opt-measure:{name}")
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        first = time.time() - t0
        ev = _last_execution_evidence(spark)
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        second = time.time() - t0
        ev2 = _last_execution_evidence(spark)
        rec = {"first": round(first, 3),
               "min2": round(min(first, second), 3)}
        rec.update(ev)
        # warm-run evidence differs when pins kick in on re-scan
        if ev2 and ev2 != ev:
            rec["warm"] = ev2
        out[name] = rec
        # plan capture (post-timing)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, SF_DIR).explain("formatted")
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(
            f"{name}: first={first:.2f}s min2={rec['min2']:.2f}s "
            f"ex={rec.get('exchanges')} reuse={rec.get('reused_exchanges')} "
            f"py={rec.get('python_evals')} jobs={rec.get('jobs')}",
            file=sys.stderr,
        )
    spark.sparkContext.setJobDescription(None)
    total = round(sum(v["min2"] for v in out.values()), 3)
    print(json.dumps({"tag": tag, "sf_dir": SF_DIR, "queries": out,
                      "total_min2": total}))


if __name__ == "__main__":
    main()
