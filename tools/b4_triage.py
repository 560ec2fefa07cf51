"""r17 VERDICT item 1 — isolate the b4_bm25 regression.

Runs the bench's exact b4 workload (bm25_build + bm25_score(100 queries,
k=50).count(), small docs and the 8x replicated corpus) N times in one
exclusive session, printing per-rep seconds. The pin storage level is
whatever SPARK_GRAFT_PIN_STORAGE says (default MEMORY_AND_DISK — the
r16 serialized choice; MEMORY_AND_DISK_DESER is the pre-r16 level), so
an A/B is two invocations of this script.

Usage: python tools/b4_triage.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from indexlab_spark.operators.bm25 import bm25_build, bm25_score
from indexlab_spark.session import get_spark, load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("b4-triage")
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].persist()
    docs_pdf = docs.select("doc_id", "text").toPandas()
    bm_queries = [
        (i, " ".join(str(docs_pdf["text"].iloc[i % len(docs_pdf)]).split()[:4]))
        for i in range(100)
    ]
    bmq_df = spark.createDataFrame(bm_queries, "query_id long, query string")
    big_docs = docs.crossJoin(
        spark.range(8).select(F.col("id").alias("_rep"))
    ).select((F.col("doc_id") + F.col("_rep") * 1_000_000).alias("doc_id"), "text")

    out = {"storage": os.environ.get("SPARK_GRAFT_PIN_STORAGE",
                                     "MEMORY_AND_DISK"),
           "small": [], "large": []}
    for r in range(reps):
        spark.sparkContext.setJobDescription(f"b4-small rep{r}")
        t0 = time.time()
        ts_, dl_, g_ = bm25_build(docs)
        bm25_score(bmq_df, ts_, dl_, g_, k=50).count()
        out["small"].append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(f"b4-large rep{r}")
        t0 = time.time()
        ts_, dl_, g_ = bm25_build(big_docs)
        bm25_score(bmq_df, ts_, dl_, g_, k=50).count()
        out["large"].append(round(time.time() - t0, 3))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
