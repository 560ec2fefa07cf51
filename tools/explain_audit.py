"""Print formatted physical plans for the headline queries (PLANS.md
evidence). Usage: python tools/explain_audit.py [query ...]"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from indexlab_spark.session import get_spark


def main():
    spark = get_spark("explain-audit", shuffle_partitions=8)
    sf = "/root/testdata/sf0.01"
    qs = entry_mod.queries()
    names = sys.argv[1:] or ["knn_ip", "doc_len_stats", "top_revenue",
                             "asof_signup", "bm25_topk", "minhash_lsh",
                             "decontaminate", "temperature_resample",
                             "pack_sequences", "late_orders", "events_gapfill"]
    for name in names:
        print(f"\n========== {name} ==========")
        qs[name](spark, sf).explain("formatted")


if __name__ == "__main__":
    main()
