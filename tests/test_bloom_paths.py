"""r16: bloom_decontaminate's bitmap can be built driver-side (bounded
collect) or via treeReduce. The verify join makes the RESULT exact
either way; this pins both paths equal on the same input."""

from pyspark.sql import functions as F

from indexlab_spark.operators import curation
from indexlab_spark.operators.curation import bloom_decontaminate


def _res(df):
    return sorted(
        (r["id"], r["n_overlap"], r["contaminated"]) for r in df.collect()
    )


def test_bloom_build_paths_agree(spark, tables, monkeypatch):
    docs = tables["documents"].limit(200)
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    train = docs.filter(F.col("doc_id") % 17 != 0)
    a = _res(bloom_decontaminate(train, bench, n=5))
    monkeypatch.setattr(curation, "_BLOOM_DRIVER_MAX", 0)
    b = _res(bloom_decontaminate(train, bench, n=5))
    assert a == b
    assert len(a) > 0
