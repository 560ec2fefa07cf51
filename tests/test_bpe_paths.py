"""r16: train_bpe has two execution paths (bounded driver fit over the
collected vocab vs distributed vocab-frame rounds). Same merges either
way — the path switch is an execution detail."""

from indexlab_spark.operators import bpe
from indexlab_spark.operators.bpe import train_bpe


def test_bpe_paths_agree(spark, tables, monkeypatch):
    docs = tables["documents"].limit(120)
    m_driver = train_bpe(docs, n_merges=6)
    monkeypatch.setattr(bpe, "_DRIVER_VOCAB_MAX", 0)
    m_dist = train_bpe(docs, n_merges=6)
    assert m_driver == m_dist
    assert len(m_driver) == 6


def test_bpe_distributed_stop_rule(spark, monkeypatch):
    monkeypatch.setattr(bpe, "_DRIVER_VOCAB_MAX", 0)
    docs = spark.createDataFrame(
        [(0, "aa ab"), (1, "aa ba")], "doc_id long, text string"
    )
    merges = train_bpe(docs, n_merges=50, min_pair_count=2)
    assert merges[0] == ("a", "</w>", 3)
    assert 0 < len(merges) < 50
