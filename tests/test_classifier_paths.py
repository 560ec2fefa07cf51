"""r16: train_quality_classifier has two execution paths (bounded
driver fit vs distributed per-epoch moment passes). They must produce
the same model — the path choice is an execution detail, never a
semantic one."""

import numpy as np
import pytest

from indexlab_spark.operators import curation
from indexlab_spark.operators.curation import train_quality_classifier


def _toy_df(spark, n=60, dim=5, seed=7):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, dim))
    y = (x[:, 0] + 0.5 * x[:, 1] > 0).astype(float)
    rows = [([float(v) for v in x[i]], float(y[i])) for i in range(n)]
    return spark.createDataFrame(rows, "embedding array<double>, label double")


@pytest.mark.parametrize("quantize_dp", [None, 9])
def test_driver_and_distributed_paths_agree(spark, monkeypatch, quantize_dp):
    df = _toy_df(spark)
    m_driver = train_quality_classifier(df, "label", iters=8,
                                        quantize_dp=quantize_dp)
    # force the distributed epoch loop (cap of 0 elements)
    monkeypatch.setattr(curation, "_DRIVER_FIT_MAX_ELEMS", 0)
    m_dist = train_quality_classifier(df, "label", iters=8,
                                      quantize_dp=quantize_dp)
    if quantize_dp is not None:
        # per-epoch re-quantization re-syncs the two paths exactly
        assert np.array_equal(m_driver.weights, m_dist.weights)
        assert m_driver.bias == m_dist.bias
    else:
        np.testing.assert_allclose(m_driver.weights, m_dist.weights,
                                   rtol=0, atol=1e-12)
        np.testing.assert_allclose(m_driver.bias, m_dist.bias,
                                   rtol=0, atol=1e-12)
    assert m_driver.n_rows == m_dist.n_rows
    np.testing.assert_allclose(m_driver.final_loss, m_dist.final_loss,
                               rtol=0, atol=1e-9)


@pytest.mark.parametrize("quantize_dp", [None, 9])
def test_agg_fanin_path_agrees(spark, monkeypatch, quantize_dp):
    """r17 (ADVICE): the >_PARTIAL_COLLECT_MAX fan-in fallback (the
    100 TB path — elementwise agg instead of per-partition collect)
    was exercised by no test. Force it with a cap of 0 partitions and
    pin it equal to the bounded driver fit."""
    df = _toy_df(spark)
    m_driver = train_quality_classifier(df, "label", iters=8,
                                        quantize_dp=quantize_dp)
    monkeypatch.setattr(curation, "_DRIVER_FIT_MAX_ELEMS", 0)
    monkeypatch.setattr(curation, "_PARTIAL_COLLECT_MAX", 0)
    m_agg = train_quality_classifier(df, "label", iters=8,
                                     quantize_dp=quantize_dp)
    if quantize_dp is not None:
        assert np.array_equal(m_driver.weights, m_agg.weights)
        assert m_driver.bias == m_agg.bias
    else:
        np.testing.assert_allclose(m_driver.weights, m_agg.weights,
                                   rtol=0, atol=1e-12)
        np.testing.assert_allclose(m_driver.bias, m_agg.bias,
                                   rtol=0, atol=1e-12)
    assert m_driver.n_rows == m_agg.n_rows


def test_distributed_path_empty_input_raises(spark, monkeypatch):
    monkeypatch.setattr(curation, "_DRIVER_FIT_MAX_ELEMS", 0)
    empty = _toy_df(spark).filter("label > 99")
    with pytest.raises(ValueError):
        train_quality_classifier(empty, "label", iters=1)
