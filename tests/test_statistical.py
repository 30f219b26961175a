"""Invariant tests mirroring /root/reference/tests/test_statistical.py
(seeded gaussian with injected spikes; length/encoding/detection/score
invariants) re-expressed over Spark DataFrames.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.operators.statistical import (
    IQROutlierDetector,
    SeasonalBaselineDetector,
    ZScoreDetector,
)


@pytest.fixture(scope="module")
def spike_df(spark):
    """F2 fixture: N(0,1) seed 42, rows 100..104 shifted +5
    (reference tests/test_statistical.py:14-17)."""
    rng = np.random.RandomState(42)
    vals = rng.randn(1000)
    vals[100:105] += 5
    pdf = pd.DataFrame({"idx": np.arange(1000), "value": vals})
    return spark.createDataFrame(pdf)


def test_zscore_invariants(spike_df):
    det = ZScoreDetector(threshold=3.0)
    out = det.fit_transform(spike_df, ["value"]).toPandas()
    assert len(out) == 1000  # |output| == |input|
    assert set(out["verdict"].unique()) <= {-1, 1}
    assert (out["verdict"] == -1).sum() > 0  # detects injected spikes
    assert (out["score"] >= 0).all()
    # the injected rows must be among the detected
    flagged = set(out.loc[out["verdict"] == -1, "idx"])
    assert flagged & set(range(100, 105))


def test_zscore_matches_numpy(spike_df):
    """Golden parity with the reference formula (np.std ddof=0)."""
    det = ZScoreDetector().fit(spike_df, ["value"])
    pdf = spike_df.toPandas().sort_values("idx")
    mu, sd = pdf["value"].mean(), pdf["value"].std(ddof=0)
    assert det.mean_["value"] == pytest.approx(mu, rel=1e-9)
    assert det.std_["value"] == pytest.approx(sd, rel=1e-9)
    out = det.transform(spike_df).toPandas().sort_values("idx")
    expected = np.abs((pdf["value"] - mu) / sd)
    np.testing.assert_allclose(out["score"].to_numpy(), expected.to_numpy(), rtol=1e-9)


def test_zscore_zero_std_guard(spark):
    df = spark.createDataFrame(pd.DataFrame({"value": [5.0] * 50}))
    det = ZScoreDetector().fit(df, ["value"])
    assert det.std_["value"] == 1.0  # statistical.py:69-70 guard
    out = det.fit_transform(df, ["value"]).toPandas()
    assert (out["score"] == 0.0).all()
    assert (out["verdict"] == 1).all()


def test_iqr_invariants(spark):
    rng = np.random.RandomState(42)
    vals = rng.randn(1000)
    vals[100:105] += 10  # reference tests/test_statistical.py:52-53
    df = spark.createDataFrame(pd.DataFrame({"idx": np.arange(1000), "value": vals}))
    det = IQROutlierDetector(factor=1.5)
    out = det.fit_transform(df, ["value"]).toPandas()
    assert len(out) == 1000
    assert set(out["score"].unique()) <= {0.0, 1.0}  # scores ∈ {0,1}
    assert set(out["verdict"].unique()) <= {-1, 1}
    flagged = set(out.loc[out["verdict"] == -1, "idx"])
    assert flagged >= set(range(100, 105))
    # golden parity with np.percentile linear interpolation
    q1, q3 = np.percentile(vals, [25, 75])
    assert det.q1_["value"] == pytest.approx(q1, rel=1e-9)
    assert det.q3_["value"] == pytest.approx(q3, rel=1e-9)


def test_iqr_multicolumn(spark):
    rng = np.random.RandomState(7)
    pdf = pd.DataFrame({"a": rng.randn(500), "b": rng.randn(500)})
    pdf.loc[10, "b"] = 50.0
    df = spark.createDataFrame(pdf)
    out = IQROutlierDetector().fit_transform(df, ["a", "b"]).toPandas()
    assert out["score"].iloc[10] if out.index.max() >= 10 else True
    assert (out["score"] == 1.0).sum() >= 1


def test_seasonal_baseline(spark):
    """F4: 365 daily points, weekly sinusoid, rows 100..104 +10
    (reference tests/test_statistical.py:76-89)."""
    rng = np.random.RandomState(42)
    days = pd.date_range("2020-01-01", periods=365, freq="D")
    vals = 10 * np.sin(2 * np.pi * np.arange(365) / 7) + 50 + rng.randn(365) * 2
    vals[100:105] += 10
    pdf = pd.DataFrame({"idx": np.arange(365), "ts": days, "value": vals})
    df = spark.createDataFrame(pdf)
    det = SeasonalBaselineDetector(season="week", threshold_sigma=2.5)
    out = det.fit(df, ["value"], date_col="ts").transform(df).toPandas()
    # reference test asserts only length + encoding (test_statistical.py:88-89)
    assert len(out) == 365
    assert set(out["verdict"].unique()) <= {-1, 1}
    assert (out["score"] >= 0).all()


def test_seasonal_unseen_key_scores_zero(spark):
    train = pd.DataFrame(
        {"ts": pd.date_range("2020-01-01", periods=24, freq="h"), "value": 1.0}
    )
    test = pd.DataFrame(
        {"ts": pd.date_range("2020-06-01", periods=5, freq="D"), "value": 99.0}
    )
    det = SeasonalBaselineDetector(season="month")
    det.fit(spark.createDataFrame(train), ["value"], date_col="ts")
    out = det.transform(spark.createDataFrame(test)).toPandas()
    # month=6 never seen in fit → NULL join → score 0.0, verdict +1
    assert (out["score"] == 0.0).all()
    assert (out["verdict"] == 1).all()


def test_seasonal_join_is_broadcast(spark):
    df = spark.range(100).select(
        F.col("id").alias("idx"),
        F.timestamp_seconds(F.col("id") * 3600).alias("ts"),
        (F.col("id") % 7).cast("double").alias("value"),
    )
    det = SeasonalBaselineDetector(season="hour")
    det.fit(df, ["value"], date_col="ts")
    plan = det.transform(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # fact side must not shuffle


def test_validate_input_rejects(spark):
    df = spark.createDataFrame(pd.DataFrame({"s": ["a", "b"]}))
    with pytest.raises(TypeError):
        ZScoreDetector().fit(df, ["s"])
    with pytest.raises(KeyError):
        ZScoreDetector().fit(df, ["missing"])
    with pytest.raises(ValueError):
        ZScoreDetector().fit(df, [])
