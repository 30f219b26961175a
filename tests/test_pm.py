"""PM feature-extraction parity vs pandas (the reference's engine) and
golden values from reference tests (FIXTURES F5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from anomaly_detection_toolkit_spark.operators import pm


@pytest.fixture(scope="module")
def panel(spark):
    """F5: assets × cycles with trending sensors."""
    rng = np.random.RandomState(42)
    rows = []
    for a in range(5):
        n = 40 + a * 10
        for c in range(1, n + 1):
            rows.append(
                {
                    "asset_id": f"A{a}",
                    "cycle": c,
                    "sensor1": 50 + 0.1 * c + rng.randn(),
                    "sensor2": 20 - 0.05 * c + rng.randn() * 0.5,
                }
            )
    pdf = pd.DataFrame(rows)
    return spark.createDataFrame(pdf), pdf


def test_rolling_stats_matches_pandas(panel):
    df, pdf = panel
    out = (
        pm.rolling_stats(
            df,
            ["sensor1"],
            [3],
            partition_by=["asset_id"],
            order_by=["cycle"],
            stats=("mean", "std", "min", "max", "median"),
            quantiles=True,
        )
        .toPandas()
        .sort_values(["asset_id", "cycle"])
        .reset_index(drop=True)
    )
    g = pdf.sort_values(["asset_id", "cycle"]).groupby("asset_id")["sensor1"]
    exp = {
        "sensor1_rolling_mean_3": g.transform(lambda x: x.rolling(3, min_periods=1).mean()),
        "sensor1_rolling_std_3": g.transform(lambda x: x.rolling(3, min_periods=1).std()),
        "sensor1_rolling_median_3": g.transform(
            lambda x: x.rolling(3, min_periods=1).median()
        ),
        "sensor1_rolling_q25_3": g.transform(
            lambda x: x.rolling(3, min_periods=1).quantile(0.25)
        ),
        "sensor1_rolling_iqr_3": g.transform(
            lambda x: x.rolling(3, min_periods=1).quantile(0.75)
            - x.rolling(3, min_periods=1).quantile(0.25)
        ),
    }
    for name, series in exp.items():
        np.testing.assert_allclose(
            out[name].to_numpy(),
            series.reset_index(drop=True).to_numpy(),
            rtol=1e-9,
            equal_nan=True,
            err_msg=name,
        )


def test_change_features_matches_pandas(panel):
    df, pdf = panel
    out = (
        pm.change_features(df, ["sensor2"], ["asset_id"], ["cycle"])
        .toPandas()
        .sort_values(["asset_id", "cycle"])
        .reset_index(drop=True)
    )
    g = pdf.sort_values(["asset_id", "cycle"]).groupby("asset_id")["sensor2"]
    diff = g.transform(lambda x: x.diff())
    diff2 = g.transform(lambda x: x.diff().diff())
    pct = g.transform(lambda x: x.pct_change())
    np.testing.assert_allclose(
        out["sensor2_diff"].to_numpy(), diff.to_numpy(), rtol=1e-9, equal_nan=True
    )
    np.testing.assert_allclose(
        out["sensor2_diff2"].to_numpy(), diff2.to_numpy(), rtol=1e-9, equal_nan=True
    )
    np.testing.assert_allclose(
        out["sensor2_pct_change"].to_numpy(), pct.to_numpy(), rtol=1e-9, equal_nan=True
    )


def test_rul_golden(spark):
    """Reference golden: assets A,B cycles 1..3 → RUL [2,1,0,2,1,0]
    (tests/test_predictive_maintenance.py:275-289)."""
    pdf = pd.DataFrame(
        {"asset_id": ["A", "A", "A", "B", "B", "B"], "cycle": [1, 2, 3, 1, 2, 3]}
    )
    out = (
        pm.calculate_rul(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values(["asset_id", "cycle"])
    )
    assert out["RUL"].tolist() == [2, 1, 0, 2, 1, 0]


def test_rul_labels_golden(spark):
    """Reference golden: RUL {50,25,10,0} → {healthy,warning,critical,
    failed} (tests/test_predictive_maintenance.py:291-304)."""
    pdf = pd.DataFrame({"RUL": [50, 25, 10, 0]})
    out = pm.create_rul_labels(spark.createDataFrame(pdf)).toPandas()
    assert out["health_status"].tolist() == ["healthy", "warning", "critical", "failed"]
    assert out["binary_label"].tolist() == [0, 1, 1, 1]
    assert out["multi_class_label"].tolist() == [0, 1, 2, 3]


def test_degradation_rates(panel):
    df, pdf = panel
    out = (
        pm.add_degradation_rates(df, ["sensor1"], periods=[1, 3])
        .toPandas()
        .sort_values(["asset_id", "cycle"])
        .reset_index(drop=True)
    )
    g = pdf.sort_values(["asset_id", "cycle"]).groupby("asset_id")["sensor1"]
    exp3 = g.transform(lambda x: x.pct_change(periods=3))
    np.testing.assert_allclose(
        out["sensor1_degradation_rate_3"].to_numpy(),
        exp3.to_numpy(),
        rtol=1e-9,
        equal_nan=True,
    )


def test_backfill_then_zero(spark):
    pdf = pd.DataFrame(
        {
            "k": ["a"] * 5,
            "t": range(5),
            "x": [None, 1.0, None, 3.0, None],
        }
    )
    out = (
        pm.backfill_then_zero(spark.createDataFrame(pdf), ["x"], ["k"], ["t"])
        .toPandas()
        .sort_values("t")
    )
    # bfill: [1,1,3,3,NaN] then fillna(0) → [1,1,3,3,0]
    assert out["x"].tolist() == [1.0, 1.0, 3.0, 3.0, 0.0]


def test_fft_features_matches_numpy(spark):
    rng = np.random.RandomState(0)
    n = 200
    vals = np.sin(2 * np.pi * 10 * np.arange(n) / n) + 0.1 * rng.randn(n)
    pdf = pd.DataFrame({"series": "s1", "t": np.arange(n), "value": vals})
    df = spark.createDataFrame(pdf)
    out = pm.fft_features(df, "value", "series", ["t"]).toPandas()
    power = np.abs(np.fft.rfft(vals)) ** 2
    freqs = np.fft.rfftfreq(n)
    dom = freqs[np.argmax(power[1:]) + 1]
    assert out["value_dominant_freq"].iloc[0] == pytest.approx(dom)
    assert out["value_dominant_freq"].nunique() == 1  # constant per series
    centroid = np.sum(freqs * power) / (np.sum(power) + 1e-10)
    assert out["value_spectral_centroid"].iloc[0] == pytest.approx(centroid)
