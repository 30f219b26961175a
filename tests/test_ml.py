"""Tests for the sklearn-free ML detectors, replicating the
reference's inject-and-detect invariants
(``/root/reference/tests/test_ml_methods.py:11-83``)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.operators.ml import (
    IsolationForestDetector,
    RobustCovarianceDetector,
    _c_factor,
)


@pytest.fixture(scope="module")
def injected_df(spark):
    rng = np.random.default_rng(42)
    x = rng.standard_normal((400, 2))
    x[10:20] += 6.0  # blatant cluster of outliers
    rows = [(i, float(a), float(b)) for i, (a, b) in enumerate(x)]
    return spark.createDataFrame(rows, "idx long, f0 double, f1 double")


def test_c_factor_known_values():
    assert _c_factor(1) == 0.0
    assert _c_factor(2) == pytest.approx(2 * (np.log(1) + np.euler_gamma) - 1.0)
    assert _c_factor(256) > _c_factor(64) > 0


def test_isolation_forest_detects_injected(injected_df):
    det = IsolationForestDetector(n_estimators=50, contamination=0.05).fit(
        injected_df, ["f0", "f1"]
    )
    out = det.transform(injected_df).collect()
    scores = {r.idx: r.score for r in out}
    verdicts = {r.idx: r.verdict for r in out}
    assert all(0.0 < s < 1.0 for s in scores.values())
    assert all(v in (-1, 1) for v in verdicts.values())
    # injected rows must score above the typical inlier
    inlier_med = float(np.median([scores[i] for i in range(100, 200)]))
    assert all(scores[i] > inlier_med for i in range(10, 20))
    flagged = {i for i, v in verdicts.items() if v == -1}
    assert len(set(range(10, 20)) & flagged) >= 8


def test_isolation_forest_deterministic(injected_df):
    d1 = IsolationForestDetector(n_estimators=20, seed=7).fit(injected_df, ["f0", "f1"])
    d2 = IsolationForestDetector(n_estimators=20, seed=7).fit(injected_df, ["f0", "f1"])
    s1 = [r.score for r in d1.transform(injected_df).orderBy("idx").collect()]
    s2 = [r.score for r in d2.transform(injected_df).orderBy("idx").collect()]
    assert s1 == s2


def test_robust_covariance_detects_injected(injected_df):
    det = RobustCovarianceDetector(contamination=0.05).fit(injected_df, ["f0", "f1"])
    out = det.transform(injected_df).collect()
    verdicts = {r.idx: r.verdict for r in out}
    scores = {r.idx: r.score for r in out}
    assert all(s >= 0 for s in scores.values())
    flagged = {i for i, v in verdicts.items() if v == -1}
    assert set(range(10, 20)) <= flagged  # the outlier cluster is obvious


def test_robust_covariance_resists_contamination(spark):
    """The robust location must stay near the inlier center even with
    20% gross outliers (the property plain mean/cov lacks)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((500, 2))
    x[:100] += 50.0
    df = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(x)],
        "idx long, f0 double, f1 double",
    )
    det = RobustCovarianceDetector(contamination=0.2).fit(df, ["f0", "f1"])
    assert np.abs(det.location_).max() < 1.0  # not dragged toward 50


def test_fit_errors(spark):
    df = spark.createDataFrame([(1.0,)], "f0 double")
    with pytest.raises(ValueError):
        IsolationForestDetector().fit(df, ["f0"])
    with pytest.raises(ValueError):
        RobustCovarianceDetector().fit(df, ["f0"])


def test_iforest_id_order_layout_independent(injected_df):
    """sample_order_col priority is derived from the KEY value, so the
    fitted model (and its scores) must be identical under any input
    partitioning — the property the driver-gate oracle relies on to
    replay the fit outside Spark."""
    cols = ["f0", "f1"]
    d1 = IsolationForestDetector(
        n_estimators=10, seed=7, sample_order_col="idx"
    ).fit(injected_df, cols)
    d2 = IsolationForestDetector(
        n_estimators=10, seed=7, sample_order_col="idx"
    ).fit(injected_df.repartition(13, "f1"), cols)
    for t1, t2 in zip(d1.trees_, d2.trees_):
        for a, b in zip(t1, t2):
            assert np.array_equal(a, b)
    assert d1.threshold_ == d2.threshold_
