"""Alert-system tests replicating the reference scenario
(``/root/reference/tests/test_predictive_maintenance.py:155-168``:
temperatures [75, 85, 95, 105] against warning=80/critical=90/
failure=100 must produce one alert per breaching value with the
highest breached level) plus escalation and top-k."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.operators import alerts

THR = {"temperature": {"warning": 80.0, "critical": 90.0, "failure": 100.0}}


def test_threshold_levels_reference_scenario(spark):
    rows = [("m1", i, float(v)) for i, v in enumerate([75, 85, 95, 105])]
    df = spark.createDataFrame(rows, "asset string, i int, temperature double")
    out = alerts.check_thresholds(df, THR, asset_col="asset", entity_cols=["i"])
    got = {r.i: r for r in out.collect()}
    assert set(got) == {1, 2, 3}  # 75 breaches nothing
    assert got[1].raw_level == "warning" and got[1].threshold == 80.0
    assert got[2].raw_level == "critical" and got[2].threshold == 90.0
    assert got[3].raw_level == "failure" and got[3].threshold == 100.0
    assert got[1].message == "temperature = 85.00 exceeds warning threshold (80.00)"


def test_escalation_bumps_on_min_count(spark):
    rows = [("m1", i, 85.0) for i in range(3)] + [("m2", 9, 85.0)]
    df = spark.createDataFrame(rows, "asset string, i int, temperature double")
    out = alerts.check_thresholds(
        df, THR, asset_col="asset", entity_cols=["i"],
        escalation={"warning": {"min_count": 3}},
    )
    got = {(r.asset_id, r.i): r for r in out.collect()}
    # m1 has 3 warnings for the key → all escalate to critical
    for i in range(3):
        r = got[("m1", i)]
        assert r.raw_level == "warning" and r.level == "critical"
        assert "warning threshold" in r.message  # message keeps raw level
    # m2 has a single warning → no escalation
    assert got[("m2", 9)].level == "warning"


def test_multiple_features_and_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1, 95.0, None), ("a", 2, 50.0, 0.2)],
        "asset string, i int, temperature double, vibration double",
    )
    thr = dict(THR, vibration={"critical": 0.15})
    out = alerts.check_thresholds(df, thr, asset_col="asset", entity_cols=["i"])
    got = {(r.i, r.feature) for r in out.collect()}
    assert got == {(1, "temperature"), (2, "vibration")}  # NULLs skipped


def test_recent_top_k_partitioned(spark):
    rows = [(g, float(t)) for g in ("x", "y") for t in range(10)]
    df = spark.createDataFrame(rows, "g string, t double")
    out = alerts.recent_top_k(df, 3, order_by=["t"], partition_by=["g"])
    per = {g: sorted(r.t for r in out.collect() if r.g == g) for g in ("x", "y")}
    assert per == {"x": [7.0, 8.0, 9.0], "y": [7.0, 8.0, 9.0]}


def test_recent_top_k_global_limit(spark):
    df = spark.createDataFrame([(float(t),) for t in range(100)], "t double")
    out = alerts.recent_top_k(df, 5, order_by=["t"])
    assert sorted(r.t for r in out.collect()) == [95.0, 96.0, 97.0, 98.0, 99.0]
