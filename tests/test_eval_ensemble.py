"""Tests for ensemble + evaluation operators, replicating the
reference's test scenarios (``/root/reference/tests/
test_evaluation.py``) with golden values computed by hand from the
reference algorithm."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.operators import evaluation as ev
from anomaly_detection_toolkit_spark.operators.ensemble import (
    EnsembleDetector,
    VotingEnsemble,
    combine_scores,
    vote_count,
    vote_verdict,
)
from anomaly_detection_toolkit_spark.operators.statistical import (
    IQROutlierDetector,
    ZScoreDetector,
)


@pytest.fixture(scope="module")
def injected_df(spark):
    """Seeded randn(200) with [10:15] += 5 — the reference's
    inject-and-detect fixture shape (test_statistical.py:15-17)."""
    rng = np.random.default_rng(42)
    x = rng.standard_normal(200)
    x[10:15] += 5
    rows = [(i, float(v), int(1 if 10 <= i < 15 else 0)) for i, v in enumerate(x)]
    return spark.createDataFrame(rows, "idx long, value double, y_true int")


# ---------------------------------------------------------------------------
# Ensembles
# ---------------------------------------------------------------------------


def test_voting_ensemble(injected_df):
    ens = VotingEnsemble(
        [ZScoreDetector(threshold=2.5), IQROutlierDetector(factor=1.5)],
        voting_threshold=2,
    ).fit(injected_df, ["value"])
    out = ens.transform(injected_df)
    rows = out.orderBy("idx").collect()
    assert all(r.verdict in (-1, 1) for r in rows)
    flagged = [r.idx for r in rows if r.verdict == -1]
    assert set(range(10, 15)) <= set(flagged)  # injected spikes caught by both
    # ensemble score is the member mean
    r0 = rows[0]
    assert r0.score == pytest.approx((r0.score_0 + r0.score_1) / 2)
    # votes consistent with member verdicts
    vc = out.select(vote_count(["verdict_0", "verdict_1"]).alias("v")).collect()
    assert all(0 <= r.v <= 2 for r in vc)


def test_combine_scores_median_matches_numpy(spark):
    rows = [(1.0, 5.0, 3.0, 2.0), (0.0, 0.0, 1.0, 1.0)]
    df = spark.createDataFrame(rows, "a double, b double, c double, d double")
    out = df.select(
        combine_scores(["a", "b", "c"], "median").alias("m3"),
        combine_scores(["a", "b", "c", "d"], "median").alias("m4"),
        combine_scores(["a", "b", "c"], "max").alias("mx"),
        combine_scores(["a", "b", "c"], "min").alias("mn"),
    ).collect()
    for r, vals in zip(out, rows):
        assert r.m3 == pytest.approx(float(np.median(vals[:3])))
        assert r.m4 == pytest.approx(float(np.median(vals)))
        assert r.mx == max(vals[:3]) and r.mn == min(vals[:3])


def test_ensemble_percentile_predict(injected_df):
    ens = EnsembleDetector(
        [ZScoreDetector(threshold=2.5), IQROutlierDetector(factor=1.5)],
        combination_method="mean",
    ).fit(injected_df, ["value"])
    out = ens.transform(injected_df)
    n_anom = out.filter(F.col("verdict") == -1).count()
    # strictly-greater-than-p95 threshold flags at most 5% of rows
    assert 0 < n_anom <= 10
    with pytest.raises(ValueError):
        EnsembleDetector([ZScoreDetector()], combination_method="nope").fit(
            injected_df, ["value"]
        ).score_expr()


def test_vote_verdict_threshold(spark):
    df = spark.createDataFrame([(-1, -1, 1), (-1, 1, 1), (1, 1, 1)], "a int, b int, c int")
    out = df.select(vote_verdict(["a", "b", "c"], 2).alias("v")).collect()
    assert [r.v for r in out] == [-1, 1, 1]


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------


def test_confusion_counts_golden(spark):
    # reference fixture (test_evaluation.py:80-91)
    preds = [1, 1, -1, -1, 1, -1]
    y = [1, 0, 1, 0, 0, 1]
    df = spark.createDataFrame(list(zip(preds, y)), "verdict int, y_true int")
    r = ev.confusion_counts(df).first()
    # pred_binary = [0,0,1,1,0,1]; tp=2 (idx2,5), tn=2 (idx1,4), fp=1 (idx3), fn=1 (idx0)
    assert (r.true_positives, r.true_negatives, r.false_positives, r.false_negatives) == (
        2,
        2,
        1,
        1,
    )


def test_classification_metrics_golden(spark):
    preds = [1, 1, -1, -1, 1, -1]
    y = [1, 0, 1, 0, 0, 1]
    df = spark.createDataFrame(list(zip(preds, y)), "verdict int, y_true int")
    r = ev.classification_metrics(df).first()
    assert r.accuracy == pytest.approx(4 / 6)
    assert r.precision == pytest.approx(2 / 3)
    assert r.recall == pytest.approx(2 / 3)
    assert r.f1 == pytest.approx(2 / 3)


def test_classification_metrics_zero_division(spark):
    df = spark.createDataFrame([(1, 0), (1, 0)], "verdict int, y_true int")
    r = ev.classification_metrics(df).first()
    assert (r.precision, r.recall, r.f1) == (0.0, 0.0, 0.0)
    assert r.accuracy == 1.0


def test_roc_auc_perfect_and_degenerate(spark):
    df = spark.createDataFrame(
        [(0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1)], "score double, y_true int"
    )
    assert ev.roc_auc(df).first().roc_auc == pytest.approx(1.0)
    one_class = spark.createDataFrame([(0.5, 0), (0.7, 0)], "score double, y_true int")
    assert ev.roc_auc(one_class).first().roc_auc == 0.0


def test_roc_auc_with_ties_matches_mannwhitney(spark):
    scores = [0.5, 0.5, 0.5, 0.1, 0.9, 0.9]
    y = [1, 0, 1, 0, 1, 0]
    df = spark.createDataFrame(list(zip(scores, y)), "score double, y_true int")
    got = ev.roc_auc(df).first().roc_auc
    # manual Mann-Whitney with average ranks:
    # sorted scores: 0.1(r1) 0.5,0.5,0.5(avg r3) 0.9,0.9(avg r5.5)
    # positives ranks: 3 + 3 + 5.5 = 11.5; AUC = (11.5 - 6)/(3*3)
    assert got == pytest.approx((11.5 - 6) / 9)


def test_lead_time_reference_scenario(spark):
    """Detections at {5,10,15}, events at {8,12,18}
    (test_evaluation.py:54-63): leads = [3,2,3], all early."""
    rows = []
    for i in range(20):
        pred = -1 if i in (5, 10, 15) else 1
        truth = 1 if i in (8, 12, 18) else 0
        rows.append((i, float(i), pred, truth))
    df = spark.createDataFrame(rows, "idx long, ts double, verdict int, y_true int")
    r = ev.lead_time_metrics(df, ts_col="ts", order_by=["ts"]).first()
    assert r.mean_lead_time == pytest.approx(8 / 3)
    assert r.median_lead_time == pytest.approx(3.0)
    assert r.min_lead_time == 2.0 and r.max_lead_time == 3.0
    assert r.early_detections == 3 and r.late_detections == 0


def test_lead_time_no_events(spark):
    rows = [(i, float(i), 1, 0) for i in range(50)]
    df = spark.createDataFrame(rows, "idx long, ts double, verdict int, y_true int")
    r = ev.lead_time_metrics(df, ts_col="ts", order_by=["ts"]).first()
    assert r.mean_lead_time == 0.0 and r.early_detections == 0


def test_lead_time_event_at_start_not_counted(spark):
    # series starting at 1 is not a 0→1 rise (np.diff semantics)
    rows = [(0, 0.0, -1, 1), (1, 1.0, 1, 0), (2, 2.0, 1, 1)]
    df = spark.createDataFrame(rows, "idx long, ts double, verdict int, y_true int")
    r = ev.lead_time_metrics(df, ts_col="ts", order_by=["ts"]).first()
    # only the event at ts=2 counts; last detection at ts=0 → lead 2
    assert r.early_detections == 1 and r.mean_lead_time == pytest.approx(2.0)


def test_compare_detectors_rows(injected_df):
    out = ev.compare_detectors(
        injected_df,
        {"zscore": ZScoreDetector(threshold=2.0), "iqr": IQROutlierDetector()},
        ["value"],
    )
    rows = {r.detector: r for r in out.collect()}
    assert set(rows) == {"zscore", "iqr"}
    for r in rows.values():
        for m in ("accuracy", "precision", "recall", "f1", "roc_auc"):
            assert 0.0 <= getattr(r, m) <= 1.0
    # injected spikes are blatant: z-score detector should have high recall
    assert rows["zscore"].recall == 1.0
