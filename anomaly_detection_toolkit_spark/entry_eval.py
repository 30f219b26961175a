"""Driver-contract pairs for ensemble (SURVEY §2 ops 32-36) and
evaluation (ops 57-60) operators over the events table.

Ground truth for the evaluation queries is the deterministic rule
``value > 150`` (~5% positives at sf0.01); predictions come from the
engine's own z-score detector so the whole detector→metrics path is
exercised end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.entry_queries import r4, register, register_extra
from anomaly_detection_toolkit_spark.operators import evaluation as ev
from anomaly_detection_toolkit_spark.operators.ensemble import (
    EnsembleDetector,
    VotingEnsemble,
    combine_scores,
)
from anomaly_detection_toolkit_spark.operators.statistical import (
    IQROutlierDetector,
    ZScoreDetector,
)
from anomaly_detection_toolkit_spark.sources.testdata import load_table

TRUTH = 150.0  # y_true = value > 150
Z_T = 2.0

# shared oracle CTEs: member detector scores (z + IQR indicator)
_MEMBERS_CTE = """
    s AS (SELECT avg(value) AS mu, stddev_pop(value) AS sigma FROM events),
    qq AS (SELECT quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3
           FROM events),
    f AS (SELECT q1, q3, CASE WHEN (q3 - q1) = 0 THEN 1.0 ELSE (q3 - q1) END AS iqr
          FROM qq),
    m AS (
      SELECT e.event_id, e.value,
             abs((e.value - s.mu) / (CASE WHEN s.sigma = 0 OR s.sigma IS NULL
                                          THEN 1.0 ELSE s.sigma END)) AS z,
             CASE WHEN e.value < f.q1 - 1.5 * f.iqr OR e.value > f.q3 + 1.5 * f.iqr
                  THEN 1.0 ELSE 0.0 END AS iq
      FROM events e, s, f
    )
"""


# ---------------------------------------------------------------------------
# op 32-35: voting ensemble + score combinations
# ---------------------------------------------------------------------------


_VOTE_SQL = f"""
    WITH {_MEMBERS_CTE}
    SELECT event_id,
           CAST((CASE WHEN z > 3.0 THEN 1 ELSE 0 END)
                + (CASE WHEN iq >= 1.0 THEN 1 ELSE 0 END) AS INTEGER) AS votes,
           round((z + iq) / 2.0, 4) AS score_mean,
           round((least(z, iq) + greatest(z, iq)) / 2.0, 4) AS score_median,
           round(greatest(z, iq), 4) AS score_max,
           round(least(z, iq), 4) AS score_min,
           CAST(CASE WHEN (CASE WHEN z > 3.0 THEN 1 ELSE 0 END)
                          + (CASE WHEN iq >= 1.0 THEN 1 ELSE 0 END) >= 2
                     THEN -1 ELSE 1 END AS INTEGER) AS verdict
    FROM m
"""


@register_extra("ensemble_vote_events", _VOTE_SQL)
def ensemble_vote_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "events", sf_dir)
    ens = VotingEnsemble(
        [ZScoreDetector(threshold=3.0), IQROutlierDetector(factor=1.5)],
        voting_threshold=2,
    ).fit(df, ["value"])
    out = ens.transform(df)
    from anomaly_detection_toolkit_spark.operators.ensemble import vote_count

    return out.select(
        "event_id",
        vote_count(["verdict_0", "verdict_1"]).alias("votes"),
        r4(F.col("score")).alias("score_mean"),
        r4(combine_scores(["score_0", "score_1"], "median")).alias("score_median"),
        r4(combine_scores(["score_0", "score_1"], "max")).alias("score_max"),
        r4(combine_scores(["score_0", "score_1"], "min")).alias("score_min"),
        "verdict",
    )


# ---------------------------------------------------------------------------
# op 36: score-threshold predict (95th-percentile two-pass)
# ---------------------------------------------------------------------------


_SCORE_THR_SQL = f"""
    WITH {_MEMBERS_CTE},
    thr AS (SELECT quantile_cont((z + iq) / 2.0, 0.95) AS t95 FROM m)
    SELECT m.event_id,
           round((m.z + m.iq) / 2.0, 4) AS score,
           CAST(CASE WHEN (m.z + m.iq) / 2.0 > thr.t95 THEN -1 ELSE 1 END AS INTEGER)
             AS verdict
    FROM m, thr
"""


@register_extra("ensemble_score_threshold_events", _SCORE_THR_SQL)
def ensemble_score_threshold_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "events", sf_dir)
    ens = EnsembleDetector(
        [ZScoreDetector(threshold=3.0), IQROutlierDetector(factor=1.5)],
        combination_method="mean",
    ).fit(df, ["value"])
    return ens.transform(df).select(
        "event_id", r4(F.col("score")).alias("score"), "verdict"
    )


# round-4 driver-gate merge of ensemble_vote_events (ops 32-35) and
# ensemble_score_threshold_events (op 36): one per-event row set with
# the voting columns AND the 95th-percentile score-threshold verdict
# (the combined score equals score_mean, so the thr pair's only new
# signal is its verdict). Both originals stay under register_extra.
_ENSEMBLE_SQL = f"""
    WITH {_MEMBERS_CTE},
    thr AS (SELECT quantile_cont((z + iq) / 2.0, 0.95) AS t95 FROM m)
    SELECT m.event_id,
           CAST((CASE WHEN z > 3.0 THEN 1 ELSE 0 END)
                + (CASE WHEN iq >= 1.0 THEN 1 ELSE 0 END) AS INTEGER) AS votes,
           round((z + iq) / 2.0, 4) AS score_mean,
           round((least(z, iq) + greatest(z, iq)) / 2.0, 4) AS score_median,
           round(greatest(z, iq), 4) AS score_max,
           round(least(z, iq), 4) AS score_min,
           CAST(CASE WHEN (CASE WHEN z > 3.0 THEN 1 ELSE 0 END)
                          + (CASE WHEN iq >= 1.0 THEN 1 ELSE 0 END) >= 2
                     THEN -1 ELSE 1 END AS INTEGER) AS vote_verdict,
           CAST(CASE WHEN (m.z + m.iq) / 2.0 > thr.t95 THEN -1 ELSE 1 END AS INTEGER)
             AS thr_verdict
    FROM m, thr
"""


@register("ensemble_events", _ENSEMBLE_SQL)
def ensemble_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "events", sf_dir)
    ens = VotingEnsemble(
        [ZScoreDetector(threshold=3.0), IQROutlierDetector(factor=1.5)],
        voting_threshold=2,
    ).fit(df, ["value"])
    from anomaly_detection_toolkit_spark.operators.ensemble import vote_count

    # all voting-derived columns are projected FIRST (freeing the
    # member score_i/verdict_i names), then the EnsembleDetector
    # re-scores the SAME frame in place — chained transforms like
    # detect_stat_events, so the two ensembles' outputs never meet in
    # a per-event join (the round-4 merge's whole point)
    voted = ens.transform(df).select(
        "event_id",
        "value",  # the feature column the threshold ensemble scores
        vote_count(["verdict_0", "verdict_1"]).alias("votes"),
        r4(F.col("score")).alias("score_mean"),
        r4(combine_scores(["score_0", "score_1"], "median")).alias("score_median"),
        r4(combine_scores(["score_0", "score_1"], "max")).alias("score_max"),
        r4(combine_scores(["score_0", "score_1"], "min")).alias("score_min"),
        F.col("verdict").alias("vote_verdict"),
    )
    thr = EnsembleDetector(
        [ZScoreDetector(threshold=3.0), IQROutlierDetector(factor=1.5)],
        combination_method="mean",
    ).fit(df, ["value"])
    return thr.transform(voted).select(
        "event_id",
        "votes",
        "score_mean",
        "score_median",
        "score_max",
        "score_min",
        "vote_verdict",
        F.col("verdict").alias("thr_verdict"),
    )


# ---------------------------------------------------------------------------
# op 58/60: confusion counts + classification metrics
# ---------------------------------------------------------------------------

_SCORED_CTE = f"""
    {_MEMBERS_CTE},
    scored AS (
      SELECT event_id, z AS sc,
             CASE WHEN value > {TRUTH} THEN 1 ELSE 0 END AS t,
             CASE WHEN z > {Z_T} THEN 1 ELSE 0 END AS p
      FROM m
    )
"""

_CLS_SQL = f"""
    WITH {_SCORED_CTE},
    c AS (
      SELECT CAST(sum(CASE WHEN p = 1 AND t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN p = 0 AND t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
             CAST(sum(CASE WHEN p = 1 AND t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN p = 0 AND t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
      FROM scored
    )
    SELECT round(CASE WHEN tp + tn + fp + fn > 0
                      THEN (tp + tn) / CAST(tp + tn + fp + fn AS DOUBLE)
                      ELSE 0.0 END, 4) AS accuracy,
           round(CASE WHEN tp + fp > 0 THEN tp / CAST(tp + fp AS DOUBLE)
                      ELSE 0.0 END, 4) AS precision,
           round(CASE WHEN tp + fn > 0 THEN tp / CAST(tp + fn AS DOUBLE)
                      ELSE 0.0 END, 4) AS recall,
           round(CASE WHEN tp > 0
                      THEN 2.0 * (tp / CAST(tp + fp AS DOUBLE))
                           * (tp / CAST(tp + fn AS DOUBLE))
                           / ((tp / CAST(tp + fp AS DOUBLE))
                              + (tp / CAST(tp + fn AS DOUBLE)))
                      ELSE 0.0 END, 4) AS f1,
           tp AS true_positives, tn AS true_negatives,
           fp AS false_positives, fn AS false_negatives
    FROM c
"""


def _scored_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "events", sf_dir)
    det = ZScoreDetector(threshold=Z_T).fit(df, ["value"])
    return det.transform(df).withColumn(
        "y_true", (F.col("value") > TRUTH).cast("int")
    )


@register_extra("eval_classification_events", _CLS_SQL)
def eval_classification_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _scored_events(spark, sf_dir)
    m = ev.classification_metrics(scored, "verdict", "y_true")
    return m.select(
        r4(F.col("accuracy")).alias("accuracy"),
        r4(F.col("precision")).alias("precision"),
        r4(F.col("recall")).alias("recall"),
        r4(F.col("f1")).alias("f1"),
        "true_positives",
        "true_negatives",
        "false_positives",
        "false_negatives",
    )


# ---------------------------------------------------------------------------
# op 58: rank-based ROC-AUC (Mann-Whitney with average ranks)
# ---------------------------------------------------------------------------

_AUC_SQL = f"""
    WITH {_SCORED_CTE},
    r AS (
      SELECT t,
             (rank() OVER (ORDER BY sc ASC)
              + (count(*) OVER () + 1 - rank() OVER (ORDER BY sc DESC))) / 2.0 AS ar
      FROM scored
    ),
    a AS (
      SELECT sum(CASE WHEN t = 1 THEN ar END) AS rank_sum,
             CAST(sum(t) AS BIGINT) AS n_pos,
             CAST(sum(1 - t) AS BIGINT) AS n_neg
      FROM r
    )
    SELECT round(CASE WHEN n_pos > 0 AND n_neg > 0
                      THEN (rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
                      ELSE 0.0 END, 4) AS roc_auc
    FROM a
"""


@register_extra("eval_roc_auc_events", _AUC_SQL)
def eval_roc_auc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _scored_events(spark, sf_dir)
    return ev.roc_auc(scored, "score", "y_true").select(
        r4(F.col("roc_auc")).alias("roc_auc")
    )


# merged driver-gate pair (round 3): the reference's evaluate_detector
# returns P/R/F1 + confusion counts + ROC-AUC together
# (evaluation.py) — one 1-row result set, freeing a slot in the
# driver's 50-query window for drift_pca_documents; the split pairs
# stay locally hash-verified above via register_extra.
_METRICS_SQL = f"""
    SELECT c.*, a.roc_auc FROM ({_CLS_SQL}) c CROSS JOIN ({_AUC_SQL}) a
"""


@register("eval_metrics_events", _METRICS_SQL)
def eval_metrics_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _scored_events(spark, sf_dir)
    m = ev.classification_metrics(scored, "verdict", "y_true").select(
        r4(F.col("accuracy")).alias("accuracy"),
        r4(F.col("precision")).alias("precision"),
        r4(F.col("recall")).alias("recall"),
        r4(F.col("f1")).alias("f1"),
        "true_positives",
        "true_negatives",
        "false_positives",
        "false_negatives",
    )
    auc = ev.roc_auc(scored, "score", "y_true").select(
        r4(F.col("roc_auc")).alias("roc_auc")
    )
    return m.crossJoin(auc)  # 1-row × 1-row metric join


# ---------------------------------------------------------------------------
# op 57: lead time (windowed as-of)
# ---------------------------------------------------------------------------

_LEAD_SQL = f"""
    WITH {_SCORED_CTE},
    b AS (
      SELECT epoch(e.ts) AS tsd, e.ts, e.event_id, s.t, s.p
      FROM events e JOIN scored s ON e.event_id = s.event_id
    ),
    w AS (
      SELECT tsd, t, p,
             lag(t) OVER (ORDER BY ts, event_id) AS prev_t,
             max(CASE WHEN p = 1 THEN tsd END)
               OVER (ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_det
      FROM b
    ),
    l AS (
      SELECT tsd - last_det AS lead
      FROM w
      WHERE t = 1 AND prev_t = 0 AND last_det IS NOT NULL AND tsd - last_det <> 0
    )
    SELECT round(coalesce(avg(CASE WHEN lead > 0 THEN lead END), 0.0), 4)
             AS mean_lead_time,
           round(coalesce(quantile_cont(CASE WHEN lead > 0 THEN lead END, 0.5), 0.0), 4)
             AS median_lead_time,
           round(coalesce(min(CASE WHEN lead > 0 THEN lead END), 0.0), 4)
             AS min_lead_time,
           round(coalesce(max(CASE WHEN lead > 0 THEN lead END), 0.0), 4)
             AS max_lead_time,
           CAST(coalesce(sum(CASE WHEN lead > 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS early_detections,
           CAST(coalesce(sum(CASE WHEN lead < 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS late_detections
    FROM l
"""


@register("eval_lead_time_events", _LEAD_SQL)
def eval_lead_time_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _scored_events(spark, sf_dir)
    out = ev.lead_time_metrics(
        scored, "verdict", "y_true", ts_col="ts", order_by=["ts", "event_id"]
    )
    return out.select(
        r4(F.col("mean_lead_time")).alias("mean_lead_time"),
        r4(F.col("median_lead_time")).alias("median_lead_time"),
        r4(F.col("min_lead_time")).alias("min_lead_time"),
        r4(F.col("max_lead_time")).alias("max_lead_time"),
        "early_detections",
        "late_detections",
    )


# ---------------------------------------------------------------------------
# op 59: compare detectors (union of metric rows)
# ---------------------------------------------------------------------------

_CMP_SQL = f"""
    WITH {_SCORED_CTE},
    zc AS (
      SELECT CAST(sum(CASE WHEN p = 1 AND t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN p = 0 AND t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
             CAST(sum(CASE WHEN p = 1 AND t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN p = 0 AND t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
      FROM scored
    ),
    iscored AS (
      SELECT CASE WHEN value > {TRUTH} THEN 1 ELSE 0 END AS t,
             CASE WHEN iq >= 1.0 THEN 1 ELSE 0 END AS p
      FROM m
    ),
    ic AS (
      SELECT CAST(sum(CASE WHEN p = 1 AND t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN p = 0 AND t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
             CAST(sum(CASE WHEN p = 1 AND t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN p = 0 AND t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
      FROM iscored
    )
    SELECT 'zscore' AS detector,
           round((tp + tn) / CAST(tp + tn + fp + fn AS DOUBLE), 4) AS accuracy,
           round(CASE WHEN tp + fp > 0 THEN tp / CAST(tp + fp AS DOUBLE) ELSE 0.0 END, 4)
             AS precision,
           round(CASE WHEN tp + fn > 0 THEN tp / CAST(tp + fn AS DOUBLE) ELSE 0.0 END, 4)
             AS recall
    FROM zc
    UNION ALL
    SELECT 'iqr' AS detector,
           round((tp + tn) / CAST(tp + tn + fp + fn AS DOUBLE), 4) AS accuracy,
           round(CASE WHEN tp + fp > 0 THEN tp / CAST(tp + fp AS DOUBLE) ELSE 0.0 END, 4)
             AS precision,
           round(CASE WHEN tp + fn > 0 THEN tp / CAST(tp + fn AS DOUBLE) ELSE 0.0 END, 4)
             AS recall
    FROM ic
"""


@register("eval_compare_detectors_events", _CMP_SQL)
def eval_compare_detectors_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "events", sf_dir).withColumn(
        "y_true", (F.col("value") > TRUTH).cast("int")
    )
    cmp_df = ev.compare_detectors(
        df,
        {"zscore": ZScoreDetector(threshold=Z_T), "iqr": IQROutlierDetector(factor=1.5)},
        ["value"],
        "y_true",
    )
    return cmp_df.select(
        "detector",
        r4(F.col("accuracy")).alias("accuracy"),
        r4(F.col("precision")).alias("precision"),
        r4(F.col("recall")).alias("recall"),
    )
