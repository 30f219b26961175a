"""Registry of driver-checked (Spark query, DuckDB oracle SQL) pairs.

Each pair exercises one operator family from SURVEY.md §2 through the
engine's real code path (the operators package), with an independent
ANSI-SQL formulation for DuckDB. Column names and float rounding are
kept identical on both sides (see __spark_entry__.py docstring).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.operators import pm
from anomaly_detection_toolkit_spark.operators.statistical import (
    IQROutlierDetector,
    SeasonalBaselineDetector,
    ZScoreDetector,
)
from anomaly_detection_toolkit_spark.sources.testdata import load_table

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
# value: SQL string, or a zero-arg callable producing one (resolved
# lazily by resolved_oracles() — the iForest oracle re-fits the
# forest on the gate table to emit its tree literals, which must not
# happen at import time)
ORACLES: Dict[str, str | Callable[[], str]] = {}


def register(name: str, oracle: str | Callable[[], str] | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def resolved_oracles() -> Dict[str, str]:
    """ORACLES with lazy entries resolved to SQL strings (cached)."""
    for k, v in list(ORACLES.items()):
        if callable(v):
            ORACLES[k] = v()
    return {k: v for k, v in ORACLES.items() if isinstance(v, str)}


# Pairs retired from the driver's 50-slot gate but kept locally
# verifiable: tools/parity.py merges these in; __spark_entry__ does
# NOT expose them to the driver. name -> (query fn, oracle).
EXTRA_PAIRS: Dict[str, tuple] = {}


def register_extra(name: str, oracle: str | Callable[[], str]):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        EXTRA_PAIRS[name] = (fn, oracle)
        return fn

    return deco


def r4(col):
    """round(x, 4): shared float-noise guard for oracle hashing."""
    return F.round(col, 4)


# ---------------------------------------------------------------------------
# SURVEY §2 ops 6-10: z-score + IQR fence detectors, one row set
# (merged from two round-2 green pairs to free a slot in the driver's
# 50-query gate window; both detectors scan the same table at the
# same grain, so the merge loses no coverage). Round 4 merged the
# seasonal-baseline detector in as well (same table, same per-event
# grain) — the three-way pair registers as detect_stat_events; the
# two originals stay locally hash-verified under register_extra.
# ---------------------------------------------------------------------------


@register_extra(
    "detect_zscore_iqr_events",
    """
    WITH s AS (
      SELECT avg(value) AS mu, stddev_pop(value) AS sigma FROM events
    ), q AS (
      SELECT quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3
      FROM events
    ), f AS (
      SELECT q1, q3,
             CASE WHEN (q3 - q1) = 0 THEN 1.0 ELSE (q3 - q1) END AS iqr
      FROM q
    )
    SELECT e.event_id,
           round(abs((e.value - s.mu) / (CASE WHEN s.sigma = 0 OR s.sigma IS NULL
                                              THEN 1.0 ELSE s.sigma END)), 4) AS z_score,
           CAST(CASE WHEN abs((e.value - s.mu) / (CASE WHEN s.sigma = 0 OR s.sigma IS NULL
                                                       THEN 1.0 ELSE s.sigma END)) > 3.0
                     THEN -1 ELSE 1 END AS INTEGER) AS z_verdict,
           CASE WHEN e.value < (f.q1 - 1.5 * f.iqr) OR e.value > (f.q3 + 1.5 * f.iqr)
                THEN 1.0 ELSE 0.0 END AS iqr_score,
           CAST(CASE WHEN e.value < (f.q1 - 1.5 * f.iqr) OR e.value > (f.q3 + 1.5 * f.iqr)
                     THEN -1 ELSE 1 END AS INTEGER) AS iqr_verdict
    FROM events e, s, f
    """,
)
def detect_zscore_iqr_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "events", sf_dir)
    z = ZScoreDetector(threshold=3.0).fit(df, ["value"])
    iqr = IQROutlierDetector(factor=1.5, exact=True).fit(df, ["value"])
    zs = z.transform(df).select(
        "event_id",
        r4(F.col("score")).alias("z_score"),
        F.col("verdict").alias("z_verdict"),
    )
    qs = iqr.transform(df).select(
        "event_id",
        F.col("score").alias("iqr_score"),
        F.col("verdict").alias("iqr_verdict"),
    )
    return zs.join(qs, "event_id")


# ---------------------------------------------------------------------------
# SURVEY §2 op-11..14: seasonal baseline (broadcast-join on seasonal key)
# ---------------------------------------------------------------------------


@register_extra(
    "detect_seasonal_hour_events",
    """
    WITH s AS (
      SELECT hour(ts) AS seasonal_key,
             avg(value) AS m,
             CASE WHEN coalesce(stddev_samp(value), 0.0) = 0.0
                  THEN 1.0 ELSE stddev_samp(value) END AS sd
      FROM events GROUP BY 1
    )
    SELECT e.event_id,
           round(coalesce(abs((e.value - s.m) / s.sd), 0.0), 4) AS score,
           CAST(CASE WHEN coalesce(abs((e.value - s.m) / s.sd), 0.0) > 3.0
                     THEN -1 ELSE 1 END AS INTEGER) AS verdict
    FROM events e LEFT JOIN s ON hour(e.ts) = s.seasonal_key
    """,
)
def detect_seasonal_hour_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "events", sf_dir)
    det = SeasonalBaselineDetector(season="hour", threshold_sigma=3.0)
    det.fit(df, ["value"], date_col="ts")
    return det.transform(df).select(
        "event_id", r4(F.col("score")).alias("score"), "verdict"
    )


@register(
    "detect_stat_events",
    """
    WITH s AS (
      SELECT avg(value) AS mu, stddev_pop(value) AS sigma FROM events
    ), q AS (
      SELECT quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3
      FROM events
    ), f AS (
      SELECT q1, q3,
             CASE WHEN (q3 - q1) = 0 THEN 1.0 ELSE (q3 - q1) END AS iqr
      FROM q
    ), sea AS (
      SELECT hour(ts) AS seasonal_key,
             avg(value) AS m,
             CASE WHEN coalesce(stddev_samp(value), 0.0) = 0.0
                  THEN 1.0 ELSE stddev_samp(value) END AS sd
      FROM events GROUP BY 1
    )
    SELECT e.event_id,
           round(abs((e.value - s.mu) / (CASE WHEN s.sigma = 0 OR s.sigma IS NULL
                                              THEN 1.0 ELSE s.sigma END)), 4) AS z_score,
           CAST(CASE WHEN abs((e.value - s.mu) / (CASE WHEN s.sigma = 0 OR s.sigma IS NULL
                                                       THEN 1.0 ELSE s.sigma END)) > 3.0
                     THEN -1 ELSE 1 END AS INTEGER) AS z_verdict,
           CASE WHEN e.value < (f.q1 - 1.5 * f.iqr) OR e.value > (f.q3 + 1.5 * f.iqr)
                THEN 1.0 ELSE 0.0 END AS iqr_score,
           CAST(CASE WHEN e.value < (f.q1 - 1.5 * f.iqr) OR e.value > (f.q3 + 1.5 * f.iqr)
                     THEN -1 ELSE 1 END AS INTEGER) AS iqr_verdict,
           round(coalesce(abs((e.value - sea.m) / sea.sd), 0.0), 4) AS seasonal_score,
           CAST(CASE WHEN coalesce(abs((e.value - sea.m) / sea.sd), 0.0) > 3.0
                     THEN -1 ELSE 1 END AS INTEGER) AS seasonal_verdict
    FROM events e
    LEFT JOIN sea ON hour(e.ts) = sea.seasonal_key, s, f
    """,
)
def detect_stat_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three statistical detectors (z-score / IQR fences / seasonal
    baseline) over one scan of the events table at the per-event
    grain — the round-4 driver-gate merge of detect_zscore_iqr_events
    and detect_seasonal_hour_events (both kept under register_extra)."""
    df = load_table(spark, "events", sf_dir)
    z = ZScoreDetector(threshold=3.0).fit(df, ["value"])
    iqr = IQROutlierDetector(factor=1.5, exact=True).fit(df, ["value"])
    sea = SeasonalBaselineDetector(season="hour", threshold_sigma=3.0)
    sea.fit(df, ["value"], date_col="ts")
    # chained transforms: every detector's stats broadcast onto the
    # same scan — no per-event join between detector outputs
    out = (
        z.transform(df)
        .withColumnRenamed("score", "z_score")
        .withColumnRenamed("verdict", "z_verdict")
    )
    out = (
        iqr.transform(out)
        .withColumnRenamed("score", "iqr_score")
        .withColumnRenamed("verdict", "iqr_verdict")
    )
    out = (
        sea.transform(out)
        .withColumnRenamed("score", "seasonal_score")
        .withColumnRenamed("verdict", "seasonal_verdict")
    )
    return out.select(
        "event_id",
        r4(F.col("z_score")).alias("z_score"),
        "z_verdict",
        "iqr_score",
        "iqr_verdict",
        r4(F.col("seasonal_score")).alias("seasonal_score"),
        "seasonal_verdict",
    )


# ---------------------------------------------------------------------------
# Validation-engine core: per-column stats profile (north-star stats check)
# ---------------------------------------------------------------------------


@register(
    "column_stats_events",
    """
    SELECT 'value' AS column_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(value) AS BIGINT) AS n_nulls,
           round(min(value), 4) AS min_v,
           round(max(value), 4) AS max_v,
           round(avg(value), 4) AS mean_v,
           round(stddev_pop(value), 4) AS stddev_v,
           CAST(count(DISTINCT value) AS BIGINT) AS n_distinct
    FROM events
    """,
)
def column_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "events", sf_dir)
    v = F.col("value").cast("double")
    return df.agg(
        F.lit("value").alias("column_name"),
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count(v)).alias("n_nulls"),
        r4(F.min(v)).alias("min_v"),
        r4(F.max(v)).alias("max_v"),
        r4(F.avg(v)).alias("mean_v"),
        r4(F.stddev_pop(v)).alias("stddev_v"),
        F.count_distinct(v).alias("n_distinct"),
    )


# Per-partition quantile constraints (ColumnStatsCheck p<NN>_min/_max
# bounds): EXTRA pair — the driver registry stays at exactly 50.
# Spark `percentile` ⇔ DuckDB `quantile_cont` (same linear
# interpolation; already proven by the pm_rolling_events pair). The
# `approx=True` sketch path is covered by tests, not the oracle.
_QSTATS_SQL = """
    SELECT 'column_stats' AS check, CAST(hour(ts) AS INTEGER) AS part,
           'value.p50' AS metric, round(quantile_cont(value, 0.50), 4) AS value
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'column_stats', CAST(hour(ts) AS INTEGER),
           'value.p90', round(quantile_cont(value, 0.90), 4)
    FROM events GROUP BY 2
"""


@register_extra("column_quantile_stats_events", _QSTATS_SQL)
def column_quantile_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anomaly_detection_toolkit_spark.plans.checks import ColumnStatsCheck

    df = load_table(spark, "events", sf_dir).withColumn(
        "part", F.hour(F.col("ts").cast("timestamp"))
    )
    chk = ColumnStatsCheck({"value": {"p50_min": -1e18, "p90_max": 1e18}})
    out = chk.run(df)
    return out.metrics.filter(
        F.col("metric").isin("value.p50", "value.p90")
    ).select("check", "part", "metric", r4(F.col("value")).alias("value"))


# ---------------------------------------------------------------------------
# SURVEY §2 ops 37/38/45: grouped rolling window statistics.
# Round 4: merged with pm_change_events (ops 39/40/46 — same scan,
# same window partition/order) into pm_rolling_change_events below to
# free a driver-gate slot; the originals stay under register_extra.
# ---------------------------------------------------------------------------


@register_extra(
    "pm_rolling_events",
    """
    SELECT event_id,
           round(avg(value) OVER w, 4) AS rmean,
           round(stddev_samp(value) OVER w, 4) AS rstd,
           round(min(value) OVER w, 4) AS rmin,
           round(max(value) OVER w, 4) AS rmax,
           round(quantile_cont(value, 0.5) OVER w, 4) AS rmedian
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def pm_rolling_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "events", sf_dir)
    out = pm.rolling_stats(
        df,
        ["value"],
        [5],
        partition_by=["event_type"],
        order_by=["ts", "event_id"],
        stats=("mean", "std", "min", "max", "median"),
    )
    return out.select(
        "event_id",
        r4(F.col("value_rolling_mean_5")).alias("rmean"),
        r4(F.col("value_rolling_std_5")).alias("rstd"),
        r4(F.col("value_rolling_min_5")).alias("rmin"),
        r4(F.col("value_rolling_max_5")).alias("rmax"),
        r4(F.col("value_rolling_median_5")).alias("rmedian"),
    )


# ---------------------------------------------------------------------------
# SURVEY §2 ops 39/40/46: diff / pct_change / rate-of-change
# ---------------------------------------------------------------------------


@register_extra(
    "pm_change_events",
    """
    SELECT event_id,
           round(value - lag(value, 1) OVER w, 4) AS diff1,
           round((value - lag(value, 1) OVER w)
                 - (lag(value, 1) OVER w - lag(value, 2) OVER w), 4) AS diff2,
           round((value - lag(value, 1) OVER w) / nullif(lag(value, 1) OVER w, 0), 4) AS pct_change,
           round((value - lag(value, 5) OVER w) / nullif(lag(value, 5) OVER w, 0), 4) AS roc_5
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    """,
)
def pm_change_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "events", sf_dir)
    out = pm.change_features(df, ["value"], ["event_type"], ["ts", "event_id"])
    out = pm.rate_of_change(out, ["value"], [5], ["event_type"], ["ts", "event_id"])
    return out.select(
        "event_id",
        r4(F.col("value_diff")).alias("diff1"),
        r4(F.col("value_diff2")).alias("diff2"),
        r4(F.col("value_pct_change")).alias("pct_change"),
        r4(F.col("value_roc_5")).alias("roc_5"),
    )


@register(
    "pm_rolling_change_events",
    """
    SELECT event_id,
           round(avg(value) OVER w5, 4) AS rmean,
           round(stddev_samp(value) OVER w5, 4) AS rstd,
           round(min(value) OVER w5, 4) AS rmin,
           round(max(value) OVER w5, 4) AS rmax,
           round(quantile_cont(value, 0.5) OVER w5, 4) AS rmedian,
           round(value - lag(value, 1) OVER w, 4) AS diff1,
           round((value - lag(value, 1) OVER w)
                 - (lag(value, 1) OVER w - lag(value, 2) OVER w), 4) AS diff2,
           round((value - lag(value, 1) OVER w) / nullif(lag(value, 1) OVER w, 0), 4)
             AS pct_change,
           round((value - lag(value, 5) OVER w) / nullif(lag(value, 5) OVER w, 0), 4)
             AS roc_5
    FROM events
    WINDOW w5 AS (PARTITION BY event_type ORDER BY ts, event_id
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
           w AS (PARTITION BY event_type ORDER BY ts, event_id)
    """,
)
def pm_rolling_change_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling stats (ops 37/38/45) + diff/pct_change/rate-of-change
    (ops 39/40/46) in one per-event row set — the round-4 driver-gate
    merge of pm_rolling_events and pm_change_events (both kept under
    register_extra). Both feature families share the same window
    partition/order, so Spark computes them over ONE shuffle."""
    df = load_table(spark, "events", sf_dir)
    out = pm.rolling_stats(
        df,
        ["value"],
        [5],
        partition_by=["event_type"],
        order_by=["ts", "event_id"],
        stats=("mean", "std", "min", "max", "median"),
    )
    out = pm.change_features(out, ["value"], ["event_type"], ["ts", "event_id"])
    out = pm.rate_of_change(out, ["value"], [5], ["event_type"], ["ts", "event_id"])
    return out.select(
        "event_id",
        r4(F.col("value_rolling_mean_5")).alias("rmean"),
        r4(F.col("value_rolling_std_5")).alias("rstd"),
        r4(F.col("value_rolling_min_5")).alias("rmin"),
        r4(F.col("value_rolling_max_5")).alias("rmax"),
        r4(F.col("value_rolling_median_5")).alias("rmedian"),
        r4(F.col("value_diff")).alias("diff1"),
        r4(F.col("value_diff2")).alias("diff2"),
        r4(F.col("value_pct_change")).alias("pct_change"),
        r4(F.col("value_roc_5")).alias("roc_5"),
    )


# ---------------------------------------------------------------------------
# SURVEY §2 ops 43/44: RUL + health labels (lineitem as the asset
# panel). Round 4: retired to register_extra — the driver-gated
# pm_prepare_features_lineitem pair subsumes the RUL + health-label
# path (this pair keeps multi_class_label locally hash-verified).
# ---------------------------------------------------------------------------


@register_extra(
    "pm_rul_lineitem",
    """
    WITH r AS (
      SELECT l_orderkey, l_linenumber,
             CAST(greatest(0, max(l_linenumber) OVER (PARTITION BY l_orderkey)
                              - l_linenumber) AS INTEGER) AS rul
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber, rul,
           CASE WHEN rul > 3 THEN 'healthy'
                WHEN rul > 1 AND rul <= 3 THEN 'warning'
                WHEN rul > 0 AND rul <= 1 THEN 'critical'
                WHEN rul = 0 THEN 'failed'
                ELSE 'unknown' END AS health_status,
           CAST(CASE WHEN rul > 3 THEN 0 ELSE 1 END AS INTEGER) AS binary_label,
           CAST(CASE WHEN rul > 3 THEN 0
                     WHEN rul > 1 AND rul <= 3 THEN 1
                     WHEN rul > 0 AND rul <= 1 THEN 2
                     WHEN rul = 0 THEN 3
                     ELSE -1 END AS INTEGER) AS multi_class_label
    FROM r
    """,
)
def pm_rul_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "lineitem", sf_dir)
    out = pm.calculate_rul(df, "l_orderkey", "l_linenumber", out_col="rul")
    out = pm.create_rul_labels(
        out, rul_col="rul", warning_threshold=3, critical_threshold=1
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.col("rul").cast("int").alias("rul"),
        "health_status",
        "binary_label",
        "multi_class_label",
    )


# ---------------------------------------------------------------------------
# SURVEY §2 op-41: FFT spectral constants per series. The rfft itself
# IS oracle-checkable: |X_k|² of a real signal is the N² DFT
# Σx·cos / Σx·sin — quadratic but fine at sf0.01 gate scale (the
# Spark side stays O(n log n) numpy rfft; only the DuckDB oracle pays
# N²). dominant = argmax power (DC skipped), centroid =
# Σf·P/(ΣP+1e-10), rolloff = first freq with cum power ≥ 85%.
# ---------------------------------------------------------------------------

_FFT_SQL = """
    WITH e AS (
      SELECT event_type AS sid, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY epoch(ts), event_id) - 1 AS j
      FROM events WHERE value IS NOT NULL
    ),
    n AS (SELECT sid, count(*) AS n FROM e GROUP BY sid),
    ks AS (SELECT sid, n, unnest(range(0, n // 2 + 1)) AS k FROM n),
    dft AS (
      SELECT ks.sid, ks.k, ks.n,
             sum(e.value * cos(2 * pi() * ks.k * e.j / ks.n)) AS re,
             sum(e.value * sin(2 * pi() * ks.k * e.j / ks.n)) AS im
      FROM ks JOIN e ON e.sid = ks.sid
      GROUP BY ks.sid, ks.k, ks.n
    ),
    p AS (SELECT sid, k, n, re * re + im * im AS power FROM dft),
    dom AS (
      SELECT sid, CAST(k AS DOUBLE) / n AS dominant
      FROM (
        SELECT sid, k, n,
               row_number() OVER (PARTITION BY sid
                                  ORDER BY power DESC, k) AS r
        FROM p WHERE k >= 1
      ) WHERE r = 1
    ),
    cent AS (
      SELECT sid,
             sum((CAST(k AS DOUBLE) / n) * power)
               / (sum(power) + 1e-10) AS centroid
      FROM p GROUP BY sid
    ),
    roll AS (
      SELECT sid, min(CAST(k AS DOUBLE) / n) AS rolloff
      FROM (
        SELECT sid, k, n,
               sum(power) OVER (PARTITION BY sid ORDER BY k) AS cum,
               sum(power) OVER (PARTITION BY sid) AS total
        FROM p
      ) WHERE cum >= total * 0.85
      GROUP BY sid
    )
    SELECT ev.event_id, ev.event_type,
           round(CASE WHEN n.n <= 10 THEN 0.0 ELSE dom.dominant END, 4)
             AS dominant_freq,
           round(CASE WHEN n.n <= 10 THEN 0.0 ELSE cent.centroid END, 4)
             AS spectral_centroid,
           round(CASE WHEN n.n <= 10 THEN 0.0 ELSE roll.rolloff END, 4)
             AS spectral_rolloff
    FROM events ev
    LEFT JOIN n ON n.sid = ev.event_type
    LEFT JOIN dom ON dom.sid = ev.event_type
    LEFT JOIN cent ON cent.sid = ev.event_type
    LEFT JOIN roll ON roll.sid = ev.event_type
"""


@register("pm_fft_events", _FFT_SQL)
def pm_fft_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "events", sf_dir)
    out = pm.fft_features(df, "value", "event_type", ["ts", "event_id"])
    return out.select(
        "event_id",
        "event_type",
        r4(F.col("value_dominant_freq")).alias("dominant_freq"),
        r4(F.col("value_spectral_centroid")).alias("spectral_centroid"),
        r4(F.col("value_spectral_rolloff")).alias("spectral_rolloff"),
    )


# populate the registry with the training-data pipeline pairs
# (import at module bottom so `register`/`r4` exist when they run)
from anomaly_detection_toolkit_spark import entry_corpus  # noqa: E402,F401
from anomaly_detection_toolkit_spark import entry_eval  # noqa: E402,F401
from anomaly_detection_toolkit_spark import entry_pca  # noqa: E402,F401
from anomaly_detection_toolkit_spark import entry_wavelet  # noqa: E402,F401
from anomaly_detection_toolkit_spark import entry_alerts  # noqa: E402,F401
from anomaly_detection_toolkit_spark import entry_ml  # noqa: E402,F401
from anomaly_detection_toolkit_spark import entry_multimodal  # noqa: E402,F401
from anomaly_detection_toolkit_spark import entry_models  # noqa: E402,F401
from anomaly_detection_toolkit_spark import entry_suite  # noqa: E402,F401

# The driver's correctness gate checks the FIRST 50 registered
# queries (round 2 silently dropped the 7 registered last, including
# the flagship verdict-grid oracle). The registry is consolidated to
# exactly 50 pairs AND reordered so the heavyweight / previously
# unchecked queries register first — defense in depth if a future
# round adds pairs without re-counting.
_GATE_CAP = 50
_PRIORITY = [
    # round-5 rotation: newest load-bearing code first — the hot-band
    # capped-LSH pair (promoted; topk_recent_events retired to extra)
    # and the two ANN pairs that now exercise round-5 code (the
    # persisted-index query path; the multiprobe fold)
    "dedup_minhash_capped_documents",
    "ann_ivf_topk_embeddings",
    "ann_topk_embeddings",
    # round-4 rotation: the newest, previously gate-less pairs
    # register first so they ALWAYS land inside the driver's window
    "history_drift_events",
    "drift_rolling_documents",
    "quarantine_clean_documents",
    "streaming_dedup_documents",
    "corpus_pack_documents",
    "corpus_chunk_assignments_documents",
    "corpus_stratified_sample_documents",
    "multimodal_av_pipeline",
    "dedup_incremental_lsh_documents",
    # round-3 heavies (previously unchecked flagships)
    "northstar_suite_verdicts",
    "suite_grid_documents",
    "streaming_drift_events",
    "autoencoder_dense_events",
    "pm_process_pipeline_lineitem",
    "cube_report_events",
    "pm_rul_model_lineitem",
]


def _reorder_registry() -> None:
    ordered = [n for n in _PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in ordered]
    if len(ordered) > _GATE_CAP:  # pragma: no cover - guarded by tests
        raise RuntimeError(
            f"{len(ordered)} queries registered but the driver gate checks "
            f"only the first {_GATE_CAP}: merge or retire pairs"
        )
    reordered = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(reordered)


_reorder_registry()
