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

from anomaly_detection_toolkit_spark.operators.statistical import (
    IQROutlierDetector,
    SeasonalBaselineDetector,
    ZScoreDetector,
)
from anomaly_detection_toolkit_spark.sources.testdata import load_table

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: Dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def r4(col):
    """round(x, 4): shared float-noise guard for oracle hashing."""
    return F.round(col, 4)


# ---------------------------------------------------------------------------
# SURVEY §2 op-7/8/6: z-score detector (fit agg + scoring projection)
# ---------------------------------------------------------------------------


@register(
    "detect_zscore_events",
    """
    WITH s AS (
      SELECT avg(value) AS mu, stddev_pop(value) AS sigma FROM events
    )
    SELECT e.event_id,
           round(abs((e.value - s.mu) / (CASE WHEN s.sigma = 0 OR s.sigma IS NULL
                                              THEN 1.0 ELSE s.sigma END)), 4) AS score,
           CAST(CASE WHEN abs((e.value - s.mu) / (CASE WHEN s.sigma = 0 OR s.sigma IS NULL
                                                       THEN 1.0 ELSE s.sigma END)) > 3.0
                     THEN -1 ELSE 1 END AS INTEGER) AS verdict
    FROM events e, s
    """,
)
def detect_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "events", sf_dir)
    det = ZScoreDetector(threshold=3.0).fit(df, ["value"])
    return det.transform(df).select("event_id", r4(F.col("score")).alias("score"), "verdict")


# ---------------------------------------------------------------------------
# SURVEY §2 op-9/10: IQR fence detector
# ---------------------------------------------------------------------------


@register(
    "detect_iqr_events",
    """
    WITH q AS (
      SELECT quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3
      FROM events
    ), f AS (
      SELECT q1, q3,
             CASE WHEN (q3 - q1) = 0 THEN 1.0 ELSE (q3 - q1) END AS iqr
      FROM q
    )
    SELECT e.event_id,
           CASE WHEN e.value < (f.q1 - 1.5 * f.iqr) OR e.value > (f.q3 + 1.5 * f.iqr)
                THEN 1.0 ELSE 0.0 END AS score,
           CAST(CASE WHEN e.value < (f.q1 - 1.5 * f.iqr) OR e.value > (f.q3 + 1.5 * f.iqr)
                     THEN -1 ELSE 1 END AS INTEGER) AS verdict
    FROM events e, f
    """,
)
def detect_iqr_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "events", sf_dir)
    det = IQROutlierDetector(factor=1.5, exact=True).fit(df, ["value"])
    return det.transform(df).select("event_id", "score", "verdict")


# ---------------------------------------------------------------------------
# SURVEY §2 op-11..14: seasonal baseline (broadcast-join on seasonal key)
# ---------------------------------------------------------------------------


@register(
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
