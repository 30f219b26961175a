"""Driver-contract queries for the wavelet operators (SURVEY §2 ops
25-28). The DWT is not ANSI-SQL-expressible → rows-only gate; kernel
correctness is covered by ``tests/test_wavelet.py`` (perfect
reconstruction + Spark/numpy parity)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.entry_queries import r4, register
from anomaly_detection_toolkit_spark.operators import wavelet as wv
from anomaly_detection_toolkit_spark.sources.testdata import load_table


def _series(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "events", sf_dir)
    # one series per event_type; the order key is a collision-free
    # row_number over (ts, event_id) — an arithmetic ts*K + id key can
    # collide for events < 1s apart, making the kernel's sort (and the
    # rows-only gate) nondeterministic
    w = Window.partitionBy("event_type").orderBy(
        F.col("ts").cast("timestamp").cast("double"), F.col("event_id")
    )
    return df.select(
        F.col("event_type").alias("series"),
        F.row_number().over(w).cast("double").alias("t"),
        F.col("value"),
    )


@register("wavelet_detect_events")  # rows-only: DWT not in SQL
def wavelet_detect_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = wv.detect(_series(spark, sf_dir), "series", "t", "value")
    return out.select(
        "series", "t", r4(F.col("score")).alias("score"), "verdict"
    )


@register("wavelet_denoise_events")  # rows-only: DWT not in SQL
def wavelet_denoise_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = wv.denoise(_series(spark, sf_dir), "series", "t", "value")
    return out.select("series", "t", r4(F.col("denoised")).alias("denoised"))


# A one-level haar DWT IS SQL: periodized pairwise sums/differences
# scaled by 1/sqrt(2) — this puts the DWT kernel itself (op-28, and
# the decomposition step under ops 25-27) behind the hard oracle gate.
_HAAR_LO = 0.7071067811865476

_HAAR_SQL = f"""
    WITH s AS (
      SELECT event_type AS series, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    padded AS (
      SELECT series, rn, value FROM s
      UNION ALL
      -- periodization: odd-length series wrap their first sample
      SELECT series, n + 1 AS rn, value FROM s WHERE rn = 1 AND n % 2 = 1
    ),
    c AS (
      SELECT series, CAST((rn - 1) // 2 AS INTEGER) AS idx,
             sum(value) * {_HAAR_LO} AS a,
             sum(CASE WHEN (rn - 1) % 2 = 0 THEN value ELSE -value END)
               * {_HAAR_LO} AS d
      FROM padded GROUP BY 1, 2
    )
    SELECT series, 'approx' AS kind, CAST(0 AS INTEGER) AS lvl, idx,
           round(a, 4) AS coeff
    FROM c
    UNION ALL
    SELECT series, 'detail' AS kind, CAST(1 AS INTEGER) AS lvl, idx,
           round(d, 4) AS coeff
    FROM c
"""


@register("wavelet_haar_coeffs_events", _HAAR_SQL)
def wavelet_haar_coeffs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = wv.coefficients(
        _series(spark, sf_dir), "series", "t", "value", wavelet="haar", level=1
    )
    return out.select("series", "kind", "lvl", "idx", r4(F.col("coeff")).alias("coeff"))
