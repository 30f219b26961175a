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


# One-level haar DENOISE is also SQL: universal threshold
# σ·sqrt(2·ln n) with σ = median(|d|)/0.6745, soft-thresholded
# details, periodized inverse (y[2k], y[2k+1]) = (a±d')/sqrt(2) —
# puts ops 25 (denoiser) behind the hard oracle gate for haar.
_HAAR_DEN_SQL = f"""
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
      SELECT series, n + 1 AS rn, value FROM s WHERE rn = 1 AND n % 2 = 1
    ),
    c AS (
      SELECT series, CAST((rn - 1) // 2 AS INTEGER) AS idx,
             sum(value) * {_HAAR_LO} AS a,
             sum(CASE WHEN (rn - 1) % 2 = 0 THEN value ELSE -value END)
               * {_HAAR_LO} AS d
      FROM padded GROUP BY 1, 2
    ),
    meta AS (SELECT series, max(n) AS n FROM s GROUP BY series),
    thr AS (
      SELECT c.series,
             (median(abs(c.d)) / 0.6745)
               * sqrt(2.0 * ln(greatest(any_value(meta.n), 2))) AS t
      FROM c JOIN meta ON meta.series = c.series
      GROUP BY c.series
    ),
    dd AS (
      SELECT c.series, c.idx, c.a,
             sign(c.d) * greatest(abs(c.d) - thr.t, 0.0) AS d2
      FROM c JOIN thr ON thr.series = c.series
    ),
    rec AS (
      SELECT series, idx * 2 + 1 AS rn, (a + d2) * {_HAAR_LO} AS y FROM dd
      UNION ALL
      SELECT series, idx * 2 + 2 AS rn, (a - d2) * {_HAAR_LO} AS y FROM dd
    )
    SELECT s.series, CAST(s.rn AS DOUBLE) AS t, round(r.y, 4) AS denoised
    FROM s JOIN rec r ON r.series = s.series AND r.rn = s.rn
"""


@register("wavelet_haar_denoise_events", _HAAR_DEN_SQL)
def wavelet_haar_denoise_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = wv.denoise(
        _series(spark, sf_dir), "series", "t", "value", wavelet="haar", level=1
    )
    return out.select("series", "t", r4(F.col("denoised")).alias("denoised"))


# One-level haar DETECT: robust fence med+3·MAD/0.6745 on |d|, flagged
# |d| scattered onto disjoint spans of scale = n // len(d), verdict
# -1 beyond the p95 of positive scores (quantile_cont ⇔ np.percentile
# linear interpolation) — ops 26-27 behind the oracle gate for haar.
_HAAR_DET_SQL = f"""
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
      SELECT series, n + 1 AS rn, value FROM s WHERE rn = 1 AND n % 2 = 1
    ),
    c AS (
      SELECT series, CAST((rn - 1) // 2 AS INTEGER) AS idx,
             abs(sum(CASE WHEN (rn - 1) % 2 = 0 THEN value ELSE -value END)
                 * {_HAAR_LO}) AS da
      FROM padded GROUP BY 1, 2
    ),
    fence AS (
      SELECT series,
             median(da) + 3.0 * (median(abs(da - med)) / 0.6745) AS f,
             any_value(len_d) AS len_d
      FROM (
        SELECT series, da,
               median(da) OVER (PARTITION BY series) AS med,
               count(*) OVER (PARTITION BY series) AS len_d
        FROM c
      ) GROUP BY series
    ),
    sc AS (
      SELECT s.series, s.rn, s.n,
             CASE WHEN c.da > fence.f THEN c.da ELSE 0.0 END AS score
      FROM s
      JOIN fence ON fence.series = s.series
      LEFT JOIN c ON c.series = s.series
                 AND c.idx = CAST((s.rn - 1) // greatest(s.n // fence.len_d, 1)
                                  AS INTEGER)
                 AND (s.rn - 1) < fence.len_d * greatest(s.n // fence.len_d, 1)
    ),
    thr AS (
      SELECT series, coalesce(quantile_cont(score, 0.95)
               FILTER (WHERE score > 0), 0.0) AS t
      FROM sc GROUP BY series
    )
    SELECT sc.series, CAST(sc.rn AS DOUBLE) AS t,
           round(coalesce(sc.score, 0.0), 4) AS score,
           CAST(CASE WHEN coalesce(sc.score, 0.0) > thr.t THEN -1 ELSE 1 END
                AS INTEGER) AS verdict
    FROM sc JOIN thr ON thr.series = sc.series
"""


@register("wavelet_haar_detect_events", _HAAR_DET_SQL)
def wavelet_haar_detect_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = wv.detect(
        _series(spark, sf_dir), "series", "t", "value", wavelet="haar", level=1
    )
    return out.select("series", "t", r4(F.col("score")).alias("score"), "verdict")
