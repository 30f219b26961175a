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
