"""Driver-contract queries for the ML detectors (SURVEY §2 ops
22-24). Tree ensembles / iterative MCD are not SQL-expressible →
rows-only gate; behavioral invariants live in ``tests/test_ml.py``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.entry_queries import r4, register
from anomaly_detection_toolkit_spark.operators.ml import (
    IsolationForestDetector,
    RobustCovarianceDetector,
)
from anomaly_detection_toolkit_spark.sources.testdata import load_table

_DIMS = 4


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "embeddings", sf_dir)
    return df.select(
        "vec_id",
        *[F.col("embedding")[i].cast("double").alias(f"f{i}") for i in range(_DIMS)],
    )


@register("iforest_embeddings")  # rows-only: tree ensemble not in SQL
def iforest_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = _features(spark, sf_dir)
    det = IsolationForestDetector(n_estimators=50, contamination=0.05, seed=42).fit(
        feats, [f"f{i}" for i in range(_DIMS)]
    )
    return det.transform(feats).select(
        "vec_id", r4(F.col("score")).alias("score"), "verdict"
    )


@register("robust_cov_embeddings")  # rows-only: iterative MCD not in SQL
def robust_cov_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = _features(spark, sf_dir)
    det = RobustCovarianceDetector(contamination=0.05, seed=42).fit(
        feats, [f"f{i}" for i in range(_DIMS)]
    )
    return det.transform(feats).select(
        "vec_id", r4(F.col("score")).alias("score"), "verdict"
    )
