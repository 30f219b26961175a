"""Driver-contract queries for the multimodal operators. The driver
testdata has no payload tables, so each query synthesizes its
deterministic input inline (seeded; no external data) — rows-only
gate since the decode kernels are not SQL-expressible."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.entry_queries import r4, register
from anomaly_detection_toolkit_spark.operators import multimodal as mm
from anomaly_detection_toolkit_spark.sources.images import generate_images

_N_IMAGES = 200


@register("multimodal_image_features")  # rows-only: payload decode
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    imgs = generate_images(spark, _N_IMAGES, seed=42, n_parts=4)
    out = mm.image_features(imgs, "image_id", "bytes", "fmt")
    return out.select(
        "id",
        "ok",
        "w",
        "h",
        r4(F.col("mean_r")).alias("mean_r"),
        r4(F.col("std_luma")).alias("std_luma"),
        "phash",
    )


@register("multimodal_image_resize")  # rows-only: payload decode
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    imgs = generate_images(spark, _N_IMAGES, seed=42, n_parts=4)
    out = mm.image_resize(imgs, "image_id", "bytes", "fmt", 8, 8)
    return out.select("id", "ok", F.length("bytes").alias("thumb_bytes"), "w", "h")
