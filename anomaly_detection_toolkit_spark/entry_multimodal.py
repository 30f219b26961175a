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


@register("multimodal_image_pipeline")  # rows-only: payload decode
def multimodal_image_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → feature-extract AND decode → resize in one row set
    (merged from two round-2 rows-only queries to fit the driver's
    50-query gate window); decode/feature/thumb numerics are pinned
    by tests/test_multimodal.py + tests/test_codecs_images.py."""
    imgs = generate_images(spark, _N_IMAGES, seed=42, n_parts=4)
    feats = mm.image_features(imgs, "image_id", "bytes", "fmt").select(
        "id",
        "ok",
        "w",
        "h",
        r4(F.col("mean_r")).alias("mean_r"),
        r4(F.col("std_luma")).alias("std_luma"),
        "phash",
    )
    thumbs = mm.image_resize(imgs, "image_id", "bytes", "fmt", 8, 8).select(
        "id", F.length("bytes").alias("thumb_bytes")
    )
    return feats.join(thumbs, "id")
