"""Driver-contract query for the multimodal image operators.

Round 3 closes the last rows-only gap: binary decode is not
SQL-expressible, but the synthetic input is a pure function of
(seed, i) and the per-image kernels are pure functions of the row —
so the lazy oracle replays generation + decode + feature + resize
SERIALLY on the driver (plain Python loop: no Spark, no Arrow, no
partitioning) and emits the expected output as a VALUES literal.
The hash gate then verifies everything the DISTRIBUTED path adds on
top of the shared per-row kernels: mapInPandas batching/partitioning,
Arrow binary/NULL transfer, schema alignment, the duplicate-key join
fan-out, and row completeness.

Float contract columns are emitted as ``floor(x * 1e4)`` BIGINTs, not
``round(x, 4)``: pixel means over power-of-two pixel counts are dyadic
rationals that land EXACTLY on x.xxxx5 about once per 64 images, where
Spark (HALF_UP) and DuckDB (half-even) disagree — the round() trap
documented in the project notes. floor() of the identical double has
no tie to break.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.entry_queries import register
from anomaly_detection_toolkit_spark.operators import multimodal as mm
from anomaly_detection_toolkit_spark.sources.images import generate_images

_N_IMAGES = 200
_IMG_SEED = 42
_IMG_PARTS = 4


def _e4(x: float | None) -> int | None:
    """floor(x*1e4) fixed-point encoding — one definition shared by
    the serial-replay rows (the Spark side mirrors it with F.floor)."""
    return None if x is None else math.floor(x * 10000.0)


def _image_pipeline_oracle_sql() -> str:
    """Serial replay of the whole pipeline on the driver: the same
    ``make_row`` / ``image_feature_row`` / ``image_resize_row`` pure
    functions the executors run, but in a plain loop, joined with a
    pandas merge (reproducing the duplicate-image_id join fan-out),
    emitted as a VALUES literal for DuckDB."""
    import pandas as pd

    from anomaly_detection_toolkit_spark.sources.images import (
        DefectConfig,
        make_row,
    )

    feats, thumbs = [], []
    for i in range(_N_IMAGES):
        row = make_row(i, _N_IMAGES, _IMG_PARTS, _IMG_SEED, DefectConfig())
        f = mm.image_feature_row(row["image_id"], row["bytes"], row["fmt"])
        feats.append(
            dict(
                id=f["id"],
                ok=f["ok"],
                w=f["w"],
                h=f["h"],
                mean_r_e4=_e4(f["mean_r"]),
                std_luma_e4=_e4(f["std_luma"]),
                phash=f["phash"],
            )
        )
        t = mm.image_resize_row(row["image_id"], row["bytes"], row["fmt"], 8, 8)
        thumbs.append(
            dict(id=t["id"], thumb_bytes=None if t["bytes"] is None else len(t["bytes"]))
        )
    joined = pd.DataFrame(feats).merge(pd.DataFrame(thumbs), on="id")

    def lit(v, as_int=False):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(int(v)) if as_int else str(v)

    rows = ",\n      ".join(
        f"({lit(r.id)},{lit(r.ok)},{lit(r.w, True)},{lit(r.h, True)},"
        f"{lit(r.mean_r_e4, True)},{lit(r.std_luma_e4, True)},"
        f"{lit(r.phash, True)},{lit(r.thumb_bytes, True)})"
        for r in joined.itertuples()
    )
    return f"""
    SELECT id, ok, CAST(w AS INTEGER) AS w, CAST(h AS INTEGER) AS h,
           CAST(mean_r_e4 AS BIGINT) AS mean_r_e4,
           CAST(std_luma_e4 AS BIGINT) AS std_luma_e4,
           CAST(phash AS BIGINT) AS phash,
           CAST(thumb_bytes AS INTEGER) AS thumb_bytes
    FROM (VALUES
      {rows}
    ) AS t(id, ok, w, h, mean_r_e4, std_luma_e4, phash, thumb_bytes)
    """


@register("multimodal_image_pipeline", _image_pipeline_oracle_sql)
def multimodal_image_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → feature-extract AND decode → resize in one row set
    over the north-star image table (seeded synthetic, no external
    data), hash-gated against a serial driver-side replay."""
    imgs = generate_images(spark, _N_IMAGES, seed=_IMG_SEED, n_parts=_IMG_PARTS)
    feats = mm.image_features(imgs, "image_id", "bytes", "fmt").select(
        "id",
        "ok",
        "w",
        "h",
        F.floor(F.col("mean_r") * 10000.0).cast("bigint").alias("mean_r_e4"),
        F.floor(F.col("std_luma") * 10000.0).cast("bigint").alias("std_luma_e4"),
        "phash",
    )
    thumbs = mm.image_resize(imgs, "image_id", "bytes", "fmt", 8, 8).select(
        "id", F.length("bytes").alias("thumb_bytes")
    )
    return feats.join(thumbs, "id")
