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

from anomaly_detection_toolkit_spark.entry_queries import register, register_extra
from anomaly_detection_toolkit_spark.operators import multimodal as mm
from anomaly_detection_toolkit_spark.sources.images import generate_images

_N_IMAGES = 200
_IMG_SEED = 42
_IMG_PARTS = 4


def _e4(x: float | None) -> int | None:
    """floor(x*1e4) fixed-point encoding — one definition shared by
    the serial-replay rows (the Spark side mirrors it with F.floor)."""
    return None if x is None else math.floor(x * 10000.0)


def _lit(v, as_int=False):
    """SQL literal for a serial-replay VALUES row (shared by the
    image and audio/video pipeline oracles)."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(int(v)) if as_int else str(v)


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
    lit = _lit

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


# ---------------------------------------------------------------------------
# Audio + video pipeline (register_extra: local parity gate — the
# driver registry stays at exactly 50). Same serial-replay design as
# the image pair: the clip table is pure in (seed, i)
# (sources/clips.py), the per-clip kernels are shared between the
# distributed mapInPandas pass and the driver-side loop, and the hash
# gate verifies the distributed plumbing — Arrow binary/NULL
# round-trip, the 1→N frame-sample fan-out, the audio×video join —
# plus every decode error branch (truncated/NULL payloads, corrupt
# container magic, declared mp3/mp4 stubs).
# Reference parity: multimodal payloads are beyond the reference's
# scope (build-brief addition); defect taxonomy mirrors
# sources/images.py.
# ---------------------------------------------------------------------------

_N_CLIPS = 150
_CLIP_SEED = 7


def _av_pipeline_oracle_sql() -> str:
    """Serial driver-side replay of clip generation + audio features +
    frame sampling, emitted as a VALUES literal."""
    import pandas as pd

    from anomaly_detection_toolkit_spark.sources.clips import make_clip_row

    arows, vrows = [], []
    for i in range(_N_CLIPS):
        row = make_clip_row(i, _CLIP_SEED)
        a = mm.audio_feature_row(row["clip_id"], row["abytes"], row["afmt"])
        arows.append(
            dict(
                id=a["id"], a_ok=a["ok"], n_samples=a["n_samples"],
                rate=a["rate"], dur_e4=_e4(a["duration_s"]),
                rms_e4=_e4(a["rms"]), peak_e4=_e4(a["peak"]),
                zcr_e4=_e4(a["zcr"]),
            )
        )
        for v in mm.video_frame_rows(row["clip_id"], row["vbytes"], row["vfmt"], every=2):
            vrows.append(
                dict(
                    id=v["id"], v_ok=v["ok"], n_frames=v["n_frames"],
                    frame_idx=v["frame_idx"],
                    frame_len=None if v["frame_bytes"] is None else len(v["frame_bytes"]),
                    fw=v["w"], fh=v["h"],
                )
            )
    joined = pd.DataFrame(arows).merge(pd.DataFrame(vrows), on="id")
    rows = ",\n      ".join(
        f"({_lit(r.id)},{_lit(r.a_ok)},{_lit(r.n_samples, True)},"
        f"{_lit(r.rate, True)},{_lit(r.dur_e4, True)},{_lit(r.rms_e4, True)},"
        f"{_lit(r.peak_e4, True)},{_lit(r.zcr_e4, True)},{_lit(r.v_ok)},"
        f"{_lit(r.n_frames, True)},{_lit(r.frame_idx, True)},"
        f"{_lit(r.frame_len, True)},{_lit(r.fw, True)},{_lit(r.fh, True)})"
        for r in joined.itertuples()
    )
    return f"""
    SELECT id, a_ok, CAST(n_samples AS BIGINT) AS n_samples,
           CAST(rate AS INTEGER) AS rate,
           CAST(dur_e4 AS BIGINT) AS dur_e4,
           CAST(rms_e4 AS BIGINT) AS rms_e4,
           CAST(peak_e4 AS BIGINT) AS peak_e4,
           CAST(zcr_e4 AS BIGINT) AS zcr_e4,
           v_ok, CAST(n_frames AS INTEGER) AS n_frames,
           CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST(frame_len AS INTEGER) AS frame_len,
           CAST(fw AS INTEGER) AS fw, CAST(fh AS INTEGER) AS fh
    FROM (VALUES
      {rows}
    ) AS t(id, a_ok, n_samples, rate, dur_e4, rms_e4, peak_e4, zcr_e4,
           v_ok, n_frames, frame_idx, frame_len, fw, fh)
    """


@register("multimodal_av_pipeline", _av_pipeline_oracle_sql)
def multimodal_av_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode → RMS/peak/ZCR features AND video decode →
    every-2nd-frame sampling over the deterministic clip table, joined
    per clip (1→N fan-out), hash-gated against a serial replay."""
    from anomaly_detection_toolkit_spark.sources.clips import generate_clips

    clips = generate_clips(spark, _N_CLIPS, seed=_CLIP_SEED)
    a = mm.audio_features(clips, "clip_id", "abytes", "afmt").select(
        "id",
        F.col("ok").alias("a_ok"),
        "n_samples",
        "rate",
        F.floor(F.col("duration_s") * 10000.0).cast("bigint").alias("dur_e4"),
        F.floor(F.col("rms") * 10000.0).cast("bigint").alias("rms_e4"),
        F.floor(F.col("peak") * 10000.0).cast("bigint").alias("peak_e4"),
        F.floor(F.col("zcr") * 10000.0).cast("bigint").alias("zcr_e4"),
    )
    v = mm.video_frame_sample(clips, "clip_id", "vbytes", "vfmt", every=2).select(
        "id",
        F.col("ok").alias("v_ok"),
        "n_frames",
        "frame_idx",
        F.length("frame_bytes").alias("frame_len"),
        F.col("w").alias("fw"),
        F.col("h").alias("fh"),
    )
    return a.join(v, "id")
