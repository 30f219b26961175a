"""Deterministic synthetic audio+video clip table (no external data).

Same contract as :mod:`sources.images`: every row is a PURE function
of (seed, i), so the driver-gate oracle can replay generation +
decode + feature-extraction SERIALLY on the driver and hash-compare
against the distributed mapInPandas path. Defects are planted on
fixed residue classes (the :mod:`sources.images` pattern) to exercise
every error branch of the audio/video kernels:

- ``i % 23 == 9``  → NULL audio payload
- ``i % 17 == 5``  → truncated audio payload (decode error)
- ``i % 19 == 7``  → fmt ``mp3`` (declared stub → error row)
- ``i % 13 == 4``  → corrupt video container magic
- ``i % 29 == 11`` → fmt ``mp4`` (declared stub → error row)

Clean audio alternates real RIFF/WAV (stereo every 4th clip — covers
the mixdown path) with the ``fake_pcm16`` container; video is the
``fake_mjpeg`` container with 1-4 frames per clip.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from anomaly_detection_toolkit_spark.operators.multimodal import (
    encode_fake_mjpeg,
    encode_fake_pcm16,
    encode_wav,
)
from anomaly_detection_toolkit_spark.sources.images import gen_pixels

CLIP_SCHEMA = (
    "clip_id string, abytes binary, afmt string, vbytes binary, vfmt string"
)


def clip_samples(i: int, seed: int = 7) -> tuple[np.ndarray, int]:
    """Deterministic mono float64 waveform in [-1, 1] for clip ``i``."""
    n = 800 + (i * 131) % 600
    rate = 8000
    rng = np.random.Generator(
        np.random.PCG64((seed << 32) ^ (i * 0x9E3779B1 & 0x7FFFFFFF))
    )
    t = np.arange(n, dtype=np.float64) / rate
    f = 60.0 + ((i * 37) % 400)
    x = (
        0.6 * np.sin(2 * np.pi * f * t)
        + 0.2 * np.sin(2 * np.pi * 2.5 * f * t + 1.0)
        + rng.normal(0.0, 0.05, n)
    )
    return np.clip(x, -1.0, 1.0), rate


def make_clip_row(i: int, seed: int = 7) -> dict:
    """One (clip_id, audio payload, video payload) row — pure in (seed, i)."""
    clip_id = f"clip_{i:06d}"
    x, rate = clip_samples(i, seed)

    if i % 23 == 9:
        abytes, afmt = None, "wav"
    elif i % 17 == 5:
        full = encode_wav(x, rate)
        abytes, afmt = full[: len(full) // 2], "wav"
    elif i % 19 == 7:
        abytes, afmt = encode_fake_pcm16(x, rate), "mp3"
    elif i % 4 == 3:
        stereo = np.column_stack([x, np.roll(x, len(x) // 3)])
        abytes, afmt = encode_wav(stereo, rate, channels=2), "wav"
    elif i % 2 == 0:
        abytes, afmt = encode_wav(x, rate), "wav"
    else:
        abytes, afmt = encode_fake_pcm16(x, rate), "fake_pcm16"

    frames = [gen_pixels(i * 4 + k, 8, 6, seed) for k in range(1 + i % 4)]
    vbytes = encode_fake_mjpeg(frames)
    if i % 13 == 4:
        vbytes, vfmt = b"XXXX" + vbytes[4:], "fake_mjpeg"
    elif i % 29 == 11:
        vfmt = "mp4"
    else:
        vfmt = "fake_mjpeg"
    return dict(clip_id=clip_id, abytes=abytes, afmt=afmt, vbytes=vbytes, vfmt=vfmt)


def generate_clips(
    spark: SparkSession, n: int, seed: int = 7, spark_partitions: int = 8
) -> DataFrame:
    """Distributed deterministic generation of the clip table."""
    base = spark.range(0, n, 1, spark_partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([make_clip_row(int(i), seed) for i in pdf["id"]])

    return base.mapInPandas(gen, schema=CLIP_SCHEMA)
