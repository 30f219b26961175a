"""Deterministic synthetic north-star image+caption table (FIXTURES F1).

Schema per the authoritative input hint (BASELINE.json ``input_hint``):
``(image_id STRING, bytes BINARY, w INT, h INT, fmt STRING,
caption STRING, phash BIGINT)`` plus a physical partition column
``part INT`` and a ground-truth ``defect STRING`` label column used
ONLY by tests/bench asserts — validation checks never read it.

Generation is fully distributed: ``spark.range(n)`` → ``mapInPandas``
with a pure per-id function, so the same code generates 1k rows in a
unit test or 10^12 rows on a 1000-executor cluster (no driver-side
loop, no collected state). Every row is a pure function of
``(seed, i)`` — re-running yields byte-identical output.

Injected defects (deterministic row indices, each toggleable):

==============  ============================  =======================
defect          rule (row index i)            caught by
==============  ============================  =======================
hot_phash       i % 211 == 13 → constant      uniqueness(phash) + skew
dup_image_id    i % 401 == 17 → row i-1's id  uniqueness(image_id)
orphan_caption  i % 499 == 23 → ref missing   referential check
corrupt_bytes   i % 547 == 29 → bad magic     payload decode check
null_bytes      i % 601 == 31 → NULL          payload decode check
null_dims       i % 653 == 37 → NULL w/h      column-stats null-rate
caption_bad     i % 719 == 41 → altered text  payload caption equality
drift           last ~1/8 of partitions get   drift check (w/h/fmt
                bigger w/h + all-lossyq fmt   histograms)
==============  ============================  =======================

The hot-phash bucket doubles as the skew fixture for the uniqueness
shuffle (BASELINE north_star: "salting hot phash buckets").
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.functions import codecs

SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, part int, defect string"
)

HOT_PHASH = 0x5AD_C0FFEE  # the injected duplicate-phash hot key


@dataclass(frozen=True)
class DefectConfig:
    hot_phash: bool = True
    dup_image_id: bool = True
    orphan_caption: bool = True
    corrupt_bytes: bool = True
    null_bytes: bool = True
    null_dims: bool = True
    caption_bad: bool = True
    drift: bool = True
    sizes: tuple[int, ...] = (32, 48, 64)
    drift_sizes: tuple[int, ...] = (96, 128)


CLEAN = DefectConfig(
    hot_phash=False,
    dup_image_id=False,
    orphan_caption=False,
    corrupt_bytes=False,
    null_bytes=False,
    null_dims=False,
    caption_bad=False,
    drift=False,
)


def image_id_of(i: int) -> str:
    return f"img_{i:012d}"


def id_num(image_id: str) -> int:
    return int(image_id[4:])


def caption_of(image_id: str) -> str:
    cid = id_num(image_id)
    return f"caption for {image_id}: synthetic scene {cid % 1000} variant {cid % 7}"


# per-(w, h) deterministic geometry, shared by every image of that
# size: quarter-weighted base gradient, normalized grids, and the 8x8
# block-expansion index. Only ~5 sizes exist per table, but gen_pixels
# runs once per IMAGE in the payload check's hot loop — caching these
# is a measured ~10% kernel win with bit-identical output
# (test_gen_pixels_reference_hashes pins the exact bytes).
_GEOM_CACHE: dict[tuple[int, int], tuple] = {}


def _geom(w: int, h: int) -> tuple:
    g = _GEOM_CACHE.get((w, h))
    if g is None:
        gx = np.linspace(0, 255, w, dtype=np.float64)
        gy = np.linspace(0, 255, h, dtype=np.float64)
        base_q = 0.25 * (gy[:, None] * 0.5 + gx[None, :] * 0.5)[:, :, None]
        xx = np.arange(w, dtype=np.float64) / w
        yy = np.arange(h, dtype=np.float64) / h
        block_ix = np.ix_((np.arange(h) * 8) // h, (np.arange(w) * 8) // w)
        g = _GEOM_CACHE[(w, h)] = (base_q, xx, yy, block_ix)
    return g


def gen_pixels(i: int, w: int, h: int, seed: int = 42) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 image for id number ``i``.

    Pure function of (seed, i, w, h) so the payload check can
    regenerate the reference pixels from row values alone.
    """
    rng = np.random.Generator(np.random.PCG64((seed << 32) ^ (i * 0x9E3779B1 & 0x7FFFFFFF)))
    base_q, xx, yy, block_ix = _geom(w, h)
    # per-image spatial structure (so phash is content-discriminating):
    # random-frequency/phase plaid per channel
    img = np.empty((h, w, 3), dtype=np.float64)
    for ch in range(3):
        fx, fy = rng.integers(1, 7), rng.integers(1, 7)
        px, py = rng.uniform(0, 2 * np.pi), rng.uniform(0, 2 * np.pi)
        plaid = 60.0 * (
            np.sin(2 * np.pi * fy * yy + py)[:, None]
            + np.sin(2 * np.pi * fx * xx + px)[None, :]
        )
        img[:, :, ch] = 96.0 + plaid
    noise = rng.normal(0.0, 12.0, size=(h, w, 3))
    # independent strong offset per 8x8 block (aligned with the phash
    # block grid): makes the 64 phash bits effectively iid across
    # images → clean tables are collision-free at any test scale
    blockfield = rng.normal(0.0, 45.0, size=(8, 8))
    # in-place adds in the SAME left-to-right order as the original
    # `img + 0.25*base + noise + block` expression — float64 addition
    # order preserved, so the bytes are identical (pinned by test)
    img += base_q
    img += noise
    img += blockfield[block_ix][:, :, None]
    # deterministic bright blob in an id-derived 8x8 block: guarantees
    # content (and thus phash) discrimination even between images whose
    # random plaids happen to coincide
    block = (i * 2654435761) % 64
    bx, by = block % 8, block // 8
    x0, x1 = (bx * w) // 8, ((bx + 1) * w) // 8
    y0, y1 = (by * h) // 8, ((by + 1) * h) // 8
    img[y0:y1, x0:x1, :] += 110.0
    np.clip(img, 0, 255, out=img)
    return img.astype(np.uint8)


def _size_for(i: int, sizes: tuple[int, ...], salt: int) -> int:
    return sizes[((i * 2654435761) >> salt) % len(sizes)]


def n_drift_parts(n_parts: int) -> int:
    return max(1, n_parts // 8)


def make_row(i: int, n: int, n_parts: int, seed: int, cfg: DefectConfig) -> dict:
    part = min((i * n_parts) // max(n, 1), n_parts - 1)
    drifted = cfg.drift and part >= n_parts - n_drift_parts(n_parts)

    src = i
    defect = None
    if cfg.dup_image_id and i % 401 == 17 and i > 0:
        src = i - 1
        defect = "dup_image_id"
    image_id = image_id_of(src)

    sizes = cfg.drift_sizes if drifted else cfg.sizes
    w = _size_for(src, sizes, 8)
    h = _size_for(src, sizes, 16)
    fmt = "lossyq" if drifted else codecs.FORMATS[(src * 7 + 3) % len(codecs.FORMATS)]
    if drifted and defect is None:
        defect = "drift"

    img = gen_pixels(src, w, h, seed)
    payload: bytes | None = codecs.encode(img, fmt)
    phash = codecs.phash64(img)
    caption = caption_of(image_id)

    if cfg.hot_phash and i % 211 == 13:
        phash = HOT_PHASH
        defect = defect or "hot_phash"
    if cfg.orphan_caption and i % 499 == 23:
        caption = caption_of(image_id_of(n * 10 + i))
        defect = "orphan_caption"
    if cfg.corrupt_bytes and i % 547 == 29:
        payload = b"XX" + payload[2:]
        defect = "corrupt_bytes"
    if cfg.null_bytes and i % 601 == 31:
        payload = None
        defect = "null_bytes"
    w_out: int | None = w
    h_out: int | None = h
    if cfg.null_dims and i % 653 == 37:
        w_out = None
        h_out = None
        defect = "null_dims"
    if cfg.caption_bad and i % 719 == 41:
        caption = caption + " CORRUPTED"
        defect = "caption_bad"

    return {
        "image_id": image_id,
        "bytes": payload,
        "w": w_out,
        "h": h_out,
        "fmt": fmt,
        "caption": caption,
        "phash": phash,
        "part": part,
        "defect": defect,
    }


def generate_images(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    n_parts: int = 8,
    cfg: DefectConfig = DefectConfig(),
    spark_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic generation of the F1 table."""
    spark_partitions = spark_partitions or max(n_parts, 8)
    base = spark.range(0, n, 1, spark_partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [make_row(int(i), n, n_parts, seed, cfg) for i in pdf["id"]]
            out = pd.DataFrame(rows)
            out["w"] = out["w"].astype("Int32")
            out["h"] = out["h"].astype("Int32")
            out["part"] = out["part"].astype("int32")
            yield out

    return base.mapInPandas(gen, schema=SCHEMA)


def write_images(
    spark: SparkSession,
    path: str,
    n: int,
    seed: int = 42,
    n_parts: int = 8,
    cfg: DefectConfig = DefectConfig(),
    files_per_part: int = 4,
) -> None:
    """Write the table Hive-partitioned by ``part`` (the resumability
    and partition-pruning unit for the validation ledger).

    Rows are clustered by (part, salt) before the partitioned write so
    each part directory gets ~``files_per_part`` right-sized files
    instead of (spark_partitions × n_parts) shards. Multiple files per
    part keep downstream scan tasks fine-grained enough that the
    heavy partitions (drifted parts have 4-16× the pixel volume) don't
    become stragglers — the same reasoning as sizing
    ``spark.sql.files.maxPartitionBytes`` at cluster scale.
    """
    df = generate_images(spark, n, seed, n_parts, cfg)
    salt = F.pmod(F.xxhash64("image_id"), F.lit(files_per_part))
    (
        df.repartition(n_parts * files_per_part, F.col("part"), salt)
        .write.mode("overwrite")
        .partitionBy("part")
        .parquet(path)
    )
