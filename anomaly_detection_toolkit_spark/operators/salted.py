"""Salted repartition + sort-within-partition dedup (north-star
uniqueness core, BASELINE.json north_rule).

Why salting: deduplicating on a skewed key with a plain
``groupBy(key)`` / window sends EVERY row of a hot key to one
reducer. (Catalyst's partial aggregation already prevents that for
pure counts — see ``plans/checks.py`` UniquenessCheck — but any
per-key computation that needs the rows themselves, like keeper
selection with payload columns, does not get that for free.) The
explicit two-stage plan here bounds the per-task row count for any
skew:

1. **salted repartition**: ``repartition(P, key, salt)`` with
   ``salt = pmod(xxhash64(order_cols), n_salts)`` — a key with M
   duplicates lands in ≈ M/n_salts-row slices across n_salts
   partitions;
2. **sortWithinPartitions(key, order)** + a per-partition first-row
   scan (``mapInPandas`` over the sorted partition stream, state
   carried across Arrow batches) — emits ≤ n_salts candidate keepers
   per key, NO shuffle;
3. **final merge**: a window over the (tiny) candidate set picks the
   global keeper per key — the only full shuffle touches ≤
   n_salts × n_keys candidate rows, never the raw duplicates.

``AQE skew-join`` handles the join-shaped skew elsewhere; this
operator is for the repartition-shaped dedup the north star names.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_sorted_dedup(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    n_salts: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exactly-one row per key (the ``order_cols``-smallest), robust
    to arbitrarily hot keys. Schema is preserved.

    ``order_cols`` must totally order rows within a key (ties would
    make the keeper nondeterministic — SURVEY §7.3).
    """
    key_cols = list(key_cols)
    order_cols = list(order_cols)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(n_salts))
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism * 2
    salted = df.withColumn("_salt", salt).repartition(
        parts, *key_cols, F.col("_salt")
    ).sortWithinPartitions(*key_cols, *order_cols)

    schema = salted.schema
    k_idx = [schema.names.index(c) for c in key_cols]

    def first_per_key(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        last_key = None
        for pdf in batches:  # batches arrive in partition sort order
            if pdf.empty:
                continue
            keys = list(zip(*[pdf.iloc[:, i] for i in k_idx]))
            keep = []
            for row_i, k in enumerate(keys):
                if k != last_key:
                    keep.append(row_i)
                    last_key = k
            yield pdf.iloc[keep]

    candidates = salted.mapInPandas(first_per_key, schema=schema)
    # final merge over ≤ n_salts candidates per key
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        candidates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_salt")
    )


def salted_duplicate_counts(
    df: DataFrame, key_cols: Sequence[str], n_salts: int = 16
) -> DataFrame:
    """(key, key_count) via an EXPLICIT two-stage salted aggregation —
    the hand-written equivalent of Catalyst's partial+final count,
    kept as the didactic/verifiable form of the hot-key-safe plan:
    stage 1 counts per (key, salt), stage 2 sums ≤ n_salts partials."""
    key_cols = list(key_cols)
    salt = F.pmod(F.spark_partition_id(), F.lit(n_salts))
    stage1 = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return stage1.groupBy(*key_cols).agg(F.sum("_partial").alias("key_count"))
