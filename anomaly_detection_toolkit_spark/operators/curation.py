"""Corpus-curation operators: token-budget sequence packing and
deterministic stratified sampling.

Two operations every LLM training-data pipeline runs between "corpus
is deduped" and "tokens hit the trainer", re-expressed Spark-first:

- **pack_documents** — GPT-style concat-and-split packing: documents
  are laid out in a deterministic pseudo-random order (60-bit md5 of
  the doc id, so the layout is layout- and cluster-size-independent)
  and cut into fixed token-budget training chunks. The global running
  token offset is an exact distributed two-phase prefix sum — the
  same parallel-prefix plan as `evaluation.roc_auc` — but with the
  coarse partitioner derived from the DATA (high bits of the uniform
  hash key), not from `spark_partition_id()`, so a recomputed lineage
  can never misalign the bucket offsets and no persist-pinning is
  needed for correctness.
- **stratified_sample** — per-stratum Bernoulli keep decided by a
  60-bit hash of the doc id, NOT by `rand()`/`sampleBy`: the kept set
  is a pure function of the data, reproducible across reruns,
  partition layouts and cluster sizes (resumable pipelines re-derive
  the identical mixture), and the filter is a map-side codegen'd
  expression — zero shuffle at any scale.

Both are pure `pyspark.sql.functions` plans (no UDFs) and hash-verify
against DuckDB oracles (`entry_corpus.py`). Scale notes in
docs/SCALE.md §Dedup/curation.

Reference parity: the reference toolkit has no corpus operators; these
extend the training-data pipeline family from the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.functions.localrel import local_rows_df
from anomaly_detection_toolkit_spark.operators import text

# hash60 keys are uniform in [0, 2^60); dropping the low 60-k bits
# yields 2^k equal-width, deterministic, layout-independent buckets
_HASH_BITS = 60


def _bucket_shift(n_buckets: int) -> tuple[int, int]:
    """(shift, actual bucket count): smallest power of two ≥ n_buckets."""
    k = max(1, (n_buckets - 1).bit_length())
    k = min(k, _HASH_BITS)
    return _HASH_BITS - k, 1 << k


def prefixed_token_offsets(
    df: DataFrame,
    value_col: str,
    order_key: str,
    id_col: str,
    n_buckets: int | None = None,
) -> DataFrame:
    """Append ``cum`` = exact global running sum of ``value_col`` in
    ``(order_key, id_col)`` order, computed as a two-phase parallel
    prefix sum (never a whole-data ordered window).

    ``order_key`` must be a ~uniform non-negative int64 (a ``hash60``
    key). Phase 1: bucket = high bits of the key (deterministic — a
    recompute reproduces the same assignment, unlike
    ``spark_partition_id()``); windowed cumsum WITHIN each bucket runs
    in parallel. Phase 2: per-bucket totals (≤ ``n_buckets`` rows)
    collect to the driver, their running sum is each bucket's offset,
    broadcast back as a literal relation. Two scans of the narrow
    projection; no persist needed for correctness.
    """
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    shift, _ = _bucket_shift(n_buckets)
    part = df.withColumn("bucket", F.shiftright(F.col(order_key), shift))
    # ROWS frame, not the default RANGE: RANGE treats order-key PEERS
    # as one frame, so a duplicated (order_key, id) pair would fold
    # both rows' values into both cums — overlapping offsets, silent
    # layout corruption. With ROWS each row gets a distinct running
    # sum; duplicate ids still produce a VALID non-overlapping layout
    # (tie order within the duplicate pair is arbitrary) — callers
    # wanting full determinism must supply unique ids.
    w = (
        Window.partitionBy("bucket")
        .orderBy(order_key, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    part = part.withColumn("cum_in", F.sum(value_col).over(w))
    totals = sorted(
        part.groupBy("bucket").agg(F.sum(value_col).alias("tot")).collect(),
        key=lambda r: r["bucket"],
    )
    offsets, acc = [], 0
    for r in totals:
        offsets.append((int(r["bucket"]), acc))
        acc += int(r["tot"] or 0)
    off_df = local_rows_df(spark, offsets or [(0, 0)], "bucket int, off long")
    return part.join(F.broadcast(off_df), "bucket").withColumn(
        "cum", F.col("off") + F.col("cum_in")
    ).drop("bucket", "cum_in", "off")


def pack_documents(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_col: str | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Concat-and-split packing: assign every document its slice of
    the fixed-budget training-chunk stream.

    Documents are concatenated in the deterministic pseudo-random
    order ``(hash60(id), id)`` and the stream is cut every ``budget``
    tokens (documents may straddle a cut — the standard pretraining
    layout). Emits per doc: ``n_tokens``, global ``start_offset``,
    ``chunk_id`` (chunk containing the first token),
    ``offset_in_chunk``, and ``n_chunks`` the doc spans. All integer
    arithmetic — bit-identical cross-engine, no rounding.

    Token counts come from ``token_col`` if given (e.g. a real
    tokenizer's counts carried on the table) else the whitespace
    ``text.token_count``.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    tok = (
        F.col(token_col).cast("long")
        if token_col
        else text.token_count(F.col(text_col)).cast("long")
    )
    base = df.select(
        F.col(id_col),
        tok.alias("n_tokens"),
        text.hash60(F.col(id_col).cast("string")).alias("okey"),
    )
    cum = prefixed_token_offsets(base, "n_tokens", "okey", id_col, n_buckets)
    start = F.col("cum") - F.col("n_tokens")
    # `div` = integer division: exact at any corpus size (double-based
    # floor() degrades past 2^53 total tokens)
    out = cum.withColumn("start_offset", start).selectExpr(
        id_col,
        "n_tokens",
        "start_offset",
        f"start_offset div {budget} AS chunk_id",
        f"start_offset % {budget} AS offset_in_chunk",
        # last token sits at cum-1; empty docs span their start chunk
        f"greatest(start_offset + n_tokens - 1, start_offset) div {budget}"
        f" - start_offset div {budget} + 1 AS n_chunks",
    )
    return out


def chunk_assignments(
    packed: DataFrame, budget: int, id_col: str = "doc_id"
) -> DataFrame:
    """Explode ``pack_documents`` output into the consumable
    (chunk, doc-slice) table: one row per chunk a document overlaps,
    with the token sub-range of the document that lands there.

    Emits ``(chunk_id, doc_id?, tok_from, tok_len, chunk_offset)``
    where ``tok_from`` is the 0-based offset INTO THE DOCUMENT,
    ``tok_len`` the slice length, and ``chunk_offset`` where the
    slice starts inside the chunk — exactly what a tokenizer-side
    assembler needs to materialize fixed-budget training rows.
    Zero-token docs emit no rows. Pure codegen'd
    ``posexplode(sequence(...))`` over ``n_chunks`` — the fan-out is
    bounded by ceil(doc_tokens/budget)+1 per doc, no shuffle beyond
    what downstream grouping by ``chunk_id`` needs.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    seq = F.sequence(F.lit(0), F.col("n_chunks") - 1)
    e = packed.filter(F.col("n_tokens") > 0).select(
        id_col,
        "n_tokens",
        "start_offset",
        "chunk_id",
        F.posexplode(seq).alias("ci", "_"),
    )
    chunk = F.col("chunk_id") + F.col("ci")
    # slice of THIS doc that falls into `chunk`: the doc occupies
    # global tokens [start, start+n); the chunk spans [chunk*B, (chunk+1)*B)
    lo = F.greatest(chunk * budget, F.col("start_offset"))
    hi = F.least((chunk + 1) * budget, F.col("start_offset") + F.col("n_tokens"))
    return e.select(
        chunk.alias("chunk_id"),
        F.col(id_col),
        (lo - F.col("start_offset")).alias("tok_from"),
        (hi - lo).alias("tok_len"),
        (lo - chunk * budget).alias("chunk_offset"),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum subsample (training-mixture rates).

    A row is kept iff ``hash60(id || ':' || salt) mod 1e6`` falls
    below its stratum's threshold — a pure map-side filter whose kept
    set is independent of partition layout, cluster size and rerun
    (unlike ``DataFrame.sampleBy``, whose Bernoulli draw is seeded per
    physical partition). ``salt`` yields independent samples from the
    same corpus (disjoint-ish draws for train/val splits come from
    disjoint threshold ranges, not salts).

    ``fractions`` maps stratum value → keep rate in [0, 1]; strata not
    listed use ``default_fraction``. Rates are quantized to 1e-6.
    """
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0,1], got {v}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0,1], got {default_fraction}")
    key = text.hash60(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    draw = F.pmod(key, F.lit(1_000_000))
    thr = F.lit(int(round(default_fraction * 1_000_000)))
    for k, v in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == k, F.lit(int(round(v * 1_000_000)))).otherwise(
            thr
        )
    return df.filter(draw < thr)
