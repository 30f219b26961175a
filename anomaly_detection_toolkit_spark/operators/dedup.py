"""Deduplication operators for training-data pipelines.

Five dedup families, each with an explicit scale story:

- **exact**: md5-of-normalized-text groupBy — ONE shuffle on the
  fingerprint; Catalyst's partial aggregation pre-combines map-side
  so a pathological all-identical corpus still can't flood a reducer
  with raw rows.
- **n-gram Jaccard**: shingle → inverted-index self-join → pair
  agreement counts. The classic join-on-token plan; frequent shingles
  are pruned by document frequency BEFORE the join (`max_df`) — at
  web scale the df-pruning is what keeps the pair explosion bounded.
- **MinHash + LSH**: per-row signatures computed entirely with
  higher-order array functions (`transform`/`array_min`) — NO
  explode, NO shuffle for the signature stage; the only shuffle is
  the tiny groupBy on LSH band buckets. Banding: `num_perm`
  permutations in `bands` bands of `rows_per_band`; docs sharing any
  band bucket become candidate pairs, verified by signature
  agreement (estimated Jaccard).
- **SimHash**: 32-bit per-row fingerprint via bit-vote over token
  hashes (again pure array exprs); near-dups = pairs sharing a
  16-bit half (Hamming-style LSH) with small signature distance.
- **embedding cosine**: see ``similarity.py`` (shared kernels).

Every hash is the cross-engine 60-bit md5 hash from ``text.py`` so
the DuckDB oracles reproduce signatures bit-for-bit.

Materialization convention (here and in ``similarity.py``): tables a
self-join references twice are EAGERLY ``localCheckpoint()``ed, not
``persist()``ed — Spark does not CSE self-referenced plans, and a
function-internal persist has no unpersist point, pinning the cache
manager for the session (round-5 leak fix). The documented trade:
checkpoint blocks have no lineage, so on a multi-executor cluster
losing an executor mid-operator fails the job instead of recomputing
(acceptable for these short-lived intra-operator intermediates —
rerun the operator), and the materialization job runs at plan-BUILD
time (callers pay it even if they only ``explain()`` the result).

MinHash math: h_i(s) = (a_i * (H(s) mod 2^30) + b_i) mod P with
P = 2^31 - 1 (prime), a_i,b_i < 2^30 derived from md5(i) — products
stay < 2^61 so int64 arithmetic is exact (and identical) in both
engines.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.operators.text import hash60, normalize

MERSENNE31 = (1 << 31) - 1
MASK30 = (1 << 30) - 1


def _perm_params(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) per permutation, derived from md5(i) —
    reproducible in SQL but precomputed here as plain literals."""
    params = []
    for i in range(num_perm):
        d = hashlib.md5(f"perm_{i}".encode()).hexdigest()
        a = (int(d[:8], 16) & MASK30) | 1  # odd, nonzero
        b = int(d[8:16], 16) & MASK30
        params.append((a, b))
    return params


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Tag every row with its duplicate group and keeper flag.

    Output: (id, fingerprint, group_size, dup_rank, is_duplicate).
    The keeper is the smallest id per fingerprint (deterministic).
    One shuffle on fingerprint; the window reuses the same hash
    partitioning Catalyst already produced for the groupBy-free plan
    (window partitionBy = exchange key, no second shuffle).
    """
    fp = F.md5(normalize(F.col(text_col)))
    w = Window.partitionBy("fingerprint").orderBy(id_col)
    return (
        df.select(F.col(id_col), fp.alias("fingerprint"))
        .withColumn("dup_rank", F.row_number().over(w))
        .withColumn("group_size", F.count(F.lit(1)).over(Window.partitionBy("fingerprint")))
        .withColumn("is_duplicate", (F.col("dup_rank") > 1).cast("int"))
    )


# ---------------------------------------------------------------------------
# Shingles + n-gram Jaccard
# ---------------------------------------------------------------------------


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of normalized text as
    ARRAY<STRING>; [] when fewer than n tokens. Pure array exprs."""
    toks = F.split(normalize(text), " ")
    # guard: sequence(1, 0) would count DOWN in Spark — short texts
    # must yield an empty shingle set instead
    grams = F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )
    return F.array_distinct(grams)


def exploded_gram_hashes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """(id, g) distinct 60-bit hashes of word n-grams, built entirely
    post-explode: tokens → posexplode → ``lead`` window → concat →
    md5 — every stage codegen'd (the per-row array-lambda shingle
    construction costs ~20µs/gram interpreted; this path is ~10×
    faster per gram at the price of one shuffle by id for the window,
    which the downstream inverted-index join needs anyway)."""
    toks = df.select(
        F.col(id_col).alias("id"), F.posexplode(F.split(normalize(F.col(text_col)), " "))
    ).withColumnsRenamed({"pos": "p", "col": "t"})
    w = Window.partitionBy("id").orderBy("p")
    parts = [F.col("t")] + [F.lead("t", i).over(w) for i in range(1, n)]
    grams = toks.select(
        "id", F.concat_ws(" ", *parts).alias("g0"), F.lead("t", n - 1).over(w).alias("_last")
    ).filter(F.col("_last").isNotNull())
    out = grams.select("id", hash60(F.col("g0")).alias("g"))
    # distinct matters for set semantics (Jaccard); min-style
    # consumers (MinHash) skip the extra shuffle
    return out.dropDuplicates(["id", "g"]) if distinct else out


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    max_df: int | None = None,
) -> DataFrame:
    """All (id_a < id_b) pairs with n-gram Jaccard ≥ threshold.

    Plan: per-doc distinct shingles (no shuffle) → explode →
    [optional df-prune] → self-equi-join on shingle → pair
    intersection counts (ONE shuffle on the pair key) → broadcast
    join of per-doc sizes. `max_df` drops shingles occurring in more
    than that many docs — at 10^12 docs this prune is mandatory
    (stop-shingles otherwise generate quadratic pairs); the resulting
    Jaccard is then a lower bound, which is the standard trade.
    """
    # join on the 60-bit hash of the gram, not the string: smaller
    # shuffle payload + integer key compare. Collision risk 2^-60 per
    # pair — negligible vs the shuffle win. Grams built post-explode
    # (codegen'd — see exploded_gram_hashes). localCheckpoint (eager):
    # three subtrees (sizes, both join sides, optional df-prune)
    # reference this table; GC-released with the result plan rather
    # than pinned in the cache manager for the session.
    exploded = exploded_gram_hashes(df, text_col, id_col, n).localCheckpoint()
    # shingles are distinct per doc, so the per-doc set size is just
    # the exploded row count — no second shingle pass
    sizes = exploded.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    if max_df is not None:
        dfreq = exploded.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
        exploded = exploded.join(dfreq.filter(F.col("df") <= max_df), "g", "inner").select(
            "id", "g"
        )
    a = exploded.alias("a")
    b = exploded.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def hashed_shingles(text: Column, n: int = 3) -> Column:
    """ARRAY<BIGINT> of 30-bit shingle hashes — the md5 of each
    shingle is computed exactly ONCE here; every MinHash permutation
    then runs cheap integer arithmetic over this array. (Spark does
    not common-subexpression-eliminate across higher-order-function
    lambdas, so inlining the hash into each permutation would
    recompute every md5 ``num_perm`` times — measured 50×+ slower.)"""
    return F.transform(shingles(text, n), lambda s: F.pmod(hash60(s), F.lit(1 << 30)))


def minhash_from_hashes(hashed: Column, num_perm: int = 16) -> Column:
    """ARRAY<BIGINT> MinHash signature from pre-hashed shingles.
    Empty shingle set → signature of P (sentinel max)."""
    sig = []
    for a, b in _perm_params(num_perm):
        sig.append(
            F.coalesce(
                F.array_min(
                    F.transform(hashed, lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(MERSENNE31)))
                ),
                F.lit(MERSENNE31),
            )
        )
    return F.array(*sig)


def minhash_signature(text: Column, num_perm: int = 16, n: int = 3) -> Column:
    """Convenience composition; prefer materializing
    ``hashed_shingles`` in its own projection first (see
    ``minhash_lsh_pairs``) so the hash pass isn't duplicated."""
    return minhash_from_hashes(hashed_shingles(text, n), num_perm)


def minhash_signatures_exploded(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", num_perm: int = 16, n: int = 3
) -> DataFrame:
    """(id, s0..s{num_perm-1}) via the explode+aggregate plan.

    Spark evaluates higher-order-function lambdas interpreted
    (~20µs per md5 element); exploding the shingles first runs the
    md5+conv in CODEGEN'D projections (~10× faster per element) and
    computes all permutation minima as partially-aggregated ``min``s —
    the shuffle carries only (id × num_perm partial mins), so the plan
    stays hot-key-safe and cheap at any scale. Preferred when the
    signature is the output; the array form in
    ``minhash_from_hashes`` remains for per-row composition.
    Documents with no shingles get the sentinel signature.
    """
    ids = df.select(F.col(id_col).alias("id"))
    hashed = exploded_gram_hashes(df, text_col, id_col, n, distinct=False).select(
        "id", F.pmod(F.col("g"), F.lit(1 << 30)).alias("h")
    )
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(MERSENNE31))).alias(f"s{i}")
        for i, (a, b) in enumerate(_perm_params(num_perm))
    ]
    sigs = hashed.groupBy("id").agg(*aggs)
    # left join restores gram-less docs with the sentinel signature
    return ids.join(sigs, "id", "left").select(
        "id",
        *[
            F.coalesce(F.col(f"s{i}"), F.lit(MERSENNE31)).alias(f"s{i}")
            for i in range(num_perm)
        ],
    )


def build_lsh_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """``(id, sig: array<bigint>, band_key: string)`` — the banded
    MinHash LSH index, one row per (doc, band).

    This is the PERSISTENT artifact of a corpus dedup pipeline: write
    it once (bucketed by ``band_key`` so later probes are
    shuffle-free on the corpus side), append each ingest batch's rows,
    and probe it with ``incremental_lsh_pairs`` — the corpus never
    re-pairs with itself. Stages: signatures via the
    explode+aggregate plan (codegen'd md5 — see
    ``minhash_signatures_exploded`` for the interpreted-lambda cost it
    avoids), band keys = md5 of each band's signature slice (per-row
    projection), explode bands (factor ``bands``, cheap).
    """
    rows_per_band = num_perm // bands
    sig_df = minhash_signatures_exploded(df, text_col, id_col, num_perm, n)
    with_sig = sig_df.select(
        "id", F.array(*[F.col(f"s{i}") for i in range(num_perm)]).alias("sig")
    )
    band_arr = F.array(
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    F.lit(str(bi)),
                    *[
                        F.col("sig")[bi * rows_per_band + r].cast("string")
                        for r in range(rows_per_band)
                    ],
                )
            )
            for bi in range(bands)
        ]
    )
    return with_sig.withColumn("band_key", F.explode(band_arr))


def _estimated_jaccard_pairs(pairs: DataFrame, num_perm: int, threshold: float) -> DataFrame:
    """Signature-agreement score + threshold over a candidate-pair
    frame carrying ``sig_a``/``sig_b``."""
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    return (
        pairs.withColumn("est_jaccard", agree / F.lit(float(num_perm)))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def _hot_bucket_split(
    banded: DataFrame, key_col: str, max_bucket: int
) -> tuple[DataFrame, DataFrame]:
    """Split a banded/bucketed table on the per-bucket row cap.

    Returns ``(cold, hot_ids)``: ``cold`` = rows of buckets at or
    under the cap (safe for the quadratic-within-bucket self-join),
    ``hot_ids`` = distinct member ids of the oversized buckets. Hot
    buckets are overwhelmingly viral templates — thousands of
    (near-)identical documents whose every band collides — and the
    hot-key list itself is tiny (floods are rare), so it broadcasts.
    """
    sizes = banded.groupBy(key_col).agg(F.count(F.lit(1)).alias("_n"))
    # localCheckpoint (tiny, eager): referenced by both the anti and
    # the semi join below — unmaterialized, the size aggregation would
    # run per side; unlike persist() the checkpointed blocks are
    # released by the ContextCleaner when the result plan is dropped,
    # so repeated capped-LSH calls don't pin caches for the session
    hot = sizes.filter(F.col("_n") > max_bucket).select(key_col).localCheckpoint()
    cold = banded.join(F.broadcast(hot), key_col, "left_anti")
    hot_ids = (
        banded.join(F.broadcast(hot), key_col, "left_semi").select("id").distinct()
    )
    return cold, hot_ids


def _exact_fallback_pairs(
    df: DataFrame, text_col: str, id_col: str, hot_ids: DataFrame
) -> DataFrame:
    """Exact-duplicate pairs (group-min star) among hot-bucket member
    docs: the linear-cost fallback that keeps a capped LSH join from
    losing the flood itself. ``(id_a=group min, id_b, est_jaccard=1.0)``
    — identical texts have identical signatures, so the scores agree
    with what the uncapped join would have produced."""
    d = (
        df.select(
            F.col(id_col).alias("id"), F.md5(normalize(F.col(text_col))).alias("fp")
        )
        .join(hot_ids, "id", "left_semi")
    )
    m = d.groupBy("fp").agg(F.min("id").alias("id_a"))
    return (
        d.join(m, "fp")
        .filter(F.col("id") != F.col("id_a"))
        .select("id_a", F.col("id").alias("id_b"), F.lit(1.0).alias("est_jaccard"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash LSH, scored by
    signature agreement (unbiased Jaccard estimate).

    Stages: (1-3) the banded index (``build_lsh_index``) → self-join
    within band bucket (the ONLY data-sized shuffle, on the band-hash
    key; moderately hot buckets = real near-dup clusters, which AQE
    skew-split handles); (4) distinct pairs → estimated Jaccard from
    full signatures carried on both sides.

    ``max_bucket``: hot-band skew bound for web-scale corpora. One
    viral template (10k+ identical docs) floods ONE band bucket and
    makes the self-join quadratic in the flood (10k² = 10^8 pairs per
    bucket — AQE can split the task but not shrink the output).
    Buckets larger than the cap are excluded from the pair join and
    their member docs routed through the LINEAR exact-duplicate
    fallback instead (group-min star pairs at est_jaccard=1.0), so
    the flood still resolves into one cluster while join input per
    bucket stays ≤ max_bucket. Near-dup-but-not-exact members keep
    their other, non-flooded bands in the join. Pinned by
    tests/test_scaling_knobs.py on a planted 5k-copy template.
    """
    # localCheckpoint (eager): the self-join references the banded
    # table twice and would otherwise run the signature aggregation
    # once per side; checkpoint blocks are GC-released with the result
    # plan instead of pinning the cache manager for the session
    banded = build_lsh_index(df, text_col, id_col, num_perm, bands, n).localCheckpoint()
    fallback = None
    if max_bucket is not None:
        banded, hot_ids = _hot_bucket_split(banded, "band_key", max_bucket)
        fallback = _exact_fallback_pairs(df, text_col, id_col, hot_ids)
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    out = _estimated_jaccard_pairs(pairs, num_perm, threshold)
    if fallback is not None:
        # a pair can surface on both paths only when both docs are
        # exact dups sharing a non-hot band — identical texts have
        # identical signatures, so the duplicate rows are identical
        # and dropDuplicates is deterministic
        out = out.unionByName(fallback).dropDuplicates(["id_a", "id_b"])
    return out


def incremental_lsh_pairs(
    new_df: DataFrame,
    index_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    max_bucket: int | None = None,
) -> DataFrame:
    """Dedup an ingest BATCH against an existing corpus without
    re-pairing the corpus with itself.

    ``index_df`` is a previously built ``build_lsh_index`` output
    (read back from its bucketed table); ``new_df`` is the raw new
    batch (ids assumed disjoint from the corpus — enforce upstream
    with the exact-dup fingerprint check). Emits
    ``(id_a, id_b, est_jaccard, against)`` where ``id_a`` is always a
    batch doc and ``against`` says whether ``id_b`` came from the
    ``'corpus'`` or the same ``'batch'``.

    Scale story: the whole-corpus N² band self-join NEVER re-runs —
    per batch the work is (batch signatures: map-side only) + (probe
    equi-join on ``band_key``: if the index table is bucketed by
    ``band_key`` the corpus side is read pre-partitioned with no
    shuffle, and with a small batch AQE broadcasts the batch side) +
    (batch×batch self-join: quadratic only in the batch). Appending
    the batch's index rows afterwards keeps the next probe valid.

    The returned DataFrame is already materialized (eager
    ``localCheckpoint``) and owns NO persisted intermediates: this
    API runs once per ingest batch in a long-lived session, so an
    internal cache left pinned per call (the batch's banded table,
    referenced by three join sides) would accumulate without bound.
    Result size is batch-scale, not corpus-scale.

    ``max_bucket``: hot-band skew bound, the incremental counterpart
    of ``minhash_lsh_pairs``'s cap. Two hazards at web scale:
    (a) the BATCH contains a viral template — its banded self-join
    goes quadratic in the flood; capped identically (oversized batch
    buckets skip the join, members resolve through the linear
    exact-dup fallback, against='batch');
    (b) the INDEX holds a flooded bucket (years of the template
    already ingested) — every probing batch member matches the whole
    bucket, so one batch doc can emit millions of corpus pairs whose
    only information is "it's a dup". Oversized index buckets are
    trimmed to their ``max_bucket`` LOWEST-id rows (deterministic
    representatives; sort-within-bucket, shuffle-free on a
    band_key-bucketed index) — flood members are near-identical by
    construction, so matching any representative still flags the
    batch doc, and output stays ≤ max_bucket per (member, band).
    """
    new_banded = build_lsh_index(new_df, text_col, id_col, num_perm, bands, n).persist()
    if max_bucket is not None:
        capped_batch, hot_ids = _hot_bucket_split(new_banded, "band_key", max_bucket)
        batch_fallback = (
            _exact_fallback_pairs(new_df, text_col, id_col, hot_ids)
            .withColumn("against", F.lit("batch"))
        )
        wb = Window.partitionBy("band_key").orderBy("id")
        index_df = (
            index_df.withColumn("_rk", F.row_number().over(wb))
            .filter(F.col("_rk") <= max_bucket)
            .drop("_rk")
        )
    else:
        capped_batch, batch_fallback = new_banded, None
    a = new_banded.alias("a")
    # batch × corpus: sides are disjoint, so no id-order constraint
    idx = index_df.alias("b")
    vs_corpus = (
        a.join(idx, F.col("a.band_key") == F.col("b.band_key"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # batch × batch: the usual ordered self-join (over the capped
    # banded table when max_bucket is set)
    a2 = capped_batch.alias("a")
    b2 = capped_batch.alias("b")
    vs_batch = (
        a2.join(
            b2,
            (F.col("a.band_key") == F.col("b.band_key")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    out = _estimated_jaccard_pairs(vs_corpus, num_perm, threshold).withColumn(
        "against", F.lit("corpus")
    ).unionByName(
        _estimated_jaccard_pairs(vs_batch, num_perm, threshold).withColumn(
            "against", F.lit("batch")
        )
    )
    if batch_fallback is not None:
        out = out.unionByName(batch_fallback).dropDuplicates(
            ["id_a", "id_b", "against"]
        )
    out = out.localCheckpoint(eager=True)
    new_banded.unpersist()
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def token_hashes(text: Column) -> Column:
    """ARRAY<BIGINT> of 60-bit hashes of the distinct tokens — one
    md5 pass, shared by all SimHash bit-votes (same CSE rationale as
    ``hashed_shingles``)."""
    toks = F.array_distinct(F.split(normalize(text), " "))
    return F.transform(toks, lambda t: hash60(t))


def simhash_from_hashes(hashed: Column, bits: int = 32) -> Column:
    """SimHash fingerprint as BIGINT from pre-hashed tokens: bit k is
    set iff the sum over tokens of ±1 (sign of bit k of the token
    hash) is ≥ 0. Pure integer array exprs per row — no shuffle."""
    acc = F.lit(0).cast("bigint")
    for k in range(bits):
        vote = F.aggregate(
            hashed,
            F.lit(0),
            lambda a, h: a
            + F.when(F.shiftright(h, k).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                F.lit(-1)
            ),
        )
        acc = acc + F.when(vote >= 0, F.lit(1 << k).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return acc


def simhash(text: Column, bits: int = 32) -> Column:
    """Convenience composition; prefer materializing ``token_hashes``
    in its own projection first (see ``simhash_pairs``)."""
    return simhash_from_hashes(token_hashes(text), bits)


def hamming64(x: Column, y: Column) -> Column:
    """Hamming distance between two BIGINT fingerprints via
    bit_count(xor) — single codegen'd expression."""
    return F.bit_count(x.bitwiseXOR(y))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash: LSH on ``max_hamming + 1`` bit blocks
    (Manku et al.'s pigeonhole — d differing bits spread over b blocks
    leave at least one block untouched iff d < b), verified by full
    Hamming distance. Shuffle only on block-keys.

    ``max_bucket``: the same hot-bucket skew bound as
    ``minhash_lsh_pairs`` — a viral template floods every one of its
    bit-block buckets; oversized buckets skip the quadratic join and
    their members resolve through the linear exact-duplicate fallback
    (hamming=0 pairs to the group min)."""
    th = df.select(F.col(id_col).alias("id"), token_hashes(F.col(text_col)).alias("th"))
    # localCheckpoint (eager): the block-key self-join references this
    # twice; the simhash bit-votes are the expensive
    # (interpreted-lambda) stage. GC-released, not session-pinned.
    sh = th.select(
        "id", simhash_from_hashes(F.col("th"), bits).alias("sh")
    ).localCheckpoint()
    n_blocks = max_hamming + 1
    base, extra = divmod(bits, n_blocks)
    chunk_keys, off = [], 0
    for j in range(n_blocks):
        width = base + (1 if j < extra else 0)
        mask = (1 << width) - 1
        chunk_keys.append(
            F.concat(
                F.lit(f"c{j}_"),
                F.shiftright(sh.sh, off).bitwiseAND(F.lit(mask)).cast("string"),
            )
        )
        off += width
    chunked = sh.withColumn("chunk", F.explode(F.array(*chunk_keys)))
    fallback = None
    if max_bucket is not None:
        chunked, hot_ids = _hot_bucket_split(chunked, "chunk", max_bucket)
        fallback = (
            _exact_fallback_pairs(df, text_col, id_col, hot_ids)
            .select(
                "id_a",
                "id_b",
                F.lit(0).cast("integer").alias("hamming"),
            )
        )
    a = chunked.alias("a")
    b = chunked.alias("b")
    out = (
        a.join(b, (F.col("a.chunk") == F.col("b.chunk")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming64(F.col("a.sh"), F.col("b.sh")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
    if fallback is not None:
        out = out.unionByName(fallback).dropDuplicates(["id_a", "id_b"])
    return out


# ---------------------------------------------------------------------------
# Duplicate-cluster resolution (connected components over candidate pairs)
# ---------------------------------------------------------------------------


# rounds the most recent connected_components call took to converge
# (observable for tests/benchmarks; not part of the public contract)
LAST_CC_ROUNDS: int = 0


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 50,
    algorithm: str = "star",
) -> DataFrame:
    """Resolve near-dup candidate PAIRS into duplicate CLUSTERS — the
    last stage of a dedup pipeline (pick one canonical doc per group;
    the reference stops at per-row verdicts, this is the corpus-level
    counterpart a training-data pipeline needs).

    ``algorithm="star"`` (default): alternating large-star /
    small-star (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SOCC'14 — public algorithm). Each round rewires
    every node's larger neighbors to its neighborhood minimum
    (large-star), then collapses each node's smaller neighbors onto
    that minimum (small-star); component depth roughly halves per
    round, so convergence is O(log diameter) rounds — a planted
    64-deep path cluster converges in ~8 rounds where label
    propagation needs 64 (pinned in tests/test_corpus_ops.py). Each
    round is two groupBy-min shuffles + the set-equality convergence
    probe over the CURRENT edge set (which only shrinks toward star
    edges), with ``localCheckpoint`` truncating per-round lineage.

    ``algorithm="label"``: min-label propagation to a fixpoint —
    every node starts labeled with itself; each round takes
    ``min(label, min over neighbors)`` until no label changes. Rounds
    = component diameter, each round two shuffles over the label
    table. Kept as the small-N path: for the shallow, near-clique
    clusters real dup groups form, its per-round plan is lighter.

    Both are deterministic (the fixpoint is the component-wise min id
    regardless of execution order) and REFUSE on non-convergence
    rather than returning silently split components. Rows = nodes
    that appear in ANY pair — for dedup the near-dup subset,
    typically ≪ corpus. The rounds taken by the last call are left
    in ``LAST_CC_ROUNDS``.

    Output: one row per paired node —
    (``src_col`` = node id, cluster = min id in its component,
    cluster_size = #nodes in the component).
    """
    if algorithm == "star":
        return _star_components(pairs, src_col, dst_col, max_iter)
    if algorithm != "label":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    return _label_components(pairs, src_col, dst_col, max_iter)


def _star_components(
    pairs: DataFrame, src_col: str, dst_col: str, max_iter: int
) -> DataFrame:
    """Alternating large-star/small-star (see connected_components)."""
    global LAST_CC_ROUNDS
    spark = pairs.sparkSession
    raw = pairs.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    # singleton self-pairs carry no connectivity but must still appear
    # in the output (cluster of themselves) — same contract as the
    # label path, whose label table includes them
    nodes = (
        raw.select(F.col("u").alias("node"))
        .union(raw.select(F.col("v").alias("node")))
        .distinct()
        .persist()
    )
    edges = raw.filter(F.col("u") != F.col("v")).distinct().localCheckpoint()
    n_edges = edges.count()
    converged = n_edges == 0
    rounds = 0
    while not converged and rounds < max_iter:
        sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        # large-star: every neighbor v > u rewires to m = min(Γ⁺(u));
        # each undirected edge is processed once, from its smaller
        # endpoint, so the edge count never grows
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least(F.col("u"), F.col("mn")).alias("m"))
        )
        # persisted: mins2 and the ss join BOTH reference ls, and
        # Spark does not CSE self-referenced plans — unpersisted, the
        # whole large-star shuffle+distinct would execute twice per
        # round (the edge set is data-sized here, not tiny)
        ls = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
            .persist()
        )
        # small-star: ls edges are all (larger → smaller) already;
        # collapse each node's smaller neighbors (and itself) onto its
        # minimum neighbor
        mins2 = ls.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            ls.join(mins2, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins2.select(F.col("u"), F.col("m").alias("v")))
            .distinct()
            .localCheckpoint()  # eager: safe to release ls right after
        )
        ls.unpersist()
        rounds += 1
        n_new = ss.count()
        converged = n_new == n_edges and ss.subtract(edges).count() == 0
        edges, n_edges = ss, n_new
    LAST_CC_ROUNDS = rounds
    if not converged:
        nodes.unpersist()
        raise RuntimeError(
            f"connected_components(star) did not converge in {max_iter} "
            "rounds — raise max_iter (expected rounds ≈ log2(component "
            "diameter) + 1)"
        )
    # at the fixpoint every non-min node points straight at its
    # component min; min nodes never appear on the left side
    labels = (
        nodes.join(
            edges.groupBy("u").agg(F.min("v").alias("mlab")),
            nodes["node"] == F.col("u"),
            "left",
        )
        .select("node", F.coalesce(F.col("mlab"), F.col("node")).alias("lab"))
    )
    sizes = labels.groupBy("lab").agg(F.count("*").alias("cluster_size"))
    out = labels.join(sizes, "lab").select(
        F.col("node").alias(src_col),
        F.col("lab").alias("cluster"),
        F.col("cluster_size").cast("int").alias("cluster_size"),
    )
    # materialize before releasing the node set the plan references
    out = out.localCheckpoint()
    nodes.unpersist()
    return out


def _label_components(
    pairs: DataFrame, src_col: str, dst_col: str, max_iter: int
) -> DataFrame:
    """Min-label propagation fixpoint (see connected_components)."""
    global LAST_CC_ROUNDS
    fwd = pairs.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    edges = fwd.union(
        fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()
    # round 0 folded in: label = min(self, direct neighbors)
    labels = (
        edges.groupBy("u")
        .agg(F.min("v").alias("m"))
        .select(F.col("u").alias("node"), F.least("u", "m").alias("lab"))
        .localCheckpoint()
    )
    for rounds in range(1, max_iter + 1):
        msgs = (
            edges.join(labels, edges["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("lab").alias("mlab"))
        )
        upd = (
            labels.alias("L")
            .join(msgs.alias("M"), F.col("L.node") == F.col("M.u"), "left")
            .select(
                F.col("L.node").alias("node"),
                F.least(
                    F.col("L.lab"), F.coalesce(F.col("M.mlab"), F.col("L.lab"))
                ).alias("lab"),
            )
            .localCheckpoint()
        )
        changed = (
            upd.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.lab") != F.col("o.lab"))
            .count()
        )
        labels = upd
        if changed == 0:
            LAST_CC_ROUNDS = rounds
            break
    else:
        # exhausting max_iter with labels still moving would return
        # silently WRONG clusters (split components, wrong min-ids) —
        # refuse instead; the caller can raise max_iter or switch to a
        # large-star/small-star formulation for path-shaped graphs
        edges.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); component diameter exceeds "
            "max_iter — raise it or use algorithm='star' (O(log n) rounds)"
        )
    edges.unpersist()
    sizes = labels.groupBy("lab").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "lab").select(
        F.col("node").alias(src_col),
        F.col("lab").alias("cluster"),
        F.col("cluster_size").cast("int").alias("cluster_size"),
    )
