"""Tests for the training-data pipeline operators (text / dedup /
similarity) on constructed fixtures with known duplicates — the
inject-then-detect pattern of the reference tests
(``/root/reference/tests/test_statistical.py:15-17``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.operators import curation, dedup, similarity, text

DOCS = [
    # (doc_id, text) — 0/1 identical, 2 near-dup of 0, 3/4 distinct
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "The quick brown fox jumps over the lazy dog near the river bank!"),
    (2, "the quick brown fox jumps over the lazy dog near the river shore"),
    (3, "completely different content about spark shuffle partitions and joins"),
    (4, "der hund und die katze sind ein gutes team mit den besten"),
    (5, "a b"),  # shorter than one trigram
    (6, ""),  # empty text edge
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup_flags_normalized_duplicates(docs_df):
    out = dedup.exact_duplicates(docs_df).orderBy("doc_id").collect()
    by_id = {r.doc_id: r for r in out}
    # doc 1 differs only in case/punct → same normalized fingerprint
    assert by_id[0].fingerprint == by_id[1].fingerprint
    assert by_id[0].group_size == 2 and by_id[1].group_size == 2
    assert by_id[0].is_duplicate == 0 and by_id[1].is_duplicate == 1  # keeper = min id
    assert by_id[2].group_size == 1 and by_id[2].is_duplicate == 0


def test_shingles_short_and_empty_texts(docs_df):
    out = docs_df.select(
        "doc_id", F.size(dedup.shingles(F.col("text"), 3)).alias("n")
    ).collect()
    n = {r.doc_id: r.n for r in out}
    assert n[5] == 0 and n[6] == 0  # no crash, empty shingle sets
    assert n[0] > 5


def test_ngram_jaccard_finds_near_dup_pair(docs_df):
    pairs = dedup.ngram_jaccard_pairs(docs_df, threshold=0.3).collect()
    keys = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert keys[(0, 1)] == 1.0  # identical after normalization
    assert (0, 2) in keys and 0.5 < keys[(0, 2)] < 1.0  # one word changed
    assert all(3 not in p and 4 not in p for p in keys)


def test_minhash_signature_properties(docs_df):
    rows = docs_df.select(
        "doc_id", dedup.minhash_signature(F.col("text"), 16, 3).alias("sig")
    ).collect()
    sig = {r.doc_id: r.sig for r in rows}
    assert sig[0] == sig[1]  # identical shingle sets → identical signature
    agree02 = sum(a == b for a, b in zip(sig[0], sig[2]))
    agree03 = sum(a == b for a, b in zip(sig[0], sig[3]))
    assert agree02 > agree03  # near-dup agrees more than unrelated
    assert sig[6] == [dedup.MERSENNE31] * 16  # empty set → sentinel


def test_minhash_lsh_pairs_detects_dups(docs_df):
    pairs = dedup.minhash_lsh_pairs(docs_df, threshold=0.5).collect()
    got = {(r.id_a, r.id_b): r.est_jaccard for r in pairs}
    assert got[(0, 1)] == 1.0
    assert (0, 3) not in got


def test_incremental_lsh_matches_full_run(docs_df):
    """batch-vs-index probe + batch self-join + corpus self-join must
    reconstruct exactly the pair set of the one-shot full run."""
    batch_ids = {1, 2}
    batch = docs_df.filter(F.col("doc_id").isin(list(batch_ids)))
    corpus = docs_df.filter(~F.col("doc_id").isin(list(batch_ids)))
    index = dedup.build_lsh_index(corpus)
    incr = dedup.incremental_lsh_pairs(batch, index, threshold=0.5).collect()
    # labels: id_a always from the batch; 'corpus' rows point outside it
    for r in incr:
        assert r.id_a in batch_ids
        assert (r.id_b in batch_ids) == (r.against == "batch")
    corpus_self = dedup.minhash_lsh_pairs(corpus, threshold=0.5).collect()
    full = dedup.minhash_lsh_pairs(docs_df, threshold=0.5).collect()
    norm = lambda rows: {(frozenset((r.id_a, r.id_b)), r.est_jaccard) for r in rows}
    assert norm(incr) | norm(corpus_self) == norm(full)
    # the known near-dup cluster straddles the split: 0 in corpus, 1/2 in batch
    got = {(r.id_a, r.id_b): r.against for r in incr}
    assert got[(1, 0)] == "corpus"
    assert got[(1, 2)] == "batch" or got[(2, 1)] == "batch"


def test_incremental_lsh_empty_batch(docs_df):
    empty = docs_df.filter(F.lit(False))
    index = dedup.build_lsh_index(docs_df)
    assert dedup.incremental_lsh_pairs(empty, index).count() == 0


def test_simhash_hamming(docs_df):
    rows = docs_df.select(
        "doc_id", dedup.simhash(F.col("text"), 32).alias("sh")
    ).collect()
    sh = {r.doc_id: r.sh for r in rows}
    assert sh[0] == sh[1]
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(sh[0], sh[2]) <= ham(sh[0], sh[3])
    assert 0 <= sh[0] < (1 << 32)


def test_simhash_pairs(docs_df):
    pairs = dedup.simhash_pairs(docs_df, max_hamming=3).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert got[(0, 1)] == 0


def test_text_quality_features(docs_df):
    out = text.quality_features(docs_df).orderBy("doc_id").collect()
    r0, r5, r6 = out[0], out[5], out[6]
    assert r0.n_tokens == 13
    assert r6.n_tokens == 0 and r6.quality_score <= 0.4
    assert 0.0 <= r0.quality_score <= 1.0
    assert r0.stopword_ratio > 0  # 'the' appears
    assert r5.n_tokens == 2
    # punctuation in doc 1 but not doc 0
    assert out[1].punct_ratio > 0 and r0.punct_ratio == 0.0


def test_bpe_token_count(spark):
    df = spark.createDataFrame([(0, "Hello, world! It's 42.")], "id long, text string")
    n = df.select(text.bpe_token_count(F.col("text")).alias("n")).first().n
    # Hello , world ! It ' s 42 .  → 9
    assert n == 9


def test_lang_id_heuristic(docs_df):
    out = text.add_lang_id(docs_df).collect()
    pred = {r.doc_id: r.pred_lang for r in out}
    assert pred[0] == "en"  # 'the', 'over' hits
    assert pred[4] == "de"  # German stopwords
    assert pred[6] == "und"  # empty → undetermined


@pytest.fixture(scope="module")
def emb_df(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=64)
    rows = []
    for i in range(20):
        v = rng.normal(size=64)
        rows.append((i, [float(x) for x in v]))
    # 100/101: near-duplicates of each other
    dup = rng.normal(size=64)
    rows.append((100, [float(x) for x in dup]))
    rows.append((101, [float(x) for x in dup + rng.normal(scale=0.01, size=64)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk(emb_df):
    q = emb_df.filter(F.col("vec_id") == 100)
    out = similarity.brute_force_topk(emb_df, q, k=3).collect()
    assert len(out) == 3
    assert out[0].neighbor_id == 101 and out[0].cosine_sim > 0.99
    assert out[0].rank == 1
    # ranks are 1..k and scores non-increasing
    sims = [r.cosine_sim for r in sorted(out, key=lambda r: r.rank)]
    assert sims == sorted(sims, reverse=True)


def test_lsh_topk_finds_near_dup_in_same_bucket(emb_df):
    q = emb_df.filter(F.col("vec_id") == 100)
    out = similarity.lsh_topk(emb_df, q, k=3, n_planes=4, dim=64).collect()
    # near-identical vectors agree on every hyperplane sign
    assert out and out[0].neighbor_id == 101


def test_embedding_near_dup_pairs(emb_df):
    out = similarity.embedding_near_dup_pairs(emb_df, min_cosine=0.95, dim=64).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(100, 101)]


def test_srp_bucket_range(emb_df):
    planes = similarity.plane_signs(4, 64)
    buckets = emb_df.select(
        similarity.srp_bucket(F.col("embedding"), planes).alias("b")
    ).collect()
    assert all(0 <= r.b < 16 for r in buckets)


def test_winnowing_fingerprints(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    docs = [
        (0, base),
        (1, base),  # identical
        (2, "PREFIX INSERTED HERE " + base),  # shifted copy
        (3, "completely unrelated content with different words entirely here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = text.winnow_fingerprints(df, k=8, w=4).collect()
    fps = {}
    for r in out:
        fps.setdefault(r.id, set()).add(r.fp)
    # identical docs → identical fingerprint sets (positions included)
    d0 = {(r.pos, r.fp) for r in out if r.id == 0}
    d1 = {(r.pos, r.fp) for r in out if r.id == 1}
    assert d0 == d1 and len(d0) > 3
    # winnowing guarantee: the shifted copy shares most hash VALUES
    overlap = len(fps[0] & fps[2]) / len(fps[0])
    assert overlap > 0.7
    # unrelated doc shares (almost) nothing
    assert len(fps[0] & fps[3]) <= 1


def test_winnowing_short_and_empty(spark):
    df = spark.createDataFrame([(0, "tiny"), (1, "")], "doc_id long, text string")
    out = text.winnow_fingerprints(df, k=8, w=4).collect()
    assert out == []  # both below k chars → no fingerprints, no crash


def test_pack_documents_layout_stream(spark):
    """Packing must lay the docs out as ONE contiguous token stream in
    (hash60(id), id) order, with chunk fields derived exactly."""
    docs = [(i, " ".join(f"w{j}" for j in range(3 + 5 * (i % 4)))) for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = curation.pack_documents(df, budget=7, n_buckets=4).collect()
    rows = sorted(out, key=lambda r: r.start_offset)
    # contiguity: each doc starts where the previous ended
    pos = 0
    for r in rows:
        assert r.start_offset == pos
        assert r.chunk_id == pos // 7
        assert r.offset_in_chunk == pos % 7
        last = max(pos + r.n_tokens - 1, pos)
        assert r.n_chunks == last // 7 - pos // 7 + 1
        pos += r.n_tokens
    # the order is the deterministic hash order, not ingestion order
    hashed = df.select(
        "doc_id", text.hash60(F.col("doc_id").cast("string")).alias("h")
    ).collect()
    expect = [r.doc_id for r in sorted(hashed, key=lambda r: (r.h, r.doc_id))]
    assert [r.doc_id for r in rows] == expect


def test_pack_documents_layout_independent(spark):
    docs = [(i, "a b c d e f g"[: 3 + 2 * (i % 5)]) for i in range(30)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = {r.doc_id: r for r in curation.pack_documents(df, budget=5).collect()}
    b = {
        r.doc_id: r
        for r in curation.pack_documents(
            df.repartition(7), budget=5, n_buckets=2
        ).collect()
    }
    assert a == b


def test_pack_documents_exact_past_double_precision(spark):
    """The 'exact at any corpus size' claim: offsets beyond 2^53
    (where double-based floor() loses integers) must stay exact —
    the op uses integer `div`, never float division."""
    rows = [(i, (1 << 51) + i) for i in range(8)]  # ~2.2e15 tokens each
    df = spark.createDataFrame(rows, "doc_id long, ntok long")
    out = {
        r.doc_id: r
        for r in curation.pack_documents(
            df, budget=1000, token_col="ntok", n_buckets=2
        ).collect()
    }
    hashed = df.select(
        "doc_id", text.hash60(F.col("doc_id").cast("string")).alias("h")
    ).collect()
    order = [r.doc_id for r in sorted(hashed, key=lambda r: (r.h, r.doc_id))]
    pos = 0
    for did in order:
        r = out[did]
        assert r.start_offset == pos  # exact int equality at ~1e16 scale
        assert r.chunk_id == pos // 1000
        assert r.offset_in_chunk == pos % 1000
        pos += (1 << 51) + did


def test_chunk_assignments_tile_every_chunk_exactly(spark):
    """Slices must tile the token stream: per doc they cover
    [0, n_tokens) contiguously; per chunk the offsets+lengths tile
    [0, budget) (last chunk possibly short) with no overlap."""
    docs = [(i, " ".join(f"w{j}" for j in range(1 + 4 * (i % 6)))) for i in range(50)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    packed = curation.pack_documents(df, budget=9)
    rows = curation.chunk_assignments(packed, budget=9).collect()
    by_doc: dict = {}
    by_chunk: dict = {}
    for r in rows:
        assert 0 < r.tok_len <= 9 and 0 <= r.chunk_offset < 9
        by_doc.setdefault(r.doc_id, []).append((r.tok_from, r.tok_len))
        by_chunk.setdefault(r.chunk_id, []).append((r.chunk_offset, r.tok_len))
    toks = {r.doc_id: r.n_tokens for r in packed.collect()}
    for did, slices in by_doc.items():
        slices.sort()
        pos = 0
        for frm, ln in slices:
            assert frm == pos
            pos += ln
        assert pos == toks[did]
    total = sum(toks.values())
    for cid, slices in sorted(by_chunk.items()):
        slices.sort()
        pos = 0
        for off, ln in slices:
            assert off == pos
            pos += ln
        full = (cid + 1) * 9 <= total
        assert pos == (9 if full else total - cid * 9)


def test_stratified_sample_deterministic_and_rated(spark):
    rows = [(i, "en" if i % 3 else "de") for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = curation.stratified_sample(df, "lang", {"en": 0.5, "de": 0.0}, salt="t")
    ids = {r.doc_id for r in kept.collect()}
    # zero-rate stratum fully dropped; nonzero near its rate
    assert all(i % 3 for i in ids)
    assert 0.4 < len(ids) / 2000 < 0.6
    # layout-independent and rerun-stable (same hash, same set)
    ids2 = {
        r.doc_id
        for r in curation.stratified_sample(
            df.repartition(11), "lang", {"en": 0.5, "de": 0.0}, salt="t"
        ).collect()
    }
    assert ids == ids2
    # a different salt draws an (almost surely) different set
    ids3 = {
        r.doc_id
        for r in curation.stratified_sample(
            df, "lang", {"en": 0.5, "de": 0.0}, salt="u"
        ).collect()
    }
    assert ids != ids3


def test_stratified_sample_rejects_bad_fraction(spark):
    df = spark.range(1).withColumnRenamed("id", "doc_id").withColumn("lang", F.lit("en"))
    with pytest.raises(ValueError):
        curation.stratified_sample(df, "lang", {"en": 1.5})
    with pytest.raises(ValueError):
        curation.pack_documents(df.withColumn("text", F.lit("a")), budget=0)


def test_connected_components_resolves_clusters(spark):
    """Pairs → clusters: a 4-node path (forces >1 propagation round —
    min label must travel the diameter), a 2-node pair, and an
    isolated pair; singletons (no pairs) never appear."""
    pairs = spark.createDataFrame(
        [
            ("d", "c"),  # path d-c-b-a: diameter 3
            ("c", "b"),
            ("b", "a"),
            ("x", "y"),
            ("m", "n"),
        ],
        "id_a string, id_b string",
    )
    out = dedup.connected_components(pairs).collect()
    got = {r.id_a: (r.cluster, r.cluster_size) for r in out}
    assert got == {
        "a": ("a", 4),
        "b": ("a", 4),
        "c": ("a", 4),
        "d": ("a", 4),
        "x": ("x", 2),
        "y": ("x", 2),
        "m": ("m", 2),
        "n": ("m", 2),
    }


def test_connected_components_empty_pairs(spark):
    pairs = spark.createDataFrame([], "id_a string, id_b string")
    assert dedup.connected_components(pairs).collect() == []


def test_connected_components_nonconvergence_raises(spark):
    """Exhausting max_iter with labels still moving must raise, not
    return silently split clusters — on BOTH algorithms."""
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
        "id_a string, id_b string",
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(pairs, max_iter=1)
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(pairs, max_iter=1, algorithm="label")


def test_connected_components_deep_path_logarithmic_rounds(spark):
    """The adversarial 100-TB shape: a 64-deep path-shaped cluster
    (chained templated spam). Large-star/small-star alternation must
    converge in O(log diameter) rounds — ≤12 here vs the 64 label
    propagation needs — and still produce the exact component."""
    pairs = spark.range(0, 63).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    out = dedup.connected_components(pairs, max_iter=14).collect()
    assert dedup.LAST_CC_ROUNDS <= 12
    assert {r.id_a for r in out} == set(range(64))
    assert {r.cluster for r in out} == {0}
    assert {r.cluster_size for r in out} == {64}
    # label propagation needs diameter rounds on the same input —
    # the documented reason it is the small-N path only
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(pairs, max_iter=14, algorithm="label")


def test_connected_components_algorithms_agree(spark):
    """star and label must produce identical clusters on a mixed
    graph (two merged star-shapes, a triangle, self-pairs)."""
    pairs = spark.createDataFrame(
        [
            (10, 1), (10, 2), (10, 3),   # star around 10
            (20, 4), (20, 5),            # star around 20
            (3, 4),                      # bridge merges them
            (30, 31), (31, 32), (30, 32),  # triangle
            (40, 40),                    # self-pair singleton
        ],
        "id_a long, id_b long",
    )
    star = {
        r.id_a: (r.cluster, r.cluster_size)
        for r in dedup.connected_components(pairs, algorithm="star").collect()
    }
    label = {
        r.id_a: (r.cluster, r.cluster_size)
        for r in dedup.connected_components(pairs, algorithm="label").collect()
    }
    assert star == label
    assert star[40] == (40, 1)
    assert star[10] == (1, 7) and star[20] == (1, 7)
    assert star[30] == (30, 3)
