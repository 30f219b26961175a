"""Round-3 scale-parameterization tests.

1. SRP-LSH auto plane sizing: with ``n_planes=None`` the candidate
   work per row must stay ~constant as N grows 10× (with a FIXED
   plane count it grows ~10× — the round-2 audit's residual
   quadratic).
2. ``_collect_sample``: ONE scan (no count() pre-pass) and
   layout-independent (identical sample under repartitioning).
3. ``sliding_buffer_scores``: ttl_eviction requires a watermark.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.operators import similarity as sim

DIM = 8


def _emb(spark, n: int):
    """Deterministic pseudo-random centered vectors (layout-free)."""
    frac = lambda c: c - F.floor(c)  # noqa: E731
    cols = [
        (frac(F.sin(F.col("id") * (12.9898 + 7.77 * d)) * 43758.5453) * 2 - 1)
        .cast("double")
        for d in range(DIM)
    ]
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(*cols).alias("embedding")
    )


def _avg_candidates(spark, n: int, n_planes: int) -> float:
    """E[|bucket of a random row|] = Σ b_i² / N — the per-row
    candidate count of the within-bucket self-join, from the bucket
    histogram alone (no pair join needed)."""
    planes = sim.plane_signs(n_planes, DIM)
    counts = (
        _emb(spark, n)
        .select(sim.srp_bucket(F.col("embedding"), planes).alias("b"))
        .groupBy("b")
        .count()
    )
    row = counts.agg(
        F.sum(F.col("count") * F.col("count")).alias("ss"),
        F.sum("count").alias("n"),
    ).first()
    return row["ss"] / row["n"]


def test_auto_n_planes_formula():
    assert sim.auto_n_planes(100, target_bucket_rows=256) == 2  # min clamp
    assert sim.auto_n_planes(256 * 16, target_bucket_rows=256) == 4
    assert sim.auto_n_planes(10**12, target_bucket_rows=256) == 24  # max clamp
    # monotone in N
    prev = 0
    for n in (10**3, 10**5, 10**7, 10**9):
        cur = sim.auto_n_planes(n, target_bucket_rows=256)
        assert cur >= prev
        prev = cur


def test_auto_planes_keep_candidate_work_linear(spark):
    n_small, n_big = 2_000, 20_000
    target = 64
    a = _avg_candidates(spark, n_small, sim.auto_n_planes(n_small, target))
    b = _avg_candidates(spark, n_big, sim.auto_n_planes(n_big, target))
    # fixed planes would give b ≈ 10a; auto keeps per-row candidate
    # work bounded (pair work ~linear in N). 4× margin absorbs real
    # bucket imbalance.
    assert b < 4 * a
    # and the fixed-plane counterfactual really is ~10×, so the test
    # is measuring the thing it claims to measure
    fixed = sim.auto_n_planes(n_small, target)
    b_fixed = _avg_candidates(spark, n_big, fixed)
    assert b_fixed > 5 * a


def test_lsh_topk_auto_planes_end_to_end(spark):
    """Default (auto) plane count still finds the planted near-dup."""
    base = _emb(spark, 500)
    dup = base.filter(F.col("vec_id") == 7).select(
        F.lit(9999).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.0001).alias("embedding"),
    )
    corpus = base.unionByName(dup)
    q = corpus.filter(F.col("vec_id") == 9999)
    out = sim.lsh_topk(corpus, q, k=3, dim=DIM).collect()
    assert out and out[0].neighbor_id == 7


def test_collect_sample_no_count_and_layout_independent(spark, monkeypatch):
    from pyspark.sql import DataFrame

    from anomaly_detection_toolkit_spark.operators.ml import _collect_sample

    rng = np.random.default_rng(3)
    rows = [(float(a), float(b)) for a, b in rng.standard_normal((300, 2))]
    df = spark.createDataFrame(rows, "f0 double, f1 double")

    def _boom(self):  # pragma: no cover - fails the test if called
        raise AssertionError("count() must not run inside _collect_sample")

    monkeypatch.setattr(DataFrame, "count", _boom)
    x1 = _collect_sample(df, ["f0", "f1"], max_rows=100, seed=1)
    x2 = _collect_sample(df.repartition(7), ["f0", "f1"], max_rows=100, seed=1)
    monkeypatch.undo()
    assert x1.shape == (100, 2)
    # value-derived priorities → identical sample under any layout
    assert np.array_equal(np.sort(x1, axis=0), np.sort(x2, axis=0))
    # different seed → different sample (the salt is live)
    x3 = _collect_sample(df, ["f0", "f1"], max_rows=100, seed=2)
    assert not np.array_equal(np.sort(x1, axis=0), np.sort(x3, axis=0))


def test_ttl_eviction_requires_watermark(spark):
    from anomaly_detection_toolkit_spark.streaming.ingestion import (
        sliding_buffer_scores,
    )

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .select(
            F.lit("a").alias("asset_id"),
            F.col("timestamp").cast("double").alias("ts"),
            F.col("value").cast("double").alias("value"),
        )
    )
    with pytest.raises(ValueError, match="watermark_delay"):
        sliding_buffer_scores(stream, ttl_eviction=True)


def test_multi_table_lsh_recovers_recall(spark):
    """High plane counts split true neighborhoods across bucket
    boundaries; unioning T independent tables must recover top-1
    recall vs brute force (p_miss -> p_miss^T)."""
    corpus = _emb(spark, 1000)
    queries = corpus.filter(F.col("vec_id") < 60)
    truth = {
        r.query_id: r.neighbor_id
        for r in sim.brute_force_topk(corpus, queries, k=1).collect()
    }

    def recall(n_tables):
        got = {
            r.query_id: r.neighbor_id
            for r in sim.lsh_topk(
                corpus, queries, k=1, n_planes=6, dim=DIM, n_tables=n_tables
            ).collect()
        }
        return sum(got.get(q) == n for q, n in truth.items()) / len(truth)

    r1, r4 = recall(1), recall(4)
    assert r1 < 1.0  # single-table misses exist, so the test is live
    assert r4 > r1
    assert r4 >= 0.8


def test_multi_table_near_dup_and_lof_consistent(spark):
    """n_tables > 1 must be a superset-recall, duplicate-free change:
    near-dup pairs with T=3 contain the T=1 pairs exactly once, and
    approx_lof with T=2 still returns one row per vector."""
    from anomaly_detection_toolkit_spark.operators.lof import approx_lof

    df = _emb(spark, 400)
    p1 = {(r.id_a, r.id_b) for r in
          sim.embedding_near_dup_pairs(df, min_cosine=0.9, n_planes=5, dim=DIM).collect()}
    rows3 = sim.embedding_near_dup_pairs(
        df, min_cosine=0.9, n_planes=5, dim=DIM, n_tables=3
    ).collect()
    p3 = [(r.id_a, r.id_b) for r in rows3]
    assert len(p3) == len(set(p3))  # deduped
    assert p1 <= set(p3)  # superset recall

    out = approx_lof(df, k=5, n_planes=4, dim=DIM, n_tables=2)
    assert out.count() == 400
    assert out.select("id").distinct().count() == 400


def test_collect_sample_plans_as_take_ordered(spark):
    """The bounded sample must compile to TakeOrderedAndProject
    (per-partition top-k + bounded merge), not a global Sort+Exchange
    — the plan that makes one-scan sampling safe at 10^12 rows."""
    from pyspark.sql import functions as F

    df = spark.range(10_000).select(
        (F.col("id") * 1.0).alias("f0"), (F.col("id") * 2.0).alias("f1")
    )
    prio = F.conv(
        F.substring(
            F.md5(F.concat_ws(",", F.lit("1"), F.col("f0").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    q = df.select("f0", "f1", prio.alias("_p")).orderBy("_p").limit(100).drop("_p")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_ivf_topk_recall_and_determinism(spark):
    """IVF probe recall vs exact brute force (top-1 must survive
    probing most of the time), and the RNG-free k-means fit must be
    layout-independent — the property the driver-gate oracle's
    out-of-Spark replay relies on."""
    emb = _emb(spark, 600)
    queries = emb.filter(F.col("vec_id") < 10)
    brute = sim.brute_force_topk(emb, queries, k=1).collect()
    ivf = sim.ivf_topk(
        emb, queries, k=1, n_cells=8, n_probe=3, seed=42
    ).collect()
    top_b = {r.query_id: r.neighbor_id for r in brute}
    top_i = {r.query_id: r.neighbor_id for r in ivf}
    hits = sum(1 for q in top_b if top_i.get(q) == top_b[q])
    assert hits >= 7  # recall ≥ 0.7 at 3/8 cells probed

    x1 = sim.collect_vector_sample(emb, "vec_id", "embedding", 10_000, 42)
    x2 = sim.collect_vector_sample(
        emb.repartition(13), "vec_id", "embedding", 10_000, 42
    )
    assert np.array_equal(x1, x2)
    c1 = sim.fit_kmeans_arrays(x1, 8)
    c2 = sim.fit_kmeans_arrays(x2, 8)
    assert np.array_equal(c1, c2)


def _template_docs(spark, n_total: int, n_copies: int):
    """n_copies identical viral-template docs + unique-text fillers."""
    return spark.range(n_total).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < n_copies,
            F.lit("breaking viral template text shared by every copy of this spam page"),
        )
        .otherwise(
            # fillers must be far from EACH OTHER too (simhash pairs
            # on near-identical fillers would be real near-dups, not
            # a residue): 8 of 9 tokens are id-derived and unique
            F.concat_ws(
                " ",
                F.lit("doc"),
                *[
                    F.concat(
                        F.lit(f"w{j}x"),
                        (F.col("id") * (7919 + 13 * j) + j * j).cast("string"),
                    )
                    for j in range(8)
                ],
            )
        )
        .alias("text"),
    )


def test_lsh_hot_band_cap_bounds_join_and_keeps_flood(spark):
    """Hot-band skew bound (round-4 judge ask #3): 5k identical docs
    flood every band bucket they touch; with max_bucket the pair join
    input is bounded and the output is LINEAR in the flood (group-min
    star), not quadratic — while the flood still resolves into one
    cluster and normal near-dup behavior is unchanged."""
    from anomaly_detection_toolkit_spark.operators import dedup

    n_copies, n_total = 5_000, 6_000
    docs = _template_docs(spark, n_total, n_copies).persist()

    # the banded index really is flooded: the template's band buckets
    # hold all 5k copies (uncapped join input would be ~25M pairs/band)
    banded = dedup.build_lsh_index(docs, num_perm=16, bands=4)
    hot = (
        banded.groupBy("band_key")
        .count()
        .filter(F.col("count") > 64)
        .count()
    )
    assert hot >= 1

    pairs = dedup.minhash_lsh_pairs(
        docs, num_perm=16, bands=4, threshold=0.5, max_bucket=64
    ).persist()
    n_pairs = pairs.count()
    # linear, not quadratic: the flood contributes exactly
    # n_copies - 1 star pairs (quadratic would be ~12.5M)
    flood = pairs.filter(F.col("id_b") < n_copies)
    assert flood.count() == n_copies - 1
    assert flood.agg(F.min("est_jaccard")).first()[0] == 1.0
    assert n_pairs < n_copies + 500  # no quadratic residue anywhere

    # the flood is ONE cluster with the group-min representative
    cc = dedup.connected_components(pairs.select("id_a", "id_b"))
    flood_cc = cc.filter(F.col("id_a") < n_copies)
    assert flood_cc.agg(F.count_distinct("cluster")).first()[0] == 1
    assert flood_cc.agg(F.min("cluster")).first()[0] == 0
    assert flood_cc.agg(F.max("cluster_size")).first()[0] == n_copies
    pairs.unpersist()

    # simhash path: same fixture, same bound
    sp = dedup.simhash_pairs(docs, max_hamming=3, max_bucket=64).persist()
    sp_flood = sp.filter(F.col("id_b") < n_copies)
    assert sp_flood.count() == n_copies - 1
    assert sp_flood.agg(F.max("hamming")).first()[0] == 0
    assert sp.count() < n_copies + 500
    sp.unpersist()
    docs.unpersist()


def test_lsh_hot_band_cap_no_op_on_calm_corpus(spark):
    """With no oversized bucket the capped plan must return exactly
    the uncapped pair set (cap chosen above every bucket size)."""
    from anomaly_detection_toolkit_spark.operators import dedup

    docs = _template_docs(spark, 300, 8)
    base = {
        (r.id_a, r.id_b, r.est_jaccard)
        for r in dedup.minhash_lsh_pairs(docs, num_perm=16, bands=4).collect()
    }
    capped = {
        (r.id_a, r.id_b, r.est_jaccard)
        for r in dedup.minhash_lsh_pairs(
            docs, num_perm=16, bands=4, max_bucket=10_000
        ).collect()
    }
    assert base == capped


def test_incremental_lsh_hot_band_cap(spark):
    """Incremental counterpart of the hot-band cap: a flooded BATCH
    resolves linearly via the exact fallback, and a flooded INDEX
    bucket is trimmed to representatives so one probing doc can't
    emit bucket-sized pair floods."""
    from anomaly_detection_toolkit_spark.operators import dedup

    n_copies, n_total = 2_000, 2_400
    docs = _template_docs(spark, n_total, n_copies).persist()
    # corpus = the flood + some fillers; batch = fresh ids, half
    # template copies, half unique (disjoint id space)
    batch = spark.range(n_total, n_total + 40).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 2 == 0,
            F.lit("breaking viral template text shared by every copy of this spam page"),
        )
        .otherwise(F.concat(F.lit("fresh unique batch doc "), F.col("id").cast("string")))
        .alias("text"),
    )
    index = dedup.build_lsh_index(docs, num_perm=16, bands=4)
    out = dedup.incremental_lsh_pairs(
        batch, index, num_perm=16, bands=4, threshold=0.5, max_bucket=32
    )
    vs_corpus = out.filter(F.col("against") == "corpus")
    # every template batch doc matches SOME corpus representative
    # (flagged as dup) but at most 32 per band per table — not 2000
    n_template_batch = 20
    matched = {r.id_a for r in vs_corpus.collect()}
    assert {n_total + i for i in range(0, 40, 2)} <= matched
    per_doc = (
        vs_corpus.groupBy("id_a").count().agg(F.max("count")).first()[0]
    )
    assert per_doc <= 32 * 4  # max_bucket per band, 4 bands
    # batch self-flood resolves via the exact fallback star
    vs_batch = out.filter(F.col("against") == "batch").collect()
    star = [r for r in vs_batch if r.est_jaccard == 1.0]
    assert len(star) >= n_template_batch - 1
    docs.unpersist()


def test_embedding_near_dup_hot_bucket_cap(spark):
    """A flood of IDENTICAL embeddings lands in one SRP bucket no
    matter the plane count; with max_bucket the pair join skips it
    and the exact-vector fallback emits the linear group-min star."""
    n_copies, n_total = 2_000, 2_300
    flood_vec = F.array(*[F.lit(float(d % 7) - 3.0) for d in range(DIM)])
    emb = spark.range(n_total).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") < n_copies, flood_vec)
        .otherwise(
            F.array(
                *[
                    (
                        (F.sin(F.col("id") * (12.9898 + 7.77 * d)) * 43758.5453)
                        - F.floor(F.sin(F.col("id") * (12.9898 + 7.77 * d)) * 43758.5453)
                    ).cast("double")
                    for d in range(DIM)
                ]
            )
        )
        .alias("embedding"),
    ).persist()
    pairs = sim.embedding_near_dup_pairs(
        emb, min_cosine=0.95, dim=DIM, n_rows_hint=n_total, max_bucket=64
    ).persist()
    flood = pairs.filter(F.col("id_b") < n_copies)
    assert flood.count() == n_copies - 1  # linear star, not ~2e6 pairs
    assert flood.agg(F.min("cosine_sim")).first()[0] == 1.0
    assert pairs.count() < n_copies + 500
    pairs.unpersist()
    emb.unpersist()


def test_multiprobe_srp_recovers_recall(spark):
    """Multi-probe (flip lowest-|margin| planes) must strictly widen
    the candidate set and recover top-1 recall on ONE table — the
    cheaper lever than extra tables (corpus signatured once)."""
    corpus = _emb(spark, 1000)
    queries = corpus.filter(F.col("vec_id") < 60)
    truth = {
        r.query_id: r.neighbor_id
        for r in sim.brute_force_topk(corpus, queries, k=1).collect()
    }

    def recall(**kw):
        got = {
            r.query_id: r.neighbor_id
            for r in sim.lsh_topk(
                corpus, queries, k=1, n_planes=6, dim=DIM, n_tables=1, **kw
            ).collect()
        }
        return sum(got.get(q) == n for q, n in truth.items()) / len(truth)

    r1, r4p = recall(), recall(n_probes=4)
    assert r1 < 1.0
    assert r4p > r1
    # probe-list invariants: home bucket always included, all probes
    # distinct, length bounded by n_probes
    planes = sim.plane_signs(6, DIM)
    rows = corpus.select(
        sim.srp_bucket(F.col("embedding"), planes).alias("b"),
        sim.srp_probe_buckets(F.col("embedding"), planes, 4).alias("pb"),
    ).collect()
    for r in rows:
        assert r["b"] in r["pb"]
        assert len(set(r["pb"])) == len(r["pb"]) <= 4
        assert all(0 <= p < 64 for p in r["pb"])
    # n_probes=1 degenerates to the exact home bucket
    one = corpus.select(
        sim.srp_probe_buckets(F.col("embedding"), planes, 1).alias("pb"),
        sim.srp_bucket(F.col("embedding"), planes).alias("b"),
    ).collect()
    assert all(r["pb"] == [r["b"]] for r in one)
