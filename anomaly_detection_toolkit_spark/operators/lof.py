"""Approximate Local Outlier Factor over embedding columns.

The reference wraps ``sklearn.LocalOutlierFactor``
(``/root/reference/src/anomaly_detection_toolkit/ml_methods.py:
113-215``). Exact kNN is quadratic — a non-starter at 10^12 rows
(SURVEY §2 op-23 marks it out of MVP scope and points at LSH) — so
this is the honest scale path: **LOF restricted to SRP-LSH bucket
neighborhoods** (the same signed-random-projection machinery as
``similarity.py``), the standard approximate-kNN trade: recall < 1
for neighbors that fall across bucket boundaries, exact LOF math
(Breunig et al. 2000, public algorithm) within the candidate sets:

1. bucket every vector (per-row projection, no shuffle);
2. within-bucket pair distances (self-equi-join on bucket — the only
   data-sized shuffle; bucket sizes are corpus/2^n_planes);
3. k nearest per point (window rank), k-distance = the k-th distance;
4. reachability distance reach(p,o) = max(kdist(o), d(p,o));
5. local reachability density lrd(p) = 1/mean reach(p,·);
6. LOF(p) = mean lrd(o)/lrd(p) over p's neighbors.

Everything is joins + windows on (id, neighbor) pair tables —
whole-stage codegen, no Python. Scores ≈ 1 for inliers, ≫ 1 for
outliers; verdict = -1 iff LOF > threshold (sklearn's negated-offset
encoding is not reproduced; divergence documented).

Known semantic quirk of the reference preserved in spirit only: its
``score_samples`` REFITS on the scoring data (``ml_methods.py:
208-215``), so scores and predictions come from different models.
Here one fit produces both — the saner contract, noted for parity
readers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.operators.similarity import (
    auto_n_planes,
    plane_dots,
    plane_signs,
    srp_bucket,
    srp_bucket_from_dots,
    srp_probe_buckets_from_dots,
)


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def approx_lof(
    df: DataFrame,
    k: int = 10,
    threshold: float = 1.5,
    n_planes: int | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_bucket_rows: int = 256,
    n_rows_hint: int | None = None,
    n_tables: int = 1,
    n_probes: int = 1,
) -> DataFrame:
    """(id, lof, verdict) for every vector with ≥1 bucket neighbor;
    isolated vectors (alone in their bucket) get lof NULL and verdict
    -1 — no neighborhood evidence means "suspicious" at validation
    time, and the NULL channel keeps them distinguishable.

    The returned DataFrame is already materialized (localCheckpoint)
    and owns NO persisted intermediates — repeated calls in one
    session do not accumulate cache.

    ``n_planes=None`` (default) derives the plane count from the
    input size so expected bucket size ≈ ``target_bucket_rows``: the
    within-bucket pair join then does ~N·target comparisons (linear
    in N) instead of N²/2^planes with a fixed plane count — the
    100×-scale fix from the round-2 audit. ``n_rows_hint`` skips the
    sizing count() when the caller knows N. ``n_tables`` > 1 unions
    neighbor candidates from independent plane sets (dedup on
    (id, nid)) — the standard recall recovery when high plane counts
    split true neighborhoods across bucket boundaries. ``n_probes``
    > 1 additionally probes each vector's lowest-|margin| neighbor
    buckets (multi-probe, ``similarity.srp_probe_buckets``): in this
    SELF-join there is no small query side, so the probe explode
    multiplies one join side's shuffle by ~n_probes — cheaper than
    the same recall from extra tables (which re-join BOTH sides), but
    not free like the query-side-only ``lsh_topk`` case."""
    if n_planes is None:
        n = n_rows_hint if n_rows_hint is not None else df.count()
        n_planes = auto_n_planes(n, target_bucket_rows)
    # v feeds both sides of the self-join plus the final left join, and
    # knn feeds kdist, reach, AND the lof aggregation. Spark re-executes
    # self-referenced subtrees (no plan-level CSE — see CLAUDE.md), so
    # without persist the expensive bucket join runs three times.
    if n_probes > 1:
        # two projections: per-table plane dots materialized first,
        # then bucket AND probe list derived by array indexing — the
        # vector is folded n_planes times per table, not 3× that
        # (no CSE across HOF lambdas; see similarity.plane_dots)
        dotted = df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            *[
                plane_dots(
                    F.col(vec_col), plane_signs(n_planes, dim, table=t)
                ).alias(f"dots{t}")
                for t in range(n_tables)
            ],
        )
        v = dotted.select(
            "id",
            "vec",
            *[
                srp_bucket_from_dots(F.col(f"dots{t}"), n_planes).alias(
                    f"bucket{t}"
                )
                for t in range(n_tables)
            ],
            *[
                srp_probe_buckets_from_dots(
                    F.col(f"dots{t}"), n_planes, n_probes
                ).alias(f"probes{t}")
                for t in range(n_tables)
            ],
        ).persist()
    else:
        v = df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            *[
                srp_bucket(
                    F.col(vec_col), plane_signs(n_planes, dim, table=t)
                ).alias(f"bucket{t}")
                for t in range(n_tables)
            ],
        ).persist()
    b = v.alias("b")
    pairs = None
    for t in range(n_tables):
        if n_probes > 1:
            # explode the probe list into an equi-join key: only this
            # side's shuffle grows by ~n_probes
            a = v.select(
                "id", "vec", F.explode(f"probes{t}").alias(f"bucket{t}")
            ).alias("a")
        else:
            a = v.alias("a")
        joined = a.join(
            b,
            (F.col(f"a.bucket{t}") == F.col(f"b.bucket{t}"))
            & (F.col("a.id") != F.col("b.id")),
        ).select(
            F.col("a.id").alias("ida"),
            F.col("b.id").alias("idb"),
            F.sqrt(_sq_dist(F.col("a.vec"), F.col("b.vec"))).alias("d"),
        )
        if n_probes > 1:
            # SYMMETRIZE: probe matches are one-directional (X probed
            # into Y's home bucket), but the downstream kdist/lrd
            # joins are inner joins that assume every neighbor also
            # appears as an id — an orphan nid would silently drop
            # out of the reach/lrd math and skew LOF over
            # inconsistent neighbor subsets. Both directions are
            # emitted from ONE pass (2-way explode, distance computed
            # once — self-referencing the join output would re-execute
            # it under Spark's no-plan-CSE rule), restoring the
            # symmetric candidate relation the single-probe bucket
            # equi-join has naturally.
            part = joined.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("ida").alias("id"), F.col("idb").alias("nid")
                        ),
                        F.struct(
                            F.col("idb").alias("id"), F.col("ida").alias("nid")
                        ),
                    )
                ).alias("e"),
                "d",
            ).select("e.id", "e.nid", "d")
        else:
            part = joined.select(
                F.col("ida").alias("id"), F.col("idb").alias("nid"), "d"
            )
        pairs = part if pairs is None else pairs.unionByName(part)
    if n_tables > 1 or n_probes > 1:
        pairs = pairs.dropDuplicates(["id", "nid"])
    # rank on round(d, 6) with id tie-break: float-summation order
    # differs ~1ulp across engines/plans, and the DuckDB oracle must
    # select the identical neighbor set (same trick as similarity.py)
    w = Window.partitionBy("id").orderBy(F.round(F.col("d"), 6).asc(), F.col("nid"))
    knn = (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .persist()
    )
    kdist = knn.groupBy("id").agg(F.max("d").alias("kdist"))
    # reach(p,o) = max(kdist(o), d(p,o)); lrd(p) = 1/mean reach
    reach = knn.join(
        kdist.select(F.col("id").alias("nid"), F.col("kdist").alias("kdist_o")), "nid"
    ).withColumn("reach", F.greatest(F.col("kdist_o"), F.col("d")))
    # exact-duplicate neighborhoods have zero mean reach distance
    # (infinite density); the epsilon floor keeps lrd finite and the
    # resulting LOF ≈ ratio-of-densities semantics intact
    lrd = reach.groupBy("id").agg(
        (F.lit(1.0) / F.greatest(F.avg("reach"), F.lit(1e-12))).alias("lrd")
    )
    lof = (
        knn.join(lrd.select(F.col("id").alias("nid"), F.col("lrd").alias("lrd_o")), "nid")
        .groupBy("id")
        .agg(F.avg("lrd_o").alias("mean_lrd_o"))
        .join(lrd, "id")
        .withColumn("lof", F.col("mean_lrd_o") / F.col("lrd"))
        .select("id", "lof")
    )
    out = v.select("id").join(lof, "id", "left")
    result = out.select(
        "id",
        "lof",
        F.when(F.col("lof").isNull() | (F.col("lof") > threshold), F.lit(-1))
        .otherwise(F.lit(1))
        .cast("int")
        .alias("verdict"),
    )
    # Materialize the (narrow, one-row-per-vector) result via an
    # EAGER localCheckpoint, then RELEASE the heavyweight
    # intermediates — repeated approx_lof calls in one session must
    # not accumulate pair-join caches, and unlike persist() the
    # checkpoint blocks are freed automatically by the ContextCleaner
    # when the returned DataFrame is garbage-collected (no caller-side
    # unpersist contract). localCheckpoint trades executor-loss
    # recoverability for speed; acceptable for a derived score table
    # that can be recomputed by re-calling approx_lof.
    result = result.localCheckpoint(eager=True)
    knn.unpersist()
    v.unpersist()
    return result
