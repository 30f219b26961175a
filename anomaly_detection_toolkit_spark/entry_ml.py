"""Driver-contract queries for the ML detectors (SURVEY §2 ops
22-24). Tree ensembles / iterative MCD are not SQL-expressible →
rows-only gate; behavioral invariants live in ``tests/test_ml.py``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.entry_queries import r4, register, register_extra
from anomaly_detection_toolkit_spark.operators.ml import (
    IsolationForestDetector,
    RobustCovarianceDetector,
)
from anomaly_detection_toolkit_spark.sources.testdata import load_table

_DIMS = 4


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "embeddings", sf_dir)
    return df.select(
        "vec_id",
        *[F.col("embedding")[i].cast("double").alias(f"f{i}") for i in range(_DIMS)],
    )


# --- Isolation forest (op-22) under the hash gate. Tree CONSTRUCTION
# is seeded-RNG-driven (numpy PCG64) and genuinely non-SQL — but
# everything downstream of the fitted trees is deterministic, so the
# oracle replays the identical fit outside Spark (same
# fit_forest_arrays on the same rows in the same order — the
# id-hash sample priority is reproducible in DuckDB because
# integer→string casts are engine-stable), emits the trees as literal
# rows, and re-derives IN SQL the whole distributed scoring path the
# Spark side actually exercises: standardization (avg/stddev_pop with
# the σ=0→1 guard), unrolled depth_cap-step tree traversal,
# path-length leaf adjustment c(size), score = 2^(−E[len]/c(ψ)), the
# contamination quantile threshold, and the ±1 verdict. Only the RNG
# that CHOSE the trees is shared between the two sides.

_IF_TREES = 50
_IF_SEED = 42


def _iforest_oracle_sql() -> str:
    import os

    import duckdb
    import numpy as np

    from anomaly_detection_toolkit_spark.operators.ml import (
        _c_factor,
        fit_forest_arrays,
    )

    d = _DIMS
    sf_dir = os.environ.get("SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.01")
    feats = ", ".join(f"CAST(embedding[{i + 1}] AS DOUBLE) AS x{i}" for i in range(d))
    # identical priority to _collect_sample(order_col="vec_id"):
    # 60-bit md5 of "<seed>,<vec_id>"
    rows = duckdb.execute(
        f"""
        SELECT {feats}
        FROM '{sf_dir}/embeddings.parquet'
        ORDER BY CAST('0x' || substring(
                   md5('{_IF_SEED}' || ',' || CAST(vec_id AS VARCHAR)), 1, 15)
                 AS BIGINT)
        LIMIT 100000
        """
    ).fetchnumpy()
    x = np.column_stack([rows[f"x{i}"] for i in range(d)]).astype(np.float64)
    x = x[~np.isnan(x).any(axis=1)]
    mean = x.mean(axis=0)
    sd = x.std(axis=0)
    sd[sd == 0] = 1.0
    xs = (x - mean) / sd
    trees, psi, depth_cap = fit_forest_arrays(xs, _IF_TREES, 256, _IF_SEED)

    lits = []
    for t, (feature, thresh, left, right, size) in enumerate(trees):
        for n in range(len(feature)):
            lits.append(
                f"({t},{n},{int(feature[n])},{float(thresh[n])!r},"
                f"{int(left[n])},{int(right[n])},{_c_factor(int(size[n]))!r})"
            )
    stats = ", ".join(
        f"avg(x{i}) AS m{i}, stddev_pop(x{i}) AS s{i}" for i in range(d)
    )
    zcols = ", ".join(
        f"(x{i} - m{i}) / (CASE WHEN s{i} = 0 THEN 1.0 ELSE s{i} END) AS z{i}"
        for i in range(d)
    )
    zu = " UNION ALL ".join(
        f"SELECT id, {i} AS k, z{i} AS z FROM z" for i in range(d)
    )
    steps = []
    for k in range(depth_cap):
        steps.append(
            f"""st{k + 1} AS MATERIALIZED (
      SELECT s.id, s.t,
             CASE WHEN nd.feat < 0 THEN s.node
                  WHEN zu.z < nd.thr THEN nd.lt ELSE nd.rt END AS node,
             CASE WHEN nd.feat < 0 THEN s.depth ELSE s.depth + 1 END AS depth
      FROM st{k} s
      JOIN nodes nd ON nd.t = s.t AND nd.n = s.node
      LEFT JOIN zu ON zu.id = s.id AND zu.k = nd.feat
    )"""
        )
    steps_sql = ",\n    ".join(steps)
    return f"""
    WITH f AS MATERIALIZED (SELECT vec_id AS id, {feats} FROM embeddings),
    s AS MATERIALIZED (SELECT {stats} FROM f),
    z AS MATERIALIZED (SELECT id, {zcols} FROM f, s),
    zu AS MATERIALIZED ({zu}),
    nodes(t, n, feat, thr, lt, rt, cf) AS MATERIALIZED (
      VALUES {",".join(lits)}
    ),
    st0 AS MATERIALIZED (
      SELECT f.id, tr.t, 0 AS node, 0 AS depth
      FROM f CROSS JOIN (SELECT DISTINCT t FROM nodes) tr
    ),
    {steps_sql},
    pl AS (
      SELECT s.id, s.depth + nd.cf AS plen
      FROM st{depth_cap} s JOIN nodes nd ON nd.t = s.t AND nd.n = s.node
    ),
    sc AS (
      SELECT id, pow(2.0, -avg(plen) / {_c_factor(psi)!r}) AS score
      FROM pl GROUP BY id
    ),
    thr AS (SELECT quantile_cont(score, 0.95) AS thr FROM sc)
    SELECT id AS vec_id, round(score, 4) AS if_score,
           CAST(CASE WHEN score > thr THEN -1 ELSE 1 END AS INTEGER) AS if_verdict
    FROM sc, thr
    """


@register("ml_iforest_embeddings", _iforest_oracle_sql)
def ml_iforest_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isolation forest (op-22), hash-gated via the literal-tree
    oracle above; tree-build internals are additionally pinned by
    tests/test_ml.py golden tests against a hand-rolled traversal."""
    feats = _features(spark, sf_dir)
    cols = [f"f{i}" for i in range(_DIMS)]
    iforest = IsolationForestDetector(
        n_estimators=_IF_TREES,
        contamination=0.05,
        seed=_IF_SEED,
        sample_order_col="vec_id",
    ).fit(feats, cols)
    return iforest.transform(feats).select(
        "vec_id",
        r4(F.col("score")).alias("if_score"),
        F.col("verdict").alias("if_verdict"),
    )


# --- Iterative C-step MCD (op-24), EXACT oracle: the C-step is
# DETERMINISTIC from the full-set start (support membership depends
# only on the d² ordering — no RNG), so the whole fixed-point
# iteration unrolls into SQL: per iteration, refit mean/covar_samp
# over the current support, invert the 4×4 covariance with the shared
# Gauss-Jordan CTE machinery, compute d² for every row, and keep the
# h = (n+d+1)//2 smallest. At gate scale the iteration converges at
# step 5 with support-boundary d² gaps ≥ 4.4e-3 (probed; no ties), so
# 8 unrolled steps are exact — extra steps past the fixpoint are
# no-ops because the converged support maps to itself. Mirrors
# RobustCovarianceDetector.fit (operators/ml.py:276) which matches
# the reference's EllipticEnvelope semantics (ml_methods.py:218-308).


def _mcd_cstep_sql(d: int = _DIMS, iters: int = 8) -> str:
    from anomaly_detection_toolkit_spark.entry_pca import _gauss_jordan_ctes

    feats = ", ".join(
        f"CAST(embedding[{i + 1}] AS DOUBLE) AS x{i}" for i in range(d)
    )
    ident = " UNION ALL ".join(
        f"SELECT {i} AS i, {j + d} AS j, CAST({1 if i == j else 0} AS DOUBLE) AS v"
        for i in range(d)
        for j in range(d)
    )
    ctes = [
        f"f AS MATERIALIZED (SELECT vec_id AS id, {feats} FROM embeddings)",
        # h = (n + d + 1) // 2 — the default MCD support size
        f"hh AS MATERIALIZED (SELECT CAST(floor((count(*) + {d + 1}) / 2) AS BIGINT) AS h FROM f)",
        "s0 AS MATERIALIZED (SELECT id FROM f)",
    ]
    for t in range(iters + 1):  # round `iters` scores instead of reselecting
        mu_cols = ", ".join(f"avg(x{i}) AS m{i}" for i in range(d))
        cov_rows = " UNION ALL ".join(
            f"SELECT {i} AS i, {j} AS j, covar_samp(x{i}, x{j}) AS v FROM fs{t}"
            for i in range(d)
            for j in range(d)
        )
        uu = " UNION ALL ".join(
            f"SELECT f.id, {i} AS k, f.x{i} - mu.m{i} AS u FROM f, mu{t} mu"
            for i in range(d)
        )
        gj, last = _gauss_jordan_ctes(d, prefix=f"g{t}_")
        ctes += [
            f"fs{t} AS MATERIALIZED (SELECT f.* FROM f JOIN s{t} USING (id))",
            f"mu{t} AS MATERIALIZED (SELECT {mu_cols} FROM fs{t})",
            f"g{t}_0 AS MATERIALIZED ({cov_rows} UNION ALL {ident})",
            gj,
            f"inv{t} AS MATERIALIZED (SELECT i, j - {d} AS j, v FROM {last} WHERE j >= {d})",
            f"uu{t} AS MATERIALIZED ({uu})",
            f"""d2_{t} AS MATERIALIZED (
      SELECT a.id, sum(a.u * i.v * b.u) AS d2
      FROM uu{t} a
      JOIN inv{t} i ON i.i = a.k
      JOIN uu{t} b ON b.id = a.id AND b.k = i.j
      GROUP BY a.id
    )""",
        ]
        if t < iters:
            ctes.append(
                f"""s{t + 1} AS MATERIALIZED (
      SELECT id FROM (
        SELECT id, row_number() OVER (ORDER BY d2, id) AS rn FROM d2_{t}
      ) WHERE rn <= (SELECT h FROM hh)
    )"""
            )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body},
    sc AS (SELECT id, sqrt(greatest(d2, 0.0)) AS score FROM d2_{iters}),
    thr AS (SELECT quantile_cont(score, 0.95) AS thr FROM sc)
    SELECT id AS vec_id, round(score, 4) AS mcd_score,
           CAST(CASE WHEN score > thr THEN -1 ELSE 1 END AS INTEGER) AS mcd_verdict
    FROM sc, thr
    """


@register("robust_cov_cstep_embeddings", _mcd_cstep_sql())
def robust_cov_cstep_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative C-step MCD (op-24) under the HARD hash gate via the
    unrolled-fixpoint oracle above (split out of the round-2 merged
    rows-only ML query)."""
    feats = _features(spark, sf_dir)
    cols = [f"f{i}" for i in range(_DIMS)]
    mcd = RobustCovarianceDetector(contamination=0.05, seed=42).fit(feats, cols)
    return mcd.transform(feats).select(
        "vec_id",
        r4(F.col("score")).alias("mcd_score"),
        F.col("verdict").alias("mcd_verdict"),
    )


# --- 8-D full-support robust covariance, EXACT oracle: sample
# covariance (ddof=1) inverted INSIDE DuckDB via the same
# Gauss-Jordan CTE machinery as the PCA oracle; score =
# sqrt(u' S^-1 u), u = x - mean. ---


def _rc8_sql(d: int = 8) -> str:
    from anomaly_detection_toolkit_spark.entry_pca import _gauss_jordan_ctes

    feats = ", ".join(
        f"CAST(embedding[{i + 1}] AS DOUBLE) AS x{i}" for i in range(d)
    )
    means = ", ".join(f"avg(x{i}) AS m{i}" for i in range(d))
    ucols = ", ".join(f"x{i} - m{i} AS u{i}" for i in range(d))
    cov_rows = " UNION ALL ".join(
        f"SELECT {i} AS i, {j} AS j, covar_samp(x{i}, x{j}) AS v FROM f"
        for i in range(d)
        for j in range(d)
    )
    ident = " UNION ALL ".join(
        f"SELECT {i} AS i, {j + d} AS j, CAST({1 if i == j else 0} AS DOUBLE) AS v"
        for i in range(d)
        for j in range(d)
    )
    uu = " UNION ALL ".join(
        f"SELECT id, {i} AS k, u{i} AS u FROM z" for i in range(d)
    )
    gj, last = _gauss_jordan_ctes(d)
    return f"""
    WITH f AS MATERIALIZED (SELECT vec_id AS id, {feats} FROM embeddings),
    s AS MATERIALIZED (SELECT {means} FROM f),
    z AS MATERIALIZED (SELECT id, {ucols} FROM f, s),
    cov AS MATERIALIZED ({cov_rows}),
    m0 AS MATERIALIZED (SELECT * FROM cov UNION ALL {ident}),{gj},
    inv AS MATERIALIZED (SELECT i, j - {d} AS j, v FROM {last} WHERE j >= {d}),
    uu AS MATERIALIZED ({uu}),
    q AS (
      SELECT a.id, sum(a.u * inv.v * b.u) AS quad
      FROM uu a
      JOIN inv ON inv.i = a.k
      JOIN uu b ON b.id = a.id AND b.k = inv.j
      GROUP BY a.id
    ),
    sc AS (SELECT id, sqrt(greatest(quad, 0.0)) AS score FROM q),
    t AS (SELECT quantile_cont(score, 0.95) AS thr FROM sc)
    SELECT id, round(score, 4) AS score,
           CAST(CASE WHEN score > thr THEN -1 ELSE 1 END AS INTEGER) AS verdict
    FROM sc, t
    """


# demoted to the local-parity registry in round 3 to free a driver
# slot for autoencoder_lstm_events: op 24's driver row is the strictly
# harder iterative C-step pair; this degenerate support_fraction=1.0
# case stays hash-verified via tools/parity.py
@register_extra("robust_cov8d_embeddings", _rc8_sql(8))
def robust_cov8d_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = load_table(spark, "embeddings", sf_dir).select(
        F.col("vec_id").alias("id"),
        *[
            F.col("embedding")[i].cast("double").alias(f"x{i}")
            for i in range(8)
        ],
    )
    det = RobustCovarianceDetector(
        contamination=0.05, support_fraction=1.0, seed=42
    ).fit(feats, [f"x{i}" for i in range(8)])
    return det.transform(feats).select(
        "id", r4(F.col("score")).alias("score"), "verdict"
    )
