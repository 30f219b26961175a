"""Driver-contract queries for the ML detectors (SURVEY §2 ops
22-24). Tree ensembles / iterative MCD are not SQL-expressible →
rows-only gate; behavioral invariants live in ``tests/test_ml.py``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.entry_queries import r4, register
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


@register("ml_iforest_embeddings")  # rows-only: random trees genuinely non-SQL
def ml_iforest_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isolation forest (op-22). The only remaining rows-only detector
    row: tree construction is seeded-RNG-driven and not expressible in
    ANSI SQL; numerical behavior is pinned by tests/test_ml.py golden
    tests against a hand-rolled reference traversal."""
    feats = _features(spark, sf_dir)
    cols = [f"f{i}" for i in range(_DIMS)]
    iforest = IsolationForestDetector(
        n_estimators=50, contamination=0.05, seed=42
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


@register("robust_cov8d_embeddings", _rc8_sql(8))
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
