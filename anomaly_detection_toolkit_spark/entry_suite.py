"""Flagship driver-contract queries: the north-star validation suite
end to end (inline-synthesized image+caption table → full check suite
→ per-partition verdict grid), plus a cube-shaped drift report.

``northstar_suite_verdicts`` is rows-only (mapInPandas payload decode
is not SQL); the cube report is oracle-checked (DuckDB GROUP BY CUBE),
and ``suite_grid_documents`` oracle-checks the engine semantics — the
same Check classes + runner over a DuckDB-replicable fact table, so
the (part × check) verdict grid itself is hash-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.entry_queries import r4, register
from anomaly_detection_toolkit_spark.sources.images import generate_images


def suite_verdicts(spark: SparkSession, n_images: int = 2000, n_parts: int = 4) -> DataFrame:
    """Generate the deterministic defect-injected table and run the
    whole validation suite; returns the (part, check) verdict grid."""
    from anomaly_detection_toolkit_spark.plans.checks import default_suite
    from anomaly_detection_toolkit_spark.plans.runner import run_suite

    imgs = generate_images(spark, n_images, seed=42, n_parts=n_parts)
    result = run_suite(imgs, default_suite())
    return result.verdicts.orderBy("part", "check")


@register("northstar_suite_verdicts")  # rows-only: payload decode in plan
def northstar_suite_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return suite_verdicts(spark)


# cube-shaped drift report: counts by (event_type, hour) with all
# rollup combinations — exercises the grouping-sets surface of the
# engine (SURVEY §2.11 aggregations).
# The value aggregate is an EXACT integer sum of per-row 1e-4
# quantized values (floor(v*1e4 + 0.5) is bit-identical across
# engines on identical input doubles), NOT round(avg(value), 4): a
# grouped float mean is summation-order-dependent (±1ulp under
# AQE/partitioning), and the round-3 audit found a knife-edge row
# where Spark (decimal-repr HALF_UP) and DuckDB (binary rounding)
# would diverge on a 1ulp nudge. Consumers derive the mean as
# sum_value_e4 / (1e4 * n_values).
_CUBE_SQL = """
    SELECT coalesce(event_type, '<all>') AS event_type,
           coalesce(CAST(hour(ts) AS INTEGER), -1) AS hour_of_day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(value) AS BIGINT) AS n_values,
           CAST(sum(CAST(floor(value * 1e4 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_value_e4
    FROM events
    GROUP BY CUBE (event_type, hour(ts))
"""


@register("cube_report_events", _CUBE_SQL)
def cube_report_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anomaly_detection_toolkit_spark.sources.testdata import load_table

    df = load_table(spark, "events", sf_dir)
    v = F.col("value").cast("double")
    out = (
        df.cube("event_type", F.hour("ts").alias("hour_of_day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(v).alias("n_values"),
            F.sum(F.floor(v * 1e4 + 0.5).cast("bigint")).alias("sum_value_e4"),
        )
    )
    return out.select(
        F.coalesce(F.col("event_type"), F.lit("<all>")).alias("event_type"),
        F.coalesce(F.col("hour_of_day"), F.lit(-1)).cast("int").alias("hour_of_day"),
        "n",
        "n_values",
        "sum_value_e4",
    )


# ---------------------------------------------------------------------------
# Oracle-checked suite verdict grid over a parquet-derived fact table.
# The flagship image-table run stays rows-only (binary payload decode
# is not SQL), but the ENGINE SEMANTICS — stats constraints,
# uniqueness, referential, KS drift, and the (part × check) verdict
# grid itself — are fully verified here: the same Check classes and
# run_suite() runner execute over a documents-derived fact whose every
# derivation is replicated in DuckDB.
# ---------------------------------------------------------------------------

_SUITE_GRID_SQL = r"""
    WITH fact AS (
      SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS doc_key,
             CASE WHEN lang = 'en' THEN 0
                  ELSE CAST(doc_id % 3 AS INTEGER) + 1 END AS part,
             n_chars,
             CAST('0x' || substring(md5(text), 1, 15) AS BIGINT) % 16 AS phash16,
             'see doc_' || CAST(CASE WHEN doc_id % 17 = 0 THEN doc_id + 1000000
                                     WHEN doc_id >= 7 THEN doc_id - 7
                                     ELSE doc_id END AS VARCHAR) AS caption,
             CASE lang WHEN 'en' THEN 0 WHEN 'fr' THEN 1 WHEN 'es' THEN 2
                       WHEN 'de' THEN 3 ELSE 4 END AS lang_code,
             least(n_chars // 50, 10) AS len_b,
             CAST('0x' || substring(md5(text), 1, 15) AS BIGINT) % 8 AS hash_b
      FROM documents
    ),
    parts AS (SELECT DISTINCT part FROM fact),
    checks(check_name) AS (
      VALUES ('schema'), ('column_stats'), ('uniqueness_doc_key'),
             ('uniqueness_phash16'), ('referential_caption'), ('drift')
    ),
    cs AS (
      SELECT part,
             CAST((CASE WHEN (count(*) - count(n_chars)) * 1.0 / count(*) > 0.0
                        THEN 1 ELSE 0 END)
                + (CASE WHEN min(n_chars) < 1 THEN 1 ELSE 0 END)
                + (CASE WHEN max(n_chars) > 500 THEN 1 ELSE 0 END)
                + (CASE WHEN (count(*) - count(phash16)) * 1.0 / count(*) > 0.0
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_err
      FROM fact GROUP BY part
    ),
    dupd AS (SELECT doc_key FROM fact GROUP BY doc_key HAVING count(*) > 1),
    u1 AS (SELECT part, count(*) AS n_err FROM fact JOIN dupd USING (doc_key)
           GROUP BY part),
    duph AS (SELECT phash16 FROM fact GROUP BY phash16 HAVING count(*) > 1),
    u2 AS (SELECT part, count(*) AS n_err FROM fact JOIN duph USING (phash16)
           GROUP BY part),
    orph AS (
      SELECT part, count(*) AS n_err
      FROM fact f
      WHERE regexp_extract(f.caption, '(doc_\d+)', 1) <> ''
        AND regexp_extract(f.caption, '(doc_\d+)', 1)
              NOT IN (SELECT doc_key FROM fact)
      GROUP BY part
    ),
    db AS (
      SELECT part, 'lang_code' AS col, CAST(lang_code AS DOUBLE) AS bucket FROM fact
      UNION ALL SELECT part, 'len_b', CAST(len_b AS DOUBLE) FROM fact
      UNION ALL SELECT part, 'hash_b', CAST(hash_b AS DOUBLE) FROM fact
    ),
    cnt AS (SELECT col, part, bucket, count(*) AS c FROM db GROUP BY 1, 2, 3),
    pgrid AS (
      SELECT p.col, p.part, b.bucket, coalesce(c.c, 0) AS c
      FROM (SELECT DISTINCT col, part FROM cnt) p
      JOIN (SELECT DISTINCT col, bucket FROM cnt) b USING (col)
      LEFT JOIN cnt c ON c.col = p.col AND c.part = p.part AND c.bucket = b.bucket
    ),
    en AS (
      SELECT col, part, bucket,
             CAST(c AS DOUBLE) / sum(c) OVER (PARTITION BY col, part) AS p,
             CAST(sum(c) OVER (PARTITION BY col, bucket) AS DOUBLE)
               / sum(c) OVER (PARTITION BY col) AS q
      FROM pgrid
    ),
    ks AS (
      SELECT col, part, max(abs(cdf_p - cdf_q)) AS ks FROM (
        SELECT col, part,
               sum(p) OVER (PARTITION BY col, part ORDER BY bucket) AS cdf_p,
               sum(q) OVER (PARTITION BY col, part ORDER BY bucket) AS cdf_q
        FROM en
      ) GROUP BY col, part
    ),
    dw AS (SELECT part, count(*) AS n_warn FROM ks WHERE ks > 0.15 GROUP BY part),
    grid AS (SELECT part, check_name FROM parts CROSS JOIN checks)
    SELECT part, "check", n_errors, n_warnings,
           CAST(CASE WHEN n_errors > 0 THEN -1 ELSE 1 END AS INTEGER) AS verdict
    FROM (
      SELECT CAST(g.part AS INTEGER) AS part, g.check_name AS "check",
             CAST(CASE g.check_name
                  WHEN 'column_stats' THEN coalesce(cs.n_err, 0)
                  WHEN 'uniqueness_doc_key' THEN coalesce(u1.n_err, 0)
                  WHEN 'uniqueness_phash16' THEN coalesce(u2.n_err, 0)
                  WHEN 'referential_caption' THEN coalesce(orph.n_err, 0)
                  ELSE 0 END AS BIGINT) AS n_errors,
             CAST(CASE g.check_name WHEN 'drift' THEN coalesce(dw.n_warn, 0)
                  ELSE 0 END AS BIGINT) AS n_warnings
      FROM grid g
      LEFT JOIN cs ON cs.part = g.part
      LEFT JOIN u1 ON u1.part = g.part
      LEFT JOIN u2 ON u2.part = g.part
      LEFT JOIN orph ON orph.part = g.part
      LEFT JOIN dw ON dw.part = g.part
    )
"""


def _suite_grid_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anomaly_detection_toolkit_spark.sources.testdata import load_table

    d = load_table(spark, "documents", sf_dir)
    h60 = F.conv(F.substring(F.md5(F.col("text")), 1, 15), 16, 10).cast("long")
    ref = (
        F.when(F.pmod(F.col("doc_id"), 17) == 0, F.col("doc_id") + 1000000)
        .when(F.col("doc_id") >= 7, F.col("doc_id") - 7)
        .otherwise(F.col("doc_id"))
    )
    lang_code = (
        F.when(F.col("lang") == "en", 0)
        .when(F.col("lang") == "fr", 1)
        .when(F.col("lang") == "es", 2)
        .when(F.col("lang") == "de", 3)
        .otherwise(4)
    )
    return d.select(
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("doc_key"),
        F.when(F.col("lang") == "en", F.lit(0))
        .otherwise(F.pmod(F.col("doc_id"), 3).cast("int") + 1)
        .cast("int")
        .alias("part"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.pmod(h60, F.lit(16)).alias("phash16"),
        F.concat(F.lit("see doc_"), ref.cast("string")).alias("caption"),
        lang_code.cast("int").alias("lang_code"),
        F.least(F.floor(F.col("n_chars") / 50), F.lit(10)).cast("long").alias("len_b"),
        F.pmod(h60, F.lit(8)).alias("hash_b"),
    )


@register("suite_grid_documents", _SUITE_GRID_SQL)
def suite_grid_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real Check classes + run_suite() over a DuckDB-replicable
    fact: column-stats constraints (n_chars max 500 breached by long
    docs), uniqueness on a unique key (passes) and a 16-bucket hash
    key (dup errors), caption→doc_key referential with injected
    orphans (doc_id % 17), and KS drift where part 0 is all-English
    by construction (lang histogram drifts, len/hash do not)."""
    from anomaly_detection_toolkit_spark.plans.checks import (
        ColumnStatsCheck,
        DriftCheck,
        ReferentialCheck,
        SchemaCheck,
        UniquenessCheck,
    )
    from anomaly_detection_toolkit_spark.plans.runner import run_suite

    fact = _suite_grid_fact(spark, sf_dir)
    checks = [
        SchemaCheck(
            {
                "doc_key": "string",
                "part": "int",
                "n_chars": "bigint",
                "phash16": "bigint",
                "caption": "string",
                "lang_code": "int",
                "len_b": "bigint",
                "hash_b": "bigint",
            }
        ),
        ColumnStatsCheck(
            {
                "n_chars": {"max_null_rate": 0.0, "min": 1, "max": 500},
                "phash16": {"max_null_rate": 0.0},
            }
        ),
        UniquenessCheck("doc_key", entity_col="doc_key"),
        UniquenessCheck("phash16", entity_col="doc_key"),
        ReferentialCheck(
            caption_col="caption", ref_col="doc_key", pattern=r"(doc_\d+)"
        ),
        DriftCheck(
            columns={
                "lang_code": F.col("lang_code").cast("double"),
                "len_b": F.col("len_b").cast("double"),
                "hash_b": F.col("hash_b").cast("double"),
            },
            ks_threshold=0.15,
        ),
    ]
    result = run_suite(fact, checks)
    return result.verdicts.orderBy("part", "check")
