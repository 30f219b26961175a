"""Flagship driver-contract queries: the north-star validation suite
end to end (inline-synthesized image+caption table → full check suite
→ per-partition verdict grid), plus a cube-shaped drift report.

``northstar_suite_verdicts`` is rows-only (mapInPandas payload decode
is not SQL); the cube report is oracle-checked (DuckDB GROUP BY CUBE).
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
# engine (SURVEY §2.11 aggregations)
_CUBE_SQL = """
    SELECT coalesce(event_type, '<all>') AS event_type,
           coalesce(CAST(hour(ts) AS INTEGER), -1) AS hour_of_day,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(value), 4) AS mean_value
    FROM events
    GROUP BY CUBE (event_type, hour(ts))
"""


@register("cube_report_events", _CUBE_SQL)
def cube_report_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anomaly_detection_toolkit_spark.sources.testdata import load_table

    df = load_table(spark, "events", sf_dir)
    out = (
        df.cube("event_type", F.hour("ts").alias("hour_of_day"))
        .agg(F.count(F.lit(1)).alias("n"), r4(F.avg("value")).alias("mean_value"))
    )
    return out.select(
        F.coalesce(F.col("event_type"), F.lit("<all>")).alias("event_type"),
        F.coalesce(F.col("hour_of_day"), F.lit(-1)).cast("int").alias("hour_of_day"),
        "n",
        "mean_value",
    )
