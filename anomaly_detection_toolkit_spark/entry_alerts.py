"""Driver-contract pairs for the alert system (SURVEY §2 ops 50-52)
and recent-top-k (ops 52/56) over lineitem/events."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.entry_queries import r4, register
from anomaly_detection_toolkit_spark.operators import alerts
from anomaly_detection_toolkit_spark.sources.testdata import load_table

THRESHOLDS = {
    "l_quantity": {"warning": 30.0, "critical": 45.0, "failure": 49.0},
    "l_discount": {"warning": 0.08, "critical": 0.10},
}
ESCALATION = {"warning": {"min_count": 3}}

_ALERTS_SQL = """
    WITH un AS (
      SELECT l_orderkey AS asset_id, l_linenumber,
             'l_quantity' AS feature, CAST(l_quantity AS DOUBLE) AS value
      FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_discount', CAST(l_discount AS DOUBLE)
      FROM lineitem
    ),
    lev AS (
      SELECT *,
        CASE WHEN feature = 'l_quantity' THEN
               CASE WHEN value >= 49.0 THEN 'failure'
                    WHEN value >= 45.0 THEN 'critical'
                    WHEN value >= 30.0 THEN 'warning' END
             WHEN feature = 'l_discount' THEN
               CASE WHEN value >= 0.10 THEN 'critical'
                    WHEN value >= 0.08 THEN 'warning' END
        END AS raw_level,
        CASE WHEN feature = 'l_quantity' THEN
               CASE WHEN value >= 49.0 THEN 49.0
                    WHEN value >= 45.0 THEN 45.0
                    WHEN value >= 30.0 THEN 30.0 END
             WHEN feature = 'l_discount' THEN
               CASE WHEN value >= 0.10 THEN 0.10
                    WHEN value >= 0.08 THEN 0.08 END
        END AS threshold
      FROM un WHERE value IS NOT NULL
    ),
    al AS (SELECT * FROM lev WHERE raw_level IS NOT NULL),
    cnt AS (
      SELECT *, CAST(count(*) OVER (PARTITION BY asset_id, feature) AS BIGINT)
                  AS key_count
      FROM al
    )
    SELECT asset_id, l_linenumber, feature, round(value, 4) AS value,
           raw_level,
           CASE WHEN raw_level = 'warning' AND key_count >= 3 THEN 'critical'
                ELSE raw_level END AS level,
           threshold, key_count,
           printf('%s = %.2f exceeds %s threshold (%.2f)',
                  feature, value, raw_level, threshold) AS message
    FROM cnt
"""


@register("alerts_thresholds_lineitem", _ALERTS_SQL)
def alerts_thresholds_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "lineitem", sf_dir)
    out = alerts.check_thresholds(
        df,
        THRESHOLDS,
        asset_col="l_orderkey",
        entity_cols=["l_linenumber"],
        escalation=ESCALATION,
    )
    return out.select(
        "asset_id",
        "l_linenumber",
        "feature",
        r4(F.col("value")).alias("value"),
        "raw_level",
        "level",
        "threshold",
        "key_count",
        "message",
    )


_TOPK_SQL = """
    WITH r AS (
      SELECT event_id, event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT event_id, event_type, round(value, 4) AS value, CAST(rn AS INTEGER) AS rn
    FROM r WHERE rn <= 5
"""


@register("topk_recent_events", _TOPK_SQL)
def topk_recent_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    df = load_table(spark, "events", sf_dir)
    out = alerts.recent_top_k(
        df,
        5,
        order_by=[F.col("ts").desc(), F.col("event_id").desc()],
        partition_by=["event_type"],
    )
    # recent_top_k drops its row number; recompute for the contract
    w = Window.partitionBy("event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return out.withColumn("rn", F.row_number().over(w)).select(
        "event_id", "event_type", r4(F.col("value")).alias("value"), "rn"
    )
