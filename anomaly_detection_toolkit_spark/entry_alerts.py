"""Driver-contract pairs for the alert system (SURVEY §2 ops 50-52)
and recent-top-k (ops 52/56) over lineitem/events."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.entry_queries import r4, register, register_extra
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


# round 5: retired to register_extra (simple window top-k, green
# since round 1) — its driver slot goes to the round-4 hot-band
# capped-LSH pair (gate-rotation rule: newest code in the window)
@register_extra("topk_recent_events", _TOPK_SQL)
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


# --- op-51 streaming variant: stateful escalation replayed through
# the REAL applyInPandasWithState operator as 3 micro-batches (one
# file each, availableNow). The running count is SQL: end-of-batch
# cumulative alerts per (asset, feature) — a window sum over
# per-batch counts ordered by batch index. ---

_STREAM_ESC_SQL = """
    WITH un AS (
      SELECT CAST(l_orderkey % 500 AS VARCHAR) AS asset_id,
             l_linenumber % 3 AS batch,
             'l_quantity' AS feature, CAST(l_quantity AS DOUBLE) AS value
      FROM lineitem
      UNION ALL
      SELECT CAST(l_orderkey % 500 AS VARCHAR), l_linenumber % 3,
             'l_discount', CAST(l_discount AS DOUBLE)
      FROM lineitem
    ),
    lev AS (
      SELECT *,
        CASE WHEN feature = 'l_quantity' THEN
               CASE WHEN value >= 45.0 THEN 'critical'
                    WHEN value >= 30.0 THEN 'warning' END
             WHEN feature = 'l_discount' THEN
               CASE WHEN value >= 0.10 THEN 'critical'
                    WHEN value >= 0.08 THEN 'warning' END
        END AS raw_level,
        CASE WHEN feature = 'l_quantity' THEN
               CASE WHEN value >= 45.0 THEN 45.0
                    WHEN value >= 30.0 THEN 30.0 END
             WHEN feature = 'l_discount' THEN
               CASE WHEN value >= 0.10 THEN 0.10
                    WHEN value >= 0.08 THEN 0.08 END
        END AS threshold
      FROM un WHERE value IS NOT NULL
    ),
    al AS (SELECT * FROM lev WHERE raw_level IS NOT NULL),
    bc AS (
      SELECT asset_id, feature, batch, count(*) AS c
      FROM al GROUP BY 1, 2, 3
    ),
    cum AS (
      SELECT asset_id, feature, batch,
             CAST(sum(c) OVER (PARTITION BY asset_id, feature
                               ORDER BY batch) AS BIGINT) AS kc
      FROM bc
    )
    SELECT al.asset_id, al.feature, round(al.value, 4) AS value,
           al.raw_level,
           CASE WHEN al.raw_level = 'warning' AND cum.kc >= 50
                THEN 'critical' ELSE al.raw_level END AS level,
           al.threshold, cum.kc AS key_count,
           printf('%s = %.2f exceeds %s threshold (%.2f)',
                  al.feature, al.value, al.raw_level, al.threshold) AS message
    FROM al JOIN cum ON cum.asset_id = al.asset_id
                    AND cum.feature = al.feature
                    AND cum.batch = al.batch
"""

_STREAM_ESC_THRESHOLDS = {
    "l_quantity": {"warning": 30.0, "critical": 45.0},
    "l_discount": {"warning": 0.08, "critical": 0.10},
}


@register("streaming_escalation_lineitem", _STREAM_ESC_SQL)
def streaming_escalation_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replays lineitem (batched by l_linenumber % 3) through the
    stateful streaming escalation operator; the per-key running count
    accumulates across micro-batches exactly like the reference's
    long-lived alert_counts dict."""
    import glob
    import os
    import shutil
    import tempfile

    from anomaly_detection_toolkit_spark.streaming import await_streaming
    from anomaly_detection_toolkit_spark.streaming.escalation import (
        streaming_check_thresholds,
    )

    # 500 assets (not 15k orders): applyInPandasWithState pays a
    # per-group pandas overhead, so the fixture uses realistically
    # hot keys — 1000 (asset, feature) groups per micro-batch
    df = load_table(spark, "lineitem", sf_dir).select(
        F.pmod(F.col("l_orderkey"), 500).cast("string").alias("asset_id"),
        F.pmod(F.col("l_linenumber"), 3).alias("batch"),
        F.col("l_quantity").cast("double"),
        F.col("l_discount").cast("double"),
    )
    tmp = tempfile.mkdtemp(prefix="adt_esc_")
    src = os.path.join(tmp, "in")
    os.makedirs(src)
    base = 1_000_000_000.0
    # ONE pass over lineitem: partitionBy(batch) writes all three
    # micro-batch files in a single job (a per-batch filter loop would
    # scan the fact table once per batch)
    stage = os.path.join(tmp, "stage")
    df.repartition("batch").write.partitionBy("batch").json(stage)
    for b in range(3):
        parts = sorted(glob.glob(os.path.join(stage, f"batch={b}", "part-*.json")))
        dst = os.path.join(src, f"b{b}.json")
        with open(dst, "wb") as out_f:
            for p in parts:
                with open(p, "rb") as in_f:
                    shutil.copyfileobj(in_f, out_f)
        # distinct ascending mtimes pin micro-batch order (file source
        # processes oldest first)
        os.utime(dst, (base + b * 60, base + b * 60))
    stream = spark.readStream.schema(
        "asset_id string, l_quantity double, l_discount double"
    ).option("maxFilesPerTrigger", 1).json(src)
    sink, ckpt = os.path.join(tmp, "out"), os.path.join(tmp, "ckpt")
    q = (
        streaming_check_thresholds(
            stream,
            _STREAM_ESC_THRESHOLDS,
            asset_col="asset_id",
            escalation={"warning": {"min_count": 50}},
        )
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    await_streaming(q, 300)
    out = spark.read.parquet(sink)
    return out.select(
        "asset_id",
        "feature",
        r4(F.col("value")).alias("value"),
        "raw_level",
        "level",
        "threshold",
        "key_count",
        "message",
    )
