"""Driver-contract queries for LOF (op-23), the streaming sliding
buffer (ops 54-55, replayed as availableNow batches through the REAL
streaming operator), and the composed PM feature pipeline (op-47,
fully oracle-checked)."""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.entry_queries import r4, register
from anomaly_detection_toolkit_spark.operators import pm
from anomaly_detection_toolkit_spark.operators.lof import approx_lof
from anomaly_detection_toolkit_spark.sources.testdata import load_table


@register("lof_embeddings")  # rows-only: iterative kNN not in SQL
def lof_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    out = approx_lof(emb, k=10, threshold=1.5, n_planes=3, dim=64)
    return out.select("id", r4(F.col("lof")).alias("lof"), "verdict")


_PREP_SQL = """
    SELECT l_orderkey, l_linenumber,
           CAST(greatest(0, max(l_linenumber) OVER (PARTITION BY l_orderkey)
                            - l_linenumber) AS INTEGER) AS rul,
           CASE WHEN greatest(0, max(l_linenumber) OVER (PARTITION BY l_orderkey)
                                 - l_linenumber) > 3 THEN 'healthy'
                WHEN greatest(0, max(l_linenumber) OVER (PARTITION BY l_orderkey)
                                 - l_linenumber) > 1 THEN 'warning'
                WHEN greatest(0, max(l_linenumber) OVER (PARTITION BY l_orderkey)
                                 - l_linenumber) > 0 THEN 'critical'
                ELSE 'failed' END AS health_status,
           CAST(CASE WHEN greatest(0, max(l_linenumber) OVER (PARTITION BY l_orderkey)
                                      - l_linenumber) > 3
                     THEN 0 ELSE 1 END AS INTEGER) AS binary_label,
           round(avg(CAST(l_quantity AS DOUBLE)) OVER w3, 4) AS q_rmean,
           round(stddev_samp(CAST(l_quantity AS DOUBLE)) OVER w3, 4) AS q_rstd,
           round(min(CAST(l_extendedprice AS DOUBLE)) OVER w3, 4) AS p_rmin,
           round(max(CAST(l_extendedprice AS DOUBLE)) OVER w3, 4) AS p_rmax
    FROM lineitem
    WINDOW w3 AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


@register("pm_prepare_features_lineitem", _PREP_SQL)
def pm_prepare_features_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "lineitem", sf_dir)
    out = pm.prepare_pm_features(
        df,
        asset_id_col="l_orderkey",
        cycle_col="l_linenumber",
        feature_cols=["l_quantity", "l_extendedprice"],
        rolling_window=3,
        warning_threshold=3,
        critical_threshold=1,
        # (l_orderkey, l_linenumber) is NOT unique in the synthetic
        # data — extendedprice breaks the window-order tie
        order_cols=["l_linenumber", "l_extendedprice"],
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.col("RUL").cast("int").alias("rul"),
        "health_status",
        "binary_label",
        r4(F.col("l_quantity_rolling_mean_3")).alias("q_rmean"),
        r4(F.col("l_quantity_rolling_std_3")).alias("q_rstd"),
        r4(F.col("l_extendedprice_rolling_min_3")).alias("p_rmin"),
        r4(F.col("l_extendedprice_rolling_max_3")).alias("p_rmax"),
    )


@register("streaming_sliding_buffer_events")  # rows-only: stateful stream
def streaming_sliding_buffer_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replays 500 events per event_type through the REAL
    applyInPandasWithState operator (availableNow trigger, parquet
    sink) and returns the emitted status/score rows."""
    from anomaly_detection_toolkit_spark.streaming.ingestion import (
        sliding_buffer_scores,
    )

    events = (
        load_table(spark, "events", sf_dir)
        .select(
            F.col("event_type").alias("asset_id"),
            F.col("ts").cast("timestamp").cast("double").alias("ts"),
            F.col("value"),
            F.col("event_id"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("asset_id").orderBy("ts", "event_id")
            ),
        )
        .filter(F.col("rn") <= 500)
        # disambiguate duplicate timestamps so the per-batch sort in
        # the stream operator is deterministic
        .withColumn("ts", F.col("ts") + F.col("rn") / 1e6)
        .select("asset_id", "ts", "value")
    )
    tmp = tempfile.mkdtemp(prefix="adt_stream_")
    src, sink, ckpt = (os.path.join(tmp, d) for d in ("in", "out", "ckpt"))
    events.coalesce(1).write.mode("overwrite").json(src)
    stream = (
        spark.readStream.schema("asset_id string, ts double, value double")
        .json(src)
    )
    q = (
        sliding_buffer_scores(stream, window_size=20, threshold=2.5)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(300)
    out = spark.read.parquet(sink)
    return out.select(
        "asset_id",
        r4(F.col("ts")).alias("ts"),
        "status",
        "buffer_size",
        r4(F.col("win_mean")).alias("win_mean"),
        r4(F.col("score")).alias("score"),
        "verdict",
    )


_SALTED_SQL = """
    WITH f AS (
      SELECT doc_id, lang, source,
             md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
               AS fingerprint
      FROM documents
    ),
    r AS (
      SELECT doc_id, lang, source, fingerprint,
             row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
      FROM f
    )
    SELECT doc_id, lang, source, fingerprint FROM r WHERE rn = 1
"""


@register("dedup_salted_documents", _SALTED_SQL)
def dedup_salted_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted repartition + sort-within-partition dedup (the literal
    north-rule uniqueness plan) — must produce exactly the keeper set
    the naive window dedup produces (the oracle)."""
    from anomaly_detection_toolkit_spark.operators.salted import salted_sorted_dedup
    from anomaly_detection_toolkit_spark.operators.text import fingerprint

    df = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang", "source", fingerprint(F.col("text")).alias("fingerprint")
    )
    out = salted_sorted_dedup(df, ["fingerprint"], ["doc_id"], n_salts=8)
    return out.select("doc_id", "lang", "source", "fingerprint")


@register("text_winnow_documents")  # rows-only: rolling hash not in SQL
def text_winnow_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anomaly_detection_toolkit_spark.operators.text import winnow_fingerprints

    df = load_table(spark, "documents", sf_dir)
    return winnow_fingerprints(df, k=8, w=4)


@register("pm_rul_model_lineitem")  # rows-only: RF training not in SQL
def pm_rul_model_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ops 48-49 end to end: engineer features, train the Spark ML RUL
    regressor + failure classifier on lineitem-as-asset-panel, score."""
    from anomaly_detection_toolkit_spark.operators.pm_models import (
        FailureClassifier,
        RULEstimator,
    )

    df = load_table(spark, "lineitem", sf_dir)
    feats = pm.prepare_pm_features(
        df,
        asset_id_col="l_orderkey",
        cycle_col="l_linenumber",
        feature_cols=["l_quantity", "l_extendedprice", "l_discount"],
        rolling_window=3,
        warning_threshold=3,
        critical_threshold=1,
        order_cols=["l_linenumber", "l_extendedprice"],
    )
    fcols = ["l_quantity", "l_extendedprice", "l_discount",
             "l_quantity_rolling_mean_3", "l_quantity_rolling_std_3"]
    feats = feats.fillna(0.0, subset=fcols)
    est = RULEstimator(n_estimators=20, max_depth=6).fit(feats, fcols, "RUL")
    clf = FailureClassifier(n_estimators=20, max_depth=6).fit(
        feats, fcols, "binary_label"
    )
    out = clf.predict(est.predict(feats))
    return out.select(
        "l_orderkey",
        "l_linenumber",
        r4(F.col("rul_pred")).alias("rul_pred"),
        "failure_pred",
        r4(F.col("failure_proba")).alias("failure_proba"),
    )
