"""Detector evaluation metrics as single-pass Spark aggregations.

Re-expression of ``/root/reference/src/anomaly_detection_toolkit/
evaluation.py`` without sklearn:

- confusion counts = FOUR conditional sums in ONE HashAggregate pass
  (``evaluation.py:215-246``);
- accuracy / precision / recall / F1 closed-form from those counts
  with sklearn's ``zero_division=0`` behaviour
  (``evaluation.py:146-153``);
- ROC-AUC via the Mann-Whitney U statistic — sklearn's
  ``roc_auc_score`` equals ``(Σ avg-rank of positives − n₊(n₊+1)/2)
  / (n₊·n₋)`` where ties get the AVERAGE rank; computed with two
  window ranks (no driver-side sort). One class only → 0.0
  (``evaluation.py:162-166``);
- lead time (``evaluation.py:12-109``): events = 0→1 rises of the
  truth series (lag window); per event, the LAST detection at or
  before the event via a running-max window — the as-of-join
  re-expressed as a window so no join is needed; stats over positive
  lead times only, early/late counts per the reference's exact rules.

All operators take a DataFrame with explicit column names and an
explicit ordering column where order matters (Spark has no implicit
row order — SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.functions.localrel import local_rows_df


def _true_binary(y: Column) -> Column:
    """Reference remap: (y == 1) if any y==1 else y — for 0/1 labels
    the two branches agree, so the expression form is just (y == 1)."""
    return (y == 1).cast("int")


def confusion_counts(
    df: DataFrame,
    pred_col: str = "verdict",
    label_col: str = "y_true",
    weight_col: str | None = None,
) -> DataFrame:
    """One-row DataFrame of TP/TN/FP/FN (``evaluation.py:215-246``);
    pred uses the -1 = anomaly encoding, labels are 0/1.
    ``weight_col`` makes each input row stand for that many observed
    rows — the pre-aggregated path ``compare_detectors`` uses so one
    scored-table scan serves every metric family."""
    p = (F.col(pred_col) == -1).cast("int")
    t = _true_binary(F.col(label_col))
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    return df.agg(
        F.sum(F.when((p == 1) & (t == 1), w).otherwise(0)).alias("true_positives"),
        F.sum(F.when((p == 0) & (t == 0), w).otherwise(0)).alias("true_negatives"),
        F.sum(F.when((p == 1) & (t == 0), w).otherwise(0)).alias("false_positives"),
        F.sum(F.when((p == 0) & (t == 1), w).otherwise(0)).alias("false_negatives"),
    )


def classification_metrics(
    df: DataFrame,
    pred_col: str = "verdict",
    label_col: str = "y_true",
    weight_col: str | None = None,
) -> DataFrame:
    """One row: accuracy/precision/recall/f1 (zero_division → 0.0),
    derived from the confusion counts in the SAME single agg pass."""
    cm = confusion_counts(df, pred_col, label_col, weight_col)
    tp, tn = F.col("true_positives"), F.col("true_negatives")
    fp, fn = F.col("false_positives"), F.col("false_negatives")
    n = tp + tn + fp + fn
    precision = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(F.lit(0.0))
    recall = F.when(tp + fn > 0, tp / (tp + fn)).otherwise(F.lit(0.0))
    f1 = F.when(
        (tp + fp > 0) & (tp + fn > 0) & (tp > 0),
        2.0 * (tp / (tp + fp)) * (tp / (tp + fn))
        / ((tp / (tp + fp)) + (tp / (tp + fn))),
    ).otherwise(F.lit(0.0))
    return cm.select(
        (F.when(n > 0, (tp + tn) / n).otherwise(F.lit(0.0))).alias("accuracy"),
        precision.alias("precision"),
        recall.alias("recall"),
        f1.alias("f1"),
        tp,
        tn,
        fp,
        fn,
    )


def roc_auc(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "y_true",
    weight_col: str | None = None,
) -> DataFrame:
    """One row ``(roc_auc double)`` — rank-based Mann-Whitney AUC,
    exact under ties, with NO single-reducer global rank.

    The row-level average rank under ties only depends on per-score
    aggregates: for a distinct score s with n_s rows and C(s) rows
    strictly below it, every row at s has avg_rank = C(s)+(n_s+1)/2.
    So the plan is a distributed two-phase scan (the classic parallel
    prefix sum), never a whole-data ordered window:

    1. ``groupBy(score)`` → (n_pos, n) per distinct score — ordinary
       partial-aggregated shuffle;
    2. ``repartitionByRange(score)`` the distinct-score table, cumsum
       WITHIN each range partition (window partitioned by
       ``spark_partition_id`` — parallel, range partitions are
       disjoint and ordered);
    3. per-partition totals (≤ shuffle.partitions rows) collect to the
       driver, their running sum is each partition's offset, broadcast
       back — C(s) = offset + within-partition cumsum − n_s.

    rank_sum = Σ n_pos(s)·avg_rank(s). Rank sums are exact
    half-integers in doubles (test-scale; at 10^12 rows the sum
    saturates double precision identically in any formulation).
    One class present → 0.0. Parity: ``evaluation.py:61-88``.
    """
    s = F.col(score_col).cast("double")
    t = _true_binary(F.col(label_col))
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    base = df.select(t.alias("t"), s.alias("s"), w.alias("w"))
    g = base.groupBy("s").agg(
        F.sum(F.when(F.col("t") == 1, F.col("w")).otherwise(0)).alias("np"),
        F.sum("w").alias("n"),
    )
    part = g.repartitionByRange("s").withColumn("pid", F.spark_partition_id())
    w = Window.partitionBy("pid").orderBy("s")
    part = part.withColumn("cum_in", F.sum("n").over(w)).persist()
    totals = sorted(
        part.groupBy("pid").agg(F.sum("n").alias("tot")).collect(),
        key=lambda r: r["pid"],
    )
    offsets, acc = [], 0
    for r in totals:
        offsets.append((int(r["pid"]), acc))
        acc += int(r["tot"])
    spark = df.sparkSession
    # literal relation, not a pickled RDD (functions/localrel.py)
    off_df = local_rows_df(spark, offsets or [(0, 0)], "pid int, off long")
    ranked = part.join(F.broadcast(off_df), "pid").select(
        "np",
        "n",
        (
            F.col("off") + (F.col("cum_in") - F.col("n")) + (F.col("n") + 1) / 2.0
        ).alias("avg_rank"),
    )
    # materialize WHILE `part` is pinned: the offsets above were read
    # from this exact range partitioning — an unpinned recompute could
    # resample the range boundaries under the final aggregate and
    # misalign the offsets. The result is one scalar; eager is free.
    row = ranked.agg(
        F.sum(F.col("np") * F.col("avg_rank")).alias("rank_sum"),
        F.sum("np").alias("n_pos"),
        F.sum(F.col("n") - F.col("np")).alias("n_neg"),
    ).first()
    part.unpersist(blocking=False)
    auc = 0.0
    if row["n_pos"] and row["n_neg"]:
        n_pos, n_neg = int(row["n_pos"]), int(row["n_neg"])
        auc = (float(row["rank_sum"]) - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    return local_rows_df(spark, [(float(auc),)], "roc_auc double")


def lead_time_metrics(
    df: DataFrame,
    pred_col: str = "verdict",
    label_col: str = "y_true",
    ts_col: str = "ts",
    partition_by: list[str] | None = None,
    order_by: list[str] | None = None,
) -> DataFrame:
    """Lead-time stats per the reference's exact rules
    (``evaluation.py:12-109``):

    - event rows: truth rises 0→1 vs the previous row (lag window);
    - per event, the last detection at or before it: running max of
      detection timestamps over an unbounded-preceding window (the
      windowed as-of join — no shuffle beyond the one sort);
    - lead = ts(event) − ts(last detection ≤ event); lead == 0 is
      dropped entirely; positive feeds the stats + early count;
      negative only counts as late (possible only with non-monotone
      timestamps, kept for parity);
    - no events or no detections → all-zero metrics row.

    Output: one row (mean/median/min/max lead_time, early_detections,
    late_detections). ``partition_by`` evaluates per series and is
    how this scales (the global variant sorts one partition).
    """
    part = partition_by or []
    # explicit ordering key with a deterministic tie-break (SURVEY
    # §7.3: Spark has no implicit row order; ties in ts would make
    # lag/running-max nondeterministic)
    order_cols = order_by or [ts_col]
    t = _true_binary(F.col(label_col))
    p = (F.col(pred_col) == -1).cast("int")
    # timestamp columns → epoch seconds (TIMESTAMP_NTZ has no direct
    # double cast in Spark 4; the session TZ is pinned UTC so the
    # intermediate TIMESTAMP cast matches DuckDB's epoch())
    ts_type = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields).get(
        ts_col, ""
    )
    ts = F.col(ts_col)
    if "timestamp" in ts_type:
        ts = ts.cast("timestamp")
    ts = ts.cast("double")
    o_names = [f"_o{i}" for i in range(len(order_cols))]
    base = df.select(
        *part,
        *[F.col(c).alias(n) for c, n in zip(order_cols, o_names)],
        ts.alias("_ts"),
        t.alias("_t"),
        p.alias("_p"),
    )
    order = (
        Window.partitionBy(*part).orderBy(*o_names) if part else Window.orderBy(*o_names)
    )
    run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_det = base.withColumn("_prev_t", F.lag("_t", 1).over(order)).withColumn(
        "_last_det_ts", F.max(F.when(F.col("_p") == 1, F.col("_ts"))).over(run)
    )
    # np.diff starts at the (0,1) pair, so a series that BEGINS at 1 is
    # not an event — the NULL _prev_t of the first row fails == 0 here
    events = with_det.filter((F.col("_t") == 1) & (F.col("_prev_t") == 0))
    leads = events.select(
        (F.col("_ts") - F.col("_last_det_ts")).alias("lead")
    ).filter(F.col("lead").isNotNull() & (F.col("lead") != 0))
    agg = leads.agg(
        F.avg(F.when(F.col("lead") > 0, F.col("lead"))).alias("mean_lead_time"),
        F.percentile(F.when(F.col("lead") > 0, F.col("lead")), F.lit(0.5)).alias(
            "median_lead_time"
        ),
        F.min(F.when(F.col("lead") > 0, F.col("lead"))).alias("min_lead_time"),
        F.max(F.when(F.col("lead") > 0, F.col("lead"))).alias("max_lead_time"),
        F.sum((F.col("lead") > 0).cast("long")).alias("early_detections"),
        F.sum((F.col("lead") < 0).cast("long")).alias("late_detections"),
    )
    return agg.select(
        F.coalesce(F.col("mean_lead_time"), F.lit(0.0)).alias("mean_lead_time"),
        F.coalesce(F.col("median_lead_time"), F.lit(0.0)).alias("median_lead_time"),
        F.coalesce(F.col("min_lead_time"), F.lit(0.0)).alias("min_lead_time"),
        F.coalesce(F.col("max_lead_time"), F.lit(0.0)).alias("max_lead_time"),
        F.coalesce(F.col("early_detections"), F.lit(0)).cast("long").alias("early_detections"),
        F.coalesce(F.col("late_detections"), F.lit(0)).cast("long").alias("late_detections"),
    )


def compare_detectors(
    df: DataFrame,
    detectors: dict[str, "object"],
    cols: list[str],
    label_col: str = "y_true",
) -> DataFrame:
    """Per-detector metric rows (``evaluation.py:176-212``): fit +
    transform each member, compute metrics, union the 1-row frames.

    Scale: each member's scored projection is reduced to ONE grouped
    pass — `(score, verdict, label) → count` — and both metric
    families read that tiny weighted table (persisted), so a detector
    costs fit + a single scoring scan, not one scan per metric."""
    rows = []
    spark = df.sparkSession
    for name, det in detectors.items():
        scored = det.fit(df, cols).transform(df)
        g = (
            scored.groupBy(
                F.col("score").cast("double").alias("score"),
                F.col("verdict").alias("verdict"),
                _true_binary(F.col(label_col)).alias("t"),
            )
            .agg(F.count(F.lit(1)).alias("c"))
            .persist()
        )
        # both metric families materialize WHILE g is pinned (the
        # metric rows are scalars; eager is free) — one scoring scan
        # per detector total
        m = classification_metrics(g, "verdict", "t", weight_col="c").first()
        a = roc_auc(g, "score", "t", weight_col="c").first()
        g.unpersist(blocking=False)
        rows.append((name, *m, a["roc_auc"]))
    return local_rows_df(
        spark,
        rows,
        "detector string, accuracy double, precision double, recall double, "
        "f1 double, true_positives long, true_negatives long, "
        "false_positives long, false_negatives long, roc_auc double",
    )
