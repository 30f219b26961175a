"""Streaming exact dedup: first-seen-wins fingerprint filter over a
document stream.

The ingest-time twin of ``operators/dedup.exact_duplicates``: a
training-data pipeline that consumes a crawl as a stream wants each
document admitted AT MOST ONCE, decided at arrival, without
re-scanning the corpus. Spark-first: the fingerprint is the same
cross-engine ``md5(normalized text)`` projection (codegen'd), and the
keep-first semantics are Spark's own streaming dedup state operator —
no custom state function needed.

Scale story (the part that matters at 10^12 docs):

- ``dropDuplicatesWithinWatermark`` holds ONE state row per distinct
  fingerprint seen within the watermark horizon and evicts it when
  the watermark passes — bounded state, the only viable shape for an
  endless crawl stream. (Eviction is the micro-batch CLEANUP phase:
  the batch that advances the watermark past a fingerprint still sees
  its state; re-admission of the same text starts one batch later —
  pinned by ``test_streaming_exact_dedup_readmits_after_horizon``.)
  Duplicates further apart than the horizon are
  not caught here; they are exactly what the BATCH LSH/fingerprint
  passes (and ``incremental_lsh_pairs`` against the persistent index)
  sweep on schedule — the two operators are designed as a pair.
- The unbounded variant (``watermark_delay=None``) keeps every
  fingerprint forever: exact global dedup, state grows with the
  distinct corpus — fine for bounded backfills replayed through the
  streaming path, documented unsafe for endless streams.
- State is hash-partitioned on fingerprint by the exchange Spark
  plans for the dedup operator, so hot shingle-free exact dups (the
  skew hazard) spread only as far as their distinct-fingerprint
  count, and the arriving batch is filtered map-side first by the
  projection.

Reference: the toolkit has no streaming dedup; this extends the
training-data pipeline family (build brief) at the streaming ×
dedup intersection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.operators.text import fingerprint


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    event_time_col: str | None = None,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Admit each distinct normalized-text fingerprint once (first
    arrival wins) from a streaming DataFrame.

    With ``event_time_col`` set, uses
    ``dropDuplicatesWithinWatermark`` over that column's watermark —
    bounded per-fingerprint state with eviction (see module
    docstring). Without it, unbounded ``dropDuplicates`` state.
    Emits the admitted rows (all input columns + ``fingerprint``)
    in append mode as they arrive.

    Determinism note: "first" within a single micro-batch follows
    arrival order; replay harnesses that need a bit-stable kept set
    must feed files whose within-file order is the intended priority
    order (the contract query writes batches sorted by ``id_col``).
    """
    out = stream.withColumn("fingerprint", fingerprint(F.col(text_col)))
    if event_time_col is not None:
        out = out.withWatermark(event_time_col, watermark_delay)
        return out.dropDuplicatesWithinWatermark(["fingerprint"])
    return out.dropDuplicates(["fingerprint"])
