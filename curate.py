"""spark-submit entry point for the corpus-curation pipeline.

    spark-submit --py-files dist/engine.zip curate.py \
        --input /path/to/documents --output /path/to/curated

The training-data half of the engine, composed end to end:

1. **exact dedup** — first-seen-wins per normalized-text fingerprint
   (one shuffle on the md5 key, map-side partial aggregation);
2. **near-dup dedup** (``--near-dup``) — MinHash banded-LSH pairs →
   connected components → keep each cluster's min-id representative;
3. **quality + language filters** — codegen'd C4/Gopher-style feature
   expressions, ``--quality-min`` threshold; language from the table's
   ``lang`` column or the n-gram heuristic when absent;
4. **mixture sampling** (``--langs en=0.5,de=0.25``) — deterministic
   hash-keyed per-language rates (layout/rerun/cluster-size
   independent; see ``operators/curation.stratified_sample``);
5. **token-budget packing** — concat-and-split layout via the
   distributed prefix scan; writes ``packed/`` (per-doc offsets) and
   ``chunks/`` (per-(chunk, doc) slice table a trainer consumes).

Outputs under ``--output``: ``documents/`` (the curated corpus),
``packed/``, ``chunks/``, and a one-line ``stats.json`` with per-stage
counts. Under spark-submit the cluster master is inherited; run
directly (``python curate.py``) it falls back to local[all-cores].
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

# allow running both from the repo and as a --py-files zip deployment
sys.path.insert(0, str(Path(__file__).resolve().parent))

from anomaly_detection_toolkit_spark.session import get_spark  # noqa: E402


def _parse_rates(spec: str) -> dict[str, float]:
    rates: dict[str, float] = {}
    for part in spec.split(","):
        k, _, v = part.partition("=")
        if not k or not v:
            raise ValueError(f"bad --langs entry {part!r} (want lang=rate)")
        rates[k.strip()] = float(v)
    return rates


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="documents parquet (doc_id, text[, lang])")
    ap.add_argument("--output", required=True, help="output dir (documents/ packed/ chunks/ stats.json)")
    ap.add_argument("--budget", type=int, default=2048, help="tokens per training chunk")
    ap.add_argument(
        "--near-dup",
        action="store_true",
        help="also drop MinHash-LSH near-duplicate clusters (keeps each "
        "cluster's min-id representative); exact dedup always runs",
    )
    ap.add_argument("--jaccard", type=float, default=0.5, help="near-dup est-Jaccard threshold")
    ap.add_argument(
        "--max-bucket",
        type=int,
        default=None,
        metavar="N",
        help="hot-band skew cap for the near-dup LSH join: band "
        "buckets larger than N skip the quadratic pair join (their "
        "members resolve through the linear exact-dup fallback). "
        "Exact dedup has already collapsed identical texts by this "
        "stage, so a hot bucket here means a near-identical template "
        "farm — cap it when one templated domain dominates the crawl",
    )
    ap.add_argument("--quality-min", type=float, default=0.0, help="drop docs below this quality_score")
    ap.add_argument(
        "--langs",
        default=None,
        metavar="L=R,...",
        help="per-language keep rates, e.g. en=0.5,de=0.25; unlisted "
        "languages use --default-rate",
    )
    ap.add_argument("--default-rate", type=float, default=1.0)
    ap.add_argument("--salt", default="", help="sampling salt (independent draws)")
    ap.add_argument("--master", default="inherit")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from anomaly_detection_toolkit_spark.operators import curation, dedup, text

    spark = get_spark("adt-curate", master=args.master)
    t0 = time.perf_counter()
    docs = spark.read.parquet(args.input)
    stats: dict[str, int] = {"input": docs.count()}

    # 1. exact dedup (one shuffle on the fingerprint); keepers joined
    # back to the full rows by id. Persist the deduped corpus ONCE:
    # the stage counts, optional pair generation + anti-join, and the
    # downstream filters all re-read it.
    keep = (
        dedup.exact_duplicates(docs)
        .filter(F.col("is_duplicate") == 0)
        .select("doc_id")
    )
    deduped = docs.join(keep, "doc_id", "left_semi").persist()
    docs = deduped

    # 2. optional near-dup clusters
    if args.near_dup:
        pairs = dedup.minhash_lsh_pairs(
            docs, threshold=args.jaccard, max_bucket=args.max_bucket
        )
        clusters = dedup.connected_components(pairs)
        drop = clusters.filter(F.col("id_a") != F.col("cluster")).select(
            F.col("id_a").alias("doc_id")
        )
        docs = docs.join(drop, "doc_id", "left_anti")
    stats["after_dedup"] = docs.count()

    # 3. quality + language (adds n_tokens, reused by packing below)
    docs = text.quality_features(docs)
    if args.quality_min > 0.0:
        docs = docs.filter(F.col("quality_score") >= args.quality_min)
    if "lang" not in docs.columns:
        docs = text.add_lang_id(docs)
    stats["after_quality"] = docs.count()

    # 4. mixture sampling
    if args.langs:
        docs = curation.stratified_sample(
            docs,
            "lang",
            _parse_rates(args.langs),
            salt=args.salt,
            default_fraction=args.default_rate,
        )
        stats["after_mixture"] = docs.count()

    # 5. pack + write. The curated corpus replaces the dedup-stage
    # cache: packing scans it twice (prefix-sum totals + final) and
    # the writes again. token_col reuses quality_features' n_tokens
    # (same text.token_count definition) so both packing scans are a
    # narrow (doc_id, n_tokens) projection, never re-tokenizing text.
    docs = docs.persist()
    out = args.output.rstrip("/")
    docs.write.mode("overwrite").parquet(f"{out}/documents")
    deduped.unpersist()
    packed = curation.pack_documents(
        docs, budget=args.budget, token_col="n_tokens"
    ).persist()
    packed.write.mode("overwrite").parquet(f"{out}/packed")
    chunks = curation.chunk_assignments(packed, budget=args.budget)
    chunks.write.mode("overwrite").parquet(f"{out}/chunks")
    agg = packed.agg(
        F.count(F.lit(1)).alias("docs"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("tokens"),
    ).first()
    stats["curated"] = int(agg["docs"])
    stats["tokens"] = int(agg["tokens"])
    stats["chunks"] = int(-(-stats["tokens"] // args.budget)) if stats["tokens"] else 0
    packed.unpersist()
    docs.unpersist()

    dt = time.perf_counter() - t0
    with open(f"{out}/stats.json", "w") as f:
        json.dump(stats, f)
    print(
        "curated "
        + " ".join(f"{k}={v}" for k, v in stats.items())
        + f" budget={args.budget} wall={dt:.1f}s outputs={out}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
