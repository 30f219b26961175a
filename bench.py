"""Benchmark entry point (driver-run per round).

Runs the headline workloads and prints ONE JSON line:
``{"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "images_per_sec": ...}``

Workloads:
- ``validation_suite``: the north-star job — full check suite
  (schema, column stats, uniqueness x2, referential, drift, payload
  decode) over a deterministic synthetic image+caption table
  (generated once into ``.bench_cache/`` and reused).
- every driver-contract query from ``entry_queries`` at
  ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1), executed to
  a ``noop`` sink so the whole plan is computed (a bare ``count()``
  would let Catalyst prune the projections we're measuring).

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, ADT_BENCH_IMAGES
(default 20000), ADT_BENCH_PARTS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from anomaly_detection_toolkit_spark.session import get_spark  # noqa: E402


def _noop_write(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _load1() -> float:
    """1-minute loadavg — the co-tenant burst annotation. This host's
    background load swings 0→14 within minutes (CLAUDE.md); recording
    it with every timed section lets quiet-window records be told
    apart from burst-window reruns instead of hand-checking uptime."""
    return round(os.getloadavg()[0], 2)


def _round_number() -> int:
    """Current build round. An explicit override (``--round N`` argv
    or ``ADT_BENCH_ROUND`` env) wins; otherwise inferred from the
    driver's committed BENCH_r{N}.json records (next = max present
    + 1). The inference is correct during a round's build phase but
    off by one for a re-run AFTER the driver has already written this
    round's BENCH_r{N}.json — the override exists so such a rerun can
    still append to the right append-only BENCH/queries_r{N}.json
    instead of silently splitting the per-round history."""
    import re

    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--round":
            if i + 1 >= len(argv):
                raise SystemExit("bench.py: --round needs a value")
            return int(argv[i + 1])
        if a.startswith("--round="):
            return int(a.split("=", 1)[1])
    if os.environ.get("ADT_BENCH_ROUND"):
        return int(os.environ["ADT_BENCH_ROUND"])
    rounds = [
        int(m.group(1))
        for p in REPO.glob("BENCH_r*.json")
        if (m := re.match(r"BENCH_r(\d+)\.json$", p.name))
    ]
    return (max(rounds) + 1) if rounds else 1


def append_round_record(record: dict) -> Path:
    """Append ``record`` to the round's APPEND-ONLY
    ``BENCH/queries_r{N}.json`` (shared by bench.py and
    tools/suite_stress.py so the two writers cannot drift).

    A corrupt/truncated existing file (a crashed writer mid
    ``write_text``) is PRESERVED under ``.corrupt-<n>`` before a
    fresh list starts — the per-round evidence trail must never be
    silently destroyed by a rescue write."""
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    round_file = bench_dir / f"queries_r{_round_number():02d}.json"
    history: list = []
    if round_file.exists():
        try:
            history = json.loads(round_file.read_text())
            if not isinstance(history, list):  # pragma: no cover
                history = [history]
        except (OSError, ValueError) as e:
            # never lose the just-measured record to a bad history
            # file: preserve a corrupt one under .corrupt-<n>; if even
            # the read/rename fails (permissions, replaced by a dir),
            # warn and write a fresh history
            try:
                n = 0
                while (keep := Path(f"{round_file}.corrupt-{n}")).exists():
                    n += 1
                round_file.rename(keep)
                note = f"preserved as {keep.name}"
            except OSError:
                note = "could not be preserved"
            print(
                f"bench: {round_file.name} was unreadable ({e!r}) — "
                f"{note}, starting a fresh history",
                file=sys.stderr,
            )
    history.append(record)
    round_file.write_text(json.dumps(history, indent=1))
    return round_file


def ensure_image_table(spark, n: int, n_parts: int) -> str:
    """Generate the bench image table once; reuse across rounds."""
    path = str(REPO / ".bench_cache" / f"images_n{n}_p{n_parts}")
    marker = Path(path) / "_SUCCESS"
    if not marker.exists():
        from anomaly_detection_toolkit_spark.sources import images

        images.write_images(spark, path, n, n_parts=n_parts)
    return path


def host_speed_probe(procs: int = 8) -> float:
    """Seconds for a fixed raw-numpy multiprocessing workload.

    This sandbox's shared host swings 2-4x between quiet and busy
    windows (BENCH/BASELINE.md notes); recording the host's own speed
    alongside the suite numbers lets round-over-round comparisons be
    normalized instead of mistaking host noise for regressions.
    """
    import multiprocessing as mp

    from tools.scaling_bench import _numpy_work

    with mp.Pool(procs) as p:
        p.map(abs, range(procs))  # warm workers
        t0 = time.perf_counter()
        p.map(_numpy_work, range(64))
        return round(time.perf_counter() - t0, 3)


def bench_validation_suite(spark, img_path: str, runs: int = 2) -> tuple[float, int]:
    from anomaly_detection_toolkit_spark.plans.checks import default_suite
    from anomaly_detection_toolkit_spark.plans.runner import run_suite

    # input persisted: same methodology as BENCH/BASELINE.md — measure
    # engine throughput, not this sandbox's virtio re-read throttling
    df = spark.read.parquet(img_path).persist()
    n_images = df.count()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        result = run_suite(df, default_suite())
        _noop_write(result.violations)
        _noop_write(result.verdicts)
        _noop_write(result.metrics)
        best = min(best, time.perf_counter() - t0)
        result.unpersist()
    df.unpersist()
    return best, n_images


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    n_images = int(os.environ.get("ADT_BENCH_IMAGES", "100000"))
    n_parts = int(os.environ.get("ADT_BENCH_PARTS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    spark = get_spark("adt-bench", cpus=cpus)

    timings: dict[str, float] = {}
    loads: dict[str, list[float]] = {}
    load_pre_all = _load1()

    img_path = ensure_image_table(spark, n_images, n_parts)
    # best-of-3: this sandbox's wall times swing ±2x with page-cache /
    # steal-time state, and the suite is the headline number
    loads["validation_suite"] = [_load1()]
    suite_sec, n_img = bench_validation_suite(spark, img_path, runs=3)
    loads["validation_suite"].append(_load1())
    timings["validation_suite"] = round(suite_sec, 3)

    # skewed-key dedup: 2M rows, 40% sharing ONE key — the hot-phash
    # shape the north rule names; exercises the salted repartition +
    # sort-within-partition plan end to end
    from pyspark.sql import functions as F

    from anomaly_detection_toolkit_spark.operators.salted import salted_sorted_dedup

    skewed = spark.range(0, 2_000_000, 1, 64).select(
        F.when(F.col("id") % 5 < 2, F.lit(0xC0FFEE)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("o"),
    )
    t0 = time.perf_counter()
    _noop_write(salted_sorted_dedup(skewed, ["k"], ["o"], n_salts=16))
    timings["salted_dedup_skewed_2m"] = round(time.perf_counter() - t0, 3)

    # hot-band LSH: 200k docs, 40% ONE viral template — the flood
    # floods its band buckets; max_bucket routes it through the linear
    # exact-dup fallback (uncapped, the flooded buckets alone would
    # emit ~3.2e9 candidate pairs and the run would not finish)
    from anomaly_detection_toolkit_spark.operators.dedup import minhash_lsh_pairs

    hot_docs = spark.range(0, 200_000, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 5 < 2,
            F.lit("breaking viral template text shared by every copy of this page"),
        )
        .otherwise(
            F.concat_ws(
                " ",
                F.lit("doc"),
                *[
                    F.concat(
                        F.lit(f"w{j}x"),
                        (F.col("id") * (7919 + 13 * j) + j * j).cast("string"),
                    )
                    for j in range(8)
                ],
            )
        )
        .alias("text"),
    )
    t0 = time.perf_counter()
    _noop_write(
        minhash_lsh_pairs(hot_docs, num_perm=16, bands=4, max_bucket=256)
    )
    timings["lsh_dedup_hot_template_200k"] = round(time.perf_counter() - t0, 3)
    spark.catalog.clearCache()

    # token-packing prefix scan at 2M docs: times the two-phase
    # parallel prefix sum (bucketed windows + broadcast offsets) that
    # replaces a single-reducer global window; token counts are
    # precomputed so the scan itself is what's measured
    from anomaly_detection_toolkit_spark.operators import curation

    docs2m = spark.range(0, 2_000_000, 1, 64).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 2654435761, F.lit(997)) + 1).alias("ntok"),
    )
    t0 = time.perf_counter()
    _noop_write(curation.pack_documents(docs2m, budget=2048, token_col="ntok"))
    timings["pack_prefix_scan_2m"] = round(time.perf_counter() - t0, 3)

    from anomaly_detection_toolkit_spark import entry_queries

    # untimed warm-up so per-query numbers measure steady state, not
    # one-time session init: the first mapInPandas pays ~10s of Python
    # worker spin-up and the first streaming query ~8s of state-store
    # machinery init (measured: streaming_drift 13.3s cold / 4.6s warm
    # in one JVM) — costs that belong to the session, not to whichever
    # query alphabetically happens to run first
    _noop_write(
        spark.range(0, 256, 1, cpus).mapInPandas(
            lambda bs: (pdf for pdf in bs), schema="id long"
        )
    )
    _warm = tempfile.mkdtemp(prefix="adt_warm_")
    _src = os.path.join(_warm, "in")
    os.makedirs(_src)
    with open(os.path.join(_src, "w.json"), "w") as f:
        f.write('{"v": 1.0}\n')
    (
        spark.readStream.schema("v double")
        .json(_src)
        .writeStream.format("noop")
        .option("checkpointLocation", os.path.join(_warm, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )

    failed: list[str] = []
    for name, fn in sorted(entry_queries.QUERIES.items()):
        t0 = time.perf_counter()
        # one broken query must not cost the round its ENTIRE bench
        # record — log it, keep timing the rest (the correctness gate
        # reports the breakage separately and louder)
        try:
            _noop_write(fn(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"BENCH QUERY FAILED {name}: {e!r}", file=sys.stderr)
        # queries that persist intermediates (dedup/LOF/suite) would
        # otherwise leak cache memory into every later measurement
        spark.catalog.clearCache()

    # like-for-like headline vs BENCH/BASELINE.md (500k images): runs
    # LAST so its multi-GB cache churn can't pollute the per-query
    # timings above. The cached table does NOT survive round
    # boundaries (round 3 started without it and the first bench run
    # silently lost the headline), so generate it when absent — ~4 min
    # once, OUTSIDE the timed section, skippable via ADT_BENCH_NO_500K.
    img_500k = None
    if not os.environ.get("ADT_BENCH_NO_500K"):
        try:
            big_path = ensure_image_table(spark, 500_000, 32)
            # drop caches the contract queries leaked so the 500k suite
            # measures from a clean executor-memory state
            spark.catalog.clearCache()
            loads["validation_suite_500k"] = [_load1()]
            sec_500k, n_500k = bench_validation_suite(spark, str(big_path), runs=3)
            loads["validation_suite_500k"].append(_load1())
            timings["validation_suite_500k"] = round(sec_500k, 3)
            img_500k = round(n_500k / sec_500k, 1)
        except Exception as e:  # noqa: BLE001 — keep the headline alive
            failed.append("validation_suite_500k")
            print(f"BENCH 500K SUITE FAILED: {e!r}", file=sys.stderr)

    # the 500k suite is an optional cache-dependent extra — keep it
    # out of `total` so the headline is comparable across machines
    total = round(
        sum(v for k, v in timings.items() if k != "validation_suite_500k"), 3
    )
    # full per-query timing map goes to a FILE: the round-2 headline
    # line carried 57 query timings (~2.3 KB) and overflowed the
    # driver's tail capture (BENCH_r02.json "parsed": null)
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    # non-default scale factors (debug runs) must not stomp the
    # canonical sf0.1 record the docs and the judge read
    per_query_name = (
        "queries_latest.json" if sf == "0.1" else f"queries_sf{sf}.json"
    )
    record = {
        "ts": round(time.time(), 1),
        "sf": sf,
        "cpus": cpus,
        "load1_pre": load_pre_all,
        "load1_post": _load1(),
        "suite_loads": loads,
        "queries": timings,
    }
    (bench_dir / per_query_name).write_text(json.dumps(record, indent=1))
    # append-only per-round history: noisy reruns (the driver's bench
    # invocation can land in a co-tenant burst window) ADD a record
    # with their load annotation instead of overwriting the committed
    # quiet-window numbers — queries_latest.json is just "most recent",
    # queries_r{N}.json is the full evidence trail for round N
    if sf == "0.1":
        append_round_record(record)
    # stop the JVM BEFORE printing: stray executor log lines (GC
    # warnings etc.) on stdout after the JSON would corrupt a
    # take-the-last-line parse of the bench output. The headline line
    # itself stays COMPACT (<300 bytes) so tail capture can't cut it.
    spark.stop()
    # host-state probe AFTER the JVM is gone so it measures the box,
    # not contention with our own executors
    host_sec = host_speed_probe()
    print(
        json.dumps(
            {
                "metric": "validation suite + driver queries wall-time",
                "value": total,
                "host_numpy_8p_sec": host_sec,
                "unit": "sec",
                "queries": {
                    "validation_suite": timings["validation_suite"],
                    **(
                        {"validation_suite_500k": timings["validation_suite_500k"]}
                        if "validation_suite_500k" in timings
                        else {}
                    ),
                },
                "sf": sf,
                "images": n_img,
                "images_per_sec": round(n_img / suite_sec, 1),
                **({"images_per_sec_500k": img_500k} if img_500k else {}),
                "cpus": cpus,
                "load1": [load_pre_all, record["load1_post"]],
                "per_query_file": f"BENCH/{per_query_name}",
                **({"failed_queries": failed} if failed else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
