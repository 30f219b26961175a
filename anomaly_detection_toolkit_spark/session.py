"""SparkSession builders tuned for this engine.

Local mode here is a correctness/bench proxy; every config is chosen
to also be the right default on a multi-executor cluster (AQE on,
skew-join on, Arrow on, UTC session TZ for cross-engine parity).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "adt-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    cpus: local parallelism (defaults to $SPARK_GRAFT_CPUS or all cores).
    shuffle_partitions: defaults to max(cpus, 32) locally. On a real
    cluster this should be ~2-3x total executor cores; AQE coalesces
    small post-shuffle partitions either way.
    master: ``None`` → ``local[cpus]``; ``"inherit"`` → leave unset so
    ``spark-submit --master ...`` (cluster mode) controls it.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 32)
    builder = SparkSession.builder
    if master != "inherit":
        builder = builder.master(master or f"local[{cpus}]")
    builder = (
        builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Image payload batches can be MBs per row group; keep Arrow
        # batches bounded so the Python decode workers stay small.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # 56g: the 500k-image bench table is 4.3GB parquet ≈ 10-17GB
        # as in-memory columnar cache; a 24g heap's ~14GB storage pool
        # silently evicted it under shuffle pressure, so the
        # "input persisted" bench methodology degraded to virtio disk
        # re-reads. The box has 125GB; on a real cluster the submit
        # conf / this env var overrides.
        .config("spark.driver.memory", os.environ.get("ADT_SPARK_DRIVER_MEM", "56g"))
        # Split scans finer than the 128MB default: payload rows are
        # ~35KB so a 128MB split holds ~4k images ≈ seconds of Python
        # decode — with GB-scale local tables that caps scan
        # parallelism below the core count. 16MB keeps ≥2 tasks/core
        # at bench sizes; on a real cluster file counts make this moot
        # but finer splits only add negligible scheduling overhead.
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.files.openCostInBytes", "1m")
        # This host's JDK17 AVX-512 arraycopy stubs are unstable under
        # heavy BINARY-column Arrow traffic (observed SIGSEGV in
        # jlong_disjoint_arraycopy_avx3 + progressive slowdown);
        # capping at AVX2 is the documented JVM workaround.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("ADT_SPARK_JVM_OPTS", "-XX:UseAVX=2"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
