"""SparkSession factory.

Defaults are chosen for correctness-on-local + scalability-by-design:
AQE handles runtime re-planning (partition coalescing, skew joins) so
the same plans survive a 1000-executor cluster; Arrow makes the
pandas-UDF boundary columnar; UTC session timezone pins timestamp
semantics to the oracle's (naive/UTC) interpretation.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_JVM_OPTS = (
    "-XX:ReservedCodeCacheSize=1g "
    "-XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=128"
)


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "terrorblade_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """``extra_conf`` overrides/extends the defaults below — the scale
    probes use it to re-enable the UI REST API for shuffle/storage
    accounting (off by default: the UI thread is dead weight in tests
    and the driver harness)."""
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # --- planner / optimizer ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.shuffle.partitions", str(cpus))
        # --- arrow / python boundary ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- semantics ---
        .config("spark.sql.session.timeZone", "UTC")
        # TIMESTAMP(NANOS) parquet (events.ts) is unreadable by Spark's
        # timestamp types; read as long and convert in tables.load_table
        # (DuckDB also truncates ns -> µs internally, so semantics align)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # parquet scans: vectorized reader + pushdown are on by default;
        # cap split size so local[32] actually parallelizes small files
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # whole-stage codegen emits large methods (wide aggregates,
        # hash pipelines); the JVM default 240m JIT code cache fills
        # after a few dozen stages and execution silently falls back to
        # the interpreter (measured 5-25x slowdowns). Size it up on
        # both driver (local mode) and executors (cluster mode).
        # GCLockerRetryAllocationCount: JDK 17's GCLocker throws a
        # spurious heap-space OOM when an allocation retries past the
        # default 2 attempts while JNI critical sections (lz4 shuffle
        # compression) hold off GC — reproduced at 10M docs/32 threads
        # where tasks died "allocating 10 words" with gigabytes
        # reclaimable (probes/minhash_10m_r10.log). Retrying longer is
        # the standard mitigation; JDK 22+ removed the failure mode.
        .config("spark.driver.extraJavaOptions", _JVM_OPTS)
        .config("spark.executor.extraJavaOptions", _JVM_OPTS)
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
