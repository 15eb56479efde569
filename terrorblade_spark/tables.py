"""Loaders for the TPC-H-ish test star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under a scale-factor dir.

At 100 TB these would be partitioned/bucketed datasets; the loader is
the single place that would switch to a catalog table or bucketed read,
so every query goes through it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# dimension tables small enough to broadcast at any scale factor
BROADCAST_TABLES = {"region", "nation", "supplier", "part", "customer"}


def _enable_nanos_read(spark: SparkSession) -> None:
    """events.parquet carries TIMESTAMP(NANOS), which Spark's timestamp
    types cannot represent; ``nanosAsLong`` reads it as int64 instead.
    Set it on the *caller's* session (runtime-settable) so any
    externally-created SparkSession — not just get_spark()'s — can read
    the table.

    The session timezone is pinned to UTC for the same caller-session
    reason: the parquet timestamps are naive (isAdjustedToUTC=false) and
    the oracle engine extracts/renders them as-is, while Spark's
    TIMESTAMP_LTZ applies the SESSION timezone to year()/hour()
    extraction and to pandas collection — any non-UTC caller session
    would shift every ts-derived value relative to the oracle."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TIMESTAMP (LTZ) regardless of
    the parquet physical type it arrived as. The test fixtures have
    shipped ``ts`` three different ways across rounds:

    - TIMESTAMP(NANOS)  -> ``bigint`` under nanosAsLong: floor-divide to
      µs (matches DuckDB's internal ns -> µs truncation bit-for-bit);
    - ``timestamp[us]`` naive (isAdjustedToUTC=false) -> TIMESTAMP_NTZ
      in Spark >= 3.4: cast to TIMESTAMP — value-preserving because the
      session tz is pinned to UTC (``_enable_nanos_read``), and required
      because ``unix_millis``/``withWatermark`` reject NTZ;
    - ``timestamp[us]`` UTC-adjusted -> TIMESTAMP already: no-op.

    Every reader of events (batch and stream) must go through this so a
    fixture regeneration can never break event-time queries again.
    """
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif dtype == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a fixture table and standardize it to its DECLARED schema
    (schemas.FIXTURE_TABLES): casts any physically-drifted column back
    to the canonical logical type and restores declared column order.
    Round 2 died to one such drift (events.ts NANOS->NTZ) that only
    ``normalize_ts`` guarded; this generalizes the guard to every
    column of every table. When the physical type already matches,
    Catalyst's SimplifyCasts removes the no-op casts, so pushdown and
    pruning are unchanged (plan-asserted in tests/test_plans.py)."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}")
    from terrorblade_spark.schemas import FIXTURE_TABLES, standardize

    if name == "events":
        _enable_nanos_read(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts needs value-aware conversion (int64-nanos div, NTZ cast)
        # BEFORE the declared-schema cast: a blind bigint->timestamp
        # cast would read nanos as seconds
        df = normalize_ts(df)
    return standardize(df, FIXTURE_TABLES[name])


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure at least ``min_partitions`` (default: cluster parallelism)
    for CPU-heavy downstream ops (hashing, shingling, vector math).

    A small parquet file arrives as ONE split (row groups are the
    split unit), serializing everything after it onto one core. At
    real scale inputs have thousands of splits and this is a no-op —
    it only round-robins when the scan undersupplies parallelism.
    """
    if min_partitions is None:
        min_partitions = df.sparkSession.sparkContext.defaultParallelism
    # .rdd under AQE EXECUTES any upstream shuffle stages just to count
    # partitions — doubling work on plans with joins/aggregations. Only
    # consult .rdd when the non-adaptive physical plan has no Exchange
    # (scan-shaped input, where the count is metadata); shuffled plans
    # already set their parallelism from spark.sql.shuffle.partitions.
    plan = df._jdf.queryExecution().sparkPlan().toString()
    if "Exchange" in plan:
        return df
    if df.rdd.getNumPartitions() < min_partitions:
        return df.repartition(min_partitions)
    return df
