"""Storage layout + skew operators — the physical-design half of the
100 TB story.

The reference's layout is one DuckDB file of per-tenant tables
(telegram_database.py:618-636). At cluster scale layout IS the
optimization:

- ``write_partitioned``: hive-partition by low-cardinality columns
  (tenant, date) so predicate pushdown becomes partition PRUNING —
  a `WHERE phone=?` query never opens other tenants' files.
- ``write_bucketed``: pre-shuffle by join key into N buckets at write
  time. Two tables bucketed the same way join with ZERO exchange
  (asserted in tests/test_scale_ops.py) — the reference's
  messages ⋈ clusters ⋈ embeddings joins (SURVEY §2.3 J1/J4) happen
  per ingest batch, so paying the shuffle once at write time wins.
- ``salted_agg``: two-phase aggregation for skewed keys (one chat with
  100M messages would pin a single reducer). Phase 1 aggregates
  (key, salt) partials, phase 2 merges per key — correct for any
  algebraic aggregate; AQE's skew handling covers joins, this covers
  aggregations.
- ``salted_join``: replicate the small side across salts so a skewed
  big side spreads over ``factor`` reducers per hot key.
- ``cluster_write``: range-clustered sorted files — parquet min/max
  stats become zone maps for high-cardinality range keys.
- ``compact``: rewrite micro-batch debris into target-sized files.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet: queries filtering on ``partition_cols``
    prune whole directories (partition pruning, not just row-group
    pushdown)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (bucketBy requires saveAsTable). Joins and
    aggregations on ``bucket_cols`` between co-bucketed tables need no
    exchange; ``sort_cols`` additionally pre-sorts within buckets so
    sort-merge joins skip the sort."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def cluster_write(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-clustered sorted write: rows are range-partitioned on
    ``cluster_cols`` (each output file owns a disjoint key range) and
    sorted within files, so parquet row-group min/max stats become
    zone maps — a point or range predicate on the cluster key prunes
    every file/row-group whose range can't match, BEFORE any row is
    decoded.

    This is the third layout lever next to hive partitioning (low-
    cardinality columns only — one directory per value) and bucketing
    (join co-location): clustering handles HIGH-cardinality range keys
    (timestamps, ids) where a directory per value is absurd but scans
    are range-selective. The write costs one range-exchange (with a
    sampling pass to pick balanced bounds) — paid once, amortized over
    every subsequent pruned scan.
    """
    if n_files is None:
        n_files = df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in cluster_cols]
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )


def zorder_expr(
    df: DataFrame, cluster_cols: Sequence[str], bits: int = 6, rel_err: float = 0.01
) -> Column:
    """Z-value (Morton code) over ``cluster_cols``: each column is
    rank-bucketed into 2^bits equi-depth buckets and the bucket bits
    are interleaved, so sorting by the result clusters rows that are
    close in EVERY dimension.

    Equi-depth (not equi-width) bucketing is what makes this work on
    skewed real data: boundaries come from ``approxQuantile`` — a
    sampling sketch pass whose output is 2^bits-1 numbers of METADATA
    on the driver, not data — so each bucket holds ~1/2^bits of the
    rows regardless of the value distribution. All cluster columns are
    rank-bucketed through a ``double`` cast (timestamps/dates become
    epoch seconds — approxQuantile itself only accepts numerics), and
    ALL columns' boundaries come from ONE multi-column quantile job,
    not one scan per dimension.
    """
    dims = len(cluster_cols)
    n_b = (1 << bits) - 1  # boundaries between 2^bits buckets
    probs = [i / (n_b + 1) for i in range(1, n_b + 1)]
    casted = df.select(
        *[F.col(c).cast("double").alias(f"__zc_{i}") for i, c in enumerate(cluster_cols)]
    )
    all_bounds = casted.stat.approxQuantile(
        [f"__zc_{i}" for i in range(dims)], probs, rel_err
    )
    from terrorblade_spark.functions.exprs import boundary_bucket

    buckets = [
        boundary_bucket(F.col(c).cast("double"), bounds)
        for c, bounds in zip(cluster_cols, all_bounds)
    ]
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i, bk in enumerate(buckets):
            bit = F.shiftright(bk, j).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, j * dims + i)
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    bits: int = 6,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Z-order clustered write: the multi-column generalization of
    ``cluster_write``. Linear range-clustering on (a, b) prunes
    perfectly on ``a`` but not at all on ``b`` alone; interleaving the
    two keys' bits gives every file a tight min/max envelope in BOTH
    dimensions, so predicates on either column (or a 2-D box) prune
    ~sqrt-of-files instead of none. The standard layout for
    multi-tenant + time, or (user, time) access patterns where neither
    key dominates.

    Costs one sketch pass (quantile boundaries) + one range exchange —
    same write-side price as ``cluster_write``.
    """
    if n_files is None:
        n_files = df.sparkSession.sparkContext.defaultParallelism
    z = zorder_expr(df, cluster_cols, bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def compact(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    preserve_sort: Sequence[str] | None = None,
) -> int:
    """Small-file compaction: rewrite ``src_path`` into files of
    ~``target_file_bytes``. Streaming/incremental ingest produces one
    file per micro-batch per partition; at 100 TB that is millions of
    KB-sized files whose per-file open/footer overhead dominates scans
    and crushes the driver's split enumeration. Returns the file count
    written.

    Sizing uses the SOURCE's on-disk bytes (file metadata, no data
    read). With ``preserve_sort`` the rewrite goes through
    ``cluster_write`` to keep zone-map clustering; otherwise a plain
    coalesce-style repartition (round-robin, no skew) suffices.
    """
    import math

    # size via the Hadoop FileSystem API, not os.walk: a URI or remote
    # path (hdfs://, s3a://, file://) walks to 0 bytes locally and the
    # whole dataset would silently collapse into ONE file
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(hpath).getLength()
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_path)
    if preserve_sort:
        cluster_write(df, dst_path, preserve_sort, n_files=n_files)
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    return n_files


def with_salt(df: DataFrame, n_salts: int, out_col: str = "__salt") -> DataFrame:
    """Uniform random salt column in [0, n_salts). Deterministic given
    Spark's fixed-seed rand? No — use a hash of the whole row id when
    determinism matters; for load-spreading, rand() is the right tool
    (salt values never appear in results)."""
    return df.withColumn(out_col, (F.rand(seed=42) * n_salts).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed grouping keys.

    ``partial_aggs``: name -> aggregate over the raw rows (phase 1,
    grouped by keys+salt — hot keys split across ``n_salts`` reducers).
    ``merge_aggs``: name -> aggregate over the phase-1 partials
    (phase 2, grouped by keys alone — at most ``n_salts`` rows per key).

    Example: count -> partial count(*) + merge sum; sum -> sum + sum;
    min/max -> min/max + min/max; avg -> (sum, count) partials.
    """
    salted = with_salt(df, n_salts)
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(n) for n, c in partial_aggs.items()]
    )
    return phase1.groupBy(*keys).agg(*[c.alias(n) for n, c in merge_aggs.items()])


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, explode the small side
    across all salt values, join on keys+salt. Each hot key's rows
    spread over ``n_salts`` tasks instead of one straggler.

    (AQE's skewJoin handles this adaptively for sort-merge joins; this
    explicit form documents the technique.) Supported joins: inner and
    any left-* variant — the big side carries one salt per row, so its
    semantics are preserved. Right/full outer are REFUSED: the small
    side is replicated across every salt, and each unmatched replica
    would surface as its own null-extended output row (n_salts-fold
    phantom duplication). Salt the other way around for those.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left joins, not how={how!r}: the "
            "replicated small side would duplicate unmatched rows"
        )
    b = with_salt(big, n_salts)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = b.join(s, on=[*keys, "__salt"], how=how)
    return out.drop("__salt")


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int = 64,
    seed: str = "export-v1",
    mode: str = "error",
) -> DataFrame:
    """Deterministic JSONL export — the interchange format training
    stacks read. Rows are assigned to shards and ordered within them
    by the seeded corpus shuffle (operators/sampling.shuffle_corpus:
    shard and position are pure functions of (seed, key), so a re-run
    on any cluster produces byte-identical shard contents), written as
    one JSONL directory per ``shard=NN`` partition with each file in
    reading order. A ``_manifest`` parquet directory beside the data
    records (shard, n_rows) — the reader's integrity check and
    dataloader work-assignment table.

    Returns the manifest DataFrame. Scale shape: one hash projection,
    one shard-partitioned window, one shuffle to co-locate shards —
    never a global sort or single-partition pass.
    """
    import os

    from terrorblade_spark.operators.sampling import shuffle_corpus

    shuffled = shuffle_corpus(df, key_col, seed=seed, n_shards=n_shards)
    (
        shuffled.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode(mode)
        .partitionBy("shard")
        .json(path)
    )
    manifest = shuffled.groupBy("shard").agg(F.count(F.lit(1)).alias("n_rows"))
    manifest.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "_manifest"))
    return manifest


def read_jsonl_shards(
    spark,
    path: str,
    validate: bool = True,
) -> DataFrame:
    """Read a :func:`write_jsonl_shards` directory back. With
    ``validate`` (default), per-shard row counts are checked against
    the persisted ``_manifest`` and a mismatch raises — the cheap
    integrity gate that catches partially-written or hand-mutilated
    exports before a trainer consumes them (one count aggregate; the
    manifest side is shard-count rows)."""
    import os

    # reading the BASE path lets partition discovery attach the shard
    # column from the directory names (_manifest is underscore-hidden)
    df = spark.read.json(path)
    if validate:
        want = {
            r["shard"]: r["n_rows"]
            for r in spark.read.parquet(os.path.join(path, "_manifest")).collect()
        }
        got = {
            r["shard"]: r["n"]
            for r in df.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        if got != want:
            bad = {
                s: (want.get(s), got.get(s))
                for s in set(want) | set(got)
                if want.get(s) != got.get(s)
            }
            raise ValueError(
                f"jsonl shard integrity check failed (shard: expected, found): {bad}"
            )
    return df
