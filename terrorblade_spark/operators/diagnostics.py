"""Skew and layout diagnostics — the operational half of the scale
story. Every skew mitigation in this repo (salted_agg/salted_join,
hot-shingle df caps, AQE skew-join) needs a way to SEE the skew first;
these run as ordinary distributed plans (no collect of raw data) and
return small result DataFrames a pipeline can alert on.

The reference has no equivalent (single-process engines feel skew only
as slowness); on a 1000-executor cluster an undiagnosed hot key is the
difference between a 10-minute and a 10-hour job.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_profile(
    df: DataFrame, keys: Sequence[str], top_n: int = 20
) -> tuple[DataFrame, DataFrame]:
    """Profile grouping/join-key skew: returns ``(hot_keys, summary)``.

    ``hot_keys``: the ``top_n`` heaviest key values with row counts and
    their share of the table. ``summary``: one row with n_keys, total
    rows, mean/max rows per key, p50/p90/p99 of the per-key counts, and
    ``skew_ratio`` = max/mean — the number to alert on (a uniform key
    sits near 1; a key needing salting shows 100+).

    Plan: ONE groupBy over the keys (map-side combined counts — the
    same shuffle a real aggregation would do, so profiling costs what
    one agg costs), then a top-n and a tiny percentile agg over the
    per-key counts. Raw rows never leave the executors.
    """
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    counts = counts.persist()
    total = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n_rows").alias("total_rows"),
        F.mean("n_rows").alias("mean_rows"),
        F.max("n_rows").alias("max_rows"),
        # approx: the EXACT percentile buffers a per-distinct-count map
        # in one reducer — the one thing a skew profiler must not do on
        # the high-cardinality keys it exists to diagnose
        F.expr("percentile_approx(n_rows, array(0.5, 0.9, 0.99), 10000)").alias("p"),
    ).select(
        "n_keys",
        "total_rows",
        "mean_rows",
        "max_rows",
        F.col("p")[0].alias("p50_rows"),
        F.col("p")[1].alias("p90_rows"),
        F.col("p")[2].alias("p99_rows"),
        (F.col("max_rows") / F.col("mean_rows")).alias("skew_ratio"),
    )
    hot = (
        counts.crossJoin(F.broadcast(total.select("total_rows")))
        .select(
            *keys,
            "n_rows",
            (F.col("n_rows") / F.col("total_rows")).alias("share"),
        )
        .orderBy(F.desc("n_rows"), *keys)
        .limit(top_n)
    )
    # both outputs are tiny (top_n rows / one row): materialize them
    # and release the cached counts — returning lazy frames that pin
    # the cache would leak one cached relation per profiling call
    hot = hot.localCheckpoint(eager=True)
    total = total.localCheckpoint(eager=True)
    counts.unpersist()
    return hot, total


def partition_histogram(df: DataFrame) -> DataFrame:
    """Physical partition balance: (partition_id, n_rows) for the
    DataFrame AS CURRENTLY PARTITIONED — shows whether a shuffle or a
    file layout landed balanced. A straggler task is a fat partition
    here before it is a slow stage on the UI. One narrow agg, no data
    movement beyond the per-partition counts."""
    return (
        df.select(F.spark_partition_id().alias("partition_id"))
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("partition_id")
    )


def suggest_salts(summary: DataFrame, target_rows_per_task: int = 5_000_000) -> int:
    """Turn a :func:`key_skew_profile` summary into an ``n_salts`` for
    ``salted_agg``/``salted_join``: enough salts that the hottest key's
    rows spread to ~``target_rows_per_task`` per task, capped at 256
    (beyond that the phase-2 merge overhead dominates). Returns 1 when
    no salting is needed. The single collected row is the model-sized
    summary, not data."""
    row = summary.select("max_rows").first()
    max_rows = row["max_rows"] or 0
    import math

    return max(1, min(256, math.ceil(max_rows / target_rows_per_task)))


def concentration_profile(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """One-row key-concentration summary: ``(n_keys, total_rows,
    max_count, gini, top{k}_share)`` — the quantitative form of "is
    this key skewed": Gini = 0 is perfectly uniform load, -> 1 is one
    hot key owning the table; ``top{k}_share`` is the fraction of rows
    held by the ``top_k`` heaviest keys.

    Gini via the rank closed form ``2*sum(i*c_i)/(n*T) - (n+1)/n``
    over counts sorted ascending with a total tie-break — which needs
    a GLOBAL rank of the per-key count relation. That rank comes from
    ``windows.distributed_rank`` (range-partitioned two-pass with
    broadcast offsets), so no single-partition window ever sees the
    key relation — the profile works on a billion-key table. All
    inputs to the final arithmetic are exact integers (the i*c sum is
    decimal-accumulated against ANSI long overflow); the divisions are
    engine-portable (gate q127).
    """
    from terrorblade_spark.operators.windows import distributed_rank

    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    counts = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    ranked = distributed_rank(
        counts, ["__c", "__k"], out_col="__r0", total_col="__n"
    ).select(
        "__c",
        (F.col("__r0") + 1).alias("__i"),
        "__n",
    )
    agg = ranked.agg(
        F.max("__n").alias("n_keys"),
        F.sum("__c").alias("total_rows"),
        F.max("__c").alias("max_count"),
        F.sum((F.col("__i") * F.col("__c")).cast("decimal(38,0)"))
        .cast("double")
        .alias("__s"),
        F.sum(
            F.when(F.col("__i") > F.col("__n") - top_k, F.col("__c")).otherwise(0)
        ).alias("__topc"),
    )
    n = F.col("n_keys").cast("double")
    t = F.col("total_rows").cast("double")
    return agg.select(
        "n_keys",
        "total_rows",
        "max_count",
        (F.lit(2.0) * F.col("__s") / (n * t) - (n + 1.0) / n).alias("gini"),
        (F.col("__topc").cast("double") / t).alias(f"top{top_k}_share"),
    )
