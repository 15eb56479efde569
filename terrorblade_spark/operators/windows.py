"""Window + sessionization operators (SURVEY §2.5, E2/E4/E5/E6).

All are single-shuffle plans: one ``Window.partitionBy(entity).orderBy
(time, id)`` reused across the chained expressions, so Catalyst plans
ONE sort+exchange even when several window columns are stacked.

Deterministic ordering: every orderBy carries the unique id column as a
tiebreaker — order-sensitive ops (cumsum sessionization, lag gaps,
ordered collect) then produce identical results on any partitioning,
which is what makes them safe at 1000 executors (SURVEY §7 'genuinely
hard' (c)).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.window import WindowSpec


def entity_window(partition_cols: Sequence[str], order_cols: Sequence[str]) -> WindowSpec:
    return Window.partitionBy(*partition_cols).orderBy(*order_cols)


def with_gap_ms(
    df: DataFrame,
    ts_col: str,
    partition_cols: Sequence[str],
    id_col: str,
    out_col: str = "gap_ms",
) -> DataFrame:
    """W3: integer epoch-millis gap to the previous row (null on first)."""
    w = entity_window(partition_cols, [ts_col, id_col])
    millis = F.unix_millis(F.col(ts_col))
    return df.withColumn(out_col, millis - F.lag(millis).over(w))


def sessionize(
    df: DataFrame,
    ts_col: str,
    partition_cols: Sequence[str],
    id_col: str,
    gap: str | int = "1 hour",
    out_col: str = "session_id",
    extra_break: Column | None = None,
) -> DataFrame:
    """W4/E2: gap-based sessionization as cumsum-of-breaks.

    ``session_id`` is 0-based per partition entity. A row starts a new
    session when it is the first row, the gap to the previous row
    exceeds ``gap`` (seconds or a '5 minutes'-style string), or
    ``extra_break`` (e.g. author change E6, semantic break E4) is true.
    Reference twin: analyze_dialogues.py:515-521, TextPreprocessor.py:202-206.
    """
    gap_s = _parse_gap_seconds(gap)
    w = entity_window(partition_cols, [ts_col, id_col])
    millis = F.unix_millis(F.col(ts_col))
    gap_ms = millis - F.lag(millis).over(w)
    brk = gap_ms.isNull() | (gap_ms > gap_s * 1000)
    if extra_break is not None:
        brk = brk | F.coalesce(extra_break, F.lit(False))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_col, (F.sum(brk.cast("int")).over(run) - 1).cast("long"))


def _parse_gap_seconds(gap: str | int) -> int:
    """Parse '5m' / '5 minutes' / '1h' / seconds-int (TextPreprocessor.py:191-199)."""
    if isinstance(gap, int):
        return gap
    g = gap.strip().lower()
    units = {"s": 1, "sec": 1, "second": 1, "seconds": 1,
             "m": 60, "min": 60, "minute": 60, "minutes": 60,
             "h": 3600, "hour": 3600, "hours": 3600,
             "d": 86400, "day": 86400, "days": 86400}
    import re

    m = re.fullmatch(r"(\d+)\s*([a-z]*)", g)
    if not m:
        raise ValueError(f"cannot parse gap {gap!r}")
    n, unit = int(m.group(1)), m.group(2) or "s"
    if unit not in units:
        raise ValueError(f"unknown gap unit {unit!r}")
    return n * units[unit]


def run_ids(
    df: DataFrame,
    change_col: Column,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    out_col: str = "run_id",
) -> DataFrame:
    """E5/E6 'consecutive runs': new run when ``change_col`` differs from
    the previous row. First row of a partition starts run 0 (the
    reference's forced df[0,'group_id']=0, TextPreprocessor.py:458,
    falls out of coalescing the null lag to 'changed')."""
    w = entity_window(partition_cols, order_cols)
    # null-SAFE change detection: plain != is NULL for NULL values, so
    # consecutive rows sharing a NULL (missing author, etc.) would each
    # "change" and become singleton runs. The first-row marker lags a
    # constant — eqNullSafe alone would mark a NULL-valued first row as
    # unchanged (run_id -1).
    first = F.lag(F.lit(1)).over(w).isNull()
    changed = first | ~change_col.eqNullSafe(F.lag(change_col).over(w))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_col, (F.sum(changed.cast("int")).over(run) - 1).cast("long"))


def forward_fill(
    df: DataFrame,
    col: str,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    out_col: str | None = None,
) -> DataFrame:
    """W6 forward fill: last non-null value up to the current row."""
    w = entity_window(partition_cols, order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out_col or col, F.last(F.col(col), ignorenulls=True).over(w))


def context_collect(
    df: DataFrame,
    collect_col: str,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    before: int = 5,
    after: int = 5,
    out_col: str = "context",
) -> DataFrame:
    """W7 ±N context snippet: per row, the ordered neighbors' values.

    Replaces the reference's per-hit N+1 SQL loop
    (vector_store.py:400-405) with one windowed pass.
    """
    w = entity_window(partition_cols, order_cols).rowsBetween(-before, after)
    return df.withColumn(out_col, F.collect_list(F.col(collect_col)).over(w))


def global_renumber(df: DataFrame, order_cols: Sequence[str], out_col: str = "group_number") -> DataFrame:
    """W5: 0-based global numbering by start time. Single-partition
    window — only ever applied to small post-aggregation results.
    For corpus-sized relations use :func:`distributed_rank`."""
    w = Window.orderBy(*order_cols)
    return df.withColumn(out_col, (F.row_number().over(w) - 1).cast("long"))


def distributed_rank(
    df: DataFrame,
    order_cols: Sequence[str],
    out_col: str = "rank",
    total_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """0-based global row number by a TOTAL order, at corpus scale —
    the distributed replacement for the single-partition
    :func:`global_renumber` window: range-partition on the order key,
    number rows within each partition, and add each partition's
    exclusive prefix count from a tiny k-row offset relation
    (broadcast back). No row ever passes through a single partition.

    ``order_cols`` must form a total order (include a unique id last),
    or ranks of tied rows are partition-order dependent. The rank is
    independent of where the range boundaries fall — PROVIDED both
    passes see the SAME boundaries. ``total_col`` optionally attaches
    the global row count (computed from the same k-row relation, not
    another aggregate).

    Cost shape: TWO passes over a PERSISTED range partitioning — the
    RDD ``zipWithIndex`` shape. The persist is load-bearing, not an
    optimization: ``repartitionByRange`` samples its boundaries with a
    fresh random seed on EVERY execution, so without materializing the
    exchange once, the counts pass and the numbering pass can land
    rows in different partitions and the offsets no longer match the
    numbering (measured at 10M rows: ~240k duplicate ranks; invisible
    at small scale only because the boundary sample covers the whole
    input there). An eager ``localCheckpoint`` freezes one assignment
    for both consumers; unlike ``persist`` (whose CacheManager entry
    an internal relation can never release) its blocks are reclaimed
    by the ContextCleaner once the result is dropped, so repeated
    calls don't pin corpus-sized caches for the session lifetime. Pass
    a pruned ``df`` (the order columns + what you need back) — the
    materialization holds every input column."""
    spark = df.sparkSession
    k = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    parted = (
        df.repartitionByRange(k, *[F.col(c) for c in order_cols])
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # k-row relation: per-partition counts -> exclusive prefix offsets.
    # (internal count column named __cnt: analyzer resolution is
    # case-INsensitive by default, so e.g. total_col="__N" must not
    # collide with an internal "__n")
    woff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        parted.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn("__off", F.coalesce(F.sum("__cnt").over(woff), F.lit(0)))
    )
    if total_col is not None:
        wall = Window.orderBy("__pid").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        offs = offs.withColumn(total_col, F.sum("__cnt").over(wall))
    offs = offs.drop("__cnt")
    win = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        parted.withColumn("__rn", F.row_number().over(win) - 1)
        .join(F.broadcast(offs), "__pid")
        .withColumn(out_col, (F.col("__rn") + F.col("__off")).cast("long"))
        .drop("__pid", "__rn", "__off")
    )


def distributed_prefix_sum(
    df: DataFrame,
    value_col: str,
    order_cols: Sequence[str],
    out_col: str = "running_total",
    num_partitions: int | None = None,
) -> DataFrame:
    """Inclusive running sum of ``value_col`` by a TOTAL order, at
    corpus scale — the summing sibling of :func:`distributed_rank`
    and the primitive behind global sweep-line analytics (interval
    concurrency, cumulative revenue, watermark accounting): range-
    partition on the order key, run the within-partition window sum,
    and add each partition's exclusive prefix TOTAL from the k-row
    offset relation (broadcast back). No row ever crosses a single
    partition; the only global structure is the k-row cumsum.

    Same load-bearing ``localCheckpoint`` as distributed_rank: the
    range boundaries are frozen once so the totals pass and the
    numbering pass see the SAME partition assignment (the
    resampling-boundaries bug class, regression-gated there).

    ``order_cols`` must form a total order (unique tiebreaker last).
    Exactness: integer values sum exactly (the gate use); float values
    inherit within-partition order determinism but the caller should
    decimal-cast for cross-engine bit equality (the dec_sum rule).
    """
    spark = df.sparkSession
    k = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    parted = (
        df.repartitionByRange(k, *[F.col(c) for c in order_cols])
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    woff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        parted.groupBy("__pid")
        .agg(F.sum(value_col).alias("__ptot"))
        .withColumn("__soff", F.coalesce(F.sum("__ptot").over(woff), F.lit(0)))
        .drop("__ptot")
    )
    win = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        parted.withColumn("__run", F.sum(value_col).over(win))
        .join(F.broadcast(offs), "__pid")
        .withColumn(out_col, F.col("__run") + F.col("__soff"))
        .drop("__pid", "__run", "__soff")
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    qs: Sequence[float],
    tiebreak_cols: Sequence[str] = (),
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT global percentile_cont / percentile_disc at corpus scale.

    Spark's exact ``percentile`` aggregate buffers a value->count map
    inside ONE aggregation buffer (OOM at corpus scale; the reference
    leans on DuckDB ``quantile_cont``, `telegram_database.py` word
    quantiles), and ``percentile_approx`` trades exactness away. This
    operator is exact AND distributed: rank the values globally with
    :func:`distributed_rank` (range partition + k-row broadcast
    offsets — no single-partition window, no corpus-sized buffer),
    filter to the <=3 candidate ranks per requested quantile (a JVM
    row-local predicate over the ranked relation), and resolve each
    quantile from that tiny relation.

    Semantics pinned to the SQL standard (probed bit-exact vs DuckDB):
      - ``pct_cont``: lo*(1-frac) + hi*frac at pos=(n-1)*q (the convex
        form — DuckDB's exact arithmetic; the naive lo+(hi-lo)*frac
        differs in the last bit).
      - ``pct_disc``: value at 0-based index ceil(q*n)-1, the first
        value whose cume_dist reaches q.

    Output: one row per q — (q, pct_cont, pct_disc), exact doubles.
    Cost shape: distributed_rank's two passes over one materialized
    range partitioning + one tiny (<=3*|qs| rows) aggregation.
    """
    v = F.col(value_col).cast("double")
    base = df.select(v.alias("__v"), *[F.col(c) for c in tiebreak_cols])
    order = ["__v", *tiebreak_cols]
    ranked = distributed_rank(
        base, order, out_col="__r", total_col="__n", num_partitions=num_partitions
    )
    qarr = F.array(*[F.lit(float(q)) for q in qs])

    nd = F.col("__n").cast("double")

    def _lo(q: Column) -> Column:
        return F.floor((nd - F.lit(1.0)) * q).cast("long")

    def _hi(q: Column) -> Column:
        return F.ceil((nd - F.lit(1.0)) * q).cast("long")

    def _di(q: Column) -> Column:
        return F.greatest(F.ceil(nd * q).cast("long") - F.lit(1), F.lit(0))

    r = F.col("__r")
    cand = ranked.where(
        F.exists(qarr, lambda q: (r == _lo(q)) | (r == _hi(q)) | (r == _di(q)))
    )
    ex = cand.select("__v", "__r", "__n", F.explode(qarr).alias("q"))
    qc = F.col("q")
    ex = ex.where((r == _lo(qc)) | (r == _hi(qc)) | (r == _di(qc)))
    pos = (nd - F.lit(1.0)) * qc
    frac = pos - F.floor(pos)
    res = ex.groupBy("q").agg(
        F.min(F.when(r == _lo(qc), F.col("__v"))).alias("__lov"),
        F.min(F.when(r == _hi(qc), F.col("__v"))).alias("__hiv"),
        F.min(F.when(r == _di(qc), F.col("__v"))).alias("pct_disc"),
        F.min(frac).alias("__frac"),
    )
    cont = F.col("__lov") * (F.lit(1.0) - F.col("__frac")) + F.col("__hiv") * F.col(
        "__frac"
    )
    return res.select("q", cont.alias("pct_cont"), "pct_disc")
