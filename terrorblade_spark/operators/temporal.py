"""Temporal join operators Spark's optimizer has no native strategy
for: as-of (point-in-time) join and range (interval-containment) join.

Naive formulations are scale-killers: a `l.t >= r.t` theta-join plans
as BroadcastNestedLoopJoin (quadratic work, broadcast pressure), and
per-key `collect + bisect` is a driver loop. Both operators here are
pure shuffle-and-window / equi-join plans:

- ``asof_join``: union the two sides, one window pass per key carries
  the latest right row forward to each left row — one shuffle + sort,
  identical to what a sort-merge as-of join would do physically.
- ``range_join``: quantize time into chunks; intervals explode to the
  chunks they overlap, points equi-join on (key, chunk), then the
  exact containment predicate filters. Work is proportional to
  interval length / chunk, never |points| x |intervals|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    tolerance_s: float | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Point-in-time join: each left row gets the most recent right row
    with ``right.on <= left.on`` within the same ``by`` keys (DuckDB/
    pandas ``merge_asof`` 'backward' semantics; at equal timestamps the
    right row IS visible).

    Right's non-key columns come back ``right_prefix``-ed (all null
    when no right row precedes the left row, or the match is older than
    ``tolerance_s`` seconds).

    Plan: tag + union both sides, then ``last_value(ignoreNulls)`` over
    (by, time, side) — ONE shuffle of (keys, time, right-payload
    struct) and one sort, the same physical work as a dedicated merge
    as-of operator. No range condition ever reaches the planner, so no
    BroadcastNestedLoopJoin at any scale; skew follows the ``by`` keys
    exactly like any windowed op (salt upstream if one key dominates).
    """
    rcols = [c for c in right.columns if c not in {on, *by}]
    lpayload = F.struct(*[F.col(c) for c in left.columns]).alias("__l")
    rpayload = F.struct(
        F.col(on).cast("double").alias("__rt"), *[F.col(c) for c in rcols]
    ).alias("__r")

    l2 = left.select(
        *by,
        F.col(on).cast("double").alias("__t"),
        F.lit(0).alias("__side"),
        lpayload,
        F.lit(None).cast(
            "struct<__rt:double," + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in rcols) + ">"
        ).alias("__r"),
    )
    r2 = right.select(
        *by,
        F.col(on).cast("double").alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(l2.schema["__l"].dataType.simpleString()).alias("__l"),
        rpayload,
    )
    # right rows sort BEFORE left rows at equal time (side desc), so a
    # tie is visible to the left row
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t").asc(), F.col("__side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l2.unionByName(r2)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .where(F.col("__side") == 0)
    )
    if tolerance_s is not None:
        carried = carried.withColumn(
            "__match",
            F.when(
                F.col("__t") - F.col("__match.__rt") <= F.lit(float(tolerance_s)),
                F.col("__match"),
            ),
        )
    return carried.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(f"{right_prefix}{c}") for c in rcols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    by: list[str] | None = None,
    chunk_s: float = 3600.0,
    how: str = "inner",
) -> DataFrame:
    """Interval-containment join: each point row matched to every
    interval row with ``start <= t < end`` (and equal ``by`` keys).

    Both sides are quantized to ``chunk_s``-second buckets: an interval
    lands in every chunk it overlaps (explode of a small sequence), a
    point in exactly one — so the join is a plain equi-join on
    (by…, chunk) that Spark shuffles/broadcasts like any other, and the
    exact predicate filters within buckets. Choose ``chunk_s`` near the
    typical interval length: shorter chunks replicate long intervals,
    longer chunks inflate bucket fan-in; either way the cost is linear,
    never |points| x |intervals|.
    """
    by = by or []
    chunk = F.lit(float(chunk_s))
    ivals = intervals.withColumn(
        "__chunk",
        F.explode(
            F.sequence(
                F.floor(F.col(start_ts).cast("double") / chunk),
                # end is exclusive, but a point in the same chunk as the
                # endpoint still needs the bucket present
                F.floor(F.col(end_ts).cast("double") / chunk),
            )
        ),
    )
    pts = points.withColumn("__chunk", F.floor(F.col(point_ts).cast("double") / chunk))
    cond = (F.col(point_ts).cast("double") >= F.col(start_ts).cast("double")) & (
        F.col(point_ts).cast("double") < F.col(end_ts).cast("double")
    )
    joined = pts.join(ivals, on=[*by, "__chunk"], how="inner").where(cond).drop("__chunk")
    if how == "inner":
        return joined
    if how == "left":
        # left join = inner result unioned with unmatched points
        matched = joined
        unmatched = pts.join(
            ivals.select(*by, "__chunk").distinct(), on=[*by, "__chunk"], how="left_anti"
        ).drop("__chunk")
        # unmatched within an existing bucket (bucket hit, predicate
        # miss) need the anti-join against actual matches
        bucket_hit_no_match = (
            pts.join(ivals.select(*by, "__chunk").distinct(), on=[*by, "__chunk"])
            .drop("__chunk")
            .join(matched.select(*points.columns).distinct(), on=points.columns, how="left_anti")
        )
        for c in intervals.columns:
            if c not in points.columns:
                unmatched = unmatched.withColumn(c, F.lit(None))
                bucket_hit_no_match = bucket_hit_no_match.withColumn(c, F.lit(None))
        return matched.unionByName(unmatched.unionByName(bucket_hit_no_match))
    raise ValueError(f"unsupported how={how!r}")
