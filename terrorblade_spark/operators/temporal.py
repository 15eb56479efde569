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

# (resample_events below complements the as-of/range joins in this
# module: grid alignment is the third standard temporal re-shaping.)

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

    # no trailing comma when the right side carries no payload columns
    # (a payload-free right table is legal: tolerance checks only)
    r_ddl = "struct<" + ",".join(
        ["__rt:double"] + [f"{c}:{dict(right.dtypes)[c]}" for c in rcols]
    ) + ">"
    l2 = left.select(
        *by,
        F.col(on).cast("double").alias("__t"),
        F.lit(0).alias("__side"),
        lpayload,
        F.lit(None).cast(r_ddl).alias("__r"),
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
        from functools import reduce

        # left join = inner result unioned with unmatched points
        matched = joined
        unmatched = pts.join(
            ivals.select(*by, "__chunk").distinct(), on=[*by, "__chunk"], how="left_anti"
        ).drop("__chunk")
        # unmatched within an existing bucket (bucket hit, predicate
        # miss) need the anti-join against actual matches. The join
        # condition must be NULL-SAFE: `on=columns` equality is NULL for
        # NULL payload cells, so a matched point with any NULL column
        # would never anti-join against itself and come back a second
        # time as a phantom unmatched row.
        bh = pts.join(
            ivals.select(*by, "__chunk").distinct(), on=[*by, "__chunk"]
        ).drop("__chunk").alias("__bh")
        mpts = matched.select(*points.columns).distinct().alias("__m")
        ns_cond = reduce(
            lambda a, b: a & b,
            [F.col(f"__bh.{c}").eqNullSafe(F.col(f"__m.{c}")) for c in points.columns],
        )
        bucket_hit_no_match = bh.join(mpts, ns_cond, "left_anti")
        for c in intervals.columns:
            if c not in points.columns:
                unmatched = unmatched.withColumn(c, F.lit(None))
                bucket_hit_no_match = bucket_hit_no_match.withColumn(c, F.lit(None))
        return matched.unionByName(unmatched.unionByName(bucket_hit_no_match))
    raise ValueError(f"unsupported how={how!r}")


def resample_events(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
    agg: str = "sum",
    fill: str = "zero",
) -> DataFrame:
    """Regular time-grid resampling per entity: one row per (entity,
    bucket) over the entity's OWN [first, last] activity span, with
    the bucket aggregate of ``value_col`` and gaps filled.

    Gap semantics: ``fill="zero"`` (counts/sums — an empty hour IS
    zero), ``fill="ffill"`` (gauge-style values — last observation
    carries forward), ``fill="null"`` (leave gaps visible).

    Plan shape, and why it scales: ONE aggregation of the raw events
    to (entity, bucket) partials — the only pass over the data — then
    the dense grid is generated per entity with ``sequence()`` from
    the min/max bucket (an aggregate row per entity, exploded to the
    grid width) and left-joined to the partials on (entity, bucket).
    Events are never collected per entity; the explode's width is the
    entity's activity span in buckets, data-independent of its event
    COUNT (the usual blowup risk). ffill is the standard last-non-null
    window over the already-bucketed grid — rows are grid cells, not
    events.
    """
    aggs = {
        "sum": F.sum(value_col),
        "avg": F.avg(value_col),
        "min": F.min(value_col),
        "max": F.max(value_col),
        "count": F.count(F.lit(1)),
    }
    if agg not in aggs:
        raise ValueError(f"agg must be one of {sorted(aggs)}")
    if fill not in ("zero", "ffill", "null"):
        raise ValueError("fill must be zero|ffill|null")
    # window() buckets at arbitrary step sizes ('15 minutes'); the
    # bucket key is the window start
    b = F.window(F.col(ts_col), step)["start"]
    partials = (
        events.groupBy(F.col(entity_col), b.alias("bucket"))
        .agg(aggs[agg].alias("v"))
    )
    spans = partials.groupBy(entity_col).agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = spans.select(
        entity_col,
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr(f"INTERVAL {step}"))
        ).alias("bucket"),
    )
    out = grid.join(partials, [entity_col, "bucket"], "left")
    if fill == "zero":
        out = out.withColumn("v", F.coalesce(F.col("v"), F.lit(0)))
    elif fill == "ffill":
        from pyspark.sql import Window as _W

        w = (
            _W.partitionBy(entity_col)
            .orderBy("bucket")
            .rowsBetween(_W.unboundedPreceding, _W.currentRow)
        )
        out = out.withColumn("v", F.last("v", ignorenulls=True).over(w))
    return out.withColumnRenamed("v", f"{agg}_{value_col}").orderBy(entity_col, "bucket")


def ewma(
    df: DataFrame,
    value_col: str,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    alpha: float = 0.5,
    window: int = 8,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially-weighted moving average over a bounded trailing
    window: for each row, the weight-normalized mean of the last
    ``window`` values in ``order_cols`` order within the partition
    (weights ``(1-alpha)^age``, the pandas ``ewm(adjust=True)`` form,
    truncated to the window). The bounded window is part of the
    SEMANTICS, not an approximation knob — like bfs_distances' hop
    bound, it makes the result a pure function of the local frame (and
    at alpha=0.5 the age-``window`` tail weight is 2^-window, below
    float noise anyway).

    Scale: ONE shuffle on the partition keys; the frame collect and
    the weighted fold are row-local array HOFs (window rows, a small
    constant, per row) — no self-join, no per-row Python.
    ``order_cols`` should end in a unique tiebreaker (the W2 rule) or
    frame contents at ties are engine-dependent.

    Determinism: with alpha a power of 1/2, weights are exact binary
    fractions and each product is exact; the fold runs in frame order
    on both engines, so a 6-dp round absorbs sub-ulp division drift
    (gate query q118).
    """
    from pyspark.sql import Window as _W

    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    w = (
        _W.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(-(window - 1), _W.currentRow)
    )
    # collect_list drops NULL elements, which would misalign ages with
    # row positions — wrap each value in a (never-NULL) struct so NULL
    # positions survive and still age the weights (pandas
    # ewm(ignore_na=False)); the weight of a NULL position itself is
    # excluded from the denominator, and an all-NULL frame yields NULL.
    arr = F.collect_list(F.struct(F.col(value_col).cast("double").alias("v"))).over(w)
    out = df.withColumn("__frame", arr)
    n = F.size("__frame")
    ages = F.sequence(F.lit(0), n - F.lit(1))
    decay = float(1.0 - alpha)

    def _at(j):
        return F.element_at(F.col("__frame"), (n - j).cast("int"))["v"]

    num = F.aggregate(
        F.transform(
            ages,
            lambda j: F.coalesce(_at(j) * F.pow(F.lit(decay), j), F.lit(0.0)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    den = F.aggregate(
        F.transform(
            ages,
            lambda j: F.when(_at(j).isNotNull(), F.pow(F.lit(decay), j)).otherwise(
                F.lit(0.0)
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return out.withColumn(
        out_col, F.when(den > 0, num / den)
    ).drop("__frame")
