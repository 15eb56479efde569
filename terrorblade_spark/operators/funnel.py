"""Event-sequence analytics: funnels and cohort retention.

The reference's event analytics stop at per-entity counts and activity
heatmaps (analyze_dialogues.py get_chat_statistics); at warehouse scale
the two workhorse event queries are ordered-step funnels ("of users who
did A, how many then did B within T?") and cohort retention ("of users
who first appeared in week W, how many were active in week W+k?").

Scale design:

- ``funnel_steps`` computes step-completion times with one bounded
  aggregation PER STEP (filter to the step's events -> min-ts groupBy
  on the entity, joined to the previous step's time). No per-entity
  event arrays are ever collected — a power user with 10^8 events
  costs the same as anyone else (collect_list-then-scan funnels OOM on
  exactly those users). Steps are few (2-8); aggregations are map-side
  combined; joins are entity-keyed equi-joins AQE can re-plan.
- ``retention_matrix`` is two aggregations: first-seen period per
  entity (the cohort), then distinct (cohort, offset) activity counts.
  The distinct is over (entity, period) — already aggregated, far
  smaller than the event stream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_ms: int | None = None,
) -> DataFrame:
    """Per-entity step completion times: one row per entity that
    completed step 1, with ``t_1 .. t_n`` (TIMESTAMP, null once the
    funnel broke) and ``steps_completed``.

    Step k counts only if it happens strictly after step k-1 (and, with
    ``within_ms``, no later than ``within_ms`` after step 1 — the
    conversion-window variant).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    first = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(entity_col)
        .agg(F.min(ts_col).alias("t_1"))
    )
    out = first
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t_{i - 1}"
        cand = events.where(F.col(type_col) == step).select(
            entity_col, F.col(ts_col).alias("__ts")
        )
        joined = cand.join(out.select(entity_col, prev, "t_1"), entity_col).where(
            F.col("__ts") > F.col(prev)
        )
        if within_ms is not None:
            joined = joined.where(
                F.unix_millis("__ts") - F.unix_millis("t_1") <= within_ms
            )
        times = joined.groupBy(entity_col).agg(F.min("__ts").alias(f"t_{i}"))
        out = out.join(times, entity_col, "left")
    completed = F.lit(1)
    for i in range(2, len(steps) + 1):
        completed = completed + F.col(f"t_{i}").isNotNull().cast("int")
    # steps_completed counts the longest unbroken prefix: t_i is only
    # ever non-null if t_{i-1} was (the join condition guarantees it)
    return out.withColumn("steps_completed", completed)


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_ms: int | None = None,
) -> DataFrame:
    """The funnel report: (step, step_name, n_entities, conversion) —
    n at step k = entities whose steps_completed >= k; conversion is
    the fraction of step-1 entities remaining."""
    per_entity = funnel_steps(events, steps, entity_col, type_col, ts_col, within_ms)
    counts = per_entity.agg(
        *[
            # coalesce: an empty step-1 base must report 0, not NULL
            F.coalesce(
                F.sum((F.col("steps_completed") >= i).cast("long")), F.lit(0)
            ).alias(f"n_{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    def conv(i: int):
        # conversion vs the step-1 base
        return F.when(
            F.col("n_1") > 0, F.col(f"n_{i}").cast("double") / F.col("n_1").cast("double")
        ).otherwise(F.lit(0.0))
    return (
        counts.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("step"),
                            F.lit(steps[i - 1]).alias("step_name"),
                            F.col(f"n_{i}").alias("n_entities"),
                            conv(i).alias("conversion"),
                        )
                        for i in range(1, len(steps) + 1)
                    ]
                )
            ).alias("s")
        )
        .select("s.step", "s.step_name", "s.n_entities", "s.conversion")
        .orderBy("step")
    )


def retention_matrix(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention: (cohort, offset, n_active) where cohort is the
    entity's first-activity period (DATE of the period start), offset
    counts periods since, and n_active is distinct entities from that
    cohort active in that period. offset 0 row = cohort size.
    """
    bucket = F.date_trunc(period, F.col(ts_col)).cast("date")
    firsts = events.groupBy(entity_col).agg(F.min(bucket).alias("cohort"))
    activity = events.select(entity_col, bucket.alias("p")).distinct()
    per_div = {"week": 7, "day": 1}
    if period not in per_div:
        raise ValueError("period must be 'week' or 'day'")
    offset = (F.datediff(F.col("p"), F.col("cohort")) / per_div[period]).cast("long")
    out = (
        activity.join(firsts, entity_col)
        .select("cohort", offset.alias("offset"), entity_col)
        .groupBy("cohort", "offset")
        .agg(F.count_distinct(entity_col).alias("n_active"))
    )
    if max_offset is not None:
        out = out.where(F.col("offset") <= max_offset)
    return out.orderBy("cohort", "offset")
