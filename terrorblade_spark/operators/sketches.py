"""Sketch-based profiling: the 100 TB substitute for exact
countDistinct / percentile.

Exact `countDistinct` shuffles every distinct value; an exact
percentile sorts the column. At corpus scale both are O(data) shuffles
for a number that's only read by a human or a mix-recipe heuristic.
Sketches fix the asymptotics:

- HLL (Datasketches, built into Spark's ``hll_sketch_agg``): a few KB
  per group, map-side combinable, and — the property that matters for
  pipelines — MERGEABLE: per-partition/per-day sketches union into the
  global sketch without touching the data again, so an incremental
  ingest keeps running totals by folding the new batch's sketch in.
- approx percentiles (``percentile_approx``): bounded-error rank
  sketch, same map-side-combine shape.

Estimates are deterministic for a fixed input (no seed), so tests pin
tolerances, not exact values.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_profile(
    df: DataFrame,
    group_cols: Sequence[str],
    distinct_cols: Sequence[str],
    percentile_col: str | None = None,
    percentiles: Sequence[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group profile: approx distinct count per ``distinct_cols``
    plus approx ``percentiles`` of ``percentile_col`` — ONE map-side
    combinable aggregation, no distinct shuffle, no sort."""
    aggs = [
        F.approx_count_distinct(c).alias(f"approx_n_{c}") for c in distinct_cols
    ]
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    if percentile_col is not None:
        for p in percentiles:
            aggs.append(
                F.percentile_approx(percentile_col, p, accuracy).alias(
                    f"p{str(p).replace('0.', '')}_{percentile_col}"
                )
            )
    return df.groupBy(*group_cols).agg(*aggs)


def hll_partial(
    df: DataFrame, group_cols: Sequence[str], col: str, lg_k: int = 12
) -> DataFrame:
    """Per-group HLL sketches as binary columns — the persistable /
    shippable partial state. At scale these are written alongside each
    ingest batch (a few KB per group) and merged later; the raw data is
    never re-scanned for a distinct count again."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(col, F.lit(lg_k)).alias("hll"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def hll_merge(partials: DataFrame, rollup_cols: Sequence[str]) -> DataFrame:
    """Union per-group sketches up to ``rollup_cols`` granularity and
    estimate: the incremental-rollup half of the pair. The union is
    associative and order-independent (estimates stay inside the
    sketch's error envelope regardless of merge tree), so daily
    partials -> monthly -> all-time rollups all read only sketch
    bytes, never the data."""
    return (
        partials.groupBy(*rollup_cols)
        .agg(
            F.hll_union_agg("hll").alias("hll"),
            F.sum("n_rows").alias("n_rows"),
        )
        .withColumn("approx_distinct", F.hll_sketch_estimate("hll"))
    )
