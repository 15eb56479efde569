"""Market-basket association rules: pairwise co-occurrence support,
confidence, and lift over an (order, item) relation.

Why it's here: co-occurrence mining is the classic retail/OLAP
analytics operator the relational fixture exercises naturally
(parts-per-order baskets), and the same shape powers LLM-data work —
tag/domain co-occurrence in a corpus, entity co-mention graphs, and
the co-purchase edges the graph suite (queries/graph.py q114) walks.

Scale design — the a-priori pair-counting recipe, fused row-locally:

* The basket relation ``(basket, item)`` is aggregated to one sorted
  item array per basket (one shuffle, map-side combined), and the
  ordered pairs (a < b) are expanded INSIDE each row with array HOFs
  (transform + slice, the q34 fused-pair pattern) — a self-join on the
  basket key would shuffle the basket relation twice and melt on a hot
  basket; the fused expansion is bounded by max basket size per ROW,
  never by key cardinality.
* Pair counts, per-item supports, and the basket total are three
  aggregates of the SAME basket relation; the total joins in as a
  1-row broadcast scalar (never a driver-side ``count()``, the r3
  rule), and item supports join the pair relation on plain keys (AQE
  broadcasts them when the item dimension is small).
* ``max_basket_items`` caps pathological baskets (a basket with 10^5
  items expands to 10^10 pairs regardless of strategy — the same
  quadratic hot-key argument as the Jaccard df cap,
  operators/dedup.py): oversized baskets are truncated to their
  ``max_basket_items`` smallest items, deterministically.

Determinism: supports and counts are integers; confidence and lift are
one IEEE division of exact-in-double integers, so a DuckDB oracle
matches bit-for-bit at 6 dp (queries/relational.py q116).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_support: int = 2,
    max_basket_items: int = 256,
) -> DataFrame:
    """Pairwise association rules over distinct (basket, item) pairs.

    Returns one row per unordered item pair (item_a < item_b) with
    ``pair_count`` >= min_pair_support:
      (item_a, item_b, pair_count, count_a, count_b,
       confidence = pair/count_a, lift = pair * n_baskets /
       (count_a * count_b))
    where counts are numbers of DISTINCT baskets. ``confidence`` is
    directional a->b; the b->a value is pair/count_b, derivable from
    the same row.
    """
    if min_pair_support < 1:
        raise ValueError(f"min_pair_support must be >= 1, got {min_pair_support}")
    if max_basket_items < 2:
        raise ValueError(f"max_basket_items must be >= 2, got {max_basket_items}")
    b = baskets.select(
        F.col(basket_col).alias("__bk"), F.col(item_col).alias("__it")
    ).where(F.col("__bk").isNotNull() & F.col("__it").isNotNull()).distinct()

    # one basket-keyed shuffle; sorted so the HOF expansion emits each
    # pair exactly once with item_a < item_b, and the oversized-basket
    # cap keeps a deterministic prefix
    arrs = b.groupBy("__bk").agg(
        F.slice(
            F.sort_array(F.collect_set("__it")), 1, max_basket_items
        ).alias("__items")
    )
    n_items = F.size("__items")
    pair_arrays = F.transform(
        F.col("__items"),
        lambda x, i: F.transform(
            F.slice("__items", i + 2, F.greatest(n_items - i - 1, F.lit(0))),
            lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
        ),
    )
    pair_counts = (
        arrs.select(F.explode(F.flatten(pair_arrays)).alias("p"))
        .groupBy("p.item_a", "p.item_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= min_pair_support)
    )

    supports = b.groupBy("__it").agg(F.count(F.lit(1)).alias("__n"))
    total = b.agg(F.countDistinct("__bk").cast("double").alias("__nb"))
    return (
        pair_counts.join(
            supports.select(
                F.col("__it").alias("item_a"), F.col("__n").alias("count_a")
            ),
            "item_a",
        )
        .join(
            supports.select(
                F.col("__it").alias("item_b"), F.col("__n").alias("count_b")
            ),
            "item_b",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "item_a",
            "item_b",
            "pair_count",
            "count_a",
            "count_b",
            (F.col("pair_count") / F.col("count_a")).alias("confidence"),
            (
                F.col("pair_count") * F.col("__nb")
                / (F.col("count_a") * F.col("count_b"))
            ).alias("lift"),
        )
    )
