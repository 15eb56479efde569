"""Categorical association statistics: contingency tables with
chi-square decomposition and Cramer's V.

Why it's here: "is this categorical column independent of that one"
is the workhorse question of corpus accounting (is language balanced
across sources? did the new crawl shift the domain mix per language?)
and of feature screening for the quality classifier — the
distribution-level complement to the row-level dataset diff
(relational.dataset_diff) and the JS corpus drift (lm.corpus_drift).

Scale: ONE aggregation over the data (cell counts), then margins are
re-aggregations of the CELL relation (category-sized, never the data
again), joined back on the category keys with the grand total as a
1-row broadcast scalar. Category cardinalities are assumed
dimension-like (languages, sources, buckets): the cell relation is
their product at most.

Determinism (gate q120): observed counts and margins are integers;
expected = row_tot * col_tot / N is exact-in-double integer products
and ONE IEEE division; the per-cell contribution adds one subtract /
square / divide chain — identical on both engines, 6-dp rounded. The
chi2 total is a decimal-exact sum of 6-dp-rounded contributions
(order-free, the dec_sum rule).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from terrorblade_spark.functions.exprs import dec_sum


def crosstab_stats(df: DataFrame, row_col: str, col_col: str) -> DataFrame:
    """Per-cell contingency statistics for ``row_col`` x ``col_col``:
    ``(row, col, n, n_row, n_col, expected, contrib)`` where
    ``expected = n_row * n_col / N`` (independence) and ``contrib =
    (n - expected)^2 / expected`` (the cell's chi-square term). Only
    observed cells appear; a zero-observed cell's contribution equals
    its expected count — add it driver-side via the margins if a
    complete grid is needed (the gate query's oracle mirrors the
    observed-cells convention). NULL categories are kept as their own
    level (they are a real level of corpus metadata)."""
    cells = df.groupBy(
        F.col(row_col).alias("row"), F.col(col_col).alias("col")
    ).agg(F.count(F.lit(1)).alias("n"))
    # margin joins are NULL-SAFE: a NULL category is a real level and a
    # plain equi-join would silently drop its cells at the join back
    rows = cells.groupBy("row").agg(F.sum("n").alias("n_row")).withColumnRenamed(
        "row", "__row_m"
    )
    cols = cells.groupBy("col").agg(F.sum("n").alias("n_col")).withColumnRenamed(
        "col", "__col_m"
    )
    total = cells.agg(F.sum("n").cast("double").alias("__N"))
    expected = F.col("n_row") * F.col("n_col") / F.col("__N")
    return (
        cells.join(rows, F.col("row").eqNullSafe(F.col("__row_m")))
        .join(cols, F.col("col").eqNullSafe(F.col("__col_m")))
        .crossJoin(F.broadcast(total))
        .select(
            "row",
            "col",
            "n",
            "n_row",
            "n_col",
            expected.alias("expected"),
            ((F.col("n") - expected) * (F.col("n") - expected) / expected).alias(
                "contrib"
            ),
        )
    )


def chi_square(df: DataFrame, row_col: str, col_col: str) -> DataFrame:
    """One-row chi-square summary: ``(chi2, dof, n, cramers_v)``.

    ``chi2`` covers the FULL grid without materializing it: observed
    cells contribute via ``crosstab_stats``; a zero-observed cell's
    term collapses to its expected count, and summed over all missing
    cells that is exactly ``N - sum(expected over observed cells)`` —
    so two decimal-exact sums over the observed-cell relation suffice.
    Contributions/expectations are 6-dp rounded then decimal-summed
    (order-free, engine-portable: the dec_sum rule); ``cramers_v``
    adds one sqrt of exact-input doubles.

    Level counts are NULL-SAFE: ``crosstab_stats`` keeps NULL as a
    real category level (its cells enter the chi2 sum), so dof and
    ``cramers_v``'s min_dim must count it too — ``countDistinct``
    alone would undercount the grid by one per NULL level. The
    collision-free form is ``countDistinct + max(is_null)``."""
    cells = crosstab_stats(df, row_col, col_col)

    def _levels(c: str):
        # countDistinct ignores NULL; add it back iff a NULL level exists
        return F.countDistinct(c) + F.max(
            F.when(F.col(c).isNull(), F.lit(1)).otherwise(F.lit(0))
        )

    agg = cells.agg(
        dec_sum(F.round("contrib", 6), 6).alias("__chi_obs"),
        dec_sum(F.round("expected", 6), 6).alias("__exp_obs"),
        F.sum("n").alias("n"),
        _levels("row").alias("__r"),
        _levels("col").alias("__c"),
    )
    chi2 = F.col("__chi_obs") + (F.col("n") - F.col("__exp_obs"))
    min_dim = F.least("__r", "__c") - F.lit(1)
    return agg.select(
        chi2.alias("chi2"),
        ((F.col("__r") - 1) * (F.col("__c") - 1)).alias("dof"),
        "n",
        F.when(min_dim > 0, F.sqrt(chi2 / (F.col("n") * min_dim)))
        .otherwise(F.lit(0.0))
        .alias("cramers_v"),
    )


def pearson_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: Sequence[str] = (),
    scale: int = 6,
) -> DataFrame:
    """Per-group Pearson correlation from decimal-exact moments:
    ``(group..., n, corr)``.

    Spark's builtin ``corr`` accumulates doubles in shuffle order, so
    its low bits change run to run — unusable under a bit-compare
    oracle. This form decimal-sums the five moments (order-free,
    exact at ``scale`` / ``2*scale`` fractional digits), then applies
    the closed form ``(n*sxy - sx*sy) / sqrt((n*sxx - sx^2) *
    (n*syy - sy^2))`` — identical IEEE arithmetic on identical exact
    inputs on any engine (gate q123). Rows with a NULL in either
    column are excluded (the pairwise-complete convention); zero
    variance on either side yields NULL.

    One map-side-combined aggregation; group relations only.
    """
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    both = df.where(x.isNotNull() & y.isNotNull())
    agg = both.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        dec_sum(x, scale).alias("__sx"),
        dec_sum(y, scale).alias("__sy"),
        dec_sum(x * x, 2 * scale).alias("__sxx"),
        dec_sum(y * y, 2 * scale).alias("__syy"),
        dec_sum(x * y, 2 * scale).alias("__sxy"),
    )
    varx = F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vary = F.col("__n") * F.col("__syy") - F.col("__sy") * F.col("__sy")
    cov = F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    return agg.select(
        *group_cols,
        F.col("__n").cast("long").alias("n"),
        F.when((varx > 0) & (vary > 0), cov / F.sqrt(varx * vary)).alias("corr"),
    )


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: Sequence[str] = (),
    scale: int = 2,
) -> DataFrame:
    """Per-group Spearman rank correlation: Pearson over tie-AVERAGED
    ranks (the fractional-rank convention), computed with the same
    decimal-exact moments as :func:`pearson_corr` so the result is a
    pure function of the data on any engine (gate q125).

    The average rank needs no second aggregation pass:
    ``avg_rank = rank() + (n_ties - 1)/2`` — one ordered window for
    ``rank()`` plus one unordered count over the tie partition, per
    axis. Ranks land on integers or halves (exact at 2 fractional
    decimal digits, hence the default ``scale=2``; rank-square sums
    need ~n^3/3 integer headroom, far inside the decimal(30) bound to
    billions of rows per group).

    Scale: per-group windows — the shuffle is on the group key, the
    sort is within groups (the W2 shape). For one GLOBAL corpus-scale
    correlation, rank each axis with ``windows.distributed_rank``
    (range-partitioned, no single-partition pass) and feed the ranks
    to :func:`pearson_corr` directly.
    """
    from pyspark.sql import Window as _W

    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    both = df.where(x.isNotNull() & y.isNotNull()).select(
        *group_cols, x.alias("__x"), y.alias("__y")
    )

    def _avg_rank(col: str, out: str):
        ordered = _W.partitionBy(*group_cols).orderBy(col)
        ties = _W.partitionBy(*group_cols, col)
        return (
            F.rank().over(ordered).cast("double")
            + (F.count(F.lit(1)).over(ties).cast("double") - 1.0) / 2.0
        ).alias(out)

    ranked = both.select(
        *group_cols, _avg_rank("__x", "__rx"), _avg_rank("__y", "__ry")
    )
    out = pearson_corr(ranked, "__rx", "__ry", group_cols=group_cols, scale=scale)
    return out.withColumnRenamed("corr", "spearman")
