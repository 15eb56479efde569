"""Relational operators (SURVEY §2.1–§2.3, §2.7).

Each is a composable ``DataFrame -> DataFrame`` building block; Catalyst
handles pushdown/pruning/join strategy. Scale notes inline.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_by(df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]) -> DataFrame:
    """W1 'latest name' dedup: one row per key, picked by ``order_by``
    (descending columns included by caller, plus a deterministic
    tiebreaker). Reference: telegram_database.py:331-343.

    Single shuffle on ``keys``; at scale prefer this over
    groupBy+join (one pass, no second shuffle).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def anti_join_new(df: DataFrame, existing: DataFrame, keys: Sequence[str]) -> DataFrame:
    """P4/S5 idempotent-append filter: rows of ``df`` whose key is not
    already in ``existing``. Replaces the reference's driver-side id-set
    collection (TelegramPreprocessor.py:1270-1277) — never collects.

    NULL-SAFE on the keys: plain `on=keys` equality is NULL for NULL
    key cells, so a row with a NULL key part would count as "new" on
    EVERY run and idempotent_append would re-append it per retry.
    """
    from functools import reduce

    ex = existing.select(*keys).alias("__ex")
    d = df.alias("__new")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"__new.{k}").eqNullSafe(F.col(f"__ex.{k}")) for k in keys],
    )
    return d.join(ex, cond, "left_anti")


def idempotent_append(new_rows: DataFrame, existing: DataFrame, keys: Sequence[str]) -> DataFrame:
    """S5 'INSERT OR IGNORE' as a plan: existing ∪ (new ∖ existing).

    With Delta this would be MERGE WHEN NOT MATCHED INSERT; on plain
    parquet the anti-join+append is the transactional-enough analog
    (telegram_database.py:925-928).
    """
    return existing.unionByName(anti_join_new(new_rows, existing, keys))


def upsert_latest(new_rows: DataFrame, existing: DataFrame, keys: Sequence[str], version_col: str) -> DataFrame:
    """S6 'INSERT OR REPLACE': union then keep the newest version per
    key. Version TIES go to the NEW row — re-upserting a row with an
    unchanged version must apply the update (the REPLACE semantics),
    and the tiebreaker must be a real one: ordering by the partition
    keys (constant within the partition) broke no ties, which left the
    winner to shuffle order."""
    merged = existing.select("*", F.lit(0).alias("__src")).unionByName(
        new_rows.select("*", F.lit(1).alias("__src")), allowMissingColumns=True
    )
    order = [F.col(version_col).desc_nulls_last(), F.col("__src").desc()]
    return latest_by(merged, keys, order).drop("__src")


def dictionary_encode(
    df: DataFrame, value_col: str, id_col: str = "id", start_id: int = 0
) -> DataFrame:
    """S7 dictionary table: distinct values -> dense ids, deterministic
    by sort order. Distinct + a single-partition window over the (tiny)
    dictionary — the window runs on the already-collapsed distinct set,
    so the single partition holds only unique values, not rows.
    """
    w = Window.orderBy(value_col)
    return (
        df.select(value_col)
        .where(F.col(value_col).isNotNull())
        .distinct()
        .withColumn(id_col, (F.row_number().over(w) - 1 + start_id).cast("int"))
    )


def apply_dictionary(df: DataFrame, dim: DataFrame, value_col: str, id_col: str) -> DataFrame:
    """Replace a low-cardinality string column with its dictionary id via
    broadcast join (replaces map_elements lookup, telegram_database.py:769-778).

    The dictionary's id column is renamed BEFORE the join: with the
    default id_col='id' and a df that already has an 'id' column the
    old drop/rename corrupted the frame (two identically-named output
    columns).
    """
    out_col = value_col + "_id"
    lookup = dim.select(value_col, F.col(id_col).alias(out_col))
    return df.join(F.broadcast(lookup), on=value_col, how="left").drop(value_col)


def scd_rollup(df: DataFrame, keys: Sequence[str], ts_col: str) -> DataFrame:
    """A5 name-dim rollup: first_seen/last_seen per (id, name)
    (telegram_database.py:804-809)."""
    return df.groupBy(*keys).agg(
        F.min(ts_col).alias("first_seen"), F.max(ts_col).alias("last_seen")
    )


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    content_cols: Sequence[str],
    status_col: str = "status",
) -> DataFrame:
    """Row-level diff between two dataset versions — the crawl-over-
    crawl ops tool: per key, ``added`` (new only), ``removed`` (old
    only), ``changed`` (both, any content column differs null-safely),
    or ``unchanged``. Returns one row per key with ``status_col``.

    Plan: content is collapsed to ONE 60-bit hash per side before the
    join (concat_ws over the content columns with a NULL sentinel —
    ``concat_ws`` silently skips NULLs, so ('a', NULL) and ('a',)
    would collide without it), then a single full-outer equi-join on
    the key; bodies never cross the shuffle twice. Complements
    operators/lm.py corpus drift (distribution-level) with exact
    row-level accounting.
    """
    from pyspark.sql import functions as F

    from terrorblade_spark.functions.exprs import hash64

    def hashed(df: DataFrame, side: str) -> DataFrame:
        payload = F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in content_cols]
        )
        return df.select(F.col(key_col), hash64(payload).alias(f"__h_{side}"))

    o, n = hashed(old, "old"), hashed(new, "new")
    joined = o.join(n, key_col, "full_outer")
    return joined.select(
        key_col,
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias(status_col),
    )
