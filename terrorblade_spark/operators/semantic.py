"""Semantic segmentation + message-group operators (SURVEY §2.9
E2–E7): the reference's conversation-clustering pipeline re-expressed
as window plans.

Reference semantics preserved:
- E3 sliding distance (TextPreprocessor.py:248-302): row i's distance
  is ``1 - mean(cos(emb_i, emb_j))`` over the previous ``window`` rows
  j; first row of a partition -> 0.0.
- E4 segments (:461-499): semantic break where distance > threshold,
  segment id = cumsum of breaks (0-based).
- E5 groups (:429-459): new group when the semantic segment OR the
  temporal pre-cluster changes; first row forced to group 0 (falls out
  of coalescing the null lag comparison to 'changed').
- E6 author runs (:108-160): break on author change OR time gap.
- E7 orchestration (:304-387): one lazy plan — the reference's manual
  2000-row batching and global-continuity fix-up disappear entirely
  (SURVEY §4 'deleted' rows).

No Python UDF anywhere: cosine over the embedding arrays is a
higher-order-function fold (operators.vector.cosine), so the whole
pipeline stays JVM-side; embeddings themselves come from the E1
pandas UDF (functions.embed) or a stored table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from terrorblade_spark.operators.vector import cosine
from terrorblade_spark.operators.windows import entity_window, run_ids, sessionize


def sliding_distance(
    df: DataFrame,
    vec_col: str,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    window: int = 1,
    out_col: str = "distance",
) -> DataFrame:
    """E3: 1 - mean cosine to the previous ``window`` rows (0.0 for the
    first row). window=1 (the reference's only call site, :489) is a
    single lag; general window collects the trailing vectors once per
    row."""
    w = entity_window(partition_cols, order_cols)
    if window == 1:
        prev = F.lag(F.col(vec_col)).over(w)
        dist = 1.0 - cosine(F.col(vec_col), prev)
    else:
        trail = F.collect_list(F.col(vec_col)).over(
            w.rowsBetween(-window, -1)
        )
        # mean over NON-NULL sims: one zero-norm vector in the trail
        # would null the whole fold, coalesce to 0.0, and glue a real
        # semantic break onto the previous segment
        sims = F.filter(
            F.transform(trail, lambda v: cosine(F.col(vec_col), v)),
            lambda x: x.isNotNull(),
        )
        dist = F.when(
            F.size(sims) > 0,
            1.0
            - F.aggregate(sims, F.lit(0.0), lambda a, x: a + x) / F.size(sims),
        )
    return df.withColumn(out_col, F.coalesce(dist, F.lit(0.0)))


def semantic_segments(
    df: DataFrame,
    dist_col: str,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    threshold: float = 0.7,
    out_col: str = "semantic_segment",
) -> DataFrame:
    """E4: segment id = running count of rows whose sliding distance
    exceeds ``threshold`` (0-based; first row is never a break because
    its distance is 0.0)."""
    w = entity_window(partition_cols, order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    brk = (F.col(dist_col) > threshold).cast("int")
    return df.withColumn(out_col, F.sum(brk).over(w).cast("long"))


def calculate_groups(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    segment_col: str = "semantic_segment",
    cluster_col: str = "pre_cluster",
    out_col: str = "group_id",
) -> DataFrame:
    """E5: group id increments when EITHER the semantic segment or the
    temporal pre-cluster changes (struct-valued run_ids)."""
    return run_ids(
        df,
        F.struct(F.col(segment_col), F.col(cluster_col)),
        partition_cols,
        order_cols,
        out_col,
    )


def author_runs(
    df: DataFrame,
    author_col: str,
    ts_col: str,
    partition_cols: Sequence[str],
    id_col: str,
    gap: str | int = "5m",
    out_col: str = "message_group",
) -> DataFrame:
    """E6: new run on author change OR gap > window
    (TextPreprocessor.py:133-142)."""
    w = entity_window(partition_cols, [ts_col, id_col])
    # null-safe (see windows.run_ids): adjacent NULL authors — channel
    # posts with no from_id — are the SAME author, not a break each
    author_changed = F.coalesce(
        ~F.col(author_col).eqNullSafe(F.lag(F.col(author_col)).over(w)),
        F.lit(True),
    )
    return sessionize(
        df, ts_col, partition_cols, id_col, gap=gap,
        out_col=out_col, extra_break=author_changed,
    )


def concat_author_runs(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    id_col: str,
    text_col: str = "text",
    partition_cols: Sequence[str] = (),
    sep: str = ". ",
) -> DataFrame:
    """A1: collapse each run into one row — first metadata, min date,
    date-ordered text concat and id list (TextPreprocessor.py:144-156).
    Ordered deterministically by (ts, id) via sorted structs, immune to
    shuffle order."""
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col), F.col(id_col), F.col(text_col)))
    )
    keys = [*partition_cols, group_col]
    return df.groupBy(*keys).agg(
        F.min(ts_col).alias(ts_col),
        F.count(F.lit(1)).alias("n_messages"),
        F.array_join(
            F.transform(ordered, lambda s: s[text_col]), sep
        ).alias(text_col),
        F.transform(ordered, lambda s: s[id_col]).alias("message_ids"),
    )


def process_message_groups(
    df: DataFrame,
    vec_col: str,
    ts_col: str,
    partition_cols: Sequence[str],
    id_col: str,
    time_window: str | int = "5m",
    semantic_threshold: float = 0.7,
    cluster_size: int = 3,
) -> DataFrame:
    """E7: the full pipeline — temporal pre-clusters (E2), sliding
    distance (E3), semantic segments (E4), combined groups (E5), and
    the strict `> cluster_size` gate (TextPreprocessor.py:209-212,
    NULL group for small clusters) — in ONE window-chained plan that
    Catalyst executes with a single sort+shuffle per entity."""
    s = sessionize(df, ts_col, partition_cols, id_col, gap=time_window, out_col="pre_cluster")
    d = sliding_distance(s, vec_col, partition_cols, [ts_col, id_col])
    seg = semantic_segments(d, "distance", partition_cols, [ts_col, id_col], semantic_threshold)
    g = calculate_groups(seg, partition_cols, [ts_col, id_col])
    size_w = Window.partitionBy(*partition_cols, "group_id")
    return g.withColumn(
        "group_id",
        F.when(F.count(F.lit(1)).over(size_w) > cluster_size, F.col("group_id")),
    ).drop("distance")
