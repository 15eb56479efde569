"""Capped within-bucket pair expansion — the shared recipe behind every
LSH/bucket near-dup candidate stage (MinHash bands, sign-LSH cells,
pHash chunks, q52's feature buckets).

Round 10 replaced the banded SELF-JOIN (which consumed its input twice
and forced a corpus-sized persist) with one groupBy(bucket) that
collects each bucket's sorted members and expands pairs row-locally.
That bounded each OUTPUT row by the bucket population P — strictly
better than the O(P^2) rows the join emitted — but left the
``collect_list`` aggregation buffer itself unbounded: ONE adversarial
bucket of 10M members materializes an ~80 MB+ array in a single
aggregation buffer (and collect_list's per-key buffer does not spill;
the sort-based fallback still builds the whole array for the key).

Round 11 completes the reshape with a population cap (guide §2.5 skew —
the ``max_shingle_df`` pattern applied to bucket population), WITHOUT
changing any result: over-cap buckets are ROUTED THROUGH THE CLASSIC
SELF-JOIN, which emits the identical pair set as O(P^2) individual
rows spread across tasks instead of one collected array. No bucket is
dropped; the pair set is provably the same on either leg, so every
declared query's output is unchanged on any input.

Plan shape: the population count is a window partitioned by the bucket
key, so the window's exchange is the same exchange the row-local leg's
groupBy needs; the upstream pipeline executes ONCE — via AQE exchange
reuse across the three consumer branches when the lineage is
aggregate-free (the explicit null pre-filter below is what makes the
branches canonically equal), or via an eager localCheckpoint
(``materialize=True``) when it is not (Spark cannot canonicalize a
partial+final aggregate under an exchange, so reuse never fires above
one). Window groups spill to disk (ExternalAppendOnlyUnsafeRowArray),
unlike a collect_list buffer, so the hot bucket never holds P rows in
memory at once on either leg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_pair_rows(
    rel: DataFrame,
    group_cols: list[str],
    member_col: str,
    max_bucket_population: int = 100_000,
    materialize: bool = False,
) -> DataFrame:
    """Ordered within-bucket pair rows ``(*group_cols, a, b)`` from one
    execution of ``rel``.

    ``rel`` must carry ``group_cols`` (the bucket key) and
    ``member_col`` (scalar or struct; structs compare lexicographically
    with the id leading, matching ``sort_array``'s order). Pairs are
    emitted with ``a`` strictly before ``b`` in member order within the
    same bucket — exactly the row set of the classic
    ``a.join(b, key).where(a.m < b.m)`` self-join. Callers keep their
    own downstream predicates (id inequality, similarity threshold,
    distinct) unchanged.

    Buckets with population <= ``max_bucket_population`` expand
    row-locally (sorted collect_list + posexplode/slice: one shuffle,
    collected row width bounded by the cap). Buckets above the cap
    self-join instead: the quadratic output is spread over ordinary
    rows and no task ever buffers the bucket. Population 1 buckets die
    before either leg. The cap must be > 0; it bounds MEMORY, never
    membership — results are identical for any cap value.

    ``materialize=True`` EAGERLY localCheckpoints the windowed relation
    (non-singleton rows only) before the legs split, so the upstream
    pipeline provably executes once. Every production call site sets
    it: AQE stage reuse across the three consumer branches proved
    unreliable — an aggregate anywhere in the lineage breaks canonical
    equality outright (partial+final aggregate pairs do not
    canonicalize; measured on q33 at sf0.1: 3 full
    scan->shingle->minhash executions, +2 jobs, ~+2 s), and even
    branches whose exchanges ARE ``sameResult``-equal (q52, verified
    node-by-node) re-plan as separate stages once AQE's runtime
    re-optimization rewrites one branch. The pure-plan default exists
    for composition inside already-materialized pipelines and for
    tests. Side effect when True: calling this function runs Spark
    jobs at plan time and pins the checkpointed rows for the session
    (the jaccard_for_pairs precedent).
    """
    if max_bucket_population <= 0:
        raise ValueError(
            f"max_bucket_population must be positive, got {max_bucket_population}"
        )
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols)
    # Null keys/members are filtered EXPLICITLY, before the window, on
    # every branch. Semantics: a null never pairs anyway (the join leg
    # is null-rejecting by equi-join semantics; the row-local leg's
    # callers all apply strict a < b filters, which drop null members).
    # Plan shape: this is what makes the three consumers share ONE
    # exchange — the optimizer infers isnotnull(<keys>) from the hot
    # leg's join condition and pushes it BELOW the window, so without
    # the same filter on the cold leg the exchange subtrees are not
    # canonically equal and AQE stage reuse does NOT fire: the whole
    # upstream pipeline (scan -> signatures -> band explode) executed
    # once PER BRANCH (measured on q33: 3 scans, +2 jobs, ~+2 s at
    # sf0.1). With it, the plan is one Exchange + two ReusedExchange.
    nn = F.col(member_col).isNotNull()
    for c in group_cols:
        nn = nn & F.col(c).isNotNull()
    pop = (
        rel.where(nn)
        .select(*group_cols, F.col(member_col).alias("__m"))
        .withColumn("__p", F.count(F.lit(1)).over(w))
    )
    pop = pop.where(F.col("__p") > 1)
    if materialize:
        # plain localCheckpoint (not the stats-free re-wrap): this is a
        # single checkpoint, not an iterative loop, so origin stats
        # cannot compound — and the public API keeps row copying /
        # storage-level handling
        pop = pop.localCheckpoint(eager=True)
    cold = pop.where(F.col("__p") <= F.lit(max_bucket_population))
    members = cold.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("__m")).alias("ms")
    )
    tail_len = F.greatest(F.size("ms") - F.col("i") - 1, F.lit(0))
    cold_pairs = (
        members.select(*group_cols, F.posexplode("ms").alias("i", "a"), "ms")
        .select(
            *group_cols,
            "a",
            F.explode(F.slice("ms", F.col("i") + 2, tail_len)).alias("b"),
        )
    )
    hot = pop.where(F.col("__p") > F.lit(max_bucket_population)).select(
        *group_cols, "__m"
    )
    ha, hb = hot.alias("ha"), hot.alias("hb")
    cond = [F.col(f"ha.{c}") == F.col(f"hb.{c}") for c in group_cols]
    # strict member order matches both the sorted-array expansion and
    # the historical self-join's a < b guard: equal members (duplicate
    # ids in one bucket) pair on NEITHER leg's output after the
    # callers' strict-inequality filters, and each unordered pair
    # appears exactly once
    cond.append(F.col("ha.__m") < F.col("hb.__m"))
    hot_pairs = ha.join(hb, cond).select(
        *[F.col(f"ha.{c}").alias(c) for c in group_cols],
        F.col("ha.__m").alias("a"),
        F.col("hb.__m").alias("b"),
    )
    return cold_pairs.unionByName(hot_pairs)
