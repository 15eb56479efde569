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

Round 11 bounds the buffer WITHOUT changing any result, via CHUNKED
collection: members are ranked within their bucket (row_number over the
member order) and collected per (bucket, chunk) where
``chunk = (rank - 1) // max_bucket_population`` — every collected array
is at most the cap. Pairs then come from exactly two disjoint sources:

- WITHIN a chunk: the round-10 row-local posexplode + slice expansion,
  unchanged (sorted members, emitted a-before-b).
- ACROSS two chunks of the same bucket: a self-join OF THE AGGREGATED
  CHUNK RELATION on (bucket, chunk_a < chunk_b), exploding both member
  arrays. Chunks partition the bucket by member rank, so every
  cross-chunk pair has its smaller member in the earlier chunk — the
  union is exactly the classic self-join's ``a < b`` row SET for any
  cap value. In the normal regime (every bucket under the cap) each
  bucket is one chunk and the join matches nothing.

Design history (measured, round 11): the first cut routed WHOLE
over-cap buckets through a classic self-join, deciding via a
count-window over the row-level relation. That needed the row-level
relation three times, and AQE exchange-stage reuse across the branches
proved unreliable — an aggregate anywhere in the lineage breaks
canonical equality outright (partial+final aggregates do not
canonicalize; q33 re-ran its whole scan->shingle->minhash pipeline once
PER BRANCH: 3 scans, +2 jobs, ~+2 s at sf0.1), and even
``sameResult``-equal exchanges (q52, verified node-by-node) re-plan as
separate stages under AQE's runtime re-optimization. Materializing the
row-level relation fixed the re-execution but cost the count() path a
full-width checkpoint (q52 +1-1.6 s, q82 +0.5 s on interleaved A/B).
The chunked shape keeps ONE single-consumer pipeline for everything
row-level; only the aggregated chunk relation (one array row per
multi-member bucket, each at most cap members) is consumed three times
and therefore checkpointed when ``materialize=True``.
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
    emitted with ``a`` before ``b`` in member order within the same
    bucket — the row SET of the classic
    ``a.join(b, key).where(a.m < b.m)`` self-join plus the
    equal-member position pairs the sorted expansion has always
    emitted; callers keep their own strict ``a < b`` /
    threshold / distinct predicates unchanged. Null bucket keys and
    null members never pair (explicitly filtered; the classic join was
    null-rejecting already).

    ``max_bucket_population`` bounds the aggregation buffer, NEVER
    membership: a bucket larger than the cap is collected as several
    rank-chunks of at most cap members, and chunk-crossing pairs come
    from a self-join of the (small) chunk relation. Results are
    identical for any cap value. Rows whose bucket has a single member
    die before expansion (their lone size-1 chunk matches nothing),
    except in the degenerate ``cap == size(ms)`` case where they ride
    along harmlessly.

    ``materialize=True`` (every production call site) eagerly
    localCheckpoints the chunk relation — it feeds the within-chunk
    expansion and both self-join sides, and without the checkpoint AQE
    re-executes the whole upstream once per consumer (module
    docstring). Side effect: calling this function then runs Spark
    jobs at plan time and pins the (bucket-count-sized) chunk rows for
    the session — the jaccard_for_pairs precedent.

    Determinism note: equal member VALUES tie in the rank order, so
    which copy lands in which chunk is not fixed; the emitted pair SET
    is invariant, but the pair MULTISET for duplicated members can
    vary with the cap (exactly as it did between the r10 expansion and
    the classic join). Every call site keys members by a unique id, and
    the one consumer that can see duplicates (q33) applies distinct.
    """
    if max_bucket_population <= 0:
        raise ValueError(
            f"max_bucket_population must be positive, got {max_bucket_population}"
        )
    from pyspark.sql import Window

    cap = int(max_bucket_population)
    # nulls never pair (join-leg semantics, kept explicit so the plan
    # is identical on every consumer branch)
    nn = F.col(member_col).isNotNull()
    for c in group_cols:
        nn = nn & F.col(c).isNotNull()
    w = Window.partitionBy(*group_cols).orderBy("__m")
    chunked = (
        rel.where(nn)
        .select(*group_cols, F.col(member_col).alias("__m"))
        .withColumn("__c", ((F.row_number().over(w) - 1) / cap).cast("long"))
        # groupBy adds __c to the window's bucket-key partitioning —
        # hash(bucket) already clusters (bucket, __c), so this reuses
        # the window's one exchange
        .groupBy(*group_cols, "__c")
        .agg(F.sort_array(F.collect_list("__m")).alias("ms"))
        # singleton buckets die here (size-1 chunk 0, nothing to pair
        # within or across); size == cap keeps full chunks so cap=1
        # degenerates to the pure join shape instead of losing rows
        .where((F.size("ms") > 1) | (F.col("__c") > 0) | (F.size("ms") == cap))
    )
    if materialize:
        # plain localCheckpoint (not the stats-free re-wrap): a single
        # checkpoint cannot compound stats, and the relation is the
        # SMALL aggregate — one row per (multi-member bucket, chunk)
        chunked = chunked.localCheckpoint(eager=True)
    tail_len = F.greatest(F.size("ms") - F.col("i") - 1, F.lit(0))
    within = (
        chunked.select(*group_cols, F.posexplode("ms").alias("i", "a"), "ms")
        .select(
            *group_cols,
            "a",
            F.explode(F.slice("ms", F.col("i") + 2, tail_len)).alias("b"),
        )
    )
    ca, cb = chunked.alias("ca"), chunked.alias("cb")
    cond = [F.col(f"ca.{c}") == F.col(f"cb.{c}") for c in group_cols]
    # rank-chunks are member-ordered, so every member of an earlier
    # chunk precedes (<=, with equality only for boundary duplicates)
    # every member of a later one — a < b orientation is structural
    cond.append(F.col("ca.__c") < F.col("cb.__c"))
    cross = (
        ca.join(cb, cond)
        .select(
            *[F.col(f"ca.{c}").alias(c) for c in group_cols],
            F.explode(F.col("ca.ms")).alias("a"),
            F.col("cb.ms").alias("__bms"),
        )
        .select(*group_cols, "a", F.explode("__bms").alias("b"))
    )
    return within.unionByName(cross)
