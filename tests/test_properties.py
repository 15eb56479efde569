"""Property-based determinism tests (hypothesis): order-sensitive
operators must return identical results regardless of input
partitioning and arrival order — the property that makes them safe on
1000 executors where shuffle order is nondeterministic.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from terrorblade_spark.operators.windows import run_ids, sessionize

_slow = settings(
    max_examples=8,  # each example runs Spark jobs; keep the budget tight
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),        # entity
        st.integers(min_value=0, max_value=10_000),   # offset seconds
    ),
    min_size=1,
    max_size=40,
)


def _df(spark, rows, n_parts):
    t0 = datetime(2024, 1, 1)
    data = [
        (i, ent, t0 + timedelta(seconds=off))
        for i, (ent, off) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, entity long, ts timestamp"
    ).repartition(n_parts)


@given(rows=_events)
@_slow
def test_sessionize_partitioning_invariant(spark, rows):
    outs = []
    for n_parts in (1, 7):
        df = _df(spark, rows, n_parts)
        got = sessionize(df, "ts", ["entity"], "event_id", gap=600).collect()
        outs.append(sorted((r["event_id"], r["session_id"]) for r in got))
    assert outs[0] == outs[1]
    # sanity: session ids start at 0
    assert min(sid for _, sid in outs[0]) == 0


@given(rows=_events)
@_slow
def test_run_ids_partitioning_invariant(spark, rows):
    outs = []
    for n_parts in (1, 5):
        df = _df(spark, rows, n_parts).withColumn("flag", F.col("event_id") % 3)
        got = run_ids(
            df, F.col("flag"), ["entity"], ["ts", "event_id"], "rid"
        ).collect()
        outs.append(sorted((r["event_id"], r["rid"]) for r in got))
    assert outs[0] == outs[1]


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Zs")),
            max_size=60,
        ),
        min_size=1,
        max_size=20,
    )
)
@_slow
def test_minhash_partitioning_invariant(spark, texts):
    from terrorblade_spark.operators.dedup import minhash_signatures

    data = [(i, t) for i, t in enumerate(texts)]
    outs = []
    for n_parts in (1, 6):
        df = spark.createDataFrame(data, "doc_id long, text string").repartition(n_parts)
        got = minhash_signatures(df, "doc_id", "text", num_hashes=8, shingle_n=2).collect()
        outs.append(sorted((r["doc_id"], tuple(r["signature"])) for r in got))
    assert outs[0] == outs[1]


@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=15,
    )
)
@_slow
def test_topk_deterministic_under_ties(spark, vecs):
    # duplicate every vector so cosine ties are guaranteed; the id
    # tiebreaker must make top-k stable across partitionings
    from terrorblade_spark.operators.vector import cosine_topk

    data = [(i, [float(x) for x in v]) for i, v in enumerate(vecs + vecs)]
    outs = []
    for n_parts in (1, 4):
        df = spark.createDataFrame(data, "vec_id long, embedding array<float>").repartition(
            n_parts
        )
        q = df.where(F.col("vec_id") == 0)
        got = cosine_topk(df, q, k=5).collect()
        outs.append([(r["vec_id"], r["cosine_sim"]) for r in got])
    assert outs[0] == outs[1]


@given(
    texts=st.lists(
        # ASCII only: the engine tokenizes on Java \s+ (ASCII whitespace),
        # while Python str.split() also breaks on NBSP etc. — keep both
        # sides agreeing on what a token is.
        st.text(alphabet="abcdefghij ", min_size=3, max_size=40),
        min_size=1,
        max_size=8,
    )
)
@_slow
def test_lsh_candidates_catch_exact_duplicates(spark, texts):
    # identical texts agree on EVERY band hash, so an exact duplicate
    # pair must always surface as an LSH candidate (recall floor = 1.0
    # for true dups; the property that makes LSH usable for dedup)
    from terrorblade_spark.operators.dedup import minhash_lsh_candidates

    data = [(i, t) for i, t in enumerate(texts)]
    dup_base = len(data)
    data += [(dup_base + i, t) for i, t in enumerate(texts)]  # duplicate all
    df = spark.createDataFrame(data, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(df, "doc_id", "text", num_hashes=8, bands=4, shingle_n=2).collect()
    }
    for i, t in enumerate(texts):
        if len(t.split()) >= 2:  # shingles are word-level: needs >= n tokens
            assert (i, dup_base + i) in got, (i, t)


@given(rows=_events)
@_slow
def test_sessionize_matches_native_session_window(spark, rows):
    # the cumsum-of-breaks sessionizer (W4, batch) and Spark's native
    # session_window (§2.12, streaming-capable) must produce the same
    # partitioning of events into sessions for the same gap
    df = _df(spark, rows, 3)
    gap_s = 600
    ours = (
        sessionize(df, "ts", ["entity"], "event_id", gap=gap_s)
        .groupBy("entity", "session_id")
        .agg(F.min("ts").alias("start"), F.count(F.lit(1)).alias("n"))
    )
    native = (
        df.groupBy("entity", F.session_window("ts", f"{gap_s} seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("entity", F.col("w.start").alias("start"), "n")
    )
    a = sorted(map(tuple, ours.select("entity", "start", "n").collect()))
    b = sorted(map(tuple, native.collect()))
    assert a == b


@given(rows=_events)
@_slow
def test_forward_fill_matches_pandas(spark, rows):
    import pandas as pd

    from terrorblade_spark.operators.windows import forward_fill

    df = _df(spark, rows, 4).withColumn(
        "v", F.when(F.col("event_id") % 3 == 0, F.col("event_id").cast("double"))
    )
    got = (
        forward_fill(df, "v", ["entity"], ["ts", "event_id"], "filled")
        .orderBy("entity", "ts", "event_id")
        .toPandas()
    )
    pdf = df.orderBy("entity", "ts", "event_id").toPandas()
    want = pdf.groupby("entity")["v"].ffill()
    assert [
        None if pd.isna(x) else x for x in got["filled"]
    ] == [None if pd.isna(x) else x for x in want]


_keys = st.lists(
    st.integers(min_value=0, max_value=1_000_000), min_size=1, max_size=60, unique=True
)


@given(keys=_keys)
@_slow
def test_shuffle_corpus_is_valid_permutation_any_partitioning(spark, keys):
    from terrorblade_spark.operators.sampling import shuffle_corpus

    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    a = shuffle_corpus(df.repartition(1), "doc_id", seed="p", n_shards=4)
    b = shuffle_corpus(df.repartition(5), "doc_id", seed="p", n_shards=4)
    ra = {r["doc_id"]: (r["shard"], r["pos"]) for r in a.collect()}
    rb = {r["doc_id"]: (r["shard"], r["pos"]) for r in b.collect()}
    assert ra == rb  # pure function of (seed, key)
    # (shard, pos) coordinates are unique and dense per shard
    coords = sorted(ra.values())
    assert len(set(coords)) == len(keys)
    from collections import Counter

    per_shard = Counter(s for s, _ in coords)
    for s, n in per_shard.items():
        assert sorted(p for sh, p in coords if sh == s) == list(range(n))


_vecs = st.lists(
    st.lists(
        st.floats(
            min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
        ),
        min_size=3,
        max_size=8,
    ),
    min_size=1,
    max_size=20,
)


@given(vecs=_vecs)
@_slow
def test_quantize_int8_error_bound_property(spark, vecs):
    from terrorblade_spark.operators.vector import quantize_int8

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    for r in quantize_int8(df).collect():
        v = vecs[r["vec_id"]]
        assert all(-127 <= q <= 127 for q in r["qvec"])
        if r["scale"] == 0.0:
            assert all(q == 0 for q in r["qvec"])
            continue
        for x, q in zip(v, r["qvec"]):
            # dequantization error is at most half a quantization step
            assert abs(x - q * r["scale"]) <= r["scale"] / 2 + 1e-9


@_slow
@given(
    toks=st.lists(st.integers(min_value=1, max_value=1500), min_size=1, max_size=60),
    n_parts=st.integers(min_value=1, max_value=6),
)
def test_pack_sequences_invariants_any_partitioning(spark, toks, n_parts):
    """Next-fit packing must (a) place every doc exactly once, (b) never
    overfill a bin except a single oversized doc, (c) number bins
    contiguously from 0 per shard — for ANY input partitioning."""
    from terrorblade_spark.operators.packing import pack_sequences

    budget = 1000
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "doc_id long, n long"
    ).repartition(n_parts)
    out = pack_sequences(df, "doc_id", "n", budget=budget, num_shards=4).collect()
    assert sorted(r.doc_id for r in out) == list(range(len(toks)))
    fills: dict = {}
    for r in out:
        assert r.bin_tokens == min(toks[r.doc_id], budget)
        fills.setdefault((r.shard, r.bin), []).append(r.bin_tokens)
    for members in fills.values():
        assert sum(members) <= budget or len(members) == 1
    shard_bins: dict = {}
    for shard, b in fills:
        shard_bins.setdefault(shard, set()).add(b)
    for bins in shard_bins.values():
        assert bins == set(range(len(bins)))


@_slow
@given(
    perm_seed=st.integers(min_value=0, max_value=1_000_000),
    overlap=st.integers(min_value=0, max_value=10),
)
def test_ranking_metrics_bounds_property(spark, perm_seed, overlap):
    """For any results list sharing `overlap` of 10 truth items, all
    metrics live in [0, 1], recall is exactly overlap/10, and a full
    match in truth order scores 1.0 everywhere."""
    import random

    from terrorblade_spark.operators.evalmetrics import ranking_metrics

    rng = random.Random(perm_seed)
    truth_items = list(range(10))
    res_items = truth_items[:overlap] + [100 + i for i in range(10 - overlap)]
    rng.shuffle(res_items)
    truth = spark.createDataFrame(
        [(1, it, r + 1) for r, it in enumerate(truth_items)],
        "query_id long, neighbor_id long, rank int",
    )
    res = spark.createDataFrame(
        [(1, it, r + 1) for r, it in enumerate(res_items)],
        "query_id long, neighbor_id long, rank int",
    )
    m = ranking_metrics(res, truth, k=10).collect()[0]
    assert m.recall_at_k == overlap / 10
    for v in (m.recall_at_k, m.mrr_at_k, m.ndcg_at_k):
        assert 0.0 <= v <= 1.0 + 1e-12
    perfect = ranking_metrics(truth, truth, k=10).collect()[0]
    assert perfect.recall_at_k == 1.0 and abs(perfect.ndcg_at_k - 1.0) < 1e-12


@_slow
@given(
    cands=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),                 # prompt
            st.floats(min_value=-5, max_value=5, allow_nan=False), # score
        ),
        min_size=1, max_size=40,
    ),
    n_parts=st.integers(min_value=1, max_value=6),
    margin=st.floats(min_value=0, max_value=2, allow_nan=False),
)
def test_preference_pairs_matches_python_reference(spark, cands, n_parts, margin):
    """For ANY candidate multiset and partitioning: chosen/rejected are
    the (score, id)-lexicographic extremes, the margin gate is exact,
    and groups below two scored candidates emit nothing."""
    from terrorblade_spark.operators.sft import preference_pairs

    rows = [(p, i, s) for i, (p, s) in enumerate(cands)]
    df = spark.createDataFrame(
        rows, "prompt long, cand_id long, score double"
    ).repartition(n_parts)
    got = {
        r.prompt: (r.chosen_id, r.rejected_id, r.n_candidates)
        for r in preference_pairs(df, ["prompt"], "score", "cand_id",
                                  margin=margin).collect()
    }
    want = {}
    by_prompt: dict[int, list[tuple[float, int]]] = {}
    for p, i, s in rows:
        by_prompt.setdefault(p, []).append((s, i))
    for p, lst in by_prompt.items():
        if len(lst) < 2:
            continue
        hi, lo = max(lst), min(lst)
        if hi[0] - lo[0] >= margin:
            want[p] = (hi[1], lo[1], len(lst))
    assert got == want


@_slow
@given(
    groups=st.lists(st.integers(min_value=0, max_value=3), min_size=1, max_size=40),
    n_parts=st.integers(min_value=1, max_value=6),
    cap=st.integers(min_value=1, max_value=6),
)
def test_repeat_to_balance_counts_and_epochs(spark, groups, n_parts, cap):
    """For ANY group multiset and partitioning: every row of group g
    appears exactly min(cap, ceil(max_n / n_g)) times with a contiguous
    1-based epoch counter."""
    from collections import Counter

    from terrorblade_spark.operators.sampling import repeat_to_balance

    df = spark.createDataFrame(
        [(g, i) for i, g in enumerate(groups)], "grp long, id long"
    ).repartition(n_parts)
    out = repeat_to_balance(df, "grp", max_epochs=cap).collect()
    sizes = Counter(groups)
    mx = max(sizes.values())
    expect = {g: min(cap, -(-mx // n)) for g, n in sizes.items()}
    per_row: dict[int, list[int]] = {}
    for r in out:
        assert r.n_epochs == expect[r.grp]
        per_row.setdefault(r.id, []).append(r.epoch)
    assert set(per_row) == set(range(len(groups)))
    for i, epochs in per_row.items():
        assert sorted(epochs) == list(range(1, expect[groups[i]] + 1))


_graph_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=12),
    ),
    min_size=1,
    max_size=30,
)


@_slow
@given(edges=_graph_edges)
def test_pagerank_mass_conserved_and_partition_invariant(spark, edges):
    """On ANY digraph (self-loops, dangling nodes, duplicates): total
    mass stays 1 and ranks are identical on 1 vs 7 input partitions."""
    from terrorblade_spark.operators.graph import pagerank

    a = spark.createDataFrame(edges, "src long, dst long").coalesce(1)
    b = spark.createDataFrame(edges, "src long, dst long").repartition(7)
    ra = {r["node"]: r["pagerank"] for r in pagerank(a, n_iter=4).collect()}
    rb = {r["node"]: r["pagerank"] for r in pagerank(b, n_iter=4).collect()}
    assert abs(sum(ra.values()) - 1.0) < 1e-9
    assert set(ra) == set(rb)
    for v in ra:
        assert ra[v] == pytest.approx(rb[v], abs=1e-12)


@_slow
@given(edges=_graph_edges, k=st.integers(min_value=2, max_value=4))
def test_kcore_nesting_property(spark, edges, k):
    """The (k+1)-core is a subgraph of the k-core, and every member's
    core degree is >= k — on any random graph."""
    from terrorblade_spark.operators.graph import kcore

    e = spark.createDataFrame(edges, "src long, dst long")
    lo = {r["node"]: r["core_degree"] for r in kcore(e, k).collect()}
    hi = {r["node"]: r["core_degree"] for r in kcore(e, k + 1).collect()}
    assert set(hi) <= set(lo)
    assert all(d >= k for d in lo.values())
    assert all(d >= k + 1 for d in hi.values())


@_slow
@given(edges=_graph_edges)
def test_random_walks_partition_invariant(spark, edges):
    """Seeded walks are identical on 1 vs 7 input partitions — the
    md5-arithmetic determinism contract."""
    from terrorblade_spark.operators.graph import random_walks

    a = spark.createDataFrame(edges, "src long, dst long").coalesce(1)
    b = spark.createDataFrame(edges, "src long, dst long").repartition(7)
    wa = sorted(map(tuple, random_walks(a, walk_length=3, seed="p").collect()))
    wb = sorted(map(tuple, random_walks(b, walk_length=3, seed="p").collect()))
    assert wa == wb
