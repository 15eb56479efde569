"""Sketch profiling tests: HLL estimates within tolerance of exact,
mergeability (daily partials -> global rollup == direct global), and
map-side-combine plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from terrorblade_spark.operators.sketches import hll_merge, hll_partial, sketch_profile


def test_sketch_profile_tolerance(spark):
    # 40k rows, 20k distinct users, uniform values
    df = spark.range(0, 40_000).select(
        (F.col("id") % 4).alias("g"),
        (F.col("id") % 20_000).alias("user_id"),
        (F.col("id") % 1000).cast("double").alias("value"),
    )
    rows = {
        r["g"]: r
        for r in sketch_profile(
            df, ["g"], ["user_id"], percentile_col="value", percentiles=(0.5, 0.99)
        ).collect()
    }
    assert set(rows) == {0, 1, 2, 3}
    for r in rows.values():
        assert r["n_rows"] == 10_000
        # each g sees 5,000 distinct users; HLL default rsd ~2.3%
        assert abs(r["approx_n_user_id"] - 5_000) / 5_000 < 0.05
        # uniform 0..999 -> p50 ~ 500, p99 ~ 990 (exact-rank sketch)
        assert 450 <= r["p5_value"] <= 550
        assert 970 <= r["p99_value"] <= 999


def test_hll_partials_merge_equals_direct(spark):
    df = spark.range(0, 30_000).select(
        (F.col("id") % 30).alias("day"),
        (F.col("id") % 7).alias("source"),
        F.concat(F.lit("u"), (F.col("id") % 9_000).cast("string")).alias("user"),
    )
    # per-(day, source) partials -> rollup to source
    partials = hll_partial(df, ["day", "source"], "user")
    merged = {r["source"]: r for r in hll_merge(partials, ["source"]).collect()}
    # direct sketch at source granularity
    direct = {
        r["source"]: r
        for r in hll_merge(hll_partial(df, ["source"], "user"), ["source"]).collect()
    }
    exact = {
        r["source"]: r["n"]
        for r in df.groupBy("source").agg(F.countDistinct("user").alias("n")).collect()
    }
    for s in exact:
        # union-of-partials re-encodes internally (Datasketches HLL), so
        # it's not bit-identical to direct — but both must sit within
        # the sketch's error envelope of each other and of exact
        rel = abs(merged[s]["approx_distinct"] - direct[s]["approx_distinct"]) / exact[s]
        assert rel < 0.02
        assert merged[s]["n_rows"] == direct[s]["n_rows"]
        assert abs(merged[s]["approx_distinct"] - exact[s]) / exact[s] < 0.05


def test_sketch_aggs_partial_combine(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 4).alias("g"), F.col("id").alias("v")
    )
    plan = (
        sketch_profile(df, ["g"], ["v"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # two-phase hash aggregate (partial before the exchange)
    assert plan.count("HashAggregate") >= 2
    p2 = hll_partial(df, ["g"], "v")._jdf.queryExecution().executedPlan().toString()
    assert "ObjectHashAggregate" in p2 or "HashAggregate" in p2


def test_frequent_items_exact_recount_finds_true_heavy_hitters(spark):
    """Zipf-ish column: a handful of hot values over a wide tail. The
    MG summary must surface every value above the N/(capacity+1)
    guarantee, and the recount must report exact counts."""
    from terrorblade_spark.operators.sketches import frequent_items

    # 60k rows: value "hot_i" appears (10-i)*2000 times for i in 0..4
    # (20k, 16k, ...), tail of 20k distinct singletons
    hot = spark.range(0, 40_000).select(
        F.concat(F.lit("hot_"), (F.col("id") % 5).cast("string")).alias("v")
    )
    tail = spark.range(0, 20_000).select(
        F.concat(F.lit("tail_"), F.col("id").cast("string")).alias("v")
    )
    df = hot.unionByName(tail).repartition(8)

    top = frequent_items(df, "v", capacity=64, k=5).collect()
    assert [r["value"] for r in top] == [f"hot_{i}" for i in range(5)]
    assert all(r["n"] == 8_000 for r in top)  # exact counts, 40k/5 each


def test_frequent_items_lower_bound_mode(spark):
    """One-pass mode: counts are lower bounds (never overcounts), and
    values above the guarantee threshold always survive."""
    from terrorblade_spark.operators.sketches import frequent_items

    hot = spark.range(0, 30_000).select(F.lit("dominant").alias("v"))
    tail = spark.range(0, 30_000).select(
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("v")
    )
    df = hot.unionByName(tail).repartition(4)
    rows = {
        r["value"]: r["n"]
        for r in frequent_items(df, "v", capacity=32, exact_recount=False).collect()
    }
    assert "dominant" in rows  # freq 0.5 >> 1/33 guarantee
    assert rows["dominant"] <= 30_000  # lower bound, never overcount


def test_frequent_items_shuffles_summaries_not_rows(spark):
    """The merge aggregate's input is the MG summary (<= capacity rows
    per partition), not the raw column — assert no full-cardinality
    groupBy feeds the merge by checking the summary row count."""
    from terrorblade_spark.operators.sketches import frequent_items

    df = spark.range(0, 50_000).select(
        F.concat(F.lit("v"), (F.col("id") % 10_000).cast("string")).alias("v")
    ).repartition(8)
    out = frequent_items(df, "v", capacity=16, exact_recount=False)
    # 8 partitions x <= 16 counters each -> <= 128 candidate rows
    assert out.count() <= 128


def test_frequent_items_sample_mode(spark):
    """Sampled-candidate mode: JVM-only path, same exact recounts for
    values comfortably above the sampling detection floor."""
    from terrorblade_spark.operators.sketches import frequent_items

    hot = spark.range(0, 40_000).select(
        F.concat(F.lit("hot_"), (F.col("id") % 4).cast("string")).alias("v")
    )
    tail = spark.range(0, 10_000).select(
        F.concat(F.lit("tail_"), F.col("id").cast("string")).alias("v")
    )
    df = hot.unionByName(tail).repartition(8)
    top = frequent_items(df, "v", capacity=32, k=4, method="sample", sample_fraction=0.1).collect()
    assert [r["value"] for r in top] == [f"hot_{i}" for i in range(4)]
    assert all(r["n"] == 10_000 for r in top)


def test_top_k_per_group_matches_duckdb(spark, duck, sf_dir):
    from terrorblade_spark.operators.sketches import top_k_per_group
    from terrorblade_spark.tables import load_table

    df = load_table(spark, sf_dir, "events")
    got = [
        (r["user_id"], r["event_type"], r["n"], r["rank"])
        for r in top_k_per_group(
            df.select("user_id", "event_type"), ["user_id"], "event_type", k=2
        ).collect()
    ]
    want = [
        tuple(r)
        for r in duck.execute(
            """
            SELECT user_id, event_type, n, rank FROM (
              SELECT user_id, event_type, count(*) AS n,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY count(*) DESC, event_type ASC) AS rank
              FROM events GROUP BY 1, 2
            ) WHERE rank <= 2 ORDER BY user_id, rank
            """
        ).fetchall()
    ]
    assert got == want


def test_boundary_bucket_matches_bisect_property(spark):
    """boundary_bucket == the bisect count for random values/bounds in
    BOTH inclusive modes — 300 random cases evaluated in one job."""
    import bisect
    import random

    from terrorblade_spark.functions.exprs import boundary_bucket

    rnd = random.Random(7)
    cases = []
    for i in range(300):
        bounds = sorted(rnd.uniform(-100, 100) for _ in range(rnd.randint(1, 9)))
        # half the values land EXACTLY on a boundary — the tie side is
        # the part worth testing
        v = rnd.choice(bounds) if i % 2 == 0 else rnd.uniform(-120, 120)
        cases.append((i, v, bounds))

    df = spark.createDataFrame(
        [(i, v) for i, v, _ in cases], "case_id long, value double"
    )
    # all cases evaluate in one job via a coalesced when-chain
    import pyspark.sql.functions as SF

    exprs = []
    for i, v, bounds in cases:
        exprs.append(
            SF.when(SF.col("case_id") == i, boundary_bucket(SF.col("value"), bounds))
        )
    inc = df.select("case_id", "value", SF.coalesce(*exprs).alias("b")).collect()
    got_inc = {r["case_id"]: r["b"] for r in inc}
    exprs2 = []
    for i, v, bounds in cases:
        exprs2.append(
            SF.when(
                SF.col("case_id") == i,
                boundary_bucket(SF.col("value"), bounds, inclusive=False),
            )
        )
    exc = df.select("case_id", SF.coalesce(*exprs2).alias("b")).collect()
    got_exc = {r["case_id"]: r["b"] for r in exc}

    for i, v, bounds in cases:
        uniq = sorted(set(bounds))
        assert got_inc[i] == bisect.bisect_right(uniq, v), (v, bounds)
        assert got_exc[i] == bisect.bisect_left(uniq, v), (v, bounds)


def test_sampled_frequent_items_scaled_to_corpus_magnitude(spark):
    """Review repro: sample mode without the exact recount returned raw
    sample counts (~1/fraction too small)."""
    from terrorblade_spark.operators.sketches import frequent_items

    df = spark.createDataFrame(
        [(i, "hot" if i % 2 == 0 else f"cold{i}") for i in range(20000)],
        "i long, v string",
    )
    got = {r["value"]: r["n"] for r in frequent_items(
        df, "v", capacity=4, method="sample", sample_fraction=0.1,
        exact_recount=False,
    ).collect()}
    # true count 10,000; the scaled estimate must be the right magnitude
    assert 8000 <= got["hot"] <= 12000, got


# --- count-min sketch --------------------------------------------------------

from terrorblade_spark.operators.sketches import (
    countmin_estimate,
    countmin_merge,
    countmin_partial,
)


def _est(sketch, keys_df, **kw):
    out = countmin_estimate(sketch, keys_df, "k", **kw)
    return {r["k"]: r["est_count"] for r in out.collect()}


def test_countmin_exact_when_wide(spark):
    """width >> distinct keys: collisions are (near) absent and the
    estimate is the exact count; unseen keys estimate >= 0."""
    data = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(data, "k string")
    sk = countmin_partial(df, "k", depth=4, width=4096)
    keys = spark.createDataFrame([("a",), ("b",), ("c",), ("zz",)], "k string")
    got = _est(sk, keys, depth=4, width=4096)
    assert got["a"] == 5 and got["b"] == 3 and got["c"] == 1
    assert got["zz"] >= 0  # one-sided: never underestimates (true = 0)


def test_countmin_never_underestimates(spark):
    """The structural guarantee: est >= true for every key, even with
    heavy collisions (width=4 forces them)."""
    import collections

    vals = [f"k{i % 13}" for i in range(200)]
    true = collections.Counter(vals)
    df = spark.createDataFrame([(v,) for v in vals], "k string")
    sk = countmin_partial(df, "k", depth=3, width=4)
    keys = spark.createDataFrame([(k,) for k in true], "k string")
    got = _est(sk, keys, depth=3, width=4)
    for k, n in true.items():
        assert got[k] >= n


def test_countmin_merge_equals_whole(spark):
    """Mergeability: cellwise sum of two halves' sketches == the
    sketch of the union, hence identical estimates."""
    a = spark.createDataFrame([("x",)] * 4 + [("y",)] * 2, "k string")
    b = spark.createDataFrame([("x",)] * 1 + [("z",)] * 3, "k string")
    whole = a.unionByName(b)
    merged = countmin_merge(
        [countmin_partial(a, "k", width=256), countmin_partial(b, "k", width=256)]
    )
    direct = countmin_partial(whole, "k", width=256)
    keys = spark.createDataFrame([("x",), ("y",), ("z",)], "k string")
    assert _est(merged, keys, width=256) == _est(direct, keys, width=256)
    assert _est(merged, keys, width=256) == {"x": 5, "y": 2, "z": 3}


def test_countmin_grouped_state_is_bounded(spark):
    """Per-group sketches: estimates separate by group and the state
    relation is at most depth*width rows per group."""
    rows = [("g1", "a")] * 3 + [("g2", "a")] * 7
    df = spark.createDataFrame(rows, "g string, k string")
    sk = countmin_partial(df, "k", depth=2, width=8, group_cols=["g"])
    assert sk.count() <= 2 * 2 * 8
    keys = spark.createDataFrame([("g1", "a"), ("g2", "a")], "g string, k string")
    out = countmin_estimate(sk, keys, "k", depth=2, width=8, group_cols=["g"])
    got = {(r["g"], r["k"]): r["est_count"] for r in out.collect()}
    assert got[("g1", "a")] >= 3 and got[("g2", "a")] >= 7
    # g1's estimate must not absorb g2's mass beyond collision noise:
    # with distinct keys per group = 1, it is exact
    assert got[("g1", "a")] == 3 and got[("g2", "a")] == 7


def test_countmin_rejects_bad_params(spark):
    df = spark.createDataFrame([("a",)], "k string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        countmin_partial(df, "k", depth=0)


def test_countmin_txn_fold_matches_direct(spark, tmp_path):
    """Three batches folded through the transactional state == one
    sketch of the concatenation; a replayed batch id is a no-op."""
    from terrorblade_spark.operators.sketches import countmin_update_txn
    from terrorblade_spark.txn import TxnTable

    t = TxnTable(str(tmp_path / "cm"))
    batches = [
        [("a",)] * 3 + [("b",)] * 1,
        [("a",)] * 2 + [("c",)] * 4,
        [("b",)] * 5,
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "k string")
        countmin_update_txn(t, df, "k", width=256, applied_id=f"b{i}")
    # replay of batch 1 must not double-count
    countmin_update_txn(
        t, spark.createDataFrame(batches[1], "k string"), "k", width=256,
        applied_id="b1",
    )
    whole = spark.createDataFrame(
        [r for b in batches for r in b], "k string"
    )
    direct = countmin_partial(whole, "k", width=256)
    keys = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
    got = _est(t.read(spark), keys, width=256)
    assert got == _est(direct, keys, width=256)
    assert got == {"a": 5, "b": 6, "c": 4}


def test_countmin_txn_concurrent_folds_no_lost_update(spark, tmp_path):
    """Two writers folding different batches concurrently: both land
    (the expected_version conflict path re-reads and re-merges)."""
    from concurrent.futures import ThreadPoolExecutor

    from terrorblade_spark.operators.sketches import countmin_update_txn
    from terrorblade_spark.txn import TxnTable

    t = TxnTable(str(tmp_path / "cm2"))
    countmin_update_txn(
        t, spark.createDataFrame([("x",)], "k string"), "k", width=64,
        applied_id="seed",
    )

    def fold(tag, n):
        df = spark.createDataFrame([(tag,)] * n, "k string")
        countmin_update_txn(t, df, "k", width=64, applied_id=tag)

    with ThreadPoolExecutor(2) as ex:
        list(ex.map(lambda a: fold(*a), [("x", 4), ("y", 7)]))
    keys = spark.createDataFrame([("x",), ("y",)], "k string")
    got = _est(t.read(spark), keys, width=64)
    assert got == {"x": 5, "y": 7}


# --- bottom-k quantile sketch -------------------------------------------------


def test_quantile_sketch_merge_is_exact_and_replay_idempotent(spark):
    """Bottom-k of a union == bottom-k of merged bottom-k's, in any
    fold order; re-folding an already-seen batch changes nothing."""
    from terrorblade_spark.operators.sketches import (
        quantile_sketch_merge,
        quantile_sketch_partial,
    )

    rows = [(i, float((i * 37) % 101)) for i in range(900)]
    whole = spark.createDataFrame(rows, "id long, v double")
    batches = [
        spark.createDataFrame(rows[i : i + 300], "id long, v double")
        for i in (0, 300, 600)
    ]
    k = 64
    direct = {
        r["__h"]: r["__v"]
        for r in quantile_sketch_partial(whole, "v", "id", k=k).collect()
    }
    parts = [quantile_sketch_partial(b, "v", "id", k=k) for b in batches]
    for order in ([0, 1, 2], [2, 0, 1]):
        folded = quantile_sketch_merge([parts[i] for i in order], k=k)
        got = {r["__h"]: r["__v"] for r in folded.collect()}
        assert got == direct, order
    # replay: batch 1's partial folded twice
    replay = quantile_sketch_merge([parts[0], parts[1], parts[1], parts[2]], k=k)
    got = {r["__h"]: r["__v"] for r in replay.collect()}
    assert got == direct


def test_quantile_sketch_partial_two_stage_matches_direct(spark):
    """The two-stage (per-input-partition prune, then exact group
    window) bottom-k equals the direct global bottom-k, and the plan
    shows the parallel local stage (a __pid window) so an ungrouped
    partial never funnels the raw input through one partition."""
    from terrorblade_spark.functions.exprs import hash64
    from terrorblade_spark.operators.sketches import quantile_sketch_partial

    rows = [(i, float(i % 17)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, v double").repartition(8)
    k = 50
    part = quantile_sketch_partial(df, "v", "id", k=k)
    got = sorted((r["__h"], r["__v"]) for r in part.collect())
    # expected: k smallest hashes over the whole input
    all_h = (
        df.select(
            hash64(F.col("id").cast("string"), salt="qsk-v1/").alias("h"), "v"
        )
        .collect()
    )
    want = sorted((r["h"], r["v"]) for r in all_h)[:k]
    assert got == want
    plan = part._jdf.queryExecution().executedPlan().toString()
    assert "__pid" in plan  # local prune stage present


def test_countmin_estimate_broadcast_only_ungrouped(spark):
    """Ungrouped sketch joins broadcast (depth*width rows, bounded);
    grouped sketches are per-group-sized so the hint is NOT forced —
    the optimizer/AQE picks the strategy."""
    from terrorblade_spark.operators.sketches import (
        countmin_estimate,
        countmin_partial,
    )

    df = spark.createDataFrame([(f"k{i % 5}", i % 3) for i in range(60)], "k string, g int")
    flat_sketch = countmin_partial(df, "k", depth=2, width=64)
    flat = countmin_estimate(flat_sketch, df.select("k").distinct(), "k", depth=2, width=64)
    assert "ResolvedHint" in flat._jdf.queryExecution().optimizedPlan().toString() or \
        "BroadcastHashJoin" in flat._jdf.queryExecution().executedPlan().toString()
    g_sketch = countmin_partial(df, "k", depth=2, width=64, group_cols=["g"])
    gro = countmin_estimate(
        g_sketch, df.select("g", "k").distinct(), "k", depth=2, width=64, group_cols=["g"]
    )
    assert "ResolvedHint" not in gro._jdf.queryExecution().optimizedPlan().toString()
    # results still correct without the forced hint
    got = {(r["g"], r["k"]): r["est_count"] for r in gro.collect()}
    true = {(r["g"], r["k"]): r["n"] for r in df.groupBy("g", "k").agg(F.count(F.lit(1)).alias("n")).collect()}
    for key, est in got.items():
        assert est >= true[key]


def test_quantile_sketch_estimate_within_dkw_rank_error(spark):
    """k=2048 gives ~3% rank error at 95% confidence; assert 5% on a
    50k-row skewed distribution for three seeds."""
    import numpy as np

    from terrorblade_spark.operators.sketches import (
        quantile_sketch_estimate,
        quantile_sketch_partial,
    )

    rng = np.random.default_rng(3)
    vals = np.concatenate([rng.exponential(10, 45000), rng.uniform(500, 600, 5000)])
    df = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(vals)], "id long, v double"
    )
    s = np.sort(vals)
    for seed in ("a", "b", "c"):
        sk = quantile_sketch_partial(df, "v", "id", k=2048, seed=seed)
        est = quantile_sketch_estimate(sk, (0.5, 0.9, 0.99)).collect()[0]
        for q, col in ((0.5, "p0_5"), (0.9, "p0_9"), (0.99, "p0_99")):
            rank = np.searchsorted(s, est[col]) / len(s)
            assert abs(rank - q) < 0.05, (seed, q, rank)


def test_quantile_sketch_grouped_estimates(spark):
    from terrorblade_spark.operators.sketches import (
        quantile_sketch_estimate,
        quantile_sketch_partial,
    )

    rows = [(i, "lo" if i % 2 else "hi", float(i % 2 or 1000)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    sk = quantile_sketch_partial(df, "v", "id", k=256, group_cols=("g",))
    got = {
        r["g"]: r["p0_5"]
        for r in quantile_sketch_estimate(sk, (0.5,), group_cols=("g",)).collect()
    }
    assert got == {"hi": 1000.0, "lo": 1.0}
    # state bound: never more than k rows per group
    counts = {r["g"]: r["n"] for r in sk.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert all(c <= 256 for c in counts.values())


def test_quantile_sketch_txn_fold_replay_and_concurrency(spark, tmp_path):
    """Per-batch folds land exactly once (replay no-op), concurrent
    folds both land via the conflict re-merge, and the folded state
    equals the one-shot sketch of all rows."""
    from concurrent.futures import ThreadPoolExecutor

    from terrorblade_spark.operators.sketches import (
        quantile_sketch_partial,
        quantile_sketch_update_txn,
    )
    from terrorblade_spark.txn import TxnTable

    rows = [(i, float(i)) for i in range(600)]
    mk = lambda lo, hi: spark.createDataFrame(rows[lo:hi], "id long, v double")
    t = TxnTable(str(tmp_path / "qsk"))
    quantile_sketch_update_txn(t, mk(0, 200), "v", "id", k=32, applied_id="b0")
    quantile_sketch_update_txn(t, mk(0, 200), "v", "id", k=32, applied_id="b0")  # replay

    def fold(tag, lo, hi):
        quantile_sketch_update_txn(t, mk(lo, hi), "v", "id", k=32, applied_id=tag)

    with ThreadPoolExecutor(2) as ex:
        list(ex.map(lambda a: fold(*a), [("b1", 200, 400), ("b2", 400, 600)]))

    direct = quantile_sketch_partial(
        spark.createDataFrame(rows, "id long, v double"), "v", "id", k=32
    )
    got = {(r["__h"], r["__v"]) for r in t.read(spark).collect()}
    want = {(r["__h"], r["__v"]) for r in direct.collect()}
    assert got == want and len(got) == 32
