"""Plan-quality gates: these tests fail if a future change silently
degrades the physical plans — the properties that matter at 100 TB
(scan pruning, pushdown, broadcast dims, top-k without global sort,
no Python UDF in declared-JVM-only pipelines).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from terrorblade_spark.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_pushdown(spark, sf_dir):
    # a 2-column projection + filter must reach the parquet scan
    li = load_table(spark, sf_dir, "lineitem")
    q = li.where(F.col("l_shipdate") <= "1995-01-01").select("l_orderkey", "l_quantity")
    plan = _plan(q)
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read, plan
    assert "l_comment" not in read[0]  # widest column pruned
    assert "PushedFilters: [" in plan and "LessThanOrEqual(l_shipdate" in plan


def test_small_dims_broadcast(spark, sf_dir):
    # the TPC-H-Q5-shape star: every dim join broadcast, no shuffle join
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    q = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )
    plan = _plan(q)
    assert "BroadcastHashJoin" in plan
    # no sort-merge join anywhere in this star query
    assert "SortMergeJoin" not in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    # orderBy(...).limit(k) must compile to TakeOrderedAndProject
    from terrorblade_spark.registry import get_queries

    q = get_queries()["q36_cosine_topk"](spark, sf_dir)
    assert "TakeOrderedAndProject" in _plan(q)


def test_no_python_udf_in_jvm_pipelines(spark, sf_dir):
    # dedup/text/window pipelines promise no Python in the hot path
    from terrorblade_spark.registry import get_queries

    qs = get_queries()
    for name in (
        "q31_exact_dedup",
        "q33_minhash_lsh_pairs",
        "q34_ngram_jaccard",
        "q35_simhash",
        "q26_text_profile",
        "q24_long_session_mining",
        "q43_semantic_groups",
    ):
        plan = _plan(qs[name](spark, sf_dir))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_window_chain_single_sort(spark, sf_dir):
    # q43's chained windows (distance -> segments -> groups) share one
    # partitioning: exactly ONE exchange on the entity key
    from terrorblade_spark.registry import get_queries

    plan = _plan(get_queries()["q43_semantic_groups"](spark, sf_dir))
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 1, plan[:2000]


def test_ivf_probe_is_broadcast_semi(spark, sf_dir):
    from terrorblade_spark.registry import get_queries

    plan = _plan(get_queries()["q53_ivf_ann_topk"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_media_metadata_scan_skips_payload(spark, sf_dir):
    # reading kind+meta only must not materialize the binary column
    from terrorblade_spark.queries.multimodal import q48_media_profile

    plan = _plan(q48_media_profile(spark, sf_dir))
    reads = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    # content IS needed for fingerprints in q48; the assertion that
    # matters is the documents scan reads only the referenced columns
    assert reads and "lang" not in reads[0]


def test_jaccard_no_static_broadcast_of_doc_counts(spark, sf_dir):
    # the per-doc counts relation must carry NO broadcast hint: at 100 TB
    # it has one row per document and a forced broadcast is an OOM. AQE
    # may still broadcast it at runtime when it is genuinely small —
    # that's correct behavior; the static hint is the scale-killer.
    from terrorblade_spark.registry import get_queries

    q = get_queries()["q34_ngram_jaccard"](spark, sf_dir)
    analyzed = q._jdf.queryExecution().analyzed().toString()
    # the only hint allowed is the deliberate 1-row __cap scalar
    # broadcast (its subtree prints once per consumer of the members
    # relation). Any other hint — notably on the per-doc counts — fails.
    for seg in analyzed.split("ResolvedHint")[1:]:
        assert "__cap" in seg[:600], seg[:600]


def test_aggregations_partial(spark, sf_dir):
    # groupBy must plan partial (map-side) aggregation before the
    # exchange: two HashAggregate nodes around one shuffle
    li = load_table(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(F.count(F.lit(1)))
    plan = _plan(q)
    assert plan.count("HashAggregate") >= 2


def test_merged_window_query_single_exchange(spark, sf_dir):
    # q12's three window columns (gap, seq, ffill) share one window
    # spec: Catalyst must plan exactly ONE shuffle on the entity key
    from terrorblade_spark.registry import get_queries

    plan = _plan(get_queries()["q12_event_window_columns"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") <= 1, plan[:2000]


def test_heatmap_quantiles_partial_agg(spark, sf_dir):
    # q17's quantile columns ride the same shuffle as count/countDistinct
    # — partial (map-side) aggregation must still be planned
    from terrorblade_spark.registry import get_queries

    plan = _plan(get_queries()["q17_activity_heatmap"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2


def test_random_cluster_no_global_sort_of_events(spark, sf_dir):
    # q62's seeded draw sorts POST-AGG session rows (TakeOrdered top-1),
    # never the raw events, and joins the 1-row pick back broadcast
    from terrorblade_spark.registry import get_queries

    plan = _plan(get_queries()["q62_random_cluster"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_corpus_shuffle_single_exchange(spark, sf_dir):
    from terrorblade_spark.operators.sampling import shuffle_corpus
    from terrorblade_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    plan = (
        shuffle_corpus(d, "doc_id", n_shards=64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # ONE shard-partitioned window -> exactly one hash exchange, and
    # never a single-partition (global row_number) exchange
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
    assert "Exchange SinglePartition" not in plan, plan[:2000]


def test_quantize_int8_no_exchange_no_udf(spark, sf_dir):
    from terrorblade_spark.operators.vector import quantize_int8
    from terrorblade_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    plan = quantize_int8(e)._jdf.queryExecution().executedPlan().toString()
    # row-local JVM folds: no shuffle, no Python crossing
    assert "Exchange" not in plan, plan[:2000]
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_temporal_and_funnel_plans_no_nested_loops(spark, sf_dir):
    """Every temporal/funnel/BM25 plan must stay equi-join shaped:
    a BroadcastNestedLoopJoin or CartesianProduct (other than the
    deliberate 1-row broadcast stats join) means a range predicate
    leaked into the join condition and the plan dies at scale."""
    from terrorblade_spark.operators.funnel import funnel_counts, retention_matrix
    from terrorblade_spark.operators.search import bm25_index, bm25_topk
    from terrorblade_spark.operators.temporal import resample_events
    from terrorblade_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    plans = {
        "funnel": funnel_counts(ev, ["view", "click", "purchase"])
        ._jdf.queryExecution().executedPlan().toString(),
        "retention": retention_matrix(ev)
        ._jdf.queryExecution().executedPlan().toString(),
        "resample": resample_events(ev)
        ._jdf.queryExecution().executedPlan().toString(),
    }
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, (name, plan[:1500])
        assert "BroadcastNestedLoopJoin" not in plan, (name, plan[:1500])

    docs = load_table(spark, sf_dir, "documents")
    idx = bm25_index(docs, "doc_id", persist=False)
    plan = bm25_topk(idx, "data model", k=5)._jdf.queryExecution().executedPlan().toString()
    # the single intended nested-loop: the 1-row corpus-stats broadcast
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan[:1500]
    assert "CartesianProduct" not in plan, plan[:1500]


def test_negative_samples_plan_build_runs_no_job(spark, sf_dir):
    """Building the negatives plan must not trigger a Spark job (the
    old pool derivation ran corpus.count() at plan-build time — a full
    metadata scan and a synchronous driver stall per call at 100 TB).
    The pool fraction now joins in as a 1-row broadcast scalar."""
    from terrorblade_spark.operators.sampling import negative_samples

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    anchors = docs.limit(10).select(F.col("doc_id").alias("anchor_id"))

    sc = spark.sparkContext
    sc.setJobGroup("neg-plan-build", "negatives plan construction")
    try:
        plan_df = negative_samples(docs, anchors, id_col="doc_id", k=3)
        # force full analysis + physical planning (not execution)
        plan_df._jdf.queryExecution().executedPlan()
        jobs = sc.statusTracker().getJobIdsForGroup("neg-plan-build")
    finally:
        sc.setJobGroup("", "")
    assert list(jobs) == [], f"plan build ran Spark jobs: {jobs}"

    # results unchanged under a fixed seed (determinism contract)
    a = {(r["anchor_id"], r["neg_id"], r["neg_rank"]) for r in plan_df.collect()}
    b = {
        (r["anchor_id"], r["neg_id"], r["neg_rank"])
        for r in negative_samples(docs, anchors, id_col="doc_id", k=3).collect()
    }
    assert a == b and len(a) == 30


def test_ivf_knn_join_plan_is_equi_join(spark, sf_dir):
    """The batch ANN join must stay hash-equi-join shaped on list_id —
    a nested loop or cartesian means the probe relation leaked into a
    non-equi condition and the plan dies at corpus scale."""
    from terrorblade_spark.operators.vector import ivf_build, ivf_knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.limit(4)
    assigned, cents = ivf_build(emb, n_lists=4, seed=7)
    plan = _plan(ivf_knn_join(queries, assigned, cents, k=3, nprobe=2))
    assert "CartesianProduct" not in plan, plan[:1500]
    # the single intended nested loop: queries x model-sized centroids
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan[:1500]


def test_asof_join_plan_has_no_join_at_all(spark, sf_dir):
    """asof_join is the union+window sort-merge: the physical plan must
    contain a Window and ZERO join operators — the naive `l.ts >= r.ts`
    theta formulation would appear as a BroadcastNestedLoopJoin."""
    from terrorblade_spark.queries.eventops import q72_asof_view_before_purchase

    plan = _plan(q72_asof_view_before_purchase(spark, sf_dir))
    assert "Window" in plan
    for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
               "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert op not in plan, (op, plan[:1500])


def test_range_join_plan_is_equi_join(spark, sf_dir):
    """range_join chunk-quantizes into an equi-join: hash/merge join
    keyed on (user_id, chunk), never a nested loop."""
    from terrorblade_spark.queries.eventops import q73_clicks_in_signup_window

    plan = _plan(q73_clicks_in_signup_window(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan[:1500]
    assert "CartesianProduct" not in plan, plan[:1500]
    assert any(op in plan for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")), plan[:1500]


def test_temperature_mix_plan_build_runs_no_job(spark, sf_dir):
    """temperature_mix's n_i / normalizer must stay lazy 1-row
    aggregates (no driver-side count() at plan-build time)."""
    from terrorblade_spark.operators.sampling import temperature_mix

    docs = load_table(spark, sf_dir, "documents")
    srcs = [docs.where(F.col("lang") == lg) for lg in ("en", "de")]
    sc = spark.sparkContext
    sc.setJobGroup("mix-plan-build", "temperature mix plan construction")
    try:
        plan_df = temperature_mix(srcs, "doc_id", total_rows=100, alpha=0.5)
        plan_df._jdf.queryExecution().executedPlan()
        jobs = sc.statusTracker().getJobIdsForGroup("mix-plan-build")
    finally:
        sc.setJobGroup("", "")
    assert list(jobs) == [], f"plan build ran Spark jobs: {jobs}"


def test_q85_query_plan_build_runs_no_job(spark, sf_dir):
    """The q85 WRAPPER (not just the operator) must build its plan
    without any driver-side job: the single-DataFrame temperature_mix_by
    derives source enumeration/counts/fractions inside the plan."""
    from terrorblade_spark.queries.llmdata import q85_temperature_mix

    sc = spark.sparkContext
    # baseline: every spark.read.parquet fires one parquet
    # footer/schema-inference metadata job, query or no query — the
    # gate is about DATA jobs (distinct/collect) beyond that
    sc.setJobGroup("q85-baseline", "bare table load")
    try:
        load_table(spark, sf_dir, "documents").schema
        baseline = len(sc.statusTracker().getJobIdsForGroup("q85-baseline"))
    finally:
        sc.setJobGroup("", "")
    sc.setJobGroup("q85-plan-build", "q85 wrapper plan construction")
    try:
        plan_df = q85_temperature_mix(spark, sf_dir)
        plan_df._jdf.queryExecution().executedPlan()
        jobs = sc.statusTracker().getJobIdsForGroup("q85-plan-build")
    finally:
        sc.setJobGroup("", "")
    assert len(jobs) <= baseline, (
        f"q85 plan build ran {len(jobs)} jobs vs {baseline} for a bare "
        f"table load — a data job leaked into plan build: {jobs}"
    )


def test_chunk_documents_plan_is_narrow(spark, sf_dir):
    """Chunking is a row-to-rows map: no Exchange anywhere — it must
    compose with the scan at any scale."""
    from terrorblade_spark.operators.packing import chunk_documents

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plan = _plan(chunk_documents(d, "doc_id", "text", max_tokens=32, overlap=8))
    assert "Exchange" not in plan, plan[:2000]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_conversation_pairs_single_exchange_no_udf(spark, sf_dir):
    """The SFT extraction is one windowed pass: a single hash
    partitioning on the group key, everything JVM-side."""
    from terrorblade_spark.operators.sft import conversation_pairs

    e = load_table(spark, sf_dir, "events")
    pairs = conversation_pairs(
        e, ["user_id"], ["ts", "event_id"], "event_type", "props", "event_id",
        context_size=3,
    )
    plan = _plan(pairs)
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ranking_metrics_joins_stay_k_bounded_broadcastable(spark, sf_dir):
    """ranking_metrics over two top-k relations must not invent a
    nested loop: the (query, item) joins are equi-joins."""
    from terrorblade_spark.operators.evalmetrics import ranking_metrics

    t = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id long, neighbor_id long, rank int"
    )
    plan = _plan(ranking_metrics(t, t, k=5))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_pivot_query_is_single_exchange(spark, sf_dir):
    """q98's wide reshape must stay ONE hash exchange (conditional
    aggregate) — DataFrame.pivot() would plan a second re-aggregate
    shuffle of the corpus."""
    from terrorblade_spark.registry import get_queries

    q = get_queries()["q98_event_type_pivot"](spark, sf_dir)
    plan = _plan(q)
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
    # the melt stays a narrow expand over that same single exchange
    q2 = get_queries()["q99_event_type_unpivot"](spark, sf_dir)
    plan2 = _plan(q2)
    assert plan2.count("Exchange hashpartitioning") == 1, plan2[:2000]


def test_preference_pairs_single_agg_no_window(spark, sf_dir):
    """DPO extraction is ONE hash aggregation (max_by/min_by extremes
    with map-side partials): a single group-key Exchange, partial
    aggregate present, and no Window/sort anywhere in the plan."""
    from terrorblade_spark.operators.sft import preference_pairs

    e = load_table(spark, sf_dir, "events")
    pairs = preference_pairs(
        e, ["user_id", "event_type"], "value", "event_id",
        payload_cols=["props"], margin=0.5,
    )
    plan = _plan(pairs)
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
    # struct ordering keys make this a SortAggregate (per-partition
    # sort on the group key), but the partial/final split must hold —
    # only per-group extremes may cross the shuffle — and no Window
    # may smuggle every candidate row through it.
    assert "Window" not in plan, plan[:2000]
    assert "partial_max_by" in plan and "partial_min_by" in plan, plan[:2000]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_repeat_to_balance_corpus_never_shuffles(spark, sf_dir):
    """The epoch plan (k rows) broadcast-joins onto the corpus; the
    only Exchanges live in the tiny count branch. No sort-merge join,
    and the repetition is a row-local Generate."""
    from terrorblade_spark.operators.sampling import repeat_to_balance

    d = load_table(spark, sf_dir, "documents")
    plan = _plan(repeat_to_balance(d, "lang"))
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]
    assert "Generate explode" in plan, plan[:2000]
    # the corpus is aggregated ONCE: main scan + counts scan, never a
    # third scan for the global max (it rides a k-row window instead)
    assert plan.count("Scan parquet") == 2, plan[:2000]


def test_distributed_rank_survives_boundary_resampling(spark):
    """repartitionByRange samples its boundaries with a FRESH random
    seed on every execution, so the rank's two passes (counts,
    numbering) must consume one MATERIALIZED partitioning — unpersisted,
    the offsets disagree with the numbering and ranks collide (measured:
    ~240k duplicates at 10M rows; invisible at gate scale because the
    sample covers the whole input there). This test forces aggressive
    subsampling (2 rows/partition) so any regression to per-pass
    re-evaluation collides at unit scale; the gate is the exact
    permutation invariant."""
    from pyspark.sql import functions as F

    from terrorblade_spark.operators.windows import distributed_rank

    key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    old = spark.conf.get(key)
    spark.conf.set(key, "2")
    try:
        n = 200_000
        df = spark.range(n).select(
            F.col("id"),
            F.expr("conv(substring(md5(cast(id as string)),1,15),16,10)")
            .cast("long")
            .alias("k"),
        )
        out = distributed_rank(df, ["k", "id"], out_col="rank", total_col="n_total")
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("rank").alias("nd"),
            F.min("rank").alias("mn"),
            F.max("rank").alias("mx"),
            F.min("n_total").alias("t"),
        ).collect()[0]
        assert (agg["n"], agg["nd"], agg["mn"], agg["mx"]) == (n, n, 0, n - 1), agg
        assert agg["t"] == n
        # and the partitioning is really a frozen materialization (a
        # checkpointed RDD scan), not a re-evaluated range exchange
        plan = _plan(out)
        assert "ExistingRDD" in plan or "LogicalRDD" in plan, plan[:2000]
        assert "rangepartitioning" not in plan, plan[:2000]
    finally:
        spark.conf.set(key, old)


def test_pagerank_superstep_reads_edges_from_cache_unshuffled(spark):
    """The pagerank scale claim, gated on the PRODUCTION helpers
    (operators/graph._prepare_links / _superstep_contrib): the edge
    relation shuffles ONCE (src-partitioned persist) and every
    superstep's contribution join must read it as an InMemoryTableScan
    with no Exchange above it — only the node-sized rank relation
    moves. Removing the repartition or the persist from _prepare_links
    fails this test."""
    from pyspark.sql import functions as F

    from terrorblade_spark.operators.graph import _prepare_links, _superstep_contrib

    e = spark.range(5000).select(
        (F.col("id") % 500).alias("__src"),
        ((F.col("id") * 7) % 500).alias("__dst"),
        F.lit(1.0).alias("__ew"),
    )
    k = int(spark.conf.get("spark.sql.shuffle.partitions"))
    links, _ = _prepare_links(e, k)
    try:
        links.count()
        ranks = spark.range(500).select(
            F.col("id").alias("node"), F.lit(1.0 / 500).alias("r")
        )
        contrib = _superstep_contrib(links, ranks, "node", "r")
        contrib.collect()
        plan = _plan(contrib)
        assert "InMemoryTableScan" in plan, plan
        # no Exchange between the cache scan and the join: the cached
        # side's lines from the join down to the scan contain none
        lines = plan.splitlines()
        scan_i = next(i for i, ln in enumerate(lines) if "InMemoryTableScan" in ln)
        join_i = max(i for i, ln in enumerate(lines) if "Join" in ln and i < scan_i)
        between = "\n".join(lines[join_i:scan_i])
        assert "Exchange" not in between, plan
    finally:
        links.unpersist()



def _assert_cached_side_unshuffled(plan: str) -> None:
    """The cached big side must feed its join as an InMemoryTableScan
    with no Exchange between them — only the node-sized side moves."""
    assert "InMemoryTableScan" in plan, plan
    lines = plan.splitlines()
    scan_i = next(i for i, ln in enumerate(lines) if "InMemoryTableScan" in ln)
    join_i = max(i for i, ln in enumerate(lines) if "Join" in ln and i < scan_i)
    between = "\n".join(lines[join_i:scan_i])
    assert "Exchange" not in between, plan


def test_kcore_decrement_round_reads_adjacency_cache_unshuffled(spark):
    """The delta-kcore scale claim, gated on the PRODUCTION helper
    (operators/graph._kcore_decrements): the symmetric adjacency
    shuffles ONCE (b-partitioned sorted persist) and every peel round's
    decrement join reads it from cache with no Exchange above the scan
    — only the node-sized peel set moves, and the count aggregate is
    map-side combined (partial_count below the exchange)."""
    from pyspark.sql import functions as F

    from terrorblade_spark.operators.graph import _kcore_decrements

    k = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = spark.range(4000).select(
        (F.col("id") % 400).alias("a"), ((F.col("id") * 7 + 1) % 400).alias("b")
    )
    sym = e.repartition(k, "b").sortWithinPartitions("b").persist()
    try:
        sym.count()
        peel = spark.range(40).select(F.col("id").alias("node"))
        dec = _kcore_decrements(sym, peel, "node")
        dec.collect()
        plan = _plan(dec)
        _assert_cached_side_unshuffled(plan)
        assert "partial_count" in plan, plan  # map-side combine
    finally:
        sym.unpersist()


def test_lpa_round_cache_unshuffled_and_windowless(spark):
    """label_propagation's per-round scale claim, gated on the
    PRODUCTION helper (operators/graph._lpa_round): the cached
    symmetric relation is read with no Exchange (only node-sized labels
    shuffle), BOTH aggregates are map-side combined (the per-round
    shuffle is bounded by distinct (node, label) pairs per partition,
    never edge-sized), and the argmax is an aggregate — no Window (a
    window would sort the pull relation every round)."""
    from pyspark.sql import functions as F

    from terrorblade_spark.operators.graph import _lpa_round

    k = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = spark.range(4000).select(
        (F.col("id") % 400).alias("a"),
        ((F.col("id") * 7 + 1) % 400).alias("b"),
        F.lit(1.0).alias("__w"),
    )
    sym = e.repartition(k, "b").sortWithinPartitions("b").persist()
    try:
        sym.count()
        labels = spark.range(400).select(
            F.col("id").alias("node"), F.col("id").alias("community")
        )
        nxt = _lpa_round(sym, labels, "node", "community")
        nxt.collect()
        plan = _plan(nxt)
        _assert_cached_side_unshuffled(plan)
        assert "Window" not in plan, plan
        assert "partial_sum" in plan, plan  # map-side combined pulls
    finally:
        sym.unpersist()


def test_association_rules_pairs_are_fused_row_local(spark, sf_dir):
    """q116's pair counts come from the in-row HOF expansion (Generate
    over the basket array) — never a basket-key self-join. The only
    nested-loop join allowed anywhere is the 1-row broadcast total."""
    from terrorblade_spark.registry import get_queries

    q = get_queries()["q116_brand_copurchase_rules"](spark, sf_dir)
    plan = _plan(q)
    assert "Generate explode" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # basket relation aggregated ONCE into arrays: exactly one
    # collect_set/sort_array aggregate pair feeding the expansion
    assert plan.count("collect_set") <= 2, plan  # partial+final agg of one op


def test_tfidf_plan_jvm_only_with_broadcast_scalar(spark, sf_dir):
    """q117: whole pipeline JVM-side (no Python eval), the doc-count
    scalar joins via broadcast, and the corpus is tokenized exactly
    ONCE — the three postings consumers (scores, df, N) read the
    checkpointed relation, so the final plan contains NO explode at
    all (re-tokenization would reappear as Generate nodes)."""
    from terrorblade_spark.registry import get_queries

    q = get_queries()["q117_tfidf_keywords"](spark, sf_dir)
    plan = _plan(q)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row n_docs scalar
    assert "CartesianProduct" not in plan
    assert "Generate explode" not in plan, plan
    assert "ExistingRDD" in plan  # the checkpointed postings


def test_ewma_single_window_shuffle(spark, sf_dir):
    """q118: one Exchange for the partition-key window (plus the
    display sort's range exchange), ONE window, zero aggregates and
    zero Python — the weighted fold is row-local array HOFs."""
    from terrorblade_spark.registry import get_queries

    plan = _plan(get_queries()["q118_event_ewma"](spark, sf_dir))
    assert plan.count("Window") == 1, plan
    assert plan.count("Exchange") <= 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pearson_map_side_combined(spark, sf_dir):
    """q123: the five decimal moments ship as ONE partial+final
    aggregate pair (map-side combine) — never a moment per pass."""
    from terrorblade_spark.registry import get_queries

    plan = _plan(get_queries()["q123_value_k_correlation"](spark, sf_dir))
    assert plan.count("HashAggregate") == 2, plan
    assert plan.count("Exchange") <= 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
