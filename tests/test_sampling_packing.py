"""Deterministic sampling / corpus mixing / sequence packing tests.

The stratified sample is additionally checked against a DuckDB twin to
prove the seeded-hash draw is engine-portable (same recipe as the
registered queries' oracles).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from terrorblade_spark.operators.packing import pack_sequences
from terrorblade_spark.operators.sampling import (
    stratified_quota_sample,
    train_eval_split,
    weighted_corpus_mix,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from terrorblade_spark.tables import load_table

    return load_table(spark, sf_dir, "documents")


def test_stratified_quota_exact_and_deterministic(spark, docs, sf_dir):
    got = stratified_quota_sample(docs, ["lang"], quota=7, id_col="doc_id", seed="s1")
    per = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    sizes = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per == {lang: min(7, n) for lang, n in sizes.items()}
    # rerun -> identical ids (no rand(): the sample is a pure function of seed+id)
    a = sorted(r["doc_id"] for r in got.select("doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_quota_sample(docs, ["lang"], 7, "doc_id", seed="s1")
        .select("doc_id")
        .collect()
    )
    assert a == b
    # different seed -> (almost surely) different sample
    c = sorted(
        r["doc_id"]
        for r in stratified_quota_sample(docs, ["lang"], 7, "doc_id", seed="s2")
        .select("doc_id")
        .collect()
    )
    assert a != c


def test_stratified_quota_matches_duckdb_twin(spark, docs, sf_dir):
    got = sorted(
        r["doc_id"]
        for r in stratified_quota_sample(docs, ["lang"], 5, "doc_id", seed="s1")
        .select("doc_id")
        .collect()
    )
    con = duckdb.connect()
    want = sorted(
        r[0]
        for r in con.execute(
            f"""
            SELECT doc_id FROM (
              SELECT doc_id, row_number() OVER (
                PARTITION BY lang
                ORDER BY ('0x' || substring(md5('s1' || doc_id::VARCHAR), 1, 15))::BIGINT, doc_id
              ) AS rn
              FROM '{sf_dir}/documents.parquet'
            ) WHERE rn <= 5
            """
        ).fetchall()
    )
    assert got == want


def test_weighted_mix_rates_and_no_shuffle(spark, docs):
    mixed = weighted_corpus_mix([(docs, 1.0), (docs, 0.25)], "doc_id", seed="m1")
    n = docs.count()
    counts = {
        r["mix_source"]: r["n"]
        for r in mixed.groupBy("mix_source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts[0] == n                       # keep-all source
    assert 0.15 * n < counts[1] < 0.35 * n      # ~25% of the second
    # mixing must not shuffle: no Exchange in the plan
    plan = mixed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # deterministic across reruns
    again = weighted_corpus_mix([(docs, 1.0), (docs, 0.25)], "doc_id", seed="m1")
    assert mixed.count() == again.count()


def test_train_eval_split_deterministic_and_leak_proof(spark, docs):
    s1 = train_eval_split(docs, "doc_id", 0.2, seed="sp1")
    frac = s1.where(F.col("split") == "eval").count() / docs.count()
    assert 0.1 < frac < 0.3
    # repartitioning cannot move a doc across the split
    s2 = train_eval_split(docs.repartition(7), "doc_id", 0.2, seed="sp1")
    a = {r["doc_id"]: r["split"] for r in s1.select("doc_id", "split").collect()}
    b = {r["doc_id"]: r["split"] for r in s2.select("doc_id", "split").collect()}
    assert a == b


def test_pack_sequences_respects_budget(spark, docs):
    from terrorblade_spark.functions.exprs import tokens

    d = docs.select("doc_id", F.size(tokens("text")).alias("n_tokens"))
    packed = pack_sequences(d, "doc_id", "n_tokens", budget=256, num_shards=8, seed="p1")
    # every doc assigned exactly once
    assert packed.count() == d.count()
    # no bin exceeds the budget except single oversized docs
    bins = (
        packed.groupBy("shard", "bin")
        .agg(F.sum("bin_tokens").alias("tot"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for r in bins:
        assert r["tot"] <= 256 or r["n"] == 1, (r["shard"], r["bin"], r["tot"], r["n"])
    # deterministic across reruns
    a = sorted(map(tuple, packed.select("doc_id", "shard", "bin").collect()))
    b = sorted(
        map(
            tuple,
            pack_sequences(d, "doc_id", "n_tokens", 256, 8, "p1")
            .select("doc_id", "shard", "bin")
            .collect(),
        )
    )
    assert a == b


def test_pack_sequences_oversized_doc_gets_own_bin(spark):
    rows = [(1, 10), (2, 9999), (3, 10)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = pack_sequences(df, "doc_id", "n_tokens", budget=100, num_shards=1, seed="p1")
    got = {r["doc_id"]: (r["bin"], r["bin_tokens"]) for r in packed.collect()}
    # the oversized doc is alone in its bin with capped accounting
    oversized_bin = got[2][0]
    assert got[2][1] == 100
    assert [d for d, (b, _) in got.items() if b == oversized_bin] == [2]


def test_chunk_documents_covers_every_token(spark):
    from terrorblade_spark.operators.packing import chunk_documents

    text_a = " ".join(f"w{i}" for i in range(1000))
    df = spark.createDataFrame(
        [(1, text_a), (2, "a b c"), (3, "")], "doc_id long, text string"
    )
    got = chunk_documents(df, max_tokens=128, overlap=16).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts every 112 tokens; ceil((1000-16)/112) = 9 chunks
    a = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert len(a) == 9
    assert [r["chunk_idx"] for r in a] == list(range(9))
    # every chunk except the last is full; reconstruction covers all tokens
    seen = set()
    for r in a:
        toks = r["chunk_text"].split(" ")
        assert len(toks) == r["chunk_tokens"] <= 128
        seen.update(toks)
    assert seen == {f"w{i}" for i in range(1000)}
    # overlap: chunk k starts at 112*k, so chunk0[-16:] == chunk1[:16]
    assert a[0]["chunk_text"].split(" ")[112:] == a[1]["chunk_text"].split(" ")[:16]
    # short doc -> one whole chunk; empty doc -> no rows
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "a b c"
    assert 3 not in by_doc


def test_chunk_documents_is_narrow(spark, docs):
    from terrorblade_spark.operators.packing import chunk_documents

    plan = (
        chunk_documents(docs.select("doc_id", "text"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_shuffle_corpus_deterministic_and_balanced(spark):
    from terrorblade_spark.operators.sampling import shuffle_corpus

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = shuffle_corpus(df, "doc_id", seed="s1", n_shards=16)
    b = shuffle_corpus(df.repartition(7), "doc_id", seed="s1", n_shards=16)
    rows_a = {r["doc_id"]: (r["shard"], r["pos"]) for r in a.collect()}
    rows_b = {r["doc_id"]: (r["shard"], r["pos"]) for r in b.collect()}
    # pure function of (seed, key): partitioning must not matter
    assert rows_a == rows_b
    # (shard, pos) is a dense coordinate: positions are 0..n_i-1 per shard
    from collections import defaultdict

    by_shard = defaultdict(list)
    for shard, pos in rows_a.values():
        by_shard[shard].append(pos)
    assert set(by_shard) == set(range(16))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))
    # roughly balanced shards (2000/16 = 125 expected)
    sizes = [len(v) for v in by_shard.values()]
    assert min(sizes) > 60 and max(sizes) < 190

    # a different seed is a genuinely different permutation
    c = shuffle_corpus(df, "doc_id", seed="s2", n_shards=16)
    rows_c = {r["doc_id"]: (r["shard"], r["pos"]) for r in c.collect()}
    assert rows_c != rows_a


def test_quantize_int8_roundtrip_and_edge_cases(spark):
    from terrorblade_spark.operators.vector import quantize_int8
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (0, [1.0, -2.0, 0.5]),
            (1, [0.0, 0.0, 0.0]),          # all-zero -> scale 0, qvec zeros
            (2, [127.0, -127.0, 63.5]),
        ],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    assert rows[1]["scale"] == 0.0 and rows[1]["qvec"] == [0, 0, 0]
    # max|v| maps to ±127 exactly
    assert rows[0]["qvec"][1] == -127
    assert rows[2]["qvec"][:2] == [127, -127]
    assert all(-127 <= q <= 127 for r in rows.values() for q in r["qvec"])
    # dequantization error bounded by scale/2 per element
    for r in rows.values():
        v = [1.0, -2.0, 0.5] if r["vec_id"] == 0 else None
        if v is None:
            continue
        deq = [q * r["scale"] for q in r["qvec"]]
        assert all(abs(x - y) <= r["scale"] / 2 + 1e-12 for x, y in zip(v, deq))


def test_materialize_packed_orders_and_bounds(spark):
    from terrorblade_spark.operators.packing import (
        materialize_packed,
        pack_sequences,
        packing_stats,
    )

    docs = spark.createDataFrame(
        [(i, f"doc{i} " * 5, 10) for i in range(40)],
        "doc_id long, text string, n_tokens long",
    )
    packed = pack_sequences(docs, "doc_id", "n_tokens", budget=25, num_shards=4)
    seqs = materialize_packed(packed, "doc_id", "text").collect()
    assert seqs
    for r in seqs:
        assert r["n_tokens"] <= 25
        assert len(r["member_ids"]) == r["n_docs"]
        # the concat contains exactly the members' texts
        for mid in r["member_ids"]:
            assert f"doc{mid} " in r["text"]
    # all docs appear exactly once across all sequences
    all_ids = sorted(int(m) for r in seqs for m in r["member_ids"])
    assert all_ids == list(range(40))

    stats = packing_stats(packed, budget=25).first()
    assert stats["total_tokens"] == 400
    assert 0.0 <= stats["waste_frac"] < 1.0
    import math

    assert math.isclose(stats["mean_fill"], 1.0 - stats["waste_frac"], rel_tol=1e-12)


def test_negative_samples_contract(spark):
    from terrorblade_spark.operators.sampling import negative_samples

    corpus = spark.range(0, 5_000).select(F.col("id").alias("doc_id"))
    anchors = spark.createDataFrame([(1,), (2,), (3,)], "anchor_id long")
    positives = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20)], "anchor_id long, doc_id long"
    )
    out = negative_samples(corpus, anchors, positives=positives, k=5).collect()
    by_anchor = {}
    for r in out:
        by_anchor.setdefault(r["anchor_id"], []).append(r["neg_id"])
    assert set(by_anchor) == {1, 2, 3}
    for a, negs in by_anchor.items():
        assert len(negs) == 5
        assert a not in negs  # never self
    assert 10 not in by_anchor[1] and 11 not in by_anchor[1]
    assert 20 not in by_anchor[2]
    # anchors draw DIFFERENT orders from the shared pool
    assert by_anchor[1] != by_anchor[2]

    # deterministic across runs
    again = negative_samples(corpus, anchors, positives=positives, k=5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))

    # a different seed changes the draw
    other = negative_samples(corpus, anchors, positives=positives, k=5, seed="neg-v2").collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, other))


def test_hard_negatives_are_nearest_non_positives(spark):
    from terrorblade_spark.operators.sampling import hard_negatives

    # corpus on a line: vec_id i at [i, 1]; anchor 0 at [0, 1]
    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(1, 30)], "vec_id long, embedding array<double>"
    )
    anchors = spark.createDataFrame(
        [(0, [0.0, 1.0])], "anchor_id long, embedding array<double>"
    ).select(F.col("anchor_id"), F.col("embedding"))
    anchors = anchors.withColumnRenamed("anchor_id", "vec_id").select(
        F.col("vec_id").alias("anchor_id"), "embedding"
    )
    positives = spark.createDataFrame([(0, 1)], "anchor_id long, vec_id long")
    out = hard_negatives(
        anchors.select(F.col("anchor_id"), "embedding"),
        corpus,
        k=3,
        positives=positives,
        anchor_col="anchor_id",
    ).collect()
    # nearest by cosine to [0,1] among ids 1..29 is ascending id order;
    # id 1 is a positive, so the hard negatives are 2, 3, 4
    assert [r["neg_id"] for r in out] == [2, 3, 4]
    sims = [r["cosine_sim"] for r in out]
    assert sims == sorted(sims, reverse=True)


def test_weighted_sample_matches_reference_implementation(spark):
    """The Spark plan must reproduce Efraimidis-Spirakis exactly: same
    md5 draws, same u^(1/w) keys, same top-k — computed independently
    in Python."""
    import hashlib

    from terrorblade_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    rows = [(i, float(1 + i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, weight double")
    got = sorted(
        r["doc_id"]
        for r in weighted_sample_without_replacement(df, k=20, weight_col="weight").collect()
    )

    def u(doc_id):
        h = hashlib.md5(f"wsr-v1{doc_id}".encode()).hexdigest()
        return int(h[:15], 16) / float(1 << 60)

    import math

    keyed = sorted(
        ((math.exp(math.log(u(i)) / w), i) for i, w in rows),
        key=lambda t: (-t[0], t[1]),
    )
    want = sorted(i for _, i in keyed[:20])
    assert got == want


def test_weighted_sample_is_weight_proportional(spark):
    """Statistical sanity: across many disjoint strata, heavy items
    appear far more often than light ones."""
    from terrorblade_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    # 300 strata x 10 items; item 0 has weight 50, others 1
    df = spark.range(0, 3_000).select(
        (F.col("id") / 10).cast("long").alias("stratum"),
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 == 0, 50.0).otherwise(1.0).alias("weight"),
    )
    out = weighted_sample_without_replacement(
        df, k=1, weight_col="weight", strata_cols=["stratum"]
    )
    heavy = out.where(F.col("doc_id") % 10 == 0).count()
    # P(heavy wins its stratum) = 50/59 ~ 0.85; expect ~255/300
    assert heavy > 200


def test_hard_negatives_ivf_mode_matches_brute_at_full_probe(spark):
    """hard_negatives(ivf_index=...) at nprobe=all lists must equal the
    brute-force mode — the IVF switch changes cost, not contract."""
    import random

    from terrorblade_spark.operators.sampling import hard_negatives
    from terrorblade_spark.operators.vector import ivf_build

    rnd = random.Random(11)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    anchors = spark.createDataFrame(rows[:6], "anchor_id long, embedding array<double>")
    positives = spark.createDataFrame(
        [(0, 1), (1, 2)], "anchor_id long, vec_id long"
    )

    brute = {
        (r["anchor_id"], r["neg_rank"]): r["neg_id"]
        for r in hard_negatives(anchors, corpus, k=3, positives=positives).collect()
    }
    assigned, cents = ivf_build(corpus, n_lists=3, seed=5)
    ivf = {
        (r["anchor_id"], r["neg_rank"]): r["neg_id"]
        for r in hard_negatives(
            anchors, corpus, k=3, positives=positives,
            ivf_index=(assigned, cents), nprobe=3,
        ).collect()
    }
    assert ivf == brute


def test_wsr_small_weights_remain_weight_proportional(spark):
    """Review repro: exp-key underflow at w=0.001 id-biased the sample;
    the log-key order must keep heavy rows overwhelmingly more likely."""
    from terrorblade_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    rows = [(i, 0.001) for i in range(200)] + [(1000 + i, 10.0) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, weight double")
    got = {r["doc_id"] for r in
           weighted_sample_without_replacement(df, k=20, weight_col="weight").collect()}
    heavy = sum(1 for d in got if d >= 1000)
    # weights differ 10000x: essentially every pick must be heavy
    assert heavy >= 18, heavy


# --- temperature mix ----------------------------------------------------------


def test_temperature_mix_flattens_toward_small_sources(spark):
    from terrorblade_spark.operators.sampling import temperature_mix

    big = spark.range(10_000).select(F.col("id").alias("doc_id"))
    small = spark.range(500).select((F.col("id") + 1_000_000).alias("doc_id"))

    # alpha=1: proportional to size -> small source's share ~ its size share
    prop = temperature_mix([big, small], "doc_id", total_rows=2_000, alpha=1.0)
    prop_counts = {r.mix_source: r.n for r in prop.groupBy("mix_source").agg(F.count("*").alias("n")).collect()}
    # alpha=0.3: strongly flattened -> small source's share rises sharply
    flat = temperature_mix([big, small], "doc_id", total_rows=2_000, alpha=0.3)
    flat_counts = {r.mix_source: r.n for r in flat.groupBy("mix_source").agg(F.count("*").alias("n")).collect()}

    prop_small_share = prop_counts.get(1, 0) / (prop_counts[0] + prop_counts.get(1, 0))
    flat_small_share = flat_counts.get(1, 0) / (flat_counts[0] + flat_counts.get(1, 0))
    assert flat_small_share > 2 * prop_small_share
    # totals land near the target (Bernoulli expectation, +-20%)
    for counts in (prop_counts, flat_counts):
        total = sum(counts.values())
        assert 1_600 <= total <= 2_400


def test_temperature_mix_deterministic_and_clamped(spark):
    from terrorblade_spark.operators.sampling import temperature_mix

    a = spark.range(100).select(F.col("id").alias("doc_id"))
    b = spark.range(50).select((F.col("id") + 1_000).alias("doc_id"))
    m1 = sorted(r.doc_id for r in temperature_mix([a, b], "doc_id", 5_000, alpha=0.5).collect())
    m2 = sorted(r.doc_id for r in temperature_mix([a, b], "doc_id", 5_000, alpha=0.5).collect())
    assert m1 == m2
    # target far above availability -> fractions clamp at 1, everything kept
    assert len(m1) == 150


def test_temperature_mix_by_equals_list_form(spark):
    """The single-DataFrame overload is row-identical to the list form
    with sources enumerated in sorted value order; NULL source rows
    are excluded (the list form can't express them either)."""
    from terrorblade_spark.operators.sampling import (
        temperature_mix,
        temperature_mix_by,
    )

    df = spark.range(3_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 7 == 0, F.lit(None).cast("string"))
        .when(F.col("id") % 3 == 0, F.lit("de"))
        .when(F.col("id") % 3 == 1, F.lit("en"))
        .otherwise(F.lit("fr"))
        .alias("lang"),
    )
    langs = ["de", "en", "fr"]
    sources = [df.where(F.col("lang") == lg) for lg in langs]
    want = sorted(
        (r.doc_id, r.mix_source)
        for r in temperature_mix(
            sources, "doc_id", total_rows=800, alpha=0.5, round_fracs=6
        ).collect()
    )
    got = sorted(
        (r.doc_id, r.mix_source)
        for r in temperature_mix_by(
            df, "lang", "doc_id", total_rows=800, alpha=0.5, round_fracs=6
        ).collect()
    )
    assert got == want and len(got) > 0


def test_temperature_mix_rejects_bad_args(spark):
    from terrorblade_spark.operators.sampling import temperature_mix

    with pytest.raises(ValueError):
        temperature_mix([], "doc_id", 10)
    a = spark.range(10).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        temperature_mix([a], "doc_id", 10, alpha=-1)


# --- leakage-safe split -------------------------------------------------------


def test_leakage_safe_split_keeps_components_together(spark):
    from terrorblade_spark.operators.sampling import leakage_safe_split

    docs = spark.range(100).select(F.col("id").alias("doc_id"))
    # components: {0,1,2}, {10,11}, rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a long, id_b long"
    )
    out = leakage_safe_split(docs, "doc_id", pairs, eval_fraction=0.3, seed="t")
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 100
    # all members of a component share root AND side
    for grp in ([0, 1, 2], [10, 11]):
        roots = {rows[i].group_root for i in grp}
        sides = {rows[i].split for i in grp}
        assert roots == {min(grp)} and len(sides) == 1
    # singleton roots at own id
    assert rows[50].group_root == 50
    # deterministic
    again = {r.doc_id: r.split for r in
             leakage_safe_split(docs, "doc_id", pairs, 0.3, seed="t").collect()}
    assert again == {k: v.split for k, v in rows.items()}
    # both sides populated at this fraction
    sides = {v.split for v in rows.values()}
    assert sides == {"train", "eval"}


def test_leakage_safe_split_refuses_string_ids_and_tolerates_component_col(spark):
    from terrorblade_spark.operators.sampling import leakage_safe_split

    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    strs = spark.createDataFrame([("a",), ("b",)], "doc_id string")
    with pytest.raises(ValueError):
        leakage_safe_split(strs, "doc_id", pairs, 0.5)
    # an input already carrying 'component' (dedup-stage output) works
    docs = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit(99).alias("component")
    )
    out = leakage_safe_split(docs, "doc_id", pairs, 0.5, seed="t").collect()
    assert len(out) == 10
    assert {r.group_root for r in out if r.doc_id in (0, 1)} == {0}


# --- repeat_to_balance (epoch-repetition upsampling) -------------------------


def test_repeat_to_balance_epochs_and_cap(spark):
    from terrorblade_spark.operators.sampling import repeat_to_balance

    rows = [("big", i) for i in range(10)] + [("mid", 100), ("mid", 101),
                                              ("mid", 102), ("tiny", 200)]
    df = spark.createDataFrame(rows, "grp string, id long")
    out = repeat_to_balance(df, "grp", max_epochs=4).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r.grp, []).append(r)
    # big: 10 rows, 1 epoch; mid: ceil(10/3)=4 epochs; tiny: capped at 4
    assert len(by_grp["big"]) == 10
    assert all(r.n_epochs == 1 for r in by_grp["big"])
    assert len(by_grp["mid"]) == 3 * 4
    assert len(by_grp["tiny"]) == 4
    # 1-based contiguous epoch counter per row
    assert sorted(r.epoch for r in by_grp["tiny"]) == [1, 2, 3, 4]


def test_repeat_to_balance_rejects_bad_cap(spark):
    from terrorblade_spark.operators.sampling import repeat_to_balance

    df = spark.createDataFrame([("a", 1)], "grp string, id long")
    with pytest.raises(ValueError):
        repeat_to_balance(df, "grp", max_epochs=0)


def test_repeat_to_balance_null_group_is_balanced_not_dropped(spark):
    from terrorblade_spark.operators.sampling import repeat_to_balance

    rows = [("a", i) for i in range(4)] + [(None, 100)]
    df = spark.createDataFrame(rows, "grp string, id long")
    out = repeat_to_balance(df, "grp", max_epochs=4).collect()
    nulls = [r for r in out if r.grp is None]
    # the untagged row is a group of one: ceil(4/1)=4 epochs, kept
    assert len(nulls) == 4 and all(r.n_epochs == 4 for r in nulls)
    assert len([r for r in out if r.grp == "a"]) == 4


# --- distributed_rank / curriculum_order -------------------------------------


def test_distributed_rank_matches_single_partition_renumber(spark):
    from terrorblade_spark.operators.windows import (
        distributed_rank,
        global_renumber,
    )

    df = spark.createDataFrame(
        [(i, (i * 37) % 11) for i in range(200)], "id long, score long"
    )
    for n_parts in (1, 4, 9):
        got = {
            r.id: r.rank
            for r in distributed_rank(
                df.repartition(n_parts), ["score", "id"], num_partitions=5
            ).collect()
        }
        want = {
            r.id: r.group_number
            for r in global_renumber(df, ["score", "id"]).collect()
        }
        assert got == want


def test_distributed_rank_total_col(spark):
    from terrorblade_spark.operators.windows import distributed_rank

    df = spark.createDataFrame([(i,) for i in range(57)], "id long")
    out = distributed_rank(df, ["id"], total_col="__N", num_partitions=4)
    rows = out.collect()
    assert all(r["__N"] == 57 for r in rows)
    assert sorted(r["rank"] for r in rows) == list(range(57))


def test_distributed_prefix_sum_matches_single_partition_cumsum(spark):
    from terrorblade_spark.operators.windows import distributed_prefix_sum

    rows = [(i, (i * 37) % 11, ((i * 13) % 7) - 3) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, score long, v long")
    # single-partition ground truth
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    run, want = 0, {}
    for rid, _, v in order:
        run += v
        want[rid] = run
    for n_parts in (1, 4, 9):
        got = {
            r.id: r.running_total
            for r in distributed_prefix_sum(
                df.repartition(n_parts), "v", ["score", "id"], num_partitions=5
            ).collect()
        }
        assert got == want


def test_distributed_prefix_sum_survives_boundary_resampling(spark):
    """Same bug class as distributed_rank: the offsets pass and the
    within-partition cumsum pass must see ONE frozen range
    partitioning. Forced boundary subsampling makes any regression to
    per-pass re-evaluation break the exact final-total invariant."""
    from pyspark.sql import functions as F

    from terrorblade_spark.operators.windows import distributed_prefix_sum

    key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    old = spark.conf.get(key)
    spark.conf.set(key, "2")
    try:
        n = 100_000
        df = spark.range(n).select(
            F.col("id"),
            F.expr("conv(substring(md5(cast(id as string)),1,15),16,10)")
            .cast("long")
            .alias("k"),
            F.lit(1).alias("v"),
        )
        out = distributed_prefix_sum(df, "v", ["k", "id"])
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("running_total").alias("nd"),
            F.min("running_total").alias("mn"),
            F.max("running_total").alias("mx"),
        ).collect()[0]
        assert (agg["n"], agg["nd"], agg["mn"], agg["mx"]) == (n, n, 1, n), agg
    finally:
        spark.conf.set(key, old)


def test_curriculum_buckets_equal_population_and_monotone(spark):
    from terrorblade_spark.operators.sampling import curriculum_order

    df = spark.createDataFrame(
        [(i, float((i * 13) % 101)) for i in range(120)], "id long, score double"
    )
    out = curriculum_order(df, "id", "score", n_buckets=4).collect()
    by_bucket: dict[int, list[float]] = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r.score)
    assert {len(v) for v in by_bucket.values()} == {30}  # equal population
    # difficulty is monotone across buckets: max(b) <= min(b+1)
    for b in range(3):
        assert max(by_bucket[b]) <= min(by_bucket[b + 1])


def test_curriculum_rejects_bad_buckets(spark):
    from terrorblade_spark.operators.sampling import curriculum_order

    df = spark.createDataFrame([(1, 1.0)], "id long, score double")
    with pytest.raises(ValueError):
        curriculum_order(df, "id", "score", n_buckets=0)
