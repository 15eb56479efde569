"""CorpusPipeline facade: the full curate -> dedup -> pack flow over
the documents table, plus the quality-canonical variant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from terrorblade_spark.corpus import CorpusPipeline
from terrorblade_spark.tables import load_table


@pytest.fixture(scope="module")
def pipe(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # simulated re-crawl so dedup has real work
    recrawl = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    return CorpusPipeline(spark, docs.unionByName(recrawl))


def test_full_flow_and_report(spark, pipe):
    curated = pipe.curate(lm_buckets=3)
    assert {"keep", "mean_nll", "ppl_bucket"} <= set(curated.columns)

    deduped = pipe.dedup(curated.where("keep"))
    packed = pipe.chunk_and_pack(deduped)
    report = pipe.report(curated, deduped, packed).first()

    assert report["n_input"] == pipe.docs.count()
    assert report["n_kept"] + report["n_rejected"] == report["n_input"]
    # every doc has a byte-identical twin -> at least half are duplicates
    assert report["dup_frac"] >= 0.5
    assert report["n_packed_bins"] > 0
    assert report["n_canonical"] > 0


def test_quality_canonical_prefers_high_score(spark, pipe):
    curated = pipe.curate(lm_buckets=0).where("keep")
    # quality = doc_id (so the RE-CRAWL copy, +1e6, must win each pair)
    scored = curated.withColumn("quality", F.col("doc_id").cast("double"))
    deduped = pipe.dedup(scored, quality_col="quality")
    canon = deduped.where(~F.col("is_duplicate"))
    # all surviving canonicals of exact twins come from the re-crawl
    twin_canon = canon.where(F.col("doc_id") >= 1_000_000).count()
    base_canon = canon.where(F.col("doc_id") < 1_000_000).count()
    assert twin_canon > 0
    assert base_canon < twin_canon


def test_materialized_sequences(spark, pipe):
    deduped = pipe.dedup()
    seqs = pipe.chunk_and_pack(deduped, materialize=True, budget=512, max_tokens=128)
    row = seqs.first()
    assert row["n_tokens"] <= 512
    assert row["text"]


def test_curate_with_boilerplate_removal(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.concat(F.col("text"), F.lit("\nSUBSCRIBE TO OUR NEWSLETTER")).alias("text")
    )
    pipe = CorpusPipeline(spark, docs)
    out = pipe.curate(boilerplate_line_df=0.1)
    # the injected banner (df = 100%) is stripped before quality rules
    assert out.where(F.col("text").contains("SUBSCRIBE")).count() == 0
    assert out.where("n_removed_lines >= 1").count() == docs.count()


def test_curate_with_learned_quality_gate(spark):
    """The two-stage recipe: Gopher heuristics + the learned model; a
    junk doc passing the heuristics is caught by the model with its own
    rejection reason."""
    from terrorblade_spark.corpus import CorpusPipeline
    from terrorblade_spark.operators.classifier import train_quality_classifier

    good = [
        "the quick brown fox jumps over the lazy dog near the river bank today",
        "a clear and well formed sentence with ordinary words and a good structure",
        "researchers published a detailed study about language and human learning",
    ]
    junk = [
        "buy now cheap prize winner click here free money offer deal sale now",
        "click click here buy cheap free prize money now deal winner offer sale",
        "free money prize deal cheap buy click now winner offer sale here today",
    ]
    labeled = spark.createDataFrame(
        [(i, t, 1.0) for i, t in enumerate(good * 4)]
        + [(100 + i, t, 0.0) for i, t in enumerate(junk * 4)],
        "doc_id long, text string, label double",
    )
    model = train_quality_classifier(labeled, n_features=1 << 12, max_iter=30)

    docs = spark.createDataFrame(
        [(1, good[0]), (2, junk[0])], "doc_id long, text string"
    )
    pipe = CorpusPipeline(spark, docs)
    out = pipe.curate(
        redact=False, quality_model=model,
        # both docs are well-formed enough to pass the word-count rules
        min_words=5, max_words=10_000,
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["keep"] and "quality_model" not in got[1]["quality_reasons"]
    assert not got[2]["keep"] and "quality_model" in got[2]["quality_reasons"]
    assert got[2]["quality_score"] < 0.5 < got[1]["quality_score"]


def test_cut_repeats_stage_removes_shared_boilerplate(spark):
    from terrorblade_spark.corpus import CorpusPipeline

    boiler = "all rights reserved by the publisher and its assigns"
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta gamma delta epsilon zeta eta theta iota {boiler}"),
            (2, f"{boiler} one two three four five six seven eight nine"),
            (3, "red orange yellow green blue indigo violet pink brown"),
        ],
        "doc_id long, text string",
    )
    pipe = CorpusPipeline(spark, docs)
    out = pipe.cut_repeats(docs, window=9, min_repeats=2)
    got = {r["doc_id"]: (r["text"], r["repeated_frac"]) for r in out.collect()}
    assert "rights" not in got[1][0] and "rights" not in got[2][0]
    assert got[3][0].startswith("red orange") and got[3][1] is None
    assert got[1][1] is not None and got[1][1] > 0.4


def test_dedup_semantic_stage(spark):
    import math

    def rot(theta, i, j, dims=4):
        v = [0.0] * dims
        v[i], v[j] = math.cos(theta), math.sin(theta)
        return v

    docs = spark.createDataFrame(
        [(1, "alpha doc"), (2, "alpha doc reworded"), (3, "other topic"),
         (4, "third topic"), (5, "no vector doc")],
        "doc_id long, text string",
    )
    vecs = spark.createDataFrame(
        [(1, rot(0.0, 0, 1)), (2, rot(0.05, 0, 1)),  # semantic twins
         (3, rot(0.0, 1, 2)), (4, rot(0.0, 2, 3))],  # distinct; 5 has none
        "doc_id long, embedding array<double>",
    )
    pipe = CorpusPipeline(spark, docs)
    out = {r.doc_id: r for r in pipe.dedup_semantic(None, vecs, n_clusters=3).collect()}
    assert len(out) == 5
    assert out[1].canonical_id == out[2].canonical_id
    assert sum(out[d].is_duplicate for d in (1, 2)) == 1
    for d in (3, 4, 5):
        assert not out[d].is_duplicate and out[d].canonical_id == d
    # downstream contract: chunk_and_pack accepts the flags
    packed = pipe.chunk_and_pack(
        spark.createDataFrame(
            [(r.doc_id, "w " * 10, r.is_duplicate) for r in out.values()],
            "doc_id long, text string, is_duplicate boolean",
        ),
        budget=64,
    )
    assert packed.count() > 0


def test_select_target_stage_skews_to_target(spark):
    a = [(i, "alpha beta gamma delta " * 8) for i in range(30)]
    b = [(100 + i, "omega sigma theta kappa " * 8) for i in range(30)]
    docs = spark.createDataFrame(a + b, "doc_id long, text string")
    target = spark.createDataFrame(
        [(1000 + i, "alpha beta gamma delta " * 8) for i in range(10)],
        "doc_id long, text string",
    )
    pipe = CorpusPipeline(spark, docs)
    sel = pipe.select_target(None, target, k=20).collect()
    assert len(sel) == 20
    assert all(r.doc_id < 100 for r in sel)  # dialect-A only
    assert all(r.dsir_weight is not None for r in sel)


def test_dedup_semantic_chains_after_text_dedup(spark):
    """Round-5 review finding: stage 2 -> stage 2b chaining crashed
    with AMBIGUOUS_REFERENCE because both stages emit the same flag
    columns; dedup_semantic now replaces them."""
    import math

    docs = spark.createDataFrame(
        [(1, "alpha doc one"), (2, "alpha doc one"), (3, "unrelated text here")],
        "doc_id long, text string",
    )
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]),
         (3, [0.0, 1.0, 0.0, 0.0]),
         (2, [0.0, 0.0, 1.0, 0.0])],
        "doc_id long, embedding array<double>",
    )
    pipe = CorpusPipeline(spark, docs)
    text_flagged = pipe.dedup()  # 1 and 2 are byte twins
    out = pipe.dedup_semantic(
        text_flagged.where("NOT is_duplicate"), vecs, n_clusters=2
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert set(out.columns) >= {"doc_id", "canonical_id", "is_duplicate"}
    assert len([c for c in out.columns if c == "is_duplicate"]) == 1
    # the text-dedup survivor set passes through un-flagged (vectors distinct)
    assert all(not r.is_duplicate for r in rows.values())


def test_dedup_semantic_never_elects_out_of_df_representative(spark):
    """Round-5 review finding: with corpus-wide vectors, a duplicate
    group's keeper could be a doc absent from df — the whole group then
    vanished downstream. Vectors are now pruned to df's ids first."""
    docs = spark.createDataFrame(
        [(1, "in-df member"), (9, "other"), (10, "third")],
        "doc_id long, text string",
    )
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]),
         (2, [1.0, 0.0, 0.0, 0.0]),   # twin of 1, NOT in docs
         (9, [0.0, 1.0, 0.0, 0.0]),
         (10, [0.0, 0.0, 1.0, 0.0])],
        "doc_id long, embedding array<double>",
    )
    pipe = CorpusPipeline(spark, docs)
    out = {r.doc_id: r for r in pipe.dedup_semantic(None, vecs, n_clusters=3).collect()}
    # doc 1's only twin is outside df -> singleton, kept
    assert not out[1].is_duplicate and out[1].canonical_id == 1
    assert set(out) == {1, 9, 10}


def test_split_stage_is_leakage_safe(spark, pipe):
    deduped = pipe.dedup()
    out = pipe.split(deduped, eval_fraction=0.3, seed="t").collect()
    assert len(out) == pipe.docs.count()
    # every member of a cluster lands on its canonical's side (the
    # fixture corpus is doc + re-crawl twin, so real multi-member
    # clusters exist)
    sides = {}
    for r in out:
        sides.setdefault(r.canonical_id, set()).add(r.split)
    assert all(len(s) == 1 for s in sides.values())
    assert any(v > 1 for v in
               __import__("collections").Counter(r.canonical_id for r in out).values())
    assert {r.split for r in out} == {"train", "eval"}
    # refusing the unsafe default without flags
    with pytest.raises(ValueError):
        pipe.split(pipe.docs)
    # explicit opt-out works on raw docs
    plain = pipe.split(pipe.docs, leakage_safe=False, eval_fraction=0.3)
    assert "split" in plain.columns


def test_balance_stage_repeats_minority_groups(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    pipe = CorpusPipeline(spark, docs)
    out = pipe.balance(group_col="lang")
    per_lang = {r.lang: r for r in
                out.groupBy("lang").agg(F.max("n_epochs").alias("e"),
                                        F.count(F.lit(1)).alias("n")).collect()}
    raw = {r.lang: r.n for r in docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    biggest = max(raw, key=raw.get)
    assert per_lang[biggest].e == 1 and per_lang[biggest].n == raw[biggest]
    # every other group is repeated: strictly more rows out than in
    for lang, n in raw.items():
        if lang != biggest:
            assert per_lang[lang].n > n
            assert per_lang[lang].n == n * per_lang[lang].e


def test_curriculum_stage_orders_by_fluency(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pipe = CorpusPipeline(spark, docs)
    curated = pipe.curate(lm_buckets=3).where("mean_nll IS NOT NULL")
    out = pipe.order_curriculum(curated, n_buckets=3)
    rows = out.select("bucket", "mean_nll").collect()
    by_b = {}
    for r in rows:
        by_b.setdefault(r.bucket, []).append(r.mean_nll)
    assert set(by_b) == {0, 1, 2}
    assert max(by_b[0]) <= min(by_b[2])  # fluency monotone end to end


def test_dedup_lines_stage_chains_into_document_dedup(spark):
    """The 1c stage removes cross-doc repeated lines keep-first and
    its output feeds the document-dedup stage unchanged."""
    from terrorblade_spark.corpus import CorpusPipeline

    footer = "follow us on social media"
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta gamma\n{footer}"),
            (2, f"delta epsilon zeta\n{footer}"),
            (3, f"{footer}\neta theta iota"),
        ],
        "doc_id long, text string",
    )
    pipe = CorpusPipeline(spark, docs)
    out = {r["doc_id"]: r for r in pipe.dedup_lines(docs).collect()}
    assert out[1]["text"] == f"alpha beta gamma\n{footer}"  # first copy kept
    assert out[2]["text"] == "delta epsilon zeta"
    assert out[3]["text"] == "eta theta iota"
    assert out[2]["n_removed_lines"] == 1 and out[3]["n_removed_lines"] == 1
    # chains: the cleaned text is what document dedup sees
    cleaned = pipe.dedup_lines(docs).select("doc_id", "text")
    deduped = pipe.dedup(cleaned)
    assert deduped.count() == 3


def test_export_stage_writes_manifested_shards(spark, tmp_path):
    from terrorblade_spark.corpus import CorpusPipeline

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(200)], "doc_id long, text string"
    )
    pipe = CorpusPipeline(spark, docs)
    out = str(tmp_path / "shards")
    manifest = pipe.export(docs, out, n_shards=4)
    counts = {r["shard"]: r["n_rows"] for r in manifest.collect()}
    assert sum(counts.values()) == 200 and len(counts) == 4
    back = spark.read.json(f"{out}/shard=*")
    assert back.count() == 200


def test_topics_stage_feeds_balance(spark):
    """The analysis stage returns per-doc topics that the balance
    stage can group on — the topic-mixing composition."""
    from terrorblade_spark.corpus import CorpusPipeline

    cook = "bake flour sugar butter cake oven batter eggs cream"
    code = "compile code binary debug stack trace objects link"
    docs = spark.createDataFrame(
        [(i, cook) for i in range(12)] + [(100 + i, code) for i in range(3)],
        "doc_id long, text string",
    )
    pipe = CorpusPipeline(spark, docs)
    assigned, table = pipe.topics(docs, n_topics=2, max_iter=30, optimizer="em")
    assert table.count() == 2
    joined = docs.join(assigned, "doc_id")
    balanced = pipe.balance(joined, group_col="topic", max_epochs=3)
    by_topic = {
        r["topic"]: r["n"]
        for r in balanced.groupBy("topic").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # the minority topic is repeated toward parity (3 docs x 3 epochs)
    assert max(by_topic.values()) == 12 and min(by_topic.values()) == 9


def test_keywords_stage_is_deterministic_data_card(spark):
    """The keywords analysis stage: top-k per doc, rare terms first —
    the lightweight data-card companion to topics."""
    from terrorblade_spark.corpus import CorpusPipeline

    docs = spark.createDataFrame(
        [(1, "quantum quantum flux common"), (2, "common words here")],
        "doc_id long, text string",
    )
    pipe = CorpusPipeline(spark, docs)
    kw = pipe.keywords(docs, k=2)
    got = {(r["doc"], r["rank"]): r["term"] for r in kw.collect()}
    # the repeated doc-unique term outranks the corpus-wide one
    assert got[(1, 1)] == "quantum"
    assert kw.where(F.col("rank") > 2).count() == 0


def test_length_outliers_stage_flags_per_source(spark):
    """A 200-token doc among 10-token docs of ITS OWN source is
    flagged; the same length in a long-form source is not."""
    from terrorblade_spark.corpus import CorpusPipeline

    # lengths VARY within each source (identical lengths would zero the
    # MAD and skip the group, by the operator's contract)
    rows = (
        [(i, " ".join(["w"] * (10 + i)), "tweets") for i in range(8)]
        + [(50, " ".join(["w"] * 200), "tweets")]
        + [(100 + i, " ".join(["w"] * (200 + i)), "books") for i in range(8)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    pipe = CorpusPipeline(spark, docs)
    flagged = {r["doc_id"] for r in pipe.length_outliers(docs).collect()}
    assert flagged == {50}
