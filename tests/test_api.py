"""Facade tests: the reference-shaped query surface over the Telegram
export fixture, end to end (ingest -> embed -> cluster -> query)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from terrorblade_spark.api import TerrorbladeSpark

FIXTURE = "/root/repo/tests/data/export.json"


@pytest.fixture(scope="module")
def tb(spark):
    t = TerrorbladeSpark.from_telegram_export(spark, FIXTURE, min_messages=1)
    # hash-encoder distances between distinct texts are ~1.0, so a
    # threshold > 1 makes groups = temporal sessions (enough structure
    # for the facade tests)
    t.compute_clusters(time_window="12h", semantic_threshold=2.0, cluster_size=1)
    t.messages = t.messages.persist()
    t.clusters = t.clusters.persist()
    return t


def test_chats_list_counts_match_messages(tb):
    rows = tb.get_chats_list().collect()
    assert rows
    total = sum(r["n_messages"] for r in rows)
    assert total == tb.messages.count()
    assert all(r["n_senders"] >= 1 for r in rows)


def test_user_stats_one_grouped_plan(tb):
    uid = tb.messages.select("from_id").first()["from_id"]
    stats = tb.get_user_stats(uid)
    rows = stats.collect()
    assert rows and all(r["n_messages"] > 0 for r in rows)
    n = tb.messages.where(F.col("from_id") == uid).count()
    assert sum(r["n_messages"] for r in rows) == n


def test_chat_stats(tb):
    cid = tb.messages.select("chat_id").first()["chat_id"]
    r = tb.get_chat_stats(cid).collect()
    assert len(r) == 1
    assert r[0]["n_messages"] == tb.messages.where(F.col("chat_id") == cid).count()


def test_large_clusters_and_details(tb):
    clusters = tb.get_large_clusters(min_size=2).collect()
    assert clusters, "fixture should produce at least one size>=2 cluster"
    c = clusters[0]
    assert c["intensity"] in ("high", "medium", "low")
    details = tb.analyze_cluster_details(c["chat_id"], c["group_id"]).collect()
    assert sum(r["n_messages"] for r in details) == c["n_messages"]
    fetched = tb.get_cluster(c["chat_id"], c["group_id"]).collect()
    assert len(fetched) == c["n_messages"]
    dates = [r["date"] for r in fetched]
    assert dates == sorted(dates)


def test_largest_cluster_is_largest(tb):
    got = tb.get_largest_cluster_messages().collect()
    sizes = (
        tb._with_groups()
        .where(F.col("group_id").isNotNull())
        .groupBy("chat_id", "group_id")
        .count()
        .collect()
    )
    assert len(got) == max(r["count"] for r in sizes)


def test_random_large_cluster_deterministic(tb):
    a = [r["message_id"] for r in tb.get_random_large_cluster(min_size=2, seed="s").collect()]
    b = [r["message_id"] for r in tb.get_random_large_cluster(min_size=2, seed="s").collect()]
    assert a and a == b
    # qualifying choice respects min_size
    assert len(a) >= 2


def test_find_long_message_groups_numbering(tb):
    runs = tb.find_long_message_groups(min_words=1, min_consecutive=2, window="12h")
    rows = runs.orderBy("group_number").collect()
    if rows:
        assert [r["group_number"] for r in rows] == list(range(len(rows)))
        assert all(r["n_messages"] >= 2 for r in rows)


def test_word_quantiles_monotone(tb):
    r = tb.analyze_word_quantiles().collect()[0]
    assert r["p50"] <= r["p90"] <= r["p99"] <= r["p997"]


def test_cluster_search_requires_embeddings_or_works(tb, spark):
    # attach embeddings from the clustered pipeline: re-embed via the
    # deterministic hash encoder
    from terrorblade_spark.functions.embed import embed_text

    tb2 = TerrorbladeSpark(
        spark,
        tb.messages,
        embeddings=tb.messages.select(
            "message_id", "chat_id", embed_text()(F.col("text")).alias("embeddings")
        ),
        clusters=tb.clusters,
    )
    sample_text = tb.messages.select("text").first()["text"]
    hits = tb2.cluster_search(sample_text, k=3).collect()
    assert 1 <= len(hits) <= 3
    # searching for an existing message's text must surface that message first
    assert hits[0]["cosine_sim"] >= max(h["cosine_sim"] for h in hits) - 1e-9

    with pytest.raises(ValueError):
        TerrorbladeSpark(spark, tb.messages, clusters=tb.clusters).cluster_search("x")


def test_cluster_summary_data_format(tb):
    c = tb.get_large_clusters(min_size=2).collect()[0]
    rows = tb.get_cluster_summary_data(c["chat_id"], c["group_id"]).collect()
    assert rows
    import re

    # [yyyy-MM-dd HH:mm:ss] name: text — reference format
    # (cluster_analysis_cli.py:366-373)
    pat = re.compile(r"^\[\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\] .+: .+$")
    assert all(pat.match(r["line"]) for r in rows)
    # chronological
    dates = [r["date"] for r in rows]
    assert dates == sorted(dates)


def test_summarize_cluster_pluggable_hook(tb):
    c = tb.get_large_clusters(min_size=2).collect()[0]
    # no hook -> the formatted transcript itself (LLM-free path)
    transcript = tb.summarize_cluster(c["chat_id"], c["group_id"])
    assert transcript.count("\n") == c["n_messages"] - 1

    # pluggable hook receives exactly that transcript
    seen = {}

    def fake_llm(text: str) -> str:
        seen["text"] = text
        return f"SUMMARY({len(text)} chars)"

    out = tb.summarize_cluster(c["chat_id"], c["group_id"], summarize_fn=fake_llm)
    assert seen["text"] == transcript
    assert out == f"SUMMARY({len(transcript)} chars)"

    # max_chars truncates before the hook sees the text
    short = tb.summarize_cluster(c["chat_id"], c["group_id"], summarize_fn=len, max_chars=10)
    assert short == 10


def test_find_chat_by_name_partial_case_insensitive(tb):
    # fixture chats carry distinct names; probe with a mixed-case infix
    any_name = tb.messages.select("chat_name").first()["chat_name"]
    infix = any_name[1:-1] if len(any_name) > 2 else any_name
    rows = tb.find_chat_by_name(infix.upper()).collect()
    assert rows
    assert all(infix.lower() in r["chat_name"].lower() for r in rows)
    assert tb.find_chat_by_name("no-such-chat-name-xyz").count() == 0


def test_text_search_finds_exact_terms(tb):
    # pick a distinctive word from some fixture message
    row = tb.messages.where(F.length("text") > 20).first()
    term = max(row["text"].split(), key=len).lower().strip(".,!?")
    hits = tb.text_search(term, k=5).collect()
    assert hits
    assert all(term in r["text"].lower() for r in hits)
    scores = [r["score"] for r in hits]
    assert scores == sorted(scores, reverse=True)


def test_hybrid_search_fuses_both_retrievers(tb, spark):
    from terrorblade_spark.functions.embed import embed_text

    tb2 = TerrorbladeSpark(
        spark,
        tb.messages,
        embeddings=tb.messages.select(
            "message_id", "chat_id", embed_text()(F.col("text")).alias("embeddings")
        ),
        clusters=tb.clusters,
    )
    row = tb.messages.where(F.length("text") > 20).first()
    query = " ".join(row["text"].split()[:4])
    hits = tb2.hybrid_search(query, k=5, fetch_k=10).collect()
    assert hits
    # the query's source message must surface (top lexical AND semantic)
    ids = {(r["chat_id"], r["message_id"]) for r in hits}
    assert (row["chat_id"], row["message_id"]) in ids
    assert all(0 < r["rrf_score"] <= 2 / 61 for r in hits)


def test_bm25_index_cached_across_serving_calls(tb):
    # serving tools must not rebuild the inverted index per call: the
    # cached Bm25Index is keyed on the messages DataFrame identity
    idx1 = tb._bm25()
    idx2 = tb._bm25()
    assert idx1 is idx2
    # two searches reuse the same cached relations
    tb.text_search("the", k=2).collect()
    assert tb._bm25() is idx1
    # swapping messages invalidates the cache
    old_messages = tb.messages
    tb.messages = tb.messages.limit(50)
    try:
        idx3 = tb._bm25()
        assert idx3 is not idx1
    finally:
        tb.messages = old_messages
        tb._bm25()  # rebuild for any later module-scoped test


def test_custom_encoder_used_for_corpus_and_query(spark):
    """Review repro: the query was always embedded with the default
    64-dim hash encoder, so externally-built embeddings of any other
    dim got NULL cosine everywhere. One encoder now drives both."""
    from terrorblade_spark.api import TerrorbladeSpark
    from terrorblade_spark.functions.embed import embed_text

    msgs = spark.createDataFrame(
        [(1, 100, "spark streaming joins", 7), (2, 100, "cooking pasta recipes", 8)],
        "message_id long, chat_id long, text string, from_id long",
    ).withColumn("date", F.current_timestamp())
    enc = embed_text(dim=32)  # non-default dim
    emb = msgs.select(
        "message_id", "chat_id", enc(F.col("text")).alias("embeddings")
    )
    clusters = msgs.select("message_id", "chat_id", (F.col("message_id") % 2).alias("group_id"))
    tb = TerrorbladeSpark(spark, msgs, embeddings=emb, clusters=clusters, encoder=enc)
    hits = tb.cluster_search("spark streaming", k=1).collect()
    assert len(hits) == 1 and hits[0]["message_id"] == 1
    assert hits[0]["cosine_sim"] is not None


def test_cluster_search_chat_scope_before_topk(spark):
    """Review repro: scoping a chat AFTER the global top-k returned
    empty when the chat's best hits ranked below it."""
    from terrorblade_spark.api import TerrorbladeSpark
    from terrorblade_spark.functions.embed import embed_text

    rows = [(i, 1, "spark streaming query engine", 7) for i in range(1, 10)]
    rows += [(100, 2, "spark streaming", 8)]
    msgs = spark.createDataFrame(
        rows, "message_id long, chat_id long, text string, from_id long"
    ).withColumn("date", F.current_timestamp())
    enc = embed_text()
    emb = msgs.select("message_id", "chat_id", enc(F.col("text")).alias("embeddings"))
    clusters = msgs.select("message_id", "chat_id", F.lit(0).alias("group_id"))
    tb = TerrorbladeSpark(spark, msgs, embeddings=emb, clusters=clusters)
    got = tb.cluster_search("spark streaming query engine", k=3, chat_id=2).collect()
    assert [r["chat_id"] for r in got] == [2]


def test_get_training_pairs_from_transcripts(tb):
    pairs = tb.get_training_pairs(context_size=2, min_context=1).collect()
    assert pairs, "fixture chats should yield at least one pair"
    by_chat_first = {}
    for r in pairs:
        assert 1 <= r.n_context <= 2
        # context lines are formatted "author: text"
        for line in r.context.split("\n"):
            assert ": " in line
        assert r.response and r.response_author
        by_chat_first.setdefault(r.chat_id, r)
    # per-chat filter agrees with the unfiltered slice
    cid = next(iter(by_chat_first))
    sub = tb.get_training_pairs(chat_id=cid, context_size=2).collect()
    assert {r.message_id for r in sub} == {
        r.message_id for r in pairs if r.chat_id == cid
    }
