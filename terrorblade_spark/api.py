"""User-facing facade: the reference engine's query surface, one method
per reference entry point, over Spark DataFrames.

A reference user migrates by swapping the object construction:

    tb = TerrorbladeSpark.from_telegram_export(spark, "export.json")
    tb.compute_clusters()
    tb.get_user_stats(123)          # telegram_database.py:345-455
    tb.find_long_message_groups()   # analyze_dialogues.py:462-637
    tb.cluster_search("query", k=5) # mcp/server.py:191-276

Every method returns an unevaluated DataFrame (the caller chooses
collect/show/write), delegates to the operator library, and keeps the
whole answer in ONE declarative plan — the reference's per-chat loops
and per-hit SQL (N+1 patterns, e.g. telegram_database.py:380-411,
vector_store.py:400-405) are deliberately collapsed into grouped/
windowed plans, which is what makes the same methods hold at cluster
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from terrorblade_spark.functions.embed import embed_text
from terrorblade_spark.functions.exprs import hash64, tokens
from terrorblade_spark.operators.semantic import process_message_groups
from terrorblade_spark.operators.vector import cosine


class TerrorbladeSpark:
    """Reference-shaped analytics over a normalized messages DataFrame
    (schemas.PROCESS) and optional per-message embeddings."""

    def __init__(
        self,
        spark: SparkSession,
        messages: DataFrame,
        embeddings: DataFrame | None = None,
        clusters: DataFrame | None = None,
        encoder=None,
    ):
        self.spark = spark
        self.messages = messages
        self.embeddings = embeddings
        self.clusters = clusters
        # ONE encoder for corpus and queries: a supplied ``embeddings``
        # DataFrame is only searchable with the encoder that built it
        # (dim + model must match, else every cosine is NULL). Pass the
        # same ``embed_text(dim, model)`` column fn used at ingest.
        self.encoder = encoder if encoder is not None else embed_text()
        # lazily-built, reused BM25 index over messages: serving tools
        # (text_search / hybrid_search) must not pay a full corpus
        # re-tokenization + aggregation per call. Invalidated whenever
        # ``messages`` is replaced (see ``_bm25``).
        self.__bm25_cache = None

    def _bm25(self):
        """Build-once BM25 index over the current ``messages``; the
        cache keys on the DataFrame identity so swapping ``messages``
        (new ingest) invalidates it and the stale index is unpersisted."""
        from terrorblade_spark.operators.search import bm25_index

        cached = self.__bm25_cache
        if cached is not None and cached[0] is self.messages:
            return cached[1]
        if cached is not None:
            cached[1].unpersist()
        docs = self.messages.select(
            F.struct("chat_id", "message_id").alias("mid"), "text"
        )
        idx = bm25_index(docs, "mid", "text", persist=True)
        self.__bm25_cache = (self.messages, idx)
        return idx

    @classmethod
    def from_telegram_export(
        cls, spark: SparkSession, path: str, min_messages: int = 1
    ) -> "TerrorbladeSpark":
        """S1/S3 ingest: JSON export -> normalized messages."""
        from terrorblade_spark.sources.telegram_json import load_telegram_export

        return cls(spark, load_telegram_export(spark, path, min_messages=min_messages))

    # -- clustering ---------------------------------------------------------

    def compute_clusters(
        self,
        time_window: str = "5m",
        semantic_threshold: float = 0.7,
        cluster_size: int = 3,
    ) -> "TerrorbladeSpark":
        """E1-E7: embed (if needed) + the full message-group pipeline.
        Reference: TextPreprocessor.process_message_groups
        (TextPreprocessor.py:120-212)."""
        m = self.messages
        if self.embeddings is not None:
            m = m.join(
                self.embeddings.select("message_id", "chat_id", "embeddings"),
                ["message_id", "chat_id"],
            )
        else:
            m = m.withColumn("embeddings", self.encoder(F.col("text")))
        grouped = process_message_groups(
            m,
            "embeddings",
            "date",
            ["chat_id"],
            "message_id",
            time_window=time_window,
            semantic_threshold=semantic_threshold,
            cluster_size=cluster_size,
        )
        self.clusters = grouped.select("message_id", "chat_id", "group_id")
        return self

    def _require_clusters(self) -> DataFrame:
        if self.clusters is None:
            raise ValueError("call compute_clusters() first (or pass clusters=)")
        return self.clusters

    def _with_groups(self) -> DataFrame:
        return self.messages.join(
            self._require_clusters(), ["message_id", "chat_id"], "left"
        )

    # -- stats (Q1/Q2) ------------------------------------------------------

    def get_user_stats(self, user_id: int | str) -> DataFrame:
        """Q1 (telegram_database.py:345-455): per-chat message stats for
        one user + their cluster participation, one grouped plan (the
        reference loops chats, an N+1)."""
        base = self._with_groups().where(F.col("from_id") == str(user_id))
        return (
            base.groupBy("chat_id", "chat_name")
            .agg(
                F.count(F.lit(1)).alias("n_messages"),
                F.min("date").alias("first_date"),
                F.max("date").alias("last_date"),
                F.avg(F.length("text")).alias("avg_chars"),
                F.countDistinct("group_id").alias("n_clusters"),
            )
            .orderBy(F.desc("n_messages"), "chat_id")
        )

    def get_chat_stats(self, chat_id: int) -> DataFrame:
        """Q2 (telegram_database.py:522-595)."""
        base = self.messages.where(F.col("chat_id") == chat_id)
        return base.groupBy("chat_id").agg(
            F.count(F.lit(1)).alias("n_messages"),
            F.countDistinct("from_id").alias("n_senders"),
            F.min("date").alias("first_date"),
            F.max("date").alias("last_date"),
            F.avg(F.length("text")).alias("avg_chars"),
        )

    def get_chats_list(self) -> DataFrame:
        """Q4 (cluster_analysis_cli.py:86-152): chat dim + message and
        cluster stats, three CTEs joined -> one grouped plan here."""
        g = self._with_groups()
        return (
            g.groupBy("chat_id", "chat_name")
            .agg(
                F.count(F.lit(1)).alias("n_messages"),
                F.countDistinct("from_id").alias("n_senders"),
                F.countDistinct("group_id").alias("n_clusters"),
                F.max("date").alias("last_activity"),
            )
            .orderBy(F.desc("n_messages"), "chat_id")
        )

    def find_chat_by_name(self, name_query: str) -> DataFrame:
        """Q4 helper (cluster_analysis_cli.py:134-165): case-insensitive
        partial chat-name match over the chats list — the filter composes
        onto the grouped plan, so the match predicate reaches the scan."""
        return self.get_chats_list().where(
            F.lower(F.col("chat_name")).contains(name_query.strip().lower())
        )

    # -- clusters (Q3/Q5/Q6/Q10) --------------------------------------------

    def get_large_clusters(self, chat_id: int | None = None, min_size: int = 5) -> DataFrame:
        """Q5 (cluster_analysis_cli.py:167-238): clusters >= min_size
        with duration/intensity buckets."""
        g = self._with_groups().where(F.col("group_id").isNotNull())
        if chat_id is not None:
            g = g.where(F.col("chat_id") == chat_id)
        agg = (
            g.groupBy("chat_id", "group_id")
            .agg(
                F.count(F.lit(1)).alias("n_messages"),
                F.min("date").alias("start_time"),
                F.max("date").alias("end_time"),
                F.countDistinct("from_id").alias("n_participants"),
            )
            .where(F.col("n_messages") >= min_size)
        )
        duration_min = (
            (F.unix_millis(F.col("end_time")) - F.unix_millis(F.col("start_time"))) / 60000.0
        )
        intensity = F.col("n_messages") / F.greatest(duration_min, F.lit(1.0))
        return (
            agg.withColumn("duration_min", duration_min)
            .withColumn(
                "intensity",
                F.when(intensity >= 1.0, F.lit("high"))
                .when(intensity >= 0.2, F.lit("medium"))
                .otherwise(F.lit("low")),
            )
            .orderBy(F.desc("n_messages"), "chat_id", "group_id")
        )

    def get_largest_cluster_messages(self, chat_id: int | None = None) -> DataFrame:
        """Q3/O3 (telegram_database.py:950-1006): messages of the
        largest cluster(s). The max is found on the AGGREGATED
        (chat, group, n) relation and broadcast-joined back — an
        unpartitioned window over the raw messages would funnel the
        whole corpus through one task. Ties: all largest clusters
        return, as before."""
        g = self._with_groups().where(F.col("group_id").isNotNull())
        if chat_id is not None:
            g = g.where(F.col("chat_id") == chat_id)
        sizes = g.groupBy("chat_id", "group_id").agg(F.count(F.lit(1)).alias("n"))
        mx = sizes.agg(F.max("n").alias("n"))
        top = sizes.join(F.broadcast(mx), "n").select("chat_id", "group_id")
        return g.join(F.broadcast(top), ["chat_id", "group_id"]).orderBy(
            "date", "message_id"
        )

    def get_random_large_cluster(
        self, min_size: int = 5, seed: str = "v1", chat_id: int | None = None
    ) -> DataFrame:
        """Q3/O6 (telegram_database.py:457-520): a seeded deterministic
        draw among qualifying clusters (md5 order, not random.choice,
        so reruns and engines agree)."""
        g = self._with_groups().where(F.col("group_id").isNotNull())
        if chat_id is not None:
            g = g.where(F.col("chat_id") == chat_id)
        qualifying = (
            g.groupBy("chat_id", "group_id")
            .agg(F.count(F.lit(1)).alias("n_messages"))
            .where(F.col("n_messages") >= min_size)
        )
        pick = qualifying.orderBy(
            hash64(F.concat_ws("/", F.lit(seed), "chat_id", "group_id")),
            "chat_id",
            "group_id",
        ).limit(1)
        return g.join(F.broadcast(pick.select("chat_id", "group_id")), ["chat_id", "group_id"]).orderBy(
            "date", "message_id"
        )

    def analyze_cluster_details(self, chat_id: int, group_id: int) -> DataFrame:
        """Q6 (cluster_analysis_cli.py:240-337): participant breakdown
        for one cluster."""
        g = self._with_groups().where(
            (F.col("chat_id") == chat_id) & (F.col("group_id") == group_id)
        )
        return (
            g.groupBy("from_id", "from_name")
            .agg(
                F.count(F.lit(1)).alias("n_messages"),
                F.sum(F.size(tokens("text"))).alias("n_words"),
                F.min("date").alias("first_message"),
                F.max("date").alias("last_message"),
            )
            .orderBy(F.desc("n_messages"), "from_id")
        )

    def get_cluster(self, chat_id: int, group_id: int) -> DataFrame:
        """Q10 (mcp/server.py:279-327): cluster messages ordered by date."""
        return (
            self._with_groups()
            .where((F.col("chat_id") == chat_id) & (F.col("group_id") == group_id))
            .orderBy("date", "message_id")
        )

    # -- dialogue mining (Q7/Q8) --------------------------------------------

    def find_long_message_groups(
        self, min_words: int = 10, min_consecutive: int = 3, window: str = "2h"
    ) -> DataFrame:
        """Q7 (analyze_dialogues.py:462-637): long-message sessions per
        author, the reference's flagship CTE chain as one windowed plan."""
        from terrorblade_spark.operators.windows import global_renumber, sessionize

        m = self.messages.withColumn("n_words", F.size(tokens("text"))).where(
            F.col("n_words") >= min_words
        )
        s = sessionize(m, "date", ["chat_id", "from_id"], "message_id", gap=window)
        grouped = (
            s.groupBy("chat_id", "from_id", "session_id")
            .agg(
                F.count(F.lit(1)).alias("n_messages"),
                F.min("date").alias("start_time"),
                F.max("date").alias("end_time"),
                F.sum("n_words").alias("total_words"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("date", "message_id"))),
                        lambda x: x.message_id.cast("string"),
                    ),
                    ",",
                ).alias("message_ids"),
            )
            .where(F.col("n_messages") >= min_consecutive)
        )
        return global_renumber(grouped, ["start_time", "chat_id", "from_id"], "group_number")

    def analyze_word_quantiles(self, chat_id: int | None = None) -> DataFrame:
        """Q8 (analyze_dialogues.py:242-309): word-count quantiles."""
        m = self.messages
        if chat_id is not None:
            m = m.where(F.col("chat_id") == chat_id)
        n_words = F.size(tokens("text"))
        return m.select(n_words.alias("n_words")).agg(
            F.count(F.lit(1)).alias("n_messages"),
            F.expr("percentile(n_words, 0.5)").alias("p50"),
            F.expr("percentile(n_words, 0.9)").alias("p90"),
            F.expr("percentile(n_words, 0.99)").alias("p99"),
            F.expr("percentile(n_words, 0.997)").alias("p997"),
        )

    # -- LLM summarize surface (Q11) ----------------------------------------

    def get_cluster_summary_data(self, chat_id: int, group_id: int) -> DataFrame:
        """Q11 data prep (cluster_analysis_cli.py:339-376): one cluster's
        messages formatted for LLM summarization — ``[ts] name: text``
        lines, latest known sender name attached, chronological. One
        declarative plan (the reference runs per-call SQL + a Python
        format loop); returns (date, line) rows so the caller picks
        collect vs write."""
        from terrorblade_spark.operators.relational import latest_by

        latest_names = latest_by(
            self.messages.select("from_id", "from_name", "date").where(
                F.col("from_name").isNotNull()
            ),
            ["from_id"],
            [F.desc("date")],
        ).select("from_id", F.col("from_name").alias("__latest_name"))
        g = (
            self._with_groups()
            .where((F.col("chat_id") == chat_id) & (F.col("group_id") == group_id))
            .where(F.col("text").isNotNull() & (F.length(F.trim("text")) > 0))
        )
        # the name dim is one row per user — broadcast at any corpus size
        line = F.concat(
            F.lit("["),
            F.date_format("date", "yyyy-MM-dd HH:mm:ss"),
            F.lit("] "),
            F.coalesce(F.col("__latest_name"), F.col("from_id").cast("string")),
            F.lit(": "),
            F.trim("text"),
        )
        return (
            g.join(F.broadcast(latest_names), "from_id", "left")
            .select("date", "message_id", line.alias("line"))
            .orderBy("date", "message_id")
        )

    def summarize_cluster(
        self,
        chat_id: int,
        group_id: int,
        summarize_fn=None,
        max_chars: int = 120_000,
    ) -> str:
        """Q11 (cluster_analysis_cli.py:379-459): format the cluster and
        hand it to a pluggable ``summarize_fn(str) -> str`` (the
        reference hardcodes an OpenAI call; here any callable — or None
        to get the formatted transcript back, keeping the correctness
        path LLM-free). The ONLY driver-side materialization is the one
        bounded cluster being summarized."""
        lines = self.get_cluster_summary_data(chat_id, group_id).select("line").collect()
        text = "\n".join(r["line"] for r in lines)[:max_chars]
        if summarize_fn is None:
            return text
        return summarize_fn(text)

    # -- vector search (Q9/V5) ----------------------------------------------

    def text_search(self, query_text: str, k: int = 5) -> DataFrame:
        """Lexical BM25 search over message text — the keyword
        counterpart to ``cluster_search``'s embedding similarity
        (exact-phrase names, ids, rare terms the hash/model embedding
        smears out). Messages are keyed by (chat_id, message_id) as a
        struct so the index id stays one column."""
        from terrorblade_spark.operators.search import bm25_topk

        top = bm25_topk(self._bm25(), query_text, k=k)
        return (
            top.select(F.col("doc.chat_id").alias("chat_id"),
                       F.col("doc.message_id").alias("message_id"),
                       "score")
            .join(self.messages, ["chat_id", "message_id"])
            .select("message_id", "chat_id", "score", "text", "date", "from_id")
            .orderBy(F.desc("score"), "chat_id", "message_id")
        )

    def hybrid_search(self, query_text: str, k: int = 5, fetch_k: int = 20) -> DataFrame:
        """Reciprocal-rank fusion of lexical (BM25) and semantic
        (embedding cosine) retrieval over messages: each retriever
        contributes its rank, no score calibration needed."""
        from terrorblade_spark.operators.search import bm25_topk, rrf_fuse

        if self.embeddings is None:
            raise ValueError("hybrid_search needs an embeddings DataFrame")
        fetch_k = max(fetch_k, k)  # a retriever must fetch at least k
        lexical = bm25_topk(self._bm25(), query_text, k=fetch_k)
        q = (
            self.spark.createDataFrame([(query_text,)], "q string")
            .select(self.encoder(F.col("q")).alias("__qvec"))
        )
        semantic = (
            self.embeddings.crossJoin(F.broadcast(q))
            .select(
                F.struct("chat_id", "message_id").alias("doc"),
                cosine(F.col("embeddings"), F.col("__qvec")).alias("score"),
            )
            .orderBy(F.desc("score"), "doc")
            .limit(fetch_k)
        )
        fused = rrf_fuse([lexical, semantic], k=k)
        return (
            fused.select(F.col("doc.chat_id").alias("chat_id"),
                         F.col("doc.message_id").alias("message_id"),
                         "rrf_score")
            .join(self.messages, ["chat_id", "message_id"])
            .select("message_id", "chat_id", "rrf_score", "text", "date", "from_id")
            .orderBy(F.desc("rrf_score"), "chat_id", "message_id")
        )

    def cluster_search(
        self, query_text: str, k: int = 5, chat_id: int | None = None
    ) -> DataFrame:
        """Q9 (mcp/server.py:191-276): embed the query, top-k cosine
        over message embeddings, best hit per cluster — set-wise, no
        per-hit SQL. ``chat_id`` scopes the CANDIDATE set before the
        top-k (filtering afterwards would return empty for any chat
        whose best hits rank below the global top-k)."""
        if self.embeddings is None:
            raise ValueError("cluster_search needs an embeddings DataFrame")
        q = (
            self.spark.createDataFrame([(query_text,)], "q string")
            .select(self.encoder(F.col("q")).alias("__qvec"))
        )
        emb = self.embeddings
        if chat_id is not None:
            emb = emb.where(F.col("chat_id") == chat_id)
        scored = emb.crossJoin(F.broadcast(q)).select(
            "message_id",
            "chat_id",
            cosine(F.col("embeddings"), F.col("__qvec")).alias("cosine_sim"),
        )
        hits = scored.orderBy(F.desc("cosine_sim"), "chat_id", "message_id").limit(k)
        return (
            hits.join(self._with_groups(), ["message_id", "chat_id"])
            .select(
                "message_id", "chat_id", "group_id", "cosine_sim", "text", "date", "from_id"
            )
            .orderBy(F.desc("cosine_sim"), "chat_id", "message_id")
        )

    def get_training_pairs(
        self,
        chat_id: int | None = None,
        context_size: int = 4,
        min_context: int = 1,
    ) -> DataFrame:
        """SFT (context, response) pairs from the chat transcripts —
        the bridge from the reference's domain (ordered dialog, the
        same transcript shape summarize_cluster formats) to an LLM
        training set: every message becomes an example whose input is
        the previous ``context_size`` turns as ``author: text`` lines
        and whose target is the message text. Empty/service texts are
        excluded on both sides; a ``chat_id`` filter pushes down to the
        scan. One windowed pass per chat (operators/sft.py)."""
        from terrorblade_spark.operators.sft import conversation_pairs

        msgs = self.messages.where(
            F.col("text").isNotNull() & (F.trim(F.col("text")) != "")
        )
        if chat_id is not None:
            msgs = msgs.where(F.col("chat_id") == chat_id)
        return conversation_pairs(
            msgs,
            group_cols=["chat_id"],
            order_cols=["date", "message_id"],
            author_col="from_name",
            text_col="text",
            id_col="message_id",
            context_size=context_size,
            min_context=min_context,
        )
