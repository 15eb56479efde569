"""CorpusPipeline: the one-stop facade for the LLM training-data flow.

Every stage exists as a standalone operator (operators/curation, dedup,
components, lm, sampling, packing — see COVERAGE.md); this facade wires
them in the canonical order with one lazy DataFrame per stage, so a
user runs the whole flow — or any prefix — with a handful of calls:

    pipe = CorpusPipeline(spark, docs)
    clean = pipe.curate()                   # rule + LM quality flags
    canon = pipe.dedup(clean)               # near-dup canonicals
    ready = pipe.split(canon)               # leakage-safe train/eval
    packed = pipe.chunk_and_pack(           # training sequences
        ready.where("split = 'train'"))     # (pack each side separately)

Nothing materializes until an action; each method returns a DataFrame
the next accepts, and ``report()`` aggregates one summary row of
rejection/dedup/packing counts (the audit artifact a data run ships
with). Stage parameters stay overridable per call — the facade adds
order and defaults, not new semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CorpusPipeline:
    def __init__(
        self,
        spark: SparkSession,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        self.spark = spark
        self.docs = docs
        self.id_col = id_col
        self.text_col = text_col

    # -- stage 1: quality ---------------------------------------------------

    def curate(
        self,
        redact: bool = True,
        lm_buckets: int = 0,
        boilerplate_line_df: float | None = None,
        quality_model=None,
        quality_threshold: float = 0.5,
        **gopher_kwargs,
    ) -> DataFrame:
        """Optional corpus-level boilerplate line removal
        (``boilerplate_line_df`` = max fraction of docs a line may
        appear in), then the Gopher-style rule filter (keeps rejection
        reasons — run AFTER boilerplate removal so banner-only docs
        fail the word-count rule), optional PII redaction, optional LM
        fluency bucketing (``lm_buckets`` > 0 fits a corpus LM and
        attaches ``mean_nll`` + ``ppl_bucket``), and optionally a
        LEARNED quality gate (``quality_model`` = a fitted
        ``operators.classifier`` pipeline; attaches ``quality_score``
        and folds ``score < threshold`` into ``keep`` with its own
        rejection reason — the standard heuristics-then-model two-stage
        recipe). Returns ALL rows with a ``keep`` flag — dropping is
        the caller's `.where("keep")`, so audits can count the
        rejects."""
        from terrorblade_spark.operators.curation import (
            gopher_filter,
            redact_pii,
            remove_boilerplate_lines,
        )

        src = self.docs
        if boilerplate_line_df is not None:
            src = remove_boilerplate_lines(
                src, self.id_col, self.text_col, max_line_df=boilerplate_line_df
            )
        out = gopher_filter(src, text_col=self.text_col, **gopher_kwargs)
        if redact:
            out = redact_pii(out, self.text_col)
        if lm_buckets > 0:
            from terrorblade_spark.operators.lm import (
                fit_ngram_lm,
                perplexity_bucket,
                score_documents,
            )

            # fit and score on the SAME text the quality rules see —
            # fitting on pre-boilerplate text would make banner n-grams
            # the model's most probable tokens and rank banner-heavy
            # docs as the most fluent
            lm = fit_ngram_lm(src, self.id_col, self.text_col)
            # materialize the small per-doc scores, then release the
            # model tables — otherwise every curate() call leaks two
            # cached relations for the session lifetime
            scores = perplexity_bucket(
                score_documents(src, lm, self.id_col, self.text_col),
                n_buckets=lm_buckets,
            ).select(self.id_col, "mean_nll", "ppl_bucket").persist()
            scores.count()
            lm.unpersist()
            out = out.join(scores, self.id_col, "left")
        if quality_model is not None:
            from pyspark.sql import functions as F

            from terrorblade_spark.operators.classifier import score_quality

            out = score_quality(quality_model, out)
            low = F.col("quality_score") < F.lit(float(quality_threshold))
            out = out.withColumn(
                "quality_reasons",
                F.when(
                    low,
                    F.array_union(
                        F.col("quality_reasons"), F.array(F.lit("quality_model"))
                    ),
                ).otherwise(F.col("quality_reasons")),
            ).withColumn("keep", F.col("keep") & ~low)
        return out

    # -- stage 1b: sequence-level dedup -------------------------------------

    def cut_repeats(
        self,
        df: DataFrame,
        window: int = 50,
        min_repeats: int = 2,
        method: str = "rolling",
    ) -> DataFrame:
        """Exact-substring dedup between curation and document dedup:
        detect token windows repeated ``min_repeats``+ times corpus-wide
        and cut them (operators/substr.py — boilerplate and quoted runs
        that whole-document MinHash can't see). The cleaned text lands
        back in ``text_col``; ``repeated_frac`` is attached for
        auditing (null = nothing repeated)."""
        from terrorblade_spark.operators.substr import (
            cut_repeated_windows,
            repeated_window_spans,
        )
        from pyspark.sql import functions as F

        spans = repeated_window_spans(
            df, self.id_col, self.text_col, window, min_repeats, method=method
        )
        cut = cut_repeated_windows(df, spans, self.id_col, self.text_col, "__cut")
        out = cut.withColumn(self.text_col, F.col("__cut")).drop("__cut")
        return out.join(
            spans.select(self.id_col, "repeated_frac"), self.id_col, "left"
        )

    # -- stage 1c: line-level dedup ------------------------------------------

    def dedup_lines(self, df: DataFrame) -> DataFrame:
        """Corpus-wide keep-first line dedup between curation and
        document dedup (operators/curation.dedup_lines): every repeated
        non-blank line keeps exactly its first (id, position) copy —
        the CCNet/Dolma paragraph step. Runs best AFTER
        ``cut_repeats`` (which removes long intra-line runs) and
        BEFORE document dedup (cleaned text raises MinHash precision).
        Attaches ``n_removed_lines`` for auditing."""
        from terrorblade_spark.operators.curation import dedup_lines

        return dedup_lines(df, self.id_col, self.text_col)

    # -- stage 2: dedup -----------------------------------------------------

    def dedup(
        self,
        df: DataFrame | None = None,
        jaccard_threshold: float = 0.8,
        quality_col: str | None = None,
        **neardup_kwargs,
    ) -> DataFrame:
        """Near-dup clustering with canonical flags. Default keeps the
        min-id member per cluster; pass ``quality_col`` (higher =
        better, e.g. negated ``mean_nll``) to keep the best member
        instead. Returns the input rows + (canonical_id, is_duplicate)."""
        from terrorblade_spark.operators.components import (
            canonicalize_by_score,
            near_dup_components,
        )

        src = df if df is not None else self.docs
        comp = near_dup_components(
            src.select(self.id_col, self.text_col),
            self.id_col,
            self.text_col,
            jaccard_threshold=jaccard_threshold,
            **neardup_kwargs,
        )
        if quality_col is None:
            flags = comp.select(self.id_col, "canonical_id", "is_duplicate")
        else:
            clusters = comp.where(F.col("canonical_id") != F.col(self.id_col)).select(
                F.col(self.id_col).alias("node"),
                F.col("canonical_id").alias("component"),
            )
            flags = canonicalize_by_score(
                src.select(self.id_col, quality_col), clusters, self.id_col, quality_col
            ).select(self.id_col, "canonical_id", "is_duplicate")
        return src.join(flags, self.id_col)

    # -- stage 2b: embedding-space dedup ------------------------------------

    def dedup_semantic(
        self,
        df: DataFrame | None,
        vectors: DataFrame,
        threshold: float = 0.95,
        n_clusters: int = 64,
        vec_col: str = "embedding",
        keep: str = "farthest",
        **semdedup_kwargs,
    ) -> DataFrame:
        """SemDeDup stage (operators/dedup.semantic_dedup): drop docs
        whose EMBEDDINGS are near-identical — catches paraphrases and
        re-renderings that text-level MinHash can't see. ``vectors``
        must carry ``id_col`` + ``vec_col`` for (at least) the docs in
        ``df``; extra vector rows are semi-join-pruned to ``df``'s ids
        FIRST, so a corpus-wide embedding table can never elect a
        representative that is absent from ``df`` (which would silently
        drop the whole group downstream). Docs without a vector pass
        through as their own canonical. Returns input rows +
        (canonical_id, is_duplicate) — REPLACING any flag columns a
        previous dedup stage attached (chain as
        ``dedup_semantic(dedup(...).where("NOT is_duplicate"), vecs)``)
        — the same contract as :meth:`dedup`, so ``chunk_and_pack``
        accepts either stage's output."""
        from terrorblade_spark.operators.dedup import semantic_dedup

        src = df if df is not None else self.docs
        src = src.drop("canonical_id", "is_duplicate")
        flags = semantic_dedup(
            vectors.join(src.select(self.id_col), self.id_col, "left_semi"),
            threshold=threshold,
            n_clusters=n_clusters,
            id_col=self.id_col,
            vec_col=vec_col,
            keep=keep,
            **semdedup_kwargs,
        )
        return src.join(
            flags.select(self.id_col, "canonical_id", "is_duplicate"),
            self.id_col,
            "left",
        ).select(
            *src.columns,
            F.coalesce("canonical_id", F.col(self.id_col)).alias("canonical_id"),
            F.coalesce("is_duplicate", F.lit(False)).alias("is_duplicate"),
        )

    # -- stage 2c: target selection -----------------------------------------

    def select_target(
        self,
        df: DataFrame | None,
        target: DataFrame,
        k: int,
        **dsir_kwargs,
    ) -> DataFrame:
        """DSIR stage (operators/dsir.dsir_sample): keep the ``k`` docs
        most like ``target`` (a reference corpus with the same
        id/text columns), sampled proportionally to the hashed-n-gram
        importance weight. Returns the SELECTED rows of ``df`` with
        ``dsir_weight`` attached — run after curation/dedup so the
        quality gates see everything but training only reads the
        targeted subset."""
        src = df if df is not None else self.docs
        from terrorblade_spark.operators.dsir import dsir_sample

        sel = dsir_sample(
            src.select(self.id_col, self.text_col),
            target.select(self.id_col, self.text_col),
            k,
            id_col=self.id_col,
            text_col=self.text_col,
            **dsir_kwargs,
        )
        return src.join(sel.select(self.id_col, "dsir_weight"), self.id_col)

    def balance(
        self,
        df: DataFrame | None = None,
        group_col: str = "lang",
        max_epochs: int = 4,
    ) -> DataFrame:
        """Epoch-repetition balancing stage (operators/sampling.
        repeat_to_balance, value-oracled as q101): repeat each
        under-represented ``group_col`` group ``ceil(max_n / n)`` times
        (capped) with a 1-based ``epoch`` counter, so a dominant
        language/domain no longer drowns the rest. Run after dedup and
        BEFORE chunk_and_pack (the epoch column keeps repeated copies
        distinguishable so per-epoch shuffles stay decorrelated) and
        never feed epoch>1 rows to eval pools."""
        src = df if df is not None else self.docs
        from terrorblade_spark.operators.sampling import repeat_to_balance

        return repeat_to_balance(src, group_col, max_epochs=max_epochs)

    def order_curriculum(
        self,
        df: DataFrame | None = None,
        score_col: str = "mean_nll",
        n_buckets: int = 4,
        seed: str = "cur-v1",
    ) -> DataFrame:
        """Curriculum-ordering stage (operators/sampling.
        curriculum_order, value-oracled as q102): attach an easy->hard
        ``bucket`` (equal-population quantiles of ``score_col`` — by
        default the curate(lm_buckets=...) mean-NLL fluency score,
        ascending: most fluent first) and a seeded intra-bucket shuffle
        ``draw``; consume ordered by (bucket, draw, id) to stream
        training data easiest-first with each stage still shuffled."""
        src = df if df is not None else self.docs
        from terrorblade_spark.operators.sampling import curriculum_order

        return curriculum_order(
            src, self.id_col, score_col, n_buckets=n_buckets, seed=seed
        )

    # -- stage 3: sequences -------------------------------------------------

    def chunk_and_pack(
        self,
        df: DataFrame,
        max_tokens: int = 512,
        overlap: int = 64,
        budget: int = 2048,
        num_shards: int = 64,
        materialize: bool = False,
    ) -> DataFrame:
        """Chunk canonical documents into overlapping token windows and
        pack chunks into budgeted training bins; ``materialize=True``
        additionally concatenates each bin into its final sequence."""
        from terrorblade_spark.operators.packing import (
            chunk_documents,
            materialize_packed,
            pack_sequences,
        )

        canon = df.where(~F.col("is_duplicate")) if "is_duplicate" in df.columns else df
        chunks = chunk_documents(
            canon.select(self.id_col, self.text_col),
            self.id_col,
            self.text_col,
            max_tokens=max_tokens,
            overlap=overlap,
        ).withColumn(
            "chunk_id",
            F.concat_ws("_", F.col(self.id_col).cast("string"), F.col("chunk_idx").cast("string")),
        )
        packed = pack_sequences(
            chunks, "chunk_id", "chunk_tokens", budget=budget, num_shards=num_shards
        )
        if materialize:
            return materialize_packed(packed, "chunk_id", "chunk_text")
        return packed

    # -- stage 4: train/eval assignment -------------------------------------

    def split(
        self,
        df: DataFrame,
        eval_fraction: float = 0.05,
        seed: str = "split-v1",
        leakage_safe: bool = True,
    ) -> DataFrame:
        """Train/eval assignment as a ``split`` column. With
        ``leakage_safe`` (the default) the assignment unit is the
        DEDUP CLUSTER: the input must carry ``canonical_id`` (run
        :meth:`dedup` / :meth:`dedup_semantic` first), and the hash
        draw keys on it — a doc and its near-variants can never
        straddle the boundary (the eval-contamination guard;
        standalone form with an explicit edge list:
        operators/sampling.leakage_safe_split, value-oracled as q87).
        ``leakage_safe=False`` falls back to the plain id-hash split
        for already-deduplicated or split-insensitive corpora."""
        from terrorblade_spark.operators.sampling import train_eval_split

        if leakage_safe:
            if "canonical_id" not in df.columns:
                raise ValueError(
                    "leakage-safe split needs dedup flags (canonical_id): run "
                    "dedup()/dedup_semantic() first, or pass leakage_safe=False"
                )
            return train_eval_split(df, "canonical_id", eval_fraction, seed)
        return train_eval_split(df, self.id_col, eval_fraction, seed)

    # -- analysis: topics ------------------------------------------------------

    def topics(
        self,
        df: DataFrame,
        n_topics: int = 8,
        max_iter: int = 20,
        seed: int = 7,
        optimizer: str = "online",
    ):
        """Corpus topic analysis (operators/topics.py): fits online LDA
        on ``df`` and returns ``(assignments, topic_table)`` — per-doc
        dominant topic/weight and the data-card topic-term table. An
        analysis stage, not a transform: feeds mixing decisions
        (pair with :meth:`balance` grouped on ``topic``)."""
        from terrorblade_spark.operators.topics import (
            assign_topics,
            fit_topics,
            topic_terms,
        )

        model = fit_topics(
            df, self.text_col, n_topics=n_topics, max_iter=max_iter, seed=seed,
            optimizer=optimizer,
        )
        return assign_topics(df, model, self.id_col, self.text_col), topic_terms(model)

    # -- analysis: keywords ----------------------------------------------------

    def keywords(self, df: DataFrame, k: int = 3) -> DataFrame:
        """Per-document TF-IDF keywords (operators/search.tfidf_keywords)
        — the lightweight data-card companion to :meth:`topics`: no
        model fit, deterministic, value-oracled (q117). Returns
        ``(doc, rank, term, score)``."""
        from terrorblade_spark.operators.search import tfidf_keywords

        return tfidf_keywords(df, self.id_col, self.text_col, k=k)

    # -- analysis: length outliers ---------------------------------------------

    def length_outliers(self, df: DataFrame, z_threshold: float = 3.5) -> DataFrame:
        """Documents whose token count is a robust (median/MAD) outlier
        within their source group (operators/anomaly.robust_outliers)
        — flags truncation/concatenation artifacts the absolute-length
        curation rules miss because each source has its own length
        regime. Analysis stage: returns the flagged rows with a
        ``robust_z`` column; feed the ids to a filter if pruning."""
        from terrorblade_spark.operators.anomaly import robust_outliers
        from terrorblade_spark.operators.textops import with_token_count

        counted = with_token_count(df, self.text_col, out_col="__n_tokens").withColumn(
            "__n_tokens", F.col("__n_tokens").cast("double")
        )
        if "source" in df.columns:
            group = ["source"]
        else:
            counted = counted.withColumn("__all", F.lit(1))
            group = ["__all"]
        out = robust_outliers(counted, "__n_tokens", group, z_threshold=z_threshold)
        return out.drop("__all")

    # -- stage 5: export ------------------------------------------------------

    def export(
        self,
        df: DataFrame,
        path: str,
        n_shards: int = 64,
        seed: str = "export-v1",
        mode: str = "error",
    ) -> DataFrame:
        """Trainer-ready JSONL shards (io.write_jsonl_shards): rows
        sharded and ordered by the seeded corpus shuffle — re-runs are
        byte-identical — with a parquet manifest beside the data.
        Returns the manifest. The terminal stage: what dataloaders
        actually mount."""
        from terrorblade_spark.io import write_jsonl_shards

        return write_jsonl_shards(
            df, path, self.id_col, n_shards=n_shards, seed=seed, mode=mode
        )

    # -- audit --------------------------------------------------------------

    def report(self, curated: DataFrame, deduped: DataFrame, packed: DataFrame) -> DataFrame:
        """One summary row: input/kept/reject counts, dedup ratio, and
        packed-sequence totals — the artifact a curation run ships."""
        c = curated.agg(
            F.count(F.lit(1)).alias("n_input"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
        )
        d = deduped.agg(
            F.count(F.lit(1)).alias("n_deduped_input"),
            F.sum((~F.col("is_duplicate")).cast("long")).alias("n_canonical"),
        )
        # stays fully lazy (one-row aggregates cross-joined) — no eager
        # count hidden inside a report BUILDER
        p = packed.agg(
            F.count_distinct(F.struct("shard", "bin")).alias("n_packed_bins")
        )
        return (
            c.crossJoin(d)
            .crossJoin(p)
            .withColumn("n_rejected", F.col("n_input") - F.col("n_kept"))
            .withColumn(
                "dup_frac",
                (F.col("n_deduped_input") - F.col("n_canonical")).cast("double")
                / F.col("n_deduped_input"),
            )
        )
