"""Token-budget sequence packing for LLM training-data pipelines.

Pretraining dataloaders consume fixed-length token windows; packing
many short documents per window ("sequence packing") is what keeps
padding waste low. The operator assigns every document a (shard, bin)
such that each bin's token total stays within ``budget``.

Scale design: packing is inherently sequential WITHIN a shard (bin
state), so the corpus is first sharded by a deterministic hash of the
id (shards ≙ dataloader workers), then each shard packs independently
inside ``applyInPandas`` — one shuffle on the shard key, a numpy
greedy pass per shard, no driver involvement. Shard count, not corpus
size, bounds the per-task state; at 100 TB you raise ``num_shards``
to keep shards executor-sized. Documents longer than the budget get
their own bin (the dataloader truncates); empty docs pack normally.

The greedy next-fit policy (seal the bin when the next doc overflows)
is deterministic given the shard's hash order, so results are stable
under retries — and unit tests replay the same policy in pure pandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from terrorblade_spark.functions.exprs import hash64


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    budget: int,
    num_shards: int = 64,
    seed: str = "pack-v1",
) -> DataFrame:
    """Assign (shard, bin, bin_tokens) to every document.

    Returns the input columns plus ``shard``, ``bin`` (0-based within
    the shard), and ``bin_tokens`` (the doc's token contribution,
    capped at budget for oversized docs' accounting).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    import pandas as pd  # noqa: F401 (applyInPandas contract)

    shard = (hash64(F.col(id_col).cast("string"), salt=seed) % num_shards).cast("int")
    src = df.withColumn("shard", shard)

    # numpy greedy next-fit over the shard's deterministic hash order;
    # the per-shard state is two scalars, the batch stays columnar
    order_key = f"__order_{seed}"

    def _pack(pdf):
        import numpy as np

        pdf = pdf.sort_values([order_key, id_col], ignore_index=True)
        toks = np.minimum(pdf[token_count_col].to_numpy().astype("int64"), budget)
        bins = np.empty(len(pdf), dtype="int64")
        b, acc = 0, 0
        for i, t in enumerate(toks):
            if acc + t > budget and acc > 0:
                b, acc = b + 1, 0
            bins[i] = b
            acc += t
        pdf["bin"] = bins
        pdf["bin_tokens"] = toks
        return pdf.drop(columns=[order_key])

    keyed = src.withColumn(order_key, hash64(F.col(id_col).cast("string"), salt=seed))
    from pyspark.sql.types import LongType

    packed_schema = StructType(
        [f for f in keyed.schema.fields if f.name != order_key]
        + [StructField("bin", LongType(), False), StructField("bin_tokens", LongType(), False)]
    )
    return keyed.groupBy("shard").applyInPandas(_pack, schema=packed_schema)


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split long documents into overlapping fixed-size token windows
    (the pre-packing step: chunk first, then ``pack_sequences`` the
    chunks).

    Emits one row per chunk: input columns minus ``text_col`` plus
    ``chunk_idx``, ``chunk_text``, ``chunk_tokens``. Chunks start every
    ``max_tokens - overlap`` tokens, so consecutive chunks share
    ``overlap`` tokens of context; the final chunk may be short. Empty
    documents produce no rows.

    Pure Catalyst plan: tokenize once per row, build the slice-start
    sequence, posexplode and slice — a narrow row-to-rows map with no
    shuffle, so it composes with the scan at any scale.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    from terrorblade_spark.functions.exprs import tokens

    step = max_tokens - overlap
    toks = tokens(text_col)
    n = F.size(toks)
    # starts: 1, 1+step, ... covering every token; ceil((n-overlap)/step)
    n_chunks = F.when(n <= 0, F.lit(0).cast("long")).otherwise(
        F.greatest(F.floor((n - overlap + step - 1) / F.lit(step)), F.lit(1).cast("long"))
    )
    starts = F.when(n_chunks > 0, F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).otherwise(
        F.array().cast("array<int>")
    )
    chunks = F.transform(
        starts,
        lambda i: F.struct(
            i.cast("long").alias("chunk_idx"),
            F.array_join(F.slice(toks, i * step + 1, max_tokens), " ").alias("chunk_text"),
            F.least(n - i * step, F.lit(max_tokens)).cast("long").alias("chunk_tokens"),
        ),
    )
    keep = [c for c in df.columns if c != text_col]
    return (
        df.select(*keep, F.explode(chunks).alias("__c"))
        .select(*keep, "__c.chunk_idx", "__c.chunk_text", "__c.chunk_tokens")
    )


def materialize_packed(
    assignments: DataFrame,
    id_col: str,
    text_col: str,
    token_count_col: str = "bin_tokens",
    separator: str = "\n\n",
    seed: str = "pack-v1",
) -> DataFrame:
    """Turn ``pack_sequences`` bin assignments into the actual training
    sequences: one row per (shard, bin) with the member texts joined in
    the pack's deterministic order, plus token totals and fill stats.

    The ordered concat is the A1 ordered-group-concat shape: sort the
    collected (order_key, text) structs inside the aggregate — never a
    window + dropDuplicates. Group width is bounded by the token
    budget (a bin holds at most budget tokens' worth of text), so the
    collected row is bounded regardless of corpus size. ``seed`` MUST
    match the one given to ``pack_sequences`` — the concat order is the
    packer's hash order under that seed.
    """
    from terrorblade_spark.functions.exprs import hash64

    ordered = F.sort_array(
        F.collect_list(
            F.struct(
                hash64(F.col(id_col).cast("string"), salt=seed).alias("k"),
                F.col(id_col).cast("string").alias("i"),
                F.col(text_col).alias("t"),
            )
        )
    )
    return (
        assignments.groupBy("shard", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count_col).alias("n_tokens"),
            F.array_join(F.transform(ordered, lambda s: s["t"]), separator).alias("text"),
            F.transform(ordered, lambda s: s["i"]).alias("member_ids"),
        )
        .orderBy("shard", "bin")
    )


def packing_stats(assignments: DataFrame, budget: int, token_count_col: str = "bin_tokens") -> DataFrame:
    """One-row packing efficiency report: bins, docs, mean fill
    fraction, waste fraction — the number that tells you whether the
    budget/corpus pairing is leaving GPU hours on the table."""
    per_bin = assignments.groupBy("shard", "bin").agg(
        F.sum(token_count_col).alias("fill")
    )
    return per_bin.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("fill").alias("total_tokens"),
        F.avg(F.col("fill").cast("double") / budget).alias("mean_fill"),
        (F.lit(1.0) - F.sum("fill").cast("double") / (F.count(F.lit(1)) * budget)).alias("waste_frac"),
    )
