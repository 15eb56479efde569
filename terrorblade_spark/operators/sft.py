"""Conversation → supervised training pairs (context, response).

The bridge between the reference's domain (chat transcripts — the
ordered "author: text" cluster snippets its summarize path formats,
mcp/server.py:104-114 cluster_summary_template over get_cluster rows,
server.py:280) and an LLM data pipeline: every message becomes a training example whose input is the
formatted preceding turns and whose target is the message text — the
standard SFT / next-turn-prediction extraction.

One windowed pass, all JVM: format each turn as ``author: text``,
collect the previous ``context_size`` formatted turns with a
ROWS-framed window (the W7 ±N-context machinery), join, filter by
minimum context. The window sort is per conversation group — bounded
by the longest conversation, never corpus-wide — and the same
partition sort serves the position, context, and response columns.
Value-oracled end to end as q88_conversation_pairs (sessionized event
streams at gate scale; the Telegram fixture exercises the dialog
shape in tests/test_sft.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conversation_pairs(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    author_col: str,
    text_col: str,
    id_col: str,
    context_size: int = 4,
    min_context: int = 1,
    sep: str = "\n",
) -> DataFrame:
    """Emit one (context, response) pair per qualifying message.

    Output = ``group_cols`` + ``id_col`` + ``n_context`` (how many
    turns the context holds), ``context`` (the previous
    min(position, context_size) turns as ``author: text`` lines joined
    by ``sep``), ``response_author`` and ``response`` (the target
    turn, unformatted). Messages with fewer than ``min_context``
    preceding turns in their group produce no pair (min_context=0
    keeps conversation openers with an empty context)."""
    if context_size < 1:
        raise ValueError(f"context_size must be >= 1, got {context_size}")
    if not 0 <= min_context <= context_size:
        raise ValueError("need 0 <= min_context <= context_size")
    # null-safe: F.concat null-propagates and collect_list then SKIPS
    # the null line — a NULL-author turn (deleted account, channel
    # post) would silently vanish from every later context while still
    # emitting its own pair. Placeholder the author, empty the text.
    line = F.concat(
        F.coalesce(F.col(author_col).cast("string"), F.lit("unknown")),
        F.lit(": "),
        F.coalesce(F.col(text_col).cast("string"), F.lit("")),
    )
    wctx = (
        Window.partitionBy(*group_cols)
        .orderBy(*order_cols)
        .rowsBetween(-context_size, -1)
    )
    ctx = F.collect_list("__line").over(wctx)
    out = (
        df.withColumn("__line", line)
        .withColumn("__ctx", ctx)
        .select(
            *group_cols,
            id_col,
            F.size("__ctx").alias("n_context"),
            F.array_join("__ctx", sep).alias("context"),
            F.col(author_col).alias("response_author"),
            F.col(text_col).alias("response"),
        )
    )
    return out.where(F.col("n_context") >= min_context)


def preference_pairs(
    df: DataFrame,
    group_cols: Sequence[str],
    score_col: str,
    id_col: str,
    payload_cols: Sequence[str] = (),
    margin: float = 0.0,
    min_candidates: int = 2,
) -> DataFrame:
    """Extract (chosen, rejected) preference pairs per prompt group —
    the DPO/RLHF training-data shape: among each group's scored
    candidates, chosen = the highest-scored, rejected = the
    lowest-scored, emitted only when the group has at least
    ``min_candidates`` scored rows and the score gap clears ``margin``.

    Output = ``group_cols`` + ``n_candidates`` + ``chosen_id`` /
    ``chosen_score`` (+ ``chosen_<payload>``), ``rejected_id`` /
    ``rejected_score`` (+ ``rejected_<payload>``), ``score_gap``.

    Ties break on ``id_col`` (chosen takes the larger id, rejected the
    smaller), so the pair is deterministic under shuffle reordering.
    NULL scores are dropped up front — they are unjudged candidates,
    not worst ones — and ``n_candidates`` counts only scored rows.

    Scale design: ONE aggregation — ``max_by``/``min_by`` over a
    (score, id) struct ordering key. Constant state per group with
    map-side partial combine, so a prompt with a million candidates
    costs the same aggregate state as one with two, and only per-group
    extremes cross the shuffle; no window (which would carry every
    candidate row through the exchange), no second shuffle. The struct
    ordering key does force SortAggregate over HashAggregate (struct
    buffers aren't UnsafeRow-mutable), a per-partition group-key sort
    the plan gate documents. The reference has no preference
    surface; this extends its cluster->summary training path
    (mcp/server.py:104-114) the way conversation_pairs extends its
    context formatting."""
    if min_candidates < 2:
        raise ValueError(f"min_candidates must be >= 2, got {min_candidates}")
    scored = df.where(F.col(score_col).isNotNull())
    row = F.struct(
        F.col(id_col).alias("id"),
        F.col(score_col).alias("score"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    # composite ordering key: score first, id as the deterministic
    # tie-break (struct comparison is lexicographic on both ends)
    ordkey = F.struct(F.col(score_col), F.col(id_col))
    agg = scored.groupBy(*group_cols).agg(
        F.max_by(row, ordkey).alias("__c"),
        F.min_by(row, ordkey).alias("__r"),
        F.count(F.lit(1)).alias("n_candidates"),
    )
    side = lambda s, tag: [  # noqa: E731
        F.col(f"__{s}.id").alias(f"{tag}_id"),
        F.col(f"__{s}.score").alias(f"{tag}_score"),
        *[F.col(f"__{s}.{c}").alias(f"{tag}_{c}") for c in payload_cols],
    ]
    out = agg.select(
        *group_cols,
        "n_candidates",
        *side("c", "chosen"),
        *side("r", "rejected"),
        (F.col("__c.score") - F.col("__r.score")).alias("score_gap"),
    )
    return out.where(
        (F.col("n_candidates") >= min_candidates) & (F.col("score_gap") >= margin)
    )
