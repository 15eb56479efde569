"""Telegram desktop-export JSON source (SURVEY §2.1 S1, §2.2 P1–P5).

Reference behavior re-expressed declaratively (one Spark plan, no
per-chat Python dict):

- ``load_json`` (TelegramPreprocessor.py:444-522): flatten
  ``text_entities`` to text, rename ``from``->``from_name``, inject
  chat_name/chat_id/chat_type/message_id, drop chats with < N messages
- media markers (TelegramPreprocessor.py:742-950 handle_* chains):
  photo/file/media_type become ``[marker](path)`` text decorations
- service-message filter (:982-1004), blank-text nulling (:1006-1029),
  from_id prefix strip (:1073-1075), ISO timestamp parse (:675),
  schema standardize (:1076-1077).

Everything is schema-on-read against schemas.EXPORT_FILE — explicit
casts, no inference — so a 100 TB landing zone of exports reads with
full predicate/column pushdown and no sampling pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from terrorblade_spark.schemas import EXPORT_FILE, PROCESS, standardize


def _entities_text(entities: Column) -> Column:
    """Rich-text entity list -> plain string (reference :486-492,548-555)."""
    return F.array_join(F.transform(entities, lambda e: e["text"]), "")


def _media_marker(msg: Column) -> Column:
    """The reference's handle_photos/videos/files/voice chains
    (TelegramPreprocessor.py:742-950): media becomes a text marker so
    downstream text ops see one column."""
    photo = msg["photo"]
    file_ = F.coalesce(msg["file_name"], msg["file"])
    media_type = msg["media_type"]
    return (
        F.when(photo.isNotNull(), F.format_string("[photo](%s)", photo))
        .when(
            media_type.isNotNull() & file_.isNotNull(),
            F.format_string("[%s](%s)", media_type, file_),
        )
        .when(media_type.isNotNull(), F.format_string("[%s]", media_type))
        .when(file_.isNotNull(), F.format_string("[file](%s)", file_))
    )


def load_telegram_export(
    spark: SparkSession, path: str, min_messages: int = 3
) -> DataFrame:
    """Read export file(s) -> normalized PROCESS-schema DataFrame.

    One declarative plan: read (declared schema) -> explode chats ->
    gate small chats -> explode messages -> normalize columns.
    """
    raw = spark.read.json(path, schema=EXPORT_FILE, multiLine=True)
    chats = raw.select(F.explode("chats.list").alias("chat")).where(
        F.size("chat.messages") >= min_messages
    )
    m = chats.select(
        F.col("chat.id").alias("chat_id"),
        F.col("chat.name").alias("chat_name"),
        F.col("chat.type").alias("chat_type"),
        F.explode("chat.messages").alias("msg"),
    )
    # ENTITIES FIRST: real Telegram Desktop exports encode any formatted
    # message's `text` as an ARRAY of segments, which the declared
    # StringType stringifies to raw JSON — preferring a non-empty
    # text_entities list (always populated alongside array text) keeps
    # formatted/link/mention messages as their visible text instead of
    # JSON garbage. The rlike guard catches the array-without-entities
    # residue: a plain string starting like a JSON array is overwhelmingly
    # a stringified segment list, not message prose.
    looks_jsonified = F.col("msg.text").rlike(r'^\s*\[\s*["{]')
    text_raw = F.coalesce(
        F.when(
            F.col("msg.text_entities").isNotNull()
            & (F.size("msg.text_entities") > 0),
            _entities_text(F.col("msg.text_entities")),
        ),
        F.when(
            (F.length(F.col("msg.text")) > 0) & ~looks_jsonified,
            F.col("msg.text"),
        ),
    )
    text_with_media = F.coalesce(
        F.when(F.length(text_raw) > 0, text_raw), _media_marker(F.col("msg"))
    )
    normalized = m.select(
        F.col("msg.id").alias("message_id"),
        F.to_timestamp(F.col("msg.date"), "yyyy-MM-dd'T'HH:mm:ss").alias("date"),
        F.regexp_replace(F.col("msg.from_id"), "^(user|channel)", "")
        .cast("long")
        .alias("from_id"),
        text_with_media.alias("text"),
        "chat_id",
        F.col("msg.reply_to_message_id").alias("reply_to_message_id"),
        "chat_name",
        F.col("msg.from").alias("from_name"),
        F.col("msg.forwarded_from").alias("forwarded_from"),
        F.coalesce(F.col("msg.file_name"), F.col("msg.file")).alias("file_name"),
        "chat_type",
        # P2 service filter, null-safe: a record without `type` is a
        # plain message (raw `!= 'service'` is NULL for it -> dropped)
    ).where(F.coalesce(F.col("msg.type"), F.lit("message")) != "service")
    # P3: blank -> null, then require text
    cleaned = normalized.withColumn(
        "text", F.when(F.length(F.trim("text")) > 0, F.col("text"))
    ).where(F.col("text").isNotNull())
    return standardize(cleaned, PROCESS)


# S3 HTML scrape moved to telegram_html.py (stdlib parser, no bs4
# dependency); re-exported here for the original import path.
from terrorblade_spark.sources.telegram_html import parse_telegram_html  # noqa: E402,F401
