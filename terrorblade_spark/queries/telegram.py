"""End-to-end Telegram-export pipeline under the oracle gate (S1 +
P1–P5 + A4): loads the synthetic export fixture through the FULL source
normalization (entity flatten, media markers, service filter, blank
nulling, from_id strip, timestamp parse) and rolls up per-chat stats.
The DuckDB oracle re-derives every normalization step from the same
JSON via read_json, so a hash match certifies the whole source path —
including a per-chat checksum over the normalized text itself.

The fixture path is fixed (tests/data/export.json); sf_dir is unused —
the source connector's correctness doesn't scale with sf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terrorblade_spark.functions.exprs import duck_hash64, hash64
from terrorblade_spark.registry import query
from terrorblade_spark.sources.telegram_json import load_telegram_export

from pathlib import Path

# repo-relative (queries/ -> terrorblade_spark/ -> repo root): a
# hardcoded absolute path broke the query on any other checkout
FIXTURE = str(Path(__file__).resolve().parents[2] / "tests" / "data" / "export.json")

# DuckDB twin of sources.telegram_json.load_telegram_export
# (rf-string: the regex below carries \s escapes that must reach DuckDB)
_NORMALIZED_SQL = rf"""
      WITH chats AS (
        SELECT unnest(chats.list) AS chat
        FROM read_json('{FIXTURE}', maximum_object_size=104857600)
      ),
      gated AS (
        SELECT chat.* FROM chats WHERE len(chat.messages) >= 3
      ),
      msgs AS (
        SELECT id AS chat_id, name AS chat_name, unnest(messages) AS msg
        FROM gated
      ),
      flattened AS (
        SELECT chat_id, chat_name,
               msg.id AS message_id,
               strptime(msg.date, '%Y-%m-%dT%H:%M:%S') AS date,
               TRY_CAST(regexp_replace(msg.from_id, '^(user|channel)', '') AS BIGINT) AS from_id,
               coalesce(
                 CASE WHEN msg.text_entities IS NOT NULL AND len(msg.text_entities) > 0
                      THEN array_to_string(list_transform(msg.text_entities, e -> e.text), '')
                 END,
                 CASE WHEN length(msg.text) > 0
                           AND NOT regexp_matches(msg.text, '^\s*\[\s*["{{]')
                      THEN msg.text END
               ) AS text_raw,
               CASE
                 WHEN msg.photo IS NOT NULL THEN '[photo](' || msg.photo || ')'
                 WHEN msg.media_type IS NOT NULL
                      AND coalesce(msg.file_name, msg.file) IS NOT NULL
                   THEN '[' || msg.media_type || '](' || coalesce(msg.file_name, msg.file) || ')'
                 WHEN msg.media_type IS NOT NULL THEN '[' || msg.media_type || ']'
                 WHEN coalesce(msg.file_name, msg.file) IS NOT NULL
                   THEN '[file](' || coalesce(msg.file_name, msg.file) || ')'
               END AS media_marker,
               msg.type AS msg_type
        FROM msgs
      ),
      cleaned AS (
        SELECT *, coalesce(CASE WHEN length(text_raw) > 0 THEN text_raw END,
                           media_marker) AS text
        FROM flattened
        WHERE coalesce(msg_type, 'message') != 'service'
      )
      SELECT chat_id, chat_name, message_id, date, from_id, text
      FROM cleaned
      WHERE text IS NOT NULL AND length(trim(text)) > 0
"""


@query(
    "q58_telegram_chat_stats",
    oracle=f"""
    SELECT chat_id,
           chat_name,
           count(*) AS n_messages,
           count(DISTINCT from_id) AS n_senders,
           min(date) AS first_date,
           max(date) AS last_date,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           CAST(sum({duck_hash64("text")}) AS BIGINT) AS text_checksum
    FROM ({_NORMALIZED_SQL})
    GROUP BY chat_id, chat_name
    ORDER BY chat_id
    """,
)
def q58_telegram_chat_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = load_telegram_export(spark, FIXTURE, min_messages=3)
    return (
        m.groupBy("chat_id", "chat_name")
        .agg(
            F.count(F.lit(1)).alias("n_messages"),
            F.countDistinct("from_id").alias("n_senders"),
            F.min("date").alias("first_date"),
            F.max("date").alias("last_date"),
            F.sum(F.length("text")).alias("total_chars"),
            F.sum(hash64(F.col("text"))).alias("text_checksum"),
        )
        .orderBy("chat_id")
    )
