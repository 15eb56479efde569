"""Live Telegram API collector (reference
parse_telegram_client.py:122-265 — the `TelegramParser` fetch loop),
re-expressed as a thin driver-side boundary over the Spark engine.

The reference's live half is a Telethon session: authenticate, list
dialogs, and per chat fetch only messages newer than the stored
high-watermark (`get_max_message_id` -> `iter_messages(min_id=...)`),
then land them through DuckDB's PK insert-or-ignore
(telegram_database.py:925-928). The API iteration itself is inherently
driver-side — a rate-limited, sequential network protocol with nothing
to distribute — so THAT stays a plain loop; everything after the fetch
is Spark:

- normalization (service filter, media->text marker, blank-text
  nulling, PROCESS-schema standardize) runs as the SAME declarative
  expressions the export loader uses — one code path for both sources;
- the high-watermark is computed by the engine (one
  groupBy(chat_id).max(message_id) over the landed table — at scale a
  manifest/partition-pruned scan, never a driver loop);
- landing is exactly-once: `TxnTable.merge_upsert` insert-or-ignore on
  (chat_id, message_id) is the atomic twin of the reference's PK
  INSERT OR IGNORE, so a crashed-and-replayed fetch cannot duplicate.

The Telethon dependency is import-gated. Any object satisfying the
small `ChatClient` protocol drives the collector, so tests use a
deterministic fake and production wraps a real Telethon client in
~20 lines (`telethon_chat_client` below raises with instructions when
the library is absent — this container does not ship it).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence
from typing import Any, Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terrorblade_spark.schemas import PROCESS, standardize

# The raw message row a ChatClient yields (one dict per message; the
# keys mirror reference parse_telegram_client.py:158-169 msg_dict):
#   message_id int, date datetime, from_id int|None, text str|None,
#   reply_to_message_id int|None, media_type str|None,
#   file_name str|None, forwarded_from str|None, is_service bool
_RAW_SCHEMA = (
    "message_id long, date timestamp, from_id long, text string, "
    "reply_to_message_id long, media_type string, file_name string, "
    "forwarded_from string, is_service boolean"
)


class ChatClient(Protocol):
    """The minimal surface the collector needs from a live API client.
    Structural typing: any object with these methods works (a Telethon
    adapter, a replay log, a test fake)."""

    def get_dialogs(self, limit: int | None = None) -> Sequence[tuple[int, str]]:
        """[(chat_id, dialog_name), ...]"""
        ...

    def iter_messages(
        self, chat_id: int, min_id: int = 0, limit: int | None = None
    ) -> Iterable[dict[str, Any]]:
        """Raw message dicts with id > min_id (see _RAW_SCHEMA keys)."""
        ...

    def get_sender_name(self, from_id: int) -> str | None:
        """Display name for a sender id (reference get_entity)."""
        ...


def telethon_chat_client(*args: Any, **kwargs: Any) -> "ChatClient":
    """Construct a ChatClient over a real Telethon session. Gated:
    telethon is not a dependency of this engine (the reference treats
    the live client as an optional, contributed path too —
    parse_telegram_client.py:1-2)."""
    try:
        import telethon  # noqa: F401
    except ImportError as e:  # pragma: no cover - exercised only with telethon
        raise NotImplementedError(
            "telethon is not installed. Provide any object implementing "
            "ChatClient (get_dialogs / iter_messages / get_sender_name) "
            "to TelegramCollector instead; see tests/test_sources.py for "
            "a complete fake-client example."
        ) from e
    raise NotImplementedError(
        "wrap your authenticated TelegramClient in a ChatClient adapter: "
        "get_dialogs -> [(dialog.id, dialog.name)], iter_messages -> "
        "msg_dict per non-service message, get_sender_name -> entity name"
    )


def normalize_live_batch(
    spark: SparkSession,
    rows: Sequence[dict[str, Any]],
    chat_id: int,
    chat_name: str | None,
    sender_names: dict[int, str] | None = None,
) -> DataFrame:
    """One fetched chat batch -> PROCESS-schema DataFrame, using the
    export loader's exact semantics (telegram_json.py): service
    messages dropped (P2), media becomes a ``[type](file)`` text marker
    when the text is empty, blank text nulled then required (P3),
    from_name resolved from the sender map with chat_name fallback
    (reference :201-212)."""
    raw = spark.createDataFrame(
        [
            {k: r.get(k) for k in (
                "message_id", "date", "from_id", "text", "reply_to_message_id",
                "media_type", "file_name", "forwarded_from",
            )} | {"is_service": bool(r.get("is_service"))}
            for r in rows
        ],
        _RAW_SCHEMA,
    ).where(~F.col("is_service"))
    names = sender_names or {}
    if names:
        name_map = F.map_from_arrays(
            F.array(*[F.lit(int(k)).cast("long") for k in names]),
            F.array(*[F.lit(v) for v in names.values()]),
        )
        resolved = name_map[F.col("from_id")]
    else:
        resolved = F.lit(None).cast("string")
    media_marker = (
        F.when(
            F.col("media_type").isNotNull() & F.col("file_name").isNotNull(),
            F.format_string("[%s](%s)", "media_type", "file_name"),
        )
        .when(F.col("media_type").isNotNull(), F.format_string("[%s]", "media_type"))
        .when(F.col("file_name").isNotNull(), F.format_string("[file](%s)", "file_name"))
    )
    text = F.coalesce(
        F.when(F.length(F.trim("text")) > 0, F.col("text")), media_marker
    )
    out = raw.select(
        "message_id",
        "date",
        "from_id",
        text.alias("text"),
        F.lit(chat_id).cast("long").alias("chat_id"),
        "reply_to_message_id",
        F.lit(chat_name).cast("string").alias("chat_name"),
        F.coalesce(
            F.when(F.col("from_id").isNotNull(), resolved),
            F.lit(chat_name),
        ).alias("from_name"),
        "forwarded_from",
        "file_name",
    ).where(F.col("text").isNotNull())
    return standardize(out, PROCESS)


class TelegramCollector:
    """The fetch-resume-land loop (reference get_all_chats,
    parse_telegram_client.py:222-265): per dialog, resume from the
    landed table's high-watermark and append only newer messages,
    exactly once."""

    def __init__(self, spark: SparkSession, client: ChatClient, table) -> None:
        # ``table`` is a txn.TxnTable holding PROCESS-schema rows
        self.spark = spark
        self.client = client
        self.table = table

    def high_watermarks(self) -> dict[int, int]:
        """max(message_id) per chat from the landed table — the engine
        aggregates (manifest-pruned scan + map-side-combined groupBy);
        the driver receives one int per chat, not data."""
        try:
            snap = self.table.read(self.spark)
        except FileNotFoundError:
            return {}
        return {
            r["chat_id"]: r["mx"]
            for r in snap.groupBy("chat_id").agg(F.max("message_id").alias("mx")).collect()
        }

    def sync_chat(
        self,
        chat_id: int,
        chat_name: str | None,
        min_id: int = 0,
        limit: int | None = None,
    ) -> int:
        """Fetch messages newer than ``min_id``, normalize, land
        idempotently. Returns rows landed (0 for up-to-date chats)."""
        rows = list(self.client.iter_messages(chat_id, min_id=min_id, limit=limit))
        if not rows:
            return 0
        senders = sorted(
            {r["from_id"] for r in rows if r.get("from_id") is not None}
        )
        names = {}
        for s in senders:
            name = self.client.get_sender_name(s)
            if name is not None:
                names[s] = name
        batch = normalize_live_batch(self.spark, rows, chat_id, chat_name, names)
        if batch.count() == 0:
            return 0
        # insert-or-ignore on the message PK: replaying an already-landed
        # fetch (crash between land and watermark re-read) is a no-op.
        # "Landed" is the table's manifest row-count delta — the batch
        # size would over-report on exactly those ignored replays.
        before = self._manifest_rows()
        self.table.merge_upsert(batch, keys=["chat_id", "message_id"])
        return self._manifest_rows() - before

    def _manifest_rows(self) -> int:
        m = self.table.latest()
        return sum(e["rows"] for e in m.entries) if m else 0

    def sync_all(
        self,
        limit_dialogs: int | None = None,
        limit_messages: int | None = None,
    ) -> dict[int, int]:
        """Sync every dialog from its high-watermark; returns
        {chat_id: rows_landed}. Incremental by construction: a second
        call fetches (and lands) nothing new."""
        marks = self.high_watermarks()
        landed: dict[int, int] = {}
        for chat_id, name in self.client.get_dialogs(limit=limit_dialogs):
            if chat_id < 0:
                continue  # service chats (reference :143-145)
            n = self.sync_chat(
                chat_id, name, min_id=marks.get(chat_id, 0), limit=limit_messages
            )
            if n:
                landed[chat_id] = n
        return landed
