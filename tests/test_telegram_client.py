"""Live-collector twin (sources/telegram_client.py): high-watermark
resume, exactly-once landing, and export-loader-parity normalization —
driven by a deterministic fake ChatClient (telethon stays optional)."""

from __future__ import annotations

from datetime import datetime

import pytest

from terrorblade_spark.sources.telegram_client import (
    TelegramCollector,
    normalize_live_batch,
    telethon_chat_client,
)
from terrorblade_spark.txn import TxnTable


def _msg(mid, text=None, from_id=7, service=False, media=None, fname=None):
    return {
        "message_id": mid,
        "date": datetime(2024, 1, 1, 12, 0, mid % 60),
        "from_id": from_id,
        "text": text,
        "reply_to_message_id": None,
        "media_type": media,
        "file_name": fname,
        "forwarded_from": None,
        "is_service": service,
    }


class FakeClient:
    """In-memory chat log + a fetch counter so tests can assert the
    incremental path really skips already-landed messages."""

    def __init__(self, chats):
        self.chats = chats  # {chat_id: (name, [msg dict ...])}
        self.fetched = []   # (chat_id, min_id) call log

    def get_dialogs(self, limit=None):
        items = [(cid, name) for cid, (name, _) in sorted(self.chats.items())]
        return items[:limit] if limit else items

    def iter_messages(self, chat_id, min_id=0, limit=None):
        self.fetched.append((chat_id, min_id))
        msgs = [m for m in self.chats[chat_id][1] if m["message_id"] > min_id]
        return msgs[:limit] if limit else msgs

    def get_sender_name(self, from_id):
        return {7: "Alice Doe", 8: "Bob"}.get(from_id)


def test_normalize_live_batch_matches_export_semantics(spark):
    rows = [
        _msg(1, "hello"),
        _msg(2, "   ", media="Photo", fname="p.jpg"),  # blank text -> media marker
        _msg(3, None, media="Voice"),                  # media only, no file
        _msg(4, "svc", service=True),                  # P2: dropped
        _msg(5, None),                                 # no text, no media: dropped
        _msg(6, "anon", from_id=None),                 # from_name falls back to chat
    ]
    out = normalize_live_batch(spark, rows, 42, "mychat", {7: "Alice Doe"})
    got = {r["message_id"]: r for r in out.collect()}
    assert sorted(got) == [1, 2, 3, 6]
    assert got[1]["text"] == "hello" and got[1]["from_name"] == "Alice Doe"
    assert got[2]["text"] == "[Photo](p.jpg)"
    assert got[3]["text"] == "[Voice]"
    assert got[6]["from_name"] == "mychat"
    assert all(r["chat_id"] == 42 and r["chat_name"] == "mychat" for r in got.values())
    # PROCESS-standardized: same schema as the export loader's output
    from terrorblade_spark.schemas import PROCESS

    assert out.schema.fieldNames() == PROCESS.fieldNames()


def test_sync_all_resumes_from_high_watermark(spark, tmp_path):
    chats = {
        1: ("alpha", [_msg(1, "a"), _msg(2, "b")]),
        2: ("beta", [_msg(10, "x", from_id=8)]),
        -99: ("svc", [_msg(1, "ignored")]),  # negative id: service chat, skipped
    }
    client = FakeClient(chats)
    t = TxnTable(str(tmp_path / "messages"))
    c = TelegramCollector(spark, client, t)

    assert c.sync_all() == {1: 2, 2: 1}
    assert t.read(spark).count() == 3
    assert all(cid >= 0 for cid, _ in client.fetched)

    # second sync: watermark fetch only, nothing new lands
    assert c.sync_all() == {}
    assert (1, 2) in client.fetched and (2, 10) in client.fetched
    assert t.read(spark).count() == 3

    # new message arrives -> only it is fetched and landed
    chats[1][1].append(_msg(3, "c"))
    assert c.sync_all() == {1: 1}
    got = sorted(
        (r["chat_id"], r["message_id"]) for r in t.read(spark).collect()
    )
    assert got == [(1, 1), (1, 2), (1, 3), (2, 10)]


def test_replayed_fetch_lands_exactly_once(spark, tmp_path):
    """Crash-replay: the same batch landed twice (watermark not yet
    re-read) must not duplicate — merge_upsert is insert-or-ignore on
    the message PK, the reference's INSERT OR IGNORE twin."""
    client = FakeClient({1: ("alpha", [_msg(1, "a"), _msg(2, "b")])})
    t = TxnTable(str(tmp_path / "messages"))
    c = TelegramCollector(spark, client, t)
    c.sync_chat(1, "alpha", min_id=0)
    c.sync_chat(1, "alpha", min_id=0)  # replay of the same fetch
    assert t.read(spark).count() == 2


def test_telethon_gate_raises_without_library():
    with pytest.raises(NotImplementedError, match="ChatClient"):
        telethon_chat_client()
