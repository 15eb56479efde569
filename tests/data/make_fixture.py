"""Generate the synthetic Telegram-export fixture (export.json).

Original synthetic data — structure follows the public Telegram
desktop-export format; content is generated here (seed 7).
Run: python tests/data/make_fixture.py
"""

from __future__ import annotations

import json
import random
from datetime import datetime, timedelta
from pathlib import Path

WORDS = (
    "spark catalyst shuffle partition broadcast window session cluster "
    "vector hash join scan filter aggregate stream batch schema column"
).split()


def main() -> None:
    rnd = random.Random(7)
    chats = []
    for chat_idx in range(4):
        n_msgs = [12, 8, 3, 2][chat_idx]  # last chat is below min_messages=3? no: 2 < 3
        t = datetime(2024, 3, 1, 9, 0, 0)
        messages = []
        for i in range(n_msgs):
            t += timedelta(minutes=rnd.randrange(1, 400))
            mid = chat_idx * 1000 + i
            msg: dict = {
                "id": mid,
                "type": "message",
                "date": t.strftime("%Y-%m-%dT%H:%M:%S"),
                "from": f"User {chat_idx}_{i % 3}",
                "from_id": f"user{100 + i % 3}",
                "text": " ".join(rnd.choices(WORDS, k=rnd.randrange(2, 9))),
            }
            if i % 5 == 1:
                # rich-text form: text_entities instead of plain text
                msg["text"] = ""
                msg["text_entities"] = [
                    {"type": "plain", "text": "see "},
                    {"type": "link", "text": "https://spark.apache.org"},
                ]
            if i % 7 == 2:
                msg["text"] = ""
                msg["photo"] = f"photos/photo_{mid}.jpg"
            if i % 7 == 3:
                msg["text"] = ""
                msg["media_type"] = "voice_message"
                msg["file"] = f"voice/{mid}.ogg"
            if i % 6 == 4:
                msg["reply_to_message_id"] = mid - 1
            if i % 8 == 5:
                msg["forwarded_from"] = "Channel X"
            if i == 6:
                # modern export shape: file_name, no legacy "file" key
                msg["text"] = ""
                msg["media_type"] = "document"
                msg["file_name"] = f"doc_{mid}.pdf"
            if i == 7:
                # records without a type key are plain messages
                del msg["type"]
            if i == 8:
                # plain text AND entities present: entities win (the
                # array-text stringification guard depends on it)
                msg["text"] = "plain-loses"
                msg["text_entities"] = [
                    {"type": "plain", "text": "entities win "},
                    {"type": "bold", "text": "here"},
                ]
            messages.append(msg)
        # one service message per chat (must be filtered out)
        messages.append(
            {
                "id": chat_idx * 1000 + 900,
                "type": "service",
                "date": t.strftime("%Y-%m-%dT%H:%M:%S"),
                "text": "",
            }
        )
        chats.append(
            {
                "name": f"Chat {chat_idx}",
                "type": "personal_chat" if chat_idx % 2 == 0 else "private_group",
                "id": 7000 + chat_idx,
                "messages": messages,
            }
        )
    export = {"name": "fixture", "chats": {"list": chats}}
    out = Path(__file__).parent / "export.json"
    out.write_text(json.dumps(export, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
