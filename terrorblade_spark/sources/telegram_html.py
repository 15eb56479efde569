"""S3: Telegram HTML export scrape, dependency-free.

The reference walks BeautifulSoup over ``messages*.html``
(``terrorblade/data/loaders/telegram/parse_telegram_html.py:12-71``):
for every ``div.body`` message block it takes the timestamp from the
``title`` attribute of ``div.pull_right.date.details``, the author from
``div.from_name``, and then an elif-chain — a ``div.text`` wins as
``message_type='text'``; otherwise the first matching media anchor
class in priority order video_file_wrap / photo_wrap /
media_voice_message / media_audio_file / sticker_wrap yields its
``href``; otherwise "Unknown media" / "Unknown".

This implementation reproduces those semantics with the stdlib
``html.parser`` (bs4 is not available in this environment and is not
needed), wrapped in an Arrow-batched ``mapInPandas``: Spark's
``binaryFile`` source distributes the files, each executor batch
parses locally, and only the narrow (ts_raw, author, message_type,
text) rows shuffle. At cluster scale the parse parallelizes per file
— the natural unit, since Telegram splits exports into
``messages2.html``, ``messages3.html``, ... chunks.
"""

from __future__ import annotations

from html.parser import HTMLParser

from pyspark.sql import DataFrame, SparkSession

# media anchor class -> message_type, in the reference's elif priority
_MEDIA_PRIORITY = [
    ("video_file_wrap", "video"),
    ("photo_wrap", "photo"),
    ("media_voice_message", "voice_message"),
    ("media_audio_file", "audio"),
    ("sticker_wrap", "sticker"),
]


class _TelegramHTMLExtractor(HTMLParser):
    """Streaming extractor for Telegram export message blocks.

    Tracks an open-div depth counter; a ``div.body`` opens a message
    scope, and the scope finalizes when its div closes. Inside a scope,
    ``div.from_name`` / ``div.text`` start text capture until their
    own end tag; media anchors record (class, href) candidates.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.rows: list[tuple[str | None, str, str, str]] = []
        self._div_depth = 0
        self._msg_depth: int | None = None
        self._capture_target: str | None = None
        self._capture_depth = 0
        self._buf: list[str] = []
        self._ts: str | None = None
        self._author: str | None = None
        self._text: str | None = None
        self._media: dict[str, str] = {}
        self._saw_media_wrap = False
        self._media_wrap_depth: int | None = None

    @staticmethod
    def _classes(attrs: list[tuple[str, str | None]]) -> set[str]:
        for k, v in attrs:
            if k == "class" and v:
                return set(v.split())
        return set()

    @staticmethod
    def _attr(attrs: list[tuple[str, str | None]], name: str) -> str | None:
        for k, v in attrs:
            if k == name:
                return v
        return None

    def _reset_message(self) -> None:
        self._ts = self._author = self._text = None
        self._media = {}
        self._saw_media_wrap = False
        self._media_wrap_depth = None

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if self._capture_target is not None:
            # nested tags inside a captured div contribute only their text
            if tag == "div":
                self._capture_depth += 1
                self._div_depth += 1
            return
        if tag == "div":
            self._div_depth += 1
            cls = self._classes(attrs)
            if "body" in cls and self._msg_depth is None:
                self._msg_depth = self._div_depth
                self._reset_message()
            elif self._msg_depth is not None:
                if {"pull_right", "date", "details"} <= cls and self._ts is None:
                    self._ts = self._attr(attrs, "title")
                elif "from_name" in cls and self._author is None:
                    self._start_capture("author")
                elif "text" in cls and self._text is None:
                    self._start_capture("text")
                elif "media_wrap" in cls:
                    self._saw_media_wrap = True
                    self._media_wrap_depth = self._div_depth
        elif tag == "a" and self._media_wrap_depth is not None:
            # the reference only searches anchors nested under
            # div.media_wrap (parse_telegram_html.py media lookup) — an
            # anchor with a media class elsewhere in the message must
            # not change message_type/text
            cls = self._classes(attrs)
            for media_cls, _ in _MEDIA_PRIORITY:
                if media_cls in cls and media_cls not in self._media:
                    self._media[media_cls] = self._attr(attrs, "href") or ""

    def _start_capture(self, target: str) -> None:
        self._capture_target = target
        self._capture_depth = 0
        self._buf = []

    def handle_endtag(self, tag: str) -> None:
        if tag != "div":
            return
        if self._capture_target is not None:
            if self._capture_depth == 0:
                value = "".join(self._buf).strip()
                if self._capture_target == "author":
                    self._author = value
                else:
                    self._text = value
                self._capture_target = None
                self._div_depth -= 1  # the capturing div itself closes here
            else:
                self._capture_depth -= 1
                self._div_depth -= 1
            return
        if self._media_wrap_depth is not None and self._div_depth == self._media_wrap_depth:
            self._media_wrap_depth = None  # leaving the media_wrap subtree
        if self._msg_depth is not None and self._div_depth == self._msg_depth:
            self._finalize()
            self._msg_depth = None
        self._div_depth = max(0, self._div_depth - 1)

    def handle_data(self, data: str) -> None:
        if self._capture_target is not None:
            self._buf.append(data)

    def _finalize(self) -> None:
        ts = self._ts if self._ts is not None else "Unknown"
        author = self._author if self._author else "Unknown"
        if self._text is not None:
            message_type, text = "text", self._text
        elif self._saw_media_wrap:
            for media_cls, mtype in _MEDIA_PRIORITY:
                if media_cls in self._media:
                    message_type, text = mtype, self._media[media_cls]
                    break
            else:
                message_type, text = "media", "Unknown media"
        else:
            message_type, text = "unknown", "Unknown"
        self.rows.append((ts, author, message_type, text))


def extract_messages(html: str) -> list[tuple[str | None, str, str, str]]:
    """Parse one export file's HTML into (ts_raw, author, message_type,
    text) tuples — the driver-side twin used by tests and oracles."""
    p = _TelegramHTMLExtractor()
    p.feed(html)
    p.close()
    return p.rows


def parse_telegram_html(spark: SparkSession, path: str) -> DataFrame:
    """S3 HTML export scrape as a distributed plan: ``binaryFile``
    scan -> mapInPandas(stdlib parse) -> narrow rows. Reference:
    ``parse_telegram_html.py:12-71`` (see module docstring)."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                rows.extend(extract_messages(bytes(content).decode("utf-8", "replace")))
            yield pd.DataFrame(
                rows, columns=["ts_raw", "author", "message_type", "text"]
            )

    return files.select("content").mapInPandas(
        parse, "ts_raw string, author string, message_type string, text string"
    )
