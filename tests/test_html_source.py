"""S3 HTML export scrape: stdlib parser vs the reference's bs4
semantics (parse_telegram_html.py:12-71) — timestamp title attr,
from_name author, text-beats-media elif chain, media href extraction."""

from __future__ import annotations

from terrorblade_spark.sources.telegram_html import (
    extract_messages,
    parse_telegram_html,
)

EXPORT = """<!DOCTYPE html>
<html><head><title>Exported Data</title></head>
<body>
 <div class="page_wrap">
  <div class="message default clearfix" id="message1">
   <div class="body">
    <div class="pull_right date details" title="01.02.2024 10:15:00 UTC+01:00">10:15</div>
    <div class="from_name">Alice</div>
    <div class="text">Hello <b>world</b> &amp; friends</div>
   </div>
  </div>
  <div class="message default clearfix joined" id="message2">
   <div class="body">
    <div class="pull_right date details" title="01.02.2024 10:16:30 UTC+01:00">10:16</div>
    <div class="media_wrap clearfix">
     <a class="photo_wrap clearfix pull_left" href="photos/photo_1.jpg">
      <img class="photo" src="photos/photo_1.jpg"/>
     </a>
    </div>
   </div>
  </div>
  <div class="message default clearfix" id="message3">
   <div class="body">
    <div class="pull_right date details" title="01.02.2024 11:00:00 UTC+01:00">11:00</div>
    <div class="from_name">Bob</div>
    <div class="media_wrap clearfix">
     <a class="media clearfix pull_left media_voice_message" href="voice_messages/audio_1.ogg">
      <div class="body">
       <div class="title bold">Voice message</div>
       <div class="status details">0:07</div>
      </div>
     </a>
    </div>
   </div>
  </div>
  <div class="message default clearfix" id="message4">
   <div class="body">
    <div class="from_name">Carol</div>
    <div class="media_wrap clearfix">
     <a class="sticker_wrap clearfix pull_left" href="stickers/sticker.webp"></a>
    </div>
   </div>
  </div>
  <div class="message default clearfix" id="message5">
   <div class="body">
    <div class="from_name">Dave</div>
   </div>
  </div>
 </div>
</body></html>
"""


def test_extract_messages_semantics():
    rows = extract_messages(EXPORT)
    assert rows == [
        ("01.02.2024 10:15:00 UTC+01:00", "Alice", "text", "Hello world & friends"),
        # joined message: no from_name -> Unknown author (reference does the same)
        ("01.02.2024 10:16:30 UTC+01:00", "Unknown", "photo", "photos/photo_1.jpg"),
        # media anchor's own nested div.body must not open a new message
        ("01.02.2024 11:00:00 UTC+01:00", "Bob", "voice_message", "voice_messages/audio_1.ogg"),
        ("Unknown", "Carol", "sticker", "stickers/sticker.webp"),
        ("Unknown", "Dave", "unknown", "Unknown"),
    ]


def test_text_beats_media_and_priority_chain():
    # reference checks div.text FIRST, then video > photo > voice > audio > sticker
    both = (
        '<div class="body"><div class="media_wrap">'
        '<a class="photo_wrap" href="p.jpg"></a>'
        '<a class="video_file_wrap" href="v.mp4"></a></div>'
        '<div class="text">caption</div></div>'
    )
    assert extract_messages(both) == [("Unknown", "Unknown", "text", "caption")]
    no_text = (
        '<div class="body"><div class="media_wrap">'
        '<a class="photo_wrap" href="p.jpg"></a>'
        '<a class="video_file_wrap" href="v.mp4"></a></div></div>'
    )
    assert extract_messages(no_text) == [("Unknown", "Unknown", "video", "v.mp4")]
    unknown_media = '<div class="body"><div class="media_wrap"><a href="x"></a></div></div>'
    assert extract_messages(unknown_media) == [
        ("Unknown", "Unknown", "media", "Unknown media")
    ]


def test_parse_telegram_html_distributed(spark, tmp_path):
    d = tmp_path / "export"
    d.mkdir()
    (d / "messages.html").write_text(EXPORT, encoding="utf-8")
    (d / "messages2.html").write_text(EXPORT, encoding="utf-8")
    df = parse_telegram_html(spark, str(d))
    assert df.columns == ["ts_raw", "author", "message_type", "text"]
    rows = df.collect()
    assert len(rows) == 10  # 5 messages x 2 files
    assert {r.message_type for r in rows} == {
        "text",
        "photo",
        "voice_message",
        "sticker",
        "unknown",
    }
    alice = [r for r in rows if r.author == "Alice"]
    assert len(alice) == 2 and alice[0].text == "Hello world & friends"
