"""Telegram JSON export source tests (SURVEY §2.1 S1, §2.2 P1–P5)
against the synthetic fixture tests/data/export.json — mirrors the
reference's own export-structure tests (tests/test_preprocessors.py:
310-415: entity flatten, service filter, timestamp parse, from_id
normalize, min-message gate).
"""

from __future__ import annotations

import os

import pytest

from terrorblade_spark.schemas import PROCESS
from terrorblade_spark.sources.telegram_json import load_telegram_export

FIXTURE = os.path.join(os.path.dirname(__file__), "data", "export.json")


@pytest.fixture(scope="module")
def export_df(spark):
    df = load_telegram_export(spark, FIXTURE, min_messages=3)
    df.cache()
    yield df
    df.unpersist()


def test_schema_matches_process(export_df):
    assert export_df.schema == PROCESS


def test_min_messages_gate(export_df):
    # chat 7003 has 2 real messages (+1 service) = 3 raw -> passes raw gate;
    # the fixture's chat sizes are 12/8/3/2 messages + 1 service each
    chats = {r["chat_id"] for r in export_df.select("chat_id").distinct().collect()}
    assert 7000 in chats and 7001 in chats
    # all surviving chats had >= 3 raw messages
    assert chats <= {7000, 7001, 7002, 7003}


def test_service_messages_dropped(export_df):
    # fixture puts one service message per chat at id % 1000 == 900
    ids = [r["message_id"] for r in export_df.collect()]
    assert not any(i % 1000 == 900 for i in ids)


def test_entities_flattened(export_df):
    # messages with i%5==1 carry text_entities ("see https://...")
    row = export_df.where("message_id = 1").first()
    assert row["text"] == "see https://spark.apache.org"


def test_media_markers(export_df):
    photo = export_df.where("message_id = 2").first()
    assert photo["text"] == "[photo](photos/photo_2.jpg)"
    voice = export_df.where("message_id = 3").first()
    assert voice["text"] == "[voice_message](voice/3.ogg)"


def test_from_id_normalized(export_df):
    vals = {r["from_id"] for r in export_df.select("from_id").distinct().collect()}
    assert vals <= {100, 101, 102}  # "user100" -> 100


def test_timestamps_parsed(export_df):
    row = export_df.where("message_id = 0").first()
    assert row["date"] is not None and row["date"].year == 2024


def test_no_blank_text(export_df):
    assert export_df.where("text IS NULL OR length(trim(text)) = 0").count() == 0


def test_load_table_pins_caller_session_for_events(spark, sf_dir):
    # the correctness harness passes ITS OWN session: the nanos read
    # conf and the UTC timezone must both be forced on it, or every
    # ts-derived value shifts relative to the oracle's naive timestamps
    from terrorblade_spark.tables import load_table

    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        load_table(spark, sf_dir, "events")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


@pytest.mark.parametrize("physical", ["int64_nanos", "us_ntz", "us_utc"])
def test_events_ts_robust_to_parquet_physical_type(spark, tmp_path, physical):
    """The events fixture has shipped ts three different ways across
    driver rounds (TIMESTAMP(NANOS), naive timestamp[us] -> NTZ,
    UTC-adjusted timestamp[us]). load_table and stream_events must yield
    TimestampType with identical values for ALL of them — this is the
    regression gate for the round-2 NTZ outage."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import TimestampType

    from terrorblade_spark.streaming.pipeline import stream_events
    from terrorblade_spark.tables import load_table

    micros = [1_700_000_000_000_000 + i * 61_000_000 for i in range(5)]
    if physical == "int64_nanos":
        ts_arr = pa.array([m * 1000 for m in micros], pa.timestamp("ns"))
    elif physical == "us_ntz":
        ts_arr = pa.array(micros, pa.timestamp("us"))
    else:
        ts_arr = pa.array(micros, pa.timestamp("us", tz="UTC"))
    table = pa.table(
        {
            "event_id": pa.array(range(5), pa.int64()),
            "ts": ts_arr,
            "user_id": pa.array([1] * 5, pa.int64()),
            "event_type": pa.array(["view"] * 5),
            "value": pa.array([1.0] * 5),
            "props": pa.array(["{}"] * 5),
        }
    )
    sf_dir = str(tmp_path / physical)
    os.makedirs(sf_dir)
    pq.write_table(table, os.path.join(sf_dir, "events.parquet"))

    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    from pyspark.sql import functions as F

    got = [r[0] for r in df.select(F.unix_millis("ts")).orderBy("event_id").collect()]
    assert got == [m // 1000 for m in micros]

    sdf = stream_events(spark, sf_dir)
    assert isinstance(sdf.schema["ts"].dataType, TimestampType)
    # withWatermark is the call that rejected NTZ in round 2
    sdf.withWatermark("ts", "1 hour")


@pytest.mark.parametrize(
    "drift",
    ["value_float32", "ints_widened", "ints_narrowed", "reordered", "extra_column"],
)
def test_fixture_schema_drift_matrix(spark, tmp_path, drift):
    """Generalized drift guard (the round-2 lesson beyond ts): whatever
    physical shape a regenerated events fixture ships — float32 value,
    widened/narrowed ints, reordered columns, stray extra columns —
    load_table must return the DECLARED schema with identical values."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from terrorblade_spark.schemas import FIXTURE_TABLES
    from terrorblade_spark.tables import load_table

    micros = [1_700_000_000_000_000 + i * 61_000_000 for i in range(5)]
    cols = {
        "event_id": pa.array(range(5), pa.int64()),
        "ts": pa.array(micros, pa.timestamp("us", tz="UTC")),
        "user_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "event_type": pa.array(["view"] * 5),
        "value": pa.array([1.5, 2.5, 3.5, 4.5, 5.5], pa.float64()),
        "props": pa.array(["{}"] * 5),
    }
    if drift == "value_float32":
        cols["value"] = pa.array([1.5, 2.5, 3.5, 4.5, 5.5], pa.float32())
    elif drift == "ints_widened":
        # int32 where the declared type is long
        cols["event_id"] = pa.array(range(5), pa.int32())
        cols["user_id"] = pa.array([1, 2, 3, 4, 5], pa.int32())
    elif drift == "ints_narrowed":
        # value column shipped as integer cents-style long
        cols["value"] = pa.array([1, 2, 3, 4, 5], pa.int64())
    elif drift == "reordered":
        cols = {k: cols[k] for k in ["props", "value", "user_id", "ts", "event_type", "event_id"]}
    elif drift == "extra_column":
        cols["__debug"] = pa.array(["x"] * 5)

    sf_dir = str(tmp_path / drift)
    os.makedirs(sf_dir)
    pq.write_table(pa.table(cols), os.path.join(sf_dir, "events.parquet"))

    df = load_table(spark, sf_dir, "events")
    # schema is EXACTLY the declared one: names, types, order
    declared = FIXTURE_TABLES["events"]
    assert [(f.name, f.dataType) for f in df.schema.fields] == [
        (f.name, f.dataType) for f in declared.fields
    ]
    rows = df.orderBy("event_id").collect()
    assert [r["user_id"] for r in rows] == [1, 2, 3, 4, 5]
    expected_vals = (
        [1.0, 2.0, 3.0, 4.0, 5.0] if drift == "ints_narrowed"
        else [1.5, 2.5, 3.5, 4.5, 5.5]
    )
    assert [r["value"] for r in rows] == expected_vals
