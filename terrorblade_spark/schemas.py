"""Declared schemas — the single source of truth (SURVEY §1).

Mirrors the reference's TELEGRAM_SCHEMA / telegram_import_schema
(dtypes.py:16-62, :274-324) as Spark StructTypes. Import is
schema-on-read with explicit casts, never inference; missing columns
are added as typed nulls (standardize()).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EMBEDDING_DIM = 768

# central message schema (reference dtypes.py:16-62)
MESSAGES = StructType(
    [
        StructField("message_id", LongType()),
        StructField("date", TimestampType()),
        StructField("from_id", LongType()),
        StructField("text", StringType()),
        StructField("chat_id", LongType()),
        StructField("reply_to_message_id", LongType()),
        StructField("media_type", IntegerType()),
        StructField("forwarded_from_id", IntegerType()),
    ]
)

# processing-time variant: names kept as raw strings pre-normalization
# (reference get_process_schema, dtypes.py:199-233)
PROCESS = StructType(
    list(MESSAGES.fields)
    + [
        StructField("chat_name", StringType()),
        StructField("from_name", StringType()),
        StructField("forwarded_from", StringType()),
        StructField("file_name", StringType()),
        StructField("chat_type", StringType()),
    ]
)

# embeddings side table (reference TelegramPreprocessor.py:164-173);
# the 768 length is a pipeline invariant enforced by validate_embeddings,
# not by the type (SURVEY §1.2)
EMBEDDINGS = StructType(
    [
        StructField("message_id", LongType()),
        StructField("chat_id", LongType()),
        StructField("embeddings", ArrayType(FloatType(), containsNull=False)),
    ]
)

CLUSTERS = StructType(
    [
        StructField("message_id", LongType()),
        StructField("chat_id", LongType()),
        StructField("group_id", LongType()),
    ]
)

# raw Telegram desktop-export JSON message shape (subset we consume;
# reference telegram_import_schema, dtypes.py:274-324). text_entities
# is the list-of-structs form of rich text.
EXPORT_MESSAGE = StructType(
    [
        StructField("id", LongType()),
        StructField("type", StringType()),
        StructField("date", StringType()),
        StructField("from", StringType()),
        StructField("from_id", StringType()),
        StructField("text", StringType()),
        StructField(
            "text_entities",
            ArrayType(
                StructType(
                    [
                        StructField("type", StringType()),
                        StructField("text", StringType()),
                    ]
                )
            ),
        ),
        StructField("reply_to_message_id", LongType()),
        StructField("forwarded_from", StringType()),
        StructField("photo", StringType()),
        StructField("file", StringType()),
        StructField("file_name", StringType()),
        StructField("media_type", StringType()),
        StructField("mime_type", StringType()),
        StructField(
            "location_information",
            StructType(
                [
                    StructField("latitude", StringType()),
                    StructField("longitude", StringType()),
                ]
            ),
        ),
        StructField(
            "contact_information",
            StructType(
                [
                    StructField("first_name", StringType()),
                    StructField("last_name", StringType()),
                    StructField("phone_number", StringType()),
                ]
            ),
        ),
        StructField("members", ArrayType(StringType())),
    ]
)

# full export file: {name?, chats: {list: [{name, type, id, messages: [...]}]}}
EXPORT_FILE = StructType(
    [
        StructField("name", StringType()),
        StructField(
            "chats",
            StructType(
                [
                    StructField(
                        "list",
                        ArrayType(
                            StructType(
                                [
                                    StructField("name", StringType()),
                                    StructField("type", StringType()),
                                    StructField("id", LongType()),
                                    StructField("messages", ArrayType(EXPORT_MESSAGE)),
                                ]
                            )
                        ),
                    )
                ]
            ),
        ),
    ]
)


# --- declared schemas for the driver's test fixture tables ------------------
# (TESTDATA.md). These are the canonical logical types every query is
# written against. load_table standardizes each read to them, so a
# regenerated fixture that drifts physically (float32<->double, widened
# or narrowed ints, column reorder) can never silently change query
# semantics again — round 2 died to exactly such a drift (events.ts
# NANOS->NTZ), and normalize_ts guarded only that one column.


def _struct(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t) for n, t in fields])


def _d():
    from pyspark.sql.types import DoubleType

    return DoubleType()


FIXTURE_TABLES: dict[str, StructType] = {
    "region": _struct(("r_regionkey", IntegerType()), ("r_name", StringType())),
    "nation": _struct(
        ("n_nationkey", IntegerType()), ("n_name", StringType()),
        ("n_regionkey", IntegerType()),
    ),
    "customer": _struct(
        ("c_custkey", LongType()), ("c_name", StringType()),
        ("c_nationkey", IntegerType()), ("c_acctbal", _d()),
        ("c_mktsegment", StringType()),
    ),
    "supplier": _struct(
        ("s_suppkey", LongType()), ("s_name", StringType()),
        ("s_nationkey", IntegerType()), ("s_acctbal", _d()),
    ),
    "part": _struct(
        ("p_partkey", LongType()), ("p_name", StringType()),
        ("p_brand", StringType()), ("p_type", StringType()),
        ("p_size", IntegerType()), ("p_retailprice", _d()),
    ),
    "orders": _struct(
        ("o_orderkey", LongType()), ("o_custkey", LongType()),
        ("o_orderstatus", StringType()), ("o_totalprice", _d()),
        ("o_orderdate", TimestampType()), ("o_orderpriority", StringType()),
    ),
    "lineitem": _struct(
        ("l_orderkey", LongType()), ("l_partkey", LongType()),
        ("l_suppkey", LongType()), ("l_linenumber", IntegerType()),
        ("l_quantity", _d()), ("l_extendedprice", _d()),
        ("l_discount", _d()), ("l_tax", _d()),
        ("l_returnflag", StringType()), ("l_linestatus", StringType()),
        ("l_shipdate", TimestampType()),
    ),
    "events": _struct(
        ("event_id", LongType()), ("ts", TimestampType()),
        ("user_id", LongType()), ("event_type", StringType()),
        ("value", _d()), ("props", StringType()),
    ),
    "documents": _struct(
        ("doc_id", LongType()), ("text", StringType()),
        ("lang", StringType()), ("source", StringType()),
        ("n_chars", LongType()),
    ),
    "embeddings": _struct(
        ("vec_id", LongType()),
        ("embedding", ArrayType(FloatType())),
        ("label", IntegerType()),
    ),
}


def standardize(df: DataFrame, schema: StructType) -> DataFrame:
    """P1: add missing columns as typed nulls + cast all to the target
    schema, in schema order (reference TelegramPreprocessor.py:625-651).
    """
    cols: list[Column] = []
    for field in schema.fields:
        if field.name in df.columns:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def validate_embeddings(df: DataFrame, col: str = "embeddings", dim: int = EMBEDDING_DIM) -> DataFrame:
    """Enforce the fixed-dimension invariant (SURVEY §7 'genuinely
    hard' (d)): raise rows with wrong-length vectors to an error column
    the caller can assert empty, without a driver-side collect."""
    return df.withColumn(
        "__bad_dim", F.size(F.col(col)) != F.lit(dim)
    )
