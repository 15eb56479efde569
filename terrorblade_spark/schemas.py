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
        StructField("location_information.latitude", StringType()),
        StructField("contact_information.first_name", StringType()),
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
