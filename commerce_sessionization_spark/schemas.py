"""Explicit schema constants — never inferred.

The reference fixes schemas as Scala case classes rendered to StructType via
``Encoders.product[T].schema`` and passes them to every read
(``BehaviorSchema.scala:3-14``, ``SessionSchema.scala:3-15``,
``SessionizationBuiltIn.scala:42,47``). PySpark has no product encoder, so
the idiomatic equivalent is StructType constants in one module.

Column order matters: the reference's tests assert ``session_id`` is column
ordinal 8 (``SessionizationBuiltInTest.scala:124-128``).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Raw clickstream event table (reference ``BehaviorSchema.scala:3-14``).
#: ``event_time`` stays a *string* ("yyyy-MM-dd HH:mm:ss 'UTC'"); it is
#: parsed to timestamp only transiently inside operators.
BEHAVIOR_SCHEMA = StructType(
    [
        StructField("event_time", StringType()),
        StructField("event_type", StringType()),
        StructField("product_id", LongType()),
        StructField("category_id", LongType()),
        StructField("category_code", StringType()),
        StructField("brand", StringType()),
        StructField("price", DoubleType()),
        StructField("user_id", LongType()),
        StructField("event_date", StringType()),  # partition column, yyyy-MM-dd
        StructField("event_hour", StringType()),  # partition column, HH
    ]
)

#: Sessionized output table (reference ``SessionSchema.scala:3-15``):
#: BEHAVIOR_SCHEMA + ``session_id`` inserted between user_id and event_date.
SESSION_SCHEMA = StructType(
    BEHAVIOR_SCHEMA.fields[:8]
    + [StructField("session_id", StringType())]
    + BEHAVIOR_SCHEMA.fields[8:]
)

#: Generic event-stream table (driver testdata ``events.parquet``).
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

#: Text corpus table for dedup / text analysis (testdata ``documents.parquet``).
DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

#: Embedding table for similarity search (testdata ``embeddings.parquet``).
EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

#: Multimodal asset table: media payloads ride as opaque binary with typed
#: metadata; decode/feature-extract happens in Arrow-batched pandas UDFs
#: (see ``operators.multimodal``).
MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("mime_type", StringType()),
        StructField("metadata", MapType(StringType(), StringType())),
    ]
)

#: TPC-H-ish testdata schemas (driver-generated; TESTDATA.md).
TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)

#: All testdata tables, with the columns stored as TIMESTAMP(NANOS) in
#: parquet that must be converted from long nanoseconds on read.
TESTDATA_NANO_TS_COLUMNS: dict[str, list[str]] = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}

ALL_TESTDATA_TABLES = TPCH_TABLES + ("events", "documents", "embeddings")
