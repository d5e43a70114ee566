"""Explicit StructType schemas for every table (SURVEY.md §1.3:
columnar at rest, schema-on-write, declared in one place)."""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Binding input shape (BASELINE.json:L15)
WEB_PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ]
)

SENTENCES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("sent_id", IntegerType(), False),
        StructField("sentence", StringType(), False),
    ]
)

TRIPLES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("sent_id", IntegerType(), False),
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
        StructField("conf", DoubleType(), False),
    ]
)

MENTIONS = StructType(
    [
        StructField("url", StringType(), False),
        StructField("sent_id", IntegerType(), False),
        StructField("mention", StringType(), False),
        StructField("start", IntegerType(), False),
        StructField("end", IntegerType(), False),
    ]
)

ENTITY_DICTIONARY = StructType(
    [
        StructField("alias_norm", StringType(), False),
        StructField("entity_id", LongType(), False),
        StructField("canonical_name", StringType(), False),
        StructField("prior", DoubleType(), False),
    ]
)

LINKED_MENTIONS = StructType(
    [
        StructField("url", StringType(), False),
        StructField("sent_id", IntegerType(), False),
        StructField("mention", StringType(), False),
        StructField("entity_id", LongType(), True),  # null = NIL entity
        StructField("score", DoubleType(), True),
    ]
)

ENTITIES = StructType(
    [
        StructField("canonical_id", LongType(), False),
        StructField("surface_forms", ArrayType(StringType()), False),
    ]
)

EDGES = StructType(
    [
        StructField("src_id", LongType(), False),
        StructField("dst_id", LongType(), False),
        StructField("pred", StringType(), False),
        StructField("weight", LongType(), False),
    ]
)

LINEAGE = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("stage", StringType(), False),
        StructField("part_key", IntegerType(), False),
        StructField("n_rows", LongType(), False),
        StructField("wall_ms", LongType(), False),
    ]
)

METRICS = StructType(
    [
        StructField("metric", StringType(), False),
        StructField("value", DoubleType(), False),
        StructField("stage", StringType(), False),
        StructField("run_id", StringType(), False),
    ]
)
