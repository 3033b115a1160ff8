"""Fixed StructType schemas (SURVEY.md §1.2) — declared up front, versus the
reference's schemaless ctx.txt/meta.txt file contract."""

from __future__ import annotations

from pyspark.sql import types as T

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

# input_hint shape: the raw corpus table.
CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT), True),
    ]
)

# Extraction output (FIXTURES.md §2): ordered spans + status + flat metadata.
EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT), False),
        T.StructField("parse_ok", T.BooleanType(), False),
        T.StructField("error", T.StringType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), False),
    ]
)

# Extraction output + the stable checkpoint partition key (lineage join key).
EXTRACTED_PART_SCHEMA = T.StructType(
    EXTRACTED_SCHEMA.fields + [T.StructField("part_key", T.IntegerType(), False)]
)

# FIXTURES.md §4: per-partition lineage / checkpoint metrics.
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("part_key", T.IntegerType(), False),
        T.StructField("input_snapshot_id", T.StringType(), False),
        T.StructField("doc_count", T.LongType(), False),
        T.StructField("span_count", T.LongType(), False),
        T.StructField("error_count", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
    ]
)
