"""Corpus sources & sinks — every way documents enter or leave the engine,
normalized to the input_hint shape ``(doc_id, spans)`` (schemas.CORPUS_SCHEMA).

The reference's only source is a local file path per document
(/root/reference/src/java-env.h:17, example/demo1.cpp:44-59) and its only
sink is two files per doc (/root/reference/src/java-env.cpp:310-311).
Here sources are Spark readers (splittable, predicate/column pushdown) and
sinks are atomic table appends:

  * parquet       — primary interchange + checkpoint store format
  * iceberg       — via catalog.py when the runtime has the connector
                    (degrades to parquet dirs with identical semantics)
  * jsonl         — spans serialized as a JSON array per line (interchange
                    with non-Spark tools)
  * text dir      — one doc per file, doc_id = file path (the reference's
                    identity model, for drop-in ingestion of raw corpora)
  * documents tbl — the driver testdata `documents.parquet` lifted into
                    single-text-span corpus rows
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tika_wrap_spark.schemas import CORPUS_SCHEMA, SPAN_STRUCT


def read_corpus_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(CORPUS_SCHEMA).parquet(path)


def write_corpus_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def read_corpus_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(CORPUS_SCHEMA).orc(path)


def write_corpus_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC egress — the second columnar interchange format warehouses
    expect; nested span structs round-trip natively (no extra jars)."""
    df.write.mode(mode).orc(path)


def write_corpus_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """doc per line: {"doc_id": ..., "spans": [{kind,text,media_ref,offset}]}"""
    df.select(F.to_json(F.struct("doc_id", "spans")).alias("value")).write.mode(
        mode
    ).text(path)


def read_corpus_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Parse jsonl lines back to typed corpus rows. from_json is JVM-side;
    malformed lines yield null spans (filterable), never task failures."""
    line_schema = "struct<doc_id: string, spans: array<struct<kind: string, text: string, media_ref: string, offset: int>>>"
    return (
        spark.read.text(path)
        .select(F.from_json("value", line_schema).alias("j"))
        .select(F.col("j.doc_id").alias("doc_id"), F.col("j.spans").alias("spans"))
    )


def read_text_dir(spark: SparkSession, path: str) -> DataFrame:
    """One document per file (the reference's path-identity model): wholetext
    read, doc_id = file path, payload as a single text span at offset 0.
    Small-file corpora at 100 TB should be compacted to parquet first —
    this reader is the ingestion ramp, not the steady state."""
    # NB: the wholetext kwarg must go through .text() itself — pyspark's
    # reader methods reset options from their kwarg defaults
    return (
        spark.read.text(path, wholetext=True)
        .select(
            F.input_file_name().alias("doc_id"),
            F.array(
                F.struct(
                    F.lit("text").alias("kind"),
                    F.col("value").alias("text"),
                    F.lit("").alias("media_ref"),
                    F.lit(0).cast("int").alias("offset"),
                ).cast(SPAN_STRUCT)
            ).alias("spans"),
        )
    )


def corpus_from_documents_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lift the driver testdata ``documents.parquet`` (doc_id, text, ...)
    into corpus rows: one text span per document."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.lpad(F.col("doc_id").cast("string"), 10, "0").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            ).cast(SPAN_STRUCT)
        ).alias("spans"),
    )
