"""End-to-end extraction pipeline: scan -> salt -> fused extract ->
checkpointed append + per-partition lineage -> resumable, idempotent output.

north_rule semantics:
  * partitioning/shuffle/skew explicit (operators.skew)
  * resumable from checkpoint: lineage rows mark completed ``part_key``s;
    a rerun anti-joins them away and only processes the remainder
  * per-partition lineage: (part_key, input_snapshot_id, doc_count,
    span_count, error_count, wall_ms)
  * idempotent: final read dedups on doc_id, so a partition that was written
    but not yet lineage-committed (killed mid-run) reprocesses harmlessly

Layout under ``out_dir`` (parquet degradation path; Iceberg swaps in via
catalog.py with identical semantics):
    extracted/part_key=<k>/*.parquet     extraction output
    _lineage/*.parquet                   lineage/checkpoint table
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tika_wrap_spark import catalog
from tika_wrap_spark.operators.extract_ops import extract_spans
from tika_wrap_spark.operators.skew import salt_repartition, with_part_key
from tika_wrap_spark.schemas import EXTRACTED_PART_SCHEMA, LINEAGE_SCHEMA


def _lineage_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def _extracted_path(out_dir: str) -> str:
    return os.path.join(out_dir, "extracted")


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    path = _lineage_path(out_dir)
    try:
        return spark.read.parquet(path)
    except Exception:
        return spark.createDataFrame([], LINEAGE_SCHEMA)


def _read_extracted_raw(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read the raw extracted store; empty-with-schema when nothing was ever
    written (a zero-row append creates no parquet files)."""
    try:
        return spark.read.parquet(_extracted_path(out_dir))
    except Exception:
        return spark.createDataFrame([], EXTRACTED_PART_SCHEMA)


def run_extraction(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    parts: int = 64,
    num_partitions: int | None = None,
    part_filter: list[int] | None = None,
) -> dict:
    """One (possibly resumed) extraction run. Returns run metrics.

    ``part_filter`` restricts the run to a subset of part_keys — used by
    tests to simulate a mid-run kill (process some partitions, 'die', rerun).
    """
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism * 2
    t0 = time.monotonic()

    keyed = with_part_key(corpus, parts)
    done = read_lineage(spark, out_dir).select("part_key").distinct()
    todo = keyed.join(F.broadcast(done), "part_key", "left_anti")
    if part_filter is not None:
        todo = todo.filter(F.col("part_key").isin(part_filter))

    snapshot = catalog.input_snapshot_id(corpus)
    extracted = extract_spans(salt_repartition(todo, num_partitions))
    catalog.append_table(extracted, _extracted_path(out_dir), partition_by=["part_key"])

    # lineage committed AFTER the data append: a kill between the two leaves
    # an uncommitted partition that simply reprocesses next run (dedup on read)
    wall_ms = int((time.monotonic() - t0) * 1000)
    lineage = (
        _read_extracted_raw(spark, out_dir)
        .join(F.broadcast(done), "part_key", "left_anti")
        .groupBy("part_key")
        .agg(
            F.count("*").alias("doc_count"),
            F.sum(F.size("spans")).alias("span_count"),
            F.sum((~F.col("parse_ok")).cast("long")).alias("error_count"),
        )
        .withColumn("input_snapshot_id", F.lit(snapshot))
        .withColumn("wall_ms", F.lit(wall_ms))  # wall of the run that committed it
        .select(
            "part_key", "input_snapshot_id", "doc_count", "span_count",
            "error_count", "wall_ms",
        )
    )
    if part_filter is not None:
        lineage = lineage.filter(F.col("part_key").isin(part_filter))
    catalog.append_table(lineage, _lineage_path(out_dir))

    committed = read_lineage(spark, out_dir)
    return {
        "snapshot": snapshot,
        "wall_ms": wall_ms,
        "parts_done": committed.select("part_key").distinct().count(),
        "parts_total": parts,
    }


def read_extracted(spark: SparkSession, out_dir: str) -> DataFrame:
    """Final consistent view: only lineage-committed partitions, one row per
    doc (idempotent under kill/rerun)."""
    done = read_lineage(spark, out_dir).select("part_key").distinct()
    df = _read_extracted_raw(spark, out_dir)
    deduped = (
        df.join(F.broadcast(done), "part_key", "left_semi")
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.col("part_key"))
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return deduped


def extract_in_memory(spark: SparkSession, corpus: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Checkpoint-free variant (benchmarks, driver entry): salt -> extract."""
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism * 2
    return extract_spans(salt_repartition(corpus, num_partitions))
