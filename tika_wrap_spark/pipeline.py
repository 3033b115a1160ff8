"""End-to-end extraction pipeline: scan -> salt -> fused extract ->
checkpointed append + per-partition lineage -> resumable, idempotent output.

north_rule semantics:
  * partitioning/shuffle/skew explicit (operators.skew)
  * resumable from checkpoint: lineage rows mark completed ``part_key``s;
    a rerun anti-joins them away and only processes the remainder
  * per-partition lineage: (part_key, input_snapshot_id, doc_count,
    span_count, error_count, wall_ms) — aggregated from a partition-pruned
    scan of ONLY this run's part_key dirs (never the whole store)
  * idempotent: the data write is a dynamic partition OVERWRITE, so a
    partition written but not lineage-committed (killed mid-run) is simply
    rewritten on resume — duplicates cannot persist and the consistent
    read needs no dedup shuffle

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
    # committed part_keys: tiny (≤ parts rows) — collected once, reused for
    # the anti-join AND to partition-prune the lineage aggregation below
    done_keys = {
        r["part_key"]
        for r in read_lineage(spark, out_dir).select("part_key").distinct().collect()
    }
    done = spark.createDataFrame([(k,) for k in sorted(done_keys)], "part_key int")
    todo = keyed.join(F.broadcast(done), "part_key", "left_anti")
    if part_filter is not None:
        todo = todo.filter(F.col("part_key").isin(part_filter))
    run_keys = [k for k in range(parts) if k not in done_keys]
    if part_filter is not None:
        run_keys = [k for k in run_keys if k in set(part_filter)]

    snapshot = catalog.input_snapshot_id(corpus)
    extracted = extract_spans(salt_repartition(todo, num_partitions))
    # dynamic partition overwrite: a partition left half-done by a killed run
    # (data landed, lineage never committed) is REPLACED on resume, so the
    # store never holds duplicate rows and the read path needs no dedup
    catalog.overwrite_partitions(
        extracted, _extracted_path(out_dir), partition_by=["part_key"]
    )

    # lineage committed AFTER the data write, computed by re-reading ONLY
    # this run's part_key dirs (partition-pruned scan — lineage I/O scales
    # with THIS run's output, never with total store history)
    wall_ms = int((time.monotonic() - t0) * 1000)
    lineage = lineage_for_run(spark, out_dir, run_keys, snapshot, wall_ms)
    catalog.append_table(lineage, _lineage_path(out_dir))

    committed = read_lineage(spark, out_dir)
    return {
        "snapshot": snapshot,
        "wall_ms": wall_ms,
        "parts_done": committed.select("part_key").distinct().count(),
        "parts_total": parts,
    }


def lineage_for_run(
    spark: SparkSession,
    out_dir: str,
    run_keys: list[int],
    snapshot: str,
    wall_ms: int,
) -> DataFrame:
    """Per-partition lineage rows for ONE run, aggregated from a
    partition-pruned scan of only that run's ``part_key`` dirs (the store is
    partitioned by part_key, so the isin filter reaches the scan as a
    PartitionFilter — pinned in ``tests/test_resume.py``)."""
    if not run_keys:  # fully-resumed no-op run: nothing to commit
        return spark.createDataFrame([], LINEAGE_SCHEMA)
    return (
        _read_extracted_raw(spark, out_dir)
        .filter(F.col("part_key").isin(run_keys))
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


# above this many committed partitions the consistent read falls back to a
# broadcast semi join instead of an isin partition filter (expression size)
_READ_ISIN_MAX_KEYS = 10_000


def read_extracted(spark: SparkSession, out_dir: str) -> DataFrame:
    """Final consistent view: only lineage-committed partitions.

    No dedup is needed: the data write is a dynamic partition OVERWRITE, so
    a partition can only ever hold one copy of its rows — a kill between
    data write and lineage commit leaves an uncommitted partition that is
    excluded here and fully rewritten on resume.

    The committed-parts set is tiny (≤ ``parts`` rows): it is collected once
    and applied as an ``isin`` PARTITION FILTER, so a consistent read is a
    partition-pruned scan with no join and no shuffle at all (pinned in
    ``tests/test_plans.py``); with an extreme partition count it degrades to
    a broadcast semi join — still shuffle-free on the data side."""
    done_keys = sorted(
        r["part_key"]
        for r in read_lineage(spark, out_dir).select("part_key").distinct().collect()
    )
    df = _read_extracted_raw(spark, out_dir)
    if len(done_keys) <= _READ_ISIN_MAX_KEYS:
        return df.filter(F.col("part_key").isin(done_keys))
    done = spark.createDataFrame([(k,) for k in done_keys], "part_key int")
    return df.join(F.broadcast(done), "part_key", "left_semi")


def extract_in_memory(spark: SparkSession, corpus: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Checkpoint-free variant (benchmarks, driver entry): salt -> extract."""
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism * 2
    return extract_spans(salt_repartition(corpus, num_partitions))


def compact_extracted(
    spark: SparkSession, out_dir: str, files_per_partition: int = 1
) -> dict:
    """Small-files compaction: rewrite each COMMITTED partition's data as
    ``files_per_partition`` files (default 1) via dynamic partition
    overwrite, content-preserving.

    The append/resume pattern leaves one file per task per partition dir;
    at 10^12 docs that debris degrades every subsequent scan (file-listing
    + per-file open cost dominate). Compaction clusters rows by part_key
    (one shuffle over the committed store — the same cost a single read
    pays) and atomically replaces only the committed partitions;
    uncommitted partitions are untouched."""
    df = read_extracted(spark, out_dir)
    n_parts = df.select("part_key").distinct().count()
    if n_parts == 0:
        return {"parts_compacted": 0}
    # sortWithinPartitions(doc_id): compacted files carry monotone doc_id
    # runs, so parquet row-group min/max stats prune point lookups to one
    # row group. The HOT write path stays salt-randomized (sorting there
    # would concentrate giants again); clustering belongs to this
    # already-shuffling maintenance pass.
    compacted = df.repartition(
        n_parts * files_per_partition, F.col("part_key")
    ).sortWithinPartitions("part_key", "doc_id")
    catalog.overwrite_partitions(
        compacted, _extracted_path(out_dir), partition_by=["part_key"]
    )
    return {"parts_compacted": n_parts}


def changed_docs(old_corpus: DataFrame, new_corpus: DataFrame) -> DataFrame:
    """Snapshot-to-snapshot change detection: full outer join on doc_id of
    the order-sensitive span-sequence hashes -> one row per differing doc,
    tagged added / removed / changed. Unchanged docs drop out, so a daily
    refresh of a 10^12-doc corpus re-extracts only the delta. The hash is
    computed scan-side (codegen'd span fold) — the join carries 2 slim
    columns, never payloads."""
    from tika_wrap_spark import functions as tw  # noqa: PLC0415

    o = old_corpus.select("doc_id", tw.span_seq_hash("spans").alias("old_h"))
    n = new_corpus.select("doc_id", tw.span_seq_hash("spans").alias("new_h"))
    joined = o.join(n, "doc_id", "full_outer")
    return joined.filter(
        F.col("old_h").isNull()
        | F.col("new_h").isNull()
        | (F.col("old_h") != F.col("new_h"))
    ).select(
        "doc_id",
        F.when(F.col("old_h").isNull(), F.lit("added"))
        .when(F.col("new_h").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


def run_incremental(
    spark: SparkSession,
    old_corpus: DataFrame,
    new_corpus: DataFrame,
    num_partitions: int | None = None,
) -> DataFrame:
    """Incremental refresh: extract ONLY the added/changed documents of the
    new snapshot (semi join against the delta — broadcast when small,
    shuffle otherwise; removed docs are the caller's delete list)."""
    delta = changed_docs(old_corpus, new_corpus).filter(
        F.col("status").isin("added", "changed")
    )
    todo = new_corpus.join(delta.select("doc_id"), "doc_id", "left_semi")
    return extract_in_memory(spark, todo, num_partitions=num_partitions)


def write_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    files_per_shard: int = 1,
    key_col: str = "doc_id",
) -> None:
    """Training-data shard export: assign every row its deterministic md5
    shard (``operators.curation.shard_assign`` — retry-stable, no RNG),
    cluster rows by shard, and write ``shard=<k>/`` partition directories
    with ``files_per_shard`` files each.

    The repartition shuffles on the shard id (uniform by construction —
    md5 buckets have no hot key), so each shard's files are written by
    dedicated tasks and a downstream tokenizer reads exactly one
    directory per worker. Re-running overwrites only the shard partitions
    present in ``df`` (dynamic partition overwrite — idempotent, same as
    the extraction store)."""
    from tika_wrap_spark.operators.curation import shard_assign

    sharded = shard_assign(df, n_shards, key_col=key_col).repartition(
        n_shards * files_per_shard, F.col("shard")
    )
    catalog.overwrite_partitions(sharded, out_dir, partition_by=["shard"])
