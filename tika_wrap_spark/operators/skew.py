"""Skew defense — explicit salting + cost-aware repartitioning (north_rule).

Giant-PDF skew is *UDF-cost* skew: row counts per partition look balanced,
but one 100x-payload document makes its partition the straggler. AQE's
size-based stats cannot see this (SURVEY §4.2), so the salt is explicit:

    salt     = pmod(xxhash64(doc_id), salt_buckets)
    cost_bin = bucket of log2(total payload chars)   (giant docs spread out)

``repartitionByRange`` over (cost_bin desc, salt, doc_id) range-partitions
the heavy docs across many partitions while keeping the cheap long tail
packed — at 1000 executors the same expression scales by raising
``num_partitions`` only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_part_key(df: DataFrame, parts: int) -> DataFrame:
    """Stable checkpoint partition key: independent of runtime parallelism,
    so resume (anti-join on part_key) survives cluster-size changes."""
    return df.withColumn(
        "part_key", F.pmod(F.xxhash64("doc_id"), F.lit(parts)).cast("int")
    )


def doc_cost(df: DataFrame) -> DataFrame:
    """Per-doc extraction cost proxy: total payload chars across spans.
    Computed JVM-side (no Python) with a codegen'd aggregate expression."""
    return df.withColumn(
        "cost",
        F.aggregate(
            F.coalesce(F.col("spans"), F.array()),
            F.lit(0).cast("long"),
            lambda acc, s: acc + F.coalesce(F.length(s["text"]), F.lit(0)),
        ),
    )


def salt_repartition(
    df: DataFrame, num_partitions: int, salt_buckets: int = 64
) -> DataFrame:
    """Salted, cost-binned range repartition ahead of the extraction UDF."""
    salted = doc_cost(df).withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets))
    )
    binned = salted.withColumn(
        "cost_bin", F.floor(F.log2(F.col("cost") + F.lit(2))).cast("int")
    )
    return (
        binned.repartitionByRange(
            num_partitions, F.col("cost_bin").desc(), F.col("salt"), F.col("doc_id")
        )
        .drop("cost", "salt", "cost_bin")
    )


def skew_topk(df: DataFrame, k: int = 10) -> DataFrame:
    """Diagnostic: the k most expensive documents (sort_limit_topk)."""
    return (
        doc_cost(df)
        .select("doc_id", "cost")
        .orderBy(F.col("cost").desc(), F.col("doc_id"))
        .limit(k)
    )
