"""Skew defense: salted repartition must spread the giant-doc tail evenly
even when the input layout is pathological (all giants adjacent)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tika_wrap_spark.corpus import generate_corpus
from tika_wrap_spark.data import corpus_to_df
from tika_wrap_spark.operators.skew import doc_cost, salt_repartition, skew_topk


def test_salt_spreads_pathological_layout(spark):
    # sort the corpus by cost DESC so every giant doc is adjacent on input —
    # the layout that defeats naive chunking
    rows = generate_corpus(800, seed=13, adversarial=False)
    df = doc_cost(corpus_to_df(spark, rows)).orderBy(F.col("cost").desc()).drop("cost")

    n_parts = 8
    out = salt_repartition(df, n_parts)
    per_part = (
        doc_cost(out)
        .groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.sum("cost").alias("part_cost"), F.count("*").alias("n"))
        .collect()
    )
    assert len(per_part) == n_parts
    costs = [r["part_cost"] for r in per_part]
    total = sum(costs)
    # no partition may dominate: the pre-fix cost_bin-leading range key put
    # every giant in one partition (~60% of total cost); salted spread keeps
    # each partition near total/n_parts
    assert max(costs) < 0.35 * total, costs
    counts = [r["n"] for r in per_part]
    assert max(counts) < 2.5 * (sum(counts) / n_parts), counts


def test_salt_repartition_deterministic(spark):
    df = corpus_to_df(spark, generate_corpus(100, seed=17, adversarial=False))
    a = salt_repartition(df, 4).select("doc_id", F.spark_partition_id().alias("pid"))
    b = salt_repartition(df, 4).select("doc_id", F.spark_partition_id().alias("pid"))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_skew_topk_finds_giants(spark):
    rows = generate_corpus(600, seed=42, adversarial=False)
    df = corpus_to_df(spark, rows)
    top = skew_topk(df, k=5).collect()
    assert len(top) == 5
    # top doc must be a giant: >10x the corpus mean cost
    costs = sorted(
        (sum(len(s["text"]) for s in r["spans"]) for r in rows), reverse=True
    )
    mean = sum(costs) / len(costs)
    assert top[0]["cost"] == costs[0] and costs[0] > 10 * mean
