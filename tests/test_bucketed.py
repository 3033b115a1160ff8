"""Bucketed co-located joins: two tables bucketed identically on the join
key must join with NO Exchange on either side — the recurring-fact-join
pattern that converts a full shuffle into a local merge at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from tika_wrap_spark import plans
from tika_wrap_spark.catalog import write_bucketed


def test_bucketed_join_is_exchange_free(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8, sort_col="o_orderkey")
    write_bucketed(
        lineitem, "b_lineitem", "l_orderkey", n_buckets=8, sort_col="l_orderkey"
    )
    try:
        joined = (
            spark.table("b_lineitem")
            .join(
                spark.table("b_orders").hint("merge"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("rev"))
        )
        plan = plans.formatted_plan(joined)
        join_section = plan.split("HashAggregate", 1)[0]
        assert "Exchange" not in join_section, plan  # co-located: no shuffle to join
        # correctness vs the plain (shuffling) join
        want = sorted(
            map(
                tuple,
                lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
                .groupBy("o_orderstatus")
                .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("rev"))
                .collect(),
            )
        )
        got = sorted(map(tuple, joined.collect()))
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
