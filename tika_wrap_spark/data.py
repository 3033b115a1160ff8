"""Bridging helpers between the pure-python corpus rows and Spark DataFrames."""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from tika_wrap_spark.schemas import CORPUS_SCHEMA


def _span_tuple(s: dict[str, Any]) -> tuple:
    return (s["kind"], s["text"], s["media_ref"], s["offset"])


def corpus_to_df(spark: SparkSession, rows: list[dict[str, Any]]) -> DataFrame:
    data = [(r["doc_id"], [_span_tuple(s) for s in r["spans"]]) for r in rows]
    return spark.createDataFrame(data, CORPUS_SCHEMA)


def distributed_corpus_df(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Synthesize the corpus ON THE EXECUTORS: ``spark.range`` over doc ids
    -> ``mapInPandas`` calling the per-doc-seeded ``corpus.gen_doc``. Output
    is identical for a given (n_docs, seed) under ANY partitioning, and the
    driver never holds the data — the only corpus path that survives 10^12
    docs. ``generate_corpus`` (driver-side) stays for small golden fixtures."""
    from tika_wrap_spark.portability import make_portable

    make_portable()
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism * 2

    def gen(batches):
        import pandas as pd  # noqa: PLC0415

        from tika_wrap_spark.corpus import gen_doc  # noqa: PLC0415

        for pdf in batches:
            rows = [gen_doc(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "doc_id": [r["doc_id"] for r in rows],
                    "spans": [r["spans"] for r in rows],
                }
            )

    return spark.range(0, n_docs, numPartitions=num_partitions).mapInPandas(
        gen, schema=CORPUS_SCHEMA
    )


def extracted_to_rows(df: DataFrame) -> list[dict[str, Any]]:
    """Collect an extracted DataFrame back to plain-python rows in the golden
    fixture shape, sorted by doc_id (for comparisons in tests)."""
    out = []
    for row in df.collect():
        out.append(
            {
                "doc_id": row["doc_id"],
                "spans": [
                    {
                        "kind": s["kind"],
                        "text": s["text"],
                        "media_ref": s["media_ref"],
                        "offset": s["offset"],
                    }
                    for s in (row["spans"] or [])
                ],
                "parse_ok": row["parse_ok"],
                "error": row["error"],
                "meta": dict(row["meta"] or {}),
            }
        )
    out.sort(key=lambda r: r["doc_id"])
    return out
