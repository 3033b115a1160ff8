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
