"""Spark-side extraction operators: Arrow-batched mapInPandas over the corpus.

Design (SURVEY.md §4.2 / PAPERS.md CIDR'22 note): the whole
sniff -> route -> extract -> assemble chain is fused into ONE ``mapInPandas``
pass, so each Arrow batch crosses the executor-JVM <-> python-worker boundary
exactly once (that boundary is the rebuild's analog of the reference's
loopback HTTP hop to the Tika server, /root/reference/src/java-env.cpp:266).
Parser state is plain module-level Python — imported once per python worker,
the analog of the reference's lazy warm-server reuse
(src/java-env.cpp:199-205), with none of its one-doc-at-a-time mutex
(src/java-env.cpp:58,83).

No per-row Python UDFs anywhere (input_hint mandate): everything is
Arrow-vectorized at the batch level.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tika_wrap_spark.core.extract import extract_document
from tika_wrap_spark.core.sniff import sniff_kind
from tika_wrap_spark.portability import make_portable
from tika_wrap_spark.schemas import EXTRACTED_PART_SCHEMA, EXTRACTED_SCHEMA


def _as_span_dicts(cell: Any) -> list[dict[str, Any]]:
    """Normalize an Arrow-decoded spans cell (list of dicts or Rows) to the
    plain-dict shape the pure core consumes."""
    if cell is None:
        return []
    out = []
    for el in cell:
        if isinstance(el, dict):
            out.append(el)
        else:  # pyspark.sql.Row or mapping-like
            out.append(
                {
                    "kind": el["kind"],
                    "text": el["text"],
                    "media_ref": el["media_ref"],
                    "offset": el["offset"],
                }
            )
    return out


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        has_part = "part_key" in pdf.columns
        doc_ids = pdf["doc_id"].tolist()
        spans_col = pdf["spans"].tolist()
        rows: dict[str, list[Any]] = {
            "doc_id": doc_ids,
            "spans": [],
            "parse_ok": [],
            "error": [],
            "meta": [],
        }
        for cell in spans_col:
            res = extract_document(_as_span_dicts(cell))
            rows["spans"].append(res["spans"])
            rows["parse_ok"].append(res["parse_ok"])
            rows["error"].append(res["error"])
            rows["meta"].append(res["meta"])
        if has_part:
            rows["part_key"] = pdf["part_key"].tolist()
        yield pd.DataFrame(rows)


def extract_spans(df: DataFrame) -> DataFrame:
    """corpus (doc_id, spans[, part_key]) -> extracted
    (doc_id, spans, parse_ok, error, meta[, part_key]).

    One fused Arrow pass; bad documents become ``parse_ok=false`` rows,
    never task failures (reference error policy, src/java-env.cpp:316-325).
    """
    make_portable()  # UDF closures ship their own code (no worker import)
    schema = EXTRACTED_PART_SCHEMA if "part_key" in df.columns else EXTRACTED_SCHEMA
    cols = ["doc_id", "spans"] + (["part_key"] if "part_key" in df.columns else [])
    return df.select(*cols).mapInPandas(_extract_batches, schema=schema)


@F.pandas_udf(T.StringType())
def sniff_kind_udf(text: pd.Series, media_ref: pd.Series) -> pd.Series:
    """Vectorized magic-byte sniffer (mime_sniff, SURVEY §2A#4) — scalar
    pandas UDF for use outside the fused extraction pass."""
    return pd.Series(
        [sniff_kind(t, m) for t, m in zip(text.tolist(), media_ref.tolist())]
    )


def sniffed_spans(df: DataFrame) -> DataFrame:
    """Explode the corpus to per-span rows with a content-sniffed kind column
    (mime_route over real payloads; the provided ``kind`` is only a hint)."""
    make_portable()
    return (
        df.select("doc_id", F.posexplode("spans").alias("pos", "span"))
        .select(
            "doc_id",
            "pos",
            F.col("span.kind").alias("kind_hint"),
            F.col("span.text").alias("text"),
            F.col("span.media_ref").alias("media_ref"),
            F.col("span.offset").alias("offset"),
        )
        .withColumn("kind", sniff_kind_udf(F.col("text"), F.col("media_ref")))
    )
