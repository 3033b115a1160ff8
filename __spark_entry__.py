"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship extraction run over sf0.001 documents.
``queries()`` / ``oracle_sql()`` — operator surface from SURVEY.md §2C plus
training-data ops, defined in ``tika_wrap_spark.registry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: treat sf0.001 ``documents`` as a corpus of single-text-span
    docs, run the full sniff->route->extract->assemble pipeline, and return
    the per-doc extraction summary joined with corpus stats."""
    from tika_wrap_spark import functions as tw
    from tika_wrap_spark.pipeline import extract_in_memory
    from tika_wrap_spark.sources import corpus_from_documents_table

    corpus = corpus_from_documents_table(spark, "/root/testdata/sf0.001")
    ext = extract_in_memory(spark, corpus, num_partitions=16)
    return ext.select(
        "doc_id",
        "parse_ok",
        F.size("spans").alias("n_spans"),
        tw.span_text_length("spans").alias("n_chars_out"),
        tw.span_seq_hash("spans").alias("span_seq_hash"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tika_wrap_spark.portability import make_portable
    from tika_wrap_spark.registry import spark_queries

    make_portable()
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    from tika_wrap_spark.registry import oracle_sqls

    return oracle_sqls()
