"""spark-submit entry point (north_rule launch path).

Usage:
    spark-submit --master <master> \
        --py-files /path/to/tika_wrap_spark.zip \
        tools/submit_job.py <n_docs> <out_dir>

The package arrives ONLY via --py-files (this script must not rely on the
repo being on the python path) — the exact cluster deployment shape. Runs
the checkpointed extraction pipeline over an executor-synthesized corpus
and prints one JSON status line.

Build the zip with:
    python -c "from tika_wrap_spark.portability import package_zip; print(package_zip())"
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/tika_wrap_submit_out"

    spark = SparkSession.builder.appName("tika_wrap_submit").getOrCreate()
    # imported AFTER the session exists: resolved from the --py-files zip
    from tika_wrap_spark.data import distributed_corpus_df
    from tika_wrap_spark.pipeline import read_extracted, run_extraction

    corpus = distributed_corpus_df(spark, n_docs, seed=11)
    metrics = run_extraction(spark, corpus, out_dir, parts=16)
    final = read_extracted(spark, out_dir)
    print(
        json.dumps(
            {
                "status": "ok",
                "docs": final.count(),
                "parse_ok": final.filter("parse_ok").count(),
                "parts_done": metrics["parts_done"],
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
