"""Large-corpus robustness soak (BENCH.md protocol): synthesize N docs on
the executors, stream them through salt-shuffle -> fused extraction ->
aggregate — nothing cached, so memory stays flat and wall time must scale
linearly in N (the property a 10^12-doc run requires).

Usage: python tools/soak.py [--docs 1000000] [--cpus 32]
Prints one JSON line with wall, docs/sec, span/error/container tallies.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tika_wrap_spark.data import distributed_corpus_df
    from tika_wrap_spark.pipeline import extract_in_memory
    from tika_wrap_spark.session import get_spark

    spark = get_spark(master=f"local[{args.cpus}]", app_name="tw_soak")
    meta_at = lambda k: F.coalesce(F.try_element_at("meta", F.lit(k)), F.lit("0"))  # noqa: E731

    t0 = time.monotonic()
    corpus = distributed_corpus_df(spark, args.docs, seed=7)
    ext = extract_in_memory(spark, corpus)
    row = ext.agg(
        F.count("*").alias("docs"),
        F.sum(F.size("spans")).alias("spans"),
        F.sum((~F.col("parse_ok")).cast("long")).alias("errors"),
        F.sum(meta_at("n_containers").cast("long")).alias("containers"),
        F.sum(meta_at("n_container_entries").cast("long")).alias("members"),
    ).collect()[0]
    wall = time.monotonic() - t0
    print(
        json.dumps(
            {
                "docs": row["docs"],
                "spans": int(row["spans"]),
                "errors": int(row["errors"]),
                "containers": int(row["containers"]),
                "members": int(row["members"]),
                "wall_sec": round(wall, 1),
                "docs_per_sec": round(row["docs"] / wall, 1),
                "cpus": args.cpus,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
