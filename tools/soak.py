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
    # adversarial=True plants the malformed tail INCLUDING the three
    # 65-MiB decompression bombs: the caps must register as `bomb`
    # taxonomy rows at soak scale, never as task failures
    corpus = distributed_corpus_df(spark, args.docs, seed=7, adversarial=True)
    ext = extract_in_memory(spark, corpus)
    from tika_wrap_spark.queries_training import _error_class_col

    # ONE pass: per-class partial-agg rows (<=10), totals derived driver-side
    per_class = (
        ext.groupBy(_error_class_col().alias("error_class"))
        .agg(
            F.count("*").alias("docs"),
            F.sum(F.size("spans")).alias("spans"),
            F.sum(meta_at("n_containers").cast("long")).alias("containers"),
            F.sum(meta_at("n_container_entries").cast("long")).alias("members"),
        )
        .collect()
    )
    tot = lambda k: sum(int(r[k] or 0) for r in per_class)  # noqa: E731
    row = {
        "docs": tot("docs"),
        "spans": tot("spans"),
        "errors": sum(int(r["docs"]) for r in per_class if r["error_class"] != "ok"),
        "containers": tot("containers"),
        "members": tot("members"),
    }
    classes = {
        r["error_class"]: int(r["docs"])
        for r in per_class
        if r["error_class"] != "ok"
    }
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
                "error_classes": classes,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
