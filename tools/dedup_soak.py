"""Dedup-family soak (VERDICT r4 #9): minhash -> LSH star edges ->
connected components -> keep-best over >=1M synthetic docs with a PLANTED
giant near-dup cluster — the hot-template shape that makes uncapped
band-bucket pair joins explode at web scale (Σ_buckets m²; see
operators/dedup.py lsh_star_edges docstring and BENCH.md).

The giant cluster's members share a ~60-word template and differ by two
per-doc tokens (Jaccard ≈ 0.97 to the hub), so every LSH band puts all m
members in ONE bucket: the pair join would emit ~m²/2 rows from a single
skewed key, the star generator emits m-1. The soak PROVES the O(m) bound
by counting actual edge rows and reporting the avoided pair volume from
the same bucket histogram.

Everything is synthesized and aggregated on the executors (spark.range +
JVM expressions; no driver-side corpus, no Python UDFs anywhere in the
job). Usage:

    python tools/dedup_soak.py [--docs 1000000] [--giant 50000] [--cpus 32]

Prints one JSON line: wall seconds per stage, star-edge count (must be
O(giant), not O(giant^2)), avoided-pair volume, top cluster size (must
equal --giant), keep-best row count, scaling ratio edges/giant.
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

# ~60-word template every giant-cluster member shares (the near-dup body);
# two per-doc tokens are appended so members are distinct but ~0.97-Jaccard
_TEMPLATE = " ".join(
    "the quick brown fox jumps over the lazy dog while a distributed "
    "pipeline shuffles partitions across executors and the optimizer "
    "prunes columns pushes filters broadcasts dimensions salts skewed "
    "keys checkpoints lineage and writes idempotent partition overwrites "
    "for resumable extraction at web scale with bounded state".split()
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--giant", type=int, default=50_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tika_wrap_spark.operators import dedup as dd
    from tika_wrap_spark.session import get_spark

    spark = get_spark(master=f"local[{args.cpus}]", app_name="tw_dedup_soak")

    t0 = time.monotonic()
    # corpus: id < giant -> template + 2 unique tokens (ONE near-dup
    # cluster of size `giant`); id >= giant -> 30 doc-unique md5-derived
    # tokens (no near-dups in the background)
    docs = spark.range(args.docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < args.giant,
            F.concat(
                F.lit(_TEMPLATE + " u"),
                F.col("id").cast("string"),
                F.lit(" z"),
                (F.col("id") * 7 % 100000).cast("string"),
            ),
        )
        .otherwise(
            F.expr(
                "concat_ws(' ', transform(sequence(1, 30), "
                "i -> substring(md5(concat(cast(id as string), ':', "
                "cast(i as string))), 1, 8)))"
            )
        )
        .alias("text"),
    )

    tokens = dd.doc_tokens(docs)
    sigs = dd.minhash_signatures(tokens, n_hashes=16)

    # bucket histogram: the evidence both ways — what the star emits vs
    # what an uncapped pair join WOULD have emitted from the same buckets
    exploded = dd.lsh_bands(sigs, n_hashes=16, band_rows=4)
    hist = (
        exploded.groupBy("band_idx", "band_val")
        .agg(F.count("*").alias("m"))
        .agg(
            F.count("*").alias("n_buckets"),
            F.max("m").alias("max_bucket"),
            F.sum(
                (F.col("m").cast("decimal(38,0)") * (F.col("m") - 1) / 2)
            ).alias("pair_volume"),
        )
        .collect()[0]
    )
    t_hist = time.monotonic()

    star = dd.lsh_star_edges(sigs, n_hashes=16, band_rows=4)
    n_edges = star.count()
    t_star = time.monotonic()

    cc = dd.connected_components(star.select("doc_a", "doc_b"))
    clusters = cc.groupBy("cluster").agg(F.count("*").alias("n_members"))
    top = clusters.orderBy(F.desc("n_members")).limit(3).collect()
    n_clusters = clusters.count()
    t_cc = time.monotonic()

    # keep-best: min over a zero-padded (inverted-length, doc_id) sort key
    # per cluster — the same partial-aggregable argmax q_dedup_keep_best
    # ships, with doc length standing in for the quality score
    member = docs.join(cc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster"), F.col("doc_id")).alias("cluster"),
        F.length("text").alias("score"),
    )
    bk = F.concat(
        F.lpad((F.lit(99999) - F.col("score")).cast("string"), 5, "0"),
        F.lpad(F.col("doc_id").cast("string"), 10, "0"),
    )
    keep = (
        member.withColumn("bk", bk)
        .groupBy("cluster")
        .agg(F.count("*").alias("n_members"), F.min("bk").alias("best"))
    )
    n_keep = keep.count()
    t_keep = time.monotonic()

    out = {
        "metric": "dedup_soak",
        "docs": args.docs,
        "giant": args.giant,
        "n_buckets": int(hist["n_buckets"]),
        "max_bucket": int(hist["max_bucket"]),
        "avoided_pair_volume": int(hist["pair_volume"]),
        "star_edges": int(n_edges),
        "edges_per_giant_member": round(n_edges / args.giant, 3),
        "top_clusters": [[int(r["cluster"]), int(r["n_members"])] for r in top],
        "n_clusters": int(n_clusters),
        "keep_best_rows": int(n_keep),
        "wall_hist_sec": round(t_hist - t0, 1),
        "wall_star_sec": round(t_star - t_hist, 1),
        "wall_cc_sec": round(t_cc - t_star, 1),
        "wall_keep_sec": round(t_keep - t_cc, 1),
        "wall_total_sec": round(t_keep - t0, 1),
    }
    print(json.dumps(out))
    # the planted cluster must come back (near-)whole — LSH recall over
    # 16-hash/4-band signatures loses the odd straggler whose two unique
    # tokens perturbed every band (~0.1% observed) — through O(m) edges
    assert out["top_clusters"][0][1] >= 0.99 * args.giant, out
    assert out["star_edges"] < 10 * args.giant, out  # O(m), not O(m^2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
