"""Scaling-evidence protocol (north_rule, sandbox substitute for a real
cluster): run the IDENTICAL extraction job on the IDENTICAL synthetic
interleaved corpus at two local parallelism levels (local[8] vs local[32],
i.e. N and 4N cores), measure docs/sec at each, and report

    efficiency = (docs_per_sec@32 / docs_per_sec@8) / 4

Target: efficiency >= 0.8 (BASELINE.json north_rule). Results are printed
as JSON and appended to BENCH.md by --write-md.

Each level runs in a fresh subprocess (fresh JVM) so neither JIT warmup
nor page-cache state leaks between levels; within a level we do one warmup
pass then time the measured pass.

Usage: python tools/scaling_bench.py [--docs 8000] [--write-md]
       python tools/scaling_bench.py --child <cores> <docs>   (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

LEVELS = (8, 32)


def child(cores: int, docs: int) -> None:
    from tika_wrap_spark.corpus import generate_corpus
    from tika_wrap_spark.data import corpus_to_df
    from tika_wrap_spark.pipeline import extract_in_memory
    from tika_wrap_spark.session import get_spark

    spark = get_spark(master=f"local[{cores}]", app_name=f"scaling_{cores}")
    corpus = corpus_to_df(spark, generate_corpus(docs, seed=7)).cache()
    corpus.count()

    extract_in_memory(spark, corpus).count()  # warmup (JIT, python workers)
    t0 = time.monotonic()
    n = extract_in_memory(spark, corpus).count()
    wall = time.monotonic() - t0

    print(json.dumps({"cores": cores, "docs": n, "wall_sec": round(wall, 3),
                      "docs_per_sec": round(n / wall, 1)}))
    spark.stop()


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]))
        return 0

    docs = 8000
    write_md = "--write-md" in sys.argv
    for i, a in enumerate(sys.argv):
        if a == "--docs":
            docs = int(sys.argv[i + 1])

    results = {}
    for cores in LEVELS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(cores), str(docs)],
            capture_output=True, text=True, check=True, cwd=_REPO,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(line)

    lo, hi = results[LEVELS[0]], results[LEVELS[1]]
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (LEVELS[1] / LEVELS[0])
    summary = {
        "docs": docs,
        f"docs_per_sec_local{LEVELS[0]}": lo["docs_per_sec"],
        f"docs_per_sec_local{LEVELS[1]}": hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))

    if write_md:
        md = (
            "\n## Scaling run (sandbox two-parallelism protocol)\n\n"
            f"Identical extraction job (sniff->route->extract->assemble) on the "
            f"identical deterministic corpus ({docs} interleaved docs, seed=7), "
            f"fresh JVM per level, warmup pass excluded:\n\n"
            "| parallelism | wall (s) | docs/sec |\n|---|---|---|\n"
            + "".join(
                f"| local[{c}] | {results[c]['wall_sec']} | {results[c]['docs_per_sec']} |\n"
                for c in LEVELS
            )
            + f"\n**Scaling efficiency (throughput ratio ÷ core ratio) = "
            f"{summary['scaling_efficiency']}** (target ≥ 0.8: "
            f"{'PASS' if summary['pass'] else 'FAIL'}).\n"
        )
        with open(os.path.join(_REPO, "BENCH.md"), "a") as f:
            f.write(md)
    return 0


if __name__ == "__main__":
    sys.exit(main())
