#!/usr/bin/env python
"""Scaling-efficiency run: the sandbox proxy for the north_rule's N-vs-4N
executor criterion (BASELINE.md row 3).

Runs the identical extraction job at local[8] and local[32] on the same
input (fresh JVM per level via subprocess so the thread pool is honest),
best of ``--runs`` repeats, and writes BENCH/BASELINE.md with throughput
at both levels plus scaling efficiency

    eff = throughput(32) / (4 x throughput(8))       (target >= 0.8)

Usage: python bench_scaling.py [--sf-dir DIR] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

CHILD_SNIPPET = r"""
import json, os, sys, time
sf_dir, cpus = sys.argv[1], int(sys.argv[2])
os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) if "__file__" in dir() else ".")
from pgstosrt_spark.pipeline import extract
from pgstosrt_spark.session import get_spark
from pgstosrt_spark.sources.tables import read_documents

spark = get_spark("pgstosrt-scaling", cpus=cpus)
corpus = sys.argv[3]
docs = read_documents(spark, corpus)
n = docs.count()
extract(docs.limit(64)).write.format("noop").mode("overwrite").save()  # warm
t0 = time.perf_counter()
extract(docs).write.format("noop").mode("overwrite").save()
dt = time.perf_counter() - t0
print(json.dumps({"cpus": cpus, "docs": n, "sec": dt, "docs_per_sec": n / dt}))
spark.stop()
"""


def run_level(sf_dir: str, corpus: str, cpus: int, runs: int) -> dict:
    results = []
    for _ in range(runs):
        out = subprocess.run(
            [sys.executable, "-c", CHILD_SNIPPET, sf_dir, str(cpus), corpus],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            check=True,
        )
        results.append(json.loads(out.stdout.strip().splitlines()[-1]))
    secs = [r["sec"] for r in results]
    best = min(secs)  # least co-tenant interference on this shared host
    return {
        "cpus": cpus,
        "docs": results[0]["docs"],
        "runs_sec": [round(s, 3) for s in secs],
        "best_sec": round(best, 3),
        "docs_per_sec": round(results[0]["docs"] / best, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--replicate",
        type=int,
        default=32,
        help="corpus replication factor: the scaling criterion is about the "
        "work-dominated regime (at 10^12 docs, compute >> fixed job "
        "overhead); a small corpus measures scheduler constants instead, "
        "so the proxy replicates the deterministic corpus until decode "
        "work dominates",
    )
    args = ap.parse_args()

    repo = os.path.dirname(os.path.abspath(__file__))
    # ensure the cached corpus exists (built once, shared by both levels)
    from bench import _build_corpus_cache
    from pgstosrt_spark.session import get_spark

    spark = get_spark("pgstosrt-corpus", cpus=8)
    corpus = _build_corpus_cache(spark, args.sf_dir, os.path.join(repo, ".bench_cache"))
    if args.replicate > 1:
        from pyspark.sql import functions as F

        rep_path = f"{corpus}_x{args.replicate}"
        if not os.path.exists(os.path.join(rep_path, "_SUCCESS")):
            base = spark.read.parquet(corpus)
            (
                base.select(
                    F.explode(F.sequence(F.lit(0), F.lit(args.replicate - 1))).alias("_r"),
                    "doc_id",
                    "spans",
                )
                .select(
                    F.concat_ws("-", "doc_id", "_r").alias("doc_id"), "spans"
                )
                .repartition(128)
                .write.mode("overwrite")
                .parquet(rep_path)
            )
        corpus = rep_path
    spark.stop()

    lo = run_level(args.sf_dir, corpus, 8, args.runs)
    hi = run_level(args.sf_dir, corpus, 32, args.runs)
    eff = hi["docs_per_sec"] / (4 * lo["docs_per_sec"])

    report = {
        "sf": os.path.basename(os.path.normpath(args.sf_dir)),
        "low": lo,
        "high": hi,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
        "generated": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    md = os.path.join(repo, "BENCH", "BASELINE.md")
    with open(md, "w") as f:
        f.write(
            f"""# BENCH/BASELINE — scaling efficiency (N vs 4N proxy)

The north_rule's two-cluster-size criterion cannot use a real cluster in
this sandbox; per BASELINE.md it is evidenced by running the identical
extraction job at two parallelism levels — `local[8]` (N) vs `local[32]`
(4N) — on the same pre-built interleaved corpus, fresh JVM per level,
best of {args.runs} runs (least co-tenant interference on this shared host).

| level | cpus | docs | runs (sec) | best (sec) | throughput (docs/sec) |
|---|---|---|---|---|---|
| N | 8 | {lo['docs']} | {lo['runs_sec']} | {lo['best_sec']} | {lo['docs_per_sec']} |
| 4N | 32 | {hi['docs']} | {hi['runs_sec']} | {hi['best_sec']} | {hi['docs_per_sec']} |

**Scaling efficiency** = throughput(4N) / (4 x throughput(N)) =
**{report['scaling_efficiency']}** (target >= 0.8: {'PASS' if report['pass'] else 'FAIL'})

sf = {report['sf']}; generated {report['generated']}; methodology per
/root/repo/BASELINE.md (identical deterministic input at both levels,
warm-up pass excluded, noop sink so no collect/write skew).
"""
        )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
