#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` = wall seconds of the flagship extraction query (the BASELINE.md
headline); per-query seconds in ``queries``; extraction throughput in
docs/sec is reported alongside.  The interleaved corpus is synthesized
deterministically from the driver's text documents and cached under
.bench_cache/ so corpus *generation* is not billed to extraction.

Scaling runs (local[8] vs local[32], BASELINE.md's N-vs-4N proxy) are a
separate entrypoint: ``python bench_scaling.py`` -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _build_corpus_cache(spark, sf_dir: str, cache_dir: str) -> str:
    from pyspark.sql import functions as F

    from pgstosrt_spark.fixtures.corpus import synthesize_documents

    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(cache_dir, tag, "documents_interleaved")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        # parallel file layout: the driver's source parquet is one small
        # file; repartition (hash — round-robin would local-sort payloads)
        # so every downstream scan parallelizes
        n = max(spark.sparkContext.defaultParallelism * 2, 64)
        synthesize_documents(spark, sf_dir).repartition(n, F.col("doc_id")).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def _replicate_corpus(spark, corpus: str, factor: int) -> str:
    """Deterministic xN replication: the extraction headline should measure
    the work-dominated regime (the 10^12-doc spec), not job constants."""
    from pyspark.sql import functions as F

    if factor <= 1:
        return corpus
    rep_path = f"{corpus}_x{factor}"
    if not os.path.exists(os.path.join(rep_path, "_SUCCESS")):
        (
            spark.read.parquet(corpus)
            .select(
                F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("_r"),
                "doc_id",
                "spans",
            )
            .select(F.concat_ws("-", "doc_id", "_r").alias("doc_id"), "spans")
            .repartition(128, F.col("doc_id"))
            .write.mode("overwrite")
            .parquet(rep_path)
        )
    return rep_path


_BEST_SPIN = 0.0


def _spin_rate(dur: float = 0.4) -> float:
    t0 = time.perf_counter()
    n = 0
    x = 1.0
    while time.perf_counter() - t0 < dur:
        for _ in range(20000):
            x = x * 1.0000001 % 7
        n += 20000
    return n / (time.perf_counter() - t0)


def _wait_quiet(limit: float = 90.0, frac: float = 0.94) -> None:
    """Gate timed runs on a fast-host window (see BASELINE.md): co-tenant
    interference on this VM shows up as reduced effective CPU speed, not
    steal time, so probe the speed directly with a short single-proc spin.

    The calibration ceiling is seeded with spaced probes before the first
    gate (an un-seeded gate is vacuous: best=r always passes, so the first
    timed run of the process would be taken blind — this is exactly how the
    round-1 bench recorded a 4x-inflated fused-extraction time)."""
    global _BEST_SPIN
    if _BEST_SPIN == 0.0:
        for _ in range(3):
            _BEST_SPIN = max(_BEST_SPIN, _spin_rate())
            time.sleep(1.0)
    t0 = time.time()
    while time.time() - t0 < limit:
        r = _spin_rate()
        _BEST_SPIN = max(_BEST_SPIN, r)
        if r >= frac * _BEST_SPIN:
            return
        time.sleep(3.0)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_bench(sf_dir: str, cpus: int, runs: int = 3) -> dict:
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(cpus))
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from pgstosrt_spark.pipeline import extract
    from pgstosrt_spark.session import get_spark
    from pgstosrt_spark.sources.tables import read_documents

    spark = get_spark("pgstosrt-bench", cpus=cpus)
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
    corpus_path = _build_corpus_cache(spark, sf_dir, cache_dir)
    corpus_path = _replicate_corpus(
        spark, corpus_path, int(os.environ.get("SPARK_GRAFT_REPLICATE", "8"))
    )
    docs = read_documents(spark, corpus_path)
    n_docs = docs.count()

    qdefs = entrymod.queries()
    timings: dict[str, float] = {}

    # warm the JVM + Python workers on a small slice
    _noop(extract(docs.limit(64)))

    # flagship extraction over the pre-built interleaved corpus + the
    # relational / training-data headliners (driver sf tables)
    thunks: list[tuple[str, object]] = [
        ("extract_fused", lambda: _noop(extract(docs, mode="fused"))),
        ("extract_two_phase", lambda: _noop(extract(docs, mode="two_phase"))),
    ] + [
        (name, lambda name=name: _noop(qdefs[name](spark, sf_dir)))
        for name in (
            "pricing_summary",
            "broadcast_join_enrich",
            "run_length_dedup",
            "fragment_reassembly",
            "sessionize",
            "token_count",
            "quality_score",
            "exact_dedup",
            "ngram_jaccard_dups",
            "minhash_lsh_dups",
            "simhash_dups",
            "ann_cosine_topk",
            "ann_ivf_topk",
            "embedding_near_dup",
            "track_fanout",
        )
    ]

    # INTERLEAVED passes (best-of per query across passes), not
    # back-to-back repeats per query: co-tenant interference on this host
    # arrives in multi-minute bursts, so three consecutive samples of one
    # query can ALL land in a burst while its neighbours measure clean —
    # exactly how round 1 recorded a 4x-inflated fused time next to a
    # clean two-phase one.  Round-robin decorrelates the burst from any
    # single query; the spin gate still skips the worst windows.
    for _ in range(runs):
        for name, thunk in thunks:
            _wait_quiet()
            t0 = time.perf_counter()
            thunk()
            dt = time.perf_counter() - t0
            if name not in timings or dt < timings[name]:
                timings[name] = round(dt, 3)

    extract_sec = timings["extract_fused"]
    result = {
        "metric": "extraction wall-clock (fused pipeline, interleaved corpus "
        "replicated into the work-dominated regime; quiet-window-gated best-of)",
        "value": extract_sec,
        "unit": "sec",
        "queries": timings,
        "sf": os.path.basename(os.path.normpath(sf_dir)),
        "docs": n_docs,
        "docs_per_sec": round(n_docs / extract_sec, 1) if extract_sec else None,
        "cpus": cpus,
    }
    spark.stop()
    return result


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    result = run_bench(sf_dir, cpus)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
