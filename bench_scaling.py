#!/usr/bin/env python
"""Scaling-efficiency run: the sandbox proxy for the north_rule's N-vs-4N
executor criterion (BASELINE.md row 3).

Runs the identical extraction job at two parallelism-level *pairs* on the
same pre-built interleaved corpus:

  * primary      local[4]  vs local[16]   ("N and 4N cores")
  * supplementary local[8] vs local[32]   (the rule's example pair)

and writes BENCH/BASELINE.md with throughput at every level plus scaling
efficiency  eff = throughput(4N) / (4 x throughput(N))  (target >= 0.8).

Methodology (BASELINE.md): this host is a co-tenant-oversubscribed VM —
identical runs vary >10x under interference bursts, and a plain
multiprocessing spin loop scales 8->32 procs at only ~0.78 (so the 8->32
range measures the *host*, not the software).  Therefore:

  * fresh JVM per launch, launches interleaved across levels so host-noise
    bursts cannot correlate with one level;
  * 2 timed in-JVM repeats per launch (first repeat absorbs worker spin-up);
  * best-of pooled per level — interference only ever adds time;
  * a same-session spin-loop measurement documents the hardware ceiling.

Usage: python bench_scaling.py [--sf-dir DIR] [--launches 2] [--replicate 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

CHILD_SNIPPET = r"""
import json, os, sys, time
cpus, corpus, inner, ref = int(sys.argv[1]), sys.argv[2], int(sys.argv[3]), float(sys.argv[4])
os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
sys.path.insert(0, os.getcwd())
from pgstosrt_spark.pipeline import extract
from pgstosrt_spark.session import get_spark
from pgstosrt_spark.sources.tables import read_documents

def spin_rate(dur=0.5):
    # single-proc CPU spin: a direct host-speed probe.  Co-tenant
    # interference on this VM mostly does NOT appear as steal time (it
    # shows up as reduced effective CPU speed), so gating on steal is not
    # enough — gate on the host actually running at full speed.
    t0 = time.perf_counter(); n = 0; x = 1.0
    while time.perf_counter() - t0 < dur:
        for _ in range(20000):
            x = x * 1.0000001 % 7
        n += 20000
    return n / (time.perf_counter() - t0)

best_rate = ref
def wait_fast(limit=240.0, frac=0.94):
    global best_rate
    t0 = time.time()
    while time.time() - t0 < limit:
        r = spin_rate()
        best_rate = max(best_rate, r)
        if r >= frac * best_rate:
            return r
        time.sleep(3.0)
    return spin_rate()

spark = get_spark("pgstosrt-scaling", cpus=cpus)
docs = read_documents(spark, corpus)
n = docs.count()
extract(docs.limit(256)).write.format("noop").mode("overwrite").save()  # spin up workers
secs, pre, post = [], [], []
for _ in range(inner):
    r0 = wait_fast()
    t0 = time.perf_counter()
    extract(docs).write.format("noop").mode("overwrite").save()
    secs.append(time.perf_counter() - t0)
    pre.append(round(r0 / best_rate, 3))
    post.append(round(spin_rate() / best_rate, 3))
print(json.dumps({"cpus": cpus, "docs": n, "secs": secs,
                  "host_speed_pre": pre, "host_speed_post": post,
                  "best_rate": best_rate}))
spark.stop()
"""


def _spin(d: float) -> int:  # module-level: Pool.map must pickle it
    t0 = time.perf_counter()
    n = 0
    x = 1.0
    while time.perf_counter() - t0 < d:
        for _ in range(10000):
            x = x * 1.0000001 % 7
        n += 10000
    return n


def spin_ceiling(pairs: list[tuple[int, int]], dur: float = 5.0) -> dict:
    """Pure-CPU multiprocessing spin loop: the host's own scaling ceiling."""
    from multiprocessing import Pool

    rates: dict[int, float] = {}
    for nproc in sorted({p for pair in pairs for p in pair}):
        with Pool(nproc) as pool:
            rates[nproc] = sum(pool.map(_spin, [dur] * nproc)) / dur
    return {
        f"{lo}->{hi}": round(rates[hi] / (4 * rates[lo]), 3) for lo, hi in pairs
    }


_WL_PAYLOADS: list[bytes] = []


def _wl_work(dur: float) -> int:
    from pgstosrt_spark.pgs.decode import decode_media_payload

    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < dur:
        decode_media_payload(_WL_PAYLOADS[n % len(_WL_PAYLOADS)])
        n += 1
    return n


def workload_ceiling(corpus: str, pairs: list[tuple[int, int]], dur: float = 10.0) -> dict:
    """The extraction workload itself under plain multiprocessing — zero
    Spark — at the same process counts: the truest per-workload host
    ceiling (memory-system contention included, framework excluded)."""
    import base64

    import duckdb

    global _WL_PAYLOADS
    rows = duckdb.sql(
        "select s.text from (select unnest(spans) as s from "
        f"read_parquet('{corpus}/*.parquet') limit 4000) where s.kind='media' limit 500"
    ).fetchall()
    _WL_PAYLOADS = [base64.b64decode(r[0]) for r in rows]
    from multiprocessing import Pool

    rates: dict[int, float] = {}
    for nproc in sorted({p for pair in pairs for p in pair}):
        best = 0.0
        for _ in range(2):
            with Pool(nproc) as pool:
                best = max(best, sum(pool.map(_wl_work, [dur] * nproc)) / dur)
        rates[nproc] = best
    return {
        f"{lo}->{hi}": round(rates[hi] / (4 * rates[lo]), 3) for lo, hi in pairs
    }


def run_launch(corpus: str, cpus: int, inner: int, ref_rate: float) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD_SNIPPET, str(cpus), corpus, str(inner), str(ref_rate)],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--launches", type=int, default=2, help="fresh JVMs per level")
    ap.add_argument("--inner", type=int, default=2, help="timed repeats per JVM")
    ap.add_argument(
        "--replicate",
        type=int,
        default=8,
        help="corpus replication factor: the scaling criterion is about the "
        "work-dominated regime (at 10^12 docs, compute >> fixed job "
        "overhead); a small corpus measures scheduler constants instead, "
        "so the proxy replicates the deterministic corpus until decode "
        "work dominates",
    )
    ap.add_argument("--skip-supplementary", action="store_true")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.abspath(__file__))
    # ensure the cached corpus exists (built once, shared by all levels)
    from bench import _build_corpus_cache
    from pgstosrt_spark.session import get_spark

    spark = get_spark("pgstosrt-corpus", cpus=16)
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
                .repartition(128, F.col("doc_id"))
                .write.mode("overwrite")
                .parquet(rep_path)
            )
        corpus = rep_path
    spark.stop()

    pairs = [(4, 16)] + ([] if args.skip_supplementary else [(8, 32)])
    levels = sorted({p for pair in pairs for p in pair})
    samples: dict[int, list[float]] = {lv: [] for lv in levels}
    speeds: dict[int, list] = {lv: [] for lv in levels}
    n_docs = 0
    # host-speed reference: best single-proc spin rate over a few spaced
    # probes; children self-calibrate upward from it
    ref_rate = 0.0
    for _ in range(3):
        ref_rate = max(ref_rate, _spin(0.5) / 0.5)
        time.sleep(5)
    for _ in range(args.launches):  # interleave levels across launches
        for lv in levels:
            r = run_launch(corpus, lv, args.inner, ref_rate)
            n_docs = r["docs"]
            samples[lv].extend(r["secs"])
            speeds[lv].extend(
                list(zip(r.get("host_speed_pre", []), r.get("host_speed_post", [])))
            )
            ref_rate = max(ref_rate, r.get("best_rate", 0.0))

    ceiling = spin_ceiling(pairs)
    wl_ceiling = workload_ceiling(corpus, pairs)

    def tput(lv: int) -> float:
        return n_docs / min(samples[lv])

    # Clean-pair efficiency: a RATIO needs both ends measured under
    # comparable host conditions.  min-over-all is the right rule for a
    # single query's record (interference only adds time, so the min is
    # the tightest upper bound on the truth) — but that argument does NOT
    # transfer to a quotient: a dirty-bracket minimum at one level against
    # a clean minimum at the other biases the ratio in whichever direction
    # the bursts happened to land.  So when every level of a pair has at
    # least one run whose BOTH spin probes cleared the gate (0.94), the
    # efficiency from those mutually-clean runs is the evidence-grade
    # number; the min-over-all ratio is still reported for transparency.
    CLEAN_GATE = 0.94

    def clean_secs(lv: int) -> list[float]:
        return [
            s
            for s, (pre, post) in zip(samples[lv], speeds[lv])
            if pre >= CLEAN_GATE and post >= CLEAN_GATE
        ]

    def tput_clean(lv: int) -> float | None:
        cs = clean_secs(lv)
        return (n_docs / min(cs)) if cs else None

    rows = {
        lv: {
            "cpus": lv,
            "runs_sec": [round(s, 2) for s in samples[lv]],
            "host_speed": speeds[lv],
            "best_sec": round(min(samples[lv]), 2),
            "docs_per_sec": round(tput(lv), 1),
            "best_clean_sec": (
                round(min(clean_secs(lv)), 2) if clean_secs(lv) else None
            ),
            "n_clean": len(clean_secs(lv)),
        }
        for lv in levels
    }
    effs = {
        f"{lo}->{hi}": round(tput(hi) / (4 * tput(lo)), 3) for lo, hi in pairs
    }
    effs_clean = {
        f"{lo}->{hi}": (
            round(tput_clean(hi) / (4 * tput_clean(lo)), 3)
            if tput_clean(lo) and tput_clean(hi)
            else None
        )
        for lo, hi in pairs
    }
    primary = (
        effs_clean["4->16"] if effs_clean["4->16"] is not None else effs["4->16"]
    )
    report = {
        "sf": os.path.basename(os.path.normpath(args.sf_dir)),
        "docs": n_docs,
        "levels": rows,
        "efficiency": effs,
        "efficiency_clean_pair": effs_clean,
        "hardware_ceiling_spin": ceiling,
        "workload_ceiling_multiproc": wl_ceiling,
        "primary": "4->16",
        "primary_rule": (
            "clean-pair when both levels hold a probe-clean run, else "
            "min-over-all"
        ),
        "scaling_efficiency": primary,
        "target": 0.8,
        "pass": primary >= 0.8,
        "generated": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)

    level_rows = "\n".join(
        f"| local[{lv}] | {rows[lv]['runs_sec']} | {rows[lv]['host_speed']} | {rows[lv]['best_sec']} | {rows[lv]['docs_per_sec']} |"
        for lv in levels
    )
    eff_rows = "\n".join(
        f"| {pair} | {effs[pair]} | {effs_clean[pair] if effs_clean[pair] is not None else 'n/a (no mutually-clean runs)'} | {ceiling[pair]} | {wl_ceiling[pair]} | {round(effs[pair]/wl_ceiling[pair], 2)} |"
        for pair in effs
    )
    # Preserve manually-curated sections (skew analyses, round records,
    # validity criteria) across regenerations: everything at/after the
    # marker survives a rewrite of the generated report above it.
    path = os.path.join(repo, "BENCH", "BASELINE.md")
    marker = "<!-- MANUAL SECTIONS (preserved across bench_scaling.py runs) -->"
    tail = ""
    if os.path.exists(path):
        old = open(path).read()
        if marker in old:
            tail = old[old.index(marker):]
    with open(path, "w") as f:
        f.write(
            f"""# BENCH/BASELINE — scaling efficiency (N vs 4N proxy)

The north_rule's two-cluster-size criterion cannot use a real cluster in
this sandbox; per BASELINE.md it is evidenced by running the identical
extraction job at two parallelism levels on the same pre-built interleaved
corpus ({n_docs} docs, sf = {report['sf']} replicated x{args.replicate} into the
work-dominated regime).  Primary pair: **local[4] vs local[16]** ("N and 4N
cores"); supplementary: local[8] vs local[32].

Methodology (BASELINE.md): fresh JVM per launch; launches interleaved
across levels ({args.launches} launches x {args.inner} timed in-JVM repeats per level);
every timed run gated on a fast-host window — a single-process CPU spin
probe must reach >= 94% of the best spin rate ever observed this session
before the timed run starts (co-tenant interference on this VM mostly does
NOT appear as steal time; it appears as reduced effective CPU speed, which
the probe measures directly).  The probe ratio immediately before and
after each run is recorded below as (pre, post); a run bracketed by
~1.0/~1.0 executed on a fast host.  Best-of pooled per level —
identical runs vary >10x under interference bursts, and interference only
ever adds time.  Two ceilings accompany the measurement: ``spin`` is a
pure-CPU multiprocessing spin loop at the same process counts
(scheduler/steal effects only), and ``workload`` is the extraction kernel
itself (decode_media_payload) under plain multiprocessing with zero Spark —
the truest bound for what this computation can scale to on this host
(memory-system contention included, framework excluded).

| level | runs (sec) | host speed (pre, post) | best (sec) | throughput (docs/sec) |
|---|---|---|---|---|
{level_rows}

| pair | min-over-all efficiency | clean-pair efficiency | spin ceiling | workload ceiling | min-over-all / workload ceiling |
|---|---|---|---|---|---|
{eff_rows}

**Primary scaling efficiency (4 -> 16 cores)** = **{primary}**
(target >= 0.8: {"PASS" if report["pass"] else "FAIL"}).
Rule: a RATIO needs both ends measured under comparable host conditions —
min-over-all is correct for a single query's record (interference only
adds time) but not for a quotient, where a dirty-bracket minimum at one
level against a clean minimum at the other biases the ratio either way.
The primary number is therefore the CLEAN-PAIR efficiency (best run whose
both spin probes cleared 0.94, at each level) whenever every level holds
one; the min-over-all ratio stays in the table for transparency.

The supplementary 8->32 pair is reported for transparency.  The ceilings
are themselves point measurements on a shared host and can come out noisy
(a value > 1 means the lower-count run of the ceiling probe was itself
interfered with); the workload ceiling is the more meaningful of the two
because it runs the actual kernel.  ``measured / workload ceiling`` shows
how close the Spark pipeline gets to what this computation can do on this
host with zero framework.

generated {report['generated']}; identical deterministic input at every
level, warm-up repeat excluded via best-of, noop sink so no collect/write
skew.

"""
        )
        f.write(tail if tail else marker + "\n")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
