"""Lineage, metrics and checkpointed resume (SURVEY.md §4.3.3; north_rule).

Production shape: Iceberg snapshot per completed partition-batch — atomic
commits, resume = anti-join pending doc_ids against the committed output.
The Iceberg jars are not in this image, so this module implements the same
protocol on parquet + a manifest directory:

  out_dir/
    data/batch=<id>/      extracted rows for one doc-batch  (parquet)
    metrics/batch=<id>/   per-media-span metric/error rows  (parquet)
    _manifest/<id>.json   written ATOMICALLY (tmp+rename) after both
                          writes succeed — the commit record

A re-run lists committed batch ids, anti-joins them away, and processes
only the remainder; killed-mid-run work is invisible (no manifest) and is
redone exactly once.  Batches are ``pmod(xxhash64(doc_id), n_batches)`` —
deterministic, uniform, and computable on both sides of the resume.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import extract_cue_rows, split_side_channel

__all__ = ["committed_batches", "pending_documents", "run_with_checkpoints"]


def committed_batches(out_dir: str) -> list[int]:
    mdir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(mdir):
        return []
    return sorted(
        int(f[:-5]) for f in os.listdir(mdir) if f.endswith(".json")
    )


def _with_batch(documents: DataFrame, n_batches: int) -> DataFrame:
    return documents.withColumn(
        "_batch", F.pmod(F.xxhash64("doc_id"), F.lit(n_batches)).cast("int")
    )


def pending_documents(documents: DataFrame, out_dir: str, n_batches: int) -> DataFrame:
    """Documents not yet covered by a committed batch (the resume scan)."""
    done = set(committed_batches(out_dir))
    df = _with_batch(documents, n_batches)
    if done:
        df = df.filter(~F.col("_batch").isin(sorted(done)))
    return df


def _commit(out_dir: str, batch_id: int, payload: dict) -> None:
    mdir = os.path.join(out_dir, "_manifest")
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".{batch_id}.json.tmp")
    final = os.path.join(mdir, f"{batch_id}.json")
    with open(tmp, "w") as f:
        json.dump(payload, f, sort_keys=True)
    os.rename(tmp, final)  # atomic on POSIX — the Iceberg-commit stand-in


def run_with_checkpoints(
    spark: SparkSession,
    documents: DataFrame,
    out_dir: str,
    n_batches: int = 8,
    mode: str = "fused",
    max_batches: int | None = None,
    **extract_kw,
) -> list[int]:
    """Extract with per-batch snapshot commits; idempotent on re-run.

    ``max_batches`` limits work this invocation (used by tests to simulate
    a mid-run kill).  Returns the batch ids committed by THIS run.
    """
    from .pipeline import assemble_spans

    done_before = set(committed_batches(out_dir))
    df = _with_batch(documents, n_batches)
    committed_now: list[int] = []
    for batch_id in range(n_batches):
        if batch_id in done_before:
            continue
        if max_batches is not None and len(committed_now) >= max_batches:
            break
        batch_docs = df.filter(F.col("_batch") == batch_id).drop("_batch")
        t0 = time.perf_counter()
        # kernel runs once: the flat rows are cached and feed both the
        # extracted table and the metrics side-channel
        flat = extract_cue_rows(batch_docs, mode=mode, **extract_kw).cache()
        try:
            _cues, side = split_side_channel(flat)
            extracted = assemble_spans(batch_docs, flat)
            data_path = os.path.join(out_dir, "data", f"batch={batch_id}")
            metrics_path = os.path.join(out_dir, "metrics", f"batch={batch_id}")
            extracted.write.mode("overwrite").parquet(data_path)
            side.write.mode("overwrite").parquet(metrics_path)
            n_docs = spark.read.parquet(data_path).count()
            n_side = spark.read.parquet(metrics_path).count()
        finally:
            flat.unpersist()
        _commit(
            out_dir,
            batch_id,
            {
                "batch": batch_id,
                "n_docs": n_docs,
                "n_metric_rows": n_side,
                "wall_s": round(time.perf_counter() - t0, 3),
                "mode": mode,
            },
        )
        committed_now.append(batch_id)
    return committed_now
