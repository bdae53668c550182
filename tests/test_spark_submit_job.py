"""E2E: the north_rule submission contract — ``spark-submit --py-files``.

Packages the engine into dist/pgstosrt_spark.zip, then runs the real
``jobs/extract_job.py`` entrypoint via ``spark-submit --py-files`` from a
NEUTRAL working directory (the repo is not on sys.path in the child), so
the import genuinely resolves from the zip — the same way executors on a
real cluster receive the code.  Exercises the checkpointed-resume protocol
across two submissions (kill-after-2-batches, then resume) and verifies the
final span sequences against the pure-Python oracle.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)


def _submit(tmpdir: str, zip_path: str, job: str, *job_args: str) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only source of the pkg
    env["SPARK_GRAFT_CPUS"] = "4"
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--py-files",
            zip_path,
            job,
            *job_args,
        ],
        capture_output=True,
        text=True,
        cwd=tmpdir,  # neutral cwd: repo not importable implicitly
        env=env,
        check=True,
        timeout=600,
    )
    last = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(last)


def test_spark_submit_pyfiles_checkpointed_resume(spark, tmp_path):
    from pgstosrt_spark.fixtures.corpus import expected_extracted_rows
    from pgstosrt_spark.metrics import committed_batches
    from pgstosrt_spark.fixtures.corpus import synthesize_documents

    # small corpus written by the test session; the job only sees parquet
    corpus = str(tmp_path / "corpus")
    # deterministic orderBy before limit: an unordered limit(120) is not
    # guaranteed to pick the same rows across the two evaluations below
    # (corpus keep-list here, oracle expectation later)
    src = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(120)
    )
    docs_pdf = src.toPandas()
    keep = spark.createDataFrame(docs_pdf[["doc_id"]].astype(str))
    synthesize_documents(spark, "/root/testdata/sf0.001").join(
        keep, on="doc_id", how="inner"
    ).write.parquet(corpus)

    out_dir = str(tmp_path / "out")
    zip_path = os.path.join(REPO, "dist", "pgstosrt_spark.zip")
    sys.path.insert(0, REPO)
    from package_pyfiles import build

    build()
    job = os.path.join(REPO, "jobs", "extract_job.py")

    # run 1: commit only 2 of 4 batches (simulated kill)
    r1 = _submit(str(tmp_path), zip_path, job, "--input", corpus, "--output", out_dir,
                 "--n-batches", "4", "--max-batches", "2")
    assert len(r1["committed_this_run"]) == 2
    assert committed_batches(out_dir) == sorted(r1["committed_this_run"])

    # run 2: resume — completes the remaining batches, never re-commits done ones
    r2 = _submit(str(tmp_path), zip_path, job, "--input", corpus, "--output", out_dir,
                 "--n-batches", "4")
    assert not set(r1["committed_this_run"]) & set(r2["committed_this_run"])
    assert committed_batches(out_dir) == [0, 1, 2, 3]

    # value check: final output == pure-Python oracle for every doc
    got_df = spark.read.parquet(os.path.join(out_dir, "data"))
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
        for r in got_df.collect()
    }
    expected = {
        str(row.doc_id): [
            (s["kind"], s["text"], s["media_ref"])
            for s in expected_extracted_rows(str(row.doc_id), row.text)
        ]
        for row in src.collect()
    }
    assert set(got) == set(expected)
    assert got == expected

    # lineage side-channel landed too: exactly one _metric row per media span
    from pgstosrt_spark.fixtures.corpus import doc_to_span_rows

    n_media = sum(
        1
        for row in src.collect()
        for s in doc_to_span_rows(str(row.doc_id), row.text)
        if s["kind"] == "media"
    )
    metrics = spark.read.parquet(os.path.join(out_dir, "metrics"))
    assert metrics.filter(metrics.kind == "_metric").count() == n_media
    assert metrics.filter(metrics.kind == "_error").count() == 0
