"""End-to-end Spark pipeline tests: span-sequence equality vs the oracle.

The correctness contract (BASELINE.json): per doc, the extracted span
sequence equals the pure-Python oracle on (kind, text, media_ref, order).
"""

from __future__ import annotations

import base64

import pytest
from pyspark.sql import functions as F

from pgstosrt_spark.fixtures import corpus, encoder as enc
from pgstosrt_spark.pipeline import extract, extract_cue_rows, split_side_channel
from pgstosrt_spark.sources.tables import DOCUMENTS_SCHEMA

SF_DIR = "/root/testdata/sf0.001"


def _expected(doc_rows):
    return {
        d: [(s["kind"], s["text"], s["media_ref"]) for s in corpus.expected_extracted_rows(d, t)]
        for d, t in doc_rows
    }


def _collect_spans(df):
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def small_docs(spark):
    """16 synthesized interleaved docs covering all corpus variants."""
    src = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text").limit(16)
    rows = [(str(r["doc_id"]), r["text"]) for r in src.collect()]
    docs = spark.createDataFrame(
        [{"doc_id": d, "spans": corpus.doc_to_span_rows(d, t)} for d, t in rows],
        schema=DOCUMENTS_SCHEMA,
    )
    return docs, rows


def test_extract_fused_matches_oracle(spark, small_docs):
    docs, rows = small_docs
    got = _collect_spans(extract(docs))
    assert got == _expected(rows)


def test_extract_two_phase_matches_fused(spark, small_docs):
    docs, rows = small_docs
    fused = _collect_spans(extract(docs, mode="fused"))
    two_phase = _collect_spans(extract(docs, mode="two_phase"))
    assert two_phase == fused == _expected(rows)


def test_extract_balance_equivalent(spark, small_docs):
    docs, rows = small_docs
    got = _collect_spans(extract(docs, balance=True, rebalance_partitions=4))
    assert got == _expected(rows)


def test_span_order_is_offset_then_seq(spark):
    """Cues from one media span keep stream order; spans keep doc order."""
    cues = [("CUE ONE", 90_000, 135_000), ("CUE TWO", 180_000, 225_000)]
    payload = base64.b64encode(enc.build_sup_from_cues(cues)).decode()
    docs = spark.createDataFrame(
        [
            {
                "doc_id": "d1",
                "spans": [
                    {"kind": "text", "text": "intro", "media_ref": "", "offset": 0},
                    {"kind": "media", "text": payload, "media_ref": "pgs://d1/0", "offset": 1},
                    {"kind": "text", "text": "outro", "media_ref": "", "offset": 2},
                ],
            }
        ],
        schema=DOCUMENTS_SCHEMA,
    )
    [row] = extract(docs).collect()
    kinds = [s["kind"] for s in row["spans"]]
    texts = [s["text"] for s in row["spans"]]
    assert kinds == ["text", "cue", "cue", "text"]
    assert texts[0] == "intro" and texts[3] == "outro"
    assert texts[1].endswith("CUE ONE") and texts[2].endswith("CUE TWO")
    offsets = [s["offset"] for s in row["spans"]]
    assert offsets == [0, 1, 1, 2]


def test_metrics_side_channel_and_error_rows(spark):
    good = base64.b64encode(enc.build_sup_from_cues([("OK", 90_000, 180_000)])).decode()
    bad = base64.b64encode(b"MKPG" + b"\xff" * 8).decode()  # truncated container
    docs = spark.createDataFrame(
        [
            {
                "doc_id": "d1",
                "spans": [
                    {"kind": "media", "text": good, "media_ref": "pgs://d1/0", "offset": 0},
                    {"kind": "media", "text": bad, "media_ref": "pgs://d1/1", "offset": 1},
                ],
            }
        ],
        schema=DOCUMENTS_SCHEMA,
    )
    rows = extract_cue_rows(docs)
    cues, side = split_side_channel(rows)
    side_rows = {r["kind"]: r for r in side.collect()}
    assert "_metric" in side_rows and "_error" in side_rows
    assert '"cues": 1' in side_rows["_metric"]["text"]
    assert cues.count() == 1
    # errors never silently vanish from the side channel, but the extracted
    # output keeps only the success path (reference drops failed items)
    [doc] = extract(docs).collect()
    assert [s["kind"] for s in doc["spans"]] == ["cue"]

    # per-partition lineage rollup: payload/cue/byte/wall totals reconcile
    from pgstosrt_spark.metrics import partition_lineage

    lin = partition_lineage(side).collect()
    assert sum(r["n_payloads"] for r in lin) == 1  # the good payload
    assert sum(r["n_cues"] for r in lin) == 1
    assert all(r["n_errors"] == 1 for r in lin)  # the bad payload, global
    assert all(r["wall_ms"] >= 0 and r["n_bytes"] > 0 for r in lin)


def test_all_failed_doc_keeps_shape(spark):
    """A doc whose ONLY span is a corrupt media payload must still appear
    in the extracted table (empty spans) — shape preservation; the error
    itself lands in the side channel, never silently."""
    bad = base64.b64encode(b"MKPG" + b"\xff" * 8).decode()
    docs = spark.createDataFrame(
        [
            {
                "doc_id": "only-bad",
                "spans": [
                    {"kind": "media", "text": bad, "media_ref": "pgs://b/0", "offset": 0}
                ],
            }
        ],
        schema=DOCUMENTS_SCHEMA,
    )
    [doc] = extract(docs).collect()
    assert doc["doc_id"] == "only-bad" and doc["spans"] == []
    _cues, side = split_side_channel(extract_cue_rows(docs))
    assert side.filter(side.kind == "_error").count() == 1


def test_media_only_and_text_only_docs(spark):
    payload = base64.b64encode(enc.build_sup_from_cues([("SOLO", 90_000, 180_000)])).decode()
    docs = spark.createDataFrame(
        [
            {"doc_id": "t", "spans": [{"kind": "text", "text": "just text", "media_ref": "", "offset": 0}]},
            {"doc_id": "m", "spans": [{"kind": "media", "text": payload, "media_ref": "pgs://m/0", "offset": 0}]},
        ],
        schema=DOCUMENTS_SCHEMA,
    )
    got = _collect_spans(extract(docs))
    assert got["t"] == [("text", "just text", "")]
    assert got["m"] == [("cue", "00:00:01,000 --> 00:00:02,000\nSOLO", "pgs://m/0")]


def test_skew_doc_many_media_spans(spark):
    """F14 skew: one doc with many media spans — two-phase == fused."""
    spans = []
    for i in range(60):
        p = base64.b64encode(
            enc.build_sup_from_cues([(f"SKEW {i}", 90_000 + i * 90_000, 135_000 + i * 90_000)])
        ).decode()
        spans.append({"kind": "media", "text": p, "media_ref": f"pgs://skew/{i}", "offset": i})
    docs = spark.createDataFrame([{"doc_id": "skew", "spans": spans}], schema=DOCUMENTS_SCHEMA)
    fused = _collect_spans(extract(docs))
    two_phase = _collect_spans(extract(docs, mode="two_phase", rebalance_partitions=8))
    assert fused == two_phase
    assert len(fused["skew"]) == 60


def test_skew_bench_corpus_mode_equivalence(spark):
    """The bench's skewed corpus (1 wide doc + monster single-span docs,
    fixtures.corpus.synthesize_skewed_documents) must extract identically
    under fused / two_phase / two_phase-AQE-width / size_bucketed — the
    skew bench (VERDICT r2 item 2) times these modes, so their
    equivalence is the precondition for the comparison meaning anything."""
    from pgstosrt_spark.fixtures.corpus import synthesize_skewed_documents

    sk = synthesize_skewed_documents(
        spark, n_wide_spans=64, n_monster_docs=2, monster_cues=40, wide_cues=2
    ).cache()
    shapes = sorted(
        (r["doc_id"], r["n"])
        for r in sk.select("doc_id", F.size("spans").alias("n")).collect()
    )
    assert shapes == [
        ("skew-monster-0", 1),
        ("skew-monster-1", 1),
        ("skew-wide-0", 64),
    ]
    want = _collect_spans(extract(sk, mode="fused"))
    assert len(want["skew-monster-0"]) == 40
    assert _collect_spans(extract(sk, mode="two_phase")) == want
    assert (
        _collect_spans(extract(sk, mode="two_phase", rebalance_partitions="aqe"))
        == want
    )
    assert (
        _collect_spans(extract(sk, mode="size_bucketed", size_threshold=4096)) == want
    )
    sk.unpersist()


def test_size_bucketed_matches_fused(spark, small_docs):
    docs, rows = small_docs
    # threshold of 2 KB routes some payloads through each path
    got = _collect_spans(extract(docs, mode="size_bucketed", size_threshold=2048))
    assert got == _expected(rows)


def test_srt_render_matches_pure_python(spark, small_docs):
    """O5: Spark-side SubRip rendering == pgs.srt.render_srt byte-for-byte."""
    from pgstosrt_spark.pgs.decode import decode_media_payload
    from pgstosrt_spark.pipeline import render_srt_documents

    docs, rows = small_docs
    got = {
        (r["doc_id"], r["media_ref"]): r["srt"]
        for r in render_srt_documents(docs).collect()
    }
    expected = {}
    for d, t in rows:
        for span in corpus.doc_to_span_rows(d, t):
            if span["kind"] != "media":
                continue
            cues = decode_media_payload(base64.b64decode(span["text"]))
            blocks = []
            for _seq, cue in cues:
                tc, text = cue.split("\n", 1)
                start, end = tc.split(" --> ")
                blocks.append((start, end, text))
            srt = "\r\n".join(
                f"{n}\r\n{s} --> {e}\r\n{x}\r\n" for n, (s, e, x) in enumerate(blocks, 1)
            ) + ("\r\n" if blocks else "")
            if blocks:
                expected[(d, span["media_ref"])] = srt
    assert got == expected
