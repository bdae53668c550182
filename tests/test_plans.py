"""Physical-plan assertions: the optimizations the engine relies on must
actually appear in the executed plan (predicate pushdown, column pruning,
broadcast joins, partial aggregation) — SURVEY.md §4.3 / the scale story.
"""

from __future__ import annotations

import pytest

from pgstosrt_spark.operators import relational as rel

SF_DIR = "/root/testdata/sf0.01"


def _plan(df, mode: str = "formatted") -> str:
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    return jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_filter_pushdown_and_column_pruning(spark):
    plan = _plan(rel.filter_project(spark, SF_DIR))
    assert "PushedFilters" in plan
    assert "EqualTo(event_type,click)" in plan.replace(" ", "").replace("'", "") or (
        "event_type" in plan and "PushedFilters: []" not in plan
    )
    # column pruning: props (unused) must not be read
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "props" not in read_schema[0]


def test_broadcast_join_is_broadcast(spark):
    plan = _plan(rel.broadcast_join_enrich(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_partial_aggregation_before_shuffle(spark):
    # map-side combine: HashAggregate appears both before and after Exchange
    plan = _plan(rel.pricing_summary(spark, SF_DIR), mode="simple")
    first_exchange = plan.find("Exchange")
    assert first_exchange > 0
    assert "HashAggregate" in plan[first_exchange:]
    assert "HashAggregate" in plan[:first_exchange] or "partial" in plan.lower()


def test_sketch_ops_stay_in_codegen_aggregates(spark):
    """simhash/minhash signatures must be explode + HashAggregate (with a
    map-side partial pass), NOT higher-order array folds — Spark evaluates
    HOF lambdas interpreted per element, which benched 10x slower and is
    the difference between surviving wide documents at scale or not."""
    from pgstosrt_spark.functions import dedup as dd

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    for df in (dd.simhash(docs), dd.minhash_signature(docs)):
        plan = _plan(df, mode="simple")
        assert "HashAggregate" in plan
        assert "Generate explode" in plan or "Generate" in plan
        # map-side combine before the one shuffle
        first_exchange = plan.find("Exchange")
        assert first_exchange > 0 and "HashAggregate" in plan[first_exchange:]
        assert "aggregate(" not in plan, "array-fold HOF back in the hot path"
        assert "WindowExec" not in plan


def test_embed_text_one_shuffle_pruned_scan(spark):
    """embed_text's scale shape: exactly ONE exchange (the per-doc
    aggregate, map-side combined to a dim-column row), and the parquet
    scan pruned to (doc_id, text)."""
    from pgstosrt_spark.functions import embed as embd

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    plan = _plan(embd.embed_text(docs, dim=64, n=4), mode="simple")
    assert plan.count("Exchange") == 1, plan
    first_exchange = plan.find("Exchange")
    assert "HashAggregate" in plan[:first_exchange]  # map-side partial
    assert "HashAggregate" in plan[first_exchange:]
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in _plan(
        embd.embed_text(docs, dim=8, n=4), mode="formatted"
    )


def test_bucketed_join_colocates_without_shuffle(spark, tmp_path):
    """The 100 TB co-location technique (SURVEY.md §4.3): two tables
    bucketed + sorted on the join key join with ZERO Exchange — at scale
    this is how repeated doc_id joins (resume anti-joins, metrics
    enrichment) avoid reshuffling the corpus every run."""
    from pyspark.sql import functions as F

    # warehouse dir is a static conf — bucketed tables land in the default
    # spark-warehouse; DROP TABLE below removes the managed data
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("v")
    )
    for name in ("t_bucket_a", "t_bucket_b"):
        df.write.bucketBy(8, "doc_id").sortBy("doc_id").mode("overwrite").saveAsTable(
            name
        )
    try:
        # hint forces SMJ (AQE would broadcast this tiny table; at corpus
        # scale SMJ is what actually runs, and bucketing must feed it)
        joined = spark.table("t_bucket_a").hint("merge").join(
            spark.table("t_bucket_b"), "doc_id"
        )
        plan = _plan(joined, mode="simple")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert joined.count() == 1000
    finally:
        for name in ("t_bucket_a", "t_bucket_b"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_no_global_window_anywhere(spark):
    """'No Partition Defined for Window' = all rows to one partition; the
    round-1 IVF centroid numbering did this — keep it out of every ANN op."""
    from pyspark.sql import functions as F

    from pgstosrt_spark.functions import similarity as sim

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    for df in (
        sim.ivf_topk(emb, q),
        sim.lsh_topk(emb, q),
        sim.embedding_near_dup(emb, threshold=0.9),
    ):
        plan = _plan(df, mode="simple")
        # a Window line renders '[exprs], [partition], [order]' when
        # partitioned (two '], [' separators) but only '[exprs], [order]'
        # for the all-rows-to-one-partition global window (one separator)
        for line in plan.splitlines():
            if "Window [" in line:
                assert line.count("], [") >= 2, f"global window: {line[:120]}"
        assert "CartesianProduct" not in plan


def test_lsh_topk_broadcast_bucket_join(spark):
    """lsh_topk candidates come from a broadcast bucket equi-join on
    (band, bits) with the tiny query side — never a nested-loop/cartesian
    enumeration of the corpus pairs."""
    from pyspark.sql import functions as F

    from pgstosrt_spark.functions import similarity as sim

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    plan = _plan(sim.lsh_topk(emb, q), mode="simple")
    assert "BroadcastHashJoin" in plan, plan[:400]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_near_dup_assignment_computed_once(spark):
    """persist_assignment=True (VERDICT r2 item 6): the corpus-sized
    assignment feeds the cell-size count and both pair-join sides — the
    plan must read it from the cache (InMemoryTableScan) at every consumer
    instead of re-running the centroid-argmax aggregation per branch."""
    from pyspark.sql import functions as F

    from pgstosrt_spark.functions import similarity as sim

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = _plan(sim.embedding_near_dup(emb, threshold=0.9), mode="simple")
    # three consumers of the assignment: sizes agg + join sides a and b —
    # each must be an InMemoryTableScan of the persisted assignment (the
    # same cache executes once; explain re-prints its lineage per scan, so
    # node-text counts below the scans are not meaningful)
    assert plan.count("InMemoryTableScan") >= 3, plan[:400]
    sim.unpersist_ivf_caches()


def test_extraction_plan_single_pass_no_payload_shuffle(spark):
    """Fused mode: the only Exchange is the final groupBy(doc_id) of small
    string rows — base64 payloads never shuffle."""
    import base64

    from pgstosrt_spark.fixtures import encoder as enc
    from pgstosrt_spark.pipeline import extract
    from pgstosrt_spark.sources.tables import DOCUMENTS_SCHEMA

    payload = base64.b64encode(enc.build_sup_from_cues([("X", 90_000, 180_000)])).decode()
    docs = spark.createDataFrame(
        [
            {
                "doc_id": "d",
                "spans": [
                    {"kind": "media", "text": payload, "media_ref": "pgs://d/0", "offset": 0}
                ],
            }
        ],
        schema=DOCUMENTS_SCHEMA,
    )
    plan = _plan(extract(docs, balance=False), mode="simple")
    # the kernel runs BEFORE any exchange; exchanges appear only above it
    kernel_pos = plan.find("MapInPandas")
    assert kernel_pos > 0
    below_kernel = plan[kernel_pos:]
    assert "Exchange" not in below_kernel, "payload bytes would shuffle"

    # auto mode on an under-partitioned input adds exactly the rebalance
    plan_auto = _plan(extract(docs.coalesce(1), balance="auto"), mode="simple")
    kernel_pos = plan_auto.find("MapInPandas")
    assert "Exchange" in plan_auto[kernel_pos:], "auto-balance should engage"


def test_asof_join_is_single_shuffle_no_join(spark):
    """asof_join_last_view is union-tag + one windowed pass — the plan must
    contain NO join operator at all and exactly one hashpartitioning
    exchange (on user_id); an inequality-join formulation would plan a
    BroadcastNestedLoop/SortMerge with a range condition and explode at
    scale."""
    plan = _plan(rel.asof_join_last_view(spark, SF_DIR), mode="simple")
    assert "Join" not in plan, plan
    shuffles = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert len(shuffles) == 1, plan


def test_range_band_join_broadcasts_band_side(spark):
    """The 8-row band dim must ship broadcast (nested-loop over a tiny
    side), never a shuffle of the event side for the inequality join."""
    plan = _plan(rel.range_band_join(spark, SF_DIR), mode="simple")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_argmax_single_pass_has_no_window(spark):
    """argmax via struct-max must stay a hash aggregate with a map-side
    partial pass — the whole point of the operator is avoiding the ranking
    window's per-group sort."""
    plan = _plan(rel.argmax_single_pass(spark, SF_DIR), mode="simple")
    assert "Window" not in plan, plan
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_above_avg_scalar_is_broadcast(spark):
    """The 1-row aggregate must reach the fact side as a broadcast, so the
    orders scan streams exactly once per side without a shuffle exchange
    for the comparison."""
    plan = _plan(rel.above_avg_filter(spark, SF_DIR), mode="simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan


def test_hash_sampling_stable_under_repartitioning(spark):
    """The sampling ops' core claim: keep decisions are content-hashed, so
    the selected id set is identical no matter how the input is
    partitioned (df.sample/sampleBy seed per partition and break this)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    fp = F.md5(F.col("doc_id").cast("string").cast("binary"))
    base = sorted(
        r["doc_id"]
        for r in docs.filter(F.substring(fp, 1, 2) <= "19").select("doc_id").collect()
    )
    for n in (3, 17):
        again = sorted(
            r["doc_id"]
            for r in docs.repartition(n)
            .filter(F.substring(fp, 1, 2) <= "19")
            .select("doc_id")
            .collect()
        )
        assert again == base
    assert len(base) > 0


def test_shipping_priority_plan_shape(spark):
    """Q3 shape: filtered customer broadcasts, top-10 is a heap merge
    (TakeOrderedAndProject), never a global sort exchange; no cartesian."""
    plan = _plan(rel.shipping_priority(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # all three scans prune to the columns the query touches
    read_schema = "".join(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "c_name" not in read_schema and "l_quantity" not in read_schema


def test_local_supplier_volume_no_cartesian(spark):
    """Q5 shape: the c_nationkey = s_nationkey equality must ride existing
    joins as a filter, never become a nested-loop/cartesian edge."""
    plan = _plan(rel.local_supplier_volume(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_salted_skew_agg_two_phase(spark):
    """Salting must produce exactly two hash exchanges (salt fan-out then
    merge), with map-side partial aggregation before the first."""
    df = rel.salted_skew_agg(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2
    assert "partial_sum" in plan or "HashAggregate" in plan


def test_doc_chunks_is_shuffle_free(spark):
    """The training-sample cutter must stay narrow: no exchange at all —
    chunking inherits the scan partitioning."""
    from pgstosrt_spark.functions.text import chunk_documents

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Generate" in plan  # posexplode stays JVM-side, not a UDF


def test_salted_join_agg_no_broadcast_of_fact(spark):
    """The salted dim join must shuffle/broadcast only the EXPLODED dim
    (5 x 16 rows) — the fact side never replicates; and the final merge
    is one more exchange at most."""
    df = rel.salted_join_agg(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_keep_latest_single_exchange(spark):
    """CDC keep-latest: exactly one hash exchange (the key partition);
    the sort is partition-local."""
    df = rel.dedup_keep_latest(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan


def test_relational_division_domain_is_broadcast(spark):
    """The domain count (1 row) joins as a broadcast, never a shuffle."""
    df = rel.relational_division(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_training_set_chunks_one_exchange_pushed_filters(spark):
    """The composed training-set pipeline (quality -> lang -> exact dedup
    -> chunk) must be ONE plan with a single wide exchange (the dedup
    fingerprint window) and the quality/lang predicates inlined into the
    parquet scan, pruned to (doc_id, text, lang)."""
    from pgstosrt_spark.functions.text import training_set_chunks

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = training_set_chunks(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Exchange hashpartitioning(_fp" in plan
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "lang" in scan and "= en" in scan  # lang filter reached the scan
    assert "length(text" in scan  # quality predicate inlined, no self-join


def test_contamination_check_broadcasts_benchmark(spark):
    """Decontamination: the benchmark shingle set is the broadcast side;
    the probe corpus must never shuffle on shingle text — the only hash
    exchange is the final per-doc count aggregation."""
    from pgstosrt_spark.functions.text import contamination_check

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = contamination_check(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # exactly ONE shingle-keyed exchange is allowed: the benchmark side's
    # distinct (tiny by construction, combined map-side before it).  A
    # second would mean the PROBE corpus is shuffling on shingle text —
    # the corpus-wide shuffle this operator exists to avoid.
    assert plan.count("Exchange hashpartitioning(s#") == 1, plan


def test_pack_sequences_one_exchange_on_source(spark):
    """Sequence packing: ONE hash exchange on the shard key (source) —
    the prefix-sum window is partition-local after it."""
    from pgstosrt_spark.functions.text import pack_sequences

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = pack_sequences(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange hashpartitioning(source" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_json_props_extraction_stays_in_codegen(spark):
    """get_json_object runs JVM-side inside the scan stage: no Python
    eval, one partial+final hash aggregate pair around a single
    exchange."""
    df = rel.json_props_rollup(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # map-side combine: HashAggregate on both sides of the one exchange
    first_exchange = plan.find("Exchange")
    assert first_exchange != -1
    assert "HashAggregate" in plan[:first_exchange]
    assert "HashAggregate" in plan[first_exchange:]


def test_pii_scrub_is_narrow_codegen(spark):
    """PII masking must be a pure narrow map: zero exchanges, zero
    Python eval — it composes into any plan for free."""
    from pgstosrt_spark.functions.text import pii_scrub

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = pii_scrub(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dataset_manifest_single_agg_exchange(spark):
    """One partial+final aggregate pair around a single exchange; scan
    pruned to (source, text)."""
    from pgstosrt_spark.functions.text import dataset_manifest

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = dataset_manifest(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    first_exchange = plan.find("Exchange")
    assert "HashAggregate" in plan[:first_exchange]
    assert "HashAggregate" in plan[first_exchange:]
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "doc_id" not in scan.split("ReadSchema")[-1]


def test_full_outer_joins_aggregates_not_rows(spark):
    """The full-outer reconciliation joins two PRE-AGGREGATED sides:
    both HashAggregates must sit below the join, and no broadcast (full
    outer cannot broadcast) or cartesian appears."""
    df = rel.full_outer_reconcile(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan
    join_at = plan.find("Join FullOuter") if "Join FullOuter" in plan else plan.find("FullOuter")
    assert plan[join_at:].count("HashAggregate") >= 2  # both sides aggregated below


def test_quartiles_one_window_one_agg(spark):
    """Nearest-rank quartiles: one partition-local window sort + one
    aggregate — no second shuffle beyond the group key, no self-join."""
    df = rel.quartile_order_values(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_growth_accounting_calendar_bounded_window(spark):
    """The cumulative window runs over per-DAY rows (calendar-bounded):
    it must sit above the day aggregate, and the raw event scan feeds
    only the user-level min(ts) aggregate."""
    df = rel.user_growth_accounting(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # the global window input is the daily aggregate, not events: a
    # single-partition exchange over day rows is fine, over events is not
    win_at = plan.find("Window")
    assert "HashAggregate" in plan[win_at:]


def test_cohort_retention_no_cartesian_two_aggs(spark):
    df = rel.cohort_retention(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("HashAggregate") >= 4  # cohort agg + distinct + final (partial+final each)


def test_training_set_packed_two_exchanges(spark):
    """The composed pipeline-with-packing plan: exactly TWO hash
    exchanges — the dedup fingerprint window and the pack shard key —
    with the scan-inlined quality/lang predicates intact."""
    from pgstosrt_spark.functions.text import training_set_packed

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = training_set_packed(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Exchange hashpartitioning(_fp" in plan
    assert "Exchange hashpartitioning(shard" in plan
    assert "Exchange rangepartitioning" not in plan


def test_trailing_range_frame_no_self_join(spark):
    """The RANGE frame must be a window sweep, not the quadratic
    inequality self-join it replaces: one hash exchange on the customer
    key, a partition-local sort, zero joins."""
    df = rel.trailing_window_revenue(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "specifiedwindowframe(RangeFrame" in plan or "RANGE" in plan.upper()


def test_unpivot_is_narrow_expand(spark):
    """Melt must be an Expand over the aggregated wide rows — no join,
    no extra exchange beyond the one aggregation."""
    df = rel.unpivot_status_counts(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_funnel_single_pass_no_self_join(spark):
    """The funnel reads events ONCE: one user-grain aggregate, array
    HOFs for the later stages, no join back to the raw events."""
    df = rel.funnel_conversion(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("FileScan") == 1
