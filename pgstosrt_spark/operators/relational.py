"""Relational-skeleton operators (SURVEY.md §2.6).

Each function is the Spark half of a driver-verified query; the matching
DuckDB oracle SQL lives in ``__spark_entry__.oracle_sql``.  Reference
citations name the loop/LINQ construct the operator re-expresses.
All are pure DataFrame expressions — Catalyst handles pushdown, pruning,
join strategy (broadcast hints where the dimension side is provably small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style scan+filter+groupBy+agg+sort — the canonical OLAP
    shape (scan §2.6 row 1, group-by+agg row 6, sort row 7)."""
    li = _t(spark, sf_dir, "lineitem")
    # exact decimal arithmetic: double sums are order-dependent across
    # engines, decimal sums are associative -> oracle value-hash holds
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1).cast("decimal(18,2)") - disc)).cast("double").alias("sum_disc_price"),
            F.round(F.sum(qty).cast("double") / F.count("*"), 6).alias("avg_qty"),
            F.round(F.sum(disc).cast("double") / F.count("*"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate filter + projection (track/language filters,
    MkvUtilities.cs:105-109, PgsParser.cs:40) — pushdown-verified."""
    ev = _t(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.round("value", 6).alias("value")
    )


def window_lead_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-time backfill via lead() (BluRaySupParserImageSharp.cs:391-396):
    each event's end_ts = next event's ts within the user stream."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.lead("ts").over(w).alias("end_ts"),
    )


def run_length_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-duplicate collapse (merge A6 relational skeleton,
    :424-521): lag -> change flag -> cumulative run id -> per-run
    min(start)/max(end)/count, exactly the lag/cumsum/groupBy shape."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("chg"),
    )
    runs = flagged.withColumn(
        "run_id", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        runs.groupBy("user_id", "run_id", "event_type")
        .agg(
            F.min("ts").alias("run_start"),
            F.max("ts").alias("run_end"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "event_type", "run_start", "run_end", "n_events")
    )


def fragment_reassembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered per-group concat (ODS fragment reassembly A3, :399-422):
    per order, line flags concatenated in l_linenumber order."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("l_linenumber", "l_returnflag"))
                    ),
                    lambda x: x["l_returnflag"],
                ),
            ).alias("flags"),
            F.count("*").alias("n_fragments"),
        )
    )


def topk_per_group(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Top-K per group via row_number window (result re-ordering O4
    analog, PgsOcr.cs:110)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("o_custkey", "o_orderkey", "rnk", F.round("o_totalprice", 2).alias("total"))
    )


def broadcast_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-join on a small dimension (CompletePcs dict join analog,
    :164-189): lineitem x broadcast(part), revenue per brand."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(price * (F.lit(1).cast("decimal(18,2)") - disc))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def left_semi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence via left-semi (palettes.ContainsKey analog, :173)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100_000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


def left_anti_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (the checkpoint-resume primitive, SURVEY.md §4.3.3):
    customers with no orders = pending work."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def union_merge_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union of two filtered streams + global sort (per-track output
    concat, Runner.cs:38-42; span re-merge §3.4)."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "event_type")
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "event_type")
    return clicks.unionByName(views).orderBy("event_id")


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (absent in the reference — §2.6 completeness
    row): per (returnflag, linestatus) revenue with subtotal and grand
    total rows.  grouping_id disambiguates NULL-as-data from
    NULL-as-subtotal; decimal sums keep the oracle value-hash exact.
    Scale: rollup is a single shuffle with map-side partial aggregation
    over the grouping-set expansion — no extra pass per level."""
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.sum(price * (F.lit(1).cast("decimal(18,2)") - disc))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "revenue", "n_items")
    )


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics): customers holding both an open ('O') and
    a fulfilled ('F') order.  Spark plans this as a left-semi aggregate
    join — distinct-then-join, one shuffle per side."""
    o = _t(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_.intersect(done)


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics): customers with open orders but no
    fulfilled ones — the left-anti dual of :func:`set_intersect`.
    ``subtract`` is EXCEPT DISTINCT (set semantics): any appearance on the
    right removes the key entirely, unlike ``exceptAll``'s bag math."""
    o = _t(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_.subtract(done)


def global_topk(spark: SparkSession, sf_dir: str, k: int = 100) -> DataFrame:
    """Global ORDER BY + LIMIT: Spark executes TakeOrderedAndProject —
    per-partition top-k heaps merged at the driver, never a global sort
    shuffle, so it scales to any partition count."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(k)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total"))
    )


def asof_join_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (custom operator Spark lacks natively): for every click,
    the most recent view by the same user at or before the click ts.

    Implemented as union-tag + running ``last(ignorenulls)`` over one
    (user_id)-partitioned sort — ONE shuffle, no range-condition join.  The
    naive inequality join explodes to O(clicks x views) per user and plans
    as a nested-loop; this shape is O(n log n) per user partition and
    scales with AQE skew splitting.  Tie rules (pinned by the oracle): a
    view at exactly the click ts counts; among equal-ts views the highest
    event_id wins (sort key ts, is_click, event_id puts views first)."""
    ev = _t(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        "event_id",
        "ts",
        (F.col("event_type") == "click").cast("int").alias("is_click"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_click", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lastv = F.last(
        F.when(F.col("is_click") == 0, F.struct("ts", "event_id")),
        ignorenulls=True,
    ).over(w)
    return (
        tagged.withColumn("lastv", lastv)
        .filter(F.col("is_click") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
            F.col("lastv.ts").alias("view_ts"),
            F.col("lastv.event_id").alias("view_id"),
        )
    )


def range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join against a small in-memory band table: each
    event lands in the [lo, hi) bucket containing its value.  The band
    side is broadcast, so the inequality join is a BroadcastNestedLoop
    over 8 rows per event — never a shuffle, never a cartesian between two
    big sides.  At 100 TB the fact side streams through map tasks
    unchanged; only the 8-row dim ships."""
    ev = _t(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [(i, float(i * 50), float((i + 1) * 50)) for i in range(8)],
        "band_id INT, lo DOUBLE, hi DOUBLE",
    )
    j = ev.join(
        F.broadcast(bands),
        (ev.value >= bands.lo) & (ev.value < bands.hi),
    )
    return j.groupBy("band_id", "lo", "hi").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sum_value"),
    )


def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per priority spread across status columns.
    Explicit pivot values avoid the domain-DISCOVERY job (an eager extra
    scan+distinct over the fact table before the plan even builds) — the
    only pivot shape that scales.  The pivot itself plans as two
    aggregates, but the second runs over |priorities| x |statuses| rows,
    not the fact table."""
    o = _t(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )


def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation — all four grouping sets of (returnflag,
    linestatus) in one shuffle with map-side partial agg (the grouping-set
    expansion happens before the exchange, so levels don't multiply
    passes).  gid disambiguates subtotal NULLs exactly as in
    :func:`rollup_revenue`."""
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.sum(price * (F.lit(1).cast("decimal(18,2)") - disc))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "revenue", "n_items")
    )


def ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + percent_rank ranking windows: each customer's orders ranked
    into spend quartiles.  Partitioned by o_custkey — a HIGH-cardinality
    key, so window partitions stay small and spread across every executor
    (a global ntile, or one keyed by a 5-value column like order priority,
    concentrates the sort into as many tasks as there are key values — a
    scale-killer this operator exists to avoid)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


def hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% document sample via md5 prefix — the
    training-pipeline sampling primitive.  Unlike ``df.sample`` (seeded
    per-partition, changes under repartition), a content hash is stable
    across engines, runs, and partitionings — the property an auditable
    100 TB data pipeline needs for held-out splits.  md5 prefix '19' means
    P(keep) = 0x1A/0x100 ~ 10.2%; compare lexicographically so the oracle
    (DuckDB md5 of the same UTF-8 bytes) matches byte-for-byte."""
    d = _t(spark, sf_dir, "documents")
    fp = F.md5(F.col("doc_id").cast("string").cast("binary"))
    return d.filter(F.substring(fp, 1, 2) <= "19").select(
        "doc_id", "lang", "n_chars", fp.alias("sample_key")
    )


def gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (LOCF) over per-user event streams — the canonical
    sensor/telemetry gap repair.  Nulls are planted deterministically
    (event_id % 7 == 0) so both engines fill the same holes;
    ``last(ignorenulls)`` over an unbounded-preceding row frame carries
    the latest non-null value forward within the user partition — one
    shuffle on user_id, no self-join."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    holed = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_id") % 7 != 0, F.col("value")).alias("v"),
    )
    return holed.select(
        "user_id",
        "event_id",
        F.round(F.last("v", ignorenulls=True).over(w), 6).alias("filled_value"),
    )


def moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding row-frame aggregate: 4-event trailing average per user.
    The frame sum goes through exact decimals and the single IEEE division
    happens on identical operands in both engines, so the rounded result
    hashes identically.  Frame windows distribute like any ranking window
    — one shuffle on the partition key."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 0)
    )
    s = F.sum(F.col("value").cast("decimal(28,6)")).over(w).cast("double")
    n = F.count("*").over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.round(s / n, 6).alias("avg_4"),
    )


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum sampling — downsample the dominant
    language (en, ~25% keep) while keeping minority languages at double
    the rate (~50%), the standard corpus-rebalancing move.  Keep decisions
    hash the (doc_id, lang) pair, so they are stable across engines, runs
    and partitionings (unlike ``df.sampleBy``, which seeds per partition);
    the rate is a pure md5-prefix threshold, a narrow map with no shuffle
    at any scale."""
    d = _t(spark, sf_dir, "documents")
    fp = F.md5(
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("lang")).cast(
            "binary"
        )
    )
    limit = F.when(F.col("lang") == "en", F.lit("3f")).otherwise(F.lit("7f"))
    return d.filter(F.substring(fp, 1, 2) <= limit).select(
        "doc_id", "lang", fp.alias("strat_key")
    )


def above_avg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery filter: orders above the global average price.  The
    1-row aggregate is broadcast (crossJoin of a singleton), so the fact
    scan streams once; the average goes through an exact decimal sum so
    both engines derive bit-identical doubles before the one IEEE
    division."""
    o = _t(spark, sf_dir, "orders")
    stats = o.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("avg_tp")
    )
    return (
        o.crossJoin(F.broadcast(stats))
        .filter(F.col("o_totalprice") > F.col("avg_tp"))
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total"))
    )


def argmax_single_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group argmax via struct-max — a single hash aggregate with
    map-side combine, NO ranking window.  At scale this beats
    row_number()-then-filter (topk_per_group's shape) because nothing is
    sorted: the struct compares (price, orderkey) lexicographically, so
    ties break to the highest orderkey, pinned by the oracle's
    row_number DESC twin."""
    o = _t(spark, sf_dir, "orders")
    m = F.max(
        F.struct(F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k"))
    ).alias("m")
    return (
        o.groupBy("o_custkey")
        .agg(m)
        .select(
            "o_custkey",
            F.col("m.k").alias("best_order"),
            F.round("m.p", 2).alias("best_total"),
        )
    )


def time_bucket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed rollup (hypertable-style continuous aggregate):
    monthly order revenue.  date_format is a pure projection, so the plan
    is scan -> partial agg -> one exchange on ~80 month keys; at 100 TB
    you'd additionally partition the table by the same bucket so the scan
    prunes."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


def sessionize(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization (run-length session grouping §2.6):
    lag(ts) -> gap>threshold -> cumsum session id -> per-session agg."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                # NTZ -> LTZ -> epoch seconds (session TZ pinned to UTC)
                F.col("ts").cast("timestamp").cast("long")
                - F.lag("ts").over(w).cast("timestamp").cast("long")
                > gap_minutes * 60
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sess = flagged.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        # decimal sum: exact regardless of partition order (oracle parity)
        F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("total_value"),
    )


def median_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median (o_custkey -> median o_totalprice).

    Implemented as rank-the-middle rather than percentile()/median()
    builtins: engines disagree on interpolation corner cases, so both
    sides compute the SAME definition — sort each group by (value, key),
    take the one or two middle elements, and average them in INTEGER
    CENTS (prices are 2dp; summing cents is exact, and the final double
    division is the identical IEEE operation in both engines).  The
    output is deliberately NOT round()ed: an even-count midpoint lands on
    x.xx5, where Spark's round (decimal HALF_UP on the shortest string)
    and DuckDB's (on the binary double) disagree by a cent — the raw
    division is bit-identical instead.  Shape: one window over
    the group (partition-local sort, no corpus-wide ordering) + one
    aggregate; groups are customer-sized, so no partition ever holds more
    than one customer's orders at any scale.
    """
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = Window.partitionBy("o_custkey").orderBy("c", "o_orderkey")
    ranked = o.select("o_custkey", "o_orderkey", cents.alias("c")).select(
        "o_custkey",
        "c",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("o_custkey")).alias("n"),
    )
    mid = ranked.filter(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
    )
    return mid.groupBy("o_custkey").agg(
        (F.sum("c") / (F.count("*") * 100.0)).alias("median_total"),
        F.first("n").alias("n_orders"),
    )


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped 3-way join: revenue of unshipped BUILDING-segment
    orders as of a cutoff date, top 10.

    Plan shape (the point of the query): both date filters and the
    segment filter push into the parquet scans BEFORE either join; the
    filtered customer side is small, so Catalyst broadcasts it (AQE
    confirms at runtime); lineitem<->orders is the one real shuffle,
    keyed on l_orderkey; the final top-10 is TakeOrderedAndProject —
    per-partition heaps, no global sort exchange.  That plan holds at
    100 TB: one wide shuffle, everything else narrow or broadcast.
    Decimal revenue keeps the cross-engine value-hash exact; ties break
    on (o_orderdate, l_orderkey) so LIMIT is deterministic.
    """
    cutoff = "1996-03-15"
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(cutoff)
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(cutoff)
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(price * (F.lit(1).cast("decimal(18,2)") - disc))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped 6-way join: revenue per nation where the customer
    and supplier share a nation, ASIA region, one order-date year.

    Join-order showcase: region->nation is a 2-row broadcast chain whose
    keys fan onto supplier (broadcast — suppliers are 1% of customers in
    TPC-H and pre-filtered to one region here); customer is NOT broadcast
    (at 100 TB it is a fact-sized table), so the plan has exactly two
    wide shuffles — lineitem<->orders on the order key, then the result
    <->customer on the customer key — and the c_nationkey = s_nationkey
    equality is a cheap post-join filter on already-present columns,
    never a third fact-x-fact join.  AQE handles skew on both exchanges.
    """
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    asia_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(asia_nations),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_nationkey", "n_name")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(price * (F.lit(1).cast("decimal(18,2)") - disc))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase SALTED aggregation — the standard hot-key escape hatch,
    proven exact against a plain GROUP BY oracle.

    ``events.event_type`` has ~5 distinct values over the whole corpus: a
    naive groupBy funnels 100 TB into 5 reducers.  Phase 1 groups on
    (event_type, pmod(hash(event_id), 32)) — 32-way fan-out per hot key,
    partial sums combine map-side; phase 2 merges the 5x32 partials.
    Decimal partials make the two-phase sum bit-identical to the
    single-phase oracle (associativity), which is exactly what the
    driver's value-hash certifies.  At scale, salt width tracks executor
    count; the second shuffle moves only n_keys x salt rows.
    """
    ev = _t(spark, sf_dir, "events")
    val = F.round(F.col("value"), 6).cast("decimal(28,6)")
    partial = (
        ev.groupBy(
            "event_type", F.pmod(F.xxhash64("event_id"), F.lit(32)).alias("_salt")
        )
        .agg(F.sum(val).alias("_s"), F.count("*").alias("_n"))
    )
    return partial.groupBy("event_type").agg(
        F.sum("_s").cast("double").alias("total_value"),
        F.sum("_n").alias("n_events"),
    )


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the general form of rollup/cube (§2.6
    completeness): per-(status, priority) revenue plus independent
    per-status and per-priority marginals in ONE pass.  Like rollup,
    Spark expands the sets map-side and shuffles once; grouping_id
    disambiguates subtotal NULLs from data NULLs."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               count(*) AS n_orders
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority))
        """
    )


def percent_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank windows: percent_rank + cume_dist of each order's
    total within its priority class.  Both are rank arithmetic over one
    partition-local sort — same single exchange as any ranked window;
    (rank-1)/(n-1) and peers/n are identical IEEE divisions in both
    engines, so the hash check is exact.  Output thinned to the top
    decile to keep the driver compare small."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    ranked = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("total"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )
    return ranked.filter(F.col("pct_rank") >= 0.9)


def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (width_bucket-style):
    bucket = floor(total_cents / width).  Integer-cents bucketing keeps
    the edge cases (a price exactly on a boundary) engine-independent —
    no float floor ambiguity.  Plan: pure projection -> one partial-agg
    shuffle on ~20 bucket keys."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    width = 25_000 * 100  # 25k-dollar buckets, in cents
    return (
        o.select(
            (F.floor(cents / width)).cast("long").alias("bucket"),
            cents.alias("cents"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            (F.min("cents") / 100.0).alias("min_total"),
            (F.max("cents") / 100.0).alias("max_total"),
        )
    )


def distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) per day — the dedup-cardinality primitive.
    Spark plans distinct-within-group as a two-level aggregate (expand ->
    partial -> final): the wide shuffle carries (day, user_id) pairs
    already combined map-side, never raw events.  approx_count_distinct
    (HLL) is the sketch path when exactness can be traded; the exact form
    is the oracle here."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )


def dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style dedup: keep each user's LATEST event (row_number = 1 over
    ts desc).  The canonical change-capture compaction — one hash exchange
    on the key, partition-local sort, no global ordering; ties break on
    event_id so the survivor is deterministic under any partitioning."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "event_id", "ts", "event_type",
            F.round("value", 6).alias("value"),
        )
    )


def relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division ('for all'): customers holding orders in EVERY
    priority class.  Re-expressed as count-distinct-equals-domain-size —
    one aggregate + a broadcast scalar, instead of the textbook double
    NOT EXISTS (two anti-joins).  The domain count is a 1-row broadcast;
    the only wide edge is the per-customer distinct aggregate."""
    o = _t(spark, sf_dir, "orders")
    domain = o.select(
        F.countDistinct("o_orderpriority").alias("n_prio")
    )
    per_cust = o.groupBy("o_custkey").agg(
        F.countDistinct("o_orderpriority").alias("n_prio_cust"),
        F.count("*").alias("n_orders"),
    )
    return (
        per_cust.join(F.broadcast(domain))
        .filter(F.col("n_prio_cust") == F.col("n_prio"))
        .select("o_custkey", "n_orders")
    )


def correlated_avg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-aggregate filter: suppliers whose account balance beats
    their NATION's average.  The correlated subquery de-correlates to a
    group-average + broadcast join back (what Catalyst does to the SQL
    form too); integer-cents comparison keeps the > predicate
    engine-exact even when the average lands on a representable edge."""
    s = _t(spark, sf_dir, "supplier")
    cents = F.round(F.col("s_acctbal") * 100).cast("long")
    bal = s.select("s_suppkey", "s_nationkey", cents.alias("bal_c"))
    # per-nation average in exact cents: avg = sum/n compared cross-
    # multiplied (bal * n > sum) so no division rounding enters at all
    nat = bal.groupBy("s_nationkey").agg(
        F.sum("bal_c").alias("sum_c"), F.count("*").alias("n_s")
    )
    return (
        bal.join(F.broadcast(nat), "s_nationkey")
        .filter(F.col("bal_c") * F.col("n_s") > F.col("sum_c"))
        .select(
            "s_suppkey",
            "s_nationkey",
            (F.col("bal_c") / 100.0).alias("acctbal"),
        )
    )


def salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted JOIN — the hot-key fix for joins (the dual of
    :func:`salted_skew_agg`): events join a 5-row event-type dimension,
    so every dimension key is pathologically hot.  The fact side salts
    with pmod(hash, 16); the dimension side EXPLODES 16 copies (dim x
    salt is cheap — dims are small by definition); the join key becomes
    (event_type, salt), spreading each hot key over 16 reducers.  Proven
    exact against the unsalted join oracle.  At 100 TB: salt width
    tracks executor count, and the same pattern handles any dim join
    whose fact side skews."""
    ev = _t(spark, sf_dir, "events")
    n_salt = 16
    # deterministic inline dimension: type -> weight (length of the name)
    dim = (
        ev.select("event_type").distinct()
        .select("event_type", F.length("event_type").alias("weight"))
    )
    dim_salted = dim.select(
        "event_type", "weight",
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("_salt"),
    )
    ev_salted = ev.select(
        "event_type",
        F.round(F.col("value"), 6).cast("decimal(28,6)").alias("val"),
        F.pmod(F.xxhash64("event_id"), F.lit(n_salt)).alias("_salt"),
    )
    return (
        ev_salted.join(dim_salted, ["event_type", "_salt"])
        .groupBy("event_type")
        .agg(
            F.sum(F.col("val") * F.col("weight")).cast("double").alias("weighted_value"),
            F.count("*").alias("n_events"),
        )
    )


def json_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull a typed field out of a JSON
    string column and aggregate on it — the schema-on-read step every
    event pipeline runs before anything relational can happen.

    ``events.props`` carries a JSON object; ``get_json_object`` extracts
    ``$.k`` JVM-side (Jackson path evaluation inside whole-stage codegen
    — no Python, no full JSON parse into a map), cast to int, then one
    hash aggregate per event_type.  Malformed/missing keys become NULL
    and are excluded from avg/max but counted in n_missing, so dirty
    data is surfaced, not silently dropped.  At 100 TB: extraction is
    narrow (pipelined into the scan), the single shuffle carries only
    (event_type, partials); with columnar sources prefer a proper
    struct column so pruning skips the string entirely — this operator
    is the fallback for the JSON-string reality of raw event feeds.
    """
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count("k").alias("n_with_k"),
            (F.count("*") - F.count("k")).alias("n_missing"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


def full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — the two-ledger reconciliation shape (§2.6 join
    completeness): per-customer revenue from finished ('F') orders
    against open ('O') orders, keeping customers that appear in either
    ledger and labelling each row both/f_only/o_only.

    Both sides are pre-aggregated BEFORE the join (map-side combine →
    one exchange each), so the full-outer joins two customer-sized
    aggregates, never raw orders — at 100 TB the join input is bounded
    by |customers|, not |orders|.  The two aggregates and the join all
    hash-partition on the same key, so AQE plans the join without a
    third exchange.  Decimal sums; missing sides coalesce to exact 0.
    """
    o = _t(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")

    def side(status: str, tag: str) -> DataFrame:
        return (
            o.filter(F.col("o_orderstatus") == status)
            .groupBy("o_custkey")
            .agg(
                F.sum(price).alias(f"{tag}_rev"),
                F.count("*").alias(f"{tag}_orders"),
            )
        )

    f, op = side("F", "f"), side("O", "o")
    zero = F.lit(0).cast("decimal(28,2)")
    return (
        f.join(op, "o_custkey", "full_outer")
        .select(
            "o_custkey",
            F.coalesce(F.col("f_rev").cast("decimal(28,2)"), zero)
            .cast("double")
            .alias("f_revenue"),
            F.coalesce("f_orders", F.lit(0)).alias("f_orders"),
            F.coalesce(F.col("o_rev").cast("decimal(28,2)"), zero)
            .cast("double")
            .alias("o_revenue"),
            F.coalesce("o_orders", F.lit(0)).alias("o_orders"),
            F.when(F.col("f_rev").isNotNull() & F.col("o_rev").isNotNull(), "both")
            .when(F.col("f_rev").isNotNull(), "f_only")
            .otherwise("o_only")
            .alias("status"),
        )
    )


def quartile_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group quartiles (p25/p50/p75 of o_totalprice per
    customer) by NEAREST-RANK (type-1): rank = floor((n-1)*p) + 1 on the
    (value, key)-sorted group — a deterministic order statistic, no
    interpolation, so engines cannot disagree on corner cases (the same
    reasoning as :func:`median_order_value`, which keeps the two-middle
    average for the p50 tradition; this query picks actual data points).

    (n-1)*p is exact in binary for p ∈ {0.25, 0.5, 0.75} (dyadic
    rationals), so the rank arithmetic is bit-identical across engines.
    Shape: ONE window (partition-local sort within each customer) + one
    conditional aggregate — no second shuffle, no self-join; group size
    bounds the sort, so the plan survives any corpus scale.
    """
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = Window.partitionBy("o_custkey").orderBy("c", "o_orderkey")
    ranked = o.select("o_custkey", "o_orderkey", cents.alias("c")).select(
        "o_custkey",
        "c",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("o_custkey")).alias("n"),
    )

    def at(p: float) -> F.Column:
        r = F.floor((F.col("n") - 1) * F.lit(p)) + 1
        return F.max(F.when(F.col("rn") == r, F.col("c"))) / 100.0

    return ranked.groupBy("o_custkey").agg(
        at(0.25).alias("p25"),
        at(0.50).alias("p50"),
        at(0.75).alias("p75"),
        F.first("n").alias("n_orders"),
    )


def user_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per-day NEW users (first ever seen that day)
    and the running cumulative user count.

    First-seen detection is a min(ts) per user (one shuffle, map-side
    combined), rolled up to per-day new-user counts (second, tiny
    shuffle on ~days keys), then a running sum windowed over the day
    axis.  The final window is ordered over the DAY domain — thousands
    of rows at any corpus scale, so the single-partition cumulative sum
    is bounded by the calendar, never by the event count (the same
    bounded-domain argument as vocab_top_tokens' post-limit rank).
    """
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd").alias("first_day")
    )
    daily = first_seen.groupBy("first_day").agg(
        F.count("*").alias("new_users")
    )
    w = Window.orderBy("first_day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "first_day",
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-seen day
    (cohort), counted as active at each whole-day offset since their
    cohort day — the standard D1/D7/D30 retention input.

    Two shuffles total: min(ts) per user (cohort assignment), then one
    aggregate on (cohort_day, day_offset) after a broadcast-friendly
    join of per-user cohorts back onto distinct (user, activity-day)
    pairs.  The join side carries one row per user — at 100 TB scale
    that is the dimension table of this query, and it hash-joins on the
    same user_id partitioning the first aggregate produced, so AQE
    plans no extra exchange for it.  Distinct (user, day) BEFORE the
    count keeps multiplicity out (retention counts users, not events).
    """
    ev = _t(spark, sf_dir, "events")
    cohorts = ev.groupBy("user_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd").alias("cohort_day")
    )
    activity = ev.select(
        "user_id", F.date_format(F.col("ts"), "yyyy-MM-dd").alias("day")
    ).distinct()
    return (
        activity.join(cohorts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.to_date("day"), F.to_date("cohort_day"))
            .cast("long")
            .alias("day_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


def trailing_window_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (§2.6 frame-type completeness — every other
    window here uses ROWS): for each order, the customer's revenue over
    the trailing 30 days *of event time* (days 29-back through today),
    regardless of how many orders fall inside — the frame is defined by
    the ORDER-BY VALUE range, which ROWS frames cannot express when
    orders per day vary.

    The ordering key is the epoch-day integer (exact, engine-neutral);
    revenue sums are decimal so frame accumulation order cannot drift
    the value.  One hash exchange on the customer key; the range scan
    within each partition is the sorted-window sweep, O(group) with two
    pointers — no self-join (the naive equivalent is an inequality
    self-join that explodes quadratically on active customers).
    """
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")).alias("day_ord")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    base = o.select(
        "o_custkey", "o_orderkey", day, price.alias("p")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_ord")
        .rangeBetween(-29, 0)
    )
    return base.select(
        "o_custkey",
        "o_orderkey",
        F.col("day_ord").cast("long").alias("day_ord"),
        F.sum("p").over(w).cast("double").alias("trailing_30d_revenue"),
        F.count("*").over(w).alias("n_orders_30d"),
    )


def unpivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (§2.6 completeness — the inverse of `pivot_status`): a
    wide per-customer (F/O/P order-count) projection melted back to
    long (o_custkey, status, n_orders) rows via the built-in melt/stack
    expansion.

    The wide side is ONE conditional aggregate (single exchange); the
    unpivot itself is a narrow Expand — each row fans to 3 rows
    JVM-side with zero data movement, which is why melt scales freely
    while its inverse (pivot) needs a domain.  Zero-count cells are
    kept (explicit 0, not dropped) so the long table is dense and the
    twin is deterministic.
    """
    o = _t(spark, sf_dir, "orders")
    wide = o.groupBy("o_custkey").agg(
        F.sum((F.col("o_orderstatus") == "F").cast("long")).alias("F"),
        F.sum((F.col("o_orderstatus") == "O").cast("long")).alias("O"),
        F.sum((F.col("o_orderstatus") == "P").cast("long")).alias("P"),
    )
    return wide.unpivot(
        ids=["o_custkey"],
        values=["F", "O", "P"],
        variableColumnName="status",
        valueColumnName="n_orders",
    )


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: per user, the earliest strictly-ordered
    view -> click -> purchase chain, and the per-stage reach — the
    product-analytics conversion query.

    Stage timestamps form a chain of order-constrained minima:
    t_view = min(view ts), t_click = min(click ts > t_view),
    t_purchase = min(purchase ts > t_click) — the earliest-qualifying
    rule, the standard funnel definition.  ONE pass over the raw events
    collapses each user to (t_view, [click/purchase events]); the later
    stages are array higher-order functions over that per-user list, so
    the corpus is read once and never self-joined.  The list holds only
    the funnel-relevant event types per user — bounded by per-user
    engagement, the usual funnel-tool assumption; a heavy-hitter user
    stream would swap the array for one extra filtered aggregate per
    stage (same semantics, one more exchange each).

    Scale shape: the heavy input collapses at the FIRST aggregate to
    user grain; two exchanges total (user agg, then the single-row
    funnel rollup).
    """
    ev = _t(spark, sf_dir, "events")
    # stage 1: earliest view per user
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts")))
    per_user = ev.groupBy("user_id").agg(
        t1.alias("t_view"),
        F.collect_list(
            F.when(
                F.col("event_type").isin("click", "purchase"),
                F.struct("ts", "event_type"),
            )
        ).alias("later"),
    )
    # stages 2/3 from the (small, per-user) later-event array: earliest
    # click after t_view, earliest purchase after that click — array
    # HOFs, no second pass over the raw events
    click_ts = F.array_min(
        F.transform(
            F.filter(
                "later",
                lambda s: (s["event_type"] == "click")
                & (F.col("t_view").isNotNull())
                & (s["ts"] > F.col("t_view")),
            ),
            lambda s: s["ts"],
        )
    )
    staged = per_user.select(
        "user_id", "t_view", click_ts.alias("t_click"), "later"
    )
    purchase_ts = F.array_min(
        F.transform(
            F.filter(
                "later",
                lambda s: (s["event_type"] == "purchase")
                & (F.col("t_click").isNotNull())
                & (s["ts"] > F.col("t_click")),
            ),
            lambda s: s["ts"],
        )
    )
    final = staged.select(
        "user_id", "t_view", "t_click", purchase_ts.alias("t_purchase")
    )
    return final.agg(
        F.count("*").alias("n_users"),
        F.count("t_view").alias("reached_view"),
        F.count("t_click").alias("reached_click"),
        F.count("t_purchase").alias("reached_purchase"),
    )
