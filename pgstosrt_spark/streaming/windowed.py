"""Event-time windowed aggregation with watermarks (Structured Streaming).

The reference is a bounded batch job per file — SURVEY.md §1.3 records
that it has no event-time processing at all — so this module belongs to
the beyond-reference training-data surface: the canonical
``readStream -> withWatermark -> window() groupBy -> append sink`` shape
for continuously-arriving event logs.

Semantics under append mode (the scale-correct sink mode):

  * a window row is emitted exactly once, when the watermark
    (max event time seen - delay) passes the window end — finalized
    aggregates only, which is what an Iceberg/parquet append sink needs;
  * events older than the watermark are dropped as late data (counted by
    Spark's ``numRowsDroppedByWatermark`` metric, never silently wrong);
  * state is bounded: windows below the watermark are evicted, so the
    operator holds O(active windows), not O(history) — the property that
    lets this run forever at 10^12-event scale.

The aggregation itself is the same declarative expression as the batch
twin (:func:`windowed_event_counts` works on either a static or a
streaming DataFrame), so batch/stream equivalence is structural — pinned
by ``test_streaming_windowed_agg_matches_batch``, which replays an
ordered event log and asserts every emitted window equals the batch
aggregate byte-for-byte while the still-open tail windows stay withheld.
Decimal sums keep emitted values identical to the batch run regardless
of micro-batch boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "EVENTS_SCHEMA",
    "read_events_stream",
    "windowed_event_counts",
    "session_window_counts",
    "dedup_events_stream",
]

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source event stream (declared schema — streams never infer)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 day",
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling event-time windows per event_type: count + exact value sum.

    Works on a static OR streaming ``events`` DataFrame — the watermark is
    a no-op in batch, so the same function is its own batch twin.  The
    count/sum pair is map-side combinable; the only shuffle keys on
    (window, event_type), so cardinality is bounded by the window count,
    not the event count.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # decimal: emitted values must not depend on micro-batch
            # boundaries or partial-agg order (same rule as sessionize)
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_window_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap sessions via the BUILT-IN ``F.session_window`` — the
    Catalyst-native declarative twin of the custom stateful operator in
    ``streaming/sessions.py``.

    Use this one when the per-session output is a plain aggregate (count /
    sum / min / max): the whole operator stays JVM-side with merging
    session state managed by Spark, and the watermark finalizes + evicts
    closed sessions exactly as in :func:`windowed_event_counts`.  The
    custom ``applyInPandasWithState`` variant exists for semantics this
    cannot express (per-user session ordinals, arbitrary Python folds).
    Note the boundary convention: ``session_end`` here is
    last_event_ts + gap (exclusive, Spark's definition), where the batch
    ``sessionize`` operator reports max(ts).  Same static-or-streaming
    duality as the tumbling variant — the function is its own batch twin.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def dedup_events_stream(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming ingestion dedup — drop redelivered events so an
    at-least-once feed (Kafka replays, file-source re-lists, upstream
    retries) becomes effectively-once downstream.

    ``dropDuplicatesWithinWatermark`` keys state on ``event_id`` and
    evicts each key once the watermark passes its event time + delay, so
    state is bounded by the duplicate horizon (events/hour), never by
    history — the property that lets this run forever.  A plain
    ``dropDuplicates`` on a stream would grow state without bound; a
    batch job would instead run :func:`DataFrame.dropDuplicates`, which
    is the exact batch twin (pinned by
    ``test_streaming_dedup_matches_batch``).  Emission is immediate on
    first sight (stateful filter, not an aggregate), so dedup adds no
    latency before downstream operators.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
