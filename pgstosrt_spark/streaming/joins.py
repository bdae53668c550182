"""Stream-stream event-time interval join (Structured Streaming).

The reference is a bounded batch job per file with no streaming operators
(SURVEY.md §1.3) — this is beyond-reference training-data surface: the
canonical two-stream correlation shape (impression->conversion,
view->click attribution) as a watermarked stream-stream INNER join with a
time-range condition.

Why the range condition matters at scale: a stream-stream join must
buffer both sides in state.  With watermarks on BOTH inputs and a
``view_ts BETWEEN click_ts - lookback AND click_ts`` predicate, Spark can
derive a state watermark per side — a buffered view is provably
unjoinable once the click watermark passes ``view_ts + lookback`` and is
evicted, so state holds O(events within the lookback horizon), not
O(history).  Without the range bound, both sides buffer forever and the
job dies at 10^12 events.  The equi-key (user_id) keeps the join a hash
exchange on user, never a cross-stream scan.

Batch/stream equivalence: the same function applied to two STATIC frames
is the batch twin (watermarks are no-ops in batch; inner-join matches are
emitted exactly once under append mode).  Pinned by
``test_streaming_interval_join_matches_batch`` on an in-order replay —
every emitted pair equals the batch join's pair set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join_view_attribution"]


def interval_join_view_attribution(
    clicks: DataFrame,
    views: DataFrame,
    lookback_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """(click, view) pairs where the view happened at or before the click
    and within ``lookback_minutes`` — per user.

    ``clicks``/``views`` are event frames (user_id, event_id, ts), static
    or streaming.  Inner join: a click with no view in the window emits
    nothing (attribution semantics).  Output: user_id, click_id,
    click_ts, view_id, view_ts.
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    cond = (
        (F.col("c_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (
            F.col("view_ts")
            >= F.col("click_ts") - F.expr(f"INTERVAL {int(lookback_minutes)} MINUTES")
        )
    )
    return c.join(v, cond, "inner").select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "view_id",
        "view_ts",
    )
