"""Stateful streaming sessionization via ``applyInPandasWithState``.

The custom-stateful-operator shape for semantics the built-in streaming
aggregations cannot express: gap-based sessions close on *data* (the next
event arriving beyond the gap) or on *time* (the event-time timeout firing
when the watermark passes session_end + gap), never on micro-batch
boundaries.  The per-user state is one open session tuple — O(active
users), evicted by timeout, so the operator runs forever at scale.

Semantics match the batch :func:`operators.relational.sessionize`
(lag/cumsum over a user window) exactly on in-order input: same gap rule,
same 1-based per-user session ordinals, and the same exact arithmetic —
event values are quantized to decimal micros before summing (HALF_UP,
matching Spark's double->decimal(28,6) cast) so an emitted total_value is
bit-equal to the batch decimal sum no matter how events split across
micro-batches.  Equivalence is pinned by
``test_streaming_sessionize_matches_batch``: every emitted session equals
its batch twin, and the only withheld sessions are per-user final
sessions the watermark has not yet timed out.

Out-of-order input *across* micro-batches (an event older than its user's
open session) would split sessions differently than batch — the inherent
limit of online sessionization; the watermark bounds it by dropping input
older than the watermark before the kernel runs.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

__all__ = ["SESSION_SCHEMA", "sessionize_stream"]

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

# (start_us, end_us, n_events, total_micros, closed_so_far)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total_micros", T.LongType()),
        T.StructField("closed", T.LongType()),
    ]
)

_MICRO = Decimal("0.000001")


def _value_micros(v: float) -> int:
    # Spark's CAST(double AS DECIMAL(28,6)) = exact binary expansion,
    # setScale(6, HALF_UP); Decimal(v) is that exact expansion
    return int(Decimal(v).quantize(_MICRO, rounding=ROUND_HALF_UP).scaleb(6))


def _session_row(user_id: int, sid: int, s: int, e: int, n: int, micros: int) -> dict:
    return {
        "user_id": user_id,
        "session_id": sid,
        "session_start": pd.Timestamp(s, unit="us"),
        "session_end": pd.Timestamp(e, unit="us"),
        "n_events": n,
        # int/1e6 is correctly-rounded -> equals Spark's decimal->double cast
        "total_value": micros / 1e6,
    }


def _make_kernel(gap_us: int):
    def kernel(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.hasTimedOut:
            start, end, n, total, closed = state.get
            state.remove()
            yield pd.DataFrame([_session_row(user_id, closed + 1, start, end, n, total)])
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        ts_us = rows["ts"].astype("int64") // 1000  # ns -> us epoch
        out: list[dict] = []
        if state.exists:
            start, end, n, total, closed = state.get
        else:
            start, end, n, total, closed = None, None, 0, 0, 0
        for t, v in zip(ts_us.to_numpy(), rows["value"].to_numpy()):
            t = int(t)
            if start is None:
                start, end, n, total = t, t, 1, _value_micros(v)
            elif t - end > gap_us:
                out.append(_session_row(user_id, closed + 1, start, end, n, total))
                closed += 1
                start, end, n, total = t, t, 1, _value_micros(v)
            else:
                end, n, total = t, n + 1, total + _value_micros(v)
        state.update((start, end, n, total, closed))
        # close by time once the watermark passes session_end + gap
        state.setTimeoutTimestamp(end // 1000 + gap_us // 1000)
        if out:
            yield pd.DataFrame(out)

    return kernel


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming events -> closed sessions (append mode).

    ``events`` must be a streaming DataFrame with at least
    (user_id, event_id, ts, value).  Sessions are emitted when closed —
    by a successor event beyond the gap, or by event-time timeout.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_kernel(gap_us),
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
