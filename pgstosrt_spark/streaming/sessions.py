"""Stateful streaming sessionization via ``applyInPandasWithState``.

The custom-stateful-operator shape for semantics the built-in streaming
aggregations cannot express: gap-based sessions close on *data* (the next
event arriving beyond the gap) or on *time* (the event-time timeout firing
when the watermark passes session_end + gap), never on micro-batch
boundaries.  The per-user state is one open session tuple — O(active
users) — plus, after a timeout-close, a small *tombstone* carrying the
user's closed-session counter so a returning user continues the 1-based
ordinal instead of restarting at 1 (which would collide (user_id,
session_id) keys in the append sink).  Tombstones are evicted after
``tombstone_retention`` of event time, bounding state at scale; a user who
returns after that long gets fresh ordinals — the documented tradeoff
between unbounded state and eternal ordinal continuity.

Semantics match the batch :func:`operators.relational.sessionize`
(lag/cumsum over a user window) exactly on in-order input: same gap rule,
same 1-based per-user session ordinals, and the same exact arithmetic —
event values are quantized to decimal micros before summing (HALF_UP,
matching Spark's double->decimal(28,6) cast) so an emitted total_value is
bit-equal to the batch decimal sum no matter how events split across
micro-batches.  Non-finite values (NaN/inf) contribute 0 micros, matching
the batch twin where CAST(double AS DECIMAL) yields NULL and the sum skips
it.  Equivalence is pinned by ``test_streaming_sessionize_matches_batch``:
every emitted session equals its batch twin, and the only withheld
sessions are per-user final sessions the watermark has not yet timed out.

Out-of-order input *within* the gap merely widens the open session
(start = min, end = max — a within-watermark late event never moves
session_end backwards); an event older than start - gap would split
sessions differently than batch — the inherent limit of online
sessionization, bounded by the watermark dropping input older than it
before the kernel runs.

Memory bound (hot keys): the kernel materializes ONE user's events per
micro-batch as two numpy arrays (ts int64 + value float64, ~16 B/event —
the Arrow chunks themselves stream through and are dropped as they are
folded), because out-of-order-within-batch input must be sorted before the
fold.  A single user emitting 10^8 events into one micro-batch therefore
costs ~1.6 GB on one executor; bound micro-batch size (maxFilesPerTrigger
/ maxOffsetsPerTrigger) to bound the hottest key.  Pinned by
``test_streaming_sessionize_hot_key`` at 10^5 events/batch for one user.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal
from typing import Any, Iterable, Iterator, Tuple

import numpy as np
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
# start_us IS NULL => tombstone: no open session, `closed` preserved so the
# next session continues the per-user ordinal; end_us keeps the last close
# time as the retention anchor.
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
    # setScale(6, HALF_UP); Decimal(v) is that exact expansion.  NaN/±inf
    # cast to NULL in Spark and are skipped by the sum -> 0 micros here
    # (Decimal(nan).quantize would raise InvalidOperation and kill the
    # query).
    v = float(v)
    if not math.isfinite(v):
        return 0
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


def _make_kernel(gap_us: int, tombstone_retention_us: int):
    def kernel(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.hasTimedOut:
            start, end, n, total, closed = state.get
            if start is None:  # tombstone retention expired -> evict
                state.remove()
                return
            # close the open session but KEEP the ordinal counter as a
            # tombstone (ADVICE r3: state.remove() here restarted a
            # returning user's session_id at 1 -> duplicate append keys)
            state.update((None, end, 0, 0, closed + 1))
            # clamp to the watermark (ADVICE r4): if the watermark already
            # jumped past end + retention (>30-day event-time gap, backfill
            # replay, tiny retention), an un-clamped timestamp is in the
            # past and setTimeoutTimestamp raises INVALID_TIMEOUT_TIMESTAMP,
            # killing the streaming query; the tombstone then just expires
            # at the next watermark tick, which is the intended semantics
            state.setTimeoutTimestamp(
                max(
                    end // 1000 + tombstone_retention_us // 1000,
                    state.getCurrentWatermarkMs() + 1,
                )
            )
            yield pd.DataFrame([_session_row(user_id, closed + 1, start, end, n, total)])
            return

        # fold only (ts, value): event_id tie-breaks don't change any
        # emitted field (equal-ts events commute through min/max/count and
        # the exact integer micros sum), and two slim arrays bound hot-key
        # memory at ~16 B/event instead of a full concat'd DataFrame
        ts_parts: list[np.ndarray] = []
        val_parts: list[np.ndarray] = []
        for pdf in pdfs:
            ts_parts.append(pdf["ts"].astype("int64").to_numpy() // 1000)  # ns -> us
            val_parts.append(pdf["value"].to_numpy())
        ts_us = np.concatenate(ts_parts) if ts_parts else np.empty(0, dtype=np.int64)
        vals = np.concatenate(val_parts) if val_parts else np.empty(0)
        order = np.argsort(ts_us, kind="stable")
        out: list[dict] = []
        if state.exists:
            start, end, n, total, closed = state.get
        else:
            start, end, n, total, closed = None, None, 0, 0, 0
        for i in order:
            t = int(ts_us[i])
            m = _value_micros(vals[i])
            if start is None:  # no open session (fresh user or tombstone)
                start, end, n, total = t, t, 1, m
            elif t - end > gap_us:
                out.append(_session_row(user_id, closed + 1, start, end, n, total))
                closed += 1
                start, end, n, total = t, t, 1, m
            else:
                # within-gap: widen only — a within-watermark out-of-order
                # event (t < end, ADVICE r3) must not move session_end
                # backwards (or session_start forwards)
                start, end = min(start, t), max(end, t)
                n, total = n + 1, total + m
        state.update((start, end, n, total, closed))
        if start is not None:
            # close by time once the watermark passes session_end + gap
            state.setTimeoutTimestamp(end // 1000 + gap_us // 1000)
        if out:
            yield pd.DataFrame(out)

    return kernel


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    tombstone_retention_days: int = 30,
) -> DataFrame:
    """Streaming events -> closed sessions (append mode).

    ``events`` must be a streaming DataFrame with at least
    (user_id, event_id, ts, value).  Sessions are emitted when closed —
    by a successor event beyond the gap, or by event-time timeout.
    ``tombstone_retention_days`` bounds how long a closed user's ordinal
    counter survives in state (see module docstring).
    """
    gap_us = gap_minutes * 60 * 1_000_000
    retention_us = tombstone_retention_days * 86_400 * 1_000_000
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_kernel(gap_us, retention_us),
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
