"""Custom stateful streaming operator — ``applyInPandasWithState``.

The reference accumulates per-instance dimensions across batches and emits
one bulk call when the instance is complete (AddDimensions, R17 —
handler/incoming_instance_handler.go:206-209, model/models.go:90-92).
Generalized here as a per-key **running accumulator**: arbitrary
user-defined state evolves batch-by-batch, emitting the updated aggregate
per key per micro-batch — the operator shape Structured Streaming's
built-in windows cannot express (cross-batch custom state + custom emit
policy).

Scale design: state lives in Spark's per-key state store (RocksDB-backed
on a real cluster), partitioned by the grouping key — no driver state, no
global synchronization. Each micro-batch touches only the keys present in
that batch plus timed-out keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: output: one row per (key, micro-batch touch)
RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
        T.StructField("n_types", T.LongType()),
    ]
)

#: state: counters + the distinct event-type set seen so far
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
        T.StructField("types", T.ArrayType(T.StringType())),
    ]
)


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, value sum, distinct event types) across
    micro-batches. Emits the post-update aggregate for every user touched
    in a batch; the LAST emission per user is the final total (tests take
    max). Null ``value`` rows count toward n_events but add 0.0."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, s, types = state.get
            types = set(types)
        else:
            n, s, types = 0, 0.0, set()
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).sum())
            types |= set(pdf["event_type"].dropna())
        state.update((n, s, sorted(types)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "value_sum": [s],
                "n_types": [len(types)],
            }
        )

    return (
        events.select("user_id", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def make_user_stats_processor():
    """StatefulProcessor (the Spark 4 ``transformWithStateInPandas`` API)
    computing the SAME per-user running stats as ``running_user_stats`` —
    but with TYPED, SEPARATE state variables instead of one opaque tuple:
    a ValueState for the counters and a ListState for the distinct types
    (appendList only ships the NEW types each batch, so state writes are
    delta-sized — the API's point vs applyInPandasWithState's whole-blob
    rewrite). Defined inside a factory so cloudpickle ships the class by
    value (same foreign-cwd rule as every UDF here).

    The handle also offers timers and per-state TTL
    (``getValueState(..., ttlDurationMs=...)``) — deliberately unused:
    eviction would break the totals this operator promises."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n BIGINT, s DOUBLE")
            self._types = handle.getListState("types", "t STRING")

        def handleInputRows(self, key, rows, timer_values):
            n, s = self._agg.get() if self._agg.exists() else (0, 0.0)
            seen = (
                {r[0] for r in self._types.get()}
                if self._types.exists()
                else set()
            )
            batch_types: set[str] = set()
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].fillna(0.0).sum())
                batch_types |= set(pdf["event_type"].dropna())
            fresh = sorted(batch_types - seen)
            if fresh:
                self._types.appendList([(t,) for t in fresh])
            self._agg.update((n, s))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "value_sum": [s],
                    "n_types": [len(seen | batch_types)],
                }
            )

        def close(self) -> None:
            pass

    return UserStats()


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """``running_user_stats`` re-expressed on ``transformWithStateInPandas``
    (requires the RocksDB state store provider — the caller sets it)."""
    return (
        events.select("user_id", "event_type", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            make_user_stats_processor(),
            outputStructType=RUNNING_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


#: closed-session emission: one row per (user, session) — final, append-mode
SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

#: state: the one OPEN session per user
_SESSION_STATE = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def session_flush(events: DataFrame, gap_ms: int) -> DataFrame:
    """Per-user sessionization that emits each session ONCE, when it
    CLOSES — the custom-stateful emit policy built-in session windows
    can't express (they emit on watermark per window; this operator owns
    the decision). A session closes two ways:

    * a later event for the same user arrives past the gap → the open
      session is emitted in that batch and a new one opens;
    * no event ever arrives — the EVENT-TIME TIMEOUT fires once the
      watermark passes last_ms + gap, Spark calls the function with
      ``state.hasTimedOut`` and no rows, and the session flushes. This is
      the timer half of the GroupState API (q51 exercises NoTimeout);
      without it, the final session of every user would sit in the state
      store forever.

    Boundary convention matches :func:`...analytics.sessionize`: a gap of
    EXACTLY ``gap_ms`` stays in-session (``>`` opens). The timeout is set
    to ``max(last+gap+1, watermark+1)`` — Spark rejects timestamps at or
    before the current watermark, and firing LATE never changes the
    emitted session (its content is fixed by the events; only the flush
    instant moves). State per user is three longs regardless of session
    length — the O(1)-state form of sessionization, vs the built-in
    window's buffered rows.

    Out-of-order events the watermark admits are batch-equivalent: each
    event is the interval ``[m, m+gap]`` and sessions are merged overlaps
    (``start=min``, ``last=max``, gap measured against max-so-far), so a
    late in-gap arrival extends the open session — possibly backwards —
    instead of regressing ``last_ms``. The one O(1)-state approximation:
    an admitted event more than ``gap`` BEFORE the open session's start is
    a disjoint past session and flushes immediately as a singleton (exact
    handling would need list-valued state)."""

    def update(key, pdfs, state: GroupState):
        closed: list[tuple] = []
        if state.hasTimedOut:
            start, last, n = state.get
            closed.append((key[0], int(start), int(last), int(n)))
            state.remove()
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
            ms = (
                rows["ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
                // 1_000_000
            )
            if state.exists:
                start, last, n = state.get
            else:
                start = last = None
                n = 0
            # Cross-batch out-of-order handling (events are sorted WITHIN a
            # batch above, but a 1-minute watermark admits late arrivals in
            # LATER batches): treat each event as the interval [m, m+gap]
            # and merge overlaps — start=min, last=max, gap measured
            # against max-so-far — so a late-but-admitted event can extend
            # the open session backwards without regressing last_ms and
            # spuriously splitting the next on-time event's session. The
            # one O(1)-state approximation: an event more than gap BEFORE
            # the open session's start is a disjoint PAST session; with a
            # single open session per user it flushes immediately as a
            # singleton rather than waiting for its own timeout (exact
            # handling would need list-valued state).
            for m in ms:
                m = int(m)
                if start is None:
                    start, last, n = m, m, 1
                elif m - last > gap_ms:
                    closed.append((key[0], int(start), int(last), int(n)))
                    start, last, n = m, m, 1
                elif start - m > gap_ms:
                    closed.append((key[0], m, m, 1))
                else:
                    start, last, n = min(start, m), max(last, m), n + 1
            state.update((int(start), int(last), int(n)))
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(int(last) + gap_ms + 1, wm + 1))
        yield pd.DataFrame(
            closed, columns=["user_id", "start_ms", "end_ms", "n_events"]
        ).astype("int64")

    return (
        events.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


#: schema of the per-event EWMA emission
EWMA_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ewma_micro", T.LongType()),
    ]
)

#: state: the running accumulator (integer micros) + initialized flag
_EWMA_STATE = T.StructType(
    [
        T.StructField("acc", T.LongType()),
        T.StructField("has", T.BooleanType()),
    ]
)


def ewma_stream(
    events: DataFrame, alpha_num: int = 20, alpha_den: int = 100
) -> DataFrame:
    """Per-user streaming EWMA — the live form of the batch
    ``events_ewma`` recurrence (integer-micro per-step half-up rounding,
    bit-identical to the batch scan and the recursive-CTE oracle). State
    per user is ONE long + a flag, NoTimeout, append mode: every event
    emits its smoothed value in the micro-batch that carries it — the
    metric-smoothing sidecar a monitoring feed runs next to raw events.

    ORDERED-INPUT REQUIREMENT (asserted nowhere, documented here): the
    recurrence is order-sensitive, and unlike :func:`session_flush`'s
    merged-interval semantics there is no order-insensitive form of
    "exponentially weighted by arrival" — a late event would need its
    successors re-emitted. Feed it an ordered replay (the harness) or an
    upstream that partitions per key in event order (a compacted topic);
    batch equivalence holds exactly then."""

    def update(key, pdfs, state: GroupState):
        import numpy as np

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        m = np.floor(
            rows["value"].to_numpy() * 1_000_000 + 0.5
        ).astype("int64")
        if state.exists:
            acc, has = state.get
            acc = int(acc)
        else:
            acc, has = 0, False
        out = np.empty_like(m)
        for i, x in enumerate(m):
            acc = (
                int(x) if not has
                else (alpha_num * int(x) + (alpha_den - alpha_num) * acc
                      + alpha_den // 2) // alpha_den
            )
            has = True
            out[i] = acc
        state.update((int(acc), True))
        yield pd.DataFrame(
            {
                "user_id": rows["user_id"],
                "event_id": rows["event_id"],
                "ewma_micro": out,
            }
        )

    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=EWMA_SCHEMA,
            stateStructType=_EWMA_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
