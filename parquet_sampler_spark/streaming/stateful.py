"""Custom stateful streaming operator: online sessionization with
``applyInPandasWithState``.

Per user, events are folded into sessions separated by an inactivity
gap; a session is EMITTED once the gap (or stream end) closes it, and
open-session state (start, last-seen, count) persists in the state store
between micro-batches. Late cross-batch events merge into the open
session (best-effort without a watermark); events later than an
already-emitted session start a new one — the inherent limit of
watermark-less sessionization. This is the canonical shape for any custom
stateful operator the DataFrame API can't express (the batch analog —
lag + cumsum — needs the whole history; this needs O(open sessions)
state).

Scale: state is keyed by user_id → distributed with the shuffle; each
group's state is one small tuple. ``idle_timeout_minutes`` enables
processing-time state eviction (idle users' open sessions are flushed
and their state removed) — without it, state grows with the all-time
distinct-user count; with it, it is bounded by users active within the
timeout window. Deterministic tests use NoTimeout (the default).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start_us", T.LongType()),
    T.StructField("session_end_us", T.LongType()),
    T.StructField("n_events", T.LongType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("start_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("n", T.LongType()),
])


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    idle_timeout_minutes: float | None = None,
    event_time_timeout: bool = False,
) -> DataFrame:
    """events (streaming, with ``user_id`` and ``ts``) → closed sessions
    (append mode). Sessions still open when the stream ends stay in
    state — unless ``idle_timeout_minutes`` is set, in which case a
    processing-time timeout EVICTS idle users' state and emits their
    open session as closed. Without eviction, state grows with the
    all-time distinct-user count — the thing that kills a long-running
    100 TB-scale stream; with it, state is bounded by ~active users per
    timeout window.

    ``event_time_timeout=True`` is the DETERMINISTIC production mode:
    the input must carry ``withWatermark("ts", ...)``, and a session is
    closed when the WATERMARK passes ``last_event + gap`` — i.e. the
    gap rule itself fires the emission, replay-reproducibly, rather
    than wall-clock idleness or stream end. State is evicted at close.
    Mutually exclusive with ``idle_timeout_minutes``."""
    gap_us = gap_minutes * 60 * 1_000_000
    if event_time_timeout and idle_timeout_minutes is not None:
        raise ValueError(
            "event_time_timeout and idle_timeout_minutes are mutually "
            "exclusive timeout modes"
        )
    timeout_ms = None
    if idle_timeout_minutes is not None:
        timeout_ms = int(idle_timeout_minutes * 60 * 1000)
        if timeout_ms < 1:
            # fail at the API boundary: setTimeoutDuration(0) would
            # throw inside every executor task on the first micro-batch
            raise ValueError(
                "idle_timeout_minutes must be >= 1 millisecond "
                f"(got {idle_timeout_minutes!r})"
            )
    has_timeout = event_time_timeout or timeout_ms is not None

    def fold(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if has_timeout and state.hasTimedOut:
            # timeout close: flush the open session and drop the state
            # (processing-time = idle eviction; event-time = the gap
            # rule fired by the watermark)
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, start_us, last_us, n)],
                columns=["user_id", "session_start_us",
                         "session_end_us", "n_events"],
            )
            return
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = None, None, 0

        closed: list[tuple] = []
        ts_all = []
        for pdf in pdfs:
            ts_all.append(pdf["ts_us"])
        ts = pd.concat(ts_all).sort_values()

        for t in ts:
            t = int(t)
            if start_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us > gap_us:
                closed.append((user_id, start_us, last_us, n))
                start_us, last_us, n = t, t, 1
            else:
                # cross-batch late arrival (t may precede last_us —
                # batches sort internally, not globally): merge into the
                # open session without moving last_us backwards, so
                # end >= start always holds and no spurious split occurs
                start_us = min(start_us, t)
                last_us, n = max(last_us, t), n + 1

        state.update((start_us, last_us, n))
        if event_time_timeout:
            # close when the watermark passes last_event + gap: the
            # session cannot grow after that point by definition
            state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000)
        elif timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start_us",
                         "session_end_us", "n_events"],
            )

    from pyspark.sql import functions as F

    # keep the raw event-time column alongside ts_us: EventTimeTimeout
    # requires the watermark column to survive into the stateful op
    tagged = events.select(
        "user_id", "ts", F.unix_micros("ts").alias("ts_us")
    )
    if event_time_timeout:
        conf = GroupStateTimeout.EventTimeTimeout
    elif timeout_ms is not None:
        conf = GroupStateTimeout.ProcessingTimeTimeout
    else:
        conf = GroupStateTimeout.NoTimeout
    return tagged.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=conf,
    )
