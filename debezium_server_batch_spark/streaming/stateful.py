"""Custom stateful streaming operator: watermarked sessionization via
``applyInPandasWithState`` (the Arrow-batched GroupState API — the
pattern the engine uses when built-in streaming aggregations can't
express the semantics).

Batch-mode sessionization lives in operators/relational.py
(window-function form, SQL-oracle-checked). This is its STREAMING
counterpart: one GroupState per key holds the open session; sessions
close either when a later event for the key arrives past the gap
(emitted inline) or when the event-time watermark passes the session's
gap deadline (emitted by timeout) — so output is append-mode and each
closed session is emitted exactly once. State per key is three longs;
the watermark bounds state size: keys idle past the gap are closed and
removed, which is what keeps 10^9-key cardinality feasible.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame

_STATE_SCHEMA = "start long, end long, n long"  # epoch ms bounds + count


def _session_schema(key_type: str) -> str:
    return (
        f"user_id {key_type}, session_start timestamp, "
        "session_end timestamp, n_events long"
    )


SESSION_SCHEMA = _session_schema("long")  # the common events-table shape


def streaming_sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    watermark: str = "30 minutes",
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """events (streaming DF with `key` and event-time `ts`) →
    append-mode stream of CLOSED sessions
    (user_id, session_start, session_end, n_events).

    Same session semantics as operators/relational.sessionize: a new
    session starts when the gap to the previous event exceeds
    `gap_minutes`. Late data within `watermark` still extends/creates
    its session; later than that it is dropped by the watermark (the
    documented lateness contract of every watermarked Spark operator).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = int(gap_minutes * 60_000)

    def fn(
        key_tuple: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        uid = key_tuple[0]

        def emit(start_ms: int, end_ms: int, n: int) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [uid],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(end_ms, unit="ms")],
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield emit(start, end, n)
            return

        # interval merge: batch events as point intervals plus the
        # stored open session, in time order — this keeps batch-operator
        # parity for LATE data too (an in-watermark event older than the
        # open session either extends session_start backwards or forms
        # its own earlier session, instead of being silently folded in)
        intervals: list[list[int]] = []
        for pdf in pdfs:
            col = pd.to_datetime(pdf["ts"])
            intervals.extend([int(t), int(t), 1] for t in (col.astype("int64") // 1_000_000))
        if state.exists:
            s0, e0, n0 = state.get
            intervals.append([s0, e0, n0])
        intervals.sort(key=lambda iv: (iv[0], iv[1]))
        cur: list[int] | None = None
        for s, e, n in intervals:
            if cur is None:
                cur = [s, e, n]
            elif s - cur[1] <= gap_ms:
                cur[1] = max(cur[1], e)
                cur[2] += n
            else:
                yield emit(*cur)  # gap inside the merged stream: close inline
                cur = [s, e, n]
        if cur is not None:
            deadline = cur[1] + gap_ms
            if deadline <= state.getCurrentWatermarkMs():
                # already expired relative to the watermark — close now
                # (setTimeoutTimestamp would reject a past deadline)
                state.remove()
                yield emit(*cur)
            else:
                state.update((cur[0], cur[1], cur[2]))
                # close via timeout once the watermark passes end + gap
                state.setTimeoutTimestamp(deadline)

    return (
        events.select(
            F.col(key).alias("user_id"),
            # watermarks require TIMESTAMP (the testdata/parquet event
            # times are TIMESTAMP_NTZ — cast is the documented session-TZ
            # interpretation, same as the batch operators)
            F.col(ts).cast("timestamp").alias("ts"),
        )
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            # output key column typed from the input (string keys work)
            _session_schema(events.schema[key].dataType.simpleString()),
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
