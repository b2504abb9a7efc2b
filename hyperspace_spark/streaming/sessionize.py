"""Custom stateful streaming operator: event sessionization.

Demonstrates the §2.B streaming surface the engine exposes beyond the
reference (which has no streaming at all): watermarks + windowed aggs
come free from Structured Streaming; THIS module is the custom-operator
path — ``applyInPandasWithState`` with a per-key session state that
survives across micro-batches.

Semantics: events for a user belong to one session while gaps between
consecutive events stay under ``gap_seconds``; a session closes when the
watermark passes its last event + gap (or at stream end for the
available-now runs used in tests).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterable, Iterator, Tuple

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

# Default schemas (key "user_id" of long type); sessionize() derives the
# actual schemas from the input frame so any key column name/type works.
SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events int, total_value double"
)
STATE_SCHEMA = "start long, last long, n int, total double"


def sessionize(
    events: "DataFrame",
    gap_seconds: int = 1800,
    ts_col: str = "event_ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> "DataFrame":
    """events (streaming or batch-test via availableNow) -> closed sessions.

    State per user: (start, last, n, total) in epoch seconds.  Timeout is
    event-time based: when the watermark passes last+gap the session
    emits and the state clears.

    Late events admitted by the watermark but OLDER than the open
    session's start are handled explicitly: within ``gap_seconds`` of
    the start they extend the session backwards (start moves down);
    farther out they emit immediately as their own single-event session
    (no future event can join them — anything later is newer).  The
    previous behavior glued them onto the current session regardless of
    gap, corrupting session boundaries and totals.

    Output/state schemas are DERIVED from the input: the key column
    keeps its name and type; the value column must be numeric.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_type = dict((f.name, f.dataType.simpleString()) for f in events.schema.fields)[
        key_col
    ]
    val_type = dict((f.name, f.dataType.simpleString()) for f in events.schema.fields)[
        value_col
    ]
    if val_type not in ("tinyint", "smallint", "int", "bigint", "float", "double", "decimal"):
        if not val_type.startswith("decimal"):
            raise ValueError(
                f"value column {value_col!r} must be numeric, got {val_type}"
            )
    session_schema = (
        f"{key_col} {key_type}, session_start timestamp, session_end timestamp, "
        "n_events int, total_value double"
    )

    gap_ms = gap_seconds * 1000

    def fn(
        key: Tuple[Any, ...], pdfs: Iterator["Any"], state: "GroupState"
    ) -> Iterable["Any"]:
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    key_col: [user_id],
                    "session_start": [pd.Timestamp(start, unit="ms")],
                    "session_end": [pd.Timestamp(last, unit="ms")],
                    "n_events": [n],
                    "total_value": [total],
                }
            )
            return

        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        ts_ms = (rows[ts_col].astype("int64") // 1_000_000).tolist()
        vals = rows[value_col].tolist()
        out = []
        if state.exists:
            start, last, n, total = state.get
        else:
            start, last, n, total = ts_ms[0], ts_ms[0], 0, 0.0
        for t, v in zip(ts_ms, vals):
            if t < start:
                # Cross-batch late event older than the open session.
                if start - t <= gap_ms:
                    start = t  # within gap: session extends backwards
                else:
                    # Isolated: emit as its own closed session now.
                    out.append((user_id, t, t, 1, float(v)))
                    continue
            elif t - last > gap_ms and n > 0:
                out.append((user_id, start, last, n, total))
                start, n, total = t, 0, 0.0
            last = max(last, t)
            n += 1
            total += float(v)
        state.update((start, last, n, total))
        state.setTimeoutTimestamp(last + gap_ms)
        if out:
            yield pd.DataFrame(
                {
                    key_col: [o[0] for o in out],
                    "session_start": [pd.Timestamp(o[1], unit="ms") for o in out],
                    "session_end": [pd.Timestamp(o[2], unit="ms") for o in out],
                    "n_events": [o[3] for o in out],
                    "total_value": [o[4] for o in out],
                }
            )

    return (
        events.withWatermark(ts_col, f"{gap_seconds * 2} seconds")
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=session_schema,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
