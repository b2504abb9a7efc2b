"""Stream-stream interval joins on the micro-batch engine.

The canonical attribution shape: two event streams (e.g. views and
purchases) joined by key where the right event lands inside a bounded
time window after the left one.  Structured Streaming supports this
natively when BOTH sides carry watermarks and the join condition bounds
event time on both ends — the bound is what lets the engine evict
buffered state, so the operator runs forever on unbounded streams with
bounded memory (state per side ~= watermark-window of data, never the
full history).

At 100 TB-a-day scale the join state is the design constraint: the
interval bound and the watermark delay ARE the memory budget (state ~
key-cardinality x window), which is why the bound is a required part of
this helper's API — an unbounded join is inexpressible through it.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def interval_join_streams(
    left: "DataFrame",
    right: "DataFrame",
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    window: str = "10 minutes",
    watermark: str = "1 hour",
    prefix: tuple[str, str] = ("l_", "r_"),
    how: str = "inner",
) -> "DataFrame":
    """Stream-stream join: rows pair when they share ``key`` and
    ``right_ts`` falls in [left_ts, left_ts + window].  ``how`` may be
    ``inner`` or ``leftOuter`` — the outer form emits an unmatched left
    row (NULL right side) once its window fully passes the watermark,
    the attribution-with-dropoff shape (views that never converted).

    Both inputs must be streaming DataFrames; every column of each side
    is returned under its prefix (Spark forbids ambiguous names across
    stream-stream join sides).  ``window`` and ``watermark`` take SQL
    interval text ('10 minutes').  The same expression works for a
    batch pair too (watermarks no-op there), which is how the contract
    query's DuckDB oracle replays it exactly.
    """
    from pyspark.sql import functions as F

    lp, rp = prefix
    l = left.withWatermark(left_ts, watermark).select(
        *[F.col(c).alias(f"{lp}{c}") for c in left.columns]
    )
    r = right.withWatermark(right_ts, watermark).select(
        *[F.col(c).alias(f"{rp}{c}") for c in right.columns]
    )
    cond = (
        (F.col(f"{lp}{key}") == F.col(f"{rp}{key}"))
        & (F.col(f"{rp}{right_ts}") >= F.col(f"{lp}{left_ts}"))
        & (
            F.col(f"{rp}{right_ts}")
            <= F.col(f"{lp}{left_ts}") + F.expr(f"INTERVAL {window}")
        )
    )
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"how must be inner|leftOuter, got {how!r}")
    return l.join(r, cond, how)
