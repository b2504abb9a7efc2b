"""Scale-adaptive state partitioning for stateful streaming queries.

A stateful streaming operator (windowed aggregation, stream-stream
join, dropDuplicates*, applyInPandasWithState) materializes one state
store per post-shuffle partition, and the partition count is frozen
from ``spark.sql.shuffle.partitions`` when the query first starts (it
is pinned into the checkpoint's offset metadata).  AQE — the mechanism
that right-sizes post-shuffle partitions for batch queries — is
disabled for streaming plans, so a session default tuned for the batch
workload silently becomes the state layout: a tiny stream pays one
store commit (delta file + CRC + maintenance) per partition per
micro-batch for dozens of near-empty stores, and a huge stream gets too
FEW partitions and giant per-store state.

``scaled_state_partitions`` is the streaming analogue of AQE partition
coalescing (guide: derive partitioning from input size, never from the
local core count): it sizes the post-shuffle partition count from the
bytes the query will actually process, using the SAME per-partition
target batch AQE uses (``spark.sql.adaptive.advisoryPartitionSizeInBytes``),
and restores the session default afterwards.  The session default is
only ever LOWERED toward the derived value — on a production stream
where bytes/advisory exceeds the session default the context manager
is a no-op, so it cannot starve a large job of parallelism.
"""

from __future__ import annotations

import math
import os
from contextlib import contextmanager
from typing import TYPE_CHECKING, Iterator

if TYPE_CHECKING:
    from pyspark.sql import SparkSession

_UNITS = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _parse_bytes(text: str) -> int:
    """Spark byte-conf syntax: '64m', '256mb', '1g', bare digits = bytes."""
    s = str(text).strip().lower()
    if s.endswith("b") and not s[-2:-1].isdigit():
        s = s[:-1]
    unit = 1
    if s and s[-1] in _UNITS:
        unit = _UNITS[s[-1]]
        s = s[:-1]
    return int(float(s) * unit)


def local_input_bytes(*paths: str) -> int | None:
    """Total size of local files/directories; None when any path cannot
    be sized (remote scheme, missing) — callers then skip the scaling."""
    total = 0
    try:
        for p in paths:
            if "://" in p and not p.startswith("file:"):
                return None
            p = p.removeprefix("file:")
            if os.path.isdir(p):
                for root, _dirs, files in os.walk(p):
                    for f in files:
                        total += os.path.getsize(os.path.join(root, f))
            else:
                total += os.path.getsize(p)
    except OSError:
        return None
    return total


def derive_state_partitions(
    spark: "SparkSession", input_bytes: int | None, floor: int = 1
) -> int | None:
    """ceil(bytes / advisoryPartitionSizeInBytes), clamped to
    [floor, session spark.sql.shuffle.partitions].  None when the input
    could not be sized (caller should keep the session default)."""
    if input_bytes is None:
        return None
    try:
        session_default = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        return None
    advisory = _parse_bytes(
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
    )
    target = max(floor, math.ceil(input_bytes / max(advisory, 1)))
    return min(target, session_default)


@contextmanager
def scaled_state_partitions(
    spark: "SparkSession", *paths: str, input_bytes: int | None = None
) -> Iterator[int | None]:
    """Set ``spark.sql.shuffle.partitions`` to the derived state layout
    for the duration of a streaming query's start+run, then restore the
    session default.  Use around the whole ``start()``/
    ``awaitTermination()`` span (the conf is read at query start; a
    ``foreachBatch`` body also plans under it)."""
    if input_bytes is None:
        input_bytes = local_input_bytes(*paths)
    target = derive_state_partitions(spark, input_bytes)
    if target is None:
        yield None
        return
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(target))
    try:
        yield target
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
