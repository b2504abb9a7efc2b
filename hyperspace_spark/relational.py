"""Relational operators Spark's DataFrame API lacks, rebuilt Spark-first
for 100 TB scale:

- ``asof_join``: temporal as-of join (each left row matched to the most
  recent right row at-or-before its timestamp, per key).  Spark has no
  ASOF JOIN; the naive spelling — a theta-join on ``l.ts >= r.ts`` plus a
  per-left-row argmax — is a broadcast-nested-loop over the full cross
  product per key.  The distributed shape used here is the classic
  union-and-window trick: tag both inputs, union them, sort each key
  partition once by time, and carry the right side's payload forward as
  ONE struct per right row with ``last(..., ignorenulls=True)`` over an
  unbounded-preceding window — so NULL payload *fields* travel with their
  row instead of back-filling from older rows.
  ONE shuffle on the key, no pair explosion, pure JVM window execution —
  the same cost profile as a windowed aggregation over the union.

- ``range_join``: point-in-interval join (points table × intervals
  table).  Spark plans a non-equi join condition as a broadcast/cartesian
  nested loop — O(|points|·|intervals|) comparisons.  Bucketizing turns
  it into an equi-join: every interval is exploded to the fixed-width
  buckets it overlaps, every point maps to exactly one bucket, and the
  bucket ids equi-join (hash shuffle or broadcast, AQE's choice) with the
  exact range predicate re-applied as a post-filter.  Comparisons drop to
  O(|points| + Σ interval_width/bucket_width), the standard interval-
  bucketing scheme (cf. Spark's own range-join hints on Databricks and
  the interval-join of Flink's DataStream API — public designs; rebuilt
  here from the description).

- ``distinct_count_sketch``: deterministic distinct-count estimation by
  value-hash thresholding (distinct sampling, Gibbons VLDB'01): a value
  survives iff the first ``prefix_len`` hex chars of ``md5(value)`` fall
  below a threshold, so each *distinct* value is kept with a fixed
  probability independent of its multiplicity, and
  ``count_distinct(survivors) / p`` estimates the true cardinality.
  Unlike HyperLogLog (Spark's ``approx_count_distinct``), the estimate
  is a pure deterministic function of the value set — the same answer on
  any engine with md5 — which makes it cross-engine verifiable (the
  DuckDB oracle reproduces it bit-for-bit) and mergeable by union.  The
  scale win: the filter runs BEFORE the distinct shuffle, so the
  exchange carries only ~p of the distinct keys.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Sequence

if TYPE_CHECKING:
    from pyspark.sql import Column, DataFrame


def asof_join(
    left: "DataFrame",
    right: "DataFrame",
    on: str,
    by: Sequence[str],
    value_cols: Sequence[str],
    how: str = "inner",
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
) -> "DataFrame":
    """As-of (backward) join: for every left row, attach the payload of
    the latest right row with ``right.on <= left.on`` and equal ``by``
    keys.

    Semantics match DuckDB's ``ASOF JOIN`` (and pandas ``merge_asof``
    with ``direction='backward'``): ties on the timestamp match (a right
    row AT the left row's timestamp is eligible); among multiple right
    rows at the same instant the last in ``(on)`` order wins.

    Output: all left columns, plus ``<on><suffix>`` (the matched right
    timestamp) and each of ``value_cols`` renamed ``<col><suffix>``.
    ``how='inner'`` drops unmatched left rows; ``'left'`` keeps them with
    NULL payloads.  ``tolerance_seconds`` additionally unmatches rows
    whose matched right timestamp is older than the tolerance.

    Scale shape: one hash shuffle on ``by`` + one per-partition sort —
    identical to any windowed aggregation; no join pair explosion.  Skewed
    keys behave exactly like skewed window partitions (AQE does not split
    windows; pre-filter a pathological key if one holds >~1 partition's
    worth of rows).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    by = list(by)
    value_cols = list(value_cols)
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    overlap = set(left.columns) & ({f"{c}{suffix}" for c in value_cols} | {f"{on}{suffix}"})
    if overlap:
        raise ValueError(f"left columns collide with output names: {sorted(overlap)}")
    reserved = {"_hs_ts", "_hs_side", "_hs_payload"} & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(f"reserved column names in input: {sorted(reserved)}")

    # Tag and union: right rows carry the payload as ONE struct, left rows
    # carry a NULL struct.  The whole payload must travel as a single
    # value: carrying each column independently with last(ignorenulls)
    # would back-fill a NULL field of the matched right row from an OLDER
    # right row — wrong vs DuckDB ASOF / pandas merge_asof, where the
    # entire payload (NULL fields included) comes from the one matched
    # row.  _hs_side sorts right BEFORE left at an equal timestamp so an
    # exact-tie right row is visible to the left row (<= semantics).
    payload = F.struct(
        F.col(on).alias(f"{on}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    # A right row with a NULL timestamp can never be "the most recent row
    # at-or-before" anything (merge_asof rejects NaT keys; DuckDB ASOF
    # never matches NULL) — drop it so it can't shadow real matches.
    r = right.filter(F.col(on).isNotNull()).select(
        *by,
        F.col(on).alias("_hs_ts"),
        F.lit(0).alias("_hs_side"),
        payload.alias("_hs_payload"),
    )
    l = left.select(
        *by,
        F.col(on).alias("_hs_ts"),
        F.lit(1).alias("_hs_side"),
        F.lit(None).cast(r.schema["_hs_payload"].dataType).alias("_hs_payload"),
        *[F.col(c) for c in left.columns if c not in by and c != on],
    )
    unioned = r.select(*[F.lit(None).cast(l.schema[c].dataType).alias(c) if c not in r.columns else F.col(c) for c in l.columns]).unionByName(l)

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_hs_ts").asc(), F.col("_hs_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [f"{on}{suffix}"] + [f"{c}{suffix}" for c in value_cols]
    matched = F.last("_hs_payload", ignorenulls=True).over(w)
    out = unioned.select(
        *[c for c in unioned.columns if c != "_hs_payload"],
        *[matched[c].alias(c) for c in carried],
    )
    out = out.filter(F.col("_hs_side") == 1)
    if tolerance_seconds is not None:
        within = (
            F.col("_hs_ts").cast("double") - F.col(f"{on}{suffix}").cast("double")
        ) <= F.lit(float(tolerance_seconds))
        if how == "left":
            out = out.select(
                *[c for c in out.columns if c not in carried],
                *[F.when(within, F.col(c)).alias(c) for c in carried],
            )
        else:
            out = out.filter(within)
    if how == "inner":
        out = out.filter(F.col(f"{on}{suffix}").isNotNull())
    # Restore the left-facing shape: by, on, other left cols, payload.
    left_cols = [c for c in left.columns]
    return out.select(
        *[F.col("_hs_ts").alias(on) if c == on else F.col(c) for c in left_cols],
        f"{on}{suffix}",
        *[f"{c}{suffix}" for c in value_cols],
    )


def range_join(
    points: "DataFrame",
    intervals: "DataFrame",
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    by: Sequence[str] = (),
    closed: str = "left",
) -> "DataFrame":
    """Join each point row to every interval row whose ``[lo, hi)`` (or
    ``[lo, hi]`` with ``closed='both'``) contains the point, optionally
    also matching ``by`` equi-keys.

    Spark has no range-join optimization: the non-equi condition alone
    plans as a nested-loop join.  Bucketizing by ``bucket_width`` makes
    it an equi-join on the bucket id — intervals explode to the buckets
    they overlap (``sequence(floor(lo/w), floor(hi/w))``), points map to
    ``floor(p/w)`` — with the exact predicate re-checked after the join.
    Matches are found exactly once per (point, interval) pair: a point's
    single bucket intersects an interval's bucket list at most once.

    Pick ``bucket_width`` near the typical interval length: the explode
    factor is ``1 + len/width`` per interval, while a too-wide bucket
    degrades toward comparing every point against every interval in the
    bucket.  Catalyst/AQE still choose the join strategy — a small
    interval table broadcasts, a large one hash-shuffles on
    ``(bucket, *by)``.
    """
    from pyspark.sql import functions as F

    if closed not in ("left", "both"):
        raise ValueError(f"closed must be 'left' or 'both', got {closed!r}")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    by = list(by)
    w = float(bucket_width)
    if "_hs_bucket" in set(points.columns) | set(intervals.columns):
        raise ValueError("reserved column name in input: _hs_bucket")

    iv = intervals.withColumn(
        "_hs_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    pt = points.withColumn("_hs_bucket", F.floor(F.col(point_col) / w).cast("long"))
    upper = (
        F.col(point_col) < F.col(hi_col)
        if closed == "left"
        else F.col(point_col) <= F.col(hi_col)
    )
    cond = (F.col(point_col) >= F.col(lo_col)) & upper
    joined = pt.join(iv, on=["_hs_bucket", *by], how="inner").filter(cond)
    return joined.drop("_hs_bucket")


def distinct_count_sketch(
    df: "DataFrame",
    col: str,
    group_cols: Sequence[str] = (),
    prefix_len: int = 2,
    keep_below: str = "04",
    out_col: str = "approx_distinct",
) -> "DataFrame":
    """Deterministic distinct-count estimate per group.

    A value survives iff ``substr(md5(cast(value as string)), 1,
    prefix_len) < keep_below`` — a fixed fraction ``p = int(keep_below,
    16) / 16^prefix_len`` of the *distinct* values, independent of row
    multiplicity.  The estimate is ``count_distinct(survivors) / p``,
    rounded to a long.  Standard error ≈ ``sqrt((1-p)/(p·D))`` (D = true
    distinct count): with the defaults (p = 1/64) about 8% at D = 1000
    and 2.6% at D = 10 000 — tune ``keep_below`` up for small groups.

    Why not HyperLogLog: ``approx_count_distinct`` is cheaper per byte,
    but its estimate depends on Spark's internal hash and register
    layout — no other engine reproduces it.  This sketch is a pure
    function of the value set (md5 is everywhere), so results are
    cross-engine checkable and stable across Spark versions, and the
    survivor sets of disjoint partitions union losslessly.

    Scale shape: the hash filter runs before the distinct aggregation,
    so the exchange carries only ~p of the distinct keys; the aggregation
    itself is Spark's ordinary two-phase distinct.  Groups with zero
    surviving values are absent from the output (their estimate is 0).
    """
    from pyspark.sql import functions as F

    if not (1 <= prefix_len <= 8) or len(keep_below) != prefix_len:
        raise ValueError("keep_below must be a hex string of length prefix_len (1..8)")
    # md5 digests are lowercase hex; the survivor filter compares strings
    # lexicographically, where digits sort below 'a'-'f'.  An uppercase
    # threshold like 'A4' would make p disagree with the fraction actually
    # kept — normalize before computing either.
    keep_below = keep_below.lower()
    p = int(keep_below, 16) / (16 ** prefix_len)
    if p <= 0:
        raise ValueError("keep_below must be > 0")
    group_cols = list(group_cols)

    h = F.substring(F.md5(F.col(col).cast("string")), 1, prefix_len)
    survivors = df.filter(h < F.lit(keep_below))
    agg = F.round(F.count_distinct(F.col(col)) / F.lit(p)).cast("long").alias(out_col)
    if group_cols:
        return survivors.groupBy(*group_cols).agg(agg)
    return survivors.agg(agg)


def funnel_steps(
    df: "DataFrame",
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> "DataFrame":
    """Ordered-funnel analysis: how many users reached each step, where a
    step counts only when it happens STRICTLY AFTER the user's earliest
    completion of the previous step (the standard product-analytics
    funnel, not mere set membership).

    Output: (step, event_type, users) — step is 1-based position.

    Shape at 100 TB: one filtered scan per step (the ``type_col``
    equality pushes into the source scan) feeding a per-user min —
    map-side combined, user-cardinality output — then an equi-join
    against the previous step's frame on the user key.  No per-user
    event arrays are ever materialized, so a single hyperactive user
    cannot skew a task; intermediates scale with USERS, not events, and
    AQE broadcasts them whenever they fit."""
    from pyspark.sql import functions as F

    if not steps:
        raise ValueError("steps must be non-empty")
    counts = []
    prev = None  # (user, reach_ts) of the previous step, persisted
    persisted = []
    try:
        for s in steps:
            cur = df.filter(F.col(type_col) == s)
            if prev is not None:
                cur = cur.join(prev, user_col).filter(
                    F.col(ts_col) > F.col("_hs_reach")
                )
            # Persist each step frame: step i's plan hangs off step i-1,
            # so without it step s re-runs every earlier step's scan and
            # aggregation — O(steps^2) corpus scans instead of O(steps).
            cur = cur.groupBy(user_col).agg(F.min(ts_col).alias("_hs_reach")).persist()
            persisted.append(cur)
            counts.append(cur.count())
            prev = cur
    finally:
        for f in persisted:
            try:
                f.unpersist()
            except Exception:
                pass
    spark = df.sparkSession
    return spark.createDataFrame(
        [(i + 1, s, int(n)) for i, (s, n) in enumerate(zip(steps, counts))],
        "step int, event_type string, users bigint",
    )


def retention_cohorts(
    df: "DataFrame",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> "DataFrame":
    """Weekly retention cohorts: users grouped by the week of their FIRST
    event; for each (cohort week, week offset) the count of cohort users
    active that week.  The classic growth-accounting triangle.

    Output: (cohort_week 'yyyy-MM-dd', week_offset, users).

    Shape: two per-user aggregates (first-seen week; distinct active
    weeks — both map-side combined, user-scale outputs) and one
    user-keyed equi-join.  Weeks truncate to ISO Mondays on both engines,
    so the day difference is an exact multiple of 7."""
    from pyspark.sql import functions as F

    first = df.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("_hs_cw")
    )
    act = df.select(
        user_col, F.date_trunc("week", F.col(ts_col)).alias("_hs_w")
    ).distinct()
    return (
        act.join(first, user_col)
        .groupBy(
            F.date_format("_hs_cw", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("_hs_w"), F.col("_hs_cw")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("users"))
    )


def resample_gapfill(
    df: "DataFrame",
    key_col: str,
    ts_col: str,
    interval: str = "1 day",
    agg_col: str = "value",
    how: str = "locf",
    bucket_col: str = "bucket",
    value_col: str = "value",
    count_col: str = "n",
) -> "DataFrame":
    """Per-key regular time series with gap filling — the TimescaleDB
    ``time_bucket_gapfill`` + ``locf`` shape Spark has no native operator
    for (r10): bucket events into tumbling ``interval`` windows per key,
    aggregate, then emit EVERY bucket from each key's first to its last —
    missing buckets get ``count=0`` and a value filled per ``how``:

    - ``locf``   — last observation carried forward (monitoring /
      sensor-reading semantics; the first bucket per key always has data,
      so no leading nulls)
    - ``zero``   — 0.0 (additive metrics: revenue in an empty day IS 0)
    - ``null``   — left NULL (the gap stays visible)

    Scale shape: one map-side-combined aggregate (events -> key x bucket,
    the only pass over the corpus), a per-key min/max (key-scale), the
    grid EXPLODED from ``sequence()`` executor-side (never a driver
    loop — a key spanning years of minutes explodes in its own task),
    one co-keyed left join, and for ``locf`` a window over the key's own
    buckets.  Every post-aggregate stage is grid-scale (keys x buckets),
    not event-scale."""
    from pyspark.sql import Window, functions as F

    if how not in ("locf", "zero", "null"):
        raise ValueError(f"how must be locf|zero|null, got {how!r}")
    b = (
        df.groupBy(
            F.col(key_col),
            F.window(F.col(ts_col), interval).start.alias(bucket_col),
        )
        .agg(
            F.sum(agg_col).alias("_hs_v"),
            F.count("*").alias(count_col),
        )
    )
    grid = (
        b.groupBy(key_col)
        .agg(F.min(bucket_col).alias("_hs_lo"), F.max(bucket_col).alias("_hs_hi"))
        .select(
            key_col,
            F.explode(
                F.sequence("_hs_lo", "_hs_hi", F.expr(f"INTERVAL {interval}"))
            ).alias(bucket_col),
        )
    )
    j = grid.join(b, [key_col, bucket_col], "left").withColumn(
        count_col, F.coalesce(F.col(count_col), F.lit(0))
    )
    if how == "locf":
        w = (
            Window.partitionBy(key_col)
            .orderBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        j = j.withColumn(value_col, F.last("_hs_v", ignorenulls=True).over(w))
    elif how == "zero":
        j = j.withColumn(value_col, F.coalesce(F.col("_hs_v"), F.lit(0.0)))
    else:
        j = j.withColumn(value_col, F.col("_hs_v"))
    return j.drop("_hs_v")


def quantile_estimate(
    df: "DataFrame",
    col: str,
    probs: Sequence[float],
    key_cols: Sequence[str],
    group_cols: Sequence[str] = (),
    prefix_len: int = 2,
    keep_below: str = "10",
) -> "DataFrame":
    """Deterministic sampled quantiles: (prob, value) rows where value is
    the exact ``floor(p·(n-1))``-ranked element of a deterministic row
    sample — the cross-engine-reproducible cousin of
    ``percentile_approx`` (r10, same philosophy as
    :func:`distinct_count_sketch`: Spark's internal sketch state no
    other engine replays; an md5-threshold sample of the ROWS is a pure
    function of the data, so DuckDB derives the identical estimate).

    A row enters the sample iff ``substr(md5(key), 1, prefix_len) <
    keep_below`` with ``key = concat_ws('|', key_cols)`` — key columns
    must identify rows (an id, or the table's natural key) so duplicate
    VALUES sample independently and the sample is an unbiased row
    sample of fraction ``p = int(keep_below, 16)/16^prefix_len``.
    Standard rank error ≈ ``sqrt(p·(1-p)·n)`` sample positions.

    ``group_cols`` computes per-group quantiles: the sample windows
    partition by group, so output is (group..., prob, value) — groups
    whose sample is empty are absent (their estimate is undefined).

    Scale shape: the hash filter runs at the scan (narrow, no shuffle);
    only the ~p·n sample sorts — pick ``keep_below`` so the sample is
    thousands of rows regardless of corpus size, then the rank
    selection is one tiny window over the sample (per group when
    grouped; a skewed group's sample is still p of that group)."""
    from pyspark.sql import Window, functions as F

    if not key_cols:
        raise ValueError("key_cols must identify rows (sampling key)")
    if not (1 <= prefix_len <= 8) or len(keep_below) != prefix_len:
        raise ValueError("keep_below must be a hex string of length prefix_len (1..8)")
    bad = [p for p in probs if not 0.0 <= p <= 1.0]
    if bad:
        raise ValueError(f"probs must be in [0, 1], got {bad}")
    keep_below = keep_below.lower()
    key = F.concat_ws("|", *[F.col(k).cast("string") for k in key_cols])
    gcols = list(group_cols)
    sample = df.filter(
        (F.substring(F.md5(key), 1, prefix_len) < keep_below)
        & F.col(col).isNotNull()
    ).select(*gcols, F.col(col).alias("_v"))
    # The sample is sample-sized by construction; rank it in one window
    # (per group when grouped).  Ties break on value only (the rank of
    # equal values is interchangeable for quantiles).
    w = Window.partitionBy(*gcols).orderBy("_v")
    ranked = sample.select(
        *gcols,
        "_v",
        (F.row_number().over(w) - 1).alias("_rn"),
        F.count("*").over(Window.partitionBy(*gcols)).alias("_n"),
    )
    spark = df.sparkSession
    pdf = spark.createDataFrame([(float(p),) for p in probs], "prob double")
    return (
        ranked.crossJoin(F.broadcast(pdf))
        .filter(F.col("_rn") == F.floor(F.col("prob") * (F.col("_n") - 1)).cast("long"))
        .select(*gcols, "prob", F.col("_v").alias("value"))
    )
