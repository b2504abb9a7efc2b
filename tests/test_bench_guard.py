"""Acceleration regression guards.

Round 1 shipped indexes that DECELERATED queries (speedup 0.74-1.12x)
and nothing failed: the bench records speedups but never judges them.
These tests make that class of regression a red test instead of a
footnote in BENCH_r{N}.json.

- test_accelerated_speedups: the five accelerated headline queries must
  be at least as fast WITH their index as without, at sf0.01 with a
  min-of-3 protocol (first run pays codegen; min reflects warm
  execution).
- test_cobucketed_join_survives_aqe: AQE can demote a bucketed SMJ and
  re-introduce the Exchange the whole design exists to remove (known
  Spark foot-gun); assert the executed (AQE-finalized) plan keeps the
  join shuffle-free.
"""

import time

import pytest

from hyperspace_spark.workload import ACCELERATED_QUERIES as ACCELERATED
from hyperspace_spark.workload import executed_plan_final

GUARD_SF_DIR = "/root/testdata/sf0.01"


def _timed(spark, name, sf_dir, runs=3):
    from hyperspace_spark.workload import QUERIES

    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).collect()
        best = min(best, time.perf_counter() - t0)
    return best


@pytest.mark.slow
def test_accelerated_speedups(spark):
    """Each accelerated query >= 1.0x vs the unindexed plan, and the
    geomean comfortably above (the reference's envelope is ~2x at real
    scale; at sf0.01 plan-overhead eats some margin but never all).

    Per query, 3 accelerated runs then 3 raw runs back-to-back (the
    bench's own protocol): min-of-3 absorbs the raw side's first-run
    codegen/page-cache cost, and both sides scan the same source files
    within the same window."""
    import math

    from hyperspace_spark.workload import workspace

    workspace(spark, GUARD_SF_DIR)  # build once, outside the timings
    speedups = {}
    for name in ACCELERATED:
        accel = _timed(spark, name, GUARD_SF_DIR)
        spark.conf.set("spark.hyperspace.apply.enabled", "false")
        try:
            raw = _timed(spark, name, GUARD_SF_DIR)
        finally:
            spark.conf.set("spark.hyperspace.apply.enabled", "true")
        speedups[name] = raw / accel
    # Sub-100ms accelerated timings flake under a long shared session
    # (observed ~1-in-5 full-suite runs): re-measure any apparent
    # deceleration ONCE before failing.  The RETRY measurement replaces
    # the first (it runs on a warmed session, so it is strictly the more
    # trustworthy of the two), and must clear 1.02x — not merely flip
    # past 1.0 — to overturn a first-pass deceleration.  Keeping
    # max(old, new) instead would let a genuine ~0.95x regression pass
    # whenever either of two noisy samples lands above 1.0.
    for name in [n for n, s in speedups.items() if s < 1.0]:
        # min-of-5 on the retry: in a loaded full-suite session a
        # min-of-3 retry can inherit the same contention spike that
        # produced the false deceleration (observed r13: a first-pass
        # 0.9x on a 40 ms query whose isolated rerun cleared 1.3x).
        accel = _timed(spark, name, GUARD_SF_DIR, runs=5)
        spark.conf.set("spark.hyperspace.apply.enabled", "false")
        try:
            raw = _timed(spark, name, GUARD_SF_DIR, runs=5)
        finally:
            spark.conf.set("spark.hyperspace.apply.enabled", "true")
        retry = raw / accel
        speedups[name] = retry if retry >= 1.02 else min(speedups[name], retry)
    geomean = math.exp(sum(math.log(s) for s in speedups.values()) / len(speedups))
    slow = {n: round(s, 2) for n, s in speedups.items() if s < 1.0}
    assert not slow, f"indexes decelerate queries: {slow} (all: {speedups})"
    assert geomean >= 1.2, f"geomean speedup collapsed: {geomean:.2f} ({speedups})"


def test_cobucketed_join_survives_aqe(spark):
    """The co-bucketed SMJ must stay Exchange-free through AQE
    re-planning (executed plan, after collect forces finalization).
    Auto-broadcast is disabled: at guard scale Spark would broadcast the
    small side, which hides exactly the regression this guards."""
    from hyperspace_spark.workload import QUERIES, workspace

    workspace(spark, GUARD_SF_DIR)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
    # Bust the apply-plan cache: a cached DataFrame carries the
    # executedPlan finalized under whatever broadcast conf was active
    # when it first ran (e.g. in the speedups test above).
    spark.conf.set("spark.hyperspace.apply.cacheTtlSeconds", "0")
    try:
        df = QUERIES["join_cobucketed"](spark, GUARD_SF_DIR)
        df.collect()  # AQE finalizes the plan on execution
        final = executed_plan_final(df)
        assert "SortMergeJoin" in final, final[:2000]
        # The single allowed Exchange is the post-join aggregation's;
        # neither JOIN INPUT may re-shuffle (that is the bucket layout's
        # whole contribution).
        assert final.count("Exchange") <= 1, final[:3000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.unset("spark.hyperspace.apply.cacheTtlSeconds")


def test_bench_stdout_line_fits_with_headroom():
    """r13 (VERDICT r12 #5): the one driver-visible stdout line, built
    from the COMMITTED full payload, must fit the driver's tail window
    with >=200 chars of headroom — so the next round's pair names can't
    silently truncate the artifact.  The per-pair speedup map must be
    gone from stdout (it lives in BENCH_FULL.json) while the geomean
    and the evidence histogram stay."""
    import json
    import os

    import bench

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_FULL.json")) as f:
        payload = json.load(f)
    line = bench.compact_stdout_line(payload, payload["queries"])
    assert len(line) <= bench.STDOUT_BUDGET - 200, len(line)
    parsed = json.loads(line)
    assert "speedup_vs_unindexed" not in parsed
    assert "geomean_speedup" in parsed and "evidence_age" in parsed
    assert "shed_for_length" not in parsed, "shedding means headroom is gone"
