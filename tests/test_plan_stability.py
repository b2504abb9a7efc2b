"""Plan-stability snapshots for the index-accelerated workload queries.

Mirrors the reference's gold-standard plan tests
(goldstandard/TPCDSBase.scala:41): the PLANNER'S CHOICE — which index,
which scan strategy, how many exchanges — is serialized to a golden file
and compared on every run, so a planner regression (an index silently no
longer applying, a rewrite gaining a shuffle) fails a cheap test instead
of only showing up as a bench slowdown.

Regenerate by deleting tests/golden/plan_snapshots.json and re-running;
review the diff like any golden-file change.
"""

import json
import os
import re

import pytest

from hyperspace_spark.workload import QUERIES, workspace

from tests.conftest import SF_DIR

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "plan_snapshots.json")

SNAPSHOT_QUERIES = [
    "covering_filter_point",
    "covering_filter_agg",
    "join_cobucketed",
    "dataskipping_minmax",
    "zorder_filter_2d",
    "hybrid_scan_append",
    "hybrid_join_append",
    "delta_filter_index",
    "iceberg_filter_index",
    "delta_time_travel_index",
    # r7: shuffle-elimination rules
    "selfjoin_agg_cobucketed",
    "window_latest_lineitem",
    # r12: semi/anti band family — the per-key-aggregate rewrite fires
    # on the band shapes (0 Exchanges, w_o_cov both sides) and declines
    # on the two-conjunct <> shape (plain Exchange-free semi serving)
    "exists_band_semijoin",
    "exists_distinct_order_semijoin",
    "not_exists_band_antijoin",
    "exists_sibling_order_semijoin",
]


def _snapshot(df) -> dict:
    """Stable fingerprint of the planner's choice: which index data dirs
    feed the scan and the join/exchange shape of the INITIAL physical plan
    (pre-AQE, so runtime re-planning doesn't wobble the snapshot).

    The apply CACHE can hand back a frame an earlier test already
    executed; a finalized AdaptiveSparkPlan prints its runtime stages
    first and the initial plan after an '== Initial Plan ==' header —
    take the LAST section so the fingerprint is the initial plan in both
    the fresh and the cache-hit case (pre-execution strings have no
    header, so [-1] is the whole plan)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[-1]
    indexes = sorted(set(re.findall(r"/indexes/(\w+)/v__=\d+", plan)))
    tables = sorted(set(re.findall(r"hs_(\w+?)_v\d+", plan)))
    return {
        "indexes": sorted(set(indexes) | set(tables)),
        "exchanges": plan.count("Exchange"),
        "smj": "SortMergeJoin" in plan,
        "bhj": "BroadcastHashJoin" in plan,
        "reads_raw_source": "/testdata/" in plan,
    }


def test_plan_snapshots(spark):
    ws = workspace(spark, SF_DIR)
    got = {}
    for name in SNAPSHOT_QUERIES:
        got[name] = _snapshot(QUERIES[name](spark, SF_DIR))
    if not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            json.dump(got, f, indent=2, sort_keys=True)
        pytest.skip("golden plan snapshot written; re-run to compare")
    with open(GOLDEN) as f:
        want = json.load(f)
    assert got == want, (
        "planner choice drifted from tests/golden/plan_snapshots.json — "
        "if intentional, delete the golden file and re-run to regenerate"
    )
