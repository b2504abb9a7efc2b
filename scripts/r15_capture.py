"""r15 optimization-round helper: capture .explain('formatted') plans
and isolated walls for a named set of queries, from EITHER the current
tree or the pristine HEAD worktree (pass the repo root as argv[1]).

Usage:
    python scripts/r15_capture.py <repo_root> <suffix> q1 q2 ...

Writes plans/r14/<query>_<suffix>.txt (into THIS repo's plans dir) and
prints one wall-clock line per query (min of 2 collect()s, same
protocol as bench.py).  Streaming queries execute at construction; for
those the captured text is the batch plan of the returned frame plus
the recorded state-operator metrics when available.
"""

from __future__ import annotations

import io
import os
import sys
import time

REPO = sys.argv[1]
SUFFIX = sys.argv[2]
NAMES = sys.argv[3:]
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")

sys.path.insert(0, REPO)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName(f"r15_capture_{SUFFIX}")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.sql.warehouse.dir", "/tmp/hs_bench_warehouse")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from hyperspace_spark.workload import QUERIES, workspace  # noqa: E402
from hyperspace_spark.llm import dedup as _dedup  # noqa: E402

workspace(spark, sf_dir)
os.makedirs(OUT_DIR, exist_ok=True)

for name in NAMES:
    spark.sparkContext.setJobDescription(f"r15:{name}")
    df = QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    stdout = sys.stdout
    sys.stdout = buf
    try:
        df.explain("formatted")
    finally:
        sys.stdout = stdout
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        df.collect()
        best = min(best, time.perf_counter() - t0)
    _dedup.release_caches()
    with open(os.path.join(OUT_DIR, f"{name}_{SUFFIX}.txt"), "w") as f:
        f.write(f"-- {name} ({SUFFIX}) wall(min-of-2 collect): {best:.3f}s\n")
        f.write(buf.getvalue())
    print(f"{name}\t{best:.3f}")
spark.stop()
