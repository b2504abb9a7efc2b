"""r14 wave-3 A/B: avro_roundtrip row-loop codec vs columnar twins.

Interleaved in ONE Spark session per the noisy-host protocol
(old, new, old, new — min-of-2 collect()s per arm per pass), with the
bench canary probed before and after.  Both codec paths live in
sources/avro_io.py, so the only variable is which _rt closure the
mapInPandas stage runs.

    python scripts/r14_avro_ab.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("r14_avro_ab")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def canary() -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id)", "count(id)").collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


AVRO_SCHEMA = {
    "type": "record",
    "name": "orders",
    "fields": [
        {"name": "o_orderkey", "type": "long"},
        {"name": "o_custkey", "type": "long"},
        {"name": "o_orderpriority", "type": ["null", "string"]},
        {"name": "total", "type": "double"},
    ],
}
NAMES = [f["name"] for f in AVRO_SCHEMA["fields"]]
OUT_SCHEMA = "o_orderkey long, o_custkey long, o_orderpriority string, total double"


def build(variant: str):
    src = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderpriority",
            F.col("o_totalprice").cast("double").alias("total"),
        )
    )
    if variant == "old":

        def _rt(batches):
            import pandas as pd

            from hyperspace_spark.sources.avro_io import (
                read_container,
                write_container,
            )

            for pdf in batches:
                rows = pdf.to_dict("records")
                blob = write_container(rows, AVRO_SCHEMA, codec="deflate")
                _, back = read_container(blob)
                yield (
                    pd.DataFrame({n: [r[n] for r in back] for n in NAMES})
                    if back
                    else pd.DataFrame({n: [] for n in NAMES})
                )

    else:

        def _rt(batches):
            from hyperspace_spark.sources.avro_io import (
                read_container_to_pandas,
                write_container_from_pandas,
            )

            for pdf in batches:
                blob = write_container_from_pandas(pdf[NAMES], AVRO_SCHEMA, codec="deflate")
                _, back = read_container_to_pandas(blob)
                yield back[NAMES]

    out = src.mapInPandas(_rt, OUT_SCHEMA)
    return out.withColumn("total", F.round("total", 2))


def timed(variant: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        build(variant).collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


print(f"canary_start {canary()}", flush=True)
# warm both paths once (codegen + page cache) before the measured passes
build("old").collect()
build("new").collect()
seq = []
for arm in ("old", "new", "old", "new"):
    w = timed(arm)
    seq.append((arm, w))
    print(f"{arm} {w}", flush=True)
print(f"canary_end {canary()}", flush=True)
olds = [w for a, w in seq if a == "old"]
news = [w for a, w in seq if a == "new"]
print(f"min old {min(olds)}  min new {min(news)}  ratio {min(olds)/min(news):.2f}")
spark.stop()
