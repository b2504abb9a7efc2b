"""Maintenance-path scale probe: does index upkeep cost scale with the
DELTA, not the index?

r5 changed two maintenance paths:
- incremental refresh of an append-only delta writes ONLY the new rows'
  bucket files and hardlinks the rest (was: full index rewrite), and
- optimize(quick) compacts per bucket (was: full index rewrite).

This probe measures those against full refresh on the same table at two
sizes (sf0.1 lineitem, and 10x that), appending a fixed ~1% delta.  If
the fix holds, incremental wall time stays roughly FLAT as the table
grows 10x (cost ~ delta + linking) while full refresh grows ~linearly.

It also probes the ANN analog (assign-only incremental vs full refit).
Run:  python scripts/maintenance_probe.py
Output: one JSON line; prose summary belongs in SCALE.md.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1/lineitem.parquet"
WORK = "/tmp/hs_maint_probe"


def build_session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.warehouse.dir", f"{WORK}/wh")
        .getOrCreate()
    )


def probe(spark, scale: int, out: dict) -> None:
    """scale = how many copies of sf0.1 lineitem form the base table."""
    from pyspark.sql import functions as F

    from hyperspace_spark import CoveringIndexConfig, Hyperspace

    tag = f"x{scale}"
    src = f"{WORK}/li_{tag}"
    base = spark.read.parquet(SRC)
    if not os.path.exists(f"{src}/_SUCCESS"):
        parts = [
            base.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 10_000_000))
            for i in range(scale)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.repartition(max(8, 4 * scale)).write.mode("overwrite").parquet(src)

    # Warm the JVM/codegen/page cache so x1 (first probe) isn't charged
    # the session startup: one throwaway aggregate over the base table.
    spark.read.parquet(src).agg(F.sum("l_quantity")).collect()

    hs = Hyperspace(spark, system_path=f"{WORK}/idx_{tag}")
    t0 = time.perf_counter()
    hs.create_index(
        spark.read.parquet(src),
        CoveringIndexConfig(
            f"m_{tag}", ["l_orderkey"], ["l_quantity", "l_extendedprice"], num_buckets=16
        ),
    )
    out[f"build_{tag}_sec"] = round(time.perf_counter() - t0, 2)

    # ~1% append, fixed absolute size per scale step (delta-proportional
    # cost should track THIS, not the table)
    delta = base.limit(60000).withColumn("l_orderkey", F.col("l_orderkey") + F.lit(90_000_000))
    delta.coalesce(2).write.mode("append").parquet(src)
    t0 = time.perf_counter()
    hs.refresh_index(f"m_{tag}", "incremental")
    out[f"refresh_incremental_{tag}_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    hs.refresh_index(f"m_{tag}", "full")
    out[f"refresh_full_{tag}_sec"] = round(time.perf_counter() - t0, 2)

    # fragment with TWO more deltas (so buckets hold >1 small file —
    # single-small-file buckets are correctly skipped), then per-bucket
    # quick optimize
    for off in (95_000_000, 97_000_000):
        d = base.limit(60000).withColumn("l_orderkey", F.col("l_orderkey") + F.lit(off))
        d.coalesce(2).write.mode("append").parquet(src)
        hs.refresh_index(f"m_{tag}", "incremental")
    e = hs._log_mgr(f"m_{tag}", hs.conf()).get_latest_stable_log()
    # threshold above the delta files, below the originals
    threshold = sorted((f.size for f in e.content_files), reverse=True)[15]
    spark.conf.set("spark.hyperspace.index.optimize.fileSizeThreshold", str(threshold))
    try:
        t0 = time.perf_counter()
        hs.optimize_index(f"m_{tag}", "quick")
        out[f"optimize_quick_{tag}_sec"] = round(time.perf_counter() - t0, 2)
    finally:
        spark.conf.unset("spark.hyperspace.index.optimize.fileSizeThreshold")


def probe_ann(spark, scale: int, out: dict) -> None:
    """Same question for the IVF index: assign-only incremental refresh
    (frozen centroids + hardlinks) vs full refit, as the corpus grows.
    Base = sf0.1 embeddings replicated `scale`x with jittered copies (so
    KMeans sees distinct points), append a fixed ~1% delta."""
    from pyspark.sql import functions as F

    from hyperspace_spark import Hyperspace, IvfIndexConfig

    tag = f"x{scale}"
    src = f"{WORK}/vec_{tag}"
    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n = base.count()
    if not os.path.exists(f"{src}/_SUCCESS"):
        # Component-DEPENDENT jitter: a scalar multiple of the whole
        # vector would be cancelled exactly by the build's unit
        # normalization, leaving KMeans clustering `scale` exact copies
        # of each point.  Perturbing per component changes direction,
        # which survives normalization.
        parts = [
            base.select(
                (F.col("vec_id") + F.lit(i * 1_000_000)).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, j: x + 0.01 * F.lit(i) * F.cos(j.cast("double")),
                ).alias("embedding"),
            )
            for i in range(scale)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.repartition(max(4, scale)).write.mode("overwrite").parquet(src)

    hs = Hyperspace(spark, system_path=f"{WORK}/annidx_{tag}")
    t0 = time.perf_counter()
    hs.create_index(spark.read.parquet(src), IvfIndexConfig(f"a_{tag}", n_clusters=16))
    out[f"ann_build_{tag}_sec"] = round(time.perf_counter() - t0, 2)

    delta = base.limit(max(1, n // 100)).select(
        (F.col("vec_id") + F.lit(90_000_000)).alias("vec_id"), "embedding"
    )
    delta.coalesce(1).write.mode("append").parquet(src)
    t0 = time.perf_counter()
    hs.refresh_index(f"a_{tag}", "incremental")
    out[f"ann_refresh_incremental_{tag}_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    hs.refresh_index(f"a_{tag}", "full")
    out[f"ann_refresh_full_{tag}_sec"] = round(time.perf_counter() - t0, 2)


def main():
    os.makedirs(WORK, exist_ok=True)
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for scale in (1, 10):
        probe(spark, scale, out)
    for scale in (1, 10):
        probe_ann(spark, scale, out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
