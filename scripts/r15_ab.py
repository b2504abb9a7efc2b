"""Interleaved A/B for the r15 query-path changes, in ONE Spark session.

Old-shape twins are inline copies of the r14 code (differing ONLY in the
piece under test), so old and new run interleaved (old/new x passes,
min-of-N) on the same JVM — the only timing protocol that works on this
host (SCALE.md: absolute speed swings up to 28x between sessions).

Arms:
  minhash   — dedup_minhash_lsh pipeline: distinct BEFORE the verify
              joins (r14) vs distinct on threshold survivors (r15).
  lshcap    — the hot-bucket cap subplan of lsh_bucketed_pairs: inner
              join against the under-cap bucket list (r14) vs collected
              over-cap blacklist / no-op (r15).  Timed to the candidate
              count (the verify stage is identical in both).
  pipeline  — pipeline_end_to_end: persisted dedup subtree (r14) vs
              eager localCheckpoint (probed for VERDICT r14 #5 and
              REJECTED: measured 1.54 -> 2.88 s, a 1.9x regression —
              the workload keeps persist(); see workload.py comment).
  sessionize— streaming_stateful_sessionize wall (new code only; the
              old-vs-new kernel is measured in-process by
              r15_sessionize_kernel_ab.py — 3.8x — because the old fn
              cannot run in the same session as the new one).

Usage: python scripts/r15_ab.py [sf_dir] [passes]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def canary(spark):
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr(
            "sum(id % 7919) AS s", "count(if(id % 13 = 0, 1, null)) AS c"
        ).collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def minhash_old(df, n=3, num_hashes=64, bands=16, verify_threshold=0.5):
    """r14 shape: candidate distinct BEFORE the verify joins."""
    from pyspark.sql import functions as F

    from hyperspace_spark.llm.dedup import (
        _persist,
        doc_shingle_arrays,
        minhash_signatures,
    )

    rows_per_band = num_hashes // bands
    docs = _persist(doc_shingle_arrays(df, n, "text", "doc_id"))
    sigs = _persist(
        minhash_signatures(df, n, num_hashes, "text", "doc_id", shingle_arrays=docs)
    )
    band_cols = []
    for bi in range(bands):
        cols = [F.col(f"mh_{bi * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.md5(F.concat_ws("_", *[c.cast("string") for c in cols])).alias(f"band_{bi}")
        )
    banded = sigs.select("doc_id", *band_cols)
    stacked = banded.select(
        F.col("doc_id").alias("_id"),
        F.explode_outer(
            F.array(
                *[
                    F.concat_ws("#", F.lit(str(bi)), F.col(f"band_{bi}"))
                    for bi in range(bands)
                ]
            )
        ).alias("bucket"),
    )
    a, b = stacked.alias("a"), stacked.alias("b")
    pairs = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    a_docs = docs.select(F.col("_id").alias("id_a"), F.col("sh").alias("_sh_a"))
    b_docs = docs.select(F.col("_id").alias("id_b"), F.col("sh").alias("_sh_b"))
    inter = F.size(F.array_intersect(F.col("_sh_a"), F.col("_sh_b")))
    return (
        pairs.join(a_docs, "id_a")
        .join(b_docs, "id_b")
        .withColumn(
            "jaccard",
            F.round(inter / (F.size(F.col("_sh_a")) + F.size(F.col("_sh_b")) - inter), 6),
        )
        .filter(F.col("jaccard") >= verify_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def lsh_keyed(emb, nbits=4, bands=8, dim=64):
    from pyspark.sql import functions as F

    from hyperspace_spark.llm.dedup import _persist
    from hyperspace_spark.llm.similarity import band_sigs_kernel

    v = emb.select(
        F.col("vec_id").alias("_id"),
        F.col("embedding").cast("array<double>").alias("_v"),
    )
    sigs = band_sigs_kernel(dim, nbits, bands)(F.col("_v"))
    return _persist(v.select("_id", F.posexplode_outer(sigs).alias("band", "sig")))


def lshcap_old(emb, max_bucket=4096):
    """r14 cap shape: inner join against the under-cap list, then the
    band self-join; timed to the candidate count."""
    from pyspark.sql import functions as F

    keyed = lsh_keyed(emb)
    ok = (
        keyed.groupBy("band", "sig")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") <= max_bucket)
        .select("band", "sig")
    )
    keyed = keyed.join(ok, ["band", "sig"])
    a, b = keyed.alias("a"), keyed.alias("b")
    return a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.sig") == F.col("b.sig"))
        & (F.col("a._id") < F.col("b._id")),
    ).select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))


def lshcap_new(emb, max_bucket=4096):
    """r15 cap shape: collected over-cap blacklist (empty -> no join)."""
    from pyspark.sql import functions as F

    keyed = lsh_keyed(emb)
    hot = (
        keyed.groupBy("band", "sig")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > max_bucket)
        .select("band", "sig")
        .collect()
    )
    if hot:
        over = emb.sparkSession.createDataFrame(hot, "band int, sig long")
        keyed = keyed.join(F.broadcast(over), ["band", "sig"], "left_anti")
    a, b = keyed.alias("a"), keyed.alias("b")
    return a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.sig") == F.col("b.sig"))
        & (F.col("a._id") < F.col("b._id")),
    ).select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))


def pipeline_old(spark, sf_dir):
    """r14 shape: persist() instead of localCheckpoint()."""
    from pyspark.sql import functions as F

    from hyperspace_spark.llm import dedup
    from hyperspace_spark.llm.pipeline import clean_corpus
    from hyperspace_spark.workload import _conf, _t

    _conf(spark)
    docs = _t(spark, sf_dir, "documents")
    kept = (
        clean_corpus(docs)
        .filter(F.col("drop_reason").isNull())
        .select("doc_id", "text", "source")
    )
    deduped = dedup._persist(dedup.exact_dedup(kept))
    spans = dedup.remove_repeated_spans(deduped, n=8)
    return (
        spans.join(deduped.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_removed").alias("removed_tokens"),
        )
    )


def main():
    from pyspark.sql import SparkSession

    from hyperspace_spark.llm import dedup as _dedup
    from hyperspace_spark.workload import QUERIES, _t

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r15_ab")
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
        .config("spark.sql.warehouse.dir", "/tmp/hs_r15ab_wh")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(f"canary start: {canary(spark)}")

    docs_df = lambda: _t(spark, SF, "documents")  # noqa: E731
    emb_df = lambda: _t(spark, SF, "embeddings")  # noqa: E731

    def timed(fn, runs=2):
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        _dedup.release_caches()
        return best

    from hyperspace_spark.llm.dedup import minhash_lsh_pairs

    arms = {
        "minhash_old": lambda: minhash_old(docs_df()).collect(),
        "minhash_new": lambda: minhash_lsh_pairs(
            docs_df(), n=3, num_hashes=64, bands=16, verify_threshold=0.5
        ).collect(),
        "lshcap_old": lambda: lshcap_old(emb_df()).count(),
        "lshcap_new": lambda: lshcap_new(emb_df()).count(),
        "pipeline_old": lambda: pipeline_old(spark, SF).collect(),
        "pipeline_new": lambda: QUERIES["pipeline_end_to_end"](spark, SF).collect(),
        "sessionize_new": lambda: QUERIES["streaming_stateful_sessionize"](
            spark, SF
        ).collect(),
    }
    results = {k: [] for k in arms}
    # result-equality probe first (old vs new rows identical)
    mo = sorted(map(tuple, minhash_old(docs_df()).collect()))
    _dedup.release_caches()
    mn = sorted(
        map(
            tuple,
            minhash_lsh_pairs(
                docs_df(), n=3, num_hashes=64, bands=16, verify_threshold=0.5
            ).collect(),
        )
    )
    _dedup.release_caches()
    print(f"minhash rows old={len(mo)} new={len(mn)} equal={mo == mn}")
    co = lshcap_old(emb_df()).count()
    _dedup.release_caches()
    cn = lshcap_new(emb_df()).count()
    _dedup.release_caches()
    print(f"lshcap candidates old={co} new={cn} equal={co == cn}")
    po = sorted(map(tuple, pipeline_old(spark, SF).collect()))
    _dedup.release_caches()
    pn = sorted(map(tuple, QUERIES["pipeline_end_to_end"](spark, SF).collect()))
    _dedup.release_caches()
    print(f"pipeline rows old={len(po)} new={len(pn)} equal={po == pn}")

    for p in range(PASSES):
        for name, fn in arms.items():
            results[name].append(timed(fn))
            print(f"  pass {p} {name}: {results[name][-1]:.3f}")
    print(f"canary end: {canary(spark)}")
    for pair in ("minhash", "lshcap", "pipeline"):
        o = min(results[f"{pair}_old"])
        n = min(results[f"{pair}_new"])
        print(f"{pair}: old {o:.3f} new {n:.3f} speedup {o / n:.2f}x")
    print(f"sessionize wall (new): {min(results['sessionize_new']):.3f}")


if __name__ == "__main__":
    main()
