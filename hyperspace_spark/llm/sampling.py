"""Deterministic, engine-portable sampling for training-data pipelines.

At 100 TB, `df.sample()` is the wrong tool for building training
mixtures: it is non-reproducible across retries (task replay can see
different rows), not stable across engines, and unusable as a join key
(you cannot re-derive "was this row sampled?" later).  These operators
instead hash a stable key column into integer buckets and select
buckets:

- the same row lands in the same bucket in every run, on every engine
  that has md5 (Spark, DuckDB, Trino, ...), regardless of partitioning;
- a sample is a narrow `Filter` over the scan — no shuffle, composes
  with predicate pushdown and column pruning, and scales linearly;
- nested samples are consistent: a 1% sample is a strict subset of a
  10% sample of the same key (both are prefix ranges of the bucket
  space), which is exactly what you want for data-scaling ladders.

The bucket hash is the first 32 bits of md5(key) — uniform, and
reproducible as plain SQL in any oracle engine:

    Spark:  conv(substring(md5(cast(key as string)), 1, 8), 16, 10) % B
    DuckDB: cast('0x' || substr(md5(cast(key as varchar)), 1, 8) as bigint) % B
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING, Mapping

if TYPE_CHECKING:
    from pyspark.sql import Column, DataFrame

#: Bucket-space size.  1e6 buckets keeps rate granularity at 1e-6 while
#: the 32-bit hash (4.3e9 values) still spreads ~4300 hash values per
#: bucket, so quantization error stays negligible.
NUM_BUCKETS = 1_000_000


def hash_bucket(key: "Column", num_buckets: int = NUM_BUCKETS) -> "Column":
    """Deterministic bucket in [0, num_buckets) from a stable key column.

    NULL keys hash to NULL: they are dropped by the sample filters and
    land in 'train' in the split (the CASE otherwise-branch).  Feed a
    non-null key (surrogate or coalesced) if nulls are possible."""
    from pyspark.sql import functions as F

    h32 = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
    return h32 % num_buckets


def deterministic_sample(
    df: "DataFrame",
    key_col: str,
    fraction: float,
    num_buckets: int = NUM_BUCKETS,
) -> "DataFrame":
    """Keep rows whose bucket falls in the prefix range [0, fraction*B).

    Prefix ranges make samples at different fractions nested subsets."""
    from pyspark.sql import functions as F

    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(round(fraction * num_buckets))
    return df.filter(hash_bucket(F.col(key_col), num_buckets) < threshold)


def stratified_sample(
    df: "DataFrame",
    key_col: str,
    strata_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    num_buckets: int = NUM_BUCKETS,
) -> "DataFrame":
    """Per-stratum deterministic sampling (training-mixture construction).

    `rates` maps stratum value -> keep fraction.  The rate lookup is a
    chained CASE (stays inside whole-stage codegen); with thousands of
    strata switch to a broadcast join against a rates table instead."""
    from pyspark.sql import functions as F

    thr = F.lit(int(round(default_rate * num_buckets)))
    for value, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {value!r} must be in [0, 1], got {rate}")
        thr = F.when(F.col(strata_col) == value, int(round(rate * num_buckets))).otherwise(thr)
    return df.filter(hash_bucket(F.col(key_col), num_buckets) < thr)


def train_val_test_split(
    df: "DataFrame",
    key_col: str,
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
    split_col: str = "split",
    num_buckets: int = NUM_BUCKETS,
) -> "DataFrame":
    """Deterministic disjoint split: buckets [0, val) -> 'val',
    [val, val+test) -> 'test', rest -> 'train'.

    Being keyed on content ids (not row position) the split survives
    re-partitioning, incremental appends, and engine migrations — a row
    can never leak from train to val because the assignment is a pure
    function of its key."""
    from pyspark.sql import functions as F

    if val_fraction + test_fraction >= 1.0:
        raise ValueError("val_fraction + test_fraction must be < 1")
    b = hash_bucket(F.col(key_col), num_buckets)
    val_hi = int(round(val_fraction * num_buckets))
    test_hi = val_hi + int(round(test_fraction * num_buckets))
    return df.withColumn(
        split_col,
        F.when(b < val_hi, "val").when(b < test_hi, "test").otherwise("train"),
    )


def duckdb_bucket_sql(key_sql: str, num_buckets: int = NUM_BUCKETS) -> str:
    """The oracle-side rendering of `hash_bucket` (for tests/drivers)."""
    return (
        f"(CAST('0x' || substr(md5(CAST({key_sql} AS VARCHAR)), 1, 8) AS BIGINT)"
        f" % {num_buckets})"
    )


def token_quota_per_source(
    df: "DataFrame",
    quota_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    auto_prefilter: bool = True,
    prefilter_min_docs: int = 1_000_000,
    safety_factor: float = 8.0,
) -> "DataFrame":
    """Cap each source's contribution to ``quota_tokens`` tokens — the
    mixture-construction step that stops one giant crawl domain from
    dominating a pretraining mix by VOLUME (a per-row sampling rate
    can't express "at most N tokens from this source").

    Selection is deterministic and unbiased: docs are ordered by
    md5(doc_id) WITHIN each source (hash order = a reproducible shuffle,
    independent of ingest order) and kept while the source's running
    token total before the doc is under the quota — so every source
    keeps at least one document, runs are identical across engines and
    retries, and raising the quota strictly grows the kept set (prefix
    property, same as deterministic_sample).

    Scale shape: one hash-partitioned window cumsum per source — no
    driver state.  NULL text counts 0 tokens (kept, like
    pack_sequences).  Skewed sources (one domain = half the corpus) make
    a skewed window partition; with ``auto_prefilter`` (default) the
    function bounds it AUTOMATICALLY and exactly:

    1. one cheap aggregate computes per-source doc/token totals;
    2. a source whose cap binds hard (docs ≥ ``prefilter_min_docs`` and
       expected kept fraction < 1/2 even after ``safety_factor``×
       over-estimation) gets a hash-PREFIX pre-filter: because the exact
       pass orders by the full md5 hex string, keeping only rows whose
       leading-32-bit hash value is under a cut is keeping a PREFIX of
       that same order — a strict superset of the final kept set
       whenever the surviving prefix still holds ≥ quota tokens;
    3. that superset condition is verified with a second small
       aggregate; a source that fails it (pathological token skew inside
       the hash prefix) is re-run WITHOUT the pre-filter, so the kept
       set is always identical to the un-prefiltered result (pytest
       asserts equality on a 50%-skewed corpus).

    The window partition for a capped hot source then holds
    ~``safety_factor × quota/avg_tokens`` rows instead of the source's
    full doc count — at 100 TB the difference between a straggler task
    and a bounded one.  auto_prefilter adds two driver-side aggregates
    (triggering jobs at call time); pass ``auto_prefilter=False`` for a
    fully-lazy single-pass plan when sources are known to be balanced."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hyperspace_spark.llm.text import token_count

    if quota_tokens < 1:
        raise ValueError(f"quota_tokens must be >= 1, got {quota_tokens}")
    n_tokens = F.greatest(
        F.lit(0).cast("long"),
        F.coalesce(token_count(F.col(text_col)).cast("long"), F.lit(0).cast("long")),
    )
    w = (
        Window.partitionBy(source_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def exact_cap(frame: "DataFrame") -> "DataFrame":
        with_off = frame.withColumn("_hs_nt", n_tokens).withColumn(
            "_hs_off", F.sum("_hs_nt").over(w) - F.col("_hs_nt")
        )
        return with_off.filter(F.col("_hs_off") < quota_tokens).drop("_hs_nt", "_hs_off")

    if not auto_prefilter:
        return exact_cap(df)

    # Free large-corpus gate: the deciding aggregate is worth its extra
    # scan only when a source COULD hold prefilter_min_docs docs.  For
    # file-backed frames the input bytes are driver metadata (no job);
    # below ~64 bytes/doc * prefilter_min_docs the corpus cannot qualify
    # and the single-pass lazy plan is returned untouched.  Unknown
    # sources (no file list) fall through to the aggregate — safe, just
    # not free.
    from hyperspace_spark.llm.dedup import _file_input_bytes

    nbytes = _file_input_bytes(df)  # None = no file list, -1 = unsized
    if nbytes is not None and 0 <= nbytes < 64 * prefilter_min_docs:
        return exact_cap(df)

    stats = (
        df.groupBy(source_col)
        .agg(F.count("*").alias("_docs"), F.sum(n_tokens).alias("_tok"))
        .collect()
    )
    # leading 8 hex chars of the ordering hash as a uniform 32-bit value
    h32 = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast("long")
    cuts: dict = {}
    for r in stats:
        docs, tok = r["_docs"], r["_tok"] or 0
        if r[source_col] is None:
            # NULL is not a legal map key (NULL_MAP_KEY at runtime); the
            # null-source group skips the prefilter and is capped by the
            # exact pass like any small source — never crashes the job.
            continue
        if docs < prefilter_min_docs or tok <= quota_tokens:
            continue
        avg = max(1.0, tok / docs)
        frac = min(1.0, safety_factor * (quota_tokens / avg) / docs)
        if frac < 0.5:
            cuts[r[source_col]] = int(frac * (1 << 32)) + 1
    if not cuts:
        return exact_cap(df)

    cut_expr = F.create_map(
        *[F.lit(x) for kv in cuts.items() for x in kv]
    )[F.col(source_col)]
    pre = df.filter(cut_expr.isNull() | (h32 < cut_expr))
    # Superset check: a pre-filtered source must still hold >= quota
    # tokens, else its final kept set could extend past the prefix.
    chk = (
        pre.filter(F.col(source_col).isin(list(cuts)))
        .groupBy(source_col)
        .agg(F.sum(n_tokens).alias("_tok"))
        .collect()
    )
    surviving = {r[source_col]: r["_tok"] or 0 for r in chk}
    bad = [s for s in cuts if surviving.get(s, 0) < quota_tokens]
    if not bad:
        return exact_cap(pre)
    # NULL-source rows: ~isin(bad) is NULL (not true) for them, so the
    # good side must keep NULLs explicitly — they were never prefiltered
    # (no legal map key) and belong with the exact pass, not dropped.
    good_part = exact_cap(
        pre.filter(~F.col(source_col).isin(bad) | F.col(source_col).isNull())
    )
    bad_part = exact_cap(df.filter(F.col(source_col).isin(bad)))
    return good_part.unionByName(bad_part)


def shard_assign(
    df: "DataFrame",
    key_col: str,
    num_shards: int,
    seed: str = "",
    shard_col: str = "shard",
    order_col: str | None = None,
    num_partitions: int | None = None,
) -> "DataFrame":
    """Deterministic corpus shuffle + balanced shard assignment — the
    training-order sharding step of a data pipeline (each output shard
    is one training-data file; the order must be a reproducible global
    shuffle and shard sizes must balance to ±1 row).

    Rows take the global rank of their md5(seed || key) hash (ties by
    key, which is unique), then stripe round-robin: shard = rank % k.
    Changing ``seed`` re-shuffles; the assignment is a pure function of
    (seed, key), so a re-run, a retry, or another engine reproduces it
    bit-for-bit (the DuckDB oracle derives the same ranks with one
    window function).

    Global ranking WITHOUT a single-partition window (the naive
    row_number() over a global ORDER BY serializes 100 TB through one
    task): range-repartition by the hash, sort within partitions, count
    rows per partition (tiny agg), then add each partition's cumulative
    offset to its local running index inside one Arrow-batched
    mapInPandas — the zipWithIndex construction, all stages
    corpus-parallel.  The ranked frame is persisted between the count
    job and the final pass so the range boundaries (sampled at runtime)
    cannot drift between the two jobs.

    ``order_col`` names an optional output column carrying the row's
    position WITHIN its shard (rank // k) — the training read order.
    """
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    h = F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string")))
    n_parts = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    ranked = (
        df.withColumn("__hs_shuf", h)
        .repartitionByRange(n_parts, F.col("__hs_shuf"), F.col(key_col))
        .sortWithinPartitions("__hs_shuf", key_col)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = (
        ranked.groupBy(F.spark_partition_id().alias("__hs_pid"))
        .count()
        .collect()
    )
    by_pid = {r["__hs_pid"]: r["count"] for r in counts}
    offsets, acc = {}, 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]

    out_schema = ranked.drop("__hs_shuf").schema.add(shard_col, "integer")
    if order_col:
        out_schema = out_schema.add(order_col, "long")

    def assign(iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        nxt = offsets.get(pid, 0)
        for pdf in iterator:
            n = len(pdf)
            ranks = range(nxt, nxt + n)
            nxt += n
            pdf = pdf.drop(columns=["__hs_shuf"])
            pdf[shard_col] = [r % num_shards for r in ranks]
            if order_col:
                pdf[order_col] = [r // num_shards for r in ranks]
            yield pdf

    return ranked.mapInPandas(assign, schema=out_schema)


def weighted_sample(
    df: "DataFrame",
    key_col: str,
    weight_col: str,
    rate: float,
    num_buckets: int = NUM_BUCKETS,
) -> "DataFrame":
    """Quality-weighted deterministic sampling: each row's keep
    probability is ``rate x clamp(weight, 0, 1)``, realized as
    ``bucket(key) < floor(p * B)`` over the same md5 bucket hash as
    deterministic_sample — reproducible across engines and retries,
    still a narrow Filter over the scan (no shuffle), and a row's fate
    is a pure function of (key, weight), so the sample can be re-derived
    as a join predicate later.

    floor, not round, on the threshold: both engines floor identically
    on doubles, while round half-up (DuckDB) vs half-even (some engines)
    desyncs at .5 boundaries.  weight=1 rows degenerate to
    deterministic_sample's prefix range (same bucket space, so a
    weighted sample is still a subset of any plain sample at >= rate)."""
    from pyspark.sql import functions as F

    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    w = F.least(F.greatest(F.col(weight_col).cast("double"), F.lit(0.0)), F.lit(1.0))
    thr = F.floor(w * F.lit(float(rate)) * F.lit(float(num_buckets))).cast("long")
    return df.filter(hash_bucket(F.col(key_col), num_buckets) < thr)


def write_training_shards(
    df: "DataFrame",
    path: str,
    key_col: str,
    num_shards: int,
    seed: str = "",
    file_format: str = "parquet",
) -> None:
    """Materialize :func:`shard_assign` as the training-data layout:
    ``path/shard=K/`` holds shard K's rows physically ORDERED by the
    deterministic shuffle position (one sorted file per shard), so a
    trainer streams each shard sequentially in the reproducible global
    order without sorting at read time.

    One extra shuffle on top of shard_assign's ranking pass
    (repartition by shard so each shard writes as one sorted unit);
    shard sizes balance to ±1 row so the write skews only as much as
    row widths do."""
    from pyspark.sql import functions as F

    out = shard_assign(df, key_col, num_shards, seed=seed, order_col="_hs_pos")
    (
        out.repartition(num_shards, F.col("shard"))
        .sortWithinPartitions("shard", "_hs_pos")
        .write.format(file_format)
        .partitionBy("shard")
        .mode("overwrite")
        .save(path)
    )
