"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design (100 TB):
- exact: one hash-partitioned window (or groupBy) on the fingerprint —
  a single shuffle of (hash, id) pairs, not documents.
- n-gram Jaccard: the EXACT similarity join (quadratic in bucket size) —
  used directly on small corpora and as the verify stage after LSH.
- MinHash / SimHash signatures are PER-DOCUMENT reductions, so they are
  computed with array higher-order functions inside the row (transform /
  aggregate / array_min) — a narrow map stage with NO shuffle and no
  wide-aggregate codegen.  Only the tiny signature frame (one row per
  doc) ever shuffles: band buckets -> candidate pairs within buckets ->
  verify on the persisted shingle arrays via array_intersect.
- embedding cosine: brute pair join for verification; LSH-bucketed
  variant in similarity.py for scale.

Everything is `pyspark.sql.functions` — no Python UDFs anywhere.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from hyperspace_spark.llm.text import fingerprint, tokens, word_shingles

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

# Fixed MinHash permutation parameters (deterministic across runs).
# 31-bit Mersenne prime field: h < 2^31 and a < 2^31 keep h*a+b under
# 2^63 — Spark 4 runs ANSI mode and errors on long overflow.
_MERSENNE = (1 << 31) - 1

# Pipeline-scoped persisted frames.  The dedup pipelines persist small
# intermediates (shingle arrays, signatures) that must stay cached until
# the RESULT frame is collected — so they cannot be unpersisted inside
# the builder.  Every persist is registered here and released by
# release_caches(); long-lived drivers (bench loops, the contract
# runner) call it between queries so caches don't accumulate.
_ACTIVE_PERSISTS: list = []


def _persist(df: "DataFrame") -> "DataFrame":
    out = df.persist()
    _ACTIVE_PERSISTS.append(out)
    return out


def release_caches() -> int:
    """Unpersist every pipeline-scoped cached frame; returns the count.
    Safe to call at any time — already-collected results are unaffected
    (unpersist only drops cached blocks, never data)."""
    n = 0
    for df in _ACTIVE_PERSISTS:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    _ACTIVE_PERSISTS.clear()
    return n


def _perm_params(num_hashes: int) -> list[tuple[int, int]]:
    import hashlib

    out = []
    for i in range(num_hashes):
        d = hashlib.md5(f"hs-minhash-{i}".encode()).digest()
        a = (int.from_bytes(d[:8], "big") | 1) % _MERSENNE
        b = int.from_bytes(d[8:], "big") % _MERSENNE
        out.append((max(a, 1), b))
    return out


def shingle_hash_col(shingle_col):
    """Word-shingle string -> 60-bit integer via md5 (deterministic and
    reproducible in any engine with md5 + hex parsing)."""
    from pyspark.sql import functions as F

    return F.conv(F.substring(F.md5(shingle_col), 1, 15), 16, 10).cast("long")


def exact_dedup(df: "DataFrame", text_col: str = "text", id_col: str = "doc_id") -> "DataFrame":
    """Keep the lowest-id document per normalized-text fingerprint.

    NULL-text documents are all kept: fingerprint(NULL) is NULL, and a
    window partitioned on it would lump every null-text doc into ONE
    partition and keep a single row — silently deleting documents that
    are not duplicates of anything (media-only / not-yet-fetched docs).
    Empty-string text still dedups normally: identical empties ARE
    duplicates."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.partitionBy(fingerprint(F.col(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col(text_col).isNull() | (F.col("_rn") == 1))
        .drop("_rn")
    )


def corpus_fingerprints(df: "DataFrame", text_col: str = "text") -> "DataFrame":
    """``(_fp)`` — the DISTINCT content fingerprints of a corpus: the
    incremental-dedup LEDGER.  One hash-partitioned distinct over md5
    hashes (32-byte rows, uniform keys — no skew at any scale).  Persist
    it once (ideally bucketed by ``_fp``) and a daily crawl batch joins
    against it without ever re-reading the corpus; append the surviving
    batch's fingerprints to keep it current."""
    from pyspark.sql import functions as F

    return (
        df.filter(F.col(text_col).isNotNull())
        .select(fingerprint(F.col(text_col)).alias("_fp"))
        .distinct()
    )


def _ledger_table_name(path: str) -> str:
    import hashlib

    return f"hs_fp_ledger_{hashlib.md5(path.encode()).hexdigest()[:8]}"


def _ledger_local(path: str) -> str:
    """The ledger LIFECYCLE helpers (meta sidecar, compaction swap) use
    driver-local filesystem calls; a remote URI would silently no-op or
    corrupt.  The anti join itself is engine-native and works anywhere —
    only these maintenance entry points are local-path-bound (same
    boundary as the index workspace's /tmp staging)."""
    if "://" in path and not path.startswith("file://"):
        raise NotImplementedError(
            f"fingerprint-ledger lifecycle helpers need a driver-local "
            f"(or mounted) path; got {path!r}"
        )
    return path[len("file://"):] if path.startswith("file://") else path


def _ledger_meta_path(path: str) -> str:
    import os

    return os.path.join(_ledger_local(path), "_LEDGER_META.json")


def _write_ledger_meta(path: str, num_buckets: int) -> None:
    """Best-effort on remote paths: the data write itself is engine-native
    and fine anywhere; a remote ledger simply has no sidecar, so every
    caller must keep passing the same num_buckets (documented on
    write_fingerprint_ledger)."""
    import json
    import os

    try:
        local = _ledger_local(path)
    except NotImplementedError:
        return
    os.makedirs(local, exist_ok=True)
    with open(_ledger_meta_path(path), "w") as f:
        json.dump({"num_buckets": num_buckets}, f)


def _ledger_buckets(path: str, default: int) -> int:
    """The bucket count the ledger files were WRITTEN with — a reader
    registering a different count would silently route batch rows to the
    wrong buckets in the Exchange-free anti join (missed matches =
    duplicates passing dedup).  The sidecar is authoritative; the
    parameter is only the fallback for pre-sidecar (or remote — no
    sidecar possible) ledgers.  Malformed sidecars fall back too."""
    import json

    try:
        with open(_ledger_meta_path(path)) as f:
            return int(json.load(f)["num_buckets"])
    except (NotImplementedError, OSError, ValueError, KeyError, TypeError):
        return default


def write_fingerprint_ledger(
    spark, ledger_df: "DataFrame", path: str, num_buckets: int = 64
) -> str:
    """Persist a fingerprint ledger BUCKETED by ``_fp`` (external table at
    ``path``; the location-hashed catalog name is session scaffolding,
    the files are the durable artifact — same discipline as the covering
    index's bucketed sink, indexes/covering.py write_bucketed).  A
    bucketed ledger makes every subsequent incremental_dedup anti join
    Exchange-free on the ledger side: only the (small) daily batch ever
    shuffles.  Returns the registered table name.

    On a REMOTE path (s3://, hdfs://) the data write works but no
    num_buckets sidecar can be written — pass the SAME num_buckets to
    every read/append, and note compaction is local-path-only."""
    from hyperspace_spark.indexes.covering import write_bucketed

    tbl = _ledger_table_name(path)
    write_bucketed(spark, ledger_df.select("_fp"), ["_fp"], num_buckets, path, tbl)
    _write_ledger_meta(path, num_buckets)
    return tbl


def read_fingerprint_ledger(spark, path: str, num_buckets: int = 64) -> "DataFrame":
    """Open a persisted fingerprint ledger THROUGH its bucketed catalog
    entry (re-registered on demand — new sessions see the same files),
    so joins against it keep the bucket distribution.  The bucket count
    comes from the ledger's own sidecar (written at create time);
    ``num_buckets`` is only the fallback for pre-sidecar ledgers."""
    tbl = _ledger_table_name(path)
    n = _ledger_buckets(path, num_buckets)
    if spark.catalog.tableExists(tbl) and _registered_bucket_count(spark, tbl) != n:
        # A table registered earlier in the session (e.g. a read against a
        # then-empty dir that fell back to the default bucket count) would
        # otherwise never be re-validated against the sidecar, wedging
        # every later append with a bucket-spec mismatch until the table
        # is manually dropped.  The files are the durable artifact; the
        # catalog entry is scaffolding — drop and re-create it.
        spark.sql(f"DROP TABLE {tbl}")
    if not spark.catalog.tableExists(tbl):
        spark.sql(
            f"CREATE TABLE {tbl} (`_fp` string) USING parquet "
            f"CLUSTERED BY (`_fp`) SORTED BY (`_fp`) INTO {n} BUCKETS "
            f"LOCATION '{path}'"
        )
    return spark.table(tbl)


def _registered_bucket_count(spark, tbl: str):
    """Bucket count of an existing catalog table (None if unreadable)."""
    try:
        for row in spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}").collect():
            if row[0] == "Num Buckets":
                return int(row[1])
    except Exception:
        pass
    return None


def append_fingerprint_ledger(
    spark, accepted_df: "DataFrame", path: str, num_buckets: int = 64,
    text_col: str = "text",
) -> None:
    """Fold an accepted batch's fingerprints into a persisted ledger
    (call after incremental_dedup so tomorrow's batch sees today's
    docs).  The append writes per-bucket files under the SAME bucket
    spec — no rewrite of the existing ledger, and the bucketing
    metadata stays valid for the next anti join."""
    from pyspark.sql import functions as F

    read_fingerprint_ledger(spark, path, num_buckets)  # ensure registered
    n = _ledger_buckets(path, num_buckets)
    # First append on a fresh dir (the streaming sink starts this way):
    # pin the bucket count NOW so later sessions with a different default
    # can't mis-bucket the join.
    _write_ledger_meta(path, n)
    tbl = _ledger_table_name(path)
    fps = corpus_fingerprints(accepted_df, text_col)
    (
        fps.repartition(n, F.col("_fp"))
        .write.format("parquet")
        .mode("append")
        .bucketBy(n, "_fp")
        .sortBy("_fp")
        .option("path", path)
        .saveAsTable(tbl)
    )


def compact_fingerprint_ledger(
    spark, path: str, num_buckets: int = 64
) -> int:
    """Ledger maintenance: rewrite the ledger as DISTINCT fingerprints in
    fresh bucketed files.  Daily appends accumulate one small file per
    bucket per batch, and an at-least-once retry (see
    streaming/dedup.py dedup_stream_against_ledger's failure note) can
    land the same fingerprint twice — neither affects anti-join RESULTS
    (a duplicate hash rejects the same docs), but both grow the ledger
    scan.  Compaction is the n-file -> num_buckets-file rewrite.

    Not atomic: the staging swap (write aside, swap directories) leaves
    a window where a reader sees no ledger — run it when no batch is in
    flight, like any index OPTIMIZE.  Returns the distinct fingerprint
    count."""
    import glob as _glob
    import os
    import shutil

    lpath = _ledger_local(path)
    if not _glob.glob(os.path.join(lpath, "*.parquet")):
        return 0  # empty/new ledger: nothing to compact
    n_buckets = _ledger_buckets(path, num_buckets)
    staging = f"{lpath}__compact"
    shutil.rmtree(staging, ignore_errors=True)
    distinct = spark.read.parquet(lpath).select("_fp").distinct()
    tbl = _ledger_table_name(path)
    # Rebuild through a staging table, then swap the directories and
    # re-register the canonical name over the compacted files.
    from hyperspace_spark.indexes.covering import write_bucketed

    write_bucketed(
        spark, distinct, ["_fp"], n_buckets, staging, f"{tbl}__compact"
    )
    # Count the STAGED output (one pass total — counting the lazy
    # distinct before the write would re-execute the whole scan, and an
    # append racing in between would make the two disagree).
    n = spark.read.parquet(staging).count()
    spark.sql(f"DROP TABLE IF EXISTS {tbl}__compact")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    old = f"{lpath}__old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(lpath, old)
    os.rename(staging, lpath)
    shutil.rmtree(old, ignore_errors=True)
    _write_ledger_meta(path, n_buckets)
    read_fingerprint_ledger(spark, path, n_buckets)  # re-register
    return n


def incremental_dedup(
    batch_df: "DataFrame",
    ledger_df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Documents of a NEW batch that are not already in the corpus: the
    daily-crawl-vs-corpus operation.  Within-batch exact dedup first
    (keep the lowest id, NULL text always kept — exact_dedup's policy),
    then a fingerprint LEFT ANTI join against the ledger
    (corpus_fingerprints output: one ``_fp`` column).

    100 TB shape: the batch is hashed once (narrow), the anti join
    shuffles only (fp, id)-sized rows on a uniform md5 key — never
    document bodies, never the corpus.  The ledger side is |corpus|
    hashes: broadcast by AQE when small; persisted BUCKETED by ``_fp``
    it joins shuffle-free on the ledger side for every subsequent batch.
    NULL-text rows carry a NULL fingerprint and a left-anti join keeps
    unmatched rows, so the NULL-keep policy costs no extra branch."""
    from pyspark.sql import functions as F

    if "_fp" in ledger_df.columns:
        ledger_df = ledger_df.select("_fp")
    else:
        # Anything without an _fp column — the raw corpus, a text or id
        # projection — would anti-join raw values against md5 hashes and
        # silently keep every previously-seen document.
        raise ValueError(
            "ledger_df must be a fingerprint frame (an `_fp` column, "
            "from corpus_fingerprints/read_fingerprint_ledger); got "
            f"columns {ledger_df.columns}"
        )
    batch = exact_dedup(batch_df, text_col, id_col)
    keyed = batch.withColumn("_fp", fingerprint(F.col(text_col)))
    return keyed.join(ledger_df, "_fp", "left_anti").drop("_fp")


def doc_shingle_arrays(
    df: "DataFrame", n: int, text_col: str = "text", id_col: str = "doc_id"
) -> "DataFrame":
    """(_id, sh: array<string>) — each document's DISTINCT word n-gram
    shingles as one array row.  Per-document dedup happens inside the row
    (array_distinct), so deriving this frame is a pure narrow map stage:
    no explode, no distinct shuffle.

    The parallelism guard matters: a compact text corpus arrives in few
    byte-sized scan partitions, but shingling is CPU-bound — without it
    the whole regex pipeline runs on a fraction of the cores (measured
    4.0s -> 0.6s at sf0.1 on local[32])."""
    from pyspark.sql import functions as F

    from hyperspace_spark.scale import ensure_min_parallelism

    # NULL text -> no row.  Such rows carry no content to compare, and
    # downstream band buckets built with concat_ws would otherwise
    # collapse every null-text doc into ONE bucket per band — an
    # O(N_null²) candidate blowup.  Filter on TEXT, not on the shingle
    # array: `sh` is null iff `text` is null (split/array_join propagate
    # null; empty-string text yields [''] and is kept — identical
    # empties ARE duplicates and hash consistently), and a filter on the
    # computed array gets predicate-pushed below the repartition
    # exchange, re-evaluating the whole tokenize+shingle expression
    # serially in the scan task (measured: the entire sf0.1 shingling ran
    # single-threaded, 3.3 s vs 0.9 s).
    return (
        ensure_min_parallelism(
            df.select(F.col(id_col).alias("_id"), text_col).filter(
                F.col(text_col).isNotNull()
            )
        )
        .select("_id", F.array_distinct(word_shingles(F.col(text_col), n)).alias("sh"))
    )


def doc_shingles(df: "DataFrame", n: int, text_col: str = "text", id_col: str = "doc_id") -> "DataFrame":
    """(id, shingle) pairs, distinct per document.

    explode_outer, NOT explode: the non-outer form triggers Spark's
    InferFiltersFromGenerate rule, which adds `size(sh)>0 AND
    isnotnull(sh)` below the Generate — and predicate pushdown then
    carries those through the parallelism Exchange to the scan, where
    they re-evaluate the ENTIRE tokenize+shingle expression serially in
    the (often single) scan task.  Measured at sf0.1: 3.3 s -> 0.5 s.
    The outer form is exempt from the rule and is semantically identical
    here: `sh` is never null (null text is filtered on input) and never
    empty (the CASE always yields >= 1 element)."""
    from pyspark.sql import functions as F

    return doc_shingle_arrays(df, n, text_col, id_col).select(
        "_id", F.explode_outer("sh").alias("shingle")
    )


def cap_shingle_df(sh: "DataFrame", max_df: int) -> "DataFrame":
    """Drop shingles whose DOCUMENT FREQUENCY exceeds ``max_df`` before any
    shingle self-join.  A shingle in k docs emits k² join rows — one viral
    boilerplate line produces a straggler task at 100 TB.  Similarity is
    then computed over the filtered shingle universe (both intersection
    and sizes), which barely moves Jaccard at threshold ≥ 0.5: hot
    shingles are shared by near-everything, so they inflate |A∩B| and
    |A∪B| together."""
    from pyspark.sql import functions as F

    ok = sh.groupBy("shingle").agg(F.count("*").alias("_df")).filter(
        F.col("_df") <= max_df
    ).select("shingle")
    return sh.join(ok, "shingle")  # AQE broadcasts when small


def ngram_jaccard_pairs(
    df: "DataFrame",
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = None,
    prefix_filter: bool = False,
) -> "DataFrame":
    """Exact word-n-gram Jaccard similarity join: pairs (a < b) with
    |A∩B| / |A∪B| >= threshold.  Output: (id_a, id_b, jaccard).
    ``max_shingle_df`` engages the hot-shingle cap (see cap_shingle_df).

    ``prefix_filter=True`` switches to the PPJoin-style exact candidate
    reduction (see ngram_jaccard_pairs_prefix): same output, ~3x fewer
    candidate pairs.  Off by default because the extra document-frequency
    join + per-doc ranking shuffle costs more than it saves on small
    corpora (measured at sf0.1); at real scale the quadratic candidate
    term dominates and the prefix path wins."""
    from pyspark.sql import functions as F

    if prefix_filter:
        return ngram_jaccard_pairs_prefix(
            df, n, threshold, text_col, id_col, max_shingle_df
        )

    # Persist the per-doc shingle arrays: they feed four consumers (both
    # join sides, the size aggregate, and the hot-shingle df count) and
    # without persistence Catalyst duplicates the whole scan->regex
    # pipeline into each subtree.  The frame is ~the tokenized corpus;
    # MEMORY_AND_DISK spills rather than OOMs at scale, and for truly
    # huge corpora the signature checkpoint pattern (write shingles to
    # storage once) replaces this pipeline anyway.
    docs = _persist(doc_shingle_arrays(df, n, text_col, id_col))
    # explode_outer: see doc_shingles — avoids InferFiltersFromGenerate
    # re-deriving the shingle expression below the exchange/cache.
    sh = docs.select("_id", F.explode_outer("sh").alias("shingle"))
    if max_shingle_df is not None:
        sh = cap_shingle_df(sh, max_shingle_df)
    sizes = sh.groupBy("_id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("sz").alias("sz_b"))
    # No broadcast hint on the sizes frames: they have ONE ROW PER
    # DOCUMENT, so a forced broadcast is unbounded at corpus scale
    # (billions of rows to every executor).  AQE picks broadcast when
    # the surviving frame is actually small, shuffle join otherwise —
    # the same policy as the verify join in minhash_lsh_pairs.
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs_prefix(
    df: "DataFrame",
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = None,
) -> "DataFrame":
    """Exact Jaccard join with PPJoin-style prefix filtering (Xiao et al.,
    WWW'08 — public algorithm): order each document's shingles by global
    document frequency (rarest first) and self-join only the first
    ``|A| - ceil(t*|A|) + 1`` shingles of each side.  Any pair with
    Jaccard >= t must share at least one prefix shingle, so the candidate
    set is EXACT (no recall loss) while the quadratic join term shrinks
    ~(1-t)² — the standard scale path for exact similarity self-joins.
    Verification intersects the persisted shingle arrays in-row."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    docs = _persist(doc_shingle_arrays(df, n, text_col, id_col))
    # explode_outer: see doc_shingles — avoids InferFiltersFromGenerate
    # re-deriving the shingle expression below the exchange/cache.
    sh = docs.select("_id", F.explode_outer("sh").alias("shingle"))
    if max_shingle_df is not None:
        sh = cap_shingle_df(sh, max_shingle_df)
        # The cap changes the similarity universe: recompute arrays from
        # the capped pairs so verification matches the capped semantics.
        docs = _persist(sh.groupBy("_id").agg(F.collect_list("shingle").alias("sh")))
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
    ranked = (
        sh.join(dfreq, "shingle")
        .withColumn("rn", F.row_number().over(W.partitionBy("_id").orderBy("_df", "shingle")))
        .withColumn("sz", F.count("*").over(W.partitionBy("_id")))
    )
    pref = ranked.filter(
        F.col("rn") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    ).select("_id", "shingle")
    a, b = pref.alias("a"), pref.alias("b")
    cands = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    ad = docs.select(F.col("_id").alias("id_a"), F.col("sh").alias("_sa"))
    bd = docs.select(F.col("_id").alias("id_b"), F.col("sh").alias("_sb"))
    inter = F.size(F.array_intersect("_sa", "_sb"))
    return (
        cands.join(ad, "id_a")
        .join(bd, "id_b")
        .withColumn(
            "jaccard",
            F.round(inter / (F.size("_sa") + F.size("_sb") - inter), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs_incremental(
    df: "DataFrame",
    new_ids: "DataFrame",
    old_pairs: "DataFrame",
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Incremental refresh of a materialized near-dup pair graph after an
    append: returns ``old_pairs`` UNION the pairs that involve at least
    one appended document — identical to a full recompute over ``df``
    (proven by ``test_ngram_incremental_equals_full``), but the shingle
    self-join is restricted to one new-docs side, so the cost is
    O(|new| x df) instead of O(|corpus| x df).  This is the pair-graph
    analog of RefreshIncrementalAction (reference
    actions/RefreshIncrementalAction.scala:45-133): at 100 TB the pair
    graph is a derived dataset refreshed with the corpus, never
    recomputed per query (see Workspace._ensure_ngram_pairs).

    ``df`` is the FULL post-append corpus; ``new_ids`` a one-column
    frame of appended ids.  No hot-shingle cap here: the cap's document
    frequencies are corpus-global, so a capped pair graph must be
    refreshed full (the same universe-shift rule the skipping index
    applies to sketch refreshes).
    """
    from pyspark.sql import functions as F

    docs = _persist(doc_shingle_arrays(df, n, text_col, id_col))
    sh = docs.select("_id", F.explode_outer("sh").alias("shingle"))
    new_key = new_ids.select(F.col(new_ids.columns[0]).alias("_id")).distinct()
    sh_new = sh.join(new_key, "_id")  # AQE broadcasts the id list when small
    # One-sided candidate join: every pair with >=1 new member appears —
    # old-new once (from the old side row), new-new twice (both
    # directions) — so shared shingles are counted DISTINCT per
    # normalized pair instead of per row.
    a, b = sh.alias("a"), sh_new.alias("b")
    cand = a.join(
        b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a._id") != F.col("b._id"))
    ).select(
        F.least(F.col("a._id"), F.col("b._id")).alias("id_a"),
        F.greatest(F.col("a._id"), F.col("b._id")).alias("id_b"),
        F.col("a.shingle").alias("shingle"),
    )
    inter = cand.groupBy("id_a", "id_b").agg(
        F.countDistinct("shingle").alias("inter")
    )
    sizes = sh.groupBy("_id").agg(F.count("*").alias("sz"))
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("sz").alias("sz_b"))
    fresh = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return old_pairs.select("id_a", "id_b", "jaccard").unionByName(fresh)


def minhash_signatures(
    df: "DataFrame",
    n: int = 3,
    num_hashes: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_arrays: "DataFrame | None" = None,
) -> "DataFrame":
    """(id, mh_0..mh_{H-1}) via H universal-hash permutations of shingle
    hashes.

    The signature is a PER-DOCUMENT reduction, so it is computed entirely
    inside the row with array HOFs (transform + array_min): a narrow map
    stage — no explode, no 64-aggregate groupBy, no shuffle at all.  At
    100 TB this shuffles nothing; the old explode+groupBy shape shuffled
    the whole exploded shingle set.  ``shingle_arrays`` reuses a
    precomputed (persisted) doc_shingle_arrays frame."""
    from pyspark.sql import functions as F

    docs = (
        shingle_arrays
        if shingle_arrays is not None
        else doc_shingle_arrays(df, n, text_col, id_col)
    )
    # Two-step select: _h is non-cheap and referenced by the signature
    # UDF, so CollapseProject keeps it as its own projection — each
    # shingle is md5-hashed exactly once (JVM-side, codegen).
    hashed = docs.select(
        "_id",
        F.transform(F.col("sh"), lambda s: shingle_hash_col(s) % F.lit(_MERSENNE)).alias("_h"),
    )
    # The H permutations are ONE Arrow-batched numpy kernel, not H
    # interpreted HOF passes: Catalyst evaluates transform() lambdas per
    # element with no codegen, and H=64 such passes measured ~1.4 s for
    # 5k docs at sf0.1 — the whole pipeline's dominant cost.  All values
    # are < 2^31 (_MERSENNE = 2^31-1), so h*a+b < 2^63 is EXACT in
    # uint64 — the kernel reproduces the JVM arithmetic bit-for-bit
    # (asserted in tests), it is purely an execution-strategy change.
    # The batch is flattened to one (total_shingles x H) matrix and
    # segment-reduced, so per-row Python overhead is ~zero.
    import numpy as np
    import pandas as pd

    params = _perm_params(num_hashes)
    a_vec = np.array([a for a, _ in params], dtype=np.uint64)
    b_vec = np.array([b for _, b in params], dtype=np.uint64)
    mersenne = np.uint64(_MERSENNE)

    # No type-hint inference: module-level `from __future__ import
    # annotations` stringifies hints and `pd` is function-local, so the
    # eval type is passed explicitly.
    @F.pandas_udf("array<long>", F.PandasUDFType.SCALAR)
    def _sig(h_col):
        out: list = [None] * len(h_col)
        arrs = []
        idxs = []
        for i, arr in enumerate(h_col):
            if arr is not None and len(arr) > 0:
                idxs.append(i)
                arrs.append(np.asarray(arr, dtype=np.uint64))
        if not arrs:
            return pd.Series(out)
        flat = np.concatenate(arrs)
        big = (flat[:, None] * a_vec + b_vec) % mersenne
        starts = np.zeros(len(arrs), dtype=np.int64)
        np.cumsum([len(a) for a in arrs[:-1]], out=starts[1:])
        minima = np.minimum.reduceat(big, starts, axis=0)
        for row, i in enumerate(idxs):
            out[i] = minima[row].astype(np.int64)
        return pd.Series(out)

    sig = hashed.select("_id", _sig(F.col("_h")).alias("_sig"))
    return sig.select(
        F.col("_id").alias(id_col),
        *[F.element_at("_sig", i + 1).alias(f"mh_{i}") for i in range(num_hashes)],
    )


def minhash_lsh_pairs(
    df: "DataFrame",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    verify_threshold: float | None = None,
    max_bucket_size: int | None = None,
) -> "DataFrame":
    """LSH candidate pairs: documents sharing at least one band bucket.

    rows/band = num_hashes/bands sets the similarity knee
    (s-curve ~ (1/bands)^(1/rows_per_band)).  With verify_threshold set,
    candidates are re-checked with exact Jaccard (the classic
    LSH-then-verify pipeline).  Output: (id_a, id_b [, jaccard]).

    ``max_bucket_size`` is the hot-bucket cap — SET IT for any large run.
    A clique of k near-identical documents (web boilerplate) lands in the
    same bucket in EVERY band and the self-join emits O(k²) candidate
    rows in one task; k = 10⁶ exact copies at web scale is a 10¹²-row
    straggler.  Buckets larger than the cap switch from all-pairs to a
    STAR: each member pairs with the bucket's minimum id only — k-1
    candidates instead of k(k-1)/2 — so the downstream duplicate CLUSTER
    (connected components over verified pairs) is preserved whenever the
    hot bucket really is a near-duplicate clique, which is what an
    oversized bucket means at honest band widths.  Transitive pair rows
    within a hot bucket are intentionally not emitted (they carry no
    extra information for dedup); small buckets are exact all-pairs as
    before.  Same discipline as cap_shingle_df and the skipping index's
    file-count caps (reference IndexConstants.scala:149-161)."""
    from pyspark.sql import functions as F

    if bands < 1 or num_hashes % bands != 0:
        # bands=0 rows_per_band would hash every doc into ONE md5('')
        # bucket per band (all-pairs output); a non-divisible combo
        # silently discards trailing hashes and shifts the s-curve.
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes})"
        )
    rows_per_band = num_hashes // bands
    # One persisted shingle-array frame feeds the signature build and
    # the verify joins — see ngram_jaccard_pairs for the rationale.
    docs = _persist(doc_shingle_arrays(df, n, text_col, id_col))
    # Persist the signature frame as well: the banded bucket frame
    # self-joins, and without this the 64-permutation transform subtree
    # is evaluated once per join side.  One row per doc — tiny.
    sigs = _persist(
        minhash_signatures(df, n, num_hashes, text_col, id_col, shingle_arrays=docs)
    )
    band_cols = []
    for bi in range(bands):
        cols = [F.col(f"mh_{bi * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(F.md5(F.concat_ws("_", *[c.cast("string") for c in cols])).alias(f"band_{bi}"))
    banded = sigs.select(id_col, *band_cols)
    stacked = banded.select(
        F.col(id_col).alias("_id"),
        # outer: sidesteps InferFiltersFromGenerate (see doc_shingles);
        # the band array is a literal-length array of non-null md5s.
        F.explode_outer(
            F.array(*[F.concat_ws("#", F.lit(str(bi)), F.col(f"band_{bi}")) for bi in range(bands)])
        ).alias("bucket"),
    )
    if max_bucket_size is not None:
        if max_bucket_size < 2:
            raise ValueError("max_bucket_size must be >= 2")
        # One cheap agg over the (doc x bands) frame classifies buckets;
        # AQE broadcasts the size table when small.  Hot buckets emit a
        # star to the bucket min; the quadratic join runs only on the
        # capped remainder.
        sizes = stacked.groupBy("bucket").agg(
            F.count("*").alias("_bsz"), F.min("_id").alias("_bmin")
        )
        tagged = stacked.join(sizes, "bucket")
        cold = tagged.filter(F.col("_bsz") <= max_bucket_size).select("_id", "bucket")
        star = (
            tagged.filter(
                (F.col("_bsz") > max_bucket_size) & (F.col("_id") != F.col("_bmin"))
            )
            .select(F.col("_bmin").alias("id_a"), F.col("_id").alias("id_b"))
        )
        a, b = cold.alias("a"), cold.alias("b")
        cand = (
            a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a._id") < F.col("b._id")))
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .unionByName(star)
        )
    else:
        a, b = stacked.alias("a"), stacked.alias("b")
        cand = (
            a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a._id") < F.col("b._id")))
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        )
    if verify_threshold is None:
        # candidate-only API keeps the de-duplicated pair set
        return cand.distinct()
    # Verify ONLY the candidate pairs (that is the point of LSH): fetch
    # each pair's shingle arrays (two equi-joins on id — broadcast or
    # shuffle, Spark's choice) and intersect INSIDE the row.  Cost scales
    # with |candidates| x shingles/doc, never N², and needs no
    # shingle-level join at all.
    #
    # NOTE (r15): no .distinct() on the candidates before verification —
    # the same §2.4 move as lsh_bucketed_pairs (r14).  A pair colliding
    # in k of the ``bands`` bands appears k times; de-duplicating first
    # cost a full exchange of the candidate set, while a duplicate
    # re-verify is one broadcast-hash probe + one array_intersect.  The
    # distinct now runs on the threshold SURVIVORS (duplicates carry
    # identical jaccard values, so the collapsed set is provably the
    # same).
    a_docs = docs.select(F.col("_id").alias("id_a"), F.col("sh").alias("_sh_a"))
    b_docs = docs.select(F.col("_id").alias("id_b"), F.col("sh").alias("_sh_b"))
    inter = F.size(F.array_intersect(F.col("_sh_a"), F.col("_sh_b")))
    return (
        cand.join(a_docs, "id_a")
        .join(b_docs, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                inter
                / (F.size(F.col("_sh_a")) + F.size(F.col("_sh_b")) - inter),
                6,
            ),
        )
        .filter(F.col("jaccard") >= verify_threshold)
        .select("id_a", "id_b", "jaccard")
        .distinct()
    )


def simhash(df: "DataFrame", bits: int = 60, text_col: str = "text", id_col: str = "doc_id") -> "DataFrame":
    """Per-document SimHash: sign-sum over token-hash bits (tokens keep
    their multiplicity), assembled into one integer via shiftleft/sum of
    distinct powers of two (exact in 64-bit arithmetic).  Near-dup
    detection = small hamming distance.

    Like the MinHash signature this is a per-document reduction, so it
    runs entirely inside the row (aggregate + zip_with over the token
    hashes): a narrow no-shuffle map stage instead of an exploded
    60-aggregate groupBy."""
    from pyspark.sql import functions as F

    from hyperspace_spark.scale import ensure_min_parallelism

    hashes = F.transform(tokens(F.col(text_col)), lambda t: shingle_hash_col(t))

    # The per-token bit-sign reduction is ONE Arrow-batched numpy kernel
    # (same rationale and uint-safety as minhash_signatures: Catalyst
    # HOF lambdas are interpreted per element; history of this hot spot —
    # 60 per-bit when-expressions 5.5 s -> mask-array aggregate 1.2 s ->
    # this kernel).  Token hashes are < 2^60, shifts/sums are exact
    # integer math, so the output is bit-identical to the expression
    # form (asserted in tests/test_llm_ops.py).
    import numpy as np
    import pandas as pd

    shifts = np.arange(bits, dtype=np.uint64)
    weights = (np.uint64(1) << shifts).astype(np.int64)

    @F.pandas_udf("long", F.PandasUDFType.SCALAR)
    def _simhash(h_col):
        # NULL token array (NULL text) -> NULL simhash, matching the
        # expression form: a 0 here would give every NULL-text doc the
        # SAME valid signature and flag unrelated docs as near-dups.
        # (Empty ARRAY -> 0, also matching; note empty TEXT never
        # produces one — it tokenizes to a single empty-string token.)
        out = pd.array(np.zeros(len(h_col), dtype=np.int64), dtype="Int64")
        arrs, idxs = [], []
        for i, arr in enumerate(h_col):
            if arr is None:
                out[i] = pd.NA
            elif len(arr) > 0:
                idxs.append(i)
                arrs.append(np.asarray(arr, dtype=np.uint64))
        if not arrs:
            return pd.Series(out)
        flat = np.concatenate(arrs)
        # (T x bits) sign matrix in int8 (values ±1), segment-summed per doc
        signs = (((flat[:, None] >> shifts) & np.uint64(1)).astype(np.int8) << 1) - 1
        starts = np.zeros(len(arrs), dtype=np.int64)
        np.cumsum([len(a) for a in arrs[:-1]], out=starts[1:])
        sums = np.add.reduceat(signs.astype(np.int32), starts, axis=0)
        sims = ((sums > 0).astype(np.int64) * weights).sum(axis=1)
        for row, i in enumerate(idxs):
            out[i] = sims[row]
        return pd.Series(out, dtype="Int64")

    per_doc = ensure_min_parallelism(df.select(F.col(id_col), text_col)).select(
        F.col(id_col), hashes.alias("_h")
    )
    return per_doc.select(F.col(id_col), _simhash(F.col("_h")).alias("simhash"))


def simhash_pairs(
    df: "DataFrame",
    max_hamming: int = 3,
    bits: int = 60,
    chunks: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Near-dup pairs by SimHash: band on bit chunks (pigeonhole — any
    pair within max_hamming < chunks shares an identical chunk), verify
    with exact popcount hamming distance."""
    from pyspark.sql import functions as F

    per_chunk = bits // chunks
    # sigs feeds both sides of the bucket self-join; persist so the
    # token-hash aggregation runs once.  Null-text docs are dropped (no
    # tokens to hash) — they would otherwise share every chunk bucket
    # ("c#" after the null-skipping concat) and emit O(N_null²)
    # candidate rows that verification then discards.  Filter the INPUT
    # text, not the computed signature: simhash is null iff text is null,
    # and a filter on the computed column gets predicate-pushed below the
    # parallelism repartition, re-running the whole 60-bit aggregation
    # serially in the scan task.
    sigs = _persist(
        simhash(df.filter(F.col(text_col).isNotNull()), bits, text_col, id_col)
    )
    mask = (1 << per_chunk) - 1
    stacked = sigs.select(
        F.col(id_col).alias("_id"),
        F.col("simhash"),
        # outer: sidesteps InferFiltersFromGenerate (see doc_shingles);
        # chunk keys are non-null for every non-null signature.
        F.explode_outer(
            F.array(
                *[
                    F.concat_ws(
                        "#",
                        F.lit(str(c)),
                        (F.shiftright(F.col("simhash"), c * per_chunk).bitwiseAND(F.lit(mask))).cast("string"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("bucket"),
    )
    a, b = stacked.alias("a"), stacked.alias("b")
    pairs = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a._id") < F.col("b._id")))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs.select("id_a", "id_b", "hamming")


def _file_input_bytes(df: "DataFrame") -> int | None:
    """Total bytes of a file-backed frame's inputs — driver metadata, no
    job.  None when the source exposes no file list at all (views,
    in-memory frames); **-1** when files exist but cannot be sized (the
    caller must treat that as "assume big", not "assume small" — a
    500 GiB s3:// corpus silently passing the O(N²) guard is exactly the
    accident the guard exists for).  Remote schemes go through the
    session's Hadoop FileSystem; above 256 files the size is
    extrapolated from a 256-file sample (good enough for a threshold
    check, no metadata stampede)."""
    import os

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None

    def one(f: str) -> int:
        if f.startswith("file://"):
            return os.path.getsize(f[7:])
        if f.startswith("file:"):
            return os.path.getsize(f[5:])
        if "://" not in f and not f.startswith(("hdfs:", "s3:", "s3a:", "abfss:", "gs:", "dbfs:")):
            return os.path.getsize(f)
        spark = df.sparkSession
        jpath = spark._jvm.org.apache.hadoop.fs.Path(f)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return int(fs.getFileStatus(jpath).getLen())

    try:
        # Stride-sample rather than taking the FIRST 256: listing order
        # often correlates with size (e.g. one small early partition),
        # and a head sample would let a large corpus underestimate its
        # way past the O(N^2) guard.
        if len(files) <= 256:
            sample = files
        else:
            sample = files[:: max(1, len(files) // 256)]
        total = sum(one(f) for f in sample)
        if len(files) > len(sample):
            total = int(total / len(sample) * len(files))
        return total
    except Exception:
        return -1


# Exact all-pairs cosine is O(N²) FLOPs; past this input size the job is
# an accident, not a choice (≈1 GiB of fp32 embeddings at dim 128 is
# ~2M vectors → 2·10¹² similarity evaluations).
_EXACT_PAIRS_MAX_BYTES = 1 << 30


def embedding_near_dup_pairs(
    emb: "DataFrame",
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "blocked",
    n_blocks: int = 8,
    force: bool = False,
    max_exact_bytes: int = _EXACT_PAIRS_MAX_BYTES,
) -> "DataFrame":
    """Exact cosine near-dup pairs (a < b, cosine >= threshold).

    EVERY method here is exact all-pairs — O(N²) compute by definition —
    so a file-backed input larger than ``max_exact_bytes`` (default
    1 GiB) raises unless ``force=True``: at corpus scale use the
    sub-quadratic paths instead (``similarity.lsh_bucketed_pairs`` for
    bucketed near-dup pairs, ``similarity.ann_ivf_topk`` / the persisted
    ANN index for top-k).  The guard reads only driver-side file
    metadata (zero jobs; remote schemes via the Hadoop FileSystem,
    sampled above 256 files) and cannot see through views or in-memory
    frames — those pass unchecked.  File-backed inputs that cannot be
    SIZED fail closed: refuse rather than silently launching the
    quadratic job.

    method='blocked' (default): distributed block-pair matmul.  Rows hash
    into ``n_blocks`` blocks; every unordered block pair (i ≤ j) becomes
    one applyInPandas group whose task runs a numpy/BLAS `Lᵢ @ Lⱼᵀ`.
    Exact semantics are O(N²) FLOPs by definition, but the work spreads
    over B(B+1)/2 tasks with NOTHING on the driver — replication factor
    is B per row, so pick B ~ sqrt(2 · parallelism).  (For sub-quadratic
    approximate dedup use similarity.lsh_bucketed_pairs.)

    method='blas_smallcorpus': the corpus is collect()ed to the driver,
    normalized once, broadcast, and each Arrow batch computes
    `block @ corpusᵀ`.  Fastest when the corpus fits driver memory —
    and ONLY then; this is explicitly not the 100 TB path.

    method='sql': pure DataFrame higher-order-function pair join —
    engine-portable reference implementation."""
    from pyspark.sql import functions as F

    if not force:
        nbytes = _file_input_bytes(emb)
        if nbytes is not None and (nbytes < 0 or nbytes > max_exact_bytes):
            size_msg = (
                "input size could not be determined (file-backed but unsized paths)"
                if nbytes < 0
                else f"input is {nbytes / 2**20:.0f} MiB > max_exact_bytes={max_exact_bytes / 2**20:.0f} MiB"
            )
            raise ValueError(
                f"embedding_near_dup_pairs is exact all-pairs (O(N²)); {size_msg}. "
                "Use similarity.lsh_bucketed_pairs (sub-quadratic near-dup pairs) or "
                "the ANN index (indexes/ann.py) for top-k; pass force=True to run anyway."
            )

    if method == "blocked":
        return _blocked_pairs(emb, threshold, id_col, vec_col, n_blocks)

    if method == "sql":
        from hyperspace_spark.llm.similarity import dot_expr, unit_expr

        v = emb.select(
            F.col(id_col).alias("_id"),
            unit_expr(F.col(vec_col).cast("array<double>")).alias("_v"),
        )
        a, b = v.alias("a"), v.alias("b")
        return (
            a.join(b, F.col("a._id") < F.col("b._id"))
            .withColumn("cosine", F.round(dot_expr(F.col("a._v"), F.col("b._v")), 6))
            .filter(F.col("cosine") >= threshold)
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"), "cosine")
        )

    if method not in ("blas_smallcorpus", "blas"):
        raise ValueError("method must be 'blocked', 'blas_smallcorpus', or 'sql'")

    import numpy as np

    spark = emb.sparkSession
    rows = emb.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat = mat / norms[:, None]
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    def _blocks(batches):
        import pandas as pd

        corpus_ids, corpus = b_ids.value, b_mat.value
        for pdf in batches:
            blk = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            n = np.linalg.norm(blk, axis=1)
            n[n == 0] = 1.0
            blk = blk / n[:, None]
            sims = np.round(blk @ corpus.T, 6)
            blk_ids = pdf[id_col].to_numpy()
            ii, jj = np.nonzero(sims >= threshold)
            keep = blk_ids[ii] < corpus_ids[jj]
            yield pd.DataFrame(
                {
                    "id_a": blk_ids[ii][keep],
                    "id_b": corpus_ids[jj][keep],
                    "cosine": sims[ii, jj][keep],
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        _blocks, "id_a long, id_b long, cosine double"
    )


def _blocked_pairs(
    emb: "DataFrame", threshold: float, id_col: str, vec_col: str, n_blocks: int
) -> "DataFrame":
    """Exact all-pairs cosine over unordered block pairs (see
    embedding_near_dup_pairs).  Each id pair lands in EXACTLY one
    (block_a, block_b) group, so no post-dedup is needed."""
    from pyspark.sql import functions as F

    spark = emb.sparkSession
    B = max(2, n_blocks)
    v = emb.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(B)).alias("_blk"),
    )
    # Static replication map: a row of block b is the LEFT side of groups
    # (b, j) for j >= b and the RIGHT side of groups (i, b) for i < b.
    rep = [(b, b, j, "l") for b in range(B) for j in range(b, B)]
    rep += [(b, i, b, "r") for b in range(B) for i in range(b)]
    rep_df = spark.createDataFrame(rep, "_blk long, bi int, bj int, side string")
    rows = v.join(F.broadcast(rep_df), "_blk").select("bi", "bj", "side", "_id", "_v")

    def _group(key, pdf):
        import numpy as np
        import pandas as pd

        bi, bj = int(key[0]), int(key[1])

        def mat(frame):
            m = np.array(frame["_v"].tolist(), dtype=np.float64)
            nrm = np.linalg.norm(m, axis=1)
            nrm[nrm == 0] = 1.0
            return frame["_id"].to_numpy(), m / nrm[:, None]

        empty = pd.DataFrame({"id_a": pd.array([], dtype="int64"),
                              "id_b": pd.array([], dtype="int64"),
                              "cosine": pd.array([], dtype="float64")})
        left = pdf[pdf["side"] == "l"]
        right = left if bi == bj else pdf[pdf["side"] == "r"]
        if len(left) == 0 or len(right) == 0:
            return empty
        if bi == bj:
            ids, m = mat(left)
            sims = np.round(m @ m.T, 6)
            ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
            id_a, id_b = ids[ii], ids[jj]
        else:
            lids, lm = mat(left)
            rids, rm = mat(right)
            sims = np.round(lm @ rm.T, 6)
            ii, jj = np.nonzero(sims >= threshold)
            id_a, id_b = lids[ii], rids[jj]
        lo = np.minimum(id_a, id_b)
        hi = np.maximum(id_a, id_b)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": sims[ii, jj]})

    return rows.groupBy("bi", "bj").applyInPandas(
        _group, "id_a long, id_b long, cosine double"
    )


def connected_components(
    pairs: "DataFrame",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
    small_cutoff: int = 1_000_000,
) -> "DataFrame":
    """Cluster near-duplicate pairs: (node, cluster) with cluster = the
    minimum id reachable through the pair graph (connected components).

    Iterative min-label propagation WITH POINTER JUMPING (each round a
    node also adopts the label of its current label) — convergence is
    O(log diameter) rounds, so even a million-link transitive chain
    needs ~20 rounds; the driver only controls iteration, never touches
    rows.  NOTE this function runs eagerly (the loop is driver-steered
    actions), unlike the lazy pair-builders upstream.

    Each round CHECKPOINTS its label frame (materialize AND truncate
    the logical plan): a persist alone keeps the lineage, and because
    every round references the previous labels twice (neighbor join +
    change count) the plan tree DOUBLES per round — a long-diameter
    graph OOMs the driver on plan strings long before any data pressure
    (the classic iterative-join pitfall at scale; hit for real by
    semantic_dedup's chain-shaped cosine graph at sf0.1).  When the
    session has a RELIABLE checkpoint dir configured
    (``sc.setCheckpointDir``) it is used — recoverable if an executor
    dies mid-loop; otherwise localCheckpoint (executor-local blocks,
    faster, NOT recomputable on executor loss — on a preemptible
    cluster set a checkpoint dir).  Intermediate round frames are freed
    by Spark's ContextCleaner as their references drop; they hold only
    pair-graph labels, tiny relative to the corpus.
    """
    from pyspark.sql import functions as F

    sc = pairs.sparkSession.sparkContext
    reliable = sc._jsc.sc().checkpointDir().isDefined()

    def _cut(df):
        return df.checkpoint(eager=True) if reliable else df.localCheckpoint(eager=True)

    # Symmetrize via explode, not union: a union's two branches would
    # each recompute the (expensive) pairs input — one pass emits both
    # directions.
    edges = (
        pairs.select(
            # outer: see doc_shingles — the 2-struct array is never
            # null/empty, and non-outer explode would push an inferred
            # filter into the (expensive) pairs input.
            F.explode_outer(
                F.array(
                    F.struct(F.col(id_a).alias("src"), F.col(id_b).alias("dst")),
                    F.struct(F.col(id_b).alias("src"), F.col(id_a).alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .persist()
    )
    # Near-dup graphs are usually tiny relative to the corpus (only the
    # duplicated slice appears).  When the edge list fits ONE partition,
    # skip the round loop entirely: a single Arrow-batched union-find
    # task computes the exact min-label components in one linear pass —
    # one Spark job instead of O(log diameter) rounds x 4 jobs each
    # (r10; the job-count floor dominated semantic_dedup's wall time at
    # bench scale, and on a real cluster scheduler latency makes each
    # saved round worth far more).  Executor-side, never a driver
    # collect.  Graphs past the cutoff keep the parallel pointer-jumping
    # layout below — correctness is identical (min reachable id), only
    # the schedule differs.
    # (small_cutoff=0 forces the parallel path — tests and path-by-path
    # benchmarking use it.)
    if edges.count() < small_cutoff:
        labels = _union_find_single_task(edges)
        edges.unpersist()
        return labels
    labels = _cut(
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    changed = 0
    for _ in range(max_iter):
        # candidate label for each node: min over neighbors' labels
        stepped = _cut(
            labels.join(
                edges.join(labels, edges.dst == labels.node)
                .groupBy("src")
                .agg(F.min("label").alias("nmin")),
                labels.node == F.col("src"),
                "left",
            ).select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
        )
        # Pointer jumping: also adopt the label OF my label.  Neighbor
        # propagation alone needs diameter rounds — a 2,000-link chain
        # of transitive near-dups (real at low thresholds) is 2,000
        # sequential Spark jobs; following the label's own label halves
        # the remaining chain every round, so convergence is
        # O(log diameter) with one extra self-join per round.  `stepped`
        # is checkpointed too: the self-join references it twice, and
        # without materialization the neighbor join would recompute in
        # both branches.
        parents = stepped.select(
            F.col("node").alias("label"), F.col("label").alias("_plabel")
        )
        new_labels = _cut(
            stepped.join(parents, "label", "left").select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("_plabel"), F.col("label"))
                ).alias("label"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        # Unconverged labels are WRONG (a long chain's far end still
        # carries a stale cluster id) — never return them silently.
        import warnings

        warnings.warn(
            f"connected_components did not converge within max_iter={max_iter} "
            f"({changed} labels still changing); cluster ids are partial — "
            "raise max_iter (rounds needed ~ log2 of the graph diameter "
            "with pointer jumping)",
            RuntimeWarning,
            stacklevel=2,
        )
    # Re-expose the result through a REGISTERED persist so
    # release_caches() can free it: unpersist() on a checkpointed frame
    # is a CacheManager no-op (checkpoint blocks are RDD storage, freed
    # by the ContextCleaner when references drop).
    return _persist(
        labels.select(F.col("node"), F.col("label").alias("cluster"))
    )


def _union_find_single_task(edges: "DataFrame") -> "DataFrame":
    """Exact connected components of a SMALL symmetric edge list in one
    executor task: coalesce to a single partition, run union-find with
    path halving over the Arrow batches, emit (node, cluster=min id of
    the component).  The output contract matches connected_components'
    parallel path bit-for-bit; only graphs under its small cutoff come
    here, so the single task holds at most ~2M dictionary entries."""
    from pyspark.sql import functions as F

    id_type = dict(edges.dtypes)["src"]

    def cc(batches):
        import pandas as pd

        parent: dict = {}
        seen: set = set()

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            # path halving
            while parent.get(x, x) != root:
                parent[x], x = root, parent[x]
            return root

        for pdf in batches:
            for s, d in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
                seen.add(s)
                seen.add(d)
                rs, rd = find(s), find(d)
                if rs != rd:
                    parent[max(rs, rd)] = min(rs, rd)
        roots = {n: find(n) for n in seen}
        yield pd.DataFrame(
            {"node": list(roots), "cluster": [roots[n] for n in roots]}
        )

    out = edges.coalesce(1).mapInPandas(
        cc, schema=f"node {id_type}, cluster {id_type}"
    )
    out = _persist(out)
    out.count()  # preserve connected_components' eager contract
    return out


def keep_canonical(
    df: "DataFrame",
    pairs: "DataFrame",
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> "DataFrame":
    """Deduplicated corpus: one document per near-dup cluster (the
    minimum id), all untouched documents kept.  The drop-list is the set
    of nodes whose cluster label differs from their own id — an anti-join
    against the corpus."""
    from pyspark.sql import functions as F

    dupes = (
        connected_components(pairs, id_a, id_b)
        .filter(F.col("node") != F.col("cluster"))
        .select(F.col("node").alias(id_col))
    )
    return df.join(dupes, id_col, "left_anti")


def semantic_dedup(
    emb: "DataFrame",
    threshold: float = 0.95,
    nbits: int = 4,
    bands: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = 4096,
) -> "DataFrame":
    """SemDeDup-style semantic deduplication (Abbas et al., 2023 —
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): documents whose EMBEDDINGS are near-identical are
    semantic duplicates even when their text differs (translations,
    paraphrases, templated rewrites exact/fuzzy text dedup misses).
    Pipeline: multi-band hyperplane LSH buckets candidate pairs (the
    paper clusters with k-means; seeded hyperplanes are the
    engine-replayable equivalent — deterministic, oracle-checkable, no
    iterative fitting), cosine-verify above ``threshold``, connect
    components, keep the minimum-id representative per semantic
    cluster.

    The default ``threshold=0.95`` is the paper's near-identical
    regime: this operator DELETES data, and a looser cutoff chains
    merely-related documents into giant transitive clusters and drops
    most of a legitimate corpus (the contract query passes 0.4
    EXPLICITLY because the synthetic embeddings top out near 0.51 —
    tuned for non-empty verification, not a production setting).

    Scale shape: every stage is an existing bounded primitive —
    ``similarity.lsh_bucketed_pairs`` (banded buckets, ``max_bucket``
    cap against boilerplate cliques), ``connected_components``
    (pointer-jumping min-label propagation, driver controls only the
    loop), ``keep_canonical`` (anti-join).  No all-pairs anywhere.
    Note the clustering stage runs EAGERLY at call time (an iterative
    driver-steered loop, unlike this module's lazy pair-builders).

    Returns the surviving rows of ``emb`` (all columns)."""
    from hyperspace_spark.llm.similarity import lsh_bucketed_pairs

    pairs = lsh_bucketed_pairs(
        emb,
        threshold=threshold,
        nbits=nbits,
        bands=bands,
        id_col=id_col,
        vec_col=vec_col,
        max_bucket=max_bucket,
    )
    # Materialize the pair graph and CUT its lineage before the
    # iterative clustering: the LSH plan embeds nbits*bands hyperplane
    # literal arrays, and connected_components' label-propagation loop
    # would otherwise re-embed that plan per iteration — plan-STRING
    # growth alone OOMs a long-lived driver.  This also mirrors the
    # production shape (the n-gram pipeline materializes its pair graph
    # to parquet for exactly this reason); the pair graph is tiny
    # relative to the corpus (near-dup pairs only).  Same checkpoint
    # policy as connected_components' _cut: prefer the reliable
    # checkpoint dir when the session has one (survives executor loss
    # on preemptible clusters), localCheckpoint otherwise.
    pairs = pairs.select("id_a", "id_b")
    sc = pairs.sparkSession.sparkContext
    if sc._jsc.sc().checkpointDir().isDefined():
        pairs = pairs.checkpoint(eager=True)
    else:
        pairs = pairs.localCheckpoint(eager=True)
    return keep_canonical(emb, pairs, id_col=id_col)


def contamination_check(
    train: "DataFrame",
    eval_df: "DataFrame",
    n: int = 8,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Benchmark-contamination detection: training documents sharing at
    least ``min_shared`` distinct word n-gram shingles with any eval
    document.  Long shingles (n=8 default — the common contamination
    heuristic) make coincidental overlap vanishingly rare, so a single
    shared shingle is a strong signal.

    Output: (train_id, eval_id, shared).  Shape at scale: one equi-join
    keyed on shingle — the eval side is tiny (benchmarks), so Spark
    broadcasts it and the check is one pass over the training corpus."""
    from pyspark.sql import functions as F

    tr = doc_shingles(train, n, text_col, id_col).select(
        F.col("_id").alias("train_id"), "shingle"
    )
    ev = doc_shingles(eval_df, n, text_col, id_col).select(
        F.col("_id").alias("eval_id"), "shingle"
    )
    return (
        tr.join(ev, "shingle")
        .groupBy("train_id", "eval_id")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def rejoin_text_preserving_null(
    df: "DataFrame", rebuilt: "DataFrame", id_col: str, text_col: str
) -> "DataFrame":
    """Re-attach per-document rebuilt text to the full id set with the
    shared NULL contract: NULL input text stays NULL (collapsing it to
    '' would make every media-only / unfetched doc a mutual exact
    duplicate downstream — the precise trap exact_dedup's contract
    defends against), while a non-null doc missing from ``rebuilt``
    (every line/paragraph removed) becomes ''.  Used by both
    paragraph_dedup and boilerplate.remove_boilerplate_lines so the
    documented contract cannot fork."""
    from pyspark.sql import functions as F

    return (
        df.select(id_col, F.col(text_col).isNull().alias("_hs_nulltext"))
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.when(F.col("_hs_nulltext"), F.lit(None).cast("string"))
            .otherwise(F.coalesce(F.col(text_col), F.lit("")))
            .alias(text_col),
        )
    )


def paragraph_dedup(
    df: "DataFrame",
    sep: str = "\n\n",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Paragraph-level exact dedup: split each document on ``sep``, keep
    only the globally FIRST occurrence of every distinct paragraph
    (ordered by (doc id, position) — deterministic, engine-portable),
    and reassemble documents from their surviving paragraphs.

    This is the within-corpus boilerplate killer used by web-scale
    pretraining pipelines (headers, footers, nav blocks repeated across
    pages): document-level dedup never catches them, paragraph-level
    does.  Empty paragraphs are dropped; a document whose every
    paragraph was seen before survives as an EMPTY string (row count is
    preserved, lineage joins keep working).

    Scale shape: explode -> one hash shuffle on the paragraph string for
    the global first-occurrence window -> one shuffle back on the doc id
    for reassembly.  No driver state; paragraph skew (one paragraph
    repeated everywhere) lands on a single reducer only for the window's
    rank, which is a count-like O(occurrences) pass.

    Returns (id_col, text_col) with the deduplicated text."""
    import re as _re

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    parts = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep))).alias("_pos", "_para"),
    ).filter(F.col("_para") != "")
    w = Window.partitionBy("_para").orderBy(id_col, "_pos")
    kept = (
        parts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    reassembled = kept.groupBy(id_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_para"))),
                lambda s: s["_para"],
            ),
        ).alias(text_col)
    )
    return rejoin_text_preserving_null(df, reassembled, id_col, text_col)


def remove_repeated_spans(
    df: "DataFrame",
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> "DataFrame":
    """Exact repeated-substring removal at word n-gram granularity (the
    ExactSubstr discipline of Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better", re-expressed relationally): any
    n-token span occurring >= ``min_count`` times in the corpus (default
    2, the paper's setting; web-scale runs often raise it) is cut from
    every occurrence except the globally FIRST one (ordered by (doc_id,
    position)); surviving tokens re-join with single spaces.

    Returns ``(id_col, n_tokens, n_removed, cleaned_text)`` for every
    non-NULL-text document (short documents pass through with
    n_removed = 0).

    100 TB shape:
    - the one corpus-sized SHUFFLE is the n-gram groupBy — partial-
      aggregated map-side (count + min(occurrence key), NO window), so a
      boilerplate gram occurring 10^9 times folds into one row without a
      skewed sort.  The n-gram EXPANSION itself runs twice (once feeding
      the groupBy, once for the join back) — a deliberate recompute-over-
      cache choice: persisting the expansion would hold ~n× the corpus
      bytes, while re-expanding is a narrow CPU-only map stage;
    - only grams with count >= 2 survive, so the join back to
      occurrences carries just the duplicated-gram dictionary (AQE
      broadcasts it when small);
    - removal positions regroup per DOCUMENT (rows ~ duplicated spans,
      not corpus tokens) and expand to covered token indexes IN-ROW
      (flatten/transform — no explode);
    - the final pass joins the per-doc removal array back to the token
      array and filters each row locally with higher-order functions.

    Occurrence order is ``struct(doc_id, position)`` — numeric ids order
    numerically, string ids lexicographically (the same ordering
    exact_dedup uses), with no arithmetic encoding to overflow or NULL
    out on non-numeric ids.
    """
    from pyspark.sql import functions as F

    from hyperspace_spark.llm.text import tokens
    from hyperspace_spark.scale import ensure_min_parallelism

    toks = _persist(
        ensure_min_parallelism(
            df.select(F.col(id_col).alias("_id"), text_col).filter(
                F.col(text_col).isNotNull()
            )
        ).select("_id", tokens(F.col(text_col)).alias("_t"))
    )

    occ = (
        toks.filter(F.size("_t") >= n)
        .select(
            "_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_t") - n + 1),
                    lambda i: F.struct(
                        i.cast("long").alias("pos"),
                        F.array_join(F.slice("_t", i, n), " ").alias("g"),
                    ),
                )
            ).alias("o"),
        )
        .select(
            "_id",
            F.col("o.pos").alias("pos"),
            F.col("o.g").alias("g"),
        )
    )
    # Occurrence ordering by struct(_id, pos): lexicographic on the id's
    # own type (numeric ids numerically, string ids lexicographically —
    # consistent with exact_dedup's ORDER BY id_col), no arithmetic
    # encoding to overflow or NULL out on non-numeric ids.
    okey = F.struct(F.col("_id"), F.col("pos"))
    hot = (
        occ.groupBy("g")
        .agg(F.count("*").alias("cnt"), F.min(okey).alias("fk"))
        .filter(F.col("cnt") >= max(2, int(min_count)))
        .select("g", "fk")
    )
    removed = occ.join(hot, "g").filter(okey != F.col("fk")).select("_id", "pos")
    remsets = removed.groupBy("_id").agg(F.collect_set("pos").alias("_starts"))
    covered = F.array_distinct(
        F.flatten(F.transform(F.col("_starts"), lambda p: F.sequence(p, p + n - 1)))
    )
    # Surviving positions via a LINEAR gap walk, not per-token membership:
    # filter(tokens, p -> array_contains(_cov, p)) is O(n_tokens x n_cov)
    # in one row — a highly self-repetitive doc (one token repeated 10^6
    # times) turns that into 10^12 comparisons on a single executor
    # thread.  Instead sort the covered set once and emit the KEPT
    # positions as the gaps between consecutive covered positions
    # (bounded by sentinels 0 and n+1): O(cov log cov + n) per doc, and
    # every intermediate array is <= n+2 elements.
    #
    # The sorted bounds array is materialized as its OWN column and the
    # consecutive pairs come from zip_with over two slice()s — both
    # evaluated once per row as lambda ARGUMENTS.  (A first cut did
    # element_at(<bounds expression>, j) inside the transform lambda;
    # Catalyst re-evaluates a lambda-body subtree per element, so the
    # concat+sort re-ran n times — measured 147 s on a 40k-token
    # self-repetitive doc vs <10 s for this shape.)
    cov_sorted = F.sort_array(F.coalesce(F.col("_cov"), F.array().cast("array<bigint>")))
    n_toks = F.size("_t")
    bounds = F.concat(
        F.array(F.lit(0).cast("bigint")),
        cov_sorted,
        F.array((n_toks + 1).cast("bigint")),
    )
    gaps = F.filter(
        F.zip_with(
            F.slice(F.col("_bounds"), 1, F.size("_bounds") - 1),
            F.slice(F.col("_bounds"), 2, F.size("_bounds") - 1),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        ),
        lambda g: g["b"] - g["a"] >= 2,  # sequence() would count DOWN on empty gaps
    )
    kept_pos = F.flatten(
        F.transform(gaps, lambda g: F.sequence(g["a"] + 1, g["b"] - 1))
    )
    return (
        toks.join(remsets, "_id", "left")
        .withColumn("_cov", covered)
        .withColumn("_bounds", bounds)
        .withColumn("_kept", kept_pos)
        .select(
            F.col("_id").alias(id_col),
            F.size("_t").cast("long").alias("n_tokens"),
            (F.size("_t") - F.size("_kept")).cast("long").alias("n_removed"),
            F.array_join(
                F.transform("_kept", lambda p: F.element_at(F.col("_t"), p.cast("int"))),
                " ",
            ).alias("cleaned_text"),
        )
    )


def cross_source_overlap(
    df: "DataFrame",
    n: int = 8,
    source_col: str = "source",
    text_col: str = "text",
) -> "DataFrame":
    """Pairwise source-contamination matrix: for every pair of sources,
    how many DISTINCT word n-gram shingles they share — the triage view
    run before mixing crawls into one training corpus (a hot pair means
    mirrored content; contamination_check then names the documents).

    Output: (source_a, source_b, shared), source_a < source_b.

    Shape at 100 TB — no shingle self-join: distinct (source, shingle)
    pairs aggregate to a sorted source-set per shingle (set size bounded
    by the SOURCE count, not the corpus), and the pairs expand IN-ROW
    from that set — a shingle shared by s sources emits C(s,2) pair rows
    with s <= #sources, where the naive self-join would emit the same
    rows from a corpus-sized probe side.  Short docs (< n tokens)
    contribute their whole text as one shingle (doc_shingles contract,
    same as contamination_check)."""
    from pyspark.sql import functions as F

    src_shingles = (
        doc_shingles(
            df.filter(F.col(text_col).isNotNull()), n, text_col, source_col
        )
        .select(F.col("_id").alias("_src"), "shingle")
        .distinct()
        .groupBy("shingle")
        .agg(F.sort_array(F.collect_set("_src")).alias("_ss"))
        .filter(F.size("_ss") >= 2)
    )
    # In-row pair expansion over the ATTRIBUTE column _ss (O(1)
    # element_at per pair — not an embedded expression tree, see
    # remove_repeated_spans' lambda re-evaluation note).
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size("_ss") - 1),
            lambda i: F.transform(
                F.sequence(i + 1, F.size("_ss")),
                lambda j: F.struct(
                    F.element_at(F.col("_ss"), i.cast("int")).alias("a"),
                    F.element_at(F.col("_ss"), j.cast("int")).alias("b"),
                ),
            ),
        )
    )
    return (
        src_shingles.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("source_a"), F.col("p.b").alias("source_b"))
        .agg(F.count("*").alias("shared"))
    )
