"""LLM-pipeline operators: text analysis, dedup family, similarity, multimodal.

Where the operator is deterministic & SQL-expressible, we cross-check
against DuckDB here — the same comparison the driver's oracle runs.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from hyperspace_spark.llm import dedup, multimodal, similarity, text

from tests.conftest import SF_DIR, table


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def duck(sql):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.execute(sql).fetchall()


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------
def test_token_count_matches_duckdb(spark, docs):
    got = {
        r.doc_id: r.n_tokens
        for r in docs.select("doc_id", text.token_count(F.col("text")).alias("n_tokens")).collect()
    }
    want = dict(
        duck(
            "SELECT doc_id, CASE WHEN trim(text)='' THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END FROM documents"
        )
    )
    assert got == want


def test_fingerprint_matches_duckdb(spark, docs):
    got = {
        r.doc_id: r.fp
        for r in docs.select("doc_id", text.fingerprint(F.col("text")).alias("fp")).collect()
    }
    want = dict(
        duck(
            "SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) FROM documents"
        )
    )
    assert got == want


def test_text_stats_shape_and_determinism(spark, docs):
    s1 = text.text_stats(docs).orderBy("doc_id").collect()
    s2 = text.text_stats(docs).orderBy("doc_id").collect()
    assert s1 == s2
    assert len(s1) == docs.count()
    r = s1[0]
    assert r.n_tokens > 0 and 0 <= r.quality_score <= 1 and r.lang_pred in ("en", "es", "fr", "de", "und")


def test_language_id_english_bias(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat and the dog"), (2, "el gato es un animal y la casa es una")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.lang for r in df.select("doc_id", text.language_id(F.col("text")).alias("lang")).collect()}
    assert rows[1] == "en"
    assert rows[2] == "es"


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------
def test_exact_dedup_removes_dupes(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a  B c"), (3, "different text")], "doc_id long, text string"
    )
    out = dedup.exact_dedup(df).orderBy("doc_id").collect()
    assert [r.doc_id for r in out] == [1, 3]  # 2 is a normalized dup of 1


def test_incremental_dedup_against_ledger(spark):
    corpus = spark.createDataFrame(
        [(1, "seen before"), (2, "also seen")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "brand new"),
            (11, "seen  BEFORE"),   # normalized re-crawl of corpus doc 1 -> drop
            (12, "brand NEW"),      # within-batch dup of 10 -> drop (higher id)
            (13, None),             # NULL text -> always kept
        ],
        "doc_id long, text string",
    )
    ledger = dedup.corpus_fingerprints(corpus)
    assert ledger.columns == ["_fp"] and ledger.count() == 2
    out = dedup.incremental_dedup(batch, ledger).orderBy("doc_id").collect()
    assert [r.doc_id for r in out] == [10, 13]
    # Batch schema passes through untouched.
    assert [r.text for r in out] == ["brand new", None]


def test_fingerprint_ledger_bucketed_lifecycle(spark, tmp_path_factory):
    """Persisted ledger: bucketed write -> anti join with NO Exchange on
    the ledger side -> per-bucket append -> re-run rejects yesterday's
    accepted docs."""
    import re

    from pyspark.sql import functions as F

    from hyperspace_spark.llm.text import fingerprint

    path = str(tmp_path_factory.mktemp("fp_ledger")) + "/ledger"
    corpus = spark.createDataFrame(
        [(i, f"doc body number {i}") for i in range(50)], "doc_id long, text string"
    )
    dedup.write_fingerprint_ledger(spark, dedup.corpus_fingerprints(corpus), path, 4)
    led = dedup.read_fingerprint_ledger(spark, path, 4)
    assert led.count() == 50
    batch = corpus.limit(10).select((F.col("doc_id") + 500).alias("doc_id"), "text").unionByName(
        spark.createDataFrame([(999, "unseen body")], "doc_id long, text string")
    )
    out = dedup.incremental_dedup(batch, led)
    assert sorted(r.doc_id for r in out.collect()) == [999]
    # Ledger side rides its bucketing: the executed anti join carries at
    # most ONE hash Exchange (the batch side).
    keyed = dedup.exact_dedup(batch).withColumn("_fp", fingerprint(F.col("text")))
    j = keyed.join(led, "_fp", "left_anti")
    j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 1, plan
    dedup.append_fingerprint_ledger(spark, out, path, 4)
    assert dedup.incremental_dedup(batch, dedup.read_fingerprint_ledger(spark, path, 4)).count() == 0


def test_fingerprint_ledger_compaction(spark, tmp_path_factory):
    """Compaction collapses per-batch small files and duplicate hashes
    into num_buckets files with identical anti-join behavior."""
    import glob

    path = str(tmp_path_factory.mktemp("fp_compact")) + "/ledger"
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(20)], "doc_id long, text string"
    )
    dedup.write_fingerprint_ledger(spark, dedup.corpus_fingerprints(docs), path, 4)
    # Three appends (one duplicates existing fps - the at-least-once shape).
    for lo in (20, 30, 20):
        batch = spark.createDataFrame(
            [(i, f"text {i}") for i in range(lo, lo + 10)], "doc_id long, text string"
        )
        dedup.append_fingerprint_ledger(spark, batch, path, 4)
    files_before = len(glob.glob(f"{path}/*.parquet"))
    n = dedup.compact_fingerprint_ledger(spark, path, 4)
    assert n == 40  # 0..39 distinct, duplicate append collapsed
    files_after = len(glob.glob(f"{path}/*.parquet"))
    assert files_after < files_before and files_after <= 4
    led = dedup.read_fingerprint_ledger(spark, path, 4)
    assert led.count() == 40
    probe = spark.createDataFrame(
        [(1, "text 5"), (2, "text 99")], "doc_id long, text string"
    )
    out = dedup.incremental_dedup(probe, led)
    assert [r.doc_id for r in out.collect()] == [2]


def test_incremental_dedup_empty_ledger_keeps_batch(spark):
    batch = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    ledger = dedup.corpus_fingerprints(
        spark.createDataFrame([], "doc_id long, text string")
    )
    out = dedup.incremental_dedup(batch, ledger)
    assert sorted(r.doc_id for r in out.collect()) == [1, 2]
    # A raw corpus passed as the ledger is a hard error, not a silent
    # keep-everything.
    import pytest as _pytest

    with _pytest.raises(ValueError, match="_fp"):
        dedup.incremental_dedup(batch, batch)


def test_compact_empty_ledger_is_noop(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fp_empty")) + "/ledger"
    import os

    os.makedirs(path, exist_ok=True)
    assert dedup.compact_fingerprint_ledger(spark, path, 4) == 0


def test_remove_repeated_spans_first_occurrence_survives(spark):
    span = "s1 s2 s3 s4 s5 s6 s7 s8"
    df = spark.createDataFrame(
        [
            (1, f"intro {span} outro"),          # first occurrence: kept whole
            (2, f"other words here {span}"),     # repeat: span removed
            (3, "too short"),                    # < n tokens: untouched
            (4, span),                           # repeat: fully removed
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.remove_repeated_spans(df, n=8).collect()}
    assert out[1].n_removed == 0 and out[1].cleaned_text == f"intro {span} outro"
    assert out[2].n_removed == 8 and out[2].cleaned_text == "other words here"
    assert out[3].n_removed == 0 and out[3].cleaned_text == "too short"
    assert out[4].n_removed == 8 and out[4].cleaned_text == ""
    assert out[4].n_tokens == 8


def test_remove_repeated_spans_min_count(spark):
    """min_count raises the duplication bar: a span occurring twice
    survives min_count=3; three occurrences do not."""
    span = "m1 m2 m3 m4 m5 m6 m7 m8"
    df = spark.createDataFrame(
        [(1, span), (2, f"pad {span}"), (3, f"pad pad {span}")],
        "doc_id long, text string",
    )
    # doc3 also shares the overlapping "pad m1..m7" gram with doc2 (whose
    # occurrence is globally first), so doc3 loses 9 tokens, not 8.
    out2 = {r.doc_id: r.n_removed for r in dedup.remove_repeated_spans(df, n=8).collect()}
    assert out2 == {1: 0, 2: 8, 3: 9}
    df2 = df.filter("doc_id < 3")
    out3 = {r.doc_id: r.n_removed for r in dedup.remove_repeated_spans(df2, n=8, min_count=3).collect()}
    assert out3 == {1: 0, 2: 0}


def test_remove_repeated_spans_string_ids(spark):
    """Regression (r8 review): string doc ids must dedup too — the old
    arithmetic occurrence key NULLed out on non-numeric ids and silently
    removed nothing."""
    span = "s1 s2 s3 s4 s5 s6 s7 s8"
    df = spark.createDataFrame(
        [("doc-a", span), ("doc-b", f"x {span}")], "doc_id string, text string"
    )
    out = {r.doc_id: r for r in dedup.remove_repeated_spans(df, n=8).collect()}
    assert out["doc-a"].n_removed == 0          # lexicographic first
    assert out["doc-b"].n_removed == 8 and out["doc-b"].cleaned_text == "x"


def test_ledger_bucket_count_from_sidecar(spark, tmp_path_factory):
    """Regression (r8 review): a reader supplying the wrong num_buckets
    must not silently mis-bucket the anti join — the sidecar written at
    create time wins."""
    path = str(tmp_path_factory.mktemp("fp_meta")) + "/ledger"
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )
    dedup.write_fingerprint_ledger(spark, dedup.corpus_fingerprints(docs), path, 8)
    # Reader lies about the bucket count: the registered table must still
    # say 8 (matches tell dedup works end-to-end).
    led = dedup.read_fingerprint_ledger(spark, path, num_buckets=2)
    batch = docs.limit(5).selectExpr("doc_id + 100 AS doc_id", "text")
    assert dedup.incremental_dedup(batch, led).count() == 0
    # Appends with a wrong hint also land under the true bucket spec.
    newdocs = spark.createDataFrame([(900, "fresh doc")], "doc_id long, text string")
    dedup.append_fingerprint_ledger(spark, newdocs, path, num_buckets=3)
    led2 = dedup.read_fingerprint_ledger(spark, path, num_buckets=5)
    assert dedup.incremental_dedup(newdocs, led2).count() == 0
    # Remote URI: compaction fails fast instead of silently no-op'ing.
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        dedup.compact_fingerprint_ledger(spark, "s3://bucket/ledger", 4)
    # Malformed sidecar falls back to the default instead of crashing.
    import json as _json

    with open(dedup._ledger_meta_path(path), "w") as f:
        _json.dump({"num_buckets": None}, f)
    assert dedup._ledger_buckets(path, 8) == 8


def test_append_created_ledger_pins_bucket_count(spark, tmp_path_factory):
    """Regression (r8 review): a ledger whose FIRST write is an append
    (the streaming sink's fresh-dir start) must still pin num_buckets in
    the sidecar, or a later session with a different default would
    register a mismatched bucket spec and miss matches."""
    import os

    path = str(tmp_path_factory.mktemp("fp_appendfirst")) + "/ledger"
    os.makedirs(path, exist_ok=True)
    docs = spark.createDataFrame(
        [(i, f"seed {i}") for i in range(20)], "doc_id long, text string"
    )
    dedup.append_fingerprint_ledger(spark, docs, path, num_buckets=4)
    assert dedup._ledger_buckets(path, 64) == 4
    # A reader using the (different) default still matches everything.
    led = dedup.read_fingerprint_ledger(spark, path)  # default 64 ignored
    probe = docs.selectExpr("doc_id + 100 AS doc_id", "text")
    assert dedup.incremental_dedup(probe, led).count() == 0


def test_stale_catalog_bucket_spec_revalidated(spark, tmp_path_factory):
    """Regression (r8 advice): a table registered EARLIER in the session
    with the fallback bucket count (a read against a then-empty dir) used
    to wedge every later append with a bucket-spec mismatch until the
    table was manually dropped.  read_fingerprint_ledger now compares the
    catalog entry's bucket count to the sidecar and re-registers on
    mismatch."""
    import os

    path = str(tmp_path_factory.mktemp("fp_stale")) + "/ledger"
    os.makedirs(path, exist_ok=True)
    # 1) Read against the empty dir: registers the table at the 64 default.
    dedup.read_fingerprint_ledger(spark, path)
    assert dedup._registered_bucket_count(spark, dedup._ledger_table_name(path)) == 64
    # 2) First real write uses 4 buckets — must not hit a catalog
    #    bucket-spec mismatch, and must end registered at 4.
    docs = spark.createDataFrame(
        [(i, f"stale {i}") for i in range(12)], "doc_id long, text string"
    )
    dedup.append_fingerprint_ledger(spark, docs, path, num_buckets=4)
    assert dedup._registered_bucket_count(spark, dedup._ledger_table_name(path)) == 4
    led = dedup.read_fingerprint_ledger(spark, path)
    probe = docs.selectExpr("doc_id + 50 AS doc_id", "text")
    assert dedup.incremental_dedup(probe, led).count() == 0


def test_remove_repeated_spans_overlapping_spans_union(spark):
    # 9 tokens shared -> two overlapping duplicated 8-grams in the repeat;
    # covered positions union to all 9, not 16.
    nine = "a1 a2 a3 a4 a5 a6 a7 a8 a9"
    df = spark.createDataFrame(
        [(1, nine), (2, f"x {nine} y")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in dedup.remove_repeated_spans(df, n=8).collect()}
    assert out[1].n_removed == 0
    assert out[2].n_removed == 9 and out[2].cleaned_text == "x y"


def test_ngram_jaccard_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5 w6"), (2, "w1 w2 w3 w4 w5 w6"), (3, "x1 x2 x3 x4 x5 x6")],
        "doc_id long, text string",
    )
    pairs = dedup.ngram_jaccard_pairs(df, n=2, threshold=0.9).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]
    assert pairs[0].jaccard == 1.0


def test_ngram_jaccard_against_duckdb(spark, docs):
    got = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    )
    want = sorted(
        duck(
            """
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t FROM documents
            ), sh AS (
              SELECT DISTINCT doc_id,
                CASE WHEN len(t) < 3 THEN array_to_string(t, ' ')
                     ELSE array_to_string(t[i:i+2], ' ') END AS shingle
              FROM (SELECT doc_id, t, unnest(range(1, greatest(len(t)-1, 2))) AS i FROM toks)
            ), sizes AS (
              SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b, round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
            FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
            WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= 0.5
            """
        )
    )
    assert got == want


def test_minhash_lsh_finds_identical_docs(spark):
    rows = [(i, f"tok{i} " * 3 + "common words here every doc shares nothing") for i in range(20)]
    rows += [(100, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
             (101, "alpha beta gamma delta epsilon zeta eta theta iota kappa")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.minhash_lsh_pairs(df, n=2, num_hashes=32, bands=8).collect()
    assert (100, 101) in {(p.id_a, p.id_b) for p in pairs}


def test_minhash_hot_bucket_cap_bounds_candidates(spark):
    """r7: a clique of 1,000 identical documents must NOT explode into
    ~500k candidate pairs — with max_bucket_size set, the hot bucket
    emits a star to the bucket min (k-1 candidates), the duplicate
    cluster stays connected, verified edges all pass at jaccard 1.0, and
    pairs from ordinary-sized buckets are unchanged."""
    k = 1000
    clique_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, clique_text) for i in range(k)]
    # an ordinary near-dup pair far from the clique ids
    rows += [(5000, "one two three four five six seven eight"),
             (5001, "one two three four five six seven eight")]
    # and unique background docs
    rows += [(6000 + i, f"unique{i} filler{i} words{i} nothing shared {i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = dedup.minhash_lsh_pairs(
        df, n=2, num_hashes=32, bands=8, verify_threshold=0.8, max_bucket_size=16
    ).collect()
    got = {(p.id_a, p.id_b) for p in capped}
    # clique: exactly the star edges (0, x) — bounded at k-1, not k(k-1)/2
    clique_edges = {(a, b) for a, b in got if b < k}
    assert clique_edges == {(0, i) for i in range(1, k)}
    assert all(p.jaccard == 1.0 for p in capped if p.id_b < k)
    # the ordinary pair (small bucket) is still found, all-pairs path
    assert (5000, 5001) in got
    # star connectivity: one connected component over the clique
    pairs_df = spark.createDataFrame(
        [(a, b) for a, b in got if b < k], "id_a long, id_b long"
    )
    comps = dedup.connected_components(pairs_df)
    assert comps.select("cluster").distinct().count() == 1
    assert comps.count() == k

    # cap must reject degenerate sizes
    with pytest.raises(ValueError):
        dedup.minhash_lsh_pairs(df, max_bucket_size=1)


def test_minhash_recall_vs_exact(spark, docs):
    """LSH candidates must include every truly-similar pair (recall ~1 at
    jaccard >= 0.7 with 64 hashes / 16 bands)."""
    exact = {(r.id_a, r.id_b) for r in dedup.ngram_jaccard_pairs(docs, 3, 0.7).collect()}
    cand = {(r.id_a, r.id_b) for r in dedup.minhash_lsh_pairs(docs, 3, 64, 16).collect()}
    assert exact.issubset(cand)


def test_simhash_identical_and_pairs(spark):
    df = spark.createDataFrame(
        [(1, "one two three four five six seven"), (2, "one two three four five six seven"),
         (3, "totally different content words here")],
        "doc_id long, text string",
    )
    sigs = {r.doc_id: r.simhash for r in dedup.simhash(df).collect()}
    assert sigs[1] == sigs[2] != sigs[3]
    pairs = dedup.simhash_pairs(df, max_hamming=3).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {(1, 2)}


def test_embedding_near_dup(spark, emb):
    pairs = dedup.embedding_near_dup_pairs(emb, threshold=0.95).collect()
    for p in pairs:
        assert p.cosine >= 0.95
    # symmetric sanity: cosine(a,a)=1 if we include self-pairs -> excluded by a<b
    assert all(p.id_a < p.id_b for p in pairs)


def test_embedding_near_dup_size_guard(spark, emb):
    """r7: exact all-pairs refuses file-backed inputs above
    max_exact_bytes unless force=True — protects a 100 TB user from an
    accidental O(N²) job; the error points at the sub-quadratic paths."""
    for method in ("blocked", "sql", "blas_smallcorpus"):
        with pytest.raises(ValueError, match="lsh_bucketed_pairs"):
            dedup.embedding_near_dup_pairs(emb, method=method, max_exact_bytes=1)
    # force=True runs; default threshold (1 GiB) passes sf-test data
    forced = dedup.embedding_near_dup_pairs(emb, threshold=0.95, max_exact_bytes=1, force=True)
    normal = dedup.embedding_near_dup_pairs(emb, threshold=0.95)
    assert sorted(map(tuple, forced.collect())) == sorted(map(tuple, normal.collect()))
    # in-memory frames have no file list: guard passes them unchecked
    tiny = spark.createDataFrame([(1, [1.0, 0.0]), (2, [1.0, 0.0])], "vec_id long, embedding array<double>")
    got = dedup.embedding_near_dup_pairs(tiny, threshold=0.9, max_exact_bytes=1).collect()
    assert {(p.id_a, p.id_b) for p in got} == {(1, 2)}


def test_embedding_near_dup_guard_fails_closed_when_unsized(spark, emb, monkeypatch):
    """r7 review fix: a file-backed input whose paths cannot be sized
    (e.g. remote storage with no reachable FS) must REFUSE, not silently
    launch the O(N²) job."""
    import os

    def boom(_):
        raise OSError("no such filesystem")

    monkeypatch.setattr(os.path, "getsize", boom)
    with pytest.raises(ValueError, match="could not be determined"):
        dedup.embedding_near_dup_pairs(emb)
    # force=True still overrides
    dedup.embedding_near_dup_pairs(emb, force=True)


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------
def test_cosine_topk_against_duckdb(spark, emb):
    got = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in similarity.cosine_topk(emb, [0, 1, 2], k=5).collect()
    )
    want = sorted(
        duck(
            """
            WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
            q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id IN (0,1,2)),
            scored AS (
              SELECT qid, vec_id AS nid,
                     round(list_dot_product(qe, e) / (sqrt(list_dot_product(qe,qe)) * sqrt(list_dot_product(e,e))), 6) AS cosine
              FROM v CROSS JOIN q WHERE vec_id != qid
            )
            SELECT qid, rank, nid FROM (
              SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rank
              FROM scored
            ) WHERE rank <= 5
            """
        )
    )
    assert got == want


def test_lsh_bucketed_pairs_subset_of_exact(spark, emb):
    """Driver-contract settings (threshold 0.4, 4 bits × 8 bands): result
    must be NON-EMPTY (a 0-row run verifies nothing — r1 failure), a
    subset of the exact pairs, and recall ≥ 0.6 (expected ≈0.75)."""
    lsh = {
        (r.id_a, r.id_b)
        for r in similarity.lsh_bucketed_pairs(emb, threshold=0.4, nbits=4, bands=8).collect()
    }
    exact = {(r.id_a, r.id_b) for r in dedup.embedding_near_dup_pairs(emb, 0.4).collect()}
    assert exact, "fixture embeddings must contain pairs above the threshold"
    assert lsh, "LSH returned no pairs — vacuous result"
    assert lsh.issubset(exact)
    assert len(lsh) / len(exact) >= 0.6


def test_lsh_hot_bucket_cap_drops_degenerate_buckets(spark):
    """max_bucket caps the quadratic self-join: constant vectors all land
    in one bucket; with the cap below that bucket's size no pair survives,
    while distinctive pairs elsewhere are unaffected."""
    from pyspark.sql import functions as F

    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(50)]  # one hot bucket
    rows += [(100, [0.0, 1.0, 0.5, 0.0]), (101, [0.0, 1.0, 0.5, 0.001])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    capped = similarity.lsh_bucketed_pairs(
        df, threshold=0.9, nbits=2, bands=4, max_bucket=10
    ).collect()
    got = {(r.id_a, r.id_b) for r in capped}
    assert (100, 101) in got, "pair outside the hot bucket must survive"
    assert all(a >= 100 for a, _ in got), "hot-bucket pairs must be dropped"


def test_similarity_kernels_bit_identical_to_hof_forms(spark, emb):
    """r14: the Arrow-batched kernels (cosine_kernel / dot_kernel /
    band_sigs_kernel) must reproduce the interpreted HOF expressions
    BIT-FOR-BIT — they are an execution-strategy change only (sequential
    per-index fp accumulation preserved), and the LSH/ANN oracles hash
    exact values.  Compares raw doubles (no rounding) and signatures on
    the fixture corpus plus NULL / length-mismatch / zero-vector edges."""
    import struct

    from pyspark.sql import functions as F

    from hyperspace_spark.llm import similarity as sim

    edge = spark.createDataFrame(
        [
            (10_001, None),
            (10_002, [1.0, 2.0]),  # wrong dim for the 64-dim planes
            (10_003, [0.0] * 64),  # zero norm: guarded division
        ],
        "vec_id long, embedding array<double>",
    )
    v = (
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .unionByName(edge)
        .select(
            "vec_id",
            F.col("embedding").alias("a"),
            F.reverse(F.col("embedding")).alias("b"),
        )
        # ADVICE r14: reverse(a) always matches a's length, so the
        # kernels' length-mismatch branch (zip_with null-padding -> NULL)
        # was never compared against the HOF forms — pair a 64-dim a with
        # a 2-dim b; both forms must yield NULL.
        .unionByName(
            spark.createDataFrame(
                [(10_004, [1.0] * 64, [1.0, 2.0])],
                "vec_id long, a array<double>, b array<double>",
            )
        )
    )
    both = v.select(
        "vec_id",
        sim.cosine_expr(F.col("a"), F.col("b")).alias("cos_hof"),
        sim.cosine_kernel()(F.col("a"), F.col("b")).alias("cos_k"),
        sim.dot_expr(F.col("a"), F.col("b")).alias("dot_hof"),
        sim.dot_kernel()(F.col("a"), F.col("b")).alias("dot_k"),
        F.array(
            *[
                sim.lsh_bucket_col(F.col("a"), 64, 4, seed=f"hs-lsh-band{b}")
                for b in range(8)
            ]
        ).alias("sig_hof"),
        sim.band_sigs_kernel(64, 4, 8)(F.col("a")).alias("sig_k"),
    ).collect()

    def bits(x):
        return None if x is None else struct.pack("<d", x)

    assert len(both) == emb.count() + 4
    for r in both:
        assert bits(r.cos_hof) == bits(r.cos_k), r.vec_id
        assert bits(r.dot_hof) == bits(r.dot_k), r.vec_id
        assert list(r.sig_hof) == list(r.sig_k), r.vec_id
    mism = next(r for r in both if r.vec_id == 10_004)
    assert mism.cos_hof is None and mism.cos_k is None
    assert mism.dot_hof is None and mism.dot_k is None


def test_ivf_topk_mostly_agrees_with_brute(spark, emb):
    brute = similarity.cosine_topk(emb, [0, 1], k=5).collect()
    ivf = similarity.ivf_topk(emb, [0, 1], k=5, n_clusters=8, n_probe=3).collect()
    b = {(r.query_id, r.neighbor_id) for r in brute}
    i = {(r.query_id, r.neighbor_id) for r in ivf}
    assert len(b & i) / len(b) >= 0.5  # probe recall


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------
def test_multimodal_decode_and_frames(spark):
    media = multimodal.synthetic_media_df(spark, n=30)
    feats = multimodal.decode_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r.features) == multimodal.FEATURE_DIM
        assert abs(sum(x * x for x in r.features) - 1.0) < 1e-5  # unit norm
    frames = multimodal.sample_frames(media).collect()
    assert frames and all(r.frame_index >= 0 for r in frames)
    vids = {r.media_id for r in media.filter("kind = 'video'").collect()}
    assert {r.media_id for r in frames} <= vids


def test_multimodal_resize_images(spark):
    media = multimodal.synthetic_media_df(spark, n=30)
    out = multimodal.resize_images(media, width=64, height=64).collect()
    assert len(out) == 30  # one row per input, all kinds
    target = max(16, 64 * 64 // 64)
    by_id = {r.media_id: r for r in out}
    for r in media.collect():
        o = by_id[r.media_id]
        assert o.kind == r.kind
        if r.kind == "image":
            assert (o.width, o.height) == (64, 64)
            assert len(o.data) == target  # fixed thumbnail byte length
            assert o.meta.width == 64 and o.meta.height == 64
        else:
            assert bytes(o.data) == bytes(r.data)  # pass-through untouched
            assert o.width == (r.meta.width if r.meta else None)
    # deterministic: same input -> same thumbnail bytes
    again = {r.media_id: bytes(r.data) for r in multimodal.resize_images(media, 64, 64).collect()}
    assert {r.media_id: bytes(r.data) for r in out} == again


def test_codec_roundtrips():
    """Pure-numpy BMP/PPM/WAV codecs (r10): encode -> decode is exact,
    including BMP row padding (w=7 -> 21-byte rows padded to 24),
    bottom-up row order, BGR<->RGB swap, PPM comment headers, and WAV
    chunk walking."""
    import numpy as np

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    assert (multimodal.decode_bmp(multimodal.encode_bmp(px)) == px).all()
    assert (multimodal.decode_ppm(multimodal.encode_ppm(px)) == px).all()
    commented = b"P6\n# c\n7 5\n255\n" + px.tobytes()
    assert (multimodal.decode_ppm(commented) == px).all()
    # PNG: every scanline filter (None/Sub/Up/Average/Paeth) and every
    # supported color type round-trips exactly through stdlib zlib
    for shape in ((5, 7, 3), (4, 4, 1), (6, 3, 4), (3, 9, 2)):
        pxs = rng.integers(0, 256, shape, dtype=np.uint8)
        for ft in range(5):
            dec = multimodal.decode_png(multimodal.encode_png(pxs, filter_type=ft))
            assert dec.shape == shape and (dec == pxs).all(), (shape, ft)
    with pytest.raises(NotImplementedError):  # 16-bit depth refused loudly
        import struct, zlib

        multimodal.decode_png(
            multimodal._PNG_SIG
            + struct.pack(">I", 13)
            + b"IHDR"
            + struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
            + struct.pack(">I", 0)
        )
    s = rng.integers(-32768, 32767, 64).astype(np.int16)
    dec, rate = multimodal.decode_wav(multimodal.encode_wav(s, 22050))
    assert rate == 22050 and (dec[:, 0] == s).all()
    # WAV with an extra chunk between fmt and data still parses
    wav = multimodal.encode_wav(s, 8000)
    padded = wav[:36] + b"LIST\x04\x00\x00\x00INFO" + wav[36:]
    import struct

    padded = padded[:4] + struct.pack("<I", len(padded) - 8) + padded[8:]
    dec2, rate2 = multimodal.decode_wav(padded)
    assert rate2 == 8000 and (dec2[:, 0] == s).all()
    with pytest.raises(NotImplementedError):  # video: genuinely codec-bound
        multimodal.real_media_stats(b"\x00\x00\x00\x18ftyp", "mp4")
    with pytest.raises(ValueError):  # supported format, corrupt stream
        multimodal.real_media_stats(b"\x89PNG\r\n", "png")
    # baseline JPEG (llm/jpeg.py): lossy roundtrip within tight bounds,
    # both subsamplings, restart intervals, odd dims
    from hyperspace_spark.llm import jpeg as _jpeg

    yy, xx = np.mgrid[0:41, 0:53]
    grad = np.stack(
        [(xx * 255 / 53), (yy * 255 / 41), ((xx + yy) * 255 / 94)], axis=2
    ).astype(np.uint8)
    for sub in ("4:4:4", "4:2:0"):
        for dri in (0, 5):
            dec = _jpeg.decode_jpeg(
                _jpeg.encode_jpeg(grad, 90, sub, restart_interval=dri)
            )
            assert dec.shape == grad.shape
            err = np.abs(dec.astype(float) - grad.astype(float)).mean()
            assert err < 3, (sub, dri, err)
    flat = np.full((16, 24, 3), 123, dtype=np.uint8)
    dec = _jpeg.decode_jpeg(_jpeg.encode_jpeg(flat, 90))
    assert np.abs(dec.astype(float) - flat).max() <= 2
    st = multimodal.real_media_stats(_jpeg.encode_jpeg(flat, 90), "jpeg")
    assert (st["width"], st["height"]) == (24, 16)
    with pytest.raises(NotImplementedError):  # progressive refused loudly
        bad = _jpeg.encode_jpeg(flat, 90).replace(b"\xff\xc0", b"\xff\xc2", 1)
        _jpeg.decode_jpeg(bad)


def test_multimodal_real_decode(spark):
    """decode='real' decodes BMP/PPM/WAV via the pure-numpy codecs —
    dims come from the DECODED headers, features are per-channel means —
    and still refuses codec-bound formats (png/mp4) with a clear error."""
    import numpy as np

    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    s = (np.arange(32) * 100 - 1600).astype(np.int16)
    rows = [
        (0, "image", bytearray(multimodal.encode_bmp(px)),
         {"width": None, "height": None, "sample_rate": None, "duration_ms": None, "format": "bmp"}),
        (1, "image", bytearray(multimodal.encode_ppm(px)),
         {"width": None, "height": None, "sample_rate": None, "duration_ms": None, "format": "ppm"}),
        (2, "audio", bytearray(multimodal.encode_wav(s, 16000)),
         {"width": None, "height": None, "sample_rate": None, "duration_ms": None, "format": "wav"}),
        (3, "image", bytearray(multimodal.encode_png(px, filter_type=4)),
         {"width": None, "height": None, "sample_rate": None, "duration_ms": None, "format": "png"}),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r.media_id: r for r in multimodal.decode_features(media, decode="real").collect()}
    for mid in (0, 1, 3):
        assert (got[mid].width, got[mid].height) == (4, 4)
        expect = px.reshape(-1, 3).mean(axis=0)
        assert np.allclose(got[mid].features, expect)
    assert got[2].width is None
    assert np.allclose(got[2].features, [float(s.mean())])
    # codec-bound format (video): loud failure, not silent garbage
    vid = multimodal.synthetic_media_df(spark, n=3).filter("meta.format = 'mp4'")
    with pytest.raises(Exception, match="NotImplementedError|real decoding"):
        multimodal.decode_features(vid, decode="real").collect()


def test_blocked_embedding_kernel_matches_sql(spark, emb):
    """The distributed block-pair kernel (no driver collect) is exact:
    identical pairs and cosines to the portable SQL implementation."""
    blocked = {
        (r.id_a, r.id_b, r.cosine)
        for r in dedup.embedding_near_dup_pairs(emb, 0.4, method="blocked").collect()
    }
    sql = {
        (r.id_a, r.id_b, r.cosine)
        for r in dedup.embedding_near_dup_pairs(emb, 0.4, method="sql").collect()
    }
    assert blocked and blocked == sql


def test_blocked_embedding_kernel_matches_blas(spark, emb):
    blocked = {
        (r.id_a, r.id_b, r.cosine)
        for r in dedup.embedding_near_dup_pairs(emb, 0.35, method="blocked").collect()
    }
    blas = {
        (r.id_a, r.id_b, r.cosine)
        for r in dedup.embedding_near_dup_pairs(emb, 0.35, method="blas_smallcorpus").collect()
    }
    assert blocked and blocked == blas


def test_hot_shingle_cap_output_identical_at_half(spark):
    """A boilerplate line shared by EVERY doc: the cap drops its shingles,
    yet the threshold-0.5 output is identical to the uncapped run — near
    dups stay near, unrelated docs that share only boilerplate stay out."""
    import random

    rng = random.Random(7)
    words = [f"w{i}" for i in range(500)]
    boiler = "subscribe to our newsletter for updates today"
    docs = []
    for d in range(40):
        body = " ".join(rng.choice(words) for _ in range(60))
        docs.append((2 * d, f"{body} {boiler}"))
        if d < 6:  # near-dup partner: one word changed
            docs.append((2 * d + 1, f"{body} {boiler}".replace("w", "w", 1) + " extra"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    uncapped = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(df, n=3, threshold=0.5).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(df, n=3, threshold=0.5, max_shingle_df=10).collect()
    }
    assert uncapped, "fixture must produce near-dup pairs"
    assert capped == uncapped


def test_prefix_filter_identical_to_plain_join(spark, docs):
    """PPJoin prefix filtering is an EXACT optimization: output must be
    identical to the naive shingle self-join, with and without the
    hot-shingle cap."""
    for cap in (None, 6):
        plain = sorted(
            map(tuple, dedup.ngram_jaccard_pairs(docs, 3, 0.5, max_shingle_df=cap).collect())
        )
        pref = sorted(
            map(
                tuple,
                dedup.ngram_jaccard_pairs(
                    docs, 3, 0.5, max_shingle_df=cap, prefix_filter=True
                ).collect(),
            )
        )
        assert plain == pref


def test_connected_components_and_canonical(spark):
    # two components: a chain 1-2-3-4 (diameter 3) and a pair 10-11;
    # node 99 untouched by any pair.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    labels = {r.node: r.cluster for r in dedup.connected_components(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    corpus = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 4, 10, 11, 99)], ["doc_id", "text"]
    )
    kept = sorted(r.doc_id for r in dedup.keep_canonical(corpus, pairs).collect())
    assert kept == [1, 10, 99]


def test_connected_components_warns_when_unconverged(spark):
    # chain of diameter 5 with max_iter=1: labels can't propagate to the
    # far end — returning silently would hand back WRONG cluster ids.
    import warnings

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], ["id_a", "id_b"]
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        # small_cutoff=0 forces the PARALLEL pointer-jumping path (the
        # single-task union-find fast path is exact in one pass and can
        # never be unconverged).
        dedup.connected_components(pairs, max_iter=1, small_cutoff=0).collect()
    assert any("did not converge" in str(w.message) for w in caught)


def test_connected_components_paths_agree(spark):
    """The r10 single-task union-find fast path and the parallel
    pointer-jumping path must emit identical (node, cluster) labels —
    including nodes whose only edges are duplicates or self-loops."""
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(300)]
    edges += [(5, 5), (7, 7), (9, 9)]  # self-loops
    edges += edges[:20]  # duplicates
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    fast = {
        (r.node, r.cluster)
        for r in dedup.connected_components(pairs).collect()
    }
    slow = {
        (r.node, r.cluster)
        for r in dedup.connected_components(pairs, small_cutoff=0).collect()
    }
    assert fast == slow and len(fast) > 0


def test_null_text_docs_do_not_pair_or_blow_up(spark):
    # ADVICE r2: null-text docs used to share EVERY band bucket (concat_ws
    # skips nulls) -> O(N²) candidates.  They must be excluded outright.
    rows = [(i, None) for i in range(20)] + [
        (100, "the quick brown fox jumps over the lazy dog"),
        (101, "the quick brown fox jumps over the lazy dog"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    mh = dedup.minhash_lsh_pairs(df, n=3, num_hashes=16, bands=4, verify_threshold=None)
    got = {(r.id_a, r.id_b) for r in mh.collect()}
    assert got == {(100, 101)}  # no null-null candidate pairs at all
    sh_pairs = dedup.simhash_pairs(df)
    got = {(r.id_a, r.id_b) for r in sh_pairs.collect()}
    assert got == {(100, 101)}
    jac = dedup.ngram_jaccard_pairs(df, n=3, threshold=0.5)
    got = {(r.id_a, r.id_b) for r in jac.collect()}
    assert got == {(100, 101)}
    dedup.release_caches()


def test_release_caches_clears_registry(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f")], ["doc_id", "text"]
    )
    dedup.minhash_lsh_pairs(df, n=3, num_hashes=16, bands=4, verify_threshold=0.5).collect()
    assert len(dedup._ACTIVE_PERSISTS) > 0
    n = dedup.release_caches()
    assert n > 0 and dedup._ACTIVE_PERSISTS == []


def test_chunk_text_udtf_shapes(spark):
    from hyperspace_spark.llm.text import chunk_text_udtf

    spark.udtf.register("t_chunk", chunk_text_udtf(8, 2))
    spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(20))), (2, "a b"), (3, None), (4, "")],
        "doc_id long, text string",
    ).createOrReplaceTempView("t_chunk_in")
    rows = spark.sql("SELECT * FROM t_chunk(TABLE(t_chunk_in))").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 20 words, size 8 step 6 -> starts 0,6,12 (the chunk at 18 covers
    # words 18..19, fully contained in chunk@12's 12..19 -> skipped)
    assert len(by_doc[1]) == 3
    assert [r.n_words for r in sorted(by_doc[1], key=lambda r: r.chunk_idx)] == [8, 8, 8]
    # overlap: chunk i starts at i*step, so consecutive chunks share 2 words
    c = {r.chunk_idx: r.chunk.split() for r in by_doc[1]}
    assert c[0][-2:] == c[1][:2]
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_words == 2
    assert 3 not in by_doc  # null text -> no rows
    assert 4 not in by_doc  # empty text -> words==[] -> no rows


def test_ngram_incremental_equals_full(spark, docs):
    """Appending docs and refreshing the pair graph incrementally must
    reproduce the full recompute exactly (no cap: cap df counts are
    corpus-global, see the function docstring)."""
    full = docs.filter("doc_id < 300")
    old = full.filter("doc_id < 250")
    new_ids = full.filter("doc_id >= 250").select("doc_id")
    old_pairs = dedup.ngram_jaccard_pairs(old, n=3, threshold=0.5)
    got = sorted(
        map(tuple, dedup.ngram_jaccard_pairs_incremental(
            full, new_ids, old_pairs, n=3, threshold=0.5
        ).collect())
    )
    want = sorted(map(tuple, dedup.ngram_jaccard_pairs(full, n=3, threshold=0.5).collect()))
    dedup.release_caches()
    assert got == want and len(want) > 0


def test_exact_dedup_keeps_all_null_text_docs(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, None), (4, None), (5, None)],
        "doc_id long, text string",
    )
    out = sorted(r.doc_id for r in dedup.exact_dedup(df).collect())
    # dup of 1 collapses; every null-text doc survives (they are not
    # duplicates of each other)
    assert out == [1, 3, 4, 5]


def test_minhash_rejects_bad_band_split():
    import pytest as _pytest

    df = None  # never touched: validation precedes any Spark work
    with _pytest.raises(ValueError):
        dedup.minhash_lsh_pairs(df, num_hashes=64, bands=100)
    with _pytest.raises(ValueError):
        dedup.minhash_lsh_pairs(df, num_hashes=64, bands=24)


def test_lsh_bucketed_pairs_empty_corpus(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert similarity.lsh_bucketed_pairs(empty).count() == 0


def test_ann_external_query_id_collides_with_corpus_id(spark, tmp_path):
    """External query_vectors use their own id namespace: an external id
    equal to a corpus vec_id must NOT drop that corpus vector from the
    candidates (it may be the true nearest neighbor)."""
    from hyperspace_spark import Hyperspace
    from hyperspace_spark.indexes.ann import IvfIndexConfig

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    hs = Hyperspace(spark, system_path=str(tmp_path / "annx"))
    hs.create_index(emb, IvfIndexConfig("annx", n_clusters=4))
    vec0 = emb.filter("vec_id = 0").first().embedding
    # query labeled 0 IS corpus vector 0: with all clusters probed its
    # nearest neighbor must be vec_id 0 itself at cosine ~1.
    got = hs.ann_search("annx", query_vectors={0: list(vec0)}, k=1, n_probe=4).collect()
    assert got and got[0].neighbor_id == 0 and got[0].cosine > 0.999, got


def test_sequence_packing_invariants(spark):
    """Concat-and-chunk layout invariants: offsets stay inside the budget,
    within-shard placement is gapless (each doc starts where the previous
    ended), and pack_stats shows every pack except a shard's LAST exactly
    full."""
    from hyperspace_spark.llm.packing import pack_sequences, pack_stats

    docs = table(spark, "documents")
    budget = 256
    packed = pack_sequences(docs, budget_tokens=budget, shards=4)
    rows = packed.collect()
    assert len(rows) == docs.count()
    assert all(0 <= r.pack_offset < budget for r in rows)

    # gapless stream per shard, in doc_id order
    by_shard = {}
    for r in sorted(rows, key=lambda r: (r.shard, r.doc_id)):
        expected = by_shard.get(r.shard, 0)
        assert r.pack_id * budget + r.pack_offset == expected, r
        by_shard[r.shard] = expected + r.n_tokens

    # every non-last pack is exactly full; straddling tails credited
    stats = pack_stats(packed, budget).collect()
    last = {}
    for s in stats:
        last[s.shard] = max(last.get(s.shard, -1), s.pack_id)
    for s in stats:
        if s.pack_id < last[s.shard]:
            assert s.tokens_in_pack == budget, s
        else:
            assert 0 < s.tokens_in_pack <= budget, s

    # determinism: same placement on re-computation with different partitioning
    again = pack_sequences(docs.repartition(7), budget_tokens=budget, shards=4)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_sequence_packing_rejects_bad_params(spark):
    from hyperspace_spark.llm.packing import pack_sequences

    docs = table(spark, "documents")
    with pytest.raises(ValueError):
        pack_sequences(docs, budget_tokens=0)
    with pytest.raises(ValueError):
        pack_sequences(docs, shards=0)


def test_simhash_kernel_matches_expression_form(spark):
    """The Arrow numpy simhash kernel must be bit-identical to the
    Catalyst expression form it replaced (exact integer math both ways)."""
    from pyspark.sql import functions as F

    from hyperspace_spark.llm import dedup

    docs = table(spark, "documents").limit(100)
    bits = 60
    hashes = F.transform(dedup.tokens(F.col("text")), lambda t: dedup.shingle_hash_col(t))
    masks = F.lit([1 << b for b in range(bits)])

    def signs(h):
        return F.transform(masks, lambda m: F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1))

    bitcounts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(acc, signs(h), lambda a, s: a + s),
    )
    sim = None
    for b in range(bits):
        term = F.shiftleft((F.element_at(F.col("_bc"), b + 1) > 0).cast("long"), b)
        sim = term if sim is None else sim + term
    expr_form = {
        r.doc_id: r.s
        for r in docs.select(F.col("doc_id"), bitcounts.alias("_bc"))
        .select("doc_id", sim.alias("s"))
        .collect()
    }
    kernel = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    assert expr_form == kernel


def test_minhash_kernel_matches_expression_form(spark):
    """Same guarantee for the minhash permutation kernel."""
    from pyspark.sql import functions as F

    from hyperspace_spark.llm import dedup

    docs = table(spark, "documents").limit(100)
    sh = dedup.doc_shingle_arrays(docs, 3)
    hashed = sh.select(
        "_id",
        F.transform(
            F.col("sh"), lambda s: dedup.shingle_hash_col(s) % F.lit(dedup._MERSENNE)
        ).alias("_h"),
    )
    old_cols = [
        F.array_min(
            F.transform(F.col("_h"), lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(dedup._MERSENNE))
        ).alias(f"mh_{i}")
        for i, (a, b) in enumerate(dedup._perm_params(16))
    ]
    expr_form = {
        r["_id"]: tuple(r[f"mh_{i}"] for i in range(16))
        for r in hashed.select("_id", *old_cols).collect()
    }
    kernel = {
        r["doc_id"]: tuple(r[f"mh_{i}"] for i in range(16))
        for r in dedup.minhash_signatures(docs, 3, 16).collect()
    }
    assert expr_form == kernel


def test_paragraph_dedup_real_separator(spark):
    """Boilerplate paragraphs repeated across docs are removed globally
    (first occurrence wins); within-doc repeats dedup too; row count is
    preserved, fully-duplicated docs become empty strings."""
    from hyperspace_spark.llm.dedup import paragraph_dedup

    rows = [
        (1, "intro one\n\nshared footer\n\nbody A"),
        (2, "body B\n\nshared footer"),            # footer seen in doc 1
        (3, "shared footer"),                      # nothing left
        (4, "dup para\n\ndup para\n\ntail"),       # within-doc repeat
        (5, ""),                                   # empty stays empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.text for r in paragraph_dedup(df, sep="\n\n").collect()}
    assert got == {
        1: "intro one\n\nshared footer\n\nbody A",
        2: "body B",
        3: "",
        4: "dup para\n\ntail",
        5: "",
    }
    # determinism under different partitioning
    again = {r.doc_id: r.text for r in paragraph_dedup(df.repartition(5), sep="\n\n").collect()}
    assert again == got


def test_simhash_null_text_yields_null_not_zero(spark):
    """NULL-text docs must get a NULL simhash (expression-form semantics),
    not signature 0 — a shared 0 would make every NULL-text doc a mutual
    hamming-distance-0 'near duplicate' of the others.  Empty text
    tokenizes to one empty-string token and keeps its own valid non-NULL
    signature — all-empty docs ARE identical, so that's sound."""
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, ""), (4, "a real document body here")],
        "doc_id long, text string",
    )
    sigs = {r.doc_id: r.simhash for r in dedup.simhash(df).collect()}
    assert sigs[1] is None and sigs[2] is None
    assert sigs[3] is not None
    assert sigs[4] is not None and sigs[4] != 0
    # and no NULL-text pair ever surfaces as a near-dup
    pairs = dedup.simhash_pairs(df, max_hamming=3).collect()
    flagged = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) not in flagged and (2, 1) not in flagged


def test_pack_sequences_null_text_placed_at_zero_tokens(spark):
    """A NULL-text doc packs like an empty one: 0 tokens, non-NULL
    placement (the lineage-join invariant), and exact integer pack ids."""
    from hyperspace_spark.llm.packing import pack_sequences, pack_stats

    df = spark.createDataFrame(
        [(1, "one two three"), (2, None), (3, "four five"), (4, "")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in pack_sequences(df, budget_tokens=4, shards=1).collect()}
    assert rows[2].n_tokens == 0 and rows[4].n_tokens == 0
    for r in rows.values():
        assert r.pack_id is not None and r.pack_offset is not None
        assert r.pack_id >= 0 and 0 <= r.pack_offset < 4
        # placement identity: pack_id*budget + pack_offset is the stream offset
    total = sum(r.n_tokens for r in rows.values())
    stats = pack_stats(
        pack_sequences(df, budget_tokens=4, shards=1), budget_tokens=4
    ).collect()
    assert sum(r.tokens_in_pack for r in stats) == total


def test_repetition_stats_and_filter(spark):
    from hyperspace_spark.llm.repetition import repetition_filter, repetition_stats

    df = spark.createDataFrame(
        [
            (1, "menu\nmenu\nmenu\nabout us"),              # 3/4 dup lines
            (2, "buy now buy now buy now buy now"),          # dominant 2-gram
            (3, "a perfectly normal unique sentence here"),  # clean
            (4, None),                                       # NULL text
            (5, "   \n  \n"),                                # whitespace only
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert rows[1].n_lines == 4 and abs(rows[1].dup_line_frac - 0.5) < 1e-9
    # doc 1: 4 lines, 2 distinct -> 1 - 2/4 = 0.5
    # doc 2 grams: (buy,now) x4, (now,buy) x3 of 7 -> top 4/7, dup 7/7
    assert abs(rows[2].top_2gram_frac - round(4 / 7, 6)) < 1e-9
    assert rows[2].dup_2gram_frac == 1.0
    assert rows[3].dup_line_frac == 0.0 and rows[3].dup_2gram_frac == 0.0
    assert rows[4].n_lines is None and rows[4].top_2gram_frac is None
    # whitespace-only doc: space-only trim (tokens() parity) leaves the
    # newlines, which split into two EMPTY tokens -> one ('','') gram at
    # fraction 1.0 — the same answer tokens()/token_count and the DuckDB
    # oracle give, which is the point of the parity rule
    assert rows[5].n_lines == 0 and rows[5].top_2gram_frac == 1.0

    kept = sorted(r.doc_id for r in repetition_filter(df).collect())
    # 1 fails dup_line, 2 and 5 fail top_2gram, 4 (NULL) dropped, 3 passes
    assert kept == [3]


def test_pack_sequences_placement_invariants(spark):
    """The packing contract, end-to-end on randomized docs: every doc
    placed, offsets in range, and the placement identity
    pack_id*budget + pack_offset == within-shard stream offset (exact
    integer math — the property the DIV fix protects)."""
    import random

    from hyperspace_spark.llm.packing import pack_sequences, pack_stats

    rng = random.Random(7)
    rows = [
        (i, " ".join(f"w{j}" for j in range(rng.randrange(0, 40))) or None)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    budget = 64
    packed = pack_sequences(df, budget_tokens=budget, shards=4).collect()
    assert len(packed) == 300
    by_shard = {}
    for r in packed:
        assert r.pack_id is not None and r.pack_offset is not None
        assert 0 <= r.pack_offset < budget and r.pack_id >= 0
        by_shard.setdefault(r.shard, []).append(r)
    total = 0
    for shard_rows in by_shard.values():
        off = 0
        for r in sorted(shard_rows, key=lambda r: r.doc_id):
            assert r.pack_id * budget + r.pack_offset == off, r
            off += r.n_tokens
        total += off
    stats = pack_stats(
        pack_sequences(df, budget_tokens=budget, shards=4), budget_tokens=budget
    ).collect()
    assert sum(r.tokens_in_pack for r in stats) == total
    # every pack except each shard's LAST is exactly full
    last = {r.shard: max(x.pack_id for x in stats if x.shard == r.shard) for r in stats}
    for r in stats:
        if r.pack_id < last[r.shard]:
            assert r.tokens_in_pack == budget, r


def test_token_quota_per_source(spark, docs):
    from hyperspace_spark.llm.sampling import token_quota_per_source

    kept = token_quota_per_source(docs, quota_tokens=500).collect()
    n_tok = {
        r.doc_id: r.nt
        for r in docs.selectExpr(
            "doc_id",
            "CAST(CASE WHEN text IS NULL OR trim(text)='' THEN 0 "
            "ELSE size(split(trim(text), '\\\\s+')) END AS LONG) AS nt",
        ).collect()
    }
    sources = {r.source for r in docs.select("source").distinct().collect()}
    by_source = {}
    for r in kept:
        by_source.setdefault(r.source, []).append(r.doc_id)
    # every source represented (at least one doc each)
    assert set(by_source) == sources
    # each source's PRE-doc offsets stayed under quota: total minus its
    # largest doc is < quota (the last admitted doc may straddle)
    for src, ids in by_source.items():
        total = sum(n_tok[i] for i in ids)
        assert total - max(n_tok[i] for i in ids) < 500, (src, total)
    # prefix property: a smaller quota keeps a strict subset
    small = {r.doc_id for r in token_quota_per_source(docs, quota_tokens=200).collect()}
    assert small.issubset({r.doc_id for r in kept})
    # determinism across runs
    again = {r.doc_id for r in token_quota_per_source(docs, quota_tokens=500).collect()}
    assert again == {r.doc_id for r in kept}


def test_token_quota_auto_prefilter_skewed_source(spark):
    """r6: a 50%-skewed source auto-engages the hash-prefix pre-filter
    (one cheap agg decides) and the kept set is IDENTICAL to the exact
    un-prefiltered pass — including under a deliberately-broken safety
    factor, where the superset check must trip and fall back."""
    from pyspark.sql import functions as F

    from hyperspace_spark.llm.sampling import token_quota_per_source

    big = spark.range(4000).select(
        F.concat(F.lit("b"), F.col("id")).alias("doc_id"),
        F.lit("giant_crawl").alias("source"),
        F.lit("ten tokens of filler text pad pad pad pad end").alias("text"),
    )
    small = spark.range(200).select(
        F.concat(F.lit("s"), F.col("id")).alias("doc_id"),
        F.lit("curated").alias("source"),
        F.lit("five neat little words").alias("text"),
    )
    # NULL source group: must ride the exact pass on EVERY code path —
    # including the superset-check fallback's good/bad split, where
    # ~isin(bad) is NULL for them (r7 regression).
    nulls = spark.range(30).select(
        F.concat(F.lit("n"), F.col("id")).alias("doc_id"),
        F.lit(None).cast("string").alias("source"),
        F.lit("three short words").alias("text"),
    )
    corpus = big.unionByName(small).unionByName(nulls)

    exact = {
        r.doc_id
        for r in token_quota_per_source(
            corpus, quota_tokens=300, auto_prefilter=False
        ).collect()
    }
    # engaged path: min_docs low enough that giant_crawl qualifies
    # (needed ~= 30 docs of 4000 -> frac ~= 0.06 << 0.5)
    auto = {
        r.doc_id
        for r in token_quota_per_source(
            corpus, quota_tokens=300, prefilter_min_docs=1000
        ).collect()
    }
    assert auto == exact
    # fallback path: safety_factor so small the surviving prefix holds
    # fewer than quota tokens -> superset check fails -> re-run exact
    fallback = {
        r.doc_id
        for r in token_quota_per_source(
            corpus, quota_tokens=300, prefilter_min_docs=1000, safety_factor=0.2
        ).collect()
    }
    assert fallback == exact
    # the NULL-source docs survived every path (30 of them, all under quota)
    assert sum(1 for d in exact if d.startswith("n")) == 30
    assert sum(1 for d in fallback if d.startswith("n")) == 30
    # balanced corpora never engage (min_docs default high): same set too
    assert {
        r.doc_id for r in token_quota_per_source(corpus, quota_tokens=300).collect()
    } == exact


def test_repetition_stats_string_ids_and_tab_parity(spark):
    """String id columns work (schema follows the id column's type), and
    tab/CR text follows tokens()/oracle whitespace semantics: space-only
    trim keeps the leading tab as an empty first token."""
    from hyperspace_spark.llm.repetition import repetition_stats

    df = spark.createDataFrame(
        [("http://a", "\tmenu\nmenu"), ("http://b", "plain text")],
        "url string, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(df, id_col="url").collect()}
    assert set(rows) == {"http://a", "http://b"}
    a = rows["http://a"]
    # lines: ['\tmenu', 'menu'] after space-only trim -> 2 distinct lines
    assert a.n_lines == 2 and a.dup_line_frac == 0.0
    # words: ['', 'menu', 'menu'] -> grams ('','menu'), ('menu','menu')
    assert a.top_2gram_frac == 0.5 and a.dup_2gram_frac == 0.0


def test_clean_corpus_reasons(spark):
    from hyperspace_spark.llm.pipeline import clean_corpus

    good = (
        "The quick brown fox jumps over the lazy dog and then walks home. " * 3
    )
    df = spark.createDataFrame(
        [
            (1, None),                          # null_text
            (2, "tiny"),                        # too_short
            (3, "x" * 30000),                   # too_long
            (4, ("menu\n" * 9) + good),         # repetitive (dup lines)
            (5, good),                          # kept
            (6, "zq " * 80),                    # low quality? top gram 1.0 -> repetitive
        ],
        "doc_id long, text string",
    )
    tagged = {r.doc_id: r.drop_reason for r in clean_corpus(df).collect()}
    assert tagged[1] == "null_text"
    assert tagged[2] == "too_short"
    assert tagged[3] == "too_long"
    assert tagged[4] == "repetitive"
    assert tagged[5] is None
    assert tagged[6] == "repetitive"  # single repeated 2-gram dominates

    # language gate, when enabled, sits between length and repetition
    df2 = spark.createDataFrame(
        [(7, "el gato es un animal y la casa es una cosa bonita de verdad. " * 3)],
        "doc_id long, text string",
    )
    out = clean_corpus(df2, allowed_langs=["en"]).collect()[0]
    assert out.drop_reason == "bad_lang"
    out2 = clean_corpus(df2, allowed_langs=["en", "es"]).collect()[0]
    assert out2.drop_reason is None


def test_clean_corpus_duplicate_ids_do_not_multiply_rows(spark):
    """clean_corpus runs BEFORE dedup, so duplicate ids are a legal
    input: the per-id metric aggregate keeps the join side unique and
    row counts exact (no quadratic blowup), with the worst-case
    (max) repetition deciding the shared id's fate."""
    from pyspark.sql import functions as F

    from hyperspace_spark.llm.pipeline import clean_corpus

    good = "The quick brown fox jumps over the lazy dog and walks home. " * 3
    df = spark.createDataFrame(
        [(7, good), (7, ("menu\n" * 9) + good), (8, good)],
        "doc_id long, text string",
    )
    out = clean_corpus(df).collect()
    assert len(out) == 3, "rows must not multiply through the metrics join"
    reasons = sorted((r.doc_id, r.drop_reason) for r in out)
    # both id-7 rows share the aggregated (max) metrics -> both repetitive
    assert reasons == [(7, "repetitive"), (7, "repetitive"), (8, None)]
    # caller columns named like the internal metrics don't collide
    df2 = spark.createDataFrame(
        [(1, good, 0.9)], "doc_id long, text string, dup_line_frac double"
    )
    out2 = clean_corpus(df2).collect()[0]
    assert out2.drop_reason is None and out2.dup_line_frac == 0.9


def test_clean_corpus_rejects_reserved_columns(spark):
    from hyperspace_spark.llm.pipeline import clean_corpus

    df = spark.createDataFrame([(1, "x", 1.0)], "doc_id long, text string, _hs_dlf double")
    with pytest.raises(ValueError, match="_hs_dlf"):
        clean_corpus(df)


def test_unigram_logprob_direction(spark):
    """Rare-token documents must score HIGHER (more surprising) than
    documents made of corpus-common tokens, and the mean is exact."""
    import math

    from hyperspace_spark.llm.text import unigram_logprob

    df = spark.createDataFrame(
        [(1, "the the the"), (2, "the zyxw")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in unigram_logprob(df).collect()}
    # corpus: the x4, zyxw x1, total 5
    assert rows[1].n_tokens == 3 and rows[2].n_tokens == 2
    exp1 = round(-math.log(4 / 5), 4)
    exp2 = round((-math.log(4 / 5) - math.log(1 / 5)) / 2, 4)
    assert abs(rows[1].mean_neg_logprob - exp1) < 1e-9
    assert abs(rows[2].mean_neg_logprob - exp2) < 1e-9
    assert rows[2].mean_neg_logprob > rows[1].mean_neg_logprob


def test_write_training_shards_deterministic(spark, docs, tmp_path):
    """Shard export: content-addressed membership (same doc -> same
    shard across runs), one file per shard directory, and a manifest
    that matches both the written files and an independent recount."""
    import os

    from hyperspace_spark.llm.export import write_training_shards

    out1, out2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    m1 = {r.shard: (r.n_docs, r.n_tokens) for r in write_training_shards(docs, out1, shards=8).collect()}
    m2 = {r.shard: (r.n_docs, r.n_tokens) for r in write_training_shards(docs, out2, shards=8).collect()}
    assert m1 == m2, "export must be reproducible run-to-run"
    assert sum(n for n, _ in m1.values()) == docs.count()

    # one data file per shard dir, and the files agree with the manifest
    for shard, (n_docs, _) in m1.items():
        d = os.path.join(out1, f"shard={shard}")
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, files
    back = spark.read.parquet(out1)
    counted = {r.shard: r.n for r in back.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert counted == {s: n for s, (n, _) in m1.items()}
    # membership is the md5 bucket, not task placement
    from hyperspace_spark.llm.sampling import hash_bucket
    expect = {r.doc_id: r.s for r in docs.select("doc_id", hash_bucket(F.col("doc_id"), 8).alias("s")).collect()}
    got = {r.doc_id: r.shard for r in back.select("doc_id", "shard").collect()}
    assert got == expect

    with pytest.raises(ValueError, match="shard"):
        write_training_shards(back, str(tmp_path / "s3"))


def test_write_training_shards_append_manifest_is_per_batch(spark, docs, tmp_path):
    """r7 review fix: under mode='append' the manifest must describe
    ONLY this call's batch (summing manifests across calls gives the
    directory total); ignore-with-existing-dir yields an EMPTY manifest,
    never a description of old data."""
    from hyperspace_spark.llm.export import write_training_shards

    out = str(tmp_path / "ap")
    b1 = docs.limit(30)
    b2 = docs.subtract(b1).limit(20)
    m1 = write_training_shards(b1, out, shards=4).collect()
    m2 = write_training_shards(b2, out, shards=4, mode="append").collect()
    assert sum(r.n_docs for r in m1) == 30
    assert sum(r.n_docs for r in m2) == 20  # this batch, not 50
    total = spark.read.parquet(out).count()
    assert total == 50  # directory holds both batches
    m3 = write_training_shards(b1, out, shards=4, mode="ignore").collect()
    assert m3 == []  # nothing written, nothing described
    # r7 review fix: an EMPTY batch to a fresh dir (upstream filter
    # matched nothing) returns an empty manifest with the contract
    # schema instead of crashing on a file-less directory read
    empty = docs.where("doc_id < 0")
    m4 = write_training_shards(empty, str(tmp_path / "fresh"), shards=4)
    assert m4.collect() == []
    assert [f.name for f in m4.schema.fields] == [
        "shard", "n_docs", "n_tokens", "n_chars",
    ]


def test_paragraph_dedup_preserves_null_text(spark):
    """r7 review fix: NULL-text docs stay NULL — collapsing them to ''
    would make unrelated media-only docs mutual exact duplicates."""
    from hyperspace_spark.llm.dedup import exact_dedup, paragraph_dedup

    df = spark.createDataFrame(
        [(1, "shared para\n\nunique one"), (2, "shared para"), (3, None), (4, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.text for r in paragraph_dedup(df, sep="\n\n").collect()}
    assert got[3] is None and got[4] is None
    assert got[1] == "shared para\n\nunique one"
    assert got[2] == ""  # all paragraphs seen before: empty, NOT NULL
    # downstream exact dedup keeps both NULL docs (its documented contract)
    kept = exact_dedup(
        spark.createDataFrame([(k, v) for k, v in got.items()], "doc_id long, text string")
    )
    assert {r.doc_id for r in kept.collect()} >= {3, 4}


def test_semantic_dedup_keeps_min_id_per_cluster(spark):
    """SemDeDup-style semantic dedup: near-identical embeddings collapse
    to the minimum id; orthogonal ones all survive."""
    import math

    dim = 64
    a = [1.0 if i == 0 else 0.0 for i in range(dim)]
    a2 = [math.cos(0.05) if i == 0 else (math.sin(0.05) if i == 1 else 0.0) for i in range(dim)]
    b = [1.0 if i == 7 else 0.0 for i in range(dim)]
    emb = spark.createDataFrame(
        [(10, a, "x"), (11, a2, "x"), (12, b, "y")],
        "vec_id long, embedding array<float>, label string",
    )
    kept = {r.vec_id for r in dedup.semantic_dedup(emb, threshold=0.9).collect()}
    assert kept == {10, 12}, kept  # 11 is a's semantic duplicate; min id wins


def test_cosine_zero_vector_no_crash(spark):
    """r7 review fix: a zero embedding must not DIVIDE_BY_ZERO the SQL
    cosine paths (ANSI mode) — semantics match the numpy kernels:
    cosine 0 everywhere, zero vector stays zero under unit_expr."""
    from pyspark.sql import functions as F

    from hyperspace_spark.llm import similarity

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.8, 0.6])],
        "vec_id long, embedding array<double>",
    )
    rows = similarity.cosine_topk(emb, [0], k=2).collect()
    sims = {r.neighbor_id: r.cosine for r in rows}
    assert sims[1] == 0.0  # zero vector: defined, not a crash
    u = emb.select(
        similarity.unit_expr(F.col("embedding").cast("array<double>")).alias("u")
    ).collect()
    assert u[1].u == [0.0, 0.0]
    pairs = dedup.embedding_near_dup_pairs(emb, threshold=0.9, method="sql").collect()
    assert all(p.cosine <= 1.0 for p in pairs)


def test_weighted_sample_clamps_and_nests(spark):
    """weighted_sample: weight clamps to [0,1]; a weighted sample is a
    SUBSET of the plain deterministic sample at the same rate (same
    bucket space, threshold scaled down by weight); weight=1 rows match
    deterministic_sample's prefix range."""
    from hyperspace_spark.llm import sampling

    df = spark.createDataFrame(
        [(i, float(w)) for i, w in zip(range(4000), [2.0, 1.0, 0.4, -3.0] * 1000)],
        "k long, w double",
    )
    plain = {r.k for r in sampling.deterministic_sample(df, "k", 0.5).collect()}
    weighted = {r.k for r in sampling.weighted_sample(df, "k", "w", 0.5).collect()}
    assert weighted <= plain
    # clamped weights: w>=1 behaves as 1 (kept iff in the plain sample),
    # w<=0 keeps nothing.
    heavy = {k for k in weighted if k % 4 in (0, 1)}
    assert heavy == {k for k in plain if k % 4 in (0, 1)}
    assert not any(k % 4 == 3 for k in weighted)
    # intermediate weight thins proportionally (0.4x of rate): loose band
    mid = sum(1 for k in weighted if k % 4 == 2)
    mid_plain = sum(1 for k in plain if k % 4 == 2)
    assert 0 < mid < mid_plain
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sampling.weighted_sample(df, "k", "w", 1.5)


def test_top_ngrams_basic(spark):
    from hyperspace_spark.llm import text as t

    df = spark.createDataFrame(
        [
            (1, "a b a b a b", "en"),
            (2, "a b c d", "en"),
            (3, "x y", "de"),
            (4, None, "de"),
            (5, "solo", "de"),  # < n tokens: contributes nothing
        ],
        "doc_id long, text string, lang string",
    )
    out = {(r.lang, r.rn): (r.gram, r.cnt) for r in t.top_ngrams(df, n=2, k=2).collect()}
    assert out[("en", 1)] == ("a b", 4)   # 3 in doc1 + 1 in doc2
    assert out[("en", 2)] == ("b a", 2)
    assert out[("de", 1)] == ("x y", 1)
    assert ("de", 2) not in out


def test_cross_source_overlap_counts_distinct_shingles(spark):
    from hyperspace_spark.llm import dedup

    eight = "t1 t2 t3 t4 t5 t6 t7 t8"
    df = spark.createDataFrame(
        [
            (1, eight, "a"),
            (2, f"{eight} x", "b"),       # shares the 8-gram with a
            (3, eight, "b"),              # duplicate within b: counted once
            (4, "totally different text here now ok fine yes", "c"),
            (5, None, "c"),
        ],
        "doc_id long, text string, source string",
    )
    got = {(r.source_a, r.source_b): r.shared
           for r in dedup.cross_source_overlap(df, n=8).collect()}
    assert got == {("a", "b"): 1}


def test_mp4_metadata_probe():
    """r10: MP4/ISO-BMFF box-tree metadata parse is REAL (ftyp/moov/
    mvhd/trak/hdlr/stsd -> brand, duration, track handlers/fourccs);
    frame decode stays codec-bound.  Covers 64-bit largesize boxes and
    version-1 mvhd."""
    import struct

    def box(tag, body):
        return struct.pack(">I", 8 + len(body)) + tag + body

    stsd = box(b"stsd", struct.pack(">II", 0, 1) + box(b"avc1", b"\x00" * 20))
    hdlr = box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12)
    trak = box(b"trak", box(b"mdia", hdlr + box(b"minf", box(b"stbl", stsd))))
    soun = box(b"trak", box(b"mdia",
        box(b"hdlr", b"\x00" * 8 + b"soun" + b"\x00" * 12)
        + box(b"minf", box(b"stbl",
            box(b"stsd", struct.pack(">II", 0, 1) + box(b"mp4a", b"\x00" * 20))))))
    mvhd_v1 = box(b"mvhd", b"\x01" + b"\x00" * 19 + struct.pack(">IQ", 90000, 90000 * 12) + b"\x00" * 80)
    moov = box(b"moov", mvhd_v1 + trak + soun)
    ftyp = box(b"ftyp", b"mp42" + b"\x00" * 8)
    meta = multimodal.probe_mp4(ftyp + moov)
    assert meta["brand"] == "mp42" and meta["duration_ms"] == 12000
    assert [t["handler"] for t in meta["tracks"]] == ["vide", "soun"]
    assert [t["fourcc"] for t in meta["tracks"]] == ["avc1", "mp4a"]
    with pytest.raises(ValueError):
        multimodal.probe_mp4(b"\x00\x00\x00\x08free")


def test_gif_codec_and_real_frame_sampling(spark):
    """r10: animated GIF decodes with the pure-numpy LZW codec —
    palette-exact frames roundtrip losslessly, delays survive — and
    sample_frames(decode='real') emits PNG-encoded frames at real
    animation timestamps, one per every_ms, honoring max_frames.
    Non-GIF video still refuses loudly on the real path."""
    import numpy as np

    from hyperspace_spark.llm import gif

    pal = gif._cube_palette()
    rng = np.random.default_rng(9)
    imgs = [pal[rng.integers(0, 252, (12, 16))] for _ in range(6)]
    blob = gif.encode_gif(imgs, delays_ms=[500] * 6)
    frames, delays = gif.decode_gif(blob)
    assert len(frames) == 6 and delays == [500] * 6
    for a, b in zip(frames, imgs):
        assert (a == b).all()

    rows = [
        (0, "video", bytearray(blob),
         {"width": 16, "height": 12, "sample_rate": None, "duration_ms": 3000,
          "format": "gif"}),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = sorted(
        multimodal.sample_frames(media, every_ms=1000, max_frames=8, decode="real")
        .collect(),
        key=lambda r: r.frame_index,
    )
    # 6 frames x 500ms, sampled every 1000ms -> frames at 0/1000/2000ms
    assert [r.frame_ms for r in got] == [0, 1000, 2000]
    dec = multimodal.decode_png(bytes(got[1].frame))
    assert (dec == imgs[2]).all()  # the frame covering t=1000ms
    # real stats over the first frame
    st = multimodal.real_media_stats(blob, "gif")
    assert (st["width"], st["height"]) == (16, 12)
    # non-gif video refuses loudly on the real path
    mp4 = multimodal.synthetic_media_df(spark, n=3).filter("meta.format = 'mp4'")
    with pytest.raises(Exception, match="NotImplementedError|real frame"):
        multimodal.sample_frames(mp4, decode="real").collect()
