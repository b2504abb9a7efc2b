"""Inverted text index (kind TXT): build, bucket-pruned search, term
normalization, hybrid append/delete exactness, incremental refresh
(hardlinked retained buckets + per-bucket appends), lifecycle.
"""

import glob
import os
import re

import pytest
from pyspark.sql import functions as F

from hyperspace_spark import Hyperspace, InvertedTextIndexConfig

from tests.conftest import table


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("txt_src")) + "/data"
    spark.createDataFrame(
        [
            (1, "The quick brown fox jumps"),
            (2, "a quick test of the index"),
            (3, "brown bears eat fish"),
            (4, None),
            (5, "QUICK   brown sugar"),
        ],
        "doc_id long, text string",
    ).repartition(2).write.parquet(src)
    hs = Hyperspace(spark, system_path=str(tmp_path_factory.mktemp("hsidx_txt")))
    hs.create_index(spark.read.parquet(src), InvertedTextIndexConfig("txt1", num_buckets=4))
    return hs, src


def test_search_all_any_and_normalization(spark, built):
    hs, _ = built
    assert sorted(r.doc_id for r in hs.text_search("txt1", ["quick", "brown"]).collect()) == [1, 5]
    # term normalization mirrors indexing (trim + lower)
    assert sorted(r.doc_id for r in hs.text_search("txt1", ["Quick", " BROWN "]).collect()) == [1, 5]
    assert sorted(
        r.doc_id for r in hs.text_search("txt1", ["quick", "brown"], mode="any").collect()
    ) == [1, 2, 3, 5]
    with pytest.raises(Exception):
        hs.text_search("txt1", ["   "])
    # A phrase is an error, not a silently-weakened conjunction.
    with pytest.raises(ValueError, match="single tokens"):
        hs.text_search("txt1", ["new york", "data"])


def test_bucket_pruning_engages(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("txt_docs")) + "/data"
    table(spark, "documents").repartition(2).write.parquet(src)
    hs = Hyperspace(spark, system_path=str(tmp_path_factory.mktemp("hsidx_txtp")))
    hs.create_index(spark.read.parquet(src), InvertedTextIndexConfig("txtp", num_buckets=16))
    df = hs.text_search("txtp", ["the"], mode="any")
    # Driver-side bucket-file pruning: a one-term probe reads ~1/16 of
    # the posting files (conf-independent — Spark's own bucketed-scan
    # pruning is disabled by autoBucketedScan for this plan shape).
    import glob as _glob

    total = len(
        [p for p in _glob.glob(f"{hs._system_path}/txtp/v__=*/*.parquet")]
    )
    probed = len(df.inputFiles())
    assert 0 < probed < total, (probed, total)
    assert df.count() > 0
    # Ranked retrieval and phrase search ride the SAME pruned probe:
    # the scoring/verify jobs read only the probed tokens' bucket files.
    ranked = hs.text_search_ranked("txtp", ["the"], k=5)
    assert 0 < len(ranked.inputFiles()) < total
    assert ranked.count() == 5
    ph = hs.text_search_phrase("txtp", "the data")
    assert 0 < len(ph.inputFiles()) < total


def test_hybrid_append_delete_and_incremental_refresh(spark, built):
    hs, src = built
    # Append WITHOUT refresh: searched on the fly (raw read of only the
    # new files).
    spark.createDataFrame(
        [(9, "fresh quick brown doc")], "doc_id long, text string"
    ).write.mode("append").parquet(src)
    assert sorted(r.doc_id for r in hs.text_search("txt1", ["quick", "brown"]).collect()) == [1, 5, 9]
    # Incremental refresh: retained bucket files hardlink through; the
    # result set is unchanged but now index-served.
    hs.refresh_index("txt1", mode="incremental")
    assert sorted(r.doc_id for r in hs.text_search("txt1", ["quick", "brown"]).collect()) == [1, 5, 9]
    # Delete a source file: the STALE index still answers exactly via the
    # lineage anti-filter (compare against a raw recompute).
    os.remove(sorted(glob.glob(f"{src}/part-*"))[0])
    raw = spark.read.parquet(src).filter("text is not null")
    want = sorted(
        r.doc_id
        for r in raw.collect()
        if {"quick", "brown"} <= set(r.text.lower().split())
    )
    got = sorted(r.doc_id for r in hs.text_search("txt1", ["quick", "brown"]).collect())
    assert got == want


def test_optimize_compacts_posting_files(spark, built):
    """TXT rides the CI per-bucket compaction: after incremental appends
    accumulate small per-refresh posting files, optimize reduces the
    file count with identical search results."""
    hs, src = built
    spark.createDataFrame(
        [(20, "another quick brown entry")], "doc_id long, text string"
    ).write.mode("append").parquet(src)
    hs.refresh_index("txt1", mode="incremental")
    before = sorted(r.doc_id for r in hs.text_search("txt1", ["quick", "brown"]).collect())
    e = next(x for x in hs._active_entries(hs.conf()) if x.name == "txt1")
    files_before = len([f for f in e.content_files if f.path.endswith(".parquet")])
    hs.optimize_index("txt1", mode="full")
    e2 = next(x for x in hs._active_entries(hs.conf()) if x.name == "txt1")
    files_after = len([f for f in e2.content_files if f.path.endswith(".parquet")])
    assert files_after <= files_before
    after = sorted(r.doc_id for r in hs.text_search("txt1", ["quick", "brown"]).collect())
    assert after == before and 20 in after


def _bm25_reference(docs, terms, k1=1.2, b=0.75):
    """Pure-python BM25 replay over {doc_id: text}: the oracle for the
    tiny corpora below, summing term scores in sorted-term order (the
    operator's documented association order)."""
    import math

    toks = {d: t.lower().split() for d, t in docs.items() if t is not None}
    toks = {d: t for d, t in toks.items() if t}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for d, t in toks.items():
        s = 0.0
        for term in sorted(set(terms)):
            tf = t.count(term)
            if not tf:
                continue
            df = sum(1 for tt in toks.values() if term in tt)
            idf = math.log((float(n) - df + 0.5) / (df + 0.5) + 1.0)
            s = s + idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * len(t) / float(avgdl))
            )
        if s:
            out[d] = round(s, 4)
    return out


def test_ranked_search_bm25(spark, built):
    hs, src = built
    docs = {
        r.doc_id: r.text for r in spark.read.parquet(src).collect()
    }
    want = _bm25_reference(docs, ["quick", "brown"])
    got = {
        r.doc_id: r.score
        for r in hs.text_search_ranked("txt1", ["quick", "brown"], k=10).collect()
    }
    assert got == pytest.approx(want, abs=1e-4), (got, want)
    # top-1 ranks the doc where both rarer terms concentrate; k truncates
    top = hs.text_search_ranked("txt1", ["quick", "brown"], k=1).collect()
    assert len(top) == 1
    assert top[0].doc_id == max(want, key=lambda d: (want[d], -d))
    # ties rank by id and scores are descending
    rows = hs.text_search_ranked("txt1", ["quick", "brown"], k=10).collect()
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_ranked_search_tracks_hybrid_state(spark, built):
    """Appends/deletes adjust N, avgdl, df and the posting set — the
    ranked result must equal a from-scratch replay over the LIVE corpus
    (the `built` fixture's earlier tests already appended docs 9/20 and
    deleted a source file)."""
    hs, src = built
    live = {r.doc_id: r.text for r in spark.read.parquet(src).collect()}
    want = _bm25_reference(live, ["quick", "brown"])
    got = {
        r.doc_id: r.score
        for r in hs.text_search_ranked("txt1", ["quick", "brown"], k=20).collect()
    }
    assert got == pytest.approx(want, abs=1e-4), (got, want)


def test_phrase_search(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("txt_ph")) + "/data"
    spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "brown quick the"),           # all terms, wrong order
            (3, "a QUICK   Brown bear"),      # normalization + multi-space
            (4, "quick brown quick brown"),   # repeated phrase
            (5, "quick of brown"),            # gap breaks adjacency
            (6, None),
            (7, "sugar quick brown quick"),   # match not at start
        ],
        "doc_id long, text string",
    ).repartition(2).write.parquet(src)
    hs = Hyperspace(spark, system_path=str(tmp_path_factory.mktemp("hsidx_ph")))
    hs.create_index(spark.read.parquet(src), InvertedTextIndexConfig("ph1", num_buckets=4))
    got = sorted(r.doc_id for r in hs.text_search_phrase("ph1", "Quick  Brown").collect())
    assert got == [1, 3, 4, 7]
    # single-token phrase degrades to containment
    assert sorted(r.doc_id for r in hs.text_search_phrase("ph1", "sugar").collect()) == [7]
    # 3-token phrase with a repeated token
    assert sorted(
        r.doc_id for r in hs.text_search_phrase("ph1", "quick brown quick").collect()
    ) == [4, 7]
    # hybrid append: new docs phrase-match on the fly
    spark.createDataFrame(
        [(9, "totally quick brown again")], "doc_id long, text string"
    ).write.mode("append").parquet(src)
    got2 = sorted(r.doc_id for r in hs.text_search_phrase("ph1", "quick brown").collect())
    assert got2 == [1, 3, 4, 7, 9]
    with pytest.raises(ValueError, match="usable tokens"):
        hs.text_search_phrase("ph1", "   ")


def test_matches_raw_tokenization_on_corpus(spark, tmp_path_factory):
    """Index-served results equal a raw tokenize-and-filter over the
    documents fixture (the contract oracle's property, engine-local)."""
    src = str(tmp_path_factory.mktemp("txt_corpus")) + "/data"
    table(spark, "documents").repartition(4).write.parquet(src)
    hs = Hyperspace(spark, system_path=str(tmp_path_factory.mktemp("hsidx_txtc")))
    hs.create_index(spark.read.parquet(src), InvertedTextIndexConfig("txtc", num_buckets=8))
    terms = ["data", "join"]
    got = sorted(r.doc_id for r in hs.text_search("txtc", terms).collect())
    from hyperspace_spark.llm.text import tokens

    raw = (
        spark.read.parquet(src)
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.array_distinct(tokens(F.col("text"))).alias("t"))
        .filter(F.arrays_overlap(F.col("t"), F.array(F.lit("data"))))
        .filter(F.arrays_overlap(F.col("t"), F.array(F.lit("join"))))
    )
    want = sorted(r.doc_id for r in raw.collect())
    assert got == want and len(got) > 0


def test_reappended_same_doc_id_all_search_surfaces(spark, tmp_path_factory):
    """Regression (r9 review): a doc id live under TWO physical copies
    (a corrected copy re-appended before refresh) used to crash
    text_search_phrase with 'Duplicate map key' and let
    text_search_ranked pick an arbitrary copy's tf.  Per-(doc, copy)
    verification fixes both: phrase matches when ANY copy contains the
    phrase; ranked scores each copy and the best one represents the id."""
    src = str(tmp_path_factory.mktemp("txt_dup")) + "/data"
    spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "unrelated words here")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src)
    hs = Hyperspace(spark, system_path=str(tmp_path_factory.mktemp("hsidx_dup")))
    hs.create_index(
        spark.read.parquet(src), InvertedTextIndexConfig("txtd", num_buckets=4)
    )
    # Corrected copy of doc 1, same id, appended WITHOUT refresh: the
    # probe now sees doc 1 from the index AND from the appended file.
    spark.createDataFrame(
        [(1, "beta alpha gamma")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)

    # phrase: old copy has "alpha beta", new has "beta alpha" — both
    # phrases match doc 1 through their respective copies, no crash.
    assert [r.doc_id for r in hs.text_search_phrase("txtd", "alpha beta").collect()] == [1]
    assert [r.doc_id for r in hs.text_search_phrase("txtd", "beta alpha").collect()] == [1]
    assert hs.text_search_phrase("txtd", "gamma alpha").collect() == []
    # ranked: one row per doc id, deterministic
    rows = hs.text_search_ranked("txtd", ["alpha", "beta"], k=10).collect()
    assert [r.doc_id for r in rows] == [1] and len(rows) == 1
    # keyword search unaffected
    assert sorted(r.doc_id for r in hs.text_search("txtd", ["alpha", "beta"]).collect()) == [1]

    # TWO appended files each carrying doc 3 with different text (review
    # round 2's repro): the copy key must exist AT THE SCAN, before the
    # postings groupBy — a post-aggregation input_file_name() is empty
    # and the merged positions (alpha@[1] from fileA, beta@[2] from
    # fileB) would fabricate an adjacency no physical copy contains.
    spark.createDataFrame(
        [(3, "alpha x")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(3, "y beta")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    assert hs.text_search_phrase("txtd", "alpha x").collect()[0].doc_id == 3
    got = {r.doc_id for r in hs.text_search_phrase("txtd", "alpha beta").collect()}
    assert 3 not in got, "cross-copy merged positions fabricated a phrase match"


def test_ranked_search_exact_after_append_delete_refresh_quick(
    spark, tmp_path_factory
):
    """r10 (verdict item 8): BM25 on an index carrying appended AND
    deleted state through a QUICK refresh (delta recorded in the log,
    postings untouched) must score EXACTLY like a FRESH index built over
    the live corpus — the per-file corpus stats (inverted._corpus_stats)
    compensate N/avgdl/df, not just the posting set."""
    import os

    src = str(tmp_path_factory.mktemp("txt_q_src")) + "/data"
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a quick test of ranked retrieval"),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src)
    victim = next(f for f in os.listdir(src) if f.endswith(".parquet"))
    spark.createDataFrame(
        [(3, "brown bears eat fish and honey")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    hs = Hyperspace(spark, system_path=str(tmp_path_factory.mktemp("hsq_idx")))
    hs.create_index(
        spark.read.parquet(src), InvertedTextIndexConfig("txtq", num_buckets=4)
    )
    # append two docs in a new file, then retract the file holding docs
    # 1-2, so N, avgdl and df all shift in both directions
    spark.createDataFrame(
        [(10, "quick quick brown everything"), (11, "nothing relevant here")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    hs.refresh_index("txtq", mode="quick")  # delta -> log, postings stale
    os.remove(os.path.join(src, victim))
    hs.refresh_index("txtq", mode="quick")

    live = {r.doc_id: r.text for r in spark.read.parquet(src).collect()}
    assert set(live) == {3, 10, 11}, "staging mishap"
    got = {
        r.doc_id: r.score
        for r in hs.text_search_ranked("txtq", ["quick", "brown"], k=10).collect()
    }
    # fresh-index oracle: same engine, zero hybrid state
    hs2 = Hyperspace(spark, system_path=str(tmp_path_factory.mktemp("hsq_idx2")))
    hs2.create_index(
        spark.read.parquet(src), InvertedTextIndexConfig("txtq2", num_buckets=4)
    )
    fresh = {
        r.doc_id: r.score
        for r in hs2.text_search_ranked("txtq2", ["quick", "brown"], k=10).collect()
    }
    assert got == pytest.approx(fresh, abs=1e-9), (got, fresh)
    # and both equal the pure-python replay
    want = _bm25_reference(live, ["quick", "brown"])
    assert got == pytest.approx(want, abs=1e-4), (got, want)


def test_delete_incremental_refresh_rewrites_only_affected_postings(
    spark, tmp_path_factory
):
    """r10: a DELETE refreshes the TXT index incrementally — only the
    posting files holding the deleted docs' rows rewrite (lineage
    anti-filter; inode-asserted survivors), no corpus re-tokenize, BM25
    corpus stats drop the dead file's row — and every search mode equals
    a fresh index built over the live corpus."""
    import os

    src = str(tmp_path_factory.mktemp("txt_d_src")) + "/data"
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the dog"),
            (2, "a quick test of incremental deletes"),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src)
    victim = next(f for f in os.listdir(src) if f.endswith(".parquet"))
    spark.createDataFrame(
        [
            (3, "brown bears eat fish and honey"),
            (4, "zzyzx only lives here"),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    hs = Hyperspace(spark, system_path=str(tmp_path_factory.mktemp("hsd_idx")))
    hs.create_index(
        spark.read.parquet(src), InvertedTextIndexConfig("txtd", num_buckets=8)
    )
    e0 = next(e for e in hs._active_entries(hs.conf()) if e.name == "txtd")
    base0 = e0.index_data_dirs[-1].rstrip("/")
    stats0 = dict(e0.derived_properties["fileDocStats"])
    # posting files holding docs 1/2 (the victim file's rows)
    from pyspark.sql import functions as F

    affected = {
        r[0].rsplit("/", 1)[-1]
        for r in spark.read.parquet(base0)
        .filter(F.col("_doc").isin([1, 2]))
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    inodes0 = {
        f.path[len(base0) + 1 :]: os.stat(f.path).st_ino
        for f in e0.content_files
        if f.path.endswith(".parquet")
    }
    assert affected and len(affected) < len(inodes0), (affected, len(inodes0))

    os.remove(os.path.join(src, victim))
    hs.refresh_index("txtd", "incremental")
    e1 = next(e for e in hs._active_entries(hs.conf()) if e.name == "txtd")
    assert e1.data_version > e0.data_version
    base1 = e1.index_data_dirs[-1].rstrip("/")
    after = {
        f.path[len(base1) + 1 :]: f.path
        for f in e1.content_files
        if f.path.endswith(".parquet")
    }
    for rel, ino in inodes0.items():
        if rel.rsplit("/", 1)[-1] in affected:
            assert rel not in after, f"affected posting file {rel} must not carry"
        else:
            assert rel in after and os.stat(after[rel]).st_ino == ino, rel
    # corpus stats: dead source file's row dropped, survivors kept
    stats1 = e1.derived_properties["fileDocStats"]
    assert len(stats1) == len(stats0) - 1
    assert sum(n for n, _ in stats1.values()) == 2  # docs 3 and 4

    # all search modes equal a fresh index over the live corpus
    hs2 = Hyperspace(spark, system_path=str(tmp_path_factory.mktemp("hsd_idx2")))
    hs2.create_index(
        spark.read.parquet(src), InvertedTextIndexConfig("txtd2", num_buckets=8)
    )
    assert sorted(
        r.doc_id for r in hs.text_search("txtd", ["brown"]).collect()
    ) == sorted(r.doc_id for r in hs2.text_search("txtd2", ["brown"]).collect()) == [3]
    got = {
        r.doc_id: r.score
        for r in hs.text_search_ranked("txtd", ["brown", "honey"], k=10).collect()
    }
    fresh = {
        r.doc_id: r.score
        for r in hs2.text_search_ranked("txtd2", ["brown", "honey"], k=10).collect()
    }
    assert got == pytest.approx(fresh, abs=1e-9), (got, fresh)
    assert sorted(
        r.doc_id for r in hs.text_search_phrase("txtd", "bears eat fish").collect()
    ) == [3]
    assert hs.text_search("txtd", ["quick"], mode="any").count() == 0


def test_boolean_search_parser_and_semantics(spark, built):
    """text_search_boolean: parser shapes, membership semantics vs a raw
    replay, and negation-only refusal."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from hyperspace_spark.indexes.inverted import _bool_eval, _parse_bool_query

    hs, src = built
    # parser
    ast = _parse_bool_query("(Quick AND brown) OR (lazy AND NOT dog)")
    assert ast[0] == "or" and len(ast[1]) == 2
    assert _bool_eval(ast, lambda t: t in {"quick", "brown"})
    assert not _bool_eval(ast, lambda t: t in {"lazy", "dog"})
    with _pytest.raises(ValueError):
        _parse_bool_query("a AND (b OR")
    with _pytest.raises(ValueError):
        _parse_bool_query("AND a")
    # negation-only refusal (satisfiable with every term absent)
    for bad in ("NOT fox", "a OR NOT b"):
        with _pytest.raises(ValueError):
            hs.text_search_boolean("txt1", bad)
    # semantics vs raw replay over the fixture corpus
    got = {
        r[0]
        for r in hs.text_search_boolean(
            "txt1", "(quick AND brown) OR (test AND NOT fox)"
        ).collect()
    }
    raw = spark.read.parquet(src).filter("text IS NOT NULL")
    toks = raw.select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("w")
    )
    want = {
        r[0]
        for r in toks.filter(
            (F.array_contains("w", "quick") & F.array_contains("w", "brown"))
            | (F.array_contains("w", "test") & ~F.array_contains("w", "fox"))
        ).collect()
    }
    assert got == want and len(want) > 0


def test_ranked_with_boolean_filter(spark, built):
    """filter_query restricts BM25 candidates without touching scoring
    (Lucene filter-context semantics): surviving docs keep exactly the
    score they get unfiltered."""
    hs, src = built
    unfiltered = {r[0]: r[1] for r in hs.text_search_ranked("txt1", ["quick", "brown"]).collect()}
    filtered = {
        r[0]: r[1]
        for r in hs.text_search_ranked(
            "txt1", ["quick", "brown"], filter_query="quick AND NOT fox"
        ).collect()
    }
    assert filtered, "filter should keep some docs"
    # every surviving doc keeps its unfiltered score
    for doc, score in filtered.items():
        assert score == unfiltered[doc], (doc, score, unfiltered[doc])
    # docs containing 'fox' are gone; doc 1 has fox
    assert 1 in unfiltered and 1 not in filtered
