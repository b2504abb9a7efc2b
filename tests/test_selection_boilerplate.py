"""Corpus-level boilerplate line removal (llm/boilerplate.py) and DSIR
importance weighting (llm/selection.py): semantics on hand-built
corpora, DuckDB replay on the real documents table, and the guard
rails (NULL text, thresholds, persisted-model reuse)."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from hyperspace_spark.llm.boilerplate import line_doc_freq, remove_boilerplate_lines
from hyperspace_spark.llm.selection import dsir_importance, dsir_logratio_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def duck(sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    return con.execute(sql).fetchall()


# ---------------------------------------------------------------------------
# boilerplate line removal
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def chrome_docs(spark):
    # 3 docs share a cookie banner (with whitespace/case variance that
    # normalization must unify); each has unique content; doc 4 is all
    # boilerplate; doc 5 is NULL.
    return spark.createDataFrame(
        [
            (1, "Accept  cookies?\nunique alpha\n\nshared tail"),
            (2, "accept cookies?\nunique beta\nshared tail"),
            (3, "ACCEPT COOKIES?\nunique gamma"),
            (4, "accept cookies?"),
            (5, None),
        ],
        "doc_id long, text string",
    )


def test_line_doc_freq_normalizes_and_counts_distinct_docs(spark, chrome_docs):
    freq = {r.line_norm: r.doc_freq for r in line_doc_freq(chrome_docs).collect()}
    assert freq["accept cookies?"] == 4  # case/whitespace variants unified
    assert freq["shared tail"] == 2
    assert freq["unique alpha"] == 1
    assert "" not in freq  # blank lines are structural, never counted


def test_line_doc_freq_counts_docs_not_occurrences(spark):
    df = spark.createDataFrame(
        [(1, "footer\nfooter\nfooter"), (2, "footer")],
        "doc_id long, text string",
    )
    freq = {r.line_norm: r.doc_freq for r in line_doc_freq(df).collect()}
    assert freq["footer"] == 2  # doc 1's self-repetition contributes 1


def test_remove_boilerplate_lines_semantics(spark, chrome_docs):
    got = {
        r.doc_id: r.text
        for r in remove_boilerplate_lines(chrome_docs, min_doc_freq=3).collect()
    }
    # banner (df=4) removed everywhere incl. first doc; shared tail (df=2) kept
    assert got[1] == "unique alpha\n\nshared tail"
    assert got[2] == "unique beta\nshared tail"
    assert got[3] == "unique gamma"
    assert got[4] == ""  # all lines were boilerplate: empty, NOT NULL
    assert got[5] is None  # NULL text stays NULL


def test_remove_boilerplate_lines_frac_threshold(spark, chrome_docs):
    # 4 non-null docs; frac 0.5 -> threshold 2 docs: banner AND shared
    # tail both removed, scale-free form.
    got = {
        r.doc_id: r.text
        for r in remove_boilerplate_lines(chrome_docs, min_doc_frac=0.5).collect()
    }
    assert got[1] == "unique alpha\n"  # trailing blank line survives
    assert got[2] == "unique beta"
    assert got[3] == "unique gamma"


def test_remove_boilerplate_lines_reuses_persisted_freq(spark, chrome_docs):
    freq = line_doc_freq(chrome_docs)
    a = remove_boilerplate_lines(chrome_docs, min_doc_freq=3).collect()
    b = remove_boilerplate_lines(
        chrome_docs, min_doc_freq=3, freq_df=freq
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_remove_boilerplate_lines_param_validation(spark, chrome_docs):
    with pytest.raises(ValueError, match="exactly one"):
        remove_boilerplate_lines(chrome_docs)
    with pytest.raises(ValueError, match="exactly one"):
        remove_boilerplate_lines(chrome_docs, min_doc_freq=3, min_doc_frac=0.5)
    with pytest.raises(ValueError, match=">= 2"):
        remove_boilerplate_lines(chrome_docs, min_doc_freq=1)
    with pytest.raises(ValueError, match="min_doc_frac"):
        remove_boilerplate_lines(chrome_docs, min_doc_frac=1.5)


def test_remove_boilerplate_matches_duckdb_on_documents(spark, docs):
    # Degenerate single-space separator over the real table (words as
    # lines) — the same corpus-shaped stress the dedup_paragraph
    # contract uses; threshold picked to remove only genuinely common
    # words.
    got = {
        r.doc_id: r.text
        for r in remove_boilerplate_lines(docs, min_doc_freq=30, sep=" ").collect()
    }
    want = dict(
        duck(
            """
            WITH l AS (
              SELECT doc_id, i AS pos, parts[i] AS line
              FROM (SELECT doc_id, string_split(text, ' ') AS parts
                    FROM documents WHERE text IS NOT NULL) d,
                   LATERAL (SELECT unnest(generate_series(1, len(d.parts))) AS i) g
            ), n AS (
              SELECT doc_id, pos, line,
                     lower(trim(regexp_replace(line, '\\s+', ' ', 'g'))) AS norm
              FROM l
            ), hot AS (
              SELECT md5(norm) AS k FROM n WHERE len(norm) >= 1
              GROUP BY 1 HAVING count(DISTINCT doc_id) >= 30
            ), kept AS (
              SELECT doc_id, pos, line FROM n
              WHERE md5(norm) NOT IN (SELECT k FROM hot)
            )
            SELECT d.doc_id,
                   CASE WHEN d.text IS NULL THEN NULL
                        ELSE coalesce(string_agg(k.line, ' ' ORDER BY k.pos), '')
                   END AS text
            FROM documents d LEFT JOIN kept k USING (doc_id)
            GROUP BY d.doc_id, d.text
            """
        )
    )
    assert got == want
    # sanity: the threshold actually bit (some docs shrank)
    orig = {r.doc_id: r.text for r in docs.collect()}
    assert any(
        got[k] != orig[k] for k in got if got[k] is not None and orig[k] is not None
    )


def test_remove_boilerplate_frac_floor_on_tiny_corpus(spark):
    """r7 review fix: on a tiny corpus ndocs*frac can drop to <= 1,
    where doc_freq >= threshold holds for EVERY line — the scale-free
    path needs the same >= 2 floor the absolute path validates, so
    unique lines survive and only genuinely shared ones go."""
    df = spark.createDataFrame(
        [(1, "shared\nunique one"), (2, "shared\nunique two")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.text
        for r in remove_boilerplate_lines(df, min_doc_frac=0.4).collect()
    }
    # threshold = max(2, 2*0.4=0.8) = 2: 'shared' (df=2) removed,
    # uniques (df=1) kept — NOT a blanked corpus
    assert got[1] == "unique one" and got[2] == "unique two"


def test_remove_boilerplate_identity_when_threshold_unreachable(spark, docs):
    """doc_freq can never reach corpus_size+1, so the op must be a
    bit-exact identity on text — catches any reassembly bug (line
    order, separator handling, empty-line loss) independent of the
    frequency logic."""
    n = docs.count()
    got = {
        r.doc_id: r.text
        for r in remove_boilerplate_lines(docs, min_doc_freq=n + 1, sep=" ").collect()
    }
    want = {r.doc_id: r.text for r in docs.collect()}
    assert got == want


# ---------------------------------------------------------------------------
# DSIR importance
# ---------------------------------------------------------------------------
def test_dsir_prefers_target_like_docs(spark):
    raw = spark.createDataFrame(
        [
            (1, "physics quantum field theory"),
            (2, "buy cheap pills online now"),
            (3, "quantum mechanics lecture notes"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(100, "quantum physics"), (101, "field theory notes")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in dsir_importance(raw, target).collect()}
    assert 4 not in got  # NULL text: absent, same contract as unigram_logprob
    assert got[1].importance > got[2].importance
    assert got[3].importance > got[2].importance
    assert got[2].importance < 0  # spam shares no target tokens
    assert got[1].n_tokens == 4


def test_dsir_persisted_model_and_oov_neutrality(spark):
    raw = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma")], "doc_id long, text string"
    )
    target = spark.createDataFrame([(9, "alpha alpha")], "doc_id long, text string")
    model = dsir_logratio_table(raw, target)
    inline = {r.doc_id: r.importance for r in dsir_importance(raw, target).collect()}
    reused = {
        r.doc_id: r.importance
        for r in dsir_importance(raw, logratio_df=model).collect()
    }
    assert inline == reused
    # a NEW shard with an out-of-vocab token: OOV contributes exactly 0
    shard = spark.createDataFrame([(3, "alpha zzz")], "doc_id long, text string")
    lr_alpha = {
        r.tok: r.logratio for r in model.collect()
    }["alpha"]
    scored = dsir_importance(shard, logratio_df=model).collect()[0]
    assert scored.n_tokens == 2
    assert scored.importance == pytest.approx(round(lr_alpha, 4), abs=1e-4)


def test_dsir_param_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="exactly one"):
        dsir_importance(df)
    with pytest.raises(ValueError, match="alpha"):
        dsir_logratio_table(df, df, alpha=0.0)


def test_dsir_matches_duckdb_on_documents(spark, docs):
    # target = the corpus's English docs; every raw doc scored against
    # that — the exact contract-query shape, replayed in DuckDB.
    target = docs.where(F.col("lang") == "en")
    got = {
        (r.doc_id, r.n_tokens, f"{r.importance:.4f}")
        for r in dsir_importance(docs, target).collect()
    }
    want = {
        (d, n, f"{imp:.4f}")
        for d, n, imp in duck(
            """
            WITH tk AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
              FROM documents WHERE text IS NOT NULL
            ), cr AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
            ct AS (
              SELECT tok, count(*) AS c FROM tk
              JOIN (SELECT doc_id FROM documents WHERE lang = 'en') e USING (doc_id)
              GROUP BY tok
            ), j AS (
              SELECT cr.tok, cr.c AS craw, coalesce(ct.c, 0) AS ctgt
              FROM cr LEFT JOIN ct USING (tok)
            ), t AS (
              SELECT sum(craw) AS nr, sum(ctgt) AS nt, count(*) AS v FROM j
            ), lr AS (
              SELECT tok,
                     ln((ctgt + 0.5) / (nt + 0.5 * v))
                     - ln((craw + 0.5) / (nr + 0.5 * v)) AS logratio
              FROM j CROSS JOIN t
            )
            SELECT doc_id, count(*) AS n_tokens,
                   round(sum(logratio), 4) + 0.0 AS importance
            FROM tk JOIN lr USING (tok) GROUP BY doc_id
            """
        )
    }
    assert got == want
    # directional sanity: the mean importance of en docs beats non-en
    imp = {r.doc_id: r.importance for r in dsir_importance(docs, target).collect()}
    langs = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    en = [v for k, v in imp.items() if langs[k] == "en"]
    rest = [v for k, v in imp.items() if langs[k] != "en"]
    assert sum(en) / len(en) > sum(rest) / len(rest)
