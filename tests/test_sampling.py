"""Deterministic sampling / mixture / split (llm.sampling).

The contract under test: samples are a pure function of the key — stable
across partitionings and engines — with nesting (smaller fractions are
subsets of larger), disjoint exhaustive splits, and an exact DuckDB
rendering of the bucket hash.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from hyperspace_spark.llm import sampling

from tests.conftest import SF_DIR, table


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_bucket_hash_matches_duckdb(spark, docs):
    got = {
        r.doc_id: r.b
        for r in docs.select(
            "doc_id", sampling.hash_bucket(F.col("doc_id")).alias("b")
        ).collect()
    }
    want = dict(
        duckdb.sql(
            f"SELECT doc_id, {sampling.duckdb_bucket_sql('doc_id')} "
            f"FROM read_parquet('{SF_DIR}/documents.parquet')"
        ).fetchall()
    )
    assert got == want


def test_sample_nesting_and_determinism(spark, docs):
    s1 = {r.doc_id for r in sampling.deterministic_sample(docs, "doc_id", 0.02).collect()}
    s10 = {r.doc_id for r in sampling.deterministic_sample(docs, "doc_id", 0.10).collect()}
    assert s1 <= s10
    assert 0 < len(s10) < docs.count()
    # stable under an arbitrary repartitioning
    s10b = {
        r.doc_id
        for r in sampling.deterministic_sample(docs.repartition(7), "doc_id", 0.10).collect()
    }
    assert s10 == s10b


def test_stratified_rates(spark, docs):
    rates = {"en": 1.0, "zh": 0.0}
    kept = sampling.stratified_sample(docs, "doc_id", "lang", rates, default_rate=0.5)
    langs = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    total = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert langs.get("en") == total["en"]  # rate 1.0 keeps everything
    assert "zh" not in langs  # rate 0.0 drops everything
    for lang in total:
        if lang not in ("en", "zh"):
            assert langs.get(lang, 0) <= total[lang]


def test_split_disjoint_exhaustive(spark, docs):
    split = sampling.train_val_test_split(docs, "doc_id", 0.2, 0.2)
    counts = {r.split: r.n for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) <= {"train", "val", "test"}
    # membership is keyed on id: re-derivation gives identical assignment
    a = {r.doc_id: r.split for r in split.select("doc_id", "split").collect()}
    b = {
        r.doc_id: r.split
        for r in sampling.train_val_test_split(docs.repartition(5), "doc_id", 0.2, 0.2)
        .select("doc_id", "split")
        .collect()
    }
    assert a == b


def test_split_no_shuffle_plan(spark, docs):
    """The sample/split must stay a narrow filter/project over the scan."""
    plan = (
        sampling.deterministic_sample(docs, "doc_id", 0.1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_invalid_args(spark, docs):
    with pytest.raises(ValueError):
        sampling.deterministic_sample(docs, "doc_id", 1.5)
    with pytest.raises(ValueError):
        sampling.train_val_test_split(docs, "doc_id", 0.6, 0.5)
    with pytest.raises(ValueError):
        sampling.stratified_sample(docs, "doc_id", "lang", {"en": 2.0})
