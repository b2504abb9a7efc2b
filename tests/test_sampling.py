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


def test_shard_assign_balance_and_determinism(spark, docs):
    """shard_assign: sizes balance to +-1, the assignment is a pure
    function of (seed, key) across runs, and order_col enumerates each
    shard 0..n_i-1 (the training read order)."""
    out = sampling.shard_assign(docs, "doc_id", 8, order_col="pos")
    sizes = {r["shard"]: r["count"] for r in out.groupBy("shard").count().collect()}
    assert set(sizes) == set(range(8))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # deterministic across independent executions
    a = sorted((r["doc_id"], r["shard"], r["pos"]) for r in
               sampling.shard_assign(docs, "doc_id", 8, order_col="pos").select("doc_id", "shard", "pos").collect())
    b = sorted((r["doc_id"], r["shard"], r["pos"]) for r in
               out.select("doc_id", "shard", "pos").collect())
    assert a == b
    # per-shard positions are exactly 0..n-1
    import collections
    pos = collections.defaultdict(list)
    for _, s, p in a:
        pos[s].append(p)
    for s, ps in pos.items():
        assert sorted(ps) == list(range(len(ps)))
    # a different seed produces a different permutation
    c = sorted((r["doc_id"], r["shard"]) for r in
               sampling.shard_assign(docs, "doc_id", 8, seed="v2").select("doc_id", "shard").collect())
    assert [x[1] for x in a] != [x[1] for x in c]


def test_shard_assign_matches_global_rank_oracle(spark, docs):
    """The distributed rank equals the naive global row_number order."""
    from pyspark.sql import Window, functions as F

    out = sampling.shard_assign(docs, "doc_id", 5)
    naive = docs.withColumn("_h", F.md5(F.col("doc_id").cast("string"))).withColumn(
        "_shard",
        ((F.row_number().over(Window.orderBy("_h", "doc_id")) - 1) % 5).cast("int"),
    )
    got = {r["doc_id"]: r["shard"] for r in out.select("doc_id", "shard").collect()}
    want = {r["doc_id"]: r["_shard"] for r in naive.select("doc_id", "_shard").collect()}
    assert got == want


def test_write_training_shards_ordered(spark, docs, tmp_path):
    """write_training_shards: one directory per shard, rows inside each
    shard stored in the deterministic shuffle order."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "shards")
    sampling.write_training_shards(docs, path, "doc_id", 4)
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    assert {r.shard for r in back.select("shard").distinct().collect()} == {0, 1, 2, 3}
    # physical order within a shard's files == the assignment's order_col
    want = {
        r["doc_id"]: r["pos"]
        for r in sampling.shard_assign(docs, "doc_id", 4, order_col="pos").collect()
    }
    for k in range(4):
        got_ids = [
            r.doc_id
            for r in spark.read.parquet(f"{path}/shard={k}").collect()
        ]
        assert got_ids == sorted(got_ids, key=lambda d: want[d]), f"shard {k} out of order"
