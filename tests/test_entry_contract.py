"""Replicates the driver's t2 correctness gate locally: for every
queries() entry with an oracle, run the Spark query AND the DuckDB
oracle at the test scale factor and compare row count + schema (column
names) + order-insensitive values (columns sorted by name, floats at
FULL precision — shortest round-trip repr).

The float compare is exact on purpose: the driver hashes exact values,
and r8 proved a lenient compare is worthless as a pre-gate — the old
6-significant-digit normalization collapsed 461871.08 and 461871.09 to
the same string, so the local sim could never have caught the
selfjoin_agg_cobucketed cent-level driver miss.  Queries whose float
outputs are legitimately accumulation-order-sensitive must round/cast
INSIDE the query contract (both sides), not lean on the comparator.

If this file is green, CORRECTNESS_r{N}.json should be green.
"""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

from tests.conftest import SF_DIR

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return repr(float(v))
    except Exception:
        pass
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


ALL = sorted(entry_mod.queries().keys())
WITH_ORACLE = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, name):
    qfn = entry_mod.queries()[name]
    df = qfn(spark, SF_DIR)
    spark_cols = [f.name for f in df.schema.fields]
    spark_rows = [tuple(r) for r in df.collect()]

    con = duck_con()
    res = con.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ns, nd = normalize(spark_rows, spark_cols), normalize(duck_rows, duck_cols)
    if ns != nd:
        diff = [(a, b) for a, b in zip(ns, nd) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_no_oracle_outputs_hugeint():
    """DuckDB sum(BIGINT) returns HUGEINT — a type with NO Arrow
    equivalent, which DuckDB exports to Arrow/pandas as float64.  A
    driver that fetches oracle results through Arrow then hashes
    `1524.0` against Spark's long `1524` and misses — the r8
    pipeline_end_to_end red row, invisible locally because fetchall()
    maps hugeint to exact Python int.  Contract: every integer output
    column must be CAST to BIGINT in the oracle SQL."""
    con = duck_con()
    offenders = {}
    for name, sql in entry_mod.oracle_sql().items():
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception:
            # DESCRIBE chokes on some recursive-CTE shapes; bind via
            # LIMIT 0 execution instead.
            rows = []
            res = con.execute(f"SELECT * FROM ({sql}) _q LIMIT 0")
            arr = res.arrow()
            for f in arr.schema:
                rows.append((f.name, str(f.type)))
        bad = [r[0] for r in rows if "HUGEINT" in str(r[1]).upper()]
        if bad:
            offenders[name] = bad
    assert offenders == {}, f"hugeint (Arrow-lossy) oracle outputs: {offenders}"


def test_every_query_has_an_oracle():
    """Since r5 every queries() entry carries a DuckDB oracle (the last
    rows-only holdout, multimodal_features, gained one) — keep it that
    way: a new entry without an oracle is invisible to the driver's
    correctness gate."""
    assert [n for n in ALL if n not in WITH_ORACLE] == []


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_accelerated_queries_actually_use_indexes(spark):
    """The index queries must not silently fall back to raw scans."""
    from hyperspace_spark.workload import workspace

    ws = workspace(spark, SF_DIR)
    checks = {
        "covering_filter_point": "w_o_cov",
        "covering_filter_agg": "w_o_z",
        "join_cobucketed": "w_li_join",
        "zorder_filter_2d": "w_li_z",
        "hybrid_scan_append": "w_oapp_cov",
        "hybrid_join_append": "w_oapp_join",
        "delta_filter_index": "w_delta_cov",
        "iceberg_filter_index": "w_iceberg_cov",
    }
    for qname, idx in checks.items():
        df = entry_mod.queries()[qname](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert idx in plan, f"{qname} did not use {idx}:\n{plan[:2000]}"
