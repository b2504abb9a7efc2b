"""Case-insensitive column resolution (spark.sql.caseSensitive=false, the
default).  Reference: util/ResolverUtils.scala:114-234 — a query written
as O_CUSTKEY must still hit an index built over o_custkey."""

import pytest
from pyspark.sql import functions as F

from hyperspace_spark import CoveringIndexConfig, Hyperspace

from tests.conftest import rows_equal, table


@pytest.fixture(scope="module")
def hs(spark, tmp_path_factory):
    hs = Hyperspace(spark, system_path=str(tmp_path_factory.mktemp("hsidx_ci")))
    hs.create_index(
        table(spark, "orders"),
        CoveringIndexConfig("ci_cov", ["o_custkey"], ["o_orderkey", "o_totalprice"]),
    )
    return hs


def test_mixed_case_filter_query_uses_index(spark, hs):
    o = table(spark, "orders")
    q = o.filter("O_CUSTKEY = 14").select("O_ORDERKEY", "o_totalprice")
    fast, used = hs._apply_with_info(q)
    assert used == ["ci_cov"], hs.why_not(q)
    assert rows_equal(q, fast)
    # User-facing output names keep the user's spelling.
    assert fast.columns == ["O_ORDERKEY", "o_totalprice"]


def test_mixed_case_config_resolves_to_schema_case(spark, tmp_path):
    hs2 = Hyperspace(spark, system_path=str(tmp_path / "idx"))
    hs2.create_index(
        table(spark, "orders"),
        CoveringIndexConfig("ci_cfg", ["O_CustKey"], ["O_ORDERKEY"]),
    )
    entry = next(e for e in hs2._active_entries(hs2.conf()) if e.name == "ci_cfg")
    assert entry.derived_properties["indexedColumns"] == ["o_custkey"]
    q = table(spark, "orders").filter(F.col("o_custkey") == 14).select("o_orderkey")
    fast, used = hs2._apply_with_info(q)
    assert used == ["ci_cfg"], hs2.why_not(q)
    assert rows_equal(q, fast)


def test_case_sensitive_mode_requires_exact(spark, tmp_path):
    spark.conf.set("spark.sql.caseSensitive", "true")
    try:
        hs3 = Hyperspace(spark, system_path=str(tmp_path / "idx"))
        from hyperspace_spark.hyperspace import HyperspaceException

        with pytest.raises(HyperspaceException):
            hs3.create_index(
                table(spark, "orders"),
                CoveringIndexConfig("ci_strict", ["O_CUSTKEY"], ["o_orderkey"]),
            )
    finally:
        spark.conf.set("spark.sql.caseSensitive", "false")
