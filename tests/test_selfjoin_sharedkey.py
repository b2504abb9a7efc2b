"""Self-joins whose equi key carries the SAME name on both sides (r7):
name-based attribution cannot resolve them, so the parser falls back to
exprId resolution on the raw Catalyst conjunct
(parser._equi_pair_by_exprid) and the replay drops the value-equal
right key copy — the reference resolves these natively by exprId
(JoinIndexRule.scala:179-317).  TPC-DS q65 is the canonical shape; the
plan-stability harness runs its official text, these tests pin the
mechanics and the guard rails."""

import pytest
from pyspark.sql import functions as F

from hyperspace_spark import CoveringIndexConfig, Hyperspace
from tests.conftest import rows_equal, table


@pytest.fixture(scope="module")
def hs(spark, tmp_path_factory):
    hs = Hyperspace(spark, system_path=str(tmp_path_factory.mktemp("hsidx_self")))
    li = table(spark, "lineitem")
    hs.create_index(
        li,
        CoveringIndexConfig(
            "li_self", ["l_orderkey"], ["l_quantity", "l_extendedprice"]
        ),
    )
    return hs


def test_self_join_same_key_name_accelerates(spark, hs):
    """Two aggregates of the SAME indexed fact joined on the identically
    named group key (the q65 skeleton): index applied to BOTH derived
    sides, results equal, visible columns unchanged."""
    li = table(spark, "lineitem")
    li.createOrReplaceTempView("li_v")
    q = spark.sql(
        """
        SELECT a.l_orderkey, a.qty, b.avg_qty
        FROM (SELECT l_orderkey, sum(l_quantity) AS qty
              FROM li_v GROUP BY l_orderkey) a,
             (SELECT l_orderkey, avg(l_quantity) AS avg_qty
              FROM li_v GROUP BY l_orderkey) b
        WHERE a.l_orderkey = b.l_orderkey AND a.qty > b.avg_qty
        """
    )
    fast, used = hs._apply_with_info(q)
    assert used == ["li_self", "li_self"], hs.why_not(q)
    assert fast.columns == q.columns
    assert q.count() > 0  # 0 == 0 would prove nothing
    assert rows_equal(q, fast)


def test_self_join_star_select_schema_guarded(spark, hs):
    """SELECT * over the shared-name join exposes l_orderkey TWICE in
    the original schema; the dedup'd replay would show it once, so the
    post-replay schema guard must refuse the rewrite (safe fallback),
    never ship a frame with different columns."""
    li = table(spark, "lineitem")
    li.createOrReplaceTempView("li_v2")
    q = spark.sql(
        """
        SELECT * FROM
          (SELECT l_orderkey, sum(l_quantity) AS qty
           FROM li_v2 GROUP BY l_orderkey) a
        JOIN
          (SELECT l_orderkey, avg(l_quantity) AS avg_qty
           FROM li_v2 GROUP BY l_orderkey) b
        ON a.l_orderkey = b.l_orderkey
        """
    )
    fast, used = hs._apply_with_info(q)
    # Either the planner fell back entirely (used == []) or it shipped a
    # frame with the IDENTICAL duplicate-name schema; it must never
    # silently drop the second l_orderkey.
    assert fast.columns == q.columns
    if used:
        assert rows_equal(q, fast)


def test_self_left_outer_shared_key_falls_back(spark, hs):
    """For a LEFT OUTER join the right key copy is NULL on unmatched
    rows — NOT value-equal — so the shared-name dedup must not apply;
    the parser bails (join:shared-name-key-non-inner) and apply() falls
    back cleanly with equal results."""
    li = table(spark, "lineitem")
    a = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("qty"))
    b = (
        li.where(F.col("l_quantity") > 45)
        .groupBy("l_orderkey")
        .agg(F.avg("l_quantity").alias("avg_qty"))
    )
    q = a.join(b, a.l_orderkey == b.l_orderkey, "left_outer")
    fast, used = hs._apply_with_info(q)
    assert fast.columns == q.columns
    assert rows_equal(q, fast)


def test_self_semi_join_shared_key_accelerates(spark, hs):
    """LEFT SEMI never exposes right columns, so exprId resolution alone
    suffices — no dedup needed, and the semi output is the left side."""
    li = table(spark, "lineitem")
    li.createOrReplaceTempView("li_v3")
    q = spark.sql(
        """
        SELECT l_orderkey, sum(l_quantity) AS qty
        FROM li_v3 GROUP BY l_orderkey
        HAVING l_orderkey IN (
          SELECT l_orderkey FROM li_v3 WHERE l_quantity > 48
        )
        """
    )
    fast, used = hs._apply_with_info(q)
    assert fast.columns == q.columns
    assert q.count() > 0
    assert rows_equal(q, fast)
