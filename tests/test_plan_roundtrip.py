"""Parse->replay round-trip: the replayed DataFrame must equal the original.

This is the foundation the rewrite rules stand on: if replay changes
semantics with NO index involved, everything above is unsound.
"""

import pytest
from pyspark.sql import functions as F

from hyperspace_spark.planner import ir
from hyperspace_spark.planner.parser import parse_df
from hyperspace_spark.planner.replay import replay

from tests.conftest import rows_equal, table


def roundtrip(spark, df):
    node = parse_df(df)
    out = replay(spark, node)
    assert rows_equal(df, out), f"round-trip mismatch:\nplan={node}"
    return node


def test_project_filter(spark):
    df = (
        table(spark, "orders")
        .filter(F.col("o_custkey") == 421)
        .select("o_orderkey", "o_totalprice")
    )
    node = roundtrip(spark, df)
    assert isinstance(node, ir.ProjectN)
    assert isinstance(node.child, ir.FilterN)
    assert isinstance(node.child.child, ir.Scan)


def test_filter_only(spark):
    df = table(spark, "region").filter("r_regionkey < 3")
    roundtrip(spark, df)


def test_aggregate(spark):
    df = (
        table(spark, "lineitem")
        .filter(F.col("l_quantity") > 10)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.count("*").alias("cnt"),
        )
    )
    roundtrip(spark, df)


def test_grouping_sets_rollup_cube(spark):
    """ROLLUP / CUBE / GROUPING SETS parse to GroupingSetsN (r11) —
    recovered from the Expand's gid bit patterns — and replay as
    explicit GROUPING SETS SQL, grouping() projections included."""
    li = table(spark, "lineitem")
    li.createOrReplaceTempView("li_gs")
    for sql, nsets in [
        (
            "SELECT l_returnflag, l_linestatus, grouping(l_linestatus) g,"
            " sum(l_quantity) s, count(*) n FROM li_gs"
            " GROUP BY ROLLUP(l_returnflag, l_linestatus)",
            3,
        ),
        (
            "SELECT l_returnflag, l_linestatus, avg(l_extendedprice) a"
            " FROM li_gs GROUP BY CUBE(l_returnflag, l_linestatus)",
            4,
        ),
        (
            "SELECT l_returnflag, l_linestatus, sum(l_discount) d FROM li_gs"
            " GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())",
            3,
        ),
    ]:
        node = roundtrip(spark, spark.sql(sql))
        assert isinstance(node, ir.GroupingSetsN), sql
        assert len(node.grouping_sets) == nsets, (sql, node.grouping_sets)
    # computed grouping key: the optimizer pre-computes it in a child
    # Project, so the Expand still sees a plain (oddly named) attribute
    # — modeled, with backtick-quoted grouping names in the replay SQL
    q = spark.sql(
        "SELECT round(l_quantity) rq, sum(l_discount) d FROM li_gs"
        " GROUP BY ROLLUP(round(l_quantity))"
    )
    roundtrip(spark, q)


def test_semi_join_qualified_band_residual(spark):
    """EXISTS with a same-column band condition decorrelates to a
    left-semi self-join whose residual compares o_totalprice across
    BOTH sides — unreplayable by bare name.  r11: the residual renders
    with the replay's side aliases (__hs_l/__hs_r) attributed by
    exprId, so the query parses and replays instead of bailing the
    whole plan (semi output is left-only, so no name collides)."""
    o = table(spark, "orders")
    o.createOrReplaceTempView("orders_band")
    q = spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders_band a
        WHERE o_totalprice > 1000 AND EXISTS (
          SELECT 1 FROM orders_band b
          WHERE a.o_custkey = b.o_custkey
            AND b.o_totalprice > a.o_totalprice * 2
        )
        """
    )
    node = roundtrip(spark, q)
    joins = []
    def walk(n):
        if isinstance(n, ir.JoinN):
            joins.append(n)
        for c in ir.children(n):
            walk(c)
    walk(node)
    semi = [j for j in joins if j.join_type == "left_semi"]
    assert semi, "EXISTS did not decorrelate to a modeled semi join"
    assert semi[0].residual_sql and "__hs_" in semi[0].residual_sql, semi[0].residual_sql


def test_join_above_grouping_sets(spark):
    """A join whose LEFT side is a rollup (GroupingSetsN) — the join
    parse resolves the rollup's output NAMES (r11: _names handles
    GroupingSetsN; an empty name set would weaken the ambiguity guard
    and could mis-replay a shared-name residual)."""
    li = table(spark, "lineitem")
    li.createOrReplaceTempView("li_gs_join")
    agg = spark.sql(
        "SELECT l_returnflag, l_linestatus, sum(l_quantity) q FROM li_gs_join"
        " GROUP BY ROLLUP(l_returnflag, l_linestatus)"
    )
    dim = li.select("l_returnflag").distinct()
    node = roundtrip(spark, agg.join(dim, "l_returnflag"))
    kinds = set()
    def walk(n):
        kinds.add(type(n).__name__)
        for c in ir.children(n):
            walk(c)
    walk(node)
    assert "JoinN" in kinds, kinds
    # the name-resolution unit itself (Catalyst may restructure the e2e
    # plan above, so pin the helper directly): a join side that IS a
    # grouping-sets node must expose its output names to the ambiguity
    # guard — an empty list would weaken it
    from hyperspace_spark.planner.parser import _names

    gs = ir.GroupingSetsN(
        child=None, grouping_sets=[["a"], []], aggs=["a", "sum(b) AS s"],
        output=["a", "s"],
    )
    assert _names(gs) == ["a", "s"]


def test_global_aggregate_no_grouping(spark):
    df = table(spark, "lineitem").agg(F.sum("l_quantity").alias("total"))
    roundtrip(spark, df)


def test_sort_limit(spark):
    df = table(spark, "orders").orderBy(F.col("o_totalprice").desc()).limit(10)
    roundtrip(spark, df)


def test_join_equi(spark):
    li = table(spark, "lineitem").select("l_orderkey", "l_quantity")
    o = table(spark, "orders").select("o_orderkey", "o_custkey")
    df = li.join(o, li.l_orderkey == o.o_orderkey).filter("o_custkey < 100")
    roundtrip(spark, df)


def test_join_agg_sort(spark):
    li = table(spark, "lineitem")
    o = table(spark, "orders")
    df = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("o_orderpriority")
    )
    roundtrip(spark, df)


def test_in_and_between_predicates(spark):
    df = table(spark, "part").filter(
        "p_size IN (5, 10, 15) AND p_retailprice BETWEEN 100 AND 1500"
    ).select("p_partkey", "p_size")
    roundtrip(spark, df)


def test_timestamp_predicate(spark):
    df = table(spark, "lineitem").filter(
        F.col("l_shipdate") < "1996-01-01"
    ).select("l_orderkey", "l_shipdate")
    roundtrip(spark, df)


def test_window(spark):
    from pyspark.sql import Window as W

    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    df = (
        table(spark, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn <= 2")
        .select("o_custkey", "o_orderkey", "rn")
    )
    roundtrip(spark, df)


def test_distinct(spark):
    df = table(spark, "orders").select("o_orderpriority").distinct()
    roundtrip(spark, df)


def test_sql_entrypoint(spark):
    table(spark, "lineitem").createOrReplaceTempView("t_lineitem")
    df = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               sum(l_extendedprice * (1 - l_discount)) AS revenue
        FROM t_lineitem WHERE l_shipdate <= timestamp '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    roundtrip(spark, df)


def test_unsupported_plan_raises(spark):
    from hyperspace_spark.planner.parser import UnsupportedPlan

    df = spark.range(10)  # Range leaf is not a file relation
    with pytest.raises(UnsupportedPlan):
        parse_df(df)


def test_union_all(spark):
    a = table(spark, "orders").filter("o_custkey < 50").select("o_orderkey", "o_custkey")
    b = table(spark, "orders").filter("o_custkey > 1000").select("o_orderkey", "o_custkey")
    roundtrip(spark, a.union(b))


def test_union_under_agg(spark):
    a = table(spark, "orders").filter("o_custkey < 50").select("o_custkey", "o_totalprice")
    b = table(spark, "orders").filter("o_custkey > 1000").select("o_custkey", "o_totalprice")
    df = a.union(b).groupBy("o_custkey").agg(F.sum("o_totalprice").alias("s"))
    roundtrip(spark, df)


def test_opaque_subtree_roundtrip(spark):
    """r7: a subtree the parser cannot model degrades to an OpaqueN leaf
    replayed verbatim — the query round-trips instead of raising, and
    scans OUTSIDE the opaque corner stay visible to the rules.  r12
    note: the original example (a plain-attribute Project over a
    colliding self-join) now FUSES and parses fully, so this pins the
    still-opaque case — a projected expression OUTSIDE the bounded
    fusion grammar (greatest(), chosen because a.p_partkey = b.p_partkey
    makes it semantically the key itself)."""
    li = table(spark, "lineitem")
    pa = table(spark, "part")
    li.createOrReplaceTempView("rt_lineitem")
    pa.createOrReplaceTempView("rt_part")
    df = spark.sql(
        """
        SELECT l_orderkey, l_extendedprice
        FROM rt_lineitem
        WHERE l_partkey IN (SELECT greatest(a.p_partkey, b.p_partkey)
                            FROM rt_part a JOIN rt_part b
                            ON a.p_partkey = b.p_partkey AND a.p_size < b.p_size)
          AND l_quantity > 30
        """
    )
    node = roundtrip(spark, df)
    kinds = {type(n).__name__ for n in _walk(node)}
    assert "OpaqueN" in kinds, kinds
    # the lineitem scan is still a visible, rewritable Scan
    assert any(
        isinstance(n, ir.Scan) and any("lineitem" in p for p in n.root_paths)
        for n in _walk(node)
    )


def test_project_over_colliding_join_fuses(spark):
    """r12: the q95 ws_wh CTE shape — a Project aliasing SAME-NAMED
    columns from both sides of an inner self-join — fuses into the
    JoinN as a side-qualified SELECT list instead of going opaque, so
    the scans underneath stay visible to index rules."""
    pa = table(spark, "part")
    pa.createOrReplaceTempView("rtf_part")
    df = spark.sql(
        """
        SELECT l_orderkey, l_extendedprice
        FROM rt_lineitem
        WHERE l_partkey IN (SELECT a.p_partkey FROM rtf_part a JOIN rtf_part b
                            ON a.p_partkey = b.p_partkey AND a.p_size < b.p_size)
          AND l_quantity > 30
        """
    )
    node = roundtrip(spark, df)
    kinds = {type(n).__name__ for n in _walk(node)}
    assert "OpaqueN" not in kinds, kinds
    fused = [
        n
        for n in _walk(node)
        if isinstance(n, ir.JoinN) and n.select_exprs is not None
    ]
    assert fused and all("__hs_" in e for f in fused for e in f.select_exprs)
    # every scan visible (two part sides + lineitem)
    assert sum(isinstance(n, ir.Scan) for n in _walk(node)) == 3


def test_in_subquery_selfjoin_now_fully_modeled(spark):
    """r7 follow-up: the nested IN-subquery self-join that used to be
    the opaque example now parses fully — exprId key attribution
    (parser._equi_pair_by_exprid) resolves the shared-name semi-join
    keys, so every scan is visible to the rules."""
    li = table(spark, "lineitem")
    pa = table(spark, "part")
    li.createOrReplaceTempView("rt2_lineitem")
    pa.createOrReplaceTempView("rt2_part")
    df = spark.sql(
        """
        SELECT l_orderkey, l_extendedprice
        FROM rt2_lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM rt2_part WHERE p_size IN
                            (SELECT p_size FROM rt2_part WHERE p_type LIKE 'SMALL%'))
          AND l_quantity > 30
        """
    )
    node = roundtrip(spark, df)
    kinds = {type(n).__name__ for n in _walk(node)}
    assert "OpaqueN" not in kinds, kinds


def _walk(node):
    yield node
    for c in ir.children(node):
        yield from _walk(c)
