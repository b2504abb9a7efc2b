"""Join rule: equi-join over co-bucketed covering indexes runs without
a shuffle (reference: JoinIndexRule, E2E join tests).

Plan assertion mirrors the reference's physical-operator checks: the
accelerated SMJ must contain no Exchange (shuffle) operator.
"""

import pytest
from pyspark.sql import functions as F

from hyperspace_spark import CoveringIndexConfig, Hyperspace

from tests.conftest import rows_equal, table


@pytest.fixture(scope="module")
def hs(spark, tmp_path_factory):
    hs = Hyperspace(spark, system_path=str(tmp_path_factory.mktemp("hsidx_join")))
    li = table(spark, "lineitem")
    o = table(spark, "orders")
    hs.create_index(
        li, CoveringIndexConfig("li_ok", ["l_orderkey"], ["l_quantity", "l_extendedprice"])
    )
    hs.create_index(
        o, CoveringIndexConfig("o_ok", ["o_orderkey"], ["o_custkey", "o_orderpriority"])
    )
    return hs


def physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_join_no_shuffle_and_equal(spark, hs):
    # Disable auto-broadcast: at test scale Spark would broadcast the tiny
    # side; at 100 TB both sides are large and the SMJ-without-Exchange
    # plan is the one that matters.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = table(spark, "lineitem").select("l_orderkey", "l_quantity")
        o = table(spark, "orders").select("o_orderkey", "o_custkey")
        q = li.join(o, li.l_orderkey == o.o_orderkey)
        fast, used = hs._apply_with_info(q)
        assert sorted(used) == ["li_ok", "o_ok"], hs.why_not(q)
        fast.collect()  # AQE finalizes the plan on execution
        plan = physical(fast)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert rows_equal(q, fast)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_join_with_agg_above(spark, hs):
    li = table(spark, "lineitem")
    o = table(spark, "orders")
    q = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum(F.col("l_extendedprice")).alias("rev"))
    )
    fast, used = hs._apply_with_info(q)
    assert sorted(used) == ["li_ok", "o_ok"], hs.why_not(q)
    # The only remaining exchange should be for the aggregation, not the join.
    plan = physical(fast)
    assert plan.count("Exchange") <= 2
    assert rows_equal(q, fast)


def test_join_missing_column_no_pair(spark, hs):
    """l_shipdate is not covered -> the JOIN pair must not form (no
    shuffle-free SMJ).  The o-side may still get a single-side filter
    rewrite (Catalyst's inferred isnotnull(o_orderkey) matches the
    FilterIndexRule) — that is reference behavior, and results stay equal."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = table(spark, "lineitem").select("l_orderkey", "l_shipdate")
        o = table(spark, "orders").select("o_orderkey", "o_custkey")
        q = li.join(o, li.l_orderkey == o.o_orderkey)
        fast, used = hs._apply_with_info(q)
        assert "li_ok" not in used
        assert "MISSING_REQUIRED_COL" in hs.why_not(q)
        fast.collect()
        assert "Exchange" in physical(fast)  # join rule did NOT fire
        assert rows_equal(q, fast)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_outer_join_no_pair(spark, hs):
    """Outer joins are outside the join rule's scope (reference: inner
    SMJ only); single-side filter rewrites may still apply safely."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = table(spark, "lineitem").select("l_orderkey", "l_quantity")
        o = table(spark, "orders").select("o_orderkey", "o_custkey")
        q = li.join(o, li.l_orderkey == o.o_orderkey, "left_outer")
        fast, used = hs._apply_with_info(q)
        fast.collect()
        assert "Exchange" in physical(fast)  # no shuffle-free pair for outer
        assert rows_equal(q, fast)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_semi_join_with_band_residual_accelerates(spark, tmp_path_factory):
    """r11: LEFT SEMI joins with a residual conjunct ride the
    co-bucketed pair — the decorrelated-EXISTS band shape ('a customer
    order dwarfed by another of the same customer's orders').  The
    rewrite substitutes only the scans, so the semi semantics and the
    qualified residual replay unchanged; both sides read the SAME
    bucketed index and the semi SMJ runs Exchange-free."""
    root = str(tmp_path_factory.mktemp("hs_semi"))
    src = f"{root}/orders"
    table(spark, "orders").repartition(4).write.parquet(src)
    o = spark.read.parquet(src)
    hs = Hyperspace(spark, system_path=f"{root}/idx")
    hs.create_index(
        o,
        CoveringIndexConfig(
            "semi_cov", ["o_custkey"], ["o_orderkey", "o_totalprice"], num_buckets=8
        ),
    )
    o.createOrReplaceTempView("orders_semi")
    q = spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders_semi a
        WHERE EXISTS (
          SELECT 1 FROM orders_semi b
          WHERE a.o_custkey = b.o_custkey
            AND b.o_totalprice > a.o_totalprice * 2
        )
        """
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fast, used = hs._apply_with_info(q)
        assert used == ["semi_cov", "semi_cov"], hs.why_not(q)  # both sides
        fast.collect()
        plan = physical(fast).split("== Initial Plan ==")[0]
        assert "SortMergeJoin LeftSemi" in plan or "LeftSemi" in plan, plan
        assert "Exchange" not in plan, plan
        assert rows_equal(q, fast)
        assert q.count() > 0  # a 0 == 0 comparison proves nothing
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_join_with_appended_files_hybrid_union(spark, hs, tmp_path_factory):
    """Appended source files no longer disable the join rule: the index
    side becomes index ∪ direct-scan(appends) (U5 equivalent of the
    reference's BucketUnion) and results stay equal to the raw join."""
    import shutil

    root = str(tmp_path_factory.mktemp("hybrid_join"))
    osrc = f"{root}/orders"
    o0 = table(spark, "orders")
    o0.repartition(2).write.mode("overwrite").parquet(osrc)
    hj = Hyperspace(spark, system_path=f"{root}/idx")
    hj.create_index(
        spark.read.parquet(osrc),
        CoveringIndexConfig("o_hj", ["o_orderkey"], ["o_orderpriority"]),
    )
    li = table(spark, "lineitem")
    hj.create_index(
        li, CoveringIndexConfig("li_hj", ["l_orderkey"], ["l_extendedprice"])
    )
    # Append AFTER the build: ~1% of rows as a new file.
    o0.filter("o_orderkey % 97 = 0").coalesce(1).write.mode("append").parquet(osrc)

    o = spark.read.parquet(osrc)
    q = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("cnt"))
    )
    fast, used = hj._apply_with_info(q)
    assert sorted(used) == ["li_hj", "o_hj"], hj.why_not(q)
    # Evidence the appended file is read directly alongside the index.
    files = fast.inputFiles()
    assert any("/idx/" in f or "o_hj" in f for f in files), files
    assert any(f.startswith("file:" + osrc) or osrc in f for f in files), files
    assert rows_equal(q, fast)


def test_one_sided_index_tags_no_avail_pair(spark, tmp_path_factory):
    """Only one join side has an eligible index -> whyNot must surface
    NO_AVAIL_JOIN_INDEX_PAIR on it (reference FilterReason catalog)."""
    hs1 = Hyperspace(spark, system_path=str(tmp_path_factory.mktemp("hsidx_1side")))
    li = table(spark, "lineitem")
    hs1.create_index(
        li, CoveringIndexConfig("li_only", ["l_orderkey"], ["l_quantity"])
    )
    o = table(spark, "orders").select("o_orderkey", "o_custkey")
    q = (
        table(spark, "lineitem")
        .select("l_orderkey", "l_quantity")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    # The scan-replacement rule may still apply li_only to the bare scan;
    # the point here is the JOIN rule's explanation for the missing pair.
    assert "NO_AVAIL_JOIN_INDEX_PAIR" in hs1.why_not(q)


def test_join_mixed_case_condition_accelerates(spark, hs):
    """Catalyst keeps the user's spelling in the join condition (the scan
    reports schema case), so `ON L_ORDERKEY = O_ORDERKEY` must still
    resolve the equi pair — before the parser's case-insensitive side
    resolution, mixed-case joins silently never accelerated."""
    table(spark, "lineitem").select("l_orderkey", "l_quantity").createOrReplaceTempView(
        "jli_mc"
    )
    table(spark, "orders").select("o_orderkey", "o_custkey").createOrReplaceTempView(
        "jo_mc"
    )
    q = spark.sql(
        "SELECT L_ORDERKEY, l_quantity, o_custkey FROM jli_mc "
        "JOIN jo_mc ON L_ORDERKEY = O_ORDERKEY"
    )
    fast, used = hs._apply_with_info(q)
    assert sorted(used) == ["li_ok", "o_ok"], hs.why_not(q)
    assert rows_equal(q, fast)


def test_join_no_shuffle_after_incremental_refresh(spark, tmp_path_factory):
    """Append-only incremental refresh leaves MULTIPLE files per bucket
    (delta files next to linked originals); the co-bucketed SMJ must stay
    Exchange-free — Spark groups bucket files by the bucket id in the
    file name, multi-file buckets included."""
    base = tmp_path_factory.mktemp("join_inc")
    li_d, o_d = str(base / "li"), str(base / "o")
    table(spark, "lineitem").repartition(4).write.parquet(li_d)
    table(spark, "orders").repartition(4).write.parquet(o_d)
    hs = Hyperspace(spark, system_path=str(base / "idx"))
    hs.create_index(
        spark.read.parquet(li_d),
        CoveringIndexConfig("li_inc", ["l_orderkey"], ["l_quantity"], num_buckets=8),
    )
    hs.create_index(
        spark.read.parquet(o_d),
        CoveringIndexConfig("o_inc", ["o_orderkey"], ["o_custkey"], num_buckets=8),
    )
    # append to BOTH sides, refresh incrementally -> fragmented buckets
    table(spark, "lineitem").limit(300).coalesce(1).write.mode("append").parquet(li_d)
    table(spark, "orders").limit(100).coalesce(1).write.mode("append").parquet(o_d)
    hs.refresh_index("li_inc", "incremental")
    hs.refresh_index("o_inc", "incremental")
    e = hs._log_mgr("li_inc", hs.conf()).get_latest_stable_log()
    assert len(e.content_files) > 8  # multi-file buckets, not a rewrite

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.read.parquet(li_d).select("l_orderkey", "l_quantity")
        o = spark.read.parquet(o_d).select("o_orderkey", "o_custkey")
        q = li.join(o, li.l_orderkey == o.o_orderkey)
        fast, used = hs._apply_with_info(q)
        assert sorted(used) == ["li_inc", "o_inc"], hs.why_not(q)
        fast.collect()
        plan = physical(fast)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert rows_equal(q, fast)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


@pytest.fixture(scope="module")
def band_hs(spark, tmp_path_factory):
    """Orders parquet + covering index bucketed on o_custkey, shared by
    the band-EXISTS rewrite tests."""
    root = str(tmp_path_factory.mktemp("hs_band"))
    src = f"{root}/orders"
    table(spark, "orders").repartition(4).write.parquet(src)
    o = spark.read.parquet(src)
    hs = Hyperspace(spark, system_path=f"{root}/idx")
    hs.create_index(
        o,
        CoveringIndexConfig(
            "band_cov", ["o_custkey"], ["o_orderkey", "o_totalprice"], num_buckets=8
        ),
    )
    o.createOrReplaceTempView("orders_band")
    return hs


def _band_sql(spark, sql):
    return spark.sql(sql)


def test_band_exists_rewrites_to_per_key_max(spark, band_hs):
    """r12 BandExistsAggRule: the EXISTS band semi join must serve as a
    per-key MAX aggregate joined once per key — no within-group pair
    scan — and stay Exchange-free on the co-bucketed index."""
    q = _band_sql(
        spark,
        """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders_band a
        WHERE EXISTS (
          SELECT 1 FROM orders_band b
          WHERE a.o_custkey = b.o_custkey
            AND b.o_totalprice > a.o_totalprice * 2
        )
        """,
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fast, used = band_hs._apply_with_info(q)
        assert used == ["band_cov", "band_cov"], band_hs.why_not(q)
        fast.collect()
        plan = physical(fast).split("== Initial Plan ==")[0]
        assert "__hs_band" in plan, plan  # the aggregate shape, not the pair scan
        assert "max(" in plan, plan
        assert "Exchange" not in plan, plan
        assert "LeftSemi" in plan, plan
        assert rows_equal(q, fast)
        assert q.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_band_not_exists_anti_rewrites(spark, band_hs):
    """NOT EXISTS lowers to LEFT ANTI with the same band residual; the
    per-key aggregate equivalence holds negated row-wise (a key-group
    match exists against MAX iff one exists against the raw rows)."""
    q = _band_sql(
        spark,
        """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders_band a
        WHERE NOT EXISTS (
          SELECT 1 FROM orders_band b
          WHERE a.o_custkey = b.o_custkey
            AND b.o_totalprice > a.o_totalprice * 2
        )
        """,
    )
    fast, used = band_hs._apply_with_info(q)
    assert used == ["band_cov", "band_cov"], band_hs.why_not(q)
    fast.collect()
    plan = physical(fast)
    assert "__hs_band" in plan, plan
    assert "LeftAnti" in plan, plan
    assert rows_equal(q, fast)
    assert 0 < fast.count() < table(spark, "orders").count()


def test_band_lt_comparison_uses_min(spark, band_hs):
    """b.x < f(a) band: exists a smaller row  <=>  per-key MIN < f(a).
    Also exercises the flipped spelling (left expr written first)."""
    q = _band_sql(
        spark,
        """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders_band a
        WHERE EXISTS (
          SELECT 1 FROM orders_band b
          WHERE a.o_custkey = b.o_custkey
            AND a.o_totalprice / 2 > b.o_totalprice
        )
        """,
    )
    fast, used = band_hs._apply_with_info(q)
    assert used == ["band_cov", "band_cov"], band_hs.why_not(q)
    fast.collect()
    plan = physical(fast)
    assert "__hs_band" in plan, plan
    assert "min(" in plan, plan
    assert rows_equal(q, fast)
    assert 0 < fast.count()


def test_band_declines_on_conjunct_pair_but_join_still_serves(spark, band_hs):
    """TWO residual comparisons on the probe side are NOT max-
    decomposable (EXISTS(b: P1(b) AND P2(b)) != P1-max AND P2-max);
    the band rule must decline and the r11 plain semi serving takes
    over — correct rows, no __hs_band in the plan."""
    q = _band_sql(
        spark,
        """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders_band a
        WHERE EXISTS (
          SELECT 1 FROM orders_band b
          WHERE a.o_custkey = b.o_custkey
            AND b.o_totalprice > a.o_totalprice * 2
            AND b.o_orderkey < a.o_orderkey
        )
        """,
    )
    fast, used = band_hs._apply_with_info(q)
    assert used == ["band_cov", "band_cov"], band_hs.why_not(q)
    fast.collect()
    plan = physical(fast)
    assert "__hs_band" not in plan, plan
    assert rows_equal(q, fast)


def test_band_neq_exists_rewrites_to_min_max(spark, band_hs):
    """r12 <>-band: EXISTS 'another order of the same customer' (the
    TPC-DS q16/q94 residual shape) serves as a per-key MIN/MAX pair —
    all non-null group values equal a's iff min = max = a's value."""
    q = _band_sql(
        spark,
        """
        SELECT o_orderkey, o_custkey FROM orders_band a
        WHERE EXISTS (
          SELECT 1 FROM orders_band b
          WHERE a.o_custkey = b.o_custkey
            AND b.o_orderkey <> a.o_orderkey
        )
        """,
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fast, used = band_hs._apply_with_info(q)
        assert used == ["band_cov", "band_cov"], band_hs.why_not(q)
        fast.collect()
        plan = physical(fast).split("== Initial Plan ==")[0]
        assert "__hs_band_min" in plan and "__hs_band_max" in plan, plan
        assert "Exchange" not in plan, plan
        assert rows_equal(q, fast)
        assert q.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_band_neq_not_exists_anti(spark, band_hs):
    """NOT EXISTS <>: 'customers with exactly one order keep it' — the
    anti side of the min/max rewrite, negated row-wise."""
    q = _band_sql(
        spark,
        """
        SELECT o_orderkey, o_custkey FROM orders_band a
        WHERE NOT EXISTS (
          SELECT 1 FROM orders_band b
          WHERE a.o_custkey = b.o_custkey
            AND b.o_orderkey <> a.o_orderkey
        )
        """,
    )
    fast, used = band_hs._apply_with_info(q)
    assert used == ["band_cov", "band_cov"], band_hs.why_not(q)
    fast.collect()
    plan = physical(fast)
    assert "__hs_band_min" in plan and "LeftAnti" in plan, plan
    assert rows_equal(q, fast)
    # raw orders: some customers have a single order at this scale; if
    # not, equality on an empty pair still proves nothing — require the
    # two sides agree AND the anti kept strictly fewer rows than all.
    assert fast.count() < table(spark, "orders").count()


def test_fused_colliding_selfjoin_rides_pair_exchange_free(spark, band_hs):
    """r12 fusion + JoinIndexRule: the q95 ws_wh CTE shape — a Project
    aliasing the SAME column from both sides of an inner self-join —
    parses via fusion AND rides the co-bucketed pair: both sides read
    band_cov and the SMJ runs Exchange-free."""
    q = _band_sql(
        spark,
        """
        SELECT a.o_custkey AS ck, a.o_totalprice AS p1, b.o_totalprice AS p2
        FROM orders_band a JOIN orders_band b
          ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
        """,
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fast, used = band_hs._apply_with_info(q)
        assert used == ["band_cov", "band_cov"], band_hs.why_not(q)
        fast.collect()
        plan = physical(fast).split("== Initial Plan ==")[0]
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert rows_equal(q, fast)
        assert q.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


@pytest.fixture(scope="module")
def band_nulls_hs(spark, tmp_path_factory):
    """Handcrafted fixture for the band rewrite's 3VL semantics (r13,
    VERDICT r12 'What's wrong' #1): NULLs in the BAND column (all-NULL
    group k=20, mixed group k=10), in the JOIN KEY (two NULL-key rows —
    never equi-match on either side), and on the PROBE side (a.v NULL —
    the comparison is NULL, no match, in both the raw and rewritten
    plan).  orders/TPC-H can't exercise any of this: its keys and
    o_totalprice are never NULL."""
    from pyspark.sql import types as T

    root = str(tmp_path_factory.mktemp("hs_band_nulls"))
    src = f"{root}/t"
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("k", T.LongType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    rows = [
        # k=10: mixed band column — MAX ignores the NULL
        (1, 10, 10.0),
        (2, 10, None),
        (3, 10, 100.0),
        # k=20: ALL-NULL band group — aggregates to NULL, never matches
        (4, 20, None),
        (5, 20, None),
        # k=30: plain group, one row dwarfed (5 * 2 < 50)
        (6, 30, 5.0),
        (7, 30, 50.0),
        # k=40: single row — <>-EXISTS must reject it
        (8, 40, 7.0),
        # NULL join keys: equi condition is NULL, no match either side
        (9, None, 1.0),
        (10, None, None),
    ]
    spark.createDataFrame(rows, schema).repartition(2).write.parquet(src)
    t = spark.read.parquet(src)
    hs = Hyperspace(spark, system_path=f"{root}/idx")
    hs.create_index(t, CoveringIndexConfig("bn_cov", ["k"], ["id", "v"], num_buckets=4))
    t.createOrReplaceTempView("band_nulls")
    return hs


def _band_nulls_case(spark, band_nulls_hs, sql, want_ids, plan_marker):
    q = spark.sql(sql)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fast, used = band_nulls_hs._apply_with_info(q)
        assert used == ["bn_cov", "bn_cov"], band_nulls_hs.why_not(q)
        got = sorted(r.id for r in fast.collect())
        plan = physical(fast)
        assert plan_marker in plan, plan
        raw = sorted(r.id for r in q.collect())
        assert got == raw == want_ids, (got, raw, want_ids)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_band_semi_null_semantics(spark, band_nulls_hs):
    """EXISTS (b.v > a.v * 2): the all-NULL group (k=20) must NOT match
    (MAX = NULL -> comparison NULL), NULL probe values (a.v NULL) must
    NOT match, NULL keys never equi-match — and the mixed group's MAX
    ignores its NULL.  Expected rows verified BY HAND: id 1 (10*2 <
    100), id 2 excluded (a.v NULL), id 6 (5*2 < 50); ids 4,5 (all-NULL
    group), 7,3 (nothing bigger), 8 (alone), 9,10 (NULL key) excluded."""
    _band_nulls_case(
        spark,
        band_nulls_hs,
        """
        SELECT a.id AS id FROM band_nulls a
        WHERE EXISTS (
          SELECT 1 FROM band_nulls b
          WHERE a.k = b.k AND b.v > a.v * 2
        )
        """,
        [1, 6],
        "__hs_band",
    )


def test_band_anti_null_semantics(spark, band_nulls_hs):
    """NOT EXISTS (b.v > a.v * 2) — the 3VL knife edge: a NULL
    comparison must keep the row (no match found), NOT drop it.  The
    anti result is exactly the complement of the semi test: everything
    except ids 1 and 6, INCLUDING the all-NULL group, NULL probe
    values, and NULL-key rows."""
    _band_nulls_case(
        spark,
        band_nulls_hs,
        """
        SELECT a.id AS id FROM band_nulls a
        WHERE NOT EXISTS (
          SELECT 1 FROM band_nulls b
          WHERE a.k = b.k AND b.v > a.v * 2
        )
        """,
        [2, 3, 4, 5, 7, 8, 9, 10],
        "__hs_band",
    )


def test_band_neq_null_semantics(spark, band_nulls_hs):
    """<>-band over a NULLABLE band column (v): 'another row of the same
    group with a DIFFERENT v'.  NULL v rows never witness (NULL <> x is
    NULL) and are never matched AS probes either; the MIN/MAX pair
    ignores NULLs exactly like the raw rows.  By hand: k=10 has non-NULL
    values {10,100} -> ids 1,3 match (and id 2: v NULL, min<>NULL is
    NULL -> no); k=20 all-NULL -> no; k=30 {5,50} -> ids 6,7; k=40
    single value -> min=max=7, 7<>7 false -> no; NULL keys -> no."""
    _band_nulls_case(
        spark,
        band_nulls_hs,
        """
        SELECT a.id AS id FROM band_nulls a
        WHERE EXISTS (
          SELECT 1 FROM band_nulls b
          WHERE a.k = b.k AND b.v <> a.v
        )
        """,
        [1, 3, 6, 7],
        "__hs_band_min",
    )


def test_band_neq_anti_null_semantics(spark, band_nulls_hs):
    """NOT EXISTS <> over the nullable band column: complement of the
    semi — NULL-v probes and all-NULL groups survive the anti join."""
    _band_nulls_case(
        spark,
        band_nulls_hs,
        """
        SELECT a.id AS id FROM band_nulls a
        WHERE NOT EXISTS (
          SELECT 1 FROM band_nulls b
          WHERE a.k = b.k AND b.v <> a.v
        )
        """,
        [2, 4, 5, 8, 9, 10],
        "__hs_band_min",
    )


def test_band_ansi_gate_declines_divide_cast_probe_expr(spark, band_nulls_hs):
    """ADVICE r12: a band whose RIGHT operand contains Divide (or Cast)
    can THROW under ANSI mode for key groups the raw SMJ never probes —
    the rule must decline under ANSI (default-on) and the plain semi
    serving must still produce exact rows.  The left operand keeps its
    arithmetic freedom (evaluated per-left-row in both plans)."""
    q = spark.sql(
        """
        SELECT a.id AS id FROM band_nulls a
        WHERE EXISTS (
          SELECT 1 FROM band_nulls b
          WHERE a.k = b.k AND b.v / 2 > a.v
        )
        """
    )
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    fast, used = band_nulls_hs._apply_with_info(q)
    fast.collect()
    plan = physical(fast)
    assert "__hs_band" not in plan, plan  # declined: no aggregate shape
    assert sorted(r.id for r in fast.collect()) == sorted(r.id for r in q.collect())


def test_band_rewrites_divide_probe_expr_when_ansi_off(spark, band_nulls_hs):
    """With ANSI off a Divide probe operand cannot throw — the rewrite
    is back on and stays row-exact on the NULL fixture."""
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.hyperspace.apply.cacheTtlSeconds", "0")
    try:
        _band_nulls_case(
            spark,
            band_nulls_hs,
            """
            SELECT a.id AS id FROM band_nulls a
            WHERE EXISTS (
              SELECT 1 FROM band_nulls b
              WHERE a.k = b.k AND b.v / 2 > a.v
            )
            """,
            [1, 6],  # 100/2 > 10 (id 1), 50/2 > 5 (id 6)
            "__hs_band",
        )
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        spark.conf.unset("spark.hyperspace.apply.cacheTtlSeconds")


def test_band_hybrid_appended_files_still_serve(spark, tmp_path_factory):
    """r13 pin (VERDICT r12 'What's wrong' #4): with appended files the
    band index scan is unbucketed, so the per-key aggregate degrades to
    a SHUFFLED pre-aggregate — but the shape must stay the rewrite
    (``__hs_band``), the aggregate must combine map-side BEFORE its
    Exchange (``partial_max`` — the shuffle then carries one row per
    partition×key, not the table), and the probe union must read BOTH
    the index files and the appended source files.  Rows stay exact."""
    root = str(tmp_path_factory.mktemp("hs_band_hyb"))
    src = f"{root}/orders"
    table(spark, "orders").repartition(4).write.parquet(src)
    o = spark.read.parquet(src)
    hs = Hyperspace(spark, system_path=f"{root}/idx")
    hs.create_index(
        o,
        CoveringIndexConfig(
            "hyb_band_cov", ["o_custkey"], ["o_orderkey", "o_totalprice"], num_buckets=8
        ),
    )
    # slim append, under the 0.3 hybrid threshold -> hybrid candidates
    o.limit(100).coalesce(1).write.mode("append").parquet(src)
    a = spark.read.parquet(src).alias("a")
    b = spark.read.parquet(src).alias("b")
    q = a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("b.o_totalprice") > F.col("a.o_totalprice") * 2),
        "left_semi",
    ).select(F.col("a.o_orderkey").alias("o_orderkey"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fast, used = hs._apply_with_info(q)
        assert used == ["hyb_band_cov", "hyb_band_cov"], hs.why_not(q)
        fast.collect()
        final = physical(fast).split("== Initial Plan ==")[0]
        assert "__hs_band" in final, final
        assert "partial_max" in final, final
        assert "hyb_band_cov" in final and f"{root}/orders" in final, final
        assert rows_equal(q, fast)
        assert q.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_exists_or_filter_parses_replays_exact(spark, band_hs):
    """r13 ExistsFilterN: EXISTS subqueries under a DISJUNCTION lower to
    Catalyst ExistenceJoins whose flag columns are all NAMED `exists`
    (and whose joinType.sql() throws) — previously the whole statement
    went opaque.  The composite must parse (ExistsFilterN in the IR),
    replay as correlated EXISTS (exact round trip), and keep the branch
    scans visible to the rules."""
    from hyperspace_spark.planner import ir as _ir
    from hyperspace_spark.planner.parser import _parse

    q = spark.sql(
        """
        SELECT o_orderkey, o_custkey FROM orders_band a
        WHERE EXISTS (SELECT 1 FROM orders_band b
                      WHERE b.o_custkey = a.o_custkey
                        AND b.o_totalprice > a.o_totalprice * 2)
           OR EXISTS (SELECT 1 FROM orders_band b
                      WHERE b.o_custkey = a.o_custkey
                        AND b.o_orderkey <> a.o_orderkey)
        """
    )
    node = _parse(q._jdf.queryExecution().optimizedPlan())

    def find(n):
        if isinstance(n, _ir.ExistsFilterN):
            return n
        for k in _ir.children(n):
            f = find(k)
            if f is not None:
                return f
        return None

    ej = find(node)
    assert ej is not None, "ExistenceJoin chain did not parse to ExistsFilterN"
    assert len(ej.branches) == 2 and " OR " in ej.cond_template
    # every branch subtree bottoms out in a VISIBLE scan (not opaque)
    for _, right, _ in ej.branches:
        leaf = right
        while _ir.children(leaf):
            leaf = _ir.children(leaf)[0]
        assert isinstance(leaf, _ir.Scan), type(leaf).__name__
    fast, used = band_hs._apply_with_info(q)
    assert rows_equal(q, fast)
    assert q.count() > 0


def test_exists_or_with_plain_conjunct_and_not(spark, band_hs):
    """The template grammar: ordinary predicates AND NOT over a flag mix
    with the EXISTS branches; rows must stay exact (NOT EXISTS via the
    flag is the 3VL-sensitive path)."""
    q = spark.sql(
        """
        SELECT o_orderkey FROM orders_band a
        WHERE o_totalprice > 1000
          AND (EXISTS (SELECT 1 FROM orders_band b
                       WHERE b.o_custkey = a.o_custkey
                         AND b.o_totalprice > a.o_totalprice * 2)
               OR NOT EXISTS (SELECT 1 FROM orders_band b
                              WHERE b.o_custkey = a.o_custkey
                                AND b.o_orderkey <> a.o_orderkey))
        """
    )
    fast, used = band_hs._apply_with_info(q)
    assert rows_equal(q, fast)
    assert 0 < fast.count() < table(spark, "orders").count()


def test_renamed_selfjoin_chain_parses_and_accelerates(spark, band_hs):
    """r13 rename synthesis (the TPC-DS q47 class): a three-way
    self-join of the same aggregate on same-named key AND payload
    columns, rank-offset residuals, disambiguating Project only at the
    TOP.  Previously the colliding joins raised and the whole statement
    replayed verbatim; now second copies rename to __hs_dupN with the
    exprId map threaded through the pruning Projects to the fused top
    Project — rows exact and the aggregate's scans visible."""
    from hyperspace_spark.planner import ir as _ir
    from hyperspace_spark.planner.parser import _parse

    q = spark.sql(
        """
        WITH v1 AS (
          SELECT o_custkey, count(*) AS n_orders,
                 round(sum(o_totalprice), 2) AS sum_spend,
                 rank() OVER (PARTITION BY o_custkey
                              ORDER BY round(sum(o_totalprice), 2)) rn
          FROM orders_band
          GROUP BY o_custkey, o_orderpriority)
        SELECT v1.o_custkey, v1.sum_spend,
               v1_lag.sum_spend psum, v1_lead.sum_spend nsum
        FROM v1, v1 v1_lag, v1 v1_lead
        WHERE v1.o_custkey = v1_lag.o_custkey
          AND v1.o_custkey = v1_lead.o_custkey
          AND v1.rn = v1_lag.rn + 1
          AND v1.rn = v1_lead.rn - 1
        """
    )
    node = _parse(q._jdf.queryExecution().optimizedPlan())

    def walk(n):
        yield n
        for k in _ir.children(n):
            yield from walk(k)

    nodes = list(walk(node))
    # the inner colliding join synthesized an explicit renamed SELECT
    assert any(
        isinstance(n, _ir.JoinN)
        and n.select_exprs
        and any("__hs_dup" in s for s in n.select_exprs)
        for n in nodes
    ), [type(n).__name__ for n in nodes]
    # no opaque residue: every leaf is a visible Scan
    leaves = [n for n in nodes if not _ir.children(n)]
    assert all(isinstance(n, _ir.Scan) for n in leaves), [
        type(n).__name__ for n in leaves
    ]
    fast, used = band_hs._apply_with_info(q)
    assert rows_equal(q, fast)
    assert q.count() > 0


def test_renamed_left_outer_keeps_both_key_copies(spark, band_hs):
    """A LEFT OUTER self-join on a same-named key used to raise
    (neither copy can be dropped — they are not value-equal under an
    outer join).  r13: both copies survive with the right one renamed;
    the replayed rows must match raw exactly, including NULLs on
    unmatched rows."""
    from hyperspace_spark.planner.parser import _parse
    from hyperspace_spark.planner.replay import replay

    q = spark.sql(
        """
        SELECT * FROM
          (SELECT o_custkey, count(*) n FROM orders_band
           WHERE o_totalprice > 150000 GROUP BY o_custkey) a
        LEFT OUTER JOIN
          (SELECT o_custkey, count(*) m FROM orders_band
           WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) b
        ON a.o_custkey = b.o_custkey
        """
    )
    node = _parse(q._jdf.queryExecution().optimizedPlan())
    df = replay(spark, node)
    key = lambda r: tuple((x is None, x) for x in r)
    assert sorted(map(key, df.collect())) == sorted(map(key, q.collect()))
    # the right key copy is exposed under a rename, not dropped
    assert len(df.columns) == len(q.columns) == 4


def test_renamed_root_restores_duplicate_output_names(spark, band_hs):
    """r13 root restoration (the TPC-DS q39 shape): the user's FINAL
    schema legitimately carries duplicate names (both sides' columns
    selected verbatim) with an ORDER BY over both sides.  Internally
    the join renames to __hs_dupN and the Sort renders its keys against
    the exposed names; parse_df's final projection restores the
    original duplicate aliases — schema AND rows must match raw."""
    q = spark.sql(
        """
        WITH v AS (
          SELECT o_custkey, o_orderpriority,
                 round(avg(o_totalprice), 2) mean
          FROM orders_band GROUP BY o_custkey, o_orderpriority)
        SELECT v1.o_custkey, v1.mean, v2.o_custkey, v2.mean
        FROM v v1, v v2
        WHERE v1.o_custkey = v2.o_custkey
          AND v1.o_orderpriority = '1-URGENT'
          AND v2.o_orderpriority = '5-LOW'
        ORDER BY v1.o_custkey, v1.mean, v2.mean
        """
    )
    fast, used = band_hs._apply_with_info(q)
    assert fast.columns == q.columns == ["o_custkey", "mean", "o_custkey", "mean"]
    raw = sorted(map(tuple, q.collect()))
    got = sorted(map(tuple, fast.collect()))
    assert raw == got and len(raw) > 0
