"""Session-level enable: plain ``spark.sql`` on an enabled session routes
through the index planner (reference package.scala:40-93 ergonomics);
disable restores stock behavior.  DataFrame-API queries still need
explicit hs.apply() — documented divergence (no Catalyst rule injection
from Python)."""

import os

import pytest
from pyspark.sql import functions as F

from hyperspace_spark import (
    CoveringIndexConfig,
    Hyperspace,
    disable_hyperspace,
    enable_hyperspace,
    is_hyperspace_enabled,
)


@pytest.fixture
def indexed(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.range(0, 2000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("g"),
        (F.col("id") * 2.5).alias("v"),
    ).repartition(4).write.parquet(src)
    hs = Hyperspace(spark, system_path=str(tmp_path / "idx"))
    hs.create_index(
        spark.read.parquet(src),
        CoveringIndexConfig("sess_idx", ["g"], ["k", "v"], num_buckets=4),
    )
    yield hs, src
    hs.disable()


def test_enable_routes_spark_sql(indexed, spark, tmp_path):
    hs, src = indexed
    spark.read.parquet(src).createOrReplaceTempView("sess_t")
    q = "SELECT k, v FROM sess_t WHERE g = 13"
    baseline = sorted(map(tuple, spark.sql(q).collect()))

    assert not is_hyperspace_enabled(spark)
    hs.enable()
    assert is_hyperspace_enabled(spark)
    df = spark.sql(q)
    # The index's lineage column only exists in index data, so its
    # presence in the scan relation proves the rewrite (FileScan location
    # strings truncate long /tmp paths, so don't grep for the path).
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "_data_file_id" in plan, plan
    assert sorted(map(tuple, df.collect())) == baseline

    # conf kill switch still wins over enable()
    spark.conf.set("spark.hyperspace.apply.enabled", "false")
    try:
        plan_off = spark.sql(q)._jdf.queryExecution().optimizedPlan().toString()
        assert "_data_file_id" not in plan_off
    finally:
        spark.conf.set("spark.hyperspace.apply.enabled", "true")

    hs.disable()
    assert not is_hyperspace_enabled(spark)
    plan2 = spark.sql(q)._jdf.queryExecution().optimizedPlan().toString()
    assert "_data_file_id" not in plan2
    # restored to the CLASS method, not a wrapper
    assert "sql" not in spark.__dict__


def test_enable_idempotent_and_nonquery_sql(indexed, spark):
    hs, src = indexed
    hs.enable()
    hs.enable()  # no stacking: still one level of routing
    # DDL/commands through routed sql must not raise (apply falls back)
    spark.sql("CREATE TABLE IF NOT EXISTS sess_ddl_probe (a INT) USING parquet")
    spark.sql("DROP TABLE IF EXISTS sess_ddl_probe")
    hs.disable()
    hs.disable()  # double disable is a no-op


def test_module_level_helpers(indexed, spark, tmp_path):
    hs, src = indexed
    got = enable_hyperspace(spark, hs)
    assert got is hs and is_hyperspace_enabled(spark)
    disable_hyperspace(spark)
    assert not is_hyperspace_enabled(spark)


def test_enable_routes_dataframe_actions(indexed, spark):
    """r6: ``spark.read.parquet(...).filter(...).collect()`` on an
    enabled session hits the index with NO explicit hs.apply() — the
    DataFrame-API half of the reference's ApplyHyperspace coverage."""
    from hyperspace_spark.hyperspace import _df_impl_class

    DataFrame = _df_impl_class()
    pristine_collect = DataFrame.collect
    hs, src = indexed
    q = spark.read.parquet(src).filter("g = 13").select("k", "v")
    baseline = sorted(map(tuple, q.collect()))  # before enable: raw scan

    hs.enable()
    try:
        q2 = spark.read.parquet(src).filter("g = 13").select("k", "v")
        hs._apply_cache.clear()
        assert sorted(map(tuple, q2.collect())) == baseline
        # The route planned this frame and chose the index (the cache
        # records the chosen index names per analyzed-plan hash).
        assert any(v[1] == ["sess_idx"] for v in hs._apply_cache.values()), (
            "collect() did not route through the planner"
        )
        # count/toPandas route too
        assert q2.count() == len(baseline)
        assert len(q2.toPandas()) == len(baseline)
    finally:
        hs.disable()
    # last enabled session disabled -> pristine class restored
    assert DataFrame.collect is pristine_collect
    hs._apply_cache.clear()
    spark.read.parquet(src).filter("g = 13").select("k", "v").collect()
    assert not hs._apply_cache, "routing survived disable()"


def test_enable_dataframe_api_optout(indexed, spark):
    hs, src = indexed
    hs.enable(dataframe_api=False)
    try:
        hs._apply_cache.clear()
        spark.read.parquet(src).filter("g = 13").select("k", "v").collect()
        assert not hs._apply_cache, "dataframe_api=False must not route actions"
    finally:
        hs.disable()


def test_enable_dataframe_api_optout_after_optin(indexed, spark):
    """r7: enable(dataframe_api=False) AFTER enable(dataframe_api=True)
    on the same session must stop action routing — 'latest wins' applies
    to the flag, not just the instance."""
    from hyperspace_spark import hyperspace as hsmod

    hs, src = indexed
    hs.enable(dataframe_api=True)
    hs.enable(dataframe_api=False)
    try:
        assert spark not in hsmod._DF_ROUTES
        hs._apply_cache.clear()
        spark.read.parquet(src).filter("g = 13").select("k", "v").collect()
        assert not hs._apply_cache, "explicit opt-out must unroute actions"
    finally:
        hs.disable()


def test_unrouted_rdd_warns_once_and_writestream_is_routed(indexed, spark):
    """r7/r9: .rdd on an enabled session is NOT planner-routed and emits
    ONE telemetry breadcrumb per session so the lost acceleration is
    visible (reference rewrites every query via Catalyst, ApplyHyperspace
    covers all surfaces).  .writeStream no longer warns: since r9 it IS
    routed — DataStreamWriter.start enrols file sinks over indexed
    source roots for automatic incremental maintenance (see
    test_streaming_and_sources.py::
    test_enabled_writestream_sink_auto_refreshes_index)."""
    from hyperspace_spark import telemetry
    from hyperspace_spark.hyperspace import (
        _df_impl_class,
        _stream_writer_class,
        _STREAM_PATCHED,
    )

    DataFrame = _df_impl_class()
    pristine_rdd = DataFrame.__dict__.get("rdd")
    Writer = _stream_writer_class()
    pristine_start = Writer.__dict__.get("start")
    hs, src = indexed
    events = []
    handler = lambda ev: events.append(ev) if ev.kind == "unrouted" else None
    telemetry.on_event(handler)
    hs.enable()
    try:
        df = spark.read.parquet(src).filter("g = 13")
        df.rdd.count()
        df.rdd  # second access: no second event
        spark.read.parquet(src).rdd  # other frame, same session: still once
        stream = spark.readStream.format("rate").load()
        _ = stream.writeStream
        _ = stream.writeStream
        surfaces = [ev.detail for ev in events]
        assert sorted(surfaces) == ["rdd"], surfaces
        # r10: why_not reports the bypass for the rest of the session —
        # where the user actually asks, not only in the one-time log line
        note = hs.why_not(df)
        assert "UNROUTED_SURFACE" in note and "DataFrame.rdd" in note, note
        # writeStream routing installed while enabled
        assert _STREAM_PATCHED, "stream sink routing not installed"
        assert Writer.__dict__.get("start") is not pristine_start
    finally:
        telemetry.off_event(handler)
        hs.disable()
    # pristine descriptors restored (cached_property for rdd on Spark 4;
    # DataStreamWriter.start back to the stock implementation)
    assert DataFrame.__dict__.get("rdd") is pristine_rdd
    assert Writer.__dict__.get("start") is pristine_start
    # and results through .rdd remain correct while enabled
    hs.enable()
    try:
        got = sorted(spark.read.parquet(src).filter("g = 13").select("k").rdd.map(lambda r: r[0]).collect())
        want = sorted(r[0] for r in spark.read.parquet(src).filter("g = 13").select("k").collect())
        assert got == want
    finally:
        hs.disable()


def test_enable_routes_dataframe_write(indexed, spark, tmp_path):
    """r6: df.write on an enabled session builds the writer over the
    rewritten frame — ETL jobs get index acceleration without apply()."""
    hs, src = indexed
    out = str(tmp_path / "routed_write_out")
    q = spark.read.parquet(src).filter("g = 13").select("k", "v")
    baseline = sorted(map(tuple, q.collect()))
    hs.enable()
    try:
        hs._apply_cache.clear()
        spark.read.parquet(src).filter("g = 13").select("k", "v").write.parquet(out)
        assert any(v[1] == ["sess_idx"] for v in hs._apply_cache.values()), (
            "write did not route through the planner"
        )
    finally:
        hs.disable()
    assert sorted(map(tuple, spark.read.parquet(out).collect())) == baseline


def test_lifecycle_ops_safe_while_enabled(indexed, spark, tmp_path):
    """Engine-internal frames (lineage projections with
    input_file_name(), index-data writes) must NOT route back through
    the planner while a session is enabled — _transact holds the guard.
    A create_index under enable() must produce a working, correct
    second index."""
    from pyspark.sql import functions as F

    hs, src = indexed
    src2 = str(tmp_path / "src2")
    spark.range(0, 500).select(
        F.col("id").alias("k2"), (F.col("id") % 11).alias("g2"), (F.col("id") * 3.0).alias("v2")
    ).repartition(2).write.parquet(src2)
    hs.enable()
    try:
        hs.create_index(
            spark.read.parquet(src2),
            CoveringIndexConfig("sess_idx2", ["g2"], ["k2", "v2"], num_buckets=2),
        )
        q = spark.read.parquet(src2).filter("g2 = 3").select("k2", "v2")
        fast, used = hs._apply_with_info(q)
        assert used == ["sess_idx2"], hs.why_not(q)
        assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, q.collect()))
    finally:
        hs.delete_index("sess_idx2")
        hs.vacuum_index("sess_idx2")
        hs.disable()


def test_newsession_child_inherits_enable(indexed, spark):
    """r6 (closes the r5-documented hole): ``spark.newSession()`` on an
    enabled session returns a child that is itself enabled — same system
    path, own Hyperspace instance."""
    from hyperspace_spark import hyperspace as hsmod

    hs, src = indexed
    hs.enable()
    child = None
    try:
        child = spark.newSession()
        assert child is not spark
        assert is_hyperspace_enabled(child)
        assert child in hsmod._DF_ROUTES
        # the child's routing instance targets the same index store
        assert hsmod._DF_ROUTES[child]._system_path == hs._system_path
        # and its sql path plans against the parent's indexes
        plan = (
            child.read.parquet(src).filter("g = 13").select("k", "v")
        )
        fast, used = hsmod._DF_ROUTES[child]._apply_with_info(plan)
        assert used == ["sess_idx"]
    finally:
        if child is not None:
            disable_hyperspace(child)
        hs.disable()
    assert "newSession" not in spark.__dict__


def test_disable_restores_third_party_sql_wrapper(indexed, spark):
    """If another library instance-patched ``spark.sql`` BEFORE enable(),
    disable() must reinstall that wrapper, not pop down to the bare class
    method (which would silently uninstall the third party's hook)."""
    hs, src = indexed
    orig_cls_method = spark.sql
    calls = []

    def audit_sql(query, *a, **kw):
        calls.append(query)
        return orig_cls_method(query, *a, **kw)

    spark.sql = audit_sql
    try:
        hs.enable()
        assert hs.is_enabled()
        spark.sql("SELECT 1").collect()
        assert calls, "enable() must route through the saved wrapper"
        hs.disable()
        assert not hs.is_enabled()
        assert spark.__dict__.get("sql") is audit_sql, (
            "disable() must restore the pre-enable instance wrapper"
        )
        n = len(calls)
        spark.sql("SELECT 2").collect()
        assert len(calls) == n + 1
    finally:
        spark.__dict__.pop("sql", None)
        spark._hs_original_sql = None


def test_enable_routes_metadata_fold(spark, tmp_path):
    """r8 integration: a plain DataFrame action on an ENABLED session
    (no explicit hs.apply) rides the metadata-only aggregation rewrite,
    and whyNot explains ineligible indexes with the r8 reason text."""
    from hyperspace_spark import (
        DataSkippingIndexConfig,
        MinMaxSketch,
        RowCountSketch,
        SumSketch,
    )

    src = str(tmp_path / "meta_src")
    spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 1.5).alias("v")
    ).repartition(4).write.parquet(src)
    hs = Hyperspace(spark, system_path=str(tmp_path / "meta_idx"))
    hs.create_index(
        spark.read.parquet(src),
        DataSkippingIndexConfig(
            "sess_meta", [RowCountSketch(), SumSketch(["v"]), MinMaxSketch(["k"])]
        ),
    )
    hs.enable()
    try:
        row = (
            spark.read.parquet(src)
            .agg(F.count("*").alias("c"), F.round(F.sum("v"), 2).alias("s"))
            .collect()[0]
        )
        assert row["c"] == 5000 and abs(row["s"] - 1.5 * sum(range(5000))) < 1e-6
        # The routed action applied the index (telemetry breadcrumb).
        q = spark.read.parquet(src).agg(F.count("*").alias("c"))
        _, used = hs._apply_with_info(q)
        assert used == ["sess_meta"]
        # whyNot names the r8 reason when the sketch is missing.
        q2 = spark.read.parquet(src).agg(F.sum("k").alias("s"))  # no Sum(k)
        why = hs.why_not(q2)
        assert "sess_meta" in why
    finally:
        hs.disable()
