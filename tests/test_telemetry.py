"""Telemetry events (reference: telemetry/HyperspaceEvent.scala +
EventLogger): lifecycle actions and apply() emit typed events through a
pluggable fire-and-forget handler registry."""

import pytest
from pyspark.sql import functions as F

from hyperspace_spark import CoveringIndexConfig, Hyperspace
from hyperspace_spark.telemetry import HyperspaceEvent, emit, off_event, on_event

from tests.conftest import table


def test_lifecycle_and_apply_events(spark, tmp_path):
    events: list[HyperspaceEvent] = []
    on_event(events.append)
    try:
        hs = Hyperspace(spark, system_path=str(tmp_path / "idx"))
        o = table(spark, "orders")
        hs.create_index(o, CoveringIndexConfig("tel", ["o_custkey"], ["o_orderkey"]))
        q = o.filter(F.col("o_custkey") == 14).select("o_orderkey")
        _, used = hs._apply_with_info(q)
        assert used == ["tel"]
        hs._apply_with_info(q)  # second hit comes from the plan cache
        hs.refresh_index("tel", "full")
        hs.delete_index("tel")
        hs.restore_index("tel")
        hs.delete_index("tel")
        hs.vacuum_index("tel")
    finally:
        off_event(events.append)
    kinds = [e.kind for e in events]
    for k in ("create", "apply", "refresh", "delete", "restore", "vacuum"):
        assert k in kinds, kinds
    create_ev = next(e for e in events if e.kind == "create")
    assert create_ev.index_name == "tel" and create_ev.success and create_ev.duration_ms >= 0
    apply_evs = [e for e in events if e.kind == "apply"]
    assert {e.detail for e in apply_evs} >= {"planned", "cache"}
    assert all(e.index_name == "tel" for e in apply_evs)
    refresh_ev = next(e for e in events if e.kind == "refresh")
    assert "full" in refresh_ev.detail


def test_failed_action_emits_failure_event(spark, tmp_path):
    events = []
    on_event(events.append)
    try:
        hs = Hyperspace(spark, system_path=str(tmp_path / "idx"))
        from hyperspace_spark.hyperspace import HyperspaceException

        with pytest.raises(HyperspaceException):
            hs.delete_index("nope")
    finally:
        off_event(events.append)
    ev = next(e for e in events if e.kind == "delete")
    assert not ev.success and ev.index_name == "nope"


def test_broken_handler_never_breaks_engine():
    def boom(e):
        raise RuntimeError("handler bug")

    on_event(boom)
    try:
        emit(HyperspaceEvent(kind="apply", index_name="x"))  # must not raise
    finally:
        off_event(boom)
