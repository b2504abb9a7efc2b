"""Metadata kernel tests: log round-trip, OCC, FileIdTracker, signatures.

Mirrors the reference's unit layer (IndexLogEntryTest.scala,
IndexLogManagerImplTest.scala, FileIdTrackerTest.scala).
"""

import json
import threading

from hyperspace_spark.fs import FileSystem
from hyperspace_spark.metadata import (
    FileIdTracker,
    FileInfo,
    IndexLogEntry,
    IndexLogManager,
    Relation,
    States,
    file_based_signature,
)


def make_entry(name="idx1", state=States.ACTIVE, log_id=0):
    files = [FileInfo(f"/data/f{i}.parquet", 100 + i, 1000 + i, i) for i in range(3)]
    rel = Relation(
        root_paths=["/data"],
        file_format="parquet",
        files=files,
        options={"recursiveFileLookup": "true"},
        data_schema_json=json.dumps({"type": "struct", "fields": []}),
    )
    tracker = FileIdTracker()
    for f in files:
        tracker.add_or_get(f)
    return IndexLogEntry(
        name=name,
        derived_kind="CI",
        derived_properties={"indexedColumns": ["a"], "includedColumns": ["b"], "numBuckets": 8},
        relations=[rel],
        signature=file_based_signature(files),
        index_data_dirs=["/idx/idx1/v__=0"],
        content_files=[FileInfo("/idx/idx1/v__=0/part-0.parquet", 10, 1, -1)],
        state=state,
        id=log_id,
        file_id_tracker=tracker,
    )


def test_log_entry_json_roundtrip():
    e = make_entry()
    e2 = IndexLogEntry.from_json(e.to_json())
    assert e2.name == e.name
    assert e2.derived_properties == e.derived_properties
    assert e2.signature == e.signature
    assert e2.relations[0].files == e.relations[0].files
    assert e2.state == States.ACTIVE
    assert e2.file_id_tracker.max_id == 2
    assert e2.to_json() == e.to_json()


def test_file_id_tracker_monotonic_and_stable():
    t = FileIdTracker()
    f1 = FileInfo("/a", 1, 1)
    f2 = FileInfo("/b", 2, 2)
    assert t.add_or_get(f1) == 0
    assert t.add_or_get(f2) == 1
    assert t.add_or_get(f1) == 0  # same key -> same id
    # Same path, new size/mtime (rewritten file) -> new id.
    assert t.add_or_get(FileInfo("/a", 1, 99)) == 2
    t2 = FileIdTracker.from_json(t.to_json())
    assert t2.get(f2) == 1
    assert t2.max_id == 2


def test_signature_depends_on_metadata_not_order():
    a = [FileInfo("/x", 1, 1), FileInfo("/y", 2, 2)]
    b = list(reversed(a))
    assert file_based_signature(a) == file_based_signature(b)
    assert file_based_signature(a) != file_based_signature([FileInfo("/x", 1, 5), a[1]])


def test_log_manager_occ(tmp_path):
    mgr = IndexLogManager(str(tmp_path / "idx1"), FileSystem())
    assert mgr.get_latest_log() is None
    assert mgr.write_log(0, make_entry(state=States.CREATING, log_id=0))
    # Second write to same id loses the race.
    assert not mgr.write_log(0, make_entry(state=States.CREATING, log_id=0))
    assert mgr.write_log(1, make_entry(state=States.ACTIVE, log_id=1))
    mgr.update_latest_stable(1)
    assert mgr.get_latest_id() == 1
    assert mgr.get_latest_stable_log().state == States.ACTIVE


def test_log_manager_latest_stable_scan(tmp_path):
    mgr = IndexLogManager(str(tmp_path / "idx1"), FileSystem())
    mgr.write_log(0, make_entry(state=States.CREATING))
    mgr.write_log(1, make_entry(state=States.ACTIVE))
    mgr.write_log(2, make_entry(state=States.REFRESHING))
    # No latestStable pointer: scan finds id=1.
    assert mgr.get_latest_stable_log().id == 1
    assert mgr.get_latest_log().id == 2


def test_concurrent_writers_single_winner(tmp_path):
    mgr = IndexLogManager(str(tmp_path / "idx1"), FileSystem())
    results = []

    def attempt(i):
        results.append((i, mgr.write_log(5, make_entry(log_id=5))))

    threads = [threading.Thread(target=attempt, args=(i,)) for i in range(8)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert sum(1 for _, ok in results if ok) == 1
