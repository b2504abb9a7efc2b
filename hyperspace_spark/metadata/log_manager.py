"""JSON operation log with optimistic concurrency.

Layout (reference: IndexLogManager.scala:57-195, IndexConstants.scala:91-92):

    <system>/<index_name>/_hyperspace_log/0      first log entry (JSON)
    <system>/<index_name>/_hyperspace_log/1      ...
    <system>/<index_name>/_hyperspace_log/latestStable   {"id": N}
    <system>/<index_name>/v__=0/...              index data, version 0

``write_log(id, entry)`` fails (returns False) if that id already exists —
two concurrent actions race on id and exactly one wins; writes are
temp-file + atomic rename (fs.write_text_atomic).
"""

from __future__ import annotations

import json
import os

from hyperspace_spark.config import INDEX_VERSION_DIR_PREFIX, LOG_DIR
from hyperspace_spark.fs import FileSystem
from hyperspace_spark.metadata.entry import IndexLogEntry, States


class IndexLogManager:
    def __init__(self, index_path: str, fs: FileSystem):
        self.index_path = index_path.rstrip("/")
        self.fs = fs
        self.log_dir = os.path.join(self.index_path, LOG_DIR)

    # -- paths -----------------------------------------------------------
    def log_path(self, log_id: int) -> str:
        return os.path.join(self.log_dir, str(log_id))

    def _latest_stable_path(self) -> str:
        return os.path.join(self.log_dir, "latestStable")

    def data_dir(self, version: int) -> str:
        return os.path.join(self.index_path, f"{INDEX_VERSION_DIR_PREFIX}={version}")

    # -- reads -----------------------------------------------------------
    def get_latest_id(self) -> int | None:
        ids = [
            int(os.path.basename(p))
            for p in self.fs.list_dir(self.log_dir)
            if os.path.basename(p).isdigit()
        ]
        return max(ids) if ids else None

    def get_log(self, log_id: int) -> IndexLogEntry | None:
        p = self.log_path(log_id)
        if not self.fs.exists(p):
            return None
        return IndexLogEntry.from_json(self.fs.read_text(p))

    def get_latest_log(self) -> IndexLogEntry | None:
        latest = self.get_latest_id()
        return self.get_log(latest) if latest is not None else None

    def get_latest_stable_log(self) -> IndexLogEntry | None:
        """Latest entry in a stable state, preferring the latestStable pointer."""
        p = self._latest_stable_path()
        if self.fs.exists(p):
            try:
                pointed = self.get_log(json.loads(self.fs.read_text(p))["id"])
                if pointed is not None and pointed.state in States.STABLE:
                    return pointed
            except Exception:
                pass
        latest = self.get_latest_id()
        if latest is None:
            return None
        for log_id in range(latest, -1, -1):
            e = self.get_log(log_id)
            if e is not None and e.state in States.STABLE:
                return e
        return None

    def stable_history(self) -> list[IndexLogEntry]:
        """Every stable entry, newest first.  Old entries (and their
        v__=N data dirs) are retained until vacuum_outdated — the pool
        the planner's closest-version fallback selects from for
        time-travel queries (reference: DeltaLakeRelation.scala:179-215)."""
        latest = self.get_latest_id()
        if latest is None:
            return []
        out = []
        for log_id in range(latest, -1, -1):
            e = self.get_log(log_id)
            if e is not None and e.state in States.STABLE:
                out.append(e)
        return out

    # -- writes ----------------------------------------------------------
    def write_log(self, log_id: int, entry: IndexLogEntry) -> bool:
        entry.id = log_id
        return self.fs.write_text_atomic(self.log_path(log_id), entry.to_json(), overwrite=False)

    def update_latest_stable(self, log_id: int) -> None:
        self.fs.write_text_atomic(
            self._latest_stable_path(), json.dumps({"id": log_id}), overwrite=True
        )

    def delete_latest_stable(self) -> None:
        self.fs.delete(self._latest_stable_path())
