"""The user-facing engine API.

Mirrors the reference's Hyperspace class + action dispatch
(Hyperspace.scala:27-193, index/IndexCollectionManager.scala:28-206,
actions/*) : every lifecycle op is a validate -> begin(transient state,
log id+1) -> op -> end(final state, log id+2) transaction over the JSON
operation log with optimistic concurrency, and query acceleration is an
explicit ``apply``/``sql`` planner pass that swallows every failure back
to the original DataFrame (ApplyHyperspace.scala:60-64).
"""

from __future__ import annotations

import os
import time
from typing import TYPE_CHECKING, Callable

from hyperspace_spark.config import HyperspaceConf
from hyperspace_spark.fs import filesystem_for
from hyperspace_spark.metadata.entry import FileIdTracker, FileInfo, IndexLogEntry, Relation, States
from hyperspace_spark.metadata.log_manager import IndexLogManager
from hyperspace_spark.metadata.signature import file_based_signature
from hyperspace_spark.planner import ir
from hyperspace_spark.planner.candidates import Reasons, collect_candidates, live_source_files
from hyperspace_spark.planner.optimizer import optimize
from hyperspace_spark.planner.parser import parse_df
from hyperspace_spark.planner.replay import replay
from hyperspace_spark.planner.rules import RuleContext, default_rules

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession


class HyperspaceException(Exception):
    pass


class ConcurrentModificationError(HyperspaceException):
    pass


class _FallBackToFull(Exception):
    """Internal: incremental refresh decided a full rebuild is required."""


class Hyperspace:
    def __init__(self, spark: "SparkSession", system_path: str | None = None):
        self.spark = spark
        self._system_path = system_path
        self._entry_cache: tuple[float, list[IndexLogEntry]] | None = None
        # Plan cache: analyzed-plan semanticHash -> (rewritten df, indexes).
        # Epoch bumps on any lifecycle op so stale rewrites never serve.
        self._apply_cache: dict = {}
        self._cache_epoch = 0

    # ------------------------------------------------------------------
    # plumbing
    # ------------------------------------------------------------------
    def conf(self) -> HyperspaceConf:
        return HyperspaceConf.from_session(self.spark, self._system_path)

    def _fs(self, conf: HyperspaceConf):
        return filesystem_for(conf.system_path, self.spark)

    def _log_mgr(self, name: str, conf: HyperspaceConf) -> IndexLogManager:
        return IndexLogManager(os.path.join(conf.system_path, name), self._fs(conf))

    def _invalidate_cache(self) -> None:
        self._entry_cache = None
        self._apply_cache.clear()
        self._cache_epoch += 1

    def _all_latest_entries(self, conf: HyperspaceConf) -> list[IndexLogEntry]:
        fs = self._fs(conf)
        out = []
        for d in fs.list_dir(conf.system_path):
            name = os.path.basename(d.rstrip("/"))
            e = IndexLogManager(d, fs).get_latest_stable_log()
            if e is not None and e.name == name:
                out.append(e)
        return out

    def _active_entries(self, conf: HyperspaceConf) -> list[IndexLogEntry]:
        """ACTIVE index entries with a TTL cache (reference:
        CachingIndexCollectionManager, 300 s expiry)."""
        now = time.time()
        if self._entry_cache is not None and now - self._entry_cache[0] < conf.cache_expiry_sec:
            entries = self._entry_cache[1]
        else:
            entries = self._all_latest_entries(conf)
            self._entry_cache = (now, entries)
        return [e for e in entries if e.state == States.ACTIVE]

    # ------------------------------------------------------------------
    # action template (reference: actions/Action.scala:34-108)
    # ------------------------------------------------------------------
    def _transact(
        self,
        name: str,
        conf: HyperspaceConf,
        transient: str,
        final: str,
        op: Callable[[IndexLogEntry, IndexLogManager, int], IndexLogEntry],
        base_entry: IndexLogEntry | None = None,
    ) -> IndexLogEntry:
        # Lifecycle ops build internal frames over the user's source
        # (lineage projections with input_file_name(), stats scans,
        # index-data writes); under session enable() those frames must
        # NEVER route back through the planner — hold the action-routing
        # guard for the whole transaction.
        prev_guard = getattr(_DF_ROUTE_GUARD, "active", False)
        _DF_ROUTE_GUARD.active = True
        try:
            mgr = self._log_mgr(name, conf)
            latest_id = mgr.get_latest_id()
            base = base_entry if base_entry is not None else mgr.get_latest_log()
            if base is None:
                raise HyperspaceException(f"Index {name} does not exist.")
            begin = base.with_state(transient, (latest_id if latest_id is not None else -1) + 1)
            if not mgr.write_log(begin.id, begin):
                raise ConcurrentModificationError(f"Concurrent modification on index {name}.")
            new_version = begin.id  # data version namespaced by log id -> unique
            result = op(begin, mgr, new_version)
            result = result.with_state(final, begin.id + 1)
            if not mgr.write_log(result.id, result):
                raise ConcurrentModificationError(f"Concurrent modification on index {name}.")
            if final in States.STABLE:
                mgr.update_latest_stable(result.id)
            self._invalidate_cache()
            return result
        finally:
            _DF_ROUTE_GUARD.active = prev_guard

    # ------------------------------------------------------------------
    # createIndex (reference: actions/CreateAction.scala, CreateActionBase.scala)
    # ------------------------------------------------------------------
    def create_index(self, df: "DataFrame", config) -> None:
        conf = self.conf()
        scan = self._source_scan(df)
        # Resolve config columns to the source SCHEMA spelling (honoring
        # spark.sql.caseSensitive) so the stored indexedColumns always
        # compare cleanly with parsed plans — reference ResolverUtils.
        cs = self.spark.conf.get("spark.sql.caseSensitive", "false") == "true"
        _resolve_config_columns(scan, config, cs)
        missing = [c for c in config.referenced_columns() if not _column_exists(scan, c)]
        if missing:
            raise HyperspaceException(f"Index config references missing columns: {missing}")

        # PartitionSketch assumes every row of a file shares the column's
        # first value — only true for partitioning columns.  Sketching a
        # regular column would prune files UNSOUNDLY (wrong results), so
        # reject at create time (reference applies partition sketches to
        # partition columns only, PartitionSketch.scala:38-74).
        from hyperspace_spark.indexes.dataskipping import DataSkippingIndexConfig
        from hyperspace_spark.indexes.sketches import PartitionSketch

        if isinstance(config, DataSkippingIndexConfig):
            bad = [
                s.column
                for s in config.sketches
                if isinstance(s, PartitionSketch) and s.column not in scan.partition_columns
            ]
            if bad:
                raise HyperspaceException(
                    f"PartitionSketch requires partitioning columns; {bad} are not "
                    f"partition columns of the source (partitions: {scan.partition_columns})"
                )

        fs = self._fs(conf)
        mgr = self._log_mgr(config.name, conf)
        latest = mgr.get_latest_log()
        if latest is not None and latest.state not in (States.DOESNOTEXIST,):
            raise HyperspaceException(f"Index {config.name} already exists (state {latest.state}).")
        base_id = (mgr.get_latest_id() if latest is not None else None) or 0

        files = live_source_files(scan, fs)
        tracker = FileIdTracker()
        files = [
            FileInfo(f.path, f.size, f.mtime, tracker.add_or_get(f)) for f in files
        ]
        relation = Relation(
            root_paths=list(scan.normalized_paths()),
            file_format=scan.file_format,
            files=files,
            options=scan.options,
            data_schema_json=scan.data_schema_json,
            partition_columns=scan.partition_columns,
        )
        begin_id = base_id + 1 if latest is not None else 0
        entry = IndexLogEntry(
            name=config.name,
            derived_kind=config.kind,
            derived_properties={},
            relations=[relation],
            signature=_signature_of(scan, files),
            index_data_dirs=[],
            state=States.CREATING,
            id=begin_id,
            data_version=0,
            file_id_tracker=tracker,
        )
        if not mgr.write_log(begin_id, entry):
            raise ConcurrentModificationError(f"Concurrent createIndex on {config.name}.")

        data_dir = mgr.data_dir(0)
        try:
            props = self._build(config.kind)(
                self.spark, df, config, conf, files, tracker, data_dir, config.name, 0
            )
        except BaseException:
            # Roll the name back to DOESNOTEXIST before re-raising: a
            # build failure (bad column type, executor OOM, KMeans error)
            # otherwise strands the CREATING log with NO stable version —
            # retry hits "already exists", cancel has nothing to roll
            # back to, delete requires ACTIVE, and the name is bricked
            # until someone hand-deletes the index directory.
            gone = entry.with_state(States.DOESNOTEXIST, begin_id + 1)
            try:
                if mgr.write_log(gone.id, gone):
                    mgr.update_latest_stable(gone.id)
                self._invalidate_cache()
            except Exception:
                pass
            raise
        entry.derived_properties = props
        entry.index_data_dirs = [data_dir]
        entry.content_files = [
            FileInfo(s.path, s.size, s.mtime) for s in fs.list_files_recursive(data_dir)
        ]
        done = entry.with_state(States.ACTIVE, begin_id + 1)
        if not mgr.write_log(done.id, done):
            raise ConcurrentModificationError(f"Concurrent createIndex on {config.name}.")
        mgr.update_latest_stable(done.id)
        self._invalidate_cache()

    def _build(self, kind: str):
        if kind == "CI":
            from hyperspace_spark.indexes.covering import create_index_data as b
        elif kind == "ZCI":
            from hyperspace_spark.indexes.zorder import create_index_data as b
        elif kind == "DS":
            from hyperspace_spark.indexes.dataskipping import create_index_data as b
        elif kind == "ANN":
            from hyperspace_spark.indexes.ann import create_index_data as b
        elif kind == "TXT":
            from hyperspace_spark.indexes.inverted import create_index_data as b
        else:
            raise HyperspaceException(f"Unknown index kind {kind}")
        return b

    def _source_scan(self, df: "DataFrame") -> ir.Scan:
        plan = parse_df(df)
        if not isinstance(plan, ir.Scan):
            raise HyperspaceException(
                "createIndex requires a plain file-based source DataFrame "
                f"(got plan root {type(plan).__name__})"
            )
        return plan

    # ------------------------------------------------------------------
    # acceleration (reference: ApplyHyperspace + ScoreBasedIndexPlanOptimizer)
    # ------------------------------------------------------------------
    def apply(self, df: "DataFrame") -> "DataFrame":
        """Rewrite df to read index data when profitable; on ANY failure or
        no-win, return df unchanged (reference swallows exceptions the same
        way, ApplyHyperspace.scala:60-64)."""
        out, _ = self._apply_with_info(df)
        return out

    def sql(self, query: str) -> "DataFrame":
        return self.apply(self.spark.sql(query))

    # ------------------------------------------------------------------
    # session-level enable (reference: package.scala:40-93 /
    # HyperspaceSparkSessionExtension.scala:44-69).  The reference injects
    # an optimizer rule into the session's extensions so EVERY query is
    # index-aware; a Python-side engine can't register Catalyst rules, so
    # the equivalent ergonomic surface is two instance/class patches:
    # SparkSession.sql routes its result through apply(), and (since r6)
    # DataFrame ACTIONS (collect/count/show/toPandas/...) on an enabled
    # session apply() the frame first, so
    # ``spark.read.parquet(p).filter(...).collect()`` is accelerated with
    # no explicit hs.apply() — closing the DataFrame-API half of the
    # reference's ApplyHyperspace.scala:32-76 coverage.  ``df.write``
    # IS routed too (r6: a property patch on the DataFrame class),
    # ``df.rdd`` builds from the rewritten frame (r10,
    # _make_routed_rdd), and ``df.writeStream`` sinks trigger automatic
    # index maintenance (r9, streaming/refresh.py listener).  Every
    # action surface is now covered.
    # ------------------------------------------------------------------
    def enable(self, dataframe_api: bool = True) -> None:
        """Route this session's queries through the index planner:
        plain ``spark.sql(...)`` always; DataFrame actions too when
        ``dataframe_api`` (default).  Idempotent; re-enabling from a
        different Hyperspace instance re-routes to that instance (latest
        wins).  The ``spark.hyperspace.apply.enabled`` conf kill switch
        still short-circuits apply() per query.  Child sessions from
        ``spark.newSession()`` are auto-enabled with their own Hyperspace
        instance on the same system path (disable the child session
        individually to opt it out)."""
        import threading

        spark = self.spark
        if getattr(spark, "_hs_original_sql", None) is None:
            spark._hs_original_sql = spark.sql  # bound class method
        orig = spark._hs_original_sql
        hs = self
        guard = threading.local()  # reentrancy: apply()'s own DDL

        def routed_sql(query, *args, **kwargs):
            df = orig(query, *args, **kwargs)
            if getattr(guard, "active", False) or getattr(_DF_ROUTE_GUARD, "active", False):
                # Internal statement issued from inside apply()'s replay
                # (e.g. bucketed-table re-registration DDL): planning it
                # would be wasted work at best.
                return df
            guard.active = True
            try:
                return hs.apply(df)
            finally:
                guard.active = False

        spark.sql = routed_sql
        if dataframe_api:
            _install_df_action_routing()
            _DF_ROUTES[spark] = self
        else:
            # Explicit opt-out must win over a prior enable(dataframe_api=
            # True) on the same session — "latest wins" applies to the
            # flag, not just the instance.
            _DF_ROUTES.pop(spark, None)
            if not _DF_ROUTES:
                _uninstall_df_action_routing()
        # newSession() children are distinct SparkSession objects: the
        # instance patch above and the route registry would both miss
        # them.  Patch newSession so children inherit the routing.
        if getattr(spark, "_hs_original_newSession", None) is None:
            spark._hs_original_newSession = spark.newSession
        orig_ns = spark._hs_original_newSession
        sys_path = self._system_path

        def routed_newSession():
            child = orig_ns()
            type(hs)(child, system_path=sys_path).enable(dataframe_api=dataframe_api)
            return child

        spark.newSession = routed_newSession

    def disable(self) -> None:
        """Restore the pre-enable session surface (no-op if not
        enabled): ``spark.sql``, ``spark.newSession``, and this
        session's DataFrame-action routing."""
        _disable_session_sql(self.spark)

    def is_enabled(self) -> bool:
        return getattr(self.spark, "_hs_original_sql", None) is not None

    def _apply_with_info(self, df: "DataFrame", reasons: Reasons | None = None):
        conf = self.conf()
        if not conf.apply_enabled:
            return df, []
        cache_key = None
        if reasons is None and conf.apply_cache_ttl_sec > 0:
            # whyNot always re-plans to collect fresh reasons; TTL=0 disables
            # the cache entirely (re-plan every query, reference behavior).
            try:
                cache_key = (
                    df._jdf.queryExecution().analyzed().semanticHash(),
                    self._cache_epoch,
                    str(conf),  # planning depends on the conf snapshot
                )
                hit = self._apply_cache.get(cache_key)
                # TTL guards against EXTERNAL source changes (appends with
                # no lifecycle op) serving a stale rewrite; lifecycle ops
                # bump the epoch immediately.
                if hit is not None and time.time() - hit[2] < conf.apply_cache_ttl_sec:
                    _telemetry_apply(hit[1], "cache")
                    return hit[0], hit[1]
            except Exception:
                cache_key = None
        try:
            # Cheap early-out BEFORE the plan parse: parse_df costs py4j
            # round trips proportional to plan size (up to ~1000 for a
            # capped InSet recovery), which a session with no active
            # indexes should never pay.
            entries = self._active_entries(conf)
            if not entries:
                return df, []
            plan = parse_df(df)
            if reasons is not None:
                def _walk_nodes(n):
                    yield n
                    for c in ir.children(n):
                        yield from _walk_nodes(c)

                reasons.opaque_kinds = sorted(
                    {
                        str(n.jplan.getClass().getSimpleName())
                        for n in _walk_nodes(plan)
                        if isinstance(n, ir.OpaqueN)
                    }
                )
            fs = self._fs(conf)
            cands = {
                id(s): collect_candidates(s, entries, fs, conf, reasons)
                for s in ir.iter_scans(plan)
            }
            if not any(cands.values()):
                return df, []
            ctx = RuleContext(self.spark, conf, cands, reasons)
            # A rule can win planning but decline LATE — its replacement's
            # structural guard raises during replay (e.g. metadata-only
            # fold meets a shape the cheap planner check admitted).  That
            # must not discard lower-scoring rewrites that still apply
            # (data skipping under a failed metadata fold): retry the
            # whole optimize with the failing rule(s) excluded until a
            # plan replays cleanly or no rewrite wins.
            excluded: set[str] = set()
            result = None
            while result is None:
                rules = [
                    r for r in default_rules() if type(r).__name__ not in excluded
                ]
                best = optimize(plan, rules, ctx)
                if best.score <= 0:
                    result = (df, [])
                    break
                try:
                    rewritten = replay(self.spark, best.node)
                    # Replay is name-based SQL regeneration; a rewrite must
                    # never change the frame's visible column list (e.g. an
                    # inner-join key dedup when the join IS the root and the
                    # user expected both copies).  Name check only — analysis
                    # cost, no execution.
                    if [f.name for f in rewritten.schema.fields] != [
                        f.name for f in df.schema.fields
                    ]:
                        raise RuntimeError("replay changed the output schema")
                except Exception as exc:
                    fresh = set(best.rule_names) - excluded
                    if not fresh:
                        raise  # nothing left to exclude — outer fallback
                    excluded |= fresh
                    # A late decline is sometimes legitimate (structural
                    # guard met a shape the cheap planner check admitted)
                    # but can also be a hard bug the retry would
                    # otherwise hide COMPLETELY (r9: a NameError in the
                    # fold surfaced only through this breadcrumb's
                    # absence of... nothing at all).  Make it visible.
                    try:
                        _telemetry_rule_excluded(sorted(fresh), exc)
                    except Exception:
                        pass
                    continue
                # The rewritten frame must not be re-planned when a
                # DataFrame-action route (session enable) executes it:
                # its scans read index data, which never matches a
                # candidate, so a second pass is pure wasted planning.
                rewritten._hs_no_reroute = True
                result = (rewritten, best.index_names)
            if cache_key is not None:
                if len(self._apply_cache) > 256:
                    self._apply_cache.clear()
                self._apply_cache[cache_key] = (result[0], result[1], time.time())
            _telemetry_apply(result[1], "planned")
            return result
        except Exception:
            return df, []

    # ------------------------------------------------------------------
    # refresh (reference: actions/Refresh*.scala)
    # ------------------------------------------------------------------
    def refresh_index(self, name: str, mode: str = "full") -> None:
        # Reference parity: RefreshActionBase requires ACTIVE — refreshing
        # a DELETED index must not resurrect it.
        self._require_state(name, self.conf(), States.ACTIVE, "refreshIndex")
        latest = self._log_mgr(name, self.conf()).get_latest_stable_log()
        if (
            latest is not None
            and latest.derived_kind == "ANN"
            and mode == "quick"
            and not latest.derived_properties.get("lineage")
        ):
            # Legacy lineage-free ANN entries cannot compensate deletes
            # at query time, so quick promotes to incremental for them.
            # Lineage-built entries (r10 default) take quick verbatim:
            # ann_search assigns/encodes appended vectors on the fly
            # against the frozen quantizer and anti-filters deleted rows.
            mode = "incremental"
        if mode == "full":
            self._refresh_full(name)
        elif mode == "incremental":
            self._refresh_incremental(name)
        elif mode == "quick":
            self._refresh_quick(name)
        else:
            raise HyperspaceException(f"Unknown refresh mode {mode}")

    def _source_df(self, entry: IndexLogEntry) -> "DataFrame":
        rel = entry.relations[0]
        scan = _scan_of(rel)
        if scan.delta_root:
            # A directory read would pick up dead files and the log dir;
            # the snapshot file list is the table's live content.
            from hyperspace_spark.sources.delta import read_delta

            return read_delta(self.spark, scan.delta_root)
        if scan.iceberg_root:
            from hyperspace_spark.sources.iceberg import read_iceberg

            return read_iceberg(self.spark, scan.iceberg_root)
        return _relation_reader(self.spark, rel).load(rel.root_paths)

    def _config_of(self, entry: IndexLogEntry):
        p = entry.derived_properties
        if entry.derived_kind == "CI":
            from hyperspace_spark.indexes.covering import CoveringIndexConfig

            return CoveringIndexConfig(
                entry.name,
                p["indexedColumns"],
                p["includedColumns"],
                num_buckets=p.get("numBuckets"),
                where=p.get("filterPredicate"),
            )
        if entry.derived_kind == "ZCI":
            from hyperspace_spark.indexes.zorder import ZOrderCoveringIndexConfig

            return ZOrderCoveringIndexConfig(
                entry.name,
                p["indexedColumns"],
                p["includedColumns"],
                target_bytes_per_partition=p.get("targetBytesPerPartition"),
                where=p.get("filterPredicate"),
            )
        if entry.derived_kind == "DS":
            from hyperspace_spark.indexes.dataskipping import DataSkippingIndexConfig
            from hyperspace_spark.indexes.sketches import sketch_from_json

            return DataSkippingIndexConfig(
                entry.name, [sketch_from_json(s) for s in p["sketches"]]
            )
        if entry.derived_kind == "ANN":
            from hyperspace_spark.indexes.ann import IvfIndexConfig

            return IvfIndexConfig(
                entry.name,
                vec_col=p["vecCol"],
                id_col=p["idCol"],
                n_clusters=p["nClusters"],
                pq_m=p.get("pqM"),
            )
        if entry.derived_kind == "TXT":
            from hyperspace_spark.indexes.inverted import InvertedTextIndexConfig

            return InvertedTextIndexConfig(
                entry.name,
                text_col=p["textCol"],
                id_col=p["idCol"],
                num_buckets=p["numBuckets"],
            )
        raise HyperspaceException(f"Unknown kind {entry.derived_kind}")

    def _refresh_full(self, name: str) -> None:
        conf = self.conf()
        fs = self._fs(conf)

        def op(entry: IndexLogEntry, mgr: IndexLogManager, version: int) -> IndexLogEntry:
            df = self._source_df(entry)
            scan = self._source_scan(df)
            files = [
                FileInfo(f.path, f.size, f.mtime)
                for f in live_source_files(scan, fs)
            ]
            tracker = entry.file_id_tracker
            files = [FileInfo(f.path, f.size, f.mtime, tracker.add_or_get(f)) for f in files]
            entry.relations[0].files = files
            entry.signature = _signature_of(scan, files)
            data_dir = mgr.data_dir(version)
            config = self._config_of(entry)
            entry.derived_properties = self._build(entry.derived_kind)(
                self.spark, df, config, conf, files, tracker, data_dir, name, version
            )
            entry.index_data_dirs = [data_dir]
            entry.data_version = version
            entry.content_files = [
                FileInfo(s.path, s.size, s.mtime) for s in fs.list_files_recursive(data_dir)
            ]
            entry.appended_files = []
            entry.deleted_files = []
            return entry

        self._transact(name, conf, States.REFRESHING, States.ACTIVE, op)

    @staticmethod
    def _source_delta(entry, fs):
        """(live, appended, deleted) of the entry's source files vs its
        indexed snapshot — the ONE copy of the key()-based diff shared by
        incremental refresh and the hybrid-aware search APIs."""
        rel = entry.relations[0]
        live = live_source_files(_scan_of(rel), fs)
        indexed = entry.source_files_by_key()
        live_by_key = {f.key(): f for f in live}
        appended = [f for k, f in live_by_key.items() if k not in indexed]
        deleted = [f for k, f in indexed.items() if k not in live_by_key]
        return live, appended, deleted

    @staticmethod
    def _carry_index_files(fs, entry, data_dir: str, skip_subdirs=(), skip_files=()) -> None:
        """Hardlink every current index content file into a new version
        dir, preserving subpaths (cluster=N partitions and flat bucketed
        layouts alike) — the O(1)-per-file carry both the ANN and TXT
        incremental refreshes rely on.  ``skip_subdirs`` drops files under
        the named first-level subpaths (e.g. re-clustered ``cluster=3``
        partitions whose rows were rewritten elsewhere); ``skip_files``
        drops individual files by absolute old path (e.g. the files a
        delete-refresh rewrote elsewhere)."""
        old_base = entry.index_data_dirs[-1].rstrip("/")
        skip = tuple(s.rstrip("/") + "/" for s in skip_subdirs)
        skip_f = {os.path.normpath(p) for p in skip_files}
        for f in entry.content_files:
            rel_path = (
                f.path[len(old_base) + 1 :]
                if f.path.startswith(old_base + "/")
                else f.path.rsplit("/", 1)[-1]
            )
            if skip and rel_path.startswith(skip):
                continue
            if skip_f and os.path.normpath(f.path) in skip_f:
                continue
            fs.link_or_copy(f.path, os.path.join(data_dir, rel_path))

    def _refresh_incremental(self, name: str) -> None:
        """Scan only appended files; drop rows of deleted files via the
        lineage anti-filter (reference: RefreshIncrementalAction.scala:45-133,
        delete via left-anti semantics J5).  At 100 TB this is the money
        path: cost scales with the delta, not the table."""
        conf = self.conf()
        fs = self._fs(conf)

        def op(entry: IndexLogEntry, mgr: IndexLogManager, version: int) -> IndexLogEntry:
            from hyperspace_spark.indexes import covering as cov
            from pyspark.sql import functions as F
            from hyperspace_spark.config import DATA_FILE_ID_COLUMN

            rel = entry.relations[0]
            live, appended, deleted = self._source_delta(entry, fs)
            live_by_key = {f.key(): f for f in live}
            if not appended and not deleted:
                return entry  # no-op refresh

            tracker = entry.file_id_tracker
            if entry.derived_kind == "DS":
                from hyperspace_spark.indexes.dataskipping import refresh_incremental as ds_ri

                return ds_ri(self.spark, entry, conf, appended, deleted, mgr, version, fs)

            if entry.derived_kind == "ZCI":
                # r9: bounded appends z-cluster LOCALLY into their own
                # files (frozen build-time scaling, like the ANN
                # quantizer); retained files hardlink through and their
                # per-file min/max pruning stays exact — the locally-
                # clustered-delta-over-clustered-base layout production
                # table formats ship between OPTIMIZE runs.  r10: DELETES
                # rewrite only the z-files holding deleted rows via the
                # lineage anti-filter (surviving rows keep their z-sort;
                # the production DELETE shape) — only lineage-free
                # legacy entries or drift beyond
                # zorder.maxIncrementalRatio still re-cluster fully; a
                # later FULL refresh restores one global interleave.
                app_bytes = sum(f.size for f in appended)
                indexed_bytes = max(1, sum(f.size for f in live) - app_bytes)
                if deleted and not entry.derived_properties.get("lineage"):
                    raise _FallBackToFull()
                if app_bytes / indexed_bytes > conf.zorder_max_incremental_ratio:
                    raise _FallBackToFull()
                from hyperspace_spark.indexes import zorder as zo

                props = entry.derived_properties
                appended = [
                    FileInfo(f.path, f.size, f.mtime, tracker.add_or_get(f))
                    for f in appended
                ]
                data_dir = mgr.data_dir(version)
                new_stats, n_new_parts = {}, 0
                if appended:
                    new_df = _relation_reader(
                        self.spark, rel, with_base_path=True
                    ).load([f.path for f in appended])
                    if props.get("filterPredicate"):
                        # Partial z-order index: appended files
                        # contribute only predicate rows (create-path
                        # parity).
                        new_df = new_df.filter(props["filterPredicate"])
                    new_stats, n_new_parts = zo.append_index_data(
                        self.spark, new_df, entry, conf, appended, tracker, data_dir
                    )
                skip_files: list[str] = []
                if deleted:
                    del_ids = [tracker.get(f) for f in deleted]
                    skip_files, survivor_stats = zo.drop_deleted_rows(
                        self.spark,
                        entry,
                        [i for i in del_ids if i is not None],
                        data_dir,
                    )
                    new_stats = {**new_stats, **survivor_stats}
                self._carry_index_files(fs, entry, data_dir, skip_files=skip_files)
                if props.get("fileStats"):
                    merged = dict(props["fileStats"])
                    for p in skip_files:
                        merged.pop(p.rsplit("/", 1)[-1], None)
                    merged.update(new_stats)
                    # Same log-size guard collect_file_stats enforces at
                    # build: past the cap, drop the stats (pruning
                    # disables, correctness unaffected) rather than bloat
                    # every future log entry.
                    props["fileStats"] = (
                        merged if len(merged) <= zo._FILESTATS_MAX_FILES else {}
                    )
                # OPTIMIZE sizes its per-layout compaction from
                # numBuckets: account for the appended partitions or the
                # grown index compacts back into the build-time count
                # (files ~2x target after repeated appends).
                props["numBuckets"] = int(props.get("numBuckets", 0)) + int(
                    n_new_parts
                )
                new_files = {f.key(): f for f in live}
                entry.relations[0].files = [
                    FileInfo(f.path, f.size, f.mtime, tracker.add_or_get(f))
                    for f in new_files.values()
                ]
                entry.signature = _signature_of(
                    _scan_of(entry.relations[0]), entry.relations[0].files
                )
                entry.index_data_dirs = [data_dir]
                entry.data_version = version
                entry.content_files = [
                    FileInfo(s.path, s.size, s.mtime)
                    for s in fs.list_files_recursive(data_dir)
                ]
                entry.appended_files = []
                entry.deleted_files = []
                return entry

            if entry.derived_kind == "ANN":
                # Assign-only IVF increment (standard FAISS/Milvus append
                # path): new vectors join the FROZEN quantizer's clusters,
                # only their rows are written, existing cluster files
                # hardlink through.  Drift escalation: appends beyond
                # maxAssignOnlyRatio of the corpus PARTIALLY re-cluster —
                # only clusters grown past reclusterOversizeFactor x the
                # average are re-KMeans'd (split), the rest still
                # hardlink (bounded rewrite bytes, OptimizeAction.scala's
                # per-bucket discipline).  Appends beyond maxReclusterRatio
                # force a full refit — a badly drifted quantizer degrades
                # recall silently, which is worse than the rebuild.
                # DELETES never touch the quantizer: lineage-built indexes
                # drop the deleted files' rows from exactly the index
                # files holding them (ann.drop_deleted_rows — centroids
                # and codebooks frozen, recall untouched by construction);
                # only lineage-free (legacy) indexes, or a delete landing
                # together with recluster-scale appends, pay the refit.
                # Ratio = appended bytes vs the PREVIOUSLY INDEXED corpus
                # (live minus appended): "how much did the corpus the
                # quantizer was fit on grow".  Dividing by live-total
                # would asymptote below 1.0 no matter how much lands, so
                # maxReclusterRatio could never trigger the full refit.
                app_bytes = sum(f.size for f in appended)
                indexed_bytes = max(1, sum(f.size for f in live) - app_bytes)
                app_ratio = app_bytes / indexed_bytes
                if deleted and not entry.derived_properties.get("lineage"):
                    raise _FallBackToFull()
                if app_ratio > conf.ann_max_recluster_ratio:
                    raise _FallBackToFull()
                if deleted and app_ratio > conf.ann_max_assign_only_ratio:
                    # Delete + recluster-scale appends in one refresh:
                    # splitting clusters while also dropping rows makes
                    # the rewrite-bytes bound meaningless — full refit.
                    raise _FallBackToFull()
                if entry.derived_properties.get("pqM") and (
                    app_ratio > conf.ann_max_assign_only_ratio
                ):
                    # PQ rows carry codes, not vectors: partial
                    # re-clustering would need the originals back from
                    # the source (a corpus-scale read) — the full refit
                    # is the honest cost at that drift level.
                    raise _FallBackToFull()
                from hyperspace_spark.indexes.ann import (
                    assign_to_centroids,
                    drop_deleted_rows,
                    partial_recluster,
                )

                props = entry.derived_properties
                appended = [
                    FileInfo(f.path, f.size, f.mtime, tracker.add_or_get(f))
                    for f in appended
                ]
                new_df = None
                if appended:
                    new_df = _relation_reader(
                        self.spark, rel, with_base_path=True
                    ).load([f.path for f in appended])
                    if props.get("lineage"):
                        from hyperspace_spark.indexes.covering import with_lineage

                        new_df = with_lineage(
                            new_df, self.spark, appended, tracker
                        )
                data_dir = mgr.data_dir(version)
                skip_files: list[str] = []
                if deleted:
                    del_ids = [tracker.get(f) for f in deleted]
                    skip_files = drop_deleted_rows(
                        self.spark,
                        entry,
                        [i for i in del_ids if i is not None],
                        data_dir,
                    )
                if not appended:
                    self._carry_index_files(
                        fs, entry, data_dir, skip_files=skip_files
                    )
                elif app_ratio > conf.ann_max_assign_only_ratio:
                    new_centroids, split_ids = partial_recluster(
                        self.spark,
                        entry,
                        new_df,
                        data_dir,
                        oversize_factor=conf.ann_recluster_oversize_factor,
                    )
                    # nClusters stays the CONFIGURED target (actual k =
                    # len(centroids)): a later full refresh re-balances
                    # the grown quantizer back to the configured k.
                    props["centroids"] = new_centroids
                    # Hardlink only the UNTOUCHED clusters' old files in;
                    # split clusters were rewritten by partial_recluster.
                    self._carry_index_files(
                        fs,
                        entry,
                        data_dir,
                        skip_subdirs=[f"cluster={c}" for c in split_ids],
                    )
                else:
                    assigned = assign_to_centroids(
                        new_df, props["centroids"], props["idCol"], props["vecCol"]
                    )
                    if props.get("pqM"):
                        # Frozen-codebook encode: the appended vectors get
                        # the same m-byte codes the build would assign, so
                        # old and new rows score identically at query time.
                        from hyperspace_spark.config import DATA_FILE_ID_COLUMN
                        from hyperspace_spark.indexes.ann import _encode_udf
                        from pyspark.sql import functions as F

                        _lin = (
                            [DATA_FILE_ID_COLUMN]
                            if DATA_FILE_ID_COLUMN in assigned.columns
                            else []
                        )
                        assigned = assigned.select(
                            "vec_id",
                            _encode_udf(props["codebooks"])(
                                F.col("unit_vec")
                            ).alias("codes"),
                            *_lin,
                            "cluster",
                        )
                    # append: a delete-rewrite may already have written
                    # surviving rows under this version dir.
                    assigned.write.partitionBy("cluster").mode("append").parquet(
                        data_dir
                    )
                    # Hardlink the old cluster files into the new version,
                    # PRESERVING the cluster=N partition subpath (minus
                    # any files the delete-rewrite replaced).
                    self._carry_index_files(
                        fs, entry, data_dir, skip_files=skip_files
                    )
                new_files = {f.key(): f for f in live}
                entry.relations[0].files = [
                    FileInfo(f.path, f.size, f.mtime, tracker.add_or_get(f))
                    for f in new_files.values()
                ]
                entry.signature = _signature_of(
                    _scan_of(entry.relations[0]), entry.relations[0].files
                )
                entry.index_data_dirs = [data_dir]
                entry.data_version = version
                entry.content_files = [
                    FileInfo(s.path, s.size, s.mtime)
                    for s in fs.list_files_recursive(data_dir)
                ]
                entry.appended_files = []
                entry.deleted_files = []
                return entry
            if entry.derived_kind == "TXT":
                # Posting increment: retained bucket files hardlink into
                # the new version (flat bucketed layout), the NEW docs'
                # postings append as extra per-bucket files under the
                # same bucket spec.  r10: DELETES rewrite only the
                # posting files holding the deleted docs' rows (lineage
                # anti-filter — postings carry the source file id), so a
                # delete costs index-bytes of the affected files, never a
                # corpus re-tokenize; the rewritten survivors re-enter
                # through the same bucketed write, so bucket pruning is
                # untouched.  A STALE index still answers exactly either
                # way (query-time anti-filter).
                import json as _json

                from pyspark.sql import functions as _F
                from pyspark.sql.types import StructType as _ST

                from hyperspace_spark.config import DATA_FILE_ID_COLUMN as _FID
                from hyperspace_spark.indexes.covering import table_name
                from hyperspace_spark.indexes.inverted import (
                    InvertedTextIndexConfig,
                    postings_df,
                )

                props = entry.derived_properties
                appended = [
                    FileInfo(f.path, f.size, f.mtime, tracker.add_or_get(f))
                    for f in appended
                ]
                cfg = InvertedTextIndexConfig(
                    entry.name, props["textCol"], props["idCol"]
                )
                new_postings = None
                if appended:
                    new_df = _relation_reader(
                        self.spark, rel, with_base_path=True
                    ).load([f.path for f in appended])
                    new_postings = postings_df(
                        self.spark, new_df, cfg, appended, tracker
                    ).persist()
                skip_files: list[str] = []
                survivors = None
                dead_ids: list[int] = []
                if deleted:
                    from hyperspace_spark.indexes.covering import (
                        lineage_affected_files,
                    )

                    dead_ids = [
                        i
                        for i in (tracker.get(f) for f in deleted)
                        if i is not None
                    ]
                    _schema = _ST.fromJson(_json.loads(props["schemaJson"]))
                    old_postings = self.spark.read.schema(_schema).parquet(
                        *entry.index_data_dirs
                    )
                    skip_files = lineage_affected_files(old_postings, dead_ids)
                    if skip_files:
                        survivors = (
                            self.spark.read.schema(_schema)
                            .parquet(*skip_files)
                            .filter(~_F.col(_FID).isin(dead_ids))
                        )
                data_dir = mgr.data_dir(version)
                os.makedirs(data_dir, exist_ok=True)
                self._carry_index_files(fs, entry, data_dir, skip_files=skip_files)
                nb = props["numBuckets"]
                tbl = table_name(entry.name, version)
                # Register the new version's external bucketed table over
                # the hardlinked files FIRST: saveAsTable(mode=append) on
                # a NON-existent table is CTAS and CLEARS the target
                # directory, silently dropping the retained postings.
                # Appending to the pre-registered table keeps them.
                self.spark.sql(f"DROP TABLE IF EXISTS {tbl}")
                schema = _ST.fromJson(_json.loads(props["schemaJson"]))
                cols_ddl = ", ".join(
                    f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
                )
                self.spark.sql(
                    f"CREATE TABLE {tbl} ({cols_ddl}) USING parquet "
                    f"CLUSTERED BY (`token`) SORTED BY (`token`) "
                    f"INTO {nb} BUCKETS LOCATION '{data_dir}'"
                )
                delta = new_postings
                if survivors is not None:
                    delta = (
                        survivors
                        if delta is None
                        else delta.unionByName(survivors)
                    )
                if delta is not None:
                    (
                        delta.repartition(nb, _F.col("token"))
                        .write.format("parquet")
                        .mode("append")
                        .bucketBy(nb, "token")
                        .sortBy("token")
                        .option("path", data_dir)
                        .saveAsTable(tbl)
                    )
                props["tableName"] = tbl
                # Merge the appended files' BM25 corpus stats (docs with
                # >= 1 token, total tokens) into the per-file stats map —
                # one tiny aggregate over the (persisted) posting delta,
                # so ranked retrieval stays exact after refresh; deleted
                # files' stats rows drop (their postings just left).
                merged = dict(props.get("fileDocStats") or {})
                for i in dead_ids:
                    merged.pop(str(i), None)
                if new_postings is not None:
                    stat_rows = (
                        new_postings.groupBy(_FID)
                        .agg(
                            _F.count_distinct("_doc").alias("_nd"),
                            _F.sum("tf").cast("long").alias("_nt"),
                        )
                        .collect()
                    )
                    merged.update(
                        {str(r[0]): [int(r["_nd"]), int(r["_nt"])] for r in stat_rows}
                    )
                    new_postings.unpersist()
                props["fileDocStats"] = merged
                new_files = {f.key(): f for f in live}
                entry.relations[0].files = [
                    FileInfo(f.path, f.size, f.mtime, tracker.add_or_get(f))
                    for f in new_files.values()
                ]
                entry.signature = _signature_of(
                    _scan_of(entry.relations[0]), entry.relations[0].files
                )
                entry.index_data_dirs = [data_dir]
                entry.data_version = version
                entry.content_files = [
                    FileInfo(s.path, s.size, s.mtime)
                    for s in fs.list_files_recursive(data_dir)
                ]
                entry.appended_files = []
                entry.deleted_files = []
                return entry
            if entry.derived_kind != "CI":
                raise HyperspaceException(
                    f"incremental refresh not supported for kind {entry.derived_kind}; use full"
                )
            props = entry.derived_properties
            if deleted and not props.get("lineage", False):
                raise HyperspaceException("cannot handle deleted files without lineage")

            # Append-only delta (the common 100 TB shape: new files land,
            # nothing deleted): write ONLY the appended rows as additional
            # bucket files and hardlink the existing index files into the
            # new version dir — zero read or write amplification on the
            # already-indexed data.  Multiple files per bucket are fine
            # for Spark's bucketed scan (it groups by the bucket id in the
            # file name); quick optimize later compacts the accumulation.
            append_only = bool(appended) and not deleted
            parts = []
            if not append_only:
                old = self.spark.read.parquet(*entry.index_data_dirs)
                if deleted:
                    ids = [tracker.get(f) for f in deleted]
                    old = old.filter(
                        ~F.col(DATA_FILE_ID_COLUMN).isin([i for i in ids if i is not None])
                    )
                parts = [old]
            if appended:
                appended = [FileInfo(f.path, f.size, f.mtime, tracker.add_or_get(f)) for f in appended]
                new_df = _relation_reader(self.spark, rel, with_base_path=True).load(
                    [f.path for f in appended]
                )
                if props.get("filterPredicate"):
                    # Partial index: appended files contribute only the
                    # rows satisfying the build predicate, exactly like
                    # the create path.
                    new_df = new_df.filter(props["filterPredicate"])
                if props.get("lineage", False):
                    new_df = cov.with_lineage(new_df, self.spark, appended, tracker)
                # Flatten dotted (nested) columns exactly like the build
                # path — the existing index data stores __hs_nested.* names.
                from hyperspace_spark.config import NESTED_PREFIX

                select_exprs = [
                    F.col(c).alias(NESTED_PREFIX + c) if "." in c else F.col(c)
                    for c in props["indexedColumns"] + props["includedColumns"]
                ]
                if props.get("lineage", False):
                    select_exprs.append(F.col(DATA_FILE_ID_COLUMN))
                parts.append(new_df.select(*select_exprs))
            merged = parts[0]
            for p in parts[1:]:
                merged = merged.unionByName(p)
            data_dir = mgr.data_dir(version)
            tbl = cov.table_name(name, version)
            cov.write_bucketed(
                self.spark,
                merged,
                [cov.flattened_name(c) for c in props["indexedColumns"]],
                props["numBuckets"],
                data_dir,
                tbl,
            )
            props["tableName"] = tbl
            if append_only:
                for f in entry.content_files:
                    fs.link_or_copy(
                        f.path, os.path.join(data_dir, f.path.rsplit("/", 1)[-1])
                    )
            new_files = {f.key(): f for f in live}
            entry.relations[0].files = [
                FileInfo(f.path, f.size, f.mtime, tracker.add_or_get(f)) for f in new_files.values()
            ]
            entry.signature = _signature_of(_scan_of(entry.relations[0]), entry.relations[0].files)
            entry.index_data_dirs = [data_dir]
            entry.data_version = version
            entry.content_files = [
                FileInfo(s.path, s.size, s.mtime) for s in fs.list_files_recursive(data_dir)
            ]
            entry.appended_files = []
            entry.deleted_files = []
            return entry

        try:
            self._transact(name, conf, States.REFRESHING, States.ACTIVE, op)
        except _FallBackToFull:
            self.cancel(name)
            self._refresh_full(name)

    def _refresh_quick(self, name: str) -> None:
        """Metadata-only refresh: record the file delta in the log; hybrid
        scan compensates at query time (reference: RefreshQuickAction.scala:32-80)."""
        conf = self.conf()
        fs = self._fs(conf)

        def op(entry: IndexLogEntry, mgr: IndexLogManager, version: int) -> IndexLogEntry:
            rel = entry.relations[0]
            live = live_source_files(_scan_of(rel), fs)
            indexed = entry.source_files_by_key()
            live_by_key = {f.key(): f for f in live}
            entry.appended_files = [f for k, f in live_by_key.items() if k not in indexed]
            entry.deleted_files = [f for k, f in indexed.items() if k not in live_by_key]
            return entry

        self._transact(name, conf, States.REFRESHING, States.ACTIVE, op)

    # ------------------------------------------------------------------
    # optimize / delete / restore / vacuum / cancel
    # ------------------------------------------------------------------
    def optimize_index(self, name: str, mode: str = "quick") -> None:
        """Compact index data files (reference: actions/OptimizeAction.scala:57-148).
        quick (CI): PER-BUCKET — only buckets with >1 sub-threshold file are
        rewritten; every other file is hardlinked into the new version dir
        untouched, so cost scales with the fragmentation, not the index.
        quick (ANN): PER-CLUSTER — same shape over the cluster=N layout.
        quick (DS/Z): no-op unless some data file is below the threshold.
        full: always rewrite everything.  Neither mode scans the source."""
        conf = self.conf()
        if mode not in ("quick", "full"):
            # Mirror refresh_index: a typo must not silently trigger the
            # expensive full rewrite the quick guard exists to avoid.
            raise HyperspaceException(f"unknown optimize mode: {mode!r}")
        self._require_state(name, conf, States.ACTIVE, "optimizeIndex")
        fs = self._fs(conf)

        def op(entry: IndexLogEntry, mgr: IndexLogManager, version: int) -> IndexLogEntry:
            small = [f for f in entry.content_files if f.size < conf.optimize_file_size_threshold]
            if mode == "quick" and len(small) <= 1:
                return entry
            from hyperspace_spark.indexes import covering as cov

            props = entry.derived_properties
            data_dir = mgr.data_dir(version)

            if entry.derived_kind == "ANN":
                # Per-CLUSTER compaction — the ANN analog of per-bucket:
                # assign-only incremental refreshes accumulate one small
                # file per touched cluster per refresh; quick rewrites
                # only clusters holding >1 sub-threshold file (the rest
                # hardlink through with their cluster=N subpath), full
                # rewrites everything to one file per cluster.  Rows never
                # change cluster, so ann_search's partition pruning is
                # preserved by construction.
                import json as _json

                from pyspark.sql.types import StructType

                old_base = entry.index_data_dirs[-1].rstrip("/")
                schema = StructType.fromJson(_json.loads(props["schemaJson"]))
                by_cluster: dict[str, list[FileInfo]] | None = {}
                for f in small:
                    rel_path = (
                        f.path[len(old_base) + 1 :]
                        if f.path.startswith(old_base + "/")
                        else ""
                    )
                    if "/" not in rel_path:
                        by_cluster = None  # unexpected layout: never guess
                        break
                    by_cluster.setdefault(rel_path.split("/", 1)[0], []).append(f)
                if mode == "quick" and by_cluster is not None:
                    to_compact = [
                        f for fl in by_cluster.values() if len(fl) > 1 for f in fl
                    ]
                    if not to_compact:
                        return entry  # every cluster already has <=1 small file
                    compact_set = {f.path for f in to_compact}
                    retained = [
                        f for f in entry.content_files if f.path not in compact_set
                    ]
                    df = (
                        self.spark.read.schema(schema)
                        .option("basePath", old_base)
                        .parquet(*sorted(compact_set))
                    )
                    # sub-threshold files by definition: one task suffices
                    df.coalesce(1).write.partitionBy("cluster").mode(
                        "overwrite"
                    ).parquet(data_dir)
                    for f in retained:
                        rel_path = (
                            f.path[len(old_base) + 1 :]
                            if f.path.startswith(old_base + "/")
                            else f.path.rsplit("/", 1)[-1]
                        )
                        fs.link_or_copy(f.path, os.path.join(data_dir, rel_path))
                else:
                    df = (
                        self.spark.read.schema(schema)
                        .option("basePath", old_base)
                        .parquet(*entry.index_data_dirs)
                    )
                    df.repartition("cluster").write.partitionBy("cluster").mode(
                        "overwrite"
                    ).parquet(data_dir)
                entry.index_data_dirs = [data_dir]
                entry.data_version = version
                entry.content_files = [
                    FileInfo(s.path, s.size, s.mtime)
                    for s in fs.list_files_recursive(data_dir)
                ]
                return entry

            if mode == "quick" and entry.derived_kind in ("CI", "TXT"):
                # Per-bucket compaction (reference OptimizeAction.scala:
                # 96-114; TXT postings share the CI's flat bucketed
                # layout, so the same path compacts the small per-refresh
                # posting files): rewrite ONLY buckets holding >1 sub-threshold
                # file; every other file — the large ones that dominate a
                # 100 TB index — is carried into the new version dir by an
                # O(1) hardlink (fs.link_or_copy), never re-read or
                # re-written.  Rows from bucket b re-hash to bucket b
                # (same murmur3, same numBuckets), so a bucketBy write of
                # just the small files' rows produces correctly-named
                # replacement files for exactly the affected buckets.
                by_bucket: dict[int, list[FileInfo]] = {}
                parseable = True
                for f in small:
                    m = cov._BUCKET_FILE_RE.search(f.path.rsplit("/", 1)[-1])
                    if m is None:
                        parseable = False  # unexpected layout: never guess
                        break
                    by_bucket.setdefault(int(m.group(1)), []).append(f)
                if parseable:
                    to_compact = [
                        f for fl in by_bucket.values() if len(fl) > 1 for f in fl
                    ]
                    if not to_compact:
                        return entry  # every bucket already has ≤1 small file
                    compact_set = {f.path for f in to_compact}
                    retained = [
                        f for f in entry.content_files if f.path not in compact_set
                    ]
                    from pyspark.sql.types import StructType
                    import json as _json

                    schema = StructType.fromJson(_json.loads(props["schemaJson"]))
                    df = self.spark.read.schema(schema).parquet(
                        *sorted(compact_set)
                    )
                    tbl = cov.table_name(name, version)
                    cov.write_bucketed(
                        self.spark,
                        df,
                        [cov.flattened_name(c) for c in props["indexedColumns"]],
                        props["numBuckets"],
                        data_dir,
                        tbl,
                    )
                    props["tableName"] = tbl
                    for f in retained:
                        fs.link_or_copy(
                            f.path,
                            os.path.join(data_dir, f.path.rsplit("/", 1)[-1]),
                        )
                    entry.index_data_dirs = [data_dir]
                    entry.data_version = version
                    entry.content_files = [
                        FileInfo(s.path, s.size, s.mtime)
                        for s in fs.list_files_recursive(data_dir)
                    ]
                    return entry
                # fall through: unparseable file names -> full rewrite

            df = self.spark.read.parquet(*entry.index_data_dirs)
            if entry.derived_kind == "DS":
                # Skipping index data is tiny (one row per source file):
                # compact to a single file.
                df.coalesce(1).write.mode("overwrite").parquet(data_dir)
            elif entry.derived_kind in ("CI", "TXT"):
                tbl = cov.table_name(name, version)
                cov.write_bucketed(
                    self.spark,
                    df,
                    [cov.flattened_name(c) for c in props["indexedColumns"]],
                    props["numBuckets"],
                    data_dir,
                    tbl,
                )
                props["tableName"] = tbl
            else:
                from hyperspace_spark.indexes.zorder import rewrite_zorder_data

                rewrite_zorder_data(self.spark, df, props, data_dir)
            entry.index_data_dirs = [data_dir]
            entry.data_version = version
            entry.content_files = [
                FileInfo(s.path, s.size, s.mtime) for s in fs.list_files_recursive(data_dir)
            ]
            return entry

        self._transact(name, conf, States.OPTIMIZING, States.ACTIVE, op)

    def delete_index(self, name: str) -> None:
        conf = self.conf()
        self._require_state(name, conf, States.ACTIVE, "deleteIndex")
        self._transact(name, conf, States.DELETING, States.DELETED, lambda e, m, v: e)

    def restore_index(self, name: str) -> None:
        conf = self.conf()
        self._require_state(name, conf, States.DELETED, "restoreIndex")
        self._transact(name, conf, States.RESTORING, States.ACTIVE, lambda e, m, v: e)

    def vacuum_index(self, name: str) -> None:
        """DELETED -> DOESNOTEXIST; physically removes index data
        (reference: actions/VacuumAction.scala)."""
        conf = self.conf()
        self._require_state(name, conf, States.DELETED, "vacuumIndex")
        fs = self._fs(conf)

        def op(entry: IndexLogEntry, mgr: IndexLogManager, version: int) -> IndexLogEntry:
            for d in fs.list_dir(os.path.join(conf.system_path, name)):
                if os.path.basename(d.rstrip("/")).startswith("v__="):
                    fs.delete(d, recursive=True)
            entry.index_data_dirs = []
            entry.content_files = []
            return entry

        self._transact(name, conf, States.VACUUMING, States.DOESNOTEXIST, op)

    def vacuum_outdated_indexes(self, name: str) -> None:
        """Keep only the latest version's data files and logs
        (reference: actions/VacuumOutdatedAction.scala:30-144)."""
        conf = self.conf()
        self._require_state(name, conf, States.ACTIVE, "vacuumOutdatedIndexes")
        fs = self._fs(conf)

        def op(entry: IndexLogEntry, mgr: IndexLogManager, version: int) -> IndexLogEntry:
            keep = {os.path.basename(d.rstrip("/")) for d in entry.index_data_dirs}
            for d in fs.list_dir(os.path.join(conf.system_path, name)):
                base = os.path.basename(d.rstrip("/"))
                if base.startswith("v__=") and base not in keep:
                    fs.delete(d, recursive=True)
            return entry

        self._transact(name, conf, States.VACUUMINGOUTDATED, States.ACTIVE, op)

    def cancel(self, name: str) -> None:
        """Roll a stuck transient state back to the last stable log
        (reference: actions/CancelAction.scala)."""
        conf = self.conf()
        mgr = self._log_mgr(name, conf)
        latest = mgr.get_latest_log()
        if latest is None:
            raise HyperspaceException(f"Index {name} does not exist.")
        if latest.state in States.STABLE:
            raise HyperspaceException(f"Index {name} is in stable state {latest.state}; nothing to cancel.")
        stable = mgr.get_latest_stable_log()
        if stable is None:
            raise HyperspaceException(f"Index {name} has no stable version to roll back to.")
        rolled = stable.with_state(stable.state, latest.id + 1)
        if not mgr.write_log(rolled.id, rolled):
            raise ConcurrentModificationError(f"Concurrent modification on index {name}.")
        mgr.update_latest_stable(rolled.id)
        self._invalidate_cache()

    def _require_state(self, name: str, conf: HyperspaceConf, state: str, op: str) -> None:
        e = self._log_mgr(name, conf).get_latest_log()
        if e is None:
            raise HyperspaceException(f"Index {name} does not exist.")
        if e.state != state:
            raise HyperspaceException(f"{op} requires state {state}; {name} is {e.state}.")

    # ------------------------------------------------------------------
    # introspection (reference: IndexStatistics.scala, PlanAnalyzer.scala)
    # ------------------------------------------------------------------
    def indexes(self) -> "DataFrame":
        conf = self.conf()
        rows = []
        for e in self._all_latest_entries(conf):
            p = e.derived_properties
            rows.append(
                (
                    e.name,
                    e.derived_kind,
                    # (c.get("columns") or ["?"]): a column-less sketch
                    # (RowCount) serializes columns=[], and dict.get
                    # returns that EXISTING empty list, not the default —
                    # [0] then raised for any index carrying one.
                    p.get(
                        "indexedColumns",
                        [
                            (c.get("columns") or ["?"])[0]
                            for c in p.get("sketches", [])
                        ],
                    ),
                    p.get("includedColumns", []),
                    int(p.get("numBuckets", 0)),
                    e.state,
                    sum(f.size for f in e.content_files),
                    len(e.content_files),
                    e.data_version,
                    ",".join(e.index_data_dirs),
                    p.get("filterPredicate"),
                )
            )
        return self.spark.createDataFrame(
            rows,
            "name string, kind string, indexedColumns array<string>, includedColumns array<string>, "
            "numBuckets int, state string, indexSizeBytes long, numIndexFiles int, version int, dataDirs string, "
            "wherePredicate string",
        )

    def index(self, name: str) -> "DataFrame":
        conf = self.conf()
        e = self._log_mgr(name, conf).get_latest_log()
        if e is None:
            raise HyperspaceException(f"Index {name} does not exist.")
        p = e.derived_properties
        row = (
            e.name,
            e.derived_kind,
            str(p),
            e.state,
            e.signature,
            len(e.source_files),
            len(e.appended_files),
            len(e.deleted_files),
            sum(f.size for f in e.content_files),
            e.data_version,
        )
        return self.spark.createDataFrame(
            [row],
            "name string, kind string, derivedProperties string, state string, signature string, "
            "numSourceFiles int, numAppendedFiles int, numDeletedFiles int, indexSizeBytes long, version int",
        )

    def analyze_file_distribution(self, df: "DataFrame", column: str) -> str:
        """Per-file min/max distribution analysis for a column: estimates
        how many files a point lookup would touch with file-level skipping
        (reference: util/MinMaxAnalysisUtil.scala:773-778)."""
        from pyspark.sql import functions as F

        per_file = (
            df.withColumn("_hs_file", F.input_file_name())
            .groupBy("_hs_file")
            .agg(F.min(column).alias("min"), F.max(column).alias("max"))
            .collect()
        )
        n = len(per_file)
        ranges = sorted((r["min"], r["max"]) for r in per_file if r["min"] is not None)
        # For each file's range, count how many other files overlap it —
        # the per-file estimate of lookup fan-out.
        overlaps = [
            sum(1 for lo2, hi2 in ranges if not (hi2 < lo or lo2 > hi)) for lo, hi in ranges
        ]
        avg = sum(overlaps) / len(overlaps) if overlaps else 0.0
        mx = max(overlaps, default=0)
        lines = [
            f"File distribution analysis for column '{column}'",
            f"  files analyzed:            {n}",
            f"  avg files per point lookup: {avg:.2f}",
            f"  max files per point lookup: {mx}",
            f"  skipping effectiveness:     {100 * (1 - avg / n):.1f}% pruned on average" if n else "",
        ]
        return "\n".join(l for l in lines if l)

    def explain(self, df: "DataFrame", verbose: bool = False, mode: str = "plaintext") -> str:
        """Plans with vs without indexes + used-index list
        (reference: plananalysis/PlanAnalyzer.scala:48-181).

        ``mode`` mirrors the reference's DisplayMode.scala: 'plaintext'
        (default), 'console' (ANSI-highlights used index names), or
        'html' (a <pre> block with <b> highlights, notebook-embeddable)."""
        if mode not in ("plaintext", "console", "html"):
            raise HyperspaceException("explain mode must be 'plaintext', 'console', or 'html'")
        # Collect per-branch index-OR statistics emitted when the winning
        # plan replays (FilterOrIndexRule's replacement): which index
        # serves each disjunct and how many index files the branch reads.
        from hyperspace_spark.telemetry import off_event, on_event

        or_branches: list[str] = []

        def _collect_or(ev) -> None:
            if ev.kind == "or_branch":
                or_branches.append(ev.detail)

        on_event(_collect_or)
        try:
            # Fresh Reasons bypasses the apply cache: explain is a
            # diagnostic, and a cache hit would skip the replay that
            # emits the per-branch events.
            accelerated, used = self._apply_with_info(df, reasons=Reasons())
        finally:
            off_event(_collect_or)
        orig_plan = df._jdf.queryExecution().executedPlan().toString()
        out = []
        out.append("=" * 60)
        out.append("Plan with Hyperspace indexes")
        out.append("=" * 60)
        if used:
            out.append(accelerated._jdf.queryExecution().executedPlan().toString())
        else:
            out.append("<no index applied>")
        out.append("=" * 60)
        out.append("Plan without indexes")
        out.append("=" * 60)
        out.append(orig_plan)
        out.append("=" * 60)
        out.append(f"Indexes used: {', '.join(used) if used else '<none>'}")
        if verbose and used:
            out.append("Physical operator diff:")
            orig_ops = _op_histogram(orig_plan)
            new_ops = _op_histogram(accelerated._jdf.queryExecution().executedPlan().toString())
            for op_name in sorted(set(orig_ops) | set(new_ops)):
                a, b = orig_ops.get(op_name, 0), new_ops.get(op_name, 0)
                if a != b:
                    out.append(f"  {op_name}: {a} -> {b}")
            if or_branches:
                out.append("Index-OR branches:")
                for line in or_branches:
                    out.append(f"  {line}")
        text = "\n".join(out)
        if mode == "plaintext":
            return text
        if mode == "console":
            for n in used:
                text = text.replace(n, f"\x1b[1m{n}\x1b[0m")
            return text
        import html as _html

        escaped = _html.escape(text)
        for n in used:
            escaped = escaped.replace(_html.escape(n), f"<b>{_html.escape(n)}</b>")
        return f"<pre>{escaped}</pre>"

    def text_search(
        self,
        index_name: str,
        terms,
        mode: str = "all",
    ) -> "DataFrame":
        """Doc ids whose text contains ALL (default) or ANY of ``terms``,
        from a persisted inverted text index (kind TXT) — a bucket-pruned
        read of only the probed tokens' postings, never the corpus text.

        Hybrid-exact against live source state: source files appended
        since the index build are tokenized on the fly (raw read of only
        those files); deleted files' postings drop via the lineage
        anti-filter."""
        from hyperspace_spark.indexes.inverted import text_search

        entry, appended, deleted = self._txt_entry(index_name)
        return text_search(
            self.spark, entry, terms, mode, appended=appended, deleted=deleted
        )

    def text_search_ranked(
        self,
        index_name: str,
        terms,
        k: int = 10,
        k1: float = 1.2,
        b: float = 0.75,
        filter_query: str | None = None,
    ) -> "DataFrame":
        """BM25 top-k retrieval from a persisted TXT index: docs matching
        ANY term, ranked by the Lucene-default BM25 score computed over
        the probed tokens' postings only (tf/dl ride the postings; N and
        avgdl come from per-file stats in the entry — no corpus job).
        Returns (id_col, score) with ties ranked by id.  Hybrid-exact:
        appended source files score on the fly, deleted files' postings
        and corpus stats are subtracted.  ``filter_query`` restricts
        candidates to docs satisfying a boolean term query (Lucene
        filter-context semantics: the filter never affects scoring)."""
        from hyperspace_spark.indexes.inverted import text_search_ranked

        entry, appended, deleted = self._txt_entry(index_name)
        return text_search_ranked(
            self.spark,
            entry,
            terms,
            k=k,
            k1=k1,
            b=b,
            filter_query=filter_query,
            appended=appended,
            deleted=deleted,
        )

    def text_search_boolean(self, index_name: str, query: str) -> "DataFrame":
        """Doc ids satisfying a boolean term query — ``'(quick AND brown)
        OR (lazy AND NOT dog)'`` — from the TXT index: ONE bucket-pruned
        probe for all the query's terms, membership evaluated per doc.
        Negation-only queries (satisfiable by a doc containing none of
        the terms) are refused — they'd need a corpus scan.
        Hybrid-exact like text_search."""
        from hyperspace_spark.indexes.inverted import text_search_boolean

        entry, appended, deleted = self._txt_entry(index_name)
        return text_search_boolean(
            self.spark, entry, query, appended=appended, deleted=deleted
        )

    def text_search_phrase(self, index_name: str, phrase: str) -> "DataFrame":
        """Exact consecutive-token phrase match from the TXT index's
        positional postings: candidates come from the bucket-pruned
        all-terms probe, adjacency verifies in-row on the positions
        arrays of the candidate docs ONLY — the corpus text is never
        read.  Hybrid-exact like text_search."""
        from hyperspace_spark.indexes.inverted import text_search_phrase

        entry, appended, deleted = self._txt_entry(index_name)
        return text_search_phrase(
            self.spark, entry, phrase, appended=appended, deleted=deleted
        )

    def _txt_entry(self, index_name: str):
        conf = self.conf()
        entry = next(
            (e for e in self._active_entries(conf) if e.name == index_name), None
        )
        if entry is None or entry.derived_kind != "TXT":
            raise HyperspaceException(f"No ACTIVE TXT index named {index_name!r}.")
        fs = self._fs(conf)
        _live, appended, deleted = self._source_delta(entry, fs)
        return entry, appended, deleted

    def ann_search(
        self,
        index_name: str,
        query_vectors: dict[int, list[float]] | None = None,
        query_ids: list[int] | None = None,
        k: int = 10,
        n_probe: int = 4,
        refine_factor: int = 4,
        where: str | None = None,
    ) -> "DataFrame":
        """Top-k cosine neighbors from a persisted IVF index (kind ANN).

        ``where`` runs a FILTERED search: neighbors are the exact top-k
        among LIVE source rows satisfying the predicate (pre-filter
        semantics; evaluated on the source, joined to candidates by id).
        A selective filter thins each probed cluster — raise n_probe to
        hold recall; at n_probe = n_clusters the filtered result is
        exact.

        Pass explicit ``query_vectors`` ({id: vector}), or ``query_ids``
        to look the vectors up in the LIVE corpus (for IVF-PQ entries in
        the source — PQ rows carry codes, not vectors; for flat entries
        in the index, falling back to appended source files for ids the
        index hasn't absorbed yet).
        ``refine_factor`` applies to IVF-PQ only: the exact re-rank pool
        is ``k x refine_factor`` ADC candidates per query.

        Hybrid-exact on a stale index (r10): deleted source files'
        vectors anti-filter out by lineage, appended files' vectors
        assign/encode on the fly against the frozen quantizer — results
        equal an incrementally refreshed index's exactly, so searches
        between refreshes never see ghosts or miss new data."""
        from hyperspace_spark.indexes.ann import ann_search

        conf = self.conf()
        entry = next(
            (e for e in self._active_entries(conf) if e.name == index_name), None
        )
        if entry is None or entry.derived_kind != "ANN":
            raise HyperspaceException(f"No ACTIVE ANN index named {index_name!r}.")
        fs = self._fs(conf)
        _live, appended, deleted = self._source_delta(entry, fs)
        # Self-exclusion only applies when queries ARE corpus vectors
        # (query_ids path); external query_vectors ids are an unrelated
        # namespace and must not shadow same-numbered corpus vectors.
        exclude_self = query_vectors is None
        props = entry.derived_properties
        pq = bool(props.get("pqM"))
        if query_vectors is None:
            if not query_ids:
                raise HyperspaceException("provide query_vectors or query_ids")
            from pyspark.sql import functions as F

            if pq:
                # PQ rows carry codes, not vectors: look the query
                # vectors up in the SOURCE (id-filter pushdown, pruned;
                # the source IS the live corpus, so appends/deletes are
                # already reflected).
                src = self._source_df(entry)
                rows = (
                    src.filter(F.col(props["idCol"]).isin(list(query_ids)))
                    .select(
                        F.col(props["idCol"]).alias("vec_id"),
                        F.col(props["vecCol"]).alias("unit_vec"),
                    )
                    .collect()
                )
            else:
                import json as _json

                from hyperspace_spark.config import DATA_FILE_ID_COLUMN
                from pyspark.sql.types import StructType

                schema = StructType.fromJson(_json.loads(props["schemaJson"]))
                idx = (
                    self.spark.read.schema(schema)
                    .option("basePath", entry.index_data_dirs[-1])
                    .parquet(*entry.index_data_dirs)
                )
                if deleted and props.get("lineage"):
                    # a deleted vector must not resolve as a query anchor
                    tracker = entry.file_id_tracker
                    dead = [tracker.get(f) for f in deleted]
                    idx = idx.filter(
                        ~F.col(DATA_FILE_ID_COLUMN).isin(
                            [i for i in dead if i is not None]
                        )
                    )
                rows = idx.filter(idx.vec_id.isin(list(query_ids))).select("vec_id", "unit_vec").collect()
                found0 = {r.vec_id for r in rows}
                still = [q for q in set(query_ids) - found0]
                if still and appended:
                    # ids that landed since the last refresh live only in
                    # the appended source files — same normalization as
                    # the index build (unit_expr applies in ann_search).
                    raw = _relation_reader(
                        self.spark, entry.relations[0], with_base_path=True
                    ).load([f.path for f in appended])
                    rows += (
                        raw.filter(F.col(props["idCol"]).isin(still))
                        .select(
                            F.col(props["idCol"]).alias("vec_id"),
                            F.col(props["vecCol"]).alias("unit_vec"),
                        )
                        .collect()
                    )
            found = {r.vec_id for r in rows}
            missing = sorted(set(query_ids) - found)
            if missing:
                raise HyperspaceException(f"query ids not in index: {missing}")
            query_vectors = {r.vec_id: list(r.unit_vec) for r in rows}
        allowed_df = None
        if where is not None:
            from pyspark.sql import functions as F

            allowed_df = self._source_df(entry).filter(where).select(
                F.col(props["idCol"])
            )
        return ann_search(
            self.spark,
            entry,
            query_vectors,
            exclude_self=exclude_self,
            k=k,
            n_probe=n_probe,
            source_df=self._source_df(entry) if pq else None,
            refine_factor=refine_factor,
            appended=appended,
            deleted=deleted,
            allowed_df=allowed_df,
        )

    def ann_join(
        self,
        index_name: str,
        queries_df: "DataFrame",
        k: int = 10,
        n_probe: int = 4,
        id_col: str = "qid",
        vec_col: str = "qvec",
        exclude_self: bool = False,
        where: str | None = None,
        refine_factor: int = 4,
    ) -> "DataFrame":
        """Distributed k-NN JOIN: top-k cosine neighbors for EVERY row of
        ``queries_df`` from a persisted flat IVF index — the query side
        stays a DataFrame end-to-end (probe assignment is an Arrow
        matmul over query partitions), so million-query batches never
        touch the driver.  Hybrid-exact like ann_search: deleted files'
        vectors anti-filter by lineage, appended files' vectors assign
        to the frozen centroids on the fly.  ``where`` runs a FILTERED
        join (pre-filter semantics, like ann_search's where=).  IVF-PQ
        entries score codes with per-query ADC tables in the same
        cogrouped kernel, then re-rank a k x refine_factor pool exactly
        against the source."""
        from hyperspace_spark.indexes.ann import ann_join

        conf = self.conf()
        entry = next(
            (e for e in self._active_entries(conf) if e.name == index_name), None
        )
        if entry is None or entry.derived_kind != "ANN":
            raise HyperspaceException(f"No ACTIVE ANN index named {index_name!r}.")
        fs = self._fs(conf)
        _live, appended, deleted = self._source_delta(entry, fs)
        allowed_df = None
        if where is not None:
            from pyspark.sql import functions as F

            allowed_df = self._source_df(entry).filter(where).select(
                F.col(entry.derived_properties["idCol"])
            )
        pq = bool(entry.derived_properties.get("pqM"))
        return ann_join(
            self.spark,
            entry,
            queries_df,
            k=k,
            n_probe=n_probe,
            id_col=id_col,
            vec_col=vec_col,
            exclude_self=exclude_self,
            appended=appended,
            deleted=deleted,
            allowed_df=allowed_df,
            source_df=self._source_df(entry) if pq else None,
            refine_factor=refine_factor,
        )

    def why_not(
        self, df: "DataFrame", index_name: str | None = None, extended: bool = False
    ) -> str:
        """Why didn't my index apply? (reference: Hyperspace.scala:183-192,
        CandidateIndexAnalyzer.scala; reason catalog FilterReason.scala:33-158).

        ``extended=True`` additionally lists every index's state, kind and
        source roots, and keeps EVERY reason occurrence (the optimizer
        visits the same pattern at several tree levels; the terse form
        dedups to one line per (index, reason))."""
        reasons = Reasons()
        _, used = self._apply_with_info(df, reasons=reasons)
        conf = self.conf()
        lines = [f"Applied indexes: {', '.join(used) if used else '<none>'}"]
        entries = self._all_latest_entries(conf)
        all_names = [e.name for e in entries]
        if extended:
            lines.append("Known indexes:")
            for e in entries:
                if index_name is not None and e.name != index_name:
                    continue
                roots = ", ".join(p for r in e.relations for p in r.root_paths)
                lines.append(f"  {e.name} [{e.derived_kind}] state={e.state} source={roots}")
        reported = {n for n, _, _ in reasons.items}
        seen = set()
        for n, reason, detail in reasons.items:
            if not extended:
                if (n, reason) in seen:
                    continue
                seen.add((n, reason))
            if index_name is None or n == index_name:
                lines.append(f"  {n}: {reason}" + (f" ({detail})" if detail else ""))
        for n in all_names:
            if n in used or n in reported:
                continue
            if index_name is None or n == index_name:
                lines.append(f"  {n}: NOT_CONSIDERED (no matching source relation in plan)")
        # r7: opaque subtrees are the one place a JVM Catalyst rule would
        # see relations this planner cannot — surface them so "my index
        # didn't apply" inside an IN-subquery isn't a silent mystery.
        # (Recorded by _apply_with_info's parse above — no second plan walk.)
        kinds = getattr(reasons, "opaque_kinds", [])
        if kinds:
            lines.append(
                f"  note: {len(kinds)} plan subtree kind(s) not modeled by the Python "
                f"planner (replayed verbatim; relations inside them are not "
                f"index candidates): {', '.join(kinds)}"
            )
        return "\n".join(lines)

    # ------------------------------------------------------------------
    # index recommendation (extension: whyNot explains the miss, this
    # proposes the index that would hit — the advisory loop's other half)
    # ------------------------------------------------------------------
    def _sampled_distinct_ratio(self, scan, col: str, sample_rows: int = 100_000):
        """Distinct-value ratio of ``col`` over a bounded sample of the
        scan, for recommend()'s sketch-kind choice.  LIMIT keeps the job
        O(sample), never O(table) — advisory APIs must stay cheap at
        100 TB.  None on any failure (callers fall back to Bloom, the
        safe generic for equality probes)."""
        try:
            import json as _json

            from pyspark.sql import functions as F
            from pyspark.sql.types import StructType

            r = self.spark.read.format(scan.file_format)
            if scan.data_schema_json:
                r = r.schema(StructType.fromJson(_json.loads(scan.data_schema_json)))
            opts = {k: v for k, v in (scan.options or {}).items() if k.lower() != "path"}
            if opts:
                r = r.options(**opts)
            row = (
                r.load(list(scan.root_paths))
                .select(col)
                .limit(int(sample_rows))
                .agg(F.approx_count_distinct(col).alias("d"), F.count(F.lit(1)).alias("n"))
                .first()
            )
            if not row or not row["n"]:
                return None
            return float(row["d"]) / float(row["n"])
        except Exception:
            return None

    def _ds_covered(self, scan, sketches) -> bool:
        """An ACTIVE skipping index on the same source already holds an
        equivalent sketch for every proposed (kind, column) — a
        ValueList also answers the equality probes a Bloom would."""
        from hyperspace_spark.indexes.sketches import sketch_from_json

        want = {(s.kind, s.column) for s in sketches}
        for e in self._all_latest_entries(self.conf()):
            if e.state != States.ACTIVE or e.derived_kind != "DS":
                continue
            roots = tuple(
                sorted(_norm_path(p) for r in e.relations for p in r.root_paths)
            )
            if roots != scan.normalized_paths():
                continue
            have = set()
            for sj in e.derived_properties.get("sketches", []):
                try:
                    sk = sketch_from_json(sj)
                    have.add((sk.kind, sk.column))
                except Exception:
                    continue
            if all(
                (k, c) in have or (k == "Bloom" and ("ValueList", c) in have)
                for k, c in want
            ):
                return True
        return False

    def recommend(self, df: "DataFrame") -> list[dict]:
        """Covering-index configurations that would accelerate ``df``,
        derived from the query's own shape: filters suggest an index
        keyed on the equality-pinned column (bucket-prunable point
        probes) or the first range column, equi-joins suggest a
        co-bucketed pair keyed on the join columns, aggregates/windows
        suggest the grouping keys.  Suggestions already served by an
        ACTIVE index on the same source are dropped.

        Returns dicts: ``{"config": CoveringIndexConfig, "rule": <the
        planner rule that would consume it>, "reason": <human line>,
        "source": <root paths>}`` — pass ``config`` straight to
        ``create_index``.  Advisory only: nothing is created."""
        from hyperspace_spark.indexes.covering import CoveringIndexConfig
        from hyperspace_spark.planner import ir as _ir
        from hyperspace_spark.planner.parser import parse_df
        from hyperspace_spark.planner.rules import (
            equality_literals,
            match_filter_pattern,
            match_linear_side,
        )
        from hyperspace_spark.planner.expr import split_conjuncts

        try:
            plan = parse_df(df)
        except Exception:
            return []
        conf = self.conf()
        entries_all = [
            e for e in self._all_latest_entries(conf) if e.state == States.ACTIVE
        ]
        entries = [e for e in entries_all if e.derived_kind in ("CI", "ZCI")]

        def same_source(e, scan) -> bool:
            roots = tuple(
                sorted(_norm_path(p) for r in e.relations for p in r.root_paths)
            )
            return roots == scan.normalized_paths()

        def scan_col_types(scan) -> dict:
            import json as _json

            try:
                fields = _json.loads(scan.data_schema_json)["fields"]
            except Exception:
                return {}
            out = {}
            for f in fields:
                t = f.get("type")
                if isinstance(t, dict) and t.get("type") == "array":
                    out[f["name"]] = f"array<{t.get('elementType')}>"
                elif isinstance(t, str):
                    out[f["name"]] = t
            return out

        _id_col_memo: dict[tuple, tuple[str, str]] = {}

        def pick_id_col(scan) -> tuple[str, str]:
            """(id_col, caveat) for TXT/ANN suggestions.  The first
            *id/*key column can be a NON-unique foreign key (a *_sk
            dimension key on a fact table), and TXT/ANN indexes key rows
            by id_col — so run a sampled-uniqueness probe (r13, ADVICE
            r12): prefer the first candidate whose sample has no
            duplicate and no NULL (countDistinct == count implies both).
            A sample can't prove global uniqueness, so the caveat states
            what was checked; when the probe can't run (non-parquet
            source), the 'verify it yourself' caveat stands.

            Memoized per (paths, candidate set) within this recommend()
            call: the probe is a full sampled Spark job, and a table
            with several TXT/ANN candidate columns would otherwise pay
            the identical probe once per column (ADVICE r13)."""
            cands = [
                c
                for c in scan.output
                if c.lower().endswith("id") or c.lower().endswith("key")
            ] or ([scan.output[0]] if scan.output else ["id"])
            memo_key = (scan.normalized_paths(), tuple(cands))
            hit = _id_col_memo.get(memo_key)
            if hit is not None:
                return hit
            try:
                from pyspark.sql import functions as F

                sample = (
                    self.spark.read.parquet(*scan.normalized_paths())
                    .select(*cands)
                    .limit(100_000)
                )
                row = sample.agg(
                    F.count(F.lit(1)).alias("__hs_n"),
                    *[F.countDistinct(c).alias(c) for c in cands],
                ).collect()[0]
                n = row["__hs_n"]
                for c in cands:
                    if n and row[c] == n:
                        out = (c, f"id_col {c} unique over a {n}-row sample")
                        _id_col_memo[memo_key] = out
                        return out
            except Exception:
                pass
            out = (cands[0], f"verify id_col {cands[0]} is a unique row id")
            _id_col_memo[memo_key] = out
            return out

        def covered_by_existing(scan, indexed, required):
            for e in entries:
                roots = tuple(
                    sorted(
                        _norm_path(p) for r in e.relations for p in r.root_paths
                    )
                )
                if roots != scan.normalized_paths():
                    continue
                p = e.derived_properties
                if p.get("filterPredicateExpr"):
                    continue  # partial: can't assume it serves
                have = p.get("indexedColumns", [])
                cov = set(have) | set(p.get("includedColumns", []))
                if have[: len(indexed)] == list(indexed) and set(required) <= cov:
                    return True
            return False

        suggestions: list[dict] = []
        seen_keys: set[tuple] = set()

        def add(scan, indexed, required, rule, reason):
            indexed = [c for c in indexed if "." not in c]
            if not indexed:
                return
            included = sorted(c for c in required if c not in indexed and "." not in c)
            key = (scan.normalized_paths(), tuple(indexed), tuple(included))
            if key in seen_keys or covered_by_existing(scan, indexed, required):
                return
            seen_keys.add(key)
            name = f"hs_rec_{len(suggestions)}_{indexed[0]}".lower()
            suggestions.append(
                {
                    "config": CoveringIndexConfig(name, list(indexed), included),
                    "rule": rule,
                    "reason": reason,
                    "source": list(scan.normalized_paths()),
                }
            )

        seen_filters: set[int] = set()

        def walk(node):
            m = match_filter_pattern(node)
            if m is not None and id(m[1]) not in seen_filters:
                # outermost match wins: Project(Filter(Scan)) also
                # matches again at the bare Filter child with a wider
                # required set — suggest once, with the projection.
                seen_filters.add(id(m[1]))
                _, filt, scan = m
                try:
                    required = sorted(_ir.required_columns(node))
                except ValueError:
                    required = sorted(filt.condition.references)
                refs = [c for c in sorted(filt.condition.references) if "." not in c]
                # Disjunctive filter family (r11): when every OR branch
                # pins some column with an equality/IN, propose ONE index
                # per distinct branch column — together they let
                # FilterOrIndexRule serve the disjunction as a union of
                # bucket-pruned branch scans.  Creating the set closes
                # the loop: covered_by_existing then drops each proposal.
                from hyperspace_spark.planner.expr import BoolOp, split_disjuncts
                from hyperspace_spark.planner.rules import FilterOrIndexRule

                handled_or = False
                cond = filt.condition
                if isinstance(cond, BoolOp) and cond.op == "or":
                    disjuncts = split_disjuncts(cond)
                    branch_cols: list[str] = []
                    if 2 <= len(disjuncts) <= FilterOrIndexRule.MAX_BRANCHES:
                        for d in disjuncts:
                            deq = [
                                c
                                for c in sorted(d.references)
                                if "." not in c
                                and equality_literals(d, c) is not None
                            ]
                            if not deq:
                                branch_cols = []
                                break
                            branch_cols.append(deq[0])
                    if branch_cols:
                        handled_or = True
                        for col in dict.fromkeys(branch_cols):
                            add(
                                scan,
                                [col],
                                required,
                                "FilterOrIndexRule",
                                f"OR branch pins {col}: index-OR union reads "
                                "only that literal's buckets per branch "
                                "(create the full set of branch indexes)",
                            )
                eq = [
                    c
                    for c in refs
                    if equality_literals(filt.condition, c) is not None
                ]
                if handled_or:
                    pass
                elif eq:
                    add(
                        scan,
                        eq[:1],
                        required,
                        "FilterIndexRule",
                        f"equality probe on {eq[0]}: bucket-pruned point lookup",
                    )
                elif refs:
                    add(
                        scan,
                        refs[:1],
                        required,
                        "FilterIndexRule",
                        f"range predicate on {refs[0]}: sorted index scan with row-group pruning",
                    )
                # A LITERAL equality conjunct alongside other predicates
                # also admits a PARTIAL index scoped to that conjunct —
                # predicate-fraction build/storage cost for the same
                # query family (CoveringIndexConfig(where=...)).
                from hyperspace_spark.planner.expr import Cmp, Lit
                from hyperspace_spark.planner.expr import (
                    split_conjuncts as _split,
                )

                conjs = _split(filt.condition)
                lit_eq = [
                    c
                    for c in conjs
                    if isinstance(c, Cmp)
                    and c.op == "="
                    and isinstance(c.right, Lit)
                    and c.references
                ]
                others = [c for c in refs if c not in {
                    next(iter(c2.references)) for c2 in lit_eq
                }]
                if lit_eq and others:
                    pred = lit_eq[0]
                    suggestions_before = len(suggestions)
                    add(
                        scan,
                        others[:1],
                        required,
                        "FilterIndexRule",
                        f"partial index WHERE {pred.sql}: indexes only the "
                        f"queried subset at predicate-fraction cost",
                    )
                    if len(suggestions) > suggestions_before:
                        cfg = suggestions[-1]["config"]
                        cfg.where = pred.sql
                        suggestions[-1]["config"] = cfg
                # Data-skipping sketch recommendation (r11; the advisory
                # role of the reference's MinMaxAnalysisUtil.analyze):
                # one DataSkippingIndexConfig whose sketch kind fits
                # each predicate shape — MinMax for ranges; for
                # equality/IN a sampled cardinality estimate picks
                # ValueList (low cardinality: exact per-file lists) vs
                # Bloom (high cardinality: constant bytes per file).
                from hyperspace_spark.indexes.dataskipping import (
                    DataSkippingIndexConfig,
                )
                from hyperspace_spark.indexes.sketches import (
                    BloomFilterSketch,
                    MinMaxSketch,
                    ValueListSketch,
                )

                ds_sketches: list = []
                ds_reasons: list[str] = []
                for col in refs:
                    if col in (scan.partition_columns or []):
                        continue  # Spark prunes partition values natively
                    if equality_literals(filt.condition, col) is not None:
                        ratio = self._sampled_distinct_ratio(scan, col)
                        if ratio is not None and ratio <= 0.05:
                            ds_sketches.append(ValueListSketch([col]))
                            ds_reasons.append(
                                f"ValueList({col}): equality probe on a "
                                f"low-cardinality column (~{ratio:.1%} "
                                "distinct in sample)"
                            )
                        else:
                            ds_sketches.append(BloomFilterSketch([col]))
                            ds_reasons.append(
                                f"Bloom({col}): equality probe on a "
                                "high-cardinality column"
                            )
                    elif any(
                        isinstance(cj, Cmp)
                        and cj.op in ("<", "<=", ">", ">=")
                        and cj.references == frozenset([col])
                        for cj in conjs
                    ):
                        ds_sketches.append(MinMaxSketch([col]))
                        ds_reasons.append(f"MinMax({col}): range predicate")
                first_key = eq[:1] if eq else refs[:1]
                if (
                    ds_sketches
                    and not self._ds_covered(scan, ds_sketches)
                    # an ACTIVE covering index that already serves this
                    # query makes a skipping index redundant advice
                    and not covered_by_existing(scan, first_key, required)
                ):
                    ds_name = f"hs_rec_ds_{len(suggestions)}_{ds_sketches[0].column}".lower()
                    suggestions.append(
                        {
                            "config": DataSkippingIndexConfig(
                                ds_name, sketches=ds_sketches
                            ),
                            "rule": "DataSkippingIndexRule",
                            "reason": "; ".join(ds_reasons),
                            "source": list(scan.normalized_paths()),
                        }
                    )
                # Z-order recommendation (r12; reference
                # ZOrderCoveringIndex.scala:28-189): a MULTI-column
                # predicate family with at least one range is the shape
                # a single-key covering index serves poorly (bucket
                # pruning pins only the first key; the other columns
                # scan every bucket).  Z-clustering interleaves all the
                # predicate columns, so per-file min/max stats prune on
                # ANY of them.
                range_cols = [
                    c
                    for c in refs
                    if any(
                        isinstance(cj, Cmp)
                        and cj.op in ("<", "<=", ">", ">=")
                        and cj.references == frozenset([c])
                        for cj in conjs
                    )
                ]
                zcols = list(dict.fromkeys(eq + range_cols))
                if len(zcols) >= 2 and range_cols:
                    z_served = any(
                        e.derived_kind == "ZCI"
                        and same_source(e, scan)
                        and not e.derived_properties.get("filterPredicateExpr")
                        and set(zcols)
                        <= set(e.derived_properties.get("indexedColumns", []))
                        and set(required)
                        <= set(e.derived_properties.get("indexedColumns", []))
                        | set(e.derived_properties.get("includedColumns", []))
                        for e in entries_all
                    )
                    zkey = (scan.normalized_paths(), "ZCI", tuple(zcols))
                    if not z_served and zkey not in seen_keys:
                        seen_keys.add(zkey)
                        from hyperspace_spark.indexes.zorder import (
                            ZOrderCoveringIndexConfig,
                        )

                        zname = f"hs_rec_z_{len(suggestions)}_{zcols[0]}".lower()
                        suggestions.append(
                            {
                                "config": ZOrderCoveringIndexConfig(
                                    zname,
                                    list(zcols),
                                    sorted(
                                        c
                                        for c in required
                                        if c not in zcols and "." not in c
                                    ),
                                ),
                                "rule": "ZOrderFilterIndexRule",
                                "reason": (
                                    f"multi-column predicate on {', '.join(zcols)} "
                                    "with a range: z-clustering prunes files on "
                                    "ANY of the columns (a single-key covering "
                                    "index pins only its first key)"
                                ),
                                "source": list(scan.normalized_paths()),
                            }
                        )
                # Inverted-text recommendation (r12): substring/term
                # predicates (LIKE '%..%', contains, instr, locate)
                # re-scan and re-tokenize every row per query; a TXT
                # index serves term/phrase/boolean/BM25 probes from
                # bucket-pruned postings.
                import re as _re

                types = scan_col_types(scan)
                for cj in conjs:
                    if len(cj.references) != 1:
                        continue
                    (tcol,) = cj.references
                    if types.get(tcol) != "string":
                        continue
                    if not _re.search(
                        r"\bcontains\(|\binstr\(|\blocate\(|LIKE\s+'%",
                        cj.sql,
                        _re.IGNORECASE,
                    ):
                        continue
                    tkey = (scan.normalized_paths(), "TXT", tcol)
                    if tkey in seen_keys:
                        continue
                    seen_keys.add(tkey)
                    if any(
                        e.derived_kind == "TXT"
                        and same_source(e, scan)
                        and e.derived_properties.get("textCol") == tcol
                        for e in entries_all
                    ):
                        continue
                    from hyperspace_spark.indexes.inverted import (
                        InvertedTextIndexConfig,
                    )

                    id_col, id_caveat = pick_id_col(scan)
                    suggestions.append(
                        {
                            "config": InvertedTextIndexConfig(
                                f"hs_rec_txt_{len(suggestions)}_{tcol}".lower(),
                                text_col=tcol,
                                id_col=id_col,
                            ),
                            "rule": "text_search (explicit API)",
                            "reason": (
                                f"substring predicate on {tcol} re-scans every "
                                "row per query; an inverted TXT index serves "
                                "term/phrase/boolean/BM25 probes from "
                                f"bucket-pruned postings ({id_caveat})"
                            ),
                            "source": list(scan.normalized_paths()),
                        }
                    )
            # ANN recommendation (r12): a top-k ordered by an expression
            # over a float-vector column is a brute-force O(corpus)
            # similarity scan PER QUERY; an IVF index bounds each probe
            # to n_probe clusters.
            if (
                isinstance(node, _ir.LimitN)
                and isinstance(node.child, _ir.SortN)
                and node.n <= 1000
            ):
                ms = match_linear_side(node.child.child)
                if ms is not None:
                    scan, required = ms
                    types = scan_col_types(scan)
                    vec_cols = [
                        c
                        for c in sorted(required)
                        if types.get(c) in ("array<float>", "array<double>")
                    ]
                    for vcol in vec_cols[:1]:
                        akey = (scan.normalized_paths(), "ANN", vcol)
                        if akey in seen_keys:
                            continue
                        seen_keys.add(akey)
                        if any(
                            e.derived_kind == "ANN"
                            and same_source(e, scan)
                            and e.derived_properties.get("vecCol") == vcol
                            for e in entries_all
                        ):
                            continue
                        from hyperspace_spark.indexes.ann import IvfIndexConfig

                        id_col, id_caveat = pick_id_col(scan)
                        suggestions.append(
                            {
                                "config": IvfIndexConfig(
                                    f"hs_rec_ann_{len(suggestions)}_{vcol}".lower(),
                                    vec_col=vcol,
                                    id_col=id_col,
                                ),
                                "rule": "ann_search / ann_join (explicit API)",
                                "reason": (
                                    f"top-{node.n} ordered by an expression over "
                                    f"vector column {vcol}: brute force scores the "
                                    "whole corpus per query; IVF probes n_probe "
                                    "clusters (add pq_m for the PQ layout at "
                                    f"billion-vector scale; {id_caveat})"
                                ),
                                "source": list(scan.normalized_paths()),
                            }
                        )
            if isinstance(node, _ir.JoinN) and node.equi_keys:
                for side, keys in (
                    (node.left, [l for l, _ in node.equi_keys]),
                    (node.right, [r for _, r in node.equi_keys]),
                ):
                    ms = match_linear_side(side)
                    if ms is None:
                        continue
                    scan, required = ms
                    add(
                        scan,
                        keys,
                        sorted(required),
                        "JoinIndexRule",
                        f"equi-join on {', '.join(keys)}: co-bucketed pair eliminates the join shuffle "
                        "(create BOTH sides' indexes with equal num_buckets)",
                    )
            if isinstance(node, _ir.AggregateN) and node.grouping:
                from hyperspace_spark.planner.rules import _plain_column

                keys = [c for c in (_plain_column(g) for g in node.grouping) if c]
                ms = match_linear_side(node.child)
                if keys and ms is not None:
                    scan, required = ms
                    add(
                        scan,
                        keys,
                        sorted(required),
                        "AggBucketedIndexRule",
                        f"GROUP BY {', '.join(keys)}: bucketed read drops the aggregation exchange",
                    )
            if isinstance(node, _ir.WindowN) and node.partition_cols:
                ms = match_linear_side(node.child)
                if ms is not None:
                    scan, required = ms
                    add(
                        scan,
                        list(node.partition_cols),
                        sorted(required),
                        "WindowBucketedIndexRule",
                        f"window PARTITION BY {', '.join(node.partition_cols)}: bucketed read drops the window exchange",
                    )
            for k in _ir.children(node):
                walk(k)

        walk(plan)
        return suggestions


def _norm_path(p: str) -> str:
    from hyperspace_spark.planner.ir import _normalize_path

    return _normalize_path(p)


def _scan_of(rel: Relation) -> ir.Scan:
    """Minimal Scan view of a logged Relation, for provider-backed file
    listing at refresh time (same path as create/apply)."""
    from hyperspace_spark.sources.delta import find_delta_root
    from hyperspace_spark.sources.iceberg import find_iceberg_root

    delta_root = iceberg_root = None
    if rel.file_format == "parquet" and len(rel.root_paths) == 1:
        delta_root = find_delta_root(rel.root_paths[0])
        if delta_root is None:
            iceberg_root = find_iceberg_root(rel.root_paths[0])
    return ir.Scan(
        root_paths=list(rel.root_paths),
        file_format=rel.file_format,
        data_schema_json=rel.data_schema_json or "",
        output=[],
        partition_columns=list(rel.partition_columns),
        options=dict(rel.options),
        delta_root=delta_root,
        iceberg_root=iceberg_root,
    )


def _signature_of(scan: ir.Scan, files: list[FileInfo]) -> str:
    """Source signature through the scan's provider (Delta: path+version;
    default: per-file metadata md5).  Build-time and query-time MUST agree
    or every query takes the hybrid path."""
    from hyperspace_spark.sources import provider_for

    return provider_for(scan).signature(scan, files)


def _relation_reader(spark, rel: Relation, with_base_path: bool = False):
    """DataFrameReader configured exactly like the relation's build scan:
    stored schema + reader options (minus path).  Shared by the build
    source and BOTH incremental-refresh appended-file readers — without
    the options, an appended CSV with header=true would be parsed with
    defaults, header rows becoming index data.  ``with_base_path`` adds
    basePath for partitioned sources when loading an explicit file
    subset (keeps partition columns resolvable)."""
    import json as _json

    from pyspark.sql.types import StructType

    reader = spark.read.format(rel.file_format)
    if rel.data_schema_json:
        reader = reader.schema(StructType.fromJson(_json.loads(rel.data_schema_json)))
    if rel.options:
        reader = reader.options(**{k: v for k, v in rel.options.items() if k != "path"})
    if with_base_path and rel.partition_columns:
        reader = reader.option("basePath", rel.root_paths[0])
    return reader


def _column_exists(scan: ir.Scan, col: str) -> bool:
    return ir.scan_has_column(scan, col)


def _resolve_config_columns(scan: ir.Scan, config, case_sensitive: bool) -> None:
    """Rewrite an index config's column lists to the scan's schema
    spelling (no-op for names that do not resolve — create_index then
    reports them missing)."""

    def res(c: str) -> str:
        return ir.resolve_column(scan, c, case_sensitive) or c

    for attr in ("indexed_columns", "included_columns"):
        if hasattr(config, attr):
            setattr(config, attr, [res(c) for c in getattr(config, attr)])
    for s in getattr(config, "sketches", []) or []:
        if hasattr(s, "columns"):
            s.columns = [res(c) for c in s.columns]


def _op_histogram(plan_str: str) -> dict[str, int]:
    import re

    ops: dict[str, int] = {}
    for m in re.finditer(r"^[\s:+*(\d)\-]*([A-Za-z]+)", plan_str, re.MULTILINE):
        ops[m.group(1)] = ops.get(m.group(1), 0) + 1
    return ops


# ---------------------------------------------------------------------------
# Telemetry (reference: telemetry/HyperspaceEvent.scala + EventLogger) —
# every lifecycle action emits a typed event with duration + success, and
# every apply() emits a usage event listing the applied indexes.
# ---------------------------------------------------------------------------
def _telemetry_apply(index_names: list[str], detail: str) -> None:
    if not index_names:
        return
    from hyperspace_spark.telemetry import HyperspaceEvent, emit

    emit(HyperspaceEvent(kind="apply", index_name=",".join(index_names), detail=detail))


def _telemetry_rule_excluded(rule_names: list[str], exc: BaseException) -> None:
    """Breadcrumb for a rule dropped after its replacement failed during
    replay: planning retried without it (possibly losing score), and the
    failure would otherwise be COMPLETELY silent."""
    from hyperspace_spark.telemetry import HyperspaceEvent, emit, log as _tlog

    msg = f"{type(exc).__name__}: {exc}"
    _tlog.warning(
        "rule(s) %s declined late during replay (%s); re-planned without them",
        ",".join(rule_names),
        msg,
    )
    emit(
        HyperspaceEvent(
            kind="rule_excluded",
            detail=f"{','.join(rule_names)}: {msg}"[:500],
            success=False,
        )
    )


def _event_index_name(args, kwargs) -> str:
    for v in list(args) + list(kwargs.values()):
        if isinstance(v, str):
            return v
        n = getattr(v, "name", None)
        if isinstance(n, str):
            return n
    return ""


def _instrument_lifecycle() -> None:
    import functools

    from hyperspace_spark.telemetry import timed_event

    for meth, kind in [
        ("create_index", "create"),
        ("refresh_index", "refresh"),
        ("optimize_index", "optimize"),
        ("delete_index", "delete"),
        ("restore_index", "restore"),
        ("vacuum_index", "vacuum"),
        ("vacuum_outdated_indexes", "vacuum"),
        ("cancel", "cancel"),
    ]:
        orig = getattr(Hyperspace, meth, None)
        if orig is None:
            continue

        def wrap(orig=orig, kind=kind):
            @functools.wraps(orig)
            def inner(self, *args, **kwargs):
                detail = " ".join(str(a) for a in args[1:] if isinstance(a, (str, int)))
                with timed_event(kind, _event_index_name(args, kwargs), detail):
                    return orig(self, *args, **kwargs)

            return inner

        setattr(Hyperspace, meth, wrap())


_instrument_lifecycle()


# ---------------------------------------------------------------------------
# Session-level helpers mirroring the reference's implicit-class surface
# (package.scala:40-93: spark.enableHyperspace() / disableHyperspace() /
# isHyperspaceEnabled()).  Python has no implicits; these are plain
# functions over the session.
# ---------------------------------------------------------------------------
# ---------------------------------------------------------------------------
# DataFrame-action routing for session-level enable: a CLASS-level patch
# on pyspark's DataFrame action methods, gated per-session by a weak
# registry, so frames built with the DataFrame API (spark.read.* +
# transformations) hit the index planner on execution with no explicit
# apply().  Equivalent surface to the reference's ApplyHyperspace
# optimizer rule for DataFrame queries (ApplyHyperspace.scala:32-76).
#
# Safety properties:
# - sessions not in _DF_ROUTES pass straight through (one dict probe);
# - _DF_ROUTE_GUARD (thread-local) stops recursion — apply()'s own
#   planning/replay work runs actions on the same session;
# - frames apply() already rewrote carry _hs_no_reroute and skip the
#   second planning pass;
# - patching collect() transitively covers take/head/first/toLocalIterator
#   paths that funnel through it in pyspark; count/show/toPandas have
#   their own JVM entry points and are patched individually.
# ---------------------------------------------------------------------------
import threading as _threading
import weakref as _weakref

_DF_ROUTES: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()
_DF_ROUTE_GUARD = _threading.local()
_DF_PATCHED: dict = {}
_DF_ACTION_METHODS = ("collect", "count", "show", "toPandas")


def _route_for(df):
    if not _DF_ROUTES:
        return None
    try:
        return _DF_ROUTES.get(df.sparkSession)
    except Exception:
        return None


def _make_routed_action(orig):
    import functools

    @functools.wraps(orig)
    def routed(self, *args, **kwargs):
        hs = _route_for(self)
        if (
            hs is None
            or getattr(_DF_ROUTE_GUARD, "active", False)
            or getattr(self, "_hs_no_reroute", False)
        ):
            return orig(self, *args, **kwargs)
        _DF_ROUTE_GUARD.active = True
        try:
            rewritten = hs.apply(self)
        finally:
            _DF_ROUTE_GUARD.active = False
        return orig(rewritten, *args, **kwargs)

    return routed


def _df_impl_class():
    """The CONCRETE DataFrame class local sessions instantiate.  Since
    Spark 4, ``pyspark.sql.DataFrame`` is an abstract facade and the
    classic engine's subclass overrides every action method — patching
    the facade would never be reached via the MRO."""
    try:
        from pyspark.sql.classic.dataframe import DataFrame  # Spark >= 4
    except ImportError:
        from pyspark.sql import DataFrame  # Spark 3.x: one concrete class
    return DataFrame


def _make_routed_write(orig_prop):
    def routed(self):
        hs = _route_for(self)
        if (
            hs is None
            or getattr(_DF_ROUTE_GUARD, "active", False)
            or getattr(self, "_hs_no_reroute", False)
        ):
            return orig_prop.fget(self)
        _DF_ROUTE_GUARD.active = True
        try:
            rewritten = hs.apply(self)
        finally:
            _DF_ROUTE_GUARD.active = False
        return orig_prop.fget(rewritten)

    return property(routed, doc=orig_prop.__doc__)


def _make_routed_rdd(orig_prop):
    # Handles both plain ``property`` and ``functools.cached_property``
    # (rdd since Spark 4): delegating to the original descriptor's
    # __get__ preserves cached_property's instance-dict caching when
    # routing is inactive (the wrapper property is a data descriptor, so
    # the cached instance attribute never shadows it).  When routing IS
    # active, the RDD comes from the REWRITTEN frame and is cached on
    # the instance so repeated accesses return the same object
    # (``df.rdd is df.rdd`` — callers rely on that identity for
    # determinism of zipWithIndex-style derivations).
    def routed(self):
        hs = _route_for(self)
        if (
            hs is None
            or getattr(_DF_ROUTE_GUARD, "active", False)
            or getattr(self, "_hs_no_reroute", False)
        ):
            return orig_prop.__get__(self, type(self))
        cached = self.__dict__.get("_hs_routed_rdd")
        if cached is not None:
            return cached
        _DF_ROUTE_GUARD.active = True
        try:
            rewritten = hs.apply(self)
        finally:
            _DF_ROUTE_GUARD.active = False
        if rewritten is self:
            return orig_prop.__get__(self, type(self))
        out = orig_prop.__get__(rewritten, type(rewritten))
        self.__dict__["_hs_routed_rdd"] = out
        return out

    return property(routed, doc=getattr(orig_prop, "__doc__", None))


def _install_df_action_routing() -> None:
    if _DF_PATCHED:
        return
    cls = _df_impl_class()
    for name in _DF_ACTION_METHODS:
        orig = getattr(cls, name)
        _DF_PATCHED[name] = orig
        setattr(cls, name, _make_routed_action(orig))
    # df.write is a property returning DataFrameWriter(self): build the
    # writer over the REWRITTEN frame so ETL sinks are accelerated too.
    orig_write = cls.__dict__.get("write")
    if isinstance(orig_write, property):
        _DF_PATCHED["write"] = orig_write
        setattr(cls, "write", _make_routed_write(orig_write))
    # .rdd IS routed (r10; previously a one-time warning): the RDD is
    # built from the REWRITTEN frame, so dropping out of the DataFrame
    # world keeps the acceleration — the reference gets this for free
    # because its Catalyst injection rewrites every query regardless of
    # how the result is consumed (package.scala:40-93).
    import functools as _functools

    for name in ("rdd",):
        orig_prop = cls.__dict__.get(name)
        if isinstance(orig_prop, (property, _functools.cached_property)):
            _DF_PATCHED[name] = orig_prop
            setattr(cls, name, _make_routed_rdd(orig_prop))
    # .writeStream IS routed — not for plan acceleration (streaming plans
    # fall back by design) but for index MAINTENANCE: a file sink whose
    # path is the source root of active indexes gets automatic
    # incremental refresh per micro-batch (streaming/refresh.py).
    _install_stream_sink_routing()


_STREAM_PATCHED: dict = {}


def _stream_writer_class():
    from pyspark.sql.streaming.readwriter import DataStreamWriter

    return DataStreamWriter


def _install_stream_sink_routing() -> None:
    """Patch DataStreamWriter so start() enrols file sinks that target an
    active index's source root for automatic incremental maintenance.
    The reference gets every plan (incl. streaming sinks) for free via
    Catalyst injection (package.scala:40-93); this is the writeStream
    half of that coverage a session-level patch can honestly provide —
    the streaming PLAN still executes unrewritten, but the indexes over
    the sunk data no longer stale silently."""
    if _STREAM_PATCHED:
        return
    cls = _stream_writer_class()
    orig_option = cls.option
    orig_options = cls.options
    orig_start = cls.start

    def routed_option(self, key, value):
        if isinstance(key, str) and key.lower() == "path":
            self._hs_sink_path = value
        return orig_option(self, key, value)

    def routed_options(self, **opts):
        for k, v in opts.items():
            if k.lower() == "path":
                self._hs_sink_path = v
        return orig_options(self, **opts)

    def routed_start(self, path=None, *args, **kwargs):
        q = orig_start(self, path, *args, **kwargs)
        try:
            sink = path or kwargs.get("path") or getattr(self, "_hs_sink_path", None)
            df = getattr(self, "_df", None)
            spark = df.sparkSession if df is not None else None
            hs = _DF_ROUTES.get(spark) if spark is not None else None
            if hs is not None and sink:
                from hyperspace_spark.streaming.refresh import (
                    indexes_rooted_at,
                    register_auto_maintenance,
                )

                names = indexes_rooted_at(hs, sink)
                if names:
                    register_auto_maintenance(spark, q, hs, names)
                    from hyperspace_spark.telemetry import HyperspaceEvent, emit

                    emit(
                        HyperspaceEvent(
                            kind="stream_maintenance",
                            detail=",".join(sorted(names)),
                            success=True,
                        )
                    )
        except Exception:
            pass  # maintenance enrolment must never break the stream
        return q

    _STREAM_PATCHED.update(option=orig_option, options=orig_options, start=orig_start)
    cls.option = routed_option
    cls.options = routed_options
    cls.start = routed_start


def _uninstall_stream_sink_routing() -> None:
    if not _STREAM_PATCHED:
        return
    cls = _stream_writer_class()
    for name, orig in _STREAM_PATCHED.items():
        setattr(cls, name, orig)
    _STREAM_PATCHED.clear()


def _uninstall_df_action_routing() -> None:
    if not _DF_PATCHED:
        return
    cls = _df_impl_class()
    for name, orig in _DF_PATCHED.items():
        setattr(cls, name, orig)
    _uninstall_stream_sink_routing()
    _DF_PATCHED.clear()


def enable_hyperspace(spark, hs: "Hyperspace | None" = None) -> "Hyperspace":
    """Route ``spark.sql`` and DataFrame actions through the index
    planner.  Returns the Hyperspace instance doing the routing (a
    default-system-path instance is created when ``hs`` is not given)."""
    hs = hs or Hyperspace(spark)
    hs.enable()
    return hs


def _disable_session_sql(spark) -> None:
    """Shared disable: put back exactly what enable() saved.  If some
    OTHER library had instance-patched ``spark.sql`` before enable()
    (query-audit wrappers etc.), the saved original is that wrapper —
    restore it rather than popping down to the bare class method, which
    would silently uninstall the third party's hook."""
    _DF_ROUTES.pop(spark, None)
    if not _DF_ROUTES:
        # last enabled session gone: restore the pristine DataFrame class
        _uninstall_df_action_routing()
    try:
        from hyperspace_spark.streaming.refresh import unregister_session

        unregister_session(spark)
    except Exception:
        pass
    saved_ns = getattr(spark, "_hs_original_newSession", None)
    if saved_ns is not None:
        if getattr(saved_ns, "__func__", None) is type(spark).newSession and getattr(
            saved_ns, "__self__", None
        ) is spark:
            spark.__dict__.pop("newSession", None)
        else:
            spark.newSession = saved_ns
        spark._hs_original_newSession = None
    saved = getattr(spark, "_hs_original_sql", None)
    if saved is None:
        return
    if getattr(saved, "__func__", None) is type(spark).sql and getattr(
        saved, "__self__", None
    ) is spark:
        spark.__dict__.pop("sql", None)  # was the bound class method: un-shadow
    else:
        spark.sql = saved  # was an instance-level wrapper: reinstall it
    spark._hs_original_sql = None


def disable_hyperspace(spark) -> None:
    _disable_session_sql(spark)


def is_hyperspace_enabled(spark) -> bool:
    return getattr(spark, "_hs_original_sql", None) is not None
