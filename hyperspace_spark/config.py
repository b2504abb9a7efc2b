"""Engine configuration, mirroring the reference's IndexConstants.

Reference parity: /root/reference/src/main/scala/com/microsoft/hyperspace/index/IndexConstants.scala
and util/HyperspaceConf.scala.  Every knob is read from the SparkSession
conf (so users tune it the Spark way) with the same defaults as the
reference where one exists.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import SparkSession

# Conf keys (kept under the spark.hyperspace.* namespace like the reference).
SYSTEM_PATH = "spark.hyperspace.system.path"
APPLY_ENABLED = "spark.hyperspace.apply.enabled"
NUM_BUCKETS = "spark.hyperspace.index.numBuckets"
# Auto bucket sizing (NUM_BUCKETS unset/"auto"): target bytes of SOURCE
# data per bucket once the cluster is saturated, and the minimum bytes
# below which extra buckets stop buying parallelism (avoids the tiny-
# files trap the reference's fixed default falls into at small scale).
BUCKET_TARGET_BYTES = "spark.hyperspace.index.bucketTargetBytes"
BUCKET_MIN_BYTES = "spark.hyperspace.index.bucketMinBytes"
LINEAGE_ENABLED = "spark.hyperspace.index.lineage.enabled"
HYBRIDSCAN_ENABLED = "spark.hyperspace.index.hybridscan.enabled"
HYBRIDSCAN_APPENDED_RATIO = "spark.hyperspace.index.hybridscan.maxAppendedRatio"
HYBRIDSCAN_DELETED_RATIO = "spark.hyperspace.index.hybridscan.maxDeletedRatio"
OPTIMIZE_FILE_SIZE_THRESHOLD = "spark.hyperspace.index.optimize.fileSizeThreshold"
SKIPPING_TARGET_FILE_SIZE = "spark.hyperspace.index.dataskipping.targetIndexDataFileSize"
SKIPPING_MAX_FILE_COUNT = "spark.hyperspace.index.dataskipping.maxIndexDataFileCount"
ZORDER_TARGET_BYTES_PER_PARTITION = "spark.hyperspace.index.zorder.targetSourceBytesPerPartition"
# Z-order incremental refresh: appended-bytes ratio (vs the indexed
# corpus) below which appends z-cluster LOCALLY into their own files
# (frozen build-time scaling; per-file min/max pruning stays exact).
# Beyond it — or on any delete — the full re-cluster runs.
ZORDER_MAX_INCREMENTAL_RATIO = "spark.hyperspace.index.zorder.maxIncrementalRatio"
ZORDER_QUANTILE_ENABLED = "spark.hyperspace.index.zorder.quantile.enabled"
ZORDER_QUANTILE_ERROR = "spark.hyperspace.index.zorder.quantile.relativeError"
FILTER_RULE_USE_BUCKET_SPEC = "spark.hyperspace.index.filterRule.useBucketSpec"
CACHE_EXPIRY_SEC = "spark.hyperspace.index.cache.expiryDurationInSeconds"
# TTL of the per-plan rewrite cache.  Lifecycle ops invalidate immediately
# (epoch bump); the TTL only bounds staleness against EXTERNAL appends that
# bypass the lifecycle.  Set to 0 to re-plan on every query (reference
# behavior: extraOptimizations re-plans always).
APPLY_CACHE_TTL_SEC = "spark.hyperspace.apply.cacheTtlSeconds"
# Age after which streaming maintenance treats a transient log entry
# (REFRESHING/OPTIMIZING/...) as a crash leftover and cancels it.  MUST
# exceed the worst-case duration of any legitimate maintenance op on the
# deployment's largest index, or a long-running concurrent optimize gets
# cancelled mid-run and its completing write discarded
# (ConcurrentModificationError).  Long ops can also heartbeat-touch their
# transient log file (metadata/log_manager.py heartbeat) to stay fresh.
MAINTENANCE_STALE_AFTER_SEC = "spark.hyperspace.maintenance.staleAfterSeconds"
# ANN incremental refresh: appended-bytes ratio above which assign-only
# refresh (frozen centroids) falls back to a full refit.  Mirrors the
# hybrid-scan appended-ratio philosophy: small appends ride the cheap
# path, big drift forces the correct-but-expensive one.
ANN_MAX_ASSIGN_RATIO = "spark.hyperspace.index.ann.maxAssignOnlyRatio"
# Above the assign-only ratio but at-or-below this one, incremental
# refresh PARTIALLY re-clusters: only clusters grown past
# reclusterOversizeFactor x the per-cluster average are re-KMeans'd
# (split), every other cluster's files hardlink through — the
# OptimizeAction per-bucket discipline applied to quantizer drift.
# Beyond it, a full refit (global KMeans) is cheaper than splitting
# nearly every cluster one at a time.
ANN_MAX_RECLUSTER_RATIO = "spark.hyperspace.index.ann.maxReclusterRatio"
ANN_RECLUSTER_OVERSIZE_FACTOR = "spark.hyperspace.index.ann.reclusterOversizeFactor"

# Internal column names (reference: IndexConstants.scala:104, ResolverUtils.scala:86).
DATA_FILE_ID_COLUMN = "_data_file_id"
NESTED_PREFIX = "__hs_nested."
FILE_NAME_COLUMN = "_hs_file_name"

# Index data version directory prefix (reference: IndexConstants.scala:92).
INDEX_VERSION_DIR_PREFIX = "v__"
LOG_DIR = "_hyperspace_log"


@dataclass
class HyperspaceConf:
    """Resolved configuration snapshot for one engine call."""

    system_path: str
    apply_enabled: bool = True
    # None = auto: size bucket count to the data (resolve_num_buckets).
    num_buckets: int | None = None
    bucket_target_bytes: int = 256 * 1024 * 1024
    bucket_min_bytes: int = 16 * 1024 * 1024
    lineage_enabled: bool = True
    hybridscan_enabled: bool = True
    hybridscan_max_appended_ratio: float = 0.3
    hybridscan_max_deleted_ratio: float = 0.2
    optimize_file_size_threshold: int = 256 * 1024 * 1024
    skipping_target_file_size: int = 256 * 1024 * 1024
    skipping_max_file_count: int = 10_000
    zorder_target_bytes_per_partition: int = 1024 * 1024 * 1024
    zorder_max_incremental_ratio: float = 0.3
    zorder_quantile_enabled: bool = True
    zorder_quantile_error: float = 0.01
    # Divergence from the reference default (false): here "bucket spec"
    # means driver-side murmur3 bucket-FILE pruning for equality filters
    # (planner/mmh3.py) — strictly fewer bytes read, no plan-shape
    # downside — so it defaults on.
    filter_rule_use_bucket_spec: bool = True
    cache_expiry_sec: int = 300
    apply_cache_ttl_sec: float = 10.0
    maintenance_stale_after_sec: float = 600.0
    ann_max_assign_only_ratio: float = 0.3
    ann_max_recluster_ratio: float = 1.0
    ann_recluster_oversize_factor: float = 2.0

    @staticmethod
    def from_session(spark: "SparkSession", system_path: str | None = None) -> "HyperspaceConf":
        c = spark.conf

        def _get(key: str, default: str) -> str:
            try:
                return c.get(key, default) or default
            except Exception:
                return default

        def _int(key: str, default: str) -> int:
            """Defensive parse: deployments set values like
            spark.sql.shuffle.partitions="auto" (Databricks AOS), and a
            raw int() would make EVERY engine call crash on conf read —
            fall back to the default instead."""
            try:
                return int(_get(key, default))
            except (TypeError, ValueError):
                return int(default)

        def _float(key: str, default: str) -> float:
            try:
                return float(_get(key, default))
            except (TypeError, ValueError):
                return float(default)

        shuffle_parts = _int("spark.sql.shuffle.partitions", "200")
        return HyperspaceConf(
            system_path=system_path or _get(SYSTEM_PATH, "/tmp/hyperspace"),
            apply_enabled=_get(APPLY_ENABLED, "true").lower() == "true",
            # Deliberate divergence from the reference's fixed default
            # (IndexConstants.scala:32-36 uses shuffle.partitions): a fixed
            # count is 200 tiny files at MB scale and 200 giant buckets at
            # 100 TB.  Unset/"auto" sizes the count to the data; an explicit
            # integer (or spark.sql.shuffle.partitions via "shuffle") pins it.
            num_buckets=_parse_num_buckets(_get(NUM_BUCKETS, "auto"), shuffle_parts),
            bucket_target_bytes=_int(BUCKET_TARGET_BYTES, str(256 * 1024 * 1024)),
            bucket_min_bytes=_int(BUCKET_MIN_BYTES, str(16 * 1024 * 1024)),
            lineage_enabled=_get(LINEAGE_ENABLED, "true").lower() == "true",
            hybridscan_enabled=_get(HYBRIDSCAN_ENABLED, "true").lower() == "true",
            hybridscan_max_appended_ratio=_float(HYBRIDSCAN_APPENDED_RATIO, "0.3"),
            hybridscan_max_deleted_ratio=_float(HYBRIDSCAN_DELETED_RATIO, "0.2"),
            optimize_file_size_threshold=_int(OPTIMIZE_FILE_SIZE_THRESHOLD, str(256 * 1024 * 1024)),
            skipping_target_file_size=_int(SKIPPING_TARGET_FILE_SIZE, str(256 * 1024 * 1024)),
            skipping_max_file_count=_int(SKIPPING_MAX_FILE_COUNT, "10000"),
            zorder_max_incremental_ratio=_float(ZORDER_MAX_INCREMENTAL_RATIO, "0.3"),
            zorder_target_bytes_per_partition=_int(
                ZORDER_TARGET_BYTES_PER_PARTITION, str(1024 * 1024 * 1024)
            ),
            zorder_quantile_enabled=_get(ZORDER_QUANTILE_ENABLED, "true").lower() == "true",
            zorder_quantile_error=_float(ZORDER_QUANTILE_ERROR, "0.01"),
            filter_rule_use_bucket_spec=_get(FILTER_RULE_USE_BUCKET_SPEC, "true").lower() == "true",
            cache_expiry_sec=_int(CACHE_EXPIRY_SEC, "300"),
            apply_cache_ttl_sec=_float(APPLY_CACHE_TTL_SEC, "10"),
            maintenance_stale_after_sec=_float(MAINTENANCE_STALE_AFTER_SEC, "600"),
            ann_max_assign_only_ratio=_float(ANN_MAX_ASSIGN_RATIO, "0.3"),
            ann_max_recluster_ratio=_float(ANN_MAX_RECLUSTER_RATIO, "1.0"),
            ann_recluster_oversize_factor=_float(
                ANN_RECLUSTER_OVERSIZE_FACTOR, "2.0"
            ),
        )

    def resolve_num_buckets(self, source_bytes: int, default_parallelism: int) -> int:
        """Bucket count for an index over ``source_bytes`` of source data.

        Explicit config wins.  Auto policy (power of two so mismatched
        pairs stay joinable via spark.sql.bucketing.coalesceBucketsInJoin):
        - scale term: ~bucket_target_bytes of source per bucket, so at
          100 TB buckets stay a few hundred MB;
        - parallelism term: up to default_parallelism buckets, but never
          buckets smaller than bucket_min_bytes — at MB scale this
          collapses to a handful of files instead of a task-overhead swarm.
        """
        if self.num_buckets is not None:
            return self.num_buckets
        import math

        scale = math.ceil(source_bytes / max(1, self.bucket_target_bytes))
        par = min(
            max(1, default_parallelism),
            math.ceil(source_bytes / max(1, self.bucket_min_bytes)),
        )
        n = max(scale, par, 1)
        return 1 << (n - 1).bit_length()


def _parse_num_buckets(raw: str, shuffle_parts: int) -> int | None:
    raw = raw.strip().lower()
    if raw in ("", "auto"):
        return None
    if raw == "shuffle":
        return shuffle_parts
    return int(raw)
