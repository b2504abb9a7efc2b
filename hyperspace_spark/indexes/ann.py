"""IVF (inverted-file) ANN index as a PERSISTED derived dataset.

Extension beyond the reference (which has no vector type): the same
metadata-log lifecycle as every other index — create / refresh / delete /
restore / vacuum, optimistic concurrency, signature-based staleness —
applied to an approximate-nearest-neighbor structure:

- build: KMeans coarse quantizer over the (unit-normalized) embedding
  column; rows are written PARTITIONED BY cluster id, so a probe reads
  only `n_probe` directories — classic IVF, expressed as Spark partition
  pruning.  Centroids live in the log entry (metadata-scale: k × dim).
- query: `Hyperspace.ann_search(name, query_ids, k, n_probe)` picks each
  query's nearest centroids DRIVER-side from the logged centroids (k×dim
  numpy — microseconds), then scans only those cluster partitions and
  scores with the JVM-side dot product.

At 100 TB: the scan cost per query batch is `n_probe/k` of the corpus,
the shuffle is one top-k window over the probed slice, and maintenance
follows the standard IVF split (FAISS/Milvus practice): APPEND-ONLY
deltas refresh incrementally by assigning new vectors to the FROZEN
centroids and writing only their rows (existing cluster files hardlink
into the new version — zero rewrite of indexed data), while deletes or
appends beyond `spark.hyperspace.index.ann.maxAssignOnlyRatio` of the
corpus force a full refit — assignment against a badly drifted
quantizer degrades recall silently, which is worse than paying for the
rebuild.  The round-1 `ivf_topk` recomputed KMeans per query, which is
exactly what a persisted index exists to avoid.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession


@dataclass
class IvfIndexConfig:
    name: str
    vec_col: str = "embedding"
    id_col: str = "vec_id"
    n_clusters: int = 16
    kind: str = field(default="ANN", init=False)

    def referenced_columns(self) -> list[str]:
        return [self.id_col, self.vec_col]


def create_index_data(
    spark: "SparkSession",
    df: "DataFrame",
    config: IvfIndexConfig,
    conf,
    files,
    tracker,
    data_dir: str,
    name: str,
    version: int,
) -> dict:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from hyperspace_spark.llm.similarity import unit_expr

    feat = df.select(
        F.col(config.id_col).alias("vec_id"),
        unit_expr(F.col(config.vec_col).cast("array<double>")).alias("unit_vec"),
    ).withColumn("features", array_to_vector(F.col("unit_vec")))
    km = KMeans(k=config.n_clusters, seed=42, maxIter=20).fit(feat)
    assigned = km.transform(feat).select(
        "vec_id", "unit_vec", F.col("prediction").alias("cluster")
    )
    # One directory per centroid: a probe's IO is its clusters only.
    assigned.write.partitionBy("cluster").mode("overwrite").parquet(data_dir)
    return {
        "vecCol": config.vec_col,
        "idCol": config.id_col,
        "nClusters": config.n_clusters,
        "centroids": [list(map(float, c)) for c in km.clusterCenters()],
        "schemaJson": assigned.schema.json(),
    }


def assign_to_centroids(
    df: "DataFrame", centroids: list[list[float]], id_col: str, vec_col: str
) -> "DataFrame":
    """(vec_id, unit_vec, cluster) for new rows against FROZEN centroids —
    the assign-only half of IVF incremental refresh.  One Arrow-batched
    numpy matmul per batch (k x dim is metadata-scale, shipped as a
    closure constant, no broadcast variable churn); nearest centroid by
    dot product over unit vectors = same objective KMeans assigned with
    at build time (its centers are refit means, so argmin euclidean —
    ties broken identically via argmax of the dot on unit vectors)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from hyperspace_spark.llm.similarity import unit_expr

    cents = np.asarray(centroids, dtype=np.float64)  # (k, dim)

    @F.pandas_udf("int", F.PandasUDFType.SCALAR)
    def _nearest(vecs):
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])  # (n, dim)
        # unit vectors: argmin ||v - c||^2 == argmax(v.c - ||c||^2/2)
        scores = m @ cents.T - 0.5 * (cents * cents).sum(axis=1)
        return pd.Series(np.argmax(scores, axis=1).astype(np.int32))

    feat = df.select(
        F.col(id_col).alias("vec_id"),
        unit_expr(F.col(vec_col).cast("array<double>")).alias("unit_vec"),
    )
    return feat.withColumn("cluster", _nearest(F.col("unit_vec")))


def partial_recluster(
    spark: "SparkSession",
    entry,
    new_df: "DataFrame",
    data_dir: str,
    oversize_factor: float = 2.0,
) -> tuple[list[list[float]], list[int]]:
    """Split-only partial re-clustering of a drifted IVF quantizer — the
    per-bucket OPTIMIZE discipline (reference OptimizeAction.scala:96-114,
    which rewrites only the buckets holding small files) applied to
    centroid maintenance: only clusters whose row count (existing + newly
    assigned) exceeds ``oversize_factor`` x the per-cluster average are
    re-KMeans'd, and ONLY their rows are rewritten; every other cluster's
    rows are written/hardlinked unchanged, so rewrite bytes are bounded
    by the drifted fraction of the corpus, not its size.

    Cluster-id discipline: a split cluster keeps its id for sub-cluster 0
    and appends fresh ids for the rest, so untouched ``cluster=N``
    directories keep their meaning (they are hardlinked by path).  The
    quantizer only ever REFINES under this path — k grows, cells shrink —
    and a later full refresh re-balances k back to nClusters.

    Returns ``(new_centroids, split_cluster_ids)``.  Writes the NEW and
    re-clustered rows under ``data_dir``; the caller hardlinks the
    untouched clusters' old files in and updates the log entry.
    """
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    props = entry.derived_properties
    centroids = [list(map(float, c)) for c in props["centroids"]]
    schema = StructType.fromJson(json.loads(props["schemaJson"]))
    old = (
        spark.read.schema(schema)
        .option("basePath", entry.index_data_dirs[-1])
        .parquet(*entry.index_data_dirs)
    )
    assigned_new = assign_to_centroids(
        new_df, centroids, props["idCol"], props["vecCol"]
    ).persist()

    old_counts = {
        r["cluster"]: r["cnt"]
        for r in old.groupBy("cluster").agg(F.count("*").alias("cnt")).collect()
    }
    new_counts = {
        r["cluster"]: r["cnt"]
        for r in assigned_new.groupBy("cluster").agg(F.count("*").alias("cnt")).collect()
    }
    k = len(centroids)
    total = sum(old_counts.values()) + sum(new_counts.values())
    target = max(1.0, total / max(1, k))
    combined = {
        c: old_counts.get(c, 0) + new_counts.get(c, 0)
        for c in set(old_counts) | set(new_counts)
    }
    split_ids = sorted(c for c, n in combined.items() if n > oversize_factor * target)

    # Rows of untouched clusters: only the NEW arrivals write (old files
    # hardlink through by the caller).
    (
        assigned_new.filter(~F.col("cluster").isin(split_ids))
        .write.partitionBy("cluster")
        .mode("overwrite")
        .parquet(data_dir)
    )

    next_id = k
    for c in split_ids:
        rows = (
            old.filter(F.col("cluster") == c)
            .select("vec_id", "unit_vec")
            .unionByName(
                assigned_new.filter(F.col("cluster") == c).select("vec_id", "unit_vec")
            )
        )
        # Split back toward the per-cluster average; never below 2,
        # never above the cluster's own row count (tiny-cluster guard).
        n_sub = max(2, min(int(round(combined[c] / target)), combined[c]))
        feat = rows.withColumn("features", array_to_vector(F.col("unit_vec"))).persist()
        km = KMeans(k=n_sub, seed=42 + c, maxIter=20).fit(feat)
        ids = [c] + list(range(next_id, next_id + n_sub - 1))
        next_id += n_sub - 1
        id_map = F.array(*[F.lit(int(i)) for i in ids])
        (
            km.transform(feat)
            .select(
                "vec_id",
                "unit_vec",
                F.element_at(id_map, F.col("prediction") + 1).alias("cluster"),
            )
            .write.partitionBy("cluster")
            .mode("append")
            .parquet(data_dir)
        )
        feat.unpersist()
        centers = km.clusterCenters()
        centers = [
            np.asarray(cc, dtype=np.float64) for cc in centers
        ]
        centroids[c] = [float(x) for x in centers[0]]
        for cc in centers[1:]:
            centroids.append([float(x) for x in cc])
    assigned_new.unpersist()
    return centroids, split_ids


def ann_search(
    spark: "SparkSession",
    entry,
    query_vectors: dict[int, list[float]],
    exclude_self: bool = False,
    k: int = 10,
    n_probe: int = 4,
) -> "DataFrame":
    """(query_id, neighbor_id, cosine, rank) over the persisted IVF index.

    Vectors were unit-normalized at build, so cosine = dot product."""
    import numpy as np
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from hyperspace_spark.llm.similarity import dot_expr

    props = entry.derived_properties
    cents = np.array(props["centroids"], dtype=np.float64)
    cents = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    rows = []
    probe_clusters: set[int] = set()
    for qid, vec in query_vectors.items():
        v = np.asarray(vec, dtype=np.float64)
        v = v / max(float(np.linalg.norm(v)), 1e-12)
        order = np.argsort(-(cents @ v))[:n_probe]
        probe_clusters.update(int(c) for c in order)
        rows.append((int(qid), [float(x) for x in v], [int(c) for c in order]))
    qdf = spark.createDataFrame(rows, "qid long, qv array<double>, probes array<int>")

    schema = StructType.fromJson(json.loads(props["schemaJson"]))
    idx = (
        spark.read.schema(schema)
        .option("basePath", entry.index_data_dirs[-1])
        .parquet(*entry.index_data_dirs)
        # Partition pruning: only the probed cluster directories are read.
        .filter(F.col("cluster").isin(sorted(probe_clusters)))
    )
    scored = idx.join(
        F.broadcast(qdf), F.array_contains(F.col("probes"), F.col("cluster"))
    )
    if exclude_self:
        # Only for query_ids lookups, where qid IS a corpus vec_id.  For
        # EXTERNAL query_vectors the caller's ids are an unrelated
        # namespace — filtering would silently drop the corpus vector
        # that happens to share the number (possibly the true nearest
        # neighbor).
        scored = scored.filter(F.col("vec_id") != F.col("qid"))
    scored = scored.withColumn(
        "cosine", F.round(dot_expr(F.col("qv"), F.col("unit_vec")), 6)
    )
    w = W.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            "cosine",
            "rank",
        )
    )
