"""Similarity search over embedding columns (array<float>).

- cosine_topk: exact brute-force top-k — the correctness baseline.
  Queries are broadcast; the scan side streams, so cost is one pass over
  the corpus per batch of queries (batch your queries, not your scans).
- lsh_bucketed_*: random-hyperplane LSH — the 100 TB path.  Buckets are
  computed with deterministic seeded hyperplanes expressed as literal
  arrays, dot products via F.zip_with/F.aggregate (JVM codegen;
  no Python in the scan loop).
"""

from __future__ import annotations

import hashlib
import struct
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import Column, DataFrame


def dot_expr(a: "Column", b: "Column") -> "Column":
    from pyspark.sql import functions as F

    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_expr(a: "Column") -> "Column":
    from pyspark.sql import functions as F

    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_expr(a: "Column", b: "Column") -> "Column":
    """Zero-norm guard matches the numpy kernels (norms[norms==0]=1.0):
    a zero vector's cosine is 0.0 everywhere, not a DIVIDE_BY_ZERO crash
    under ANSI mode.  The denominator is let-bound via the same
    single-element-aggregate trick as unit_expr so the guard's second
    reference costs nothing."""
    from pyspark.sql import functions as F

    den = norm_expr(a) * norm_expr(b)
    return F.aggregate(
        F.array(den),
        F.lit(None).cast("double"),
        lambda acc, d: dot_expr(a, b) / F.when(d == 0.0, F.lit(1.0)).otherwise(d),
    )


def unit_expr(a: "Column") -> "Column":
    """Pre-normalize once per row so pairwise cosine = one dot product —
    at N² pair joins this cuts the array-lambda work 3× (a·b instead of
    a·b, a·a, b·b per pair).

    The norm is LET-BOUND via a single-element aggregate: interpreted
    higher-order functions re-evaluate their lambda body per element
    with no CSE, so embedding the norm subtree in the transform made
    normalization O(dim²) per row (measured 34 s -> 0.4 s on 20k
    512-dim vectors).  Binding it as the aggregate's lambda variable
    evaluates it exactly once; outputs are bit-identical."""
    from pyspark.sql import functions as F

    return F.aggregate(
        F.array(norm_expr(a)),
        F.lit(None).cast("array<double>"),
        # zero-norm guard: keep the zero vector instead of dividing by 0
        # (ANSI crash) — same semantics as the numpy paths' norms[..]=1.
        lambda acc, n: F.transform(
            a, lambda x: x / F.when(n == 0.0, F.lit(1.0)).otherwise(n)
        ),
    )


def cosine_topk(
    emb: "DataFrame",
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "DataFrame":
    """Exact top-k neighbors (cosine) for each query id.

    Output: (query_id, neighbor_id, cosine, rank), rank 1..k, self
    excluded, ties broken by neighbor id (deterministic)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    v = emb.select(F.col(id_col).alias("nid"), F.col(vec_col).cast("array<double>").alias("nv"))
    q = (
        v.filter(F.col("nid").isin(query_ids))
        .select(F.col("nid").alias("qid"), F.col("nv").alias("qv"))
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("nid") != F.col("qid"))
        .withColumn("cosine", F.round(cosine_expr(F.col("qv"), F.col("nv")), 6))
    )
    w = W.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            "cosine",
            "rank",
        )
    )


def _hyperplanes(dim: int, nbits: int, seed: str = "hs-lsh") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]^dim."""
    planes = []
    for j in range(nbits):
        row = []
        for i in range(dim):
            d = hashlib.md5(f"{seed}-{j}-{i}".encode()).digest()
            (u,) = struct.unpack("<Q", d[:8])
            row.append(u / float(1 << 64) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket_col(vec_col: "Column", dim: int, nbits: int = 12, seed: str = "hs-lsh") -> "Column":
    """Random-hyperplane signature: nbits sign bits packed into a long.

    The plane matrix is ONE nested-array Literal node (`F.lit` of a
    nested list), not nbits×dim scalar literals glued with `F.array` —
    the per-element form made a multi-thousand-node expression tree that
    dominated wall time with Catalyst/codegen work (12.7 s for a 500-row
    corpus).  Bit packing stays exact: `bit * 2^j` on longs equals the
    former `shiftleft(bit, j)` sum, and the dot product keeps the same
    sequential fp-add order, so signatures are bit-identical."""
    from pyspark.sql import functions as F

    planes = _hyperplanes(dim, nbits, seed)
    planes_lit = F.lit([[float(x) for x in row] for row in planes])
    return F.aggregate(
        F.transform(
            planes_lit,
            lambda p, j: (dot_expr(vec_col, p) > 0).cast("long")
            * F.pow(F.lit(2.0), j).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def lsh_bucketed_pairs(
    emb: "DataFrame",
    threshold: float = 0.4,
    nbits: int = 4,
    bands: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = 4096,
    dim: int | None = None,
) -> "DataFrame":
    """Approximate near-dup pairs via MULTI-BAND hyperplane LSH.

    Two vectors are candidates iff their nbits-bit signatures agree in ANY
    of the ``bands`` independent bands; exact cosine is then verified on
    candidates only, so precision is 1.0 and recall ≈ 1-(1-p^nbits)^bands
    with p = 1 - arccos(cos)/π.  A single band (the round-1 shape) has
    recall p^nbits — ~6% at cos 0.4 with 6 bits, i.e. vacuous.

    Scale shape: the candidate join carries only (id, band, sig) — vectors
    join back by id AFTER dedup, so the band explosion never multiplies
    vector payloads through the shuffle.  ``max_bucket`` drops degenerate
    buckets (a bucket of k ids emits k²/2 pairs; one hot bucket stalls the
    stage) — recall loss is confined to pairs only co-occurring there.
    """
    from pyspark.sql import functions as F

    if dim is None:
        # One-row probe to size the hyperplanes; pass dim explicitly to
        # skip the extra job.  Empty/null-first corpora yield an empty
        # result instead of a TypeError.
        first = emb.select(vec_col).first()
        if first is None or first[0] is None:
            return emb.sparkSession.createDataFrame(
                [], "id_a long, id_b long, cosine double"
            )
        dim = len(first[0])
    v = emb.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    sigs = F.array(
        *[lsh_bucket_col(F.col("_v"), dim, nbits, seed=f"hs-lsh-band{b}") for b in range(bands)]
    )
    # Persist the (id, band, sig) frame: it feeds the bucket-size cap,
    # BOTH sides of the candidate self-join, and is tiny (3 longs per
    # band-row) — without the cache the signature dot products run up to
    # four times.  Registered with the pipeline cache registry so bench /
    # contract drivers release it between queries.
    from hyperspace_spark.llm.dedup import _persist

    # posexplode_outer, not posexplode: the non-outer form triggers
    # InferFiltersFromGenerate, whose size/isnotnull predicates get
    # pushed below the cache into the scan and re-evaluate all 8 band
    # signatures serially (see dedup.doc_shingles).  The band array is a
    # fixed-length literal array of non-null longs, so outer ≡ inner.
    keyed = _persist(v.select("_id", F.posexplode_outer(sigs).alias("band", "sig")))
    if max_bucket:
        ok = (
            keyed.groupBy("band", "sig")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") <= max_bucket)
            .select("band", "sig")
        )
        keyed = keyed.join(ok, ["band", "sig"])  # AQE broadcasts when small
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    va = v.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
    vb = v.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", F.round(cosine_expr(F.col("_va"), F.col("_vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def ivf_topk(
    emb: "DataFrame",
    query_ids: list[int],
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "DataFrame":
    """IVF-style ANN: KMeans coarse quantizer (pyspark.ml), queries probe
    only the n_probe nearest centroids' inverted lists.  At scale the
    cluster assignment is computed once and persisted as a derived
    dataset (same lifecycle as any index)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    feat = emb.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("nv"),
    ).withColumn("features", array_to_vector(F.col("nv")))
    km = KMeans(k=n_clusters, seed=42, maxIter=10).fit(feat)
    assigned = km.transform(feat).select("nid", "nv", F.col("prediction").alias("cluster"))

    centroids = [list(map(float, c)) for c in km.clusterCenters()]
    cent_df = assigned.sparkSession.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "cluster int, cv array<double>"
    )
    q = assigned.filter(F.col("nid").isin(query_ids)).select(
        F.col("nid").alias("qid"), F.col("nv").alias("qv")
    )
    # Each query picks its n_probe nearest centroids (tiny cross join).
    qc = (
        q.crossJoin(F.broadcast(cent_df))
        .withColumn("cdist", F.round(cosine_expr(F.col("qv"), F.col("cv")), 9))
        .withColumn("crank", F.row_number().over(W.partitionBy("qid").orderBy(F.col("cdist").desc(), F.col("cluster"))))
        .filter(F.col("crank") <= n_probe)
        .select("qid", "qv", "cluster")
    )
    scored = (
        assigned.join(F.broadcast(qc), "cluster")
        .filter(F.col("nid") != F.col("qid"))
        .withColumn("cosine", F.round(cosine_expr(F.col("qv"), F.col("nv")), 6))
    )
    w = W.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("query_id"), F.col("nid").alias("neighbor_id"), "cosine", "rank")
    )
