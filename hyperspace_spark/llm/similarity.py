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


# lsh_bucketed_pairs verify-strategy gate: inputs whose FILE bytes are
# at or below this take the broadcast-matrix verify (driver + every
# executor hold the full corpus matrix — float64 in memory is ~4-8x the
# parquet bytes, so 64 MiB of files is roughly a 256-512 MB broadcast,
# the conventional comfortable broadcast size).  Above it, the join
# verify scales out.
_BROADCAST_VERIFY_MAX_BYTES = 64 << 20


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


# ---------------------------------------------------------------------------
# Arrow-batched kernels (r14): vectorized twins of the HOF expressions
# above.  Catalyst evaluates higher-order-function lambdas per ELEMENT
# with no codegen — a 32-plane signature over dim-64 vectors measured
# seconds per 2k rows, the dominant cost of every LSH/ANN query (same
# finding, and same fix, as llm/dedup.minhash_signatures' permutation
# kernel).  Each kernel reproduces the JVM arithmetic BIT-FOR-BIT:
# products are taken elementwise and accumulated SEQUENTIALLY over the
# array index (acc = acc + x_i*y_i, one numpy op per index, vectorized
# across rows), which is exactly the fp-add order of
# F.aggregate(F.zip_with(...)); comparisons/int packing are exact.
# Asserted against the HOF forms in tests/test_llm_ops.py.  Purely an
# execution-strategy change — plans swap a chain of interpreted lambda
# nodes for one ArrowEvalPython node.
# ---------------------------------------------------------------------------


# NOTE: every kernel below is a fully self-contained nested closure —
# helpers are (re)defined INSIDE the factory, never referenced from
# module level.  Cloudpickle serializes module-level functions of an
# importable module BY REFERENCE, and the Python workers of a driver
# that put this repo on sys.path manually (the verify drive, embedding
# users) cannot import ``hyperspace_spark`` — the by-value closure is
# the only shape that runs everywhere (same convention as
# llm/dedup.minhash_signatures' kernel).


def _make_seq_dot_norms():
    """(dot, norm_a, norm_b) with sequential per-index accumulation —
    the exact op order of dot_expr/norm_expr.  X, Y: (n, dim) float64."""
    import numpy as np

    def seq_dot_norms(X, Y):
        n = X.shape[0]
        dot = np.zeros(n)
        na = np.zeros(n)
        nb = np.zeros(n)
        for d in range(X.shape[1]):
            x = X[:, d]
            y = Y[:, d]
            dot = dot + x * y
            na = na + x * x
            nb = nb + y * y
        return dot, np.sqrt(na), np.sqrt(nb)

    return seq_dot_norms


def _make_pair_groups():
    """Row indices grouped by (equal) vector length, skipping rows the
    HOF forms NULL out (either side NULL, or lengths differ)."""

    def pair_groups(a_vals, b_vals):
        groups = {}
        for i in range(len(a_vals)):
            a, b = a_vals[i], b_vals[i]
            if a is None or b is None or len(a) != len(b):
                continue
            groups.setdefault(len(a), []).append(i)
        return groups

    return pair_groups


def cosine_kernel():
    """pandas_udf twin of ``cosine_expr`` (zero-norm guard included)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    seq_dot_norms = _make_seq_dot_norms()
    pair_groups = _make_pair_groups()

    @F.pandas_udf("double", F.PandasUDFType.SCALAR)
    def _cos(a_col, b_col):
        out = [None] * len(a_col)
        a_vals = a_col.to_numpy()
        b_vals = b_col.to_numpy()
        for dim, idxs in pair_groups(a_vals, b_vals).items():
            if dim == 0:
                for i in idxs:
                    out[i] = 0.0  # dot 0.0 / guarded den 1.0
                continue
            X = np.stack([a_vals[i] for i in idxs]).astype(np.float64, copy=False)
            Y = np.stack([b_vals[i] for i in idxs]).astype(np.float64, copy=False)
            dot, na, nb = seq_dot_norms(X, Y)
            den = na * nb
            res = dot / np.where(den == 0.0, 1.0, den)
            for row, i in enumerate(idxs):
                out[i] = float(res[row])
        return pd.Series(out)

    return _cos


def dot_kernel():
    """pandas_udf twin of ``dot_expr`` (sequential accumulation)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    pair_groups = _make_pair_groups()

    @F.pandas_udf("double", F.PandasUDFType.SCALAR)
    def _dot(a_col, b_col):
        out = [None] * len(a_col)
        a_vals = a_col.to_numpy()
        b_vals = b_col.to_numpy()
        for dim, idxs in pair_groups(a_vals, b_vals).items():
            if dim == 0:
                for i in idxs:
                    out[i] = 0.0
                continue
            X = np.stack([a_vals[i] for i in idxs]).astype(np.float64, copy=False)
            Y = np.stack([b_vals[i] for i in idxs]).astype(np.float64, copy=False)
            acc = np.zeros(len(idxs))
            for d in range(dim):
                acc = acc + X[:, d] * Y[:, d]
            for row, i in enumerate(idxs):
                out[i] = float(acc[row])
        return pd.Series(out)

    return _dot


def band_sigs_kernel(dim: int, nbits: int, bands: int, seed_prefix: str = "hs-lsh-band"):
    """pandas_udf twin of ``F.array(lsh_bucket_col(... band b) for b)``:
    vec (array<double>) -> array<long> of the ``bands`` band signatures.
    Dots accumulate sequentially per index (bit-identical signs); bit
    packing is integer-exact.  Rows whose vector is NULL or not ``dim``
    long yield all-NULL signatures — exactly what the zip_with form
    produces (null dot -> null bit -> null sig per band)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    planes = np.array(
        [_hyperplanes(dim, nbits, seed=f"{seed_prefix}{b}") for b in range(bands)],
        dtype=np.float64,
    ).reshape(bands * nbits, dim)
    weights = np.tile((1 << np.arange(nbits, dtype=np.int64)), bands)

    @F.pandas_udf("array<long>", F.PandasUDFType.SCALAR)
    def _sigs(v_col):
        nulls = [None] * bands
        out = [nulls] * len(v_col)
        vals = v_col.to_numpy()
        idxs = [
            i for i in range(len(vals)) if vals[i] is not None and len(vals[i]) == dim
        ]
        if idxs:
            X = np.stack([vals[i] for i in idxs]).astype(np.float64, copy=False)
            acc = np.zeros((len(idxs), planes.shape[0]))
            for d in range(dim):
                acc = acc + X[:, d : d + 1] * planes[None, :, d][0]
            bits = (acc > 0).astype(np.int64) * weights
            sigs = bits.reshape(len(idxs), bands, nbits).sum(axis=2)
            for row, i in enumerate(idxs):
                out[i] = [int(s) for s in sigs[row]]
        return pd.Series(out)

    return _sigs


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
        .withColumn("cosine", F.round(cosine_kernel()(F.col("qv"), F.col("nv")), 6))
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

    # Verify-strategy gate decided up front (driver-side file size, zero
    # jobs) so the broadcast path's corpus collect can double as the dim
    # probe — one job and one scan instead of two (r14).
    from hyperspace_spark.llm.dedup import _file_input_bytes

    corpus_bytes = _file_input_bytes(emb)
    # ADVICE r14 (high): _file_input_bytes returns -1 for "files exist
    # but cannot be sized — assume big"; the gate must treat that as
    # LARGE (join path), not small, or an unsizable corpus would be
    # collect()ed to the driver.  Same guard as embedding_near_dup_pairs.
    use_broadcast = (
        corpus_bytes is not None and 0 <= corpus_bytes <= _BROADCAST_VERIFY_MAX_BYTES
    )
    v = emb.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    corpus_rows = None
    if use_broadcast:
        corpus_rows = v.collect()
        if dim is None:
            # Same semantics as the one-row probe below: empty or
            # null-FIRST corpora yield an empty result.
            if not corpus_rows or corpus_rows[0][1] is None:
                return emb.sparkSession.createDataFrame(
                    [], "id_a long, id_b long, cosine double"
                )
            dim = len(corpus_rows[0][1])
    elif dim is None:
        # One-row probe to size the hyperplanes; pass dim explicitly to
        # skip the extra job.  Empty/null-first corpora yield an empty
        # result instead of a TypeError.
        first = emb.select(vec_col).first()
        if first is None or first[0] is None:
            return emb.sparkSession.createDataFrame(
                [], "id_a long, id_b long, cosine double"
            )
        dim = len(first[0])
    # All bands*nbits plane dots in ONE Arrow-batched numpy kernel —
    # bit-identical to the lsh_bucket_col HOF form (see band_sigs_kernel;
    # r14: the interpreted per-element lambdas were the query's dominant
    # cost, ~5 s for 2k dim-64 vectors at 32 planes).
    sigs = band_sigs_kernel(dim, nbits, bands)(F.col("_v"))
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
        # Hot-bucket cap as an OVER-cap blacklist (r15, VERDICT r14 #4).
        # The r14 shape kept every under-cap bucket via an inner join
        # against the groupBy output, and because only the raw keyed
        # frame is persisted, that groupBy+join subtree was planned
        # TWICE (once under each self-join side): 2 aggregate Exchanges
        # + 2 BroadcastExchanges in the static plan.  The over-cap set
        # is the tiny side by construction — at most
        # total_band_rows / max_bucket buckets CAN exceed the cap
        # (usually zero; hot buckets are by definition few), while the
        # under-cap "ok" set r14 broadcast grows with the corpus.  So:
        # one driver-side job computes the blacklist (it also
        # materializes the persisted keyed frame before the self-join);
        # an empty blacklist — the common case — removes the cap subplan
        # from the query entirely, and a non-empty one applies as a
        # broadcast anti-join (strictly smaller broadcast than r14's).
        hot = (
            keyed.groupBy("band", "sig")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > max_bucket)
            .select("band", "sig")
            .collect()
        )
        if hot:
            over = emb.sparkSession.createDataFrame(hot, "band int, sig long")
            keyed = keyed.join(F.broadcast(over), ["band", "sig"], "left_anti")
    a, b = keyed.alias("a"), keyed.alias("b")
    # NOTE (r14): no .distinct() here.  A pair that collides in k of the
    # ``bands`` bands appears k times; deduplicating BEFORE verification
    # cost a full exchange of the candidate set (820k rows for the 2k-
    # corpus contract settings — the pipeline's largest shuffle), while
    # re-verifying a duplicate costs ~dim vectorized flops.  The
    # duplicates are collapsed by the post-filter distinct below, which
    # runs on the (threshold-selective) SURVIVORS — guide §2.4, remove
    # shuffles outright / shuffle only what survives.
    cand = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.sig") == F.col("b.sig"))
        & (F.col("a._id") < F.col("b._id")),
    ).select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
    # Exact-cosine verification of the candidates.  Two strategies, same
    # bit-exact arithmetic (sequential per-index accumulation — the
    # dot_expr/cosine_expr op order):
    #
    # - broadcast (small corpora): ship ONLY the (id_a, id_b) pairs to
    #   the Python workers and gather both vectors from a broadcast
    #   (n x dim) numpy matrix.  At honest LSH widths the candidate set
    #   is many times the corpus (e.g. 820k pairs from a 2k corpus at
    #   the 4-bit contract settings), so joining vectors onto pairs
    #   moves |cand| x 2 x dim doubles through the Arrow boundary —
    #   ~840 MB where the id pairs are 13 MB (guide §8: decide with
    #   small rows, attach heavy bytes once... or here, never).
    # - join (the 100 TB path): equi-join each side's vectors onto the
    #   pairs (broadcast or shuffle, Spark's choice) and run the
    #   pairwise kernel.  Scales with |cand|, needs no driver copy.
    #
    # The broadcast path gates on the DRIVER-SIDE file size of the
    # input (zero jobs, same helper as embedding_near_dup_pairs' guard);
    # unsizable or large inputs take the join path.  ``corpus_rows`` was
    # collected once above (doubling as the dim probe).
    if use_broadcast:
        import numpy as np

        rows = corpus_rows
        ids = np.array([r[0] for r in rows if r[1] is not None and len(r[1]) == dim])
        # ADVICE r14 (low): the broadcast index is {id: position} — a
        # duplicated id would keep only its LAST vector while the join
        # path scores every copy.  Ids are unique in every contract
        # corpus; if a caller ever passes duplicates, take the join path
        # so both strategies stay result-identical.  (Null / wrong-dim
        # vectors never reach the candidate set: their band signatures
        # are NULL and null joins match nothing, so the index gather
        # below cannot miss.)
        if len(ids) != len(np.unique(ids)):
            use_broadcast = False
    if use_broadcast:
        mat = np.array(
            [r[1] for r in rows if r[1] is not None and len(r[1]) == dim],
            dtype=np.float64,
        )
        sc = emb.sparkSession.sparkContext
        b_ids = sc.broadcast(ids)
        b_mat = sc.broadcast(mat)
        seq_dot_norms = _make_seq_dot_norms()

        def _verify(batches):
            import numpy as np
            import pandas as pd

            index = {int(i): p for p, i in enumerate(b_ids.value)}
            corpus = b_mat.value
            for pdf in batches:
                ia = pdf["id_a"].map(index).to_numpy()
                ib = pdf["id_b"].map(index).to_numpy()
                X = corpus[ia.astype(np.int64)]
                Y = corpus[ib.astype(np.int64)]
                dot, na, nb = seq_dot_norms(X, Y)
                den = na * nb
                cos = dot / np.where(den == 0.0, 1.0, den)
                yield pd.DataFrame(
                    {"id_a": pdf["id_a"], "id_b": pdf["id_b"], "_raw": cos}
                )

        id_type = dict(cand.dtypes)["id_a"]
        scored = cand.mapInPandas(
            _verify, f"id_a {id_type}, id_b {id_type}, _raw double"
        )
        return (
            # round JVM-side (HALF_UP), exactly as the join path does
            scored.withColumn("cosine", F.round(F.col("_raw"), 6))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine")
            .distinct()  # collapse multi-band duplicates (survivors only)
        )

    va = v.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
    vb = v.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", F.round(cosine_kernel()(F.col("_va"), F.col("_vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .distinct()  # collapse multi-band duplicates (survivors only)
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
    # HOF cosine for the centroid pick: queries x n_clusters rows — a
    # kernel's fixed Python round trip loses on bounded-small frames.
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
        .withColumn("cosine", F.round(cosine_kernel()(F.col("qv"), F.col("nv")), 6))
    )
    w = W.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("query_id"), F.col("nid").alias("neighbor_id"), "cosine", "rank")
    )
