"""Persisted IVF ANN index: lifecycle + search quality.

Extension beyond the reference (no vector type there) — the same
metadata-log lifecycle applied to an IVF structure; see indexes/ann.py.
"""

import pytest
from pyspark.sql import functions as F

from hyperspace_spark import Hyperspace, IvfIndexConfig
from hyperspace_spark.llm import similarity

from tests.conftest import SF_DIR, table


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def hs(spark, emb, tmp_path_factory):
    hs = Hyperspace(spark, system_path=str(tmp_path_factory.mktemp("hsidx_ann")))
    hs.create_index(emb, IvfIndexConfig("ann_ivf", n_clusters=8))
    return hs


def test_build_persists_centroids_and_partitions(spark, hs):
    entry = next(e for e in hs._active_entries(hs.conf()) if e.name == "ann_ivf")
    props = entry.derived_properties
    assert len(props["centroids"]) == 8
    assert any("cluster=" in f.path for f in entry.content_files), "not partitioned by cluster"


def test_search_recall_vs_brute(spark, hs, emb):
    got = hs.ann_search("ann_ivf", query_ids=[0, 1, 2], k=5, n_probe=3).collect()
    brute = similarity.cosine_topk(emb, [0, 1, 2], k=5).collect()
    g = {(r.query_id, r.neighbor_id) for r in got}
    b = {(r.query_id, r.neighbor_id) for r in brute}
    assert len(got) == 15
    assert len(g & b) / len(b) >= 0.5  # probe recall at 3/8 clusters


def test_search_exact_when_probing_all_clusters(spark, hs, emb):
    got = hs.ann_search("ann_ivf", query_ids=[0, 1], k=5, n_probe=8).collect()
    brute = similarity.cosine_topk(emb, [0, 1], k=5).collect()
    assert {(r.query_id, r.rank, r.neighbor_id) for r in got} == {
        (r.query_id, r.rank, r.neighbor_id) for r in brute
    }


def test_search_partition_pruning(spark, hs):
    """A 1-probe search must physically read one cluster directory
    (inputFiles() lists pre-pruning, so assert on the executed scan)."""
    entry = next(e for e in hs._active_entries(hs.conf()) if e.name == "ann_ivf")
    import json as _json

    from pyspark.sql.types import StructType

    schema = StructType.fromJson(_json.loads(entry.derived_properties["schemaJson"]))
    probed = (
        spark.read.schema(schema)
        .option("basePath", entry.index_data_dirs[-1])
        .parquet(*entry.index_data_dirs)
        .filter(F.col("cluster") == 0)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    read_files = {r.f for r in probed}
    assert read_files and all("cluster=0" in f for f in read_files)
    assert len(read_files) < len(entry.content_files)


def test_lifecycle_delete_restore_refresh(spark, hs, emb):
    hs.delete_index("ann_ivf")
    from hyperspace_spark.hyperspace import HyperspaceException

    with pytest.raises(HyperspaceException):
        hs.ann_search("ann_ivf", query_ids=[0])
    hs.restore_index("ann_ivf")
    assert hs.ann_search("ann_ivf", query_ids=[0], k=2).count() == 2
    # incremental silently upgrades to full (centroid refit required)
    hs.refresh_index("ann_ivf", "incremental")
    assert hs.ann_search("ann_ivf", query_ids=[0], k=2).count() == 2


def test_explicit_query_vectors(spark, hs, emb):
    vec = emb.filter("vec_id = 7").select("embedding").first()[0]
    got = hs.ann_search("ann_ivf", query_vectors={999: list(vec)}, k=1, n_probe=8).collect()
    # nearest neighbor of vec_id 7's own vector is vec_id 7 itself
    assert got[0].neighbor_id == 7 and got[0].cosine == 1.0
