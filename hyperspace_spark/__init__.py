"""hyperspace_spark — a PySpark-native indexing & acceleration engine.

A from-scratch rebuild of the capabilities of microsoft/hyperspace
(reference: /root/reference) on idiomatic PySpark: derived datasets
("indexes") stored as Parquet on the data lake, a JSON operation log that
versions them, a Python planner that rewrites DataFrame queries to read
index data instead of source data, and a full lifecycle API
(create/refresh/optimize/delete/restore/vacuum/cancel).

Beyond the reference surface it adds LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) designed
for 100 TB scale.
"""

__version__ = "0.1.0"

_EXPORTS = {
    "HyperspaceConf": "hyperspace_spark.config",
    "Hyperspace": "hyperspace_spark.hyperspace",
    "enable_hyperspace": "hyperspace_spark.hyperspace",
    "disable_hyperspace": "hyperspace_spark.hyperspace",
    "is_hyperspace_enabled": "hyperspace_spark.hyperspace",
    "CoveringIndexConfig": "hyperspace_spark.indexes.covering",
    "ZOrderCoveringIndexConfig": "hyperspace_spark.indexes.zorder",
    "DataSkippingIndexConfig": "hyperspace_spark.indexes.dataskipping",
    "MinMaxSketch": "hyperspace_spark.indexes.sketches",
    "BloomFilterSketch": "hyperspace_spark.indexes.sketches",
    "ValueListSketch": "hyperspace_spark.indexes.sketches",
    "PartitionSketch": "hyperspace_spark.indexes.sketches",
    "RowCountSketch": "hyperspace_spark.indexes.sketches",
    "SumSketch": "hyperspace_spark.indexes.sketches",
    "IvfIndexConfig": "hyperspace_spark.indexes.ann",
    "InvertedTextIndexConfig": "hyperspace_spark.indexes.inverted",
    "asof_join": "hyperspace_spark.relational",
    "range_join": "hyperspace_spark.relational",
    "distinct_count_sketch": "hyperspace_spark.relational",
}


def __getattr__(name):
    # Lazy exports keep `import hyperspace_spark` cheap (no pyspark import
    # until an engine class is actually touched).
    if name in _EXPORTS:
        import importlib

        mod = importlib.import_module(_EXPORTS[name])
        return getattr(mod, name)
    raise AttributeError(f"module 'hyperspace_spark' has no attribute {name!r}")

__all__ = [
    "Hyperspace",
    "enable_hyperspace",
    "disable_hyperspace",
    "is_hyperspace_enabled",
    "HyperspaceConf",
    "CoveringIndexConfig",
    "ZOrderCoveringIndexConfig",
    "DataSkippingIndexConfig",
    "MinMaxSketch",
    "BloomFilterSketch",
    "ValueListSketch",
    "PartitionSketch",
    "RowCountSketch",
    "SumSketch",
    "IvfIndexConfig",
    "InvertedTextIndexConfig",
    "asof_join",
    "range_join",
    "distinct_count_sketch",
]
