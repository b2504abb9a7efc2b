"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship index-accelerated join on sf0.001;
``queries()`` exposes every implemented operator from SURVEY §2 plus the
LLM-pipeline extensions; ``oracle_sql()`` gives the DuckDB-equivalent
SQL for every deterministic query (approximate operators — MinHash LSH,
hyperplane LSH, IVF — are rows-only by design).

Implementation lives in hyperspace_spark.workload; indexes are built in
a per-scale-factor workspace under /tmp and reused across processes via
the index operation log.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hyperspace_spark.workload import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: lineitem ⋈ orders revenue rollup, accelerated by
    co-bucketed covering indexes (shuffle-free sort-merge join)."""
    return QUERIES["join_cobucketed"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
