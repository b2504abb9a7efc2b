"""Scratch runner: verify a subset of contract queries against their
DuckDB oracles (driver_sim for a named subset).

    python scripts/new_query_check.py q1 q2 ... [--sf /root/testdata/sf0.01]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from tests.test_entry_contract import TABLES, normalize  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.01"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    rc = 0
    for name in args:
        t0 = time.perf_counter()
        fn = queries[name]
        df = fn(spark, sf_dir)
        cols = [f.name for f in df.schema.fields]
        rows = [tuple(r) for r in df.collect()]
        if name not in oracles:
            print(f"{name}: rows-only ({len(rows)} rows) {time.perf_counter()-t0:.2f}s")
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok = (
            sorted(cols) == sorted(dcols)
            and len(rows) == len(drows)
            and normalize(rows, cols) == normalize(drows, dcols)
        )
        print(
            f"{name}: {'OK' if ok else 'MISMATCH'} spark={len(rows)} oracle={len(drows)} "
            f"cols {sorted(cols)} vs {sorted(dcols)} {time.perf_counter()-t0:.2f}s"
        )
        if not ok:
            rc = 1
            for r in sorted(normalize(rows, cols))[:5]:
                print("  spark :", r)
            for r in sorted(normalize(drows, dcols))[:5]:
                print("  oracle:", r)
    sys.exit(rc)


if __name__ == "__main__":
    main()
