"""Driver simulation: run every queries() entry IN REGISTRATION ORDER
(the order the driver uses) against its DuckDB oracle at sf0.01, in one
Spark session — catches cross-query interference (temp-view collisions,
conf leakage, cache interplay) that the alphabetically-parametrized
pytest contract cannot see.

Not collected by pytest (no test_ prefix); run manually:
    python tests/driver_sim.py [sf_dir]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

# ONE normalization implementation of the comparison contract: reuse the
# contract test's helpers so the sim can never diverge from the pytest
# gate's canonicalization rules.
from tests.test_entry_contract import TABLES, norm_cell, normalize  # noqa: E402,F401


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
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
        .config("spark.sql.warehouse.dir", "/tmp/hs_driver_sim_wh")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    t_all = time.perf_counter()
    for i, (name, fn) in enumerate(queries.items()):
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            cols = [f.name for f in df.schema.fields]
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            print(f"[{i:2d}] {name}: SPARK ERROR {e}")
            continue
        if name not in oracles:
            print(f"[{i:2d}] {name}: rows-only ({len(rows)} rows) {time.perf_counter()-t0:.2f}s")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append((name, f"oracle error: {e}"))
            print(f"[{i:2d}] {name}: ORACLE ERROR {e}")
            continue
        ok_cols = sorted(cols) == sorted(dcols)
        ok_rows = len(rows) == len(drows)
        ok_vals = ok_cols and ok_rows and normalize(rows, cols) == normalize(drows, dcols)
        status = "OK" if ok_vals else f"MISMATCH cols={ok_cols} rows={len(rows)}/{len(drows)}"
        if not ok_vals:
            failures.append((name, status))
        print(f"[{i:2d}] {name}: {status} ({len(rows)} rows) {time.perf_counter()-t0:.2f}s")
    print(f"\ntotal {time.perf_counter()-t_all:.1f}s, {len(failures)} failures")
    for name, why in failures:
        print("FAIL:", name, why)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
