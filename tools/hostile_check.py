"""Adversarial-session correctness probe.

The driver's harness passes its OWN SparkSession to `queries()` — none of
`session.get_spark`'s configs apply. Round 1 lost 15 queries to exactly
that (nanosAsLong). This probe runs every registered query on a session
built with NO repo configs and a deliberately hostile timezone, so any
conf a query's correctness depends on must have been set at runtime in
`tables.load_table` (or in the query itself) to pass.

Usage: python tools/hostile_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from check_oracle import compare  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    from terrorblade_spark.registry import get_oracles, get_queries
    from terrorblade_spark.tables import TABLE_NAMES

    # Vanilla session: default shuffle partitions (200), default ANSI
    # mode, no Arrow flag, no nanosAsLong — plus a non-UTC timezone,
    # the nastiest knob a caller can plausibly carry.
    spark = (
        SparkSession.builder.appName("hostile-check")
        .master("local[8]")
        .config("spark.sql.session.timeZone", "Asia/Tokyo")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        .getOrCreate()
    )

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries, oracles = get_queries(), get_oracles()
    failed = []
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(spark_pdf)} rows)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failed.append(name)
            print(f"FAIL {name} ({len(spark_pdf)} rows): " + "; ".join(problems))
        else:
            print(f"OK   {name} ({len(spark_pdf)} rows)")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
