"""Phase probe for q79_event_thread_roots at a given SF dir.

Times: (a) parent-edge derivation (window lag + filter, materialized
via count), (b) resolve_roots over those edges (count of the resolved
relation), (c) the full query. Per-phase Spark job counts are printed
too, so the fixed per-round cost of the pointer-doubling loop is
visible separately from data volume.

Run: python tools/q79_phase_probe.py [sf_dir] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("q79_phase_probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    sc = spark.sparkContext
    tracker = sc.statusTracker

    from pyspark.sql import Window

    from terrorblade_spark.operators.components import resolve_roots
    from terrorblade_spark.queries.eventops import (
        _Q79_GAP_MS,
        q79_event_thread_roots,
    )
    from terrorblade_spark.tables import load_table

    def jobs() -> int:
        return len(sc.statusTracker().getJobIdsForGroup(None) or [])

    for rep in range(reps):
        spark.catalog.clearCache()
        j0 = jobs()
        t0 = time.time()
        e = load_table(spark, sf_dir, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        gap = F.unix_millis(F.col("ts")) - F.lag(F.unix_millis(F.col("ts"))).over(w)
        with_parent = e.select(
            "event_id",
            F.when(gap <= _Q79_GAP_MS, F.lag("event_id").over(w)).alias("parent_id"),
        )
        edges = with_parent.where(F.col("parent_id").isNotNull()).select(
            F.col("event_id").alias("child"), F.col("parent_id").alias("parent")
        )
        n_edges = edges.count()
        t1 = time.time()
        j1 = jobs()
        n_resolved = resolve_roots(edges, "child", "parent").count()
        t2 = time.time()
        j2 = jobs()
        spark.catalog.clearCache()
        n_rows = q79_event_thread_roots(spark, sf_dir).count()
        t3 = time.time()
        j3 = jobs()
        print(
            f"rep{rep}: edges={t1-t0:.2f}s ({n_edges} edges, {j1-j0} jobs) "
            f"resolve={t2-t1:.2f}s ({n_resolved} rows, {j2-j1} jobs) "
            f"full_query={t3-t2:.2f}s ({n_rows} rows, {j3-j2} jobs)",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
