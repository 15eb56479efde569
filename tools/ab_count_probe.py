"""Interleaved A/B wall probe using the BENCH's action (.count()) —
the sweep/bench methodology, unlike ab_query_probe's noop sink (which
computes every column and so hides count-path pruning differences).

Usage: python tools/ab_count_probe.py <repo_root> <label> <reps> <q>...
"""

from __future__ import annotations

import json
import statistics
import sys
import time

repo_root = sys.argv[1]
label = sys.argv[2]
reps = int(sys.argv[3])
names = sys.argv[4:]

sys.path.insert(0, repo_root)

import os

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from terrorblade_spark.registry import get_queries  # noqa: E402
from terrorblade_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(f"abc-{label}")
    queries = get_queries()
    tracker = spark.sparkContext.statusTracker()
    for name in names:
        fn = queries[name]
        fn(spark, sf_dir).count()  # compile-warm
        spark.catalog.clearCache()
        walls, jobs = [], []
        for _ in range(reps):
            j0 = len(tracker.getJobIdsForGroup(None))
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            walls.append(time.perf_counter() - t0)
            jobs.append(len(tracker.getJobIdsForGroup(None)) - j0)
            spark.catalog.clearCache()
        print(
            json.dumps(
                {
                    "label": label,
                    "query": name,
                    "median": round(statistics.median(walls), 3),
                    "min": round(min(walls), 3),
                    "walls": [round(w, 3) for w in walls],
                    "jobs": jobs,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
