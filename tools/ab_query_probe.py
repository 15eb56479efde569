"""Interleaved A/B wall probe for a set of declared queries.

Runs the SAME queries against the repo root given on argv (so a git
worktree at a baseline commit and the working tree can be timed by two
separate invocations), with the bench's methodology: one untimed
compile/first-touch pass, then N timed noop-sink executions with cache
clears between. Prints one JSON line per query with min/median and the
Spark job count per execution (a proxy for plan-shape changes the
driver cannot see from wall time alone).

Usage:
    python tools/ab_query_probe.py <repo_root> <label> <reps> <q> [q ...]
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


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(f"ab-{label}")
    queries = get_queries()
    tracker = spark.sparkContext.statusTracker()
    for name in names:
        fn = queries[name]
        noop(fn(spark, sf_dir))  # compile-warm pass
        spark.catalog.clearCache()
        walls: list[float] = []
        jobs: list[int] = []
        for _ in range(reps):
            j0 = len(tracker.getJobIdsForGroup(None))
            t0 = time.perf_counter()
            noop(fn(spark, sf_dir))
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
