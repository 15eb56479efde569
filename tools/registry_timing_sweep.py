"""One-shot wall-time sweep over EVERY registered query at a given SF.

Coarse by design (single timed pass after an untimed compile pass, one
shared session): the output ranks queries so the optimization round can
spot non-headline outliers — it is NOT the bench and carries no
calibration. Usage:

    python tools/registry_timing_sweep.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/registry_sweep.json"

    from terrorblade_spark.registry import get_queries
    from terrorblade_spark.session import get_spark

    spark = get_spark("registry-sweep")
    queries = get_queries()

    results: dict[str, float] = {}
    for name, fn in queries.items():
        # untimed compile/first-touch pass, then clear caches so the
        # timed pass is data-cold compile-warm (same idea as bench.py)
        try:
            fn(spark, sf_dir).count()
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"sweep:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            results[name] = round(time.perf_counter() - t0, 3)
            spark.catalog.clearCache()
        except Exception as e:  # record, keep sweeping
            results[name] = -1.0
            print(f"# ERROR {name}: {e}", file=sys.stderr)
        print(f"# {name}: {results[name]}", flush=True)

    ranked = dict(sorted(results.items(), key=lambda kv: -kv[1]))
    with open(out, "w") as f:
        json.dump(ranked, f, indent=1)
    print(json.dumps({"total_s": round(sum(v for v in ranked.values() if v > 0), 1),
                      "top10": dict(list(ranked.items())[:10])}))


if __name__ == "__main__":
    main()
