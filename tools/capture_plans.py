"""Capture .explain("formatted") for headline queries into plans/<round>/.

Usage: python tools/capture_plans.py <suffix> [query ...]
  suffix: "before" or "after" (file name becomes plans/<round>/<query>_<suffix>.txt)
  queries: default = bench.HEADLINE
  round dir: $PLANS_ROUND (default "r11"); $PLANS_OUT overrides the full path

Also prints a one-line plan-shape summary per query (Exchange count,
join strategies, Python eval nodes) so before/after diffs are quick to
read without opening the files.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    from terrorblade_spark.registry import get_queries
    from terrorblade_spark.session import get_spark

    names = sys.argv[2:] or bench.HEADLINE
    spark = get_spark("capture_plans")
    queries = get_queries()
    out_dir = os.environ.get("PLANS_OUT") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLANS_ROUND", "r11"),
    )
    os.makedirs(out_dir, exist_ok=True)

    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(set(re.findall(r"(\w*Join\w*)\s", plan)))
        py = sorted(set(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas)", plan)))
        print(f"{name}: Exchange={n_ex} joins={joins} python={py} -> {path}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
