"""Analytics tour: the facade surface a reference user lands on —
sessionization, funnels, retention, as-of enrichment, thread
reconstruction, and vector + lexical search over the test tables.

    python examples/analytics_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from terrorblade_spark.registry import get_queries  # noqa: E402
from terrorblade_spark.session import get_spark  # noqa: E402

TOUR = [
    "q20_session_stats",          # gap sessionization + rollup
    "q74_event_funnel",           # ordered-step funnel
    "q75_weekly_retention",       # cohort retention
    "q72_asof_view_before_purchase",  # point-in-time enrichment
    "q79_event_thread_roots",     # pointer-doubling threading
    "q36_cosine_topk",            # vector search
    "q71_bm25_persisted_topk",    # lexical search (persisted index)
    "q104_nation_trade_pagerank",  # link-graph centrality (Pregel supersteps)
    "q108_fuzzy_customer_match",   # entity resolution (blocked levenshtein)
    "q114_copurchase_reach",       # hop-bounded BFS (seed distance)
    "q115_trade_communities",      # label-propagation communities
    "q116_brand_copurchase_rules", # market-basket support/confidence/lift
    "q119_value_outliers",         # robust median/MAD anomaly scoring
    "q121_lang_source_chi2",       # categorical association summary
    "q123_value_k_correlation",    # reproducible Pearson correlation
    "q124_corpus_rollup",          # OLAP grouping sets
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("analytics-demo")
    queries = get_queries()
    for name in TOUR:
        print(f"\n=== {name} ===")
        queries[name](spark, sf_dir).show(5, truncate=False)


if __name__ == "__main__":
    main()
