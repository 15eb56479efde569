"""Link-graph queries: PageRank centrality over a trade graph derived
from the relational fixtures (customer nation -> supplier nation per
qualifying lineitem). The oracle unrolls the FIXED iteration count
into chained CTEs — recursive-CTE aggregation over the working table
is non-portable, and a static unroll is bit-deterministic up to float
summation order, handled by the standard 6-dp rounding on both sides
(the q81 rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terrorblade_spark.registry import query
from terrorblade_spark.tables import load_table

_Q104_ITER = 10
_Q104_DAMP = 0.85
# sparsify the 25-node nation graph so ranks are non-trivial: only
# high-quantity lineitems carry a trade edge
_Q104_MIN_QTY = 45

_Q104_EDGES_SQL = f"""
      SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE l.l_quantity > {_Q104_MIN_QTY}
"""


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared Spark twin of _Q104_EDGES_SQL — ONE definition for
    q104/q105/q107 so the engine can never silently diverge from the
    oracle CTE."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    ).where(F.col("l_quantity") > _Q104_MIN_QTY)
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .select(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
    )


def _q104_oracle() -> str:
    """Unroll pr0..pr{n} CTEs of the damped update — same recipe as
    operators/graph.py pagerank: contribution sum over distinct edges,
    dangling mass redistributed uniformly. Every chained CTE is
    MATERIALIZED: each step references its predecessor twice (dangling
    mass + contributions), and inlining would expand the chain
    exponentially (2^iters copies of the base scan — observed as a
    file-handle blowup before the fix)."""
    steps = []
    for i in range(1, _Q104_ITER + 1):
        steps.append(f"""
    pr{i} AS MATERIALIZED (
      SELECT n.node,
             (1.0 - {_Q104_DAMP}) / cnt.nn + {_Q104_DAMP} * (
               COALESCE(c.contrib, 0.0) + dm.m / cnt.nn
             ) AS rank
      FROM nodes n
      CROSS JOIN cnt
      CROSS JOIN (
        SELECT COALESCE(sum(rank), 0.0) AS m FROM pr{i - 1}
        WHERE node NOT IN (SELECT src FROM deg)
      ) dm
      LEFT JOIN (
        SELECT e.dst, sum(p.rank / d.deg) AS contrib
        FROM e
        JOIN pr{i - 1} p ON p.node = e.src
        JOIN deg d ON d.src = e.src
        GROUP BY e.dst
      ) c ON c.dst = n.node
    )""")
    return f"""
    WITH e AS MATERIALIZED ({_Q104_EDGES_SQL}),
    nodes AS (
      SELECT src AS node FROM e UNION SELECT dst FROM e
    ),
    deg AS (
      SELECT src, count(*)::DOUBLE AS deg FROM e GROUP BY src
    ),
    cnt AS (
      SELECT count(*)::DOUBLE AS nn FROM nodes
    ),
    pr0 AS (
      SELECT node, 1.0 / cnt.nn AS rank FROM nodes CROSS JOIN cnt
    ),{",".join(steps)}
    SELECT node, round(rank, 6) AS pagerank
    FROM pr{_Q104_ITER}
    ORDER BY node
    """


@query("q104_nation_trade_pagerank", oracle=_q104_oracle())
def q104_nation_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.graph import pagerank

    edges = _trade_edges(spark, sf_dir)
    pr = pagerank(edges, n_iter=_Q104_ITER, damping=_Q104_DAMP)
    return pr.select(
        "node", F.round("pagerank", 6).alias("pagerank")
    ).orderBy("node")


# --- q105: deterministic random walks (full value oracle) ---------------------
# node2vec-style context sampling over the same trade graph: every
# step's out-edge choice is md5 arithmetic over (seed, walk_id, step),
# so the full (walk_id, step, node) relation is bit-reproducible and
# the oracle mirrors it with the identical unrolled joins. All-integer
# algebra — no rounding needed.

_Q105_LEN = 4
_Q105_WPN = 2
_Q105_SEED = "nw-v1"


def _q105_oracle() -> str:
    steps = []
    for t in range(1, _Q105_LEN + 1):
        draw = (
            f"('0x' || substring(md5('{_Q105_SEED}/' || w.walk_id::VARCHAR || '/{t}'), 1, 15))::BIGINT"
        )
        steps.append(f"""
    w{t} AS MATERIALIZED (
      SELECT w.walk_id, x.dst AS cur
      FROM w{t - 1} w
      JOIN idx x ON x.src = w.cur AND x.i = {draw} % x.deg + 1
    )""")
    unions = "\n      UNION ALL ".join(
        f"SELECT walk_id, {t}::INTEGER AS step, cur AS node FROM w{t}"
        for t in range(_Q105_LEN + 1)
    )
    return f"""
    WITH e AS MATERIALIZED ({_Q104_EDGES_SQL}),
    idx AS MATERIALIZED (
      SELECT src, dst,
             row_number() OVER (PARTITION BY src ORDER BY dst) AS i,
             count(*) OVER (PARTITION BY src) AS deg
      FROM e
    ),
    nodes AS (
      SELECT src AS node FROM e UNION SELECT dst FROM e
    ),
    w0 AS MATERIALIZED (
      SELECT node * {_Q105_WPN} + g.r AS walk_id, node AS cur
      FROM nodes, unnest(generate_series(0, {_Q105_WPN - 1})) AS g(r)
    ),{",".join(steps)}
    SELECT * FROM ({unions})
    ORDER BY walk_id, step
    """


@query("q105_trade_graph_walks", oracle=_q105_oracle())
def q105_trade_graph_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.graph import random_walks

    edges = _trade_edges(spark, sf_dir)
    walks = random_walks(
        edges,
        walk_length=_Q105_LEN,
        walks_per_node=_Q105_WPN,
        seed=_Q105_SEED,
    )
    return walks.orderBy("walk_id", "step")


# --- q106: skip-gram context pairs from the walks (full value oracle) ---------
# walk_context_pairs over the exact q105 walk relation: the oracle
# reuses the unrolled walk CTEs and mirrors the banded self-join +
# count. All-integer algebra.

_Q106_WINDOW = 2


def _q106_oracle() -> str:
    walks = _q105_oracle()
    # swap q105's final SELECT for the pair extraction over the same CTEs
    head, _, tail = walks.rpartition("SELECT * FROM (")
    unions = tail[: tail.rindex(")")]
    return f"""{head}SELECT a.node AS center, b.node AS context, count(*) AS n_pairs
    FROM ({unions}) a
    JOIN ({unions}) b
      ON a.walk_id = b.walk_id
     AND abs(a.step - b.step) BETWEEN 1 AND {_Q106_WINDOW}
    GROUP BY a.node, b.node
    ORDER BY center, context
    """


@query("q106_walk_context_pairs", oracle=_q106_oracle())
def q106_walk_context_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.graph import walk_context_pairs

    walks = q105_trade_graph_walks(spark, sf_dir)
    out = walk_context_pairs(walks, window=_Q106_WINDOW)
    return out.orderBy("center", "context")


# --- q107: per-node triangle counts (full value oracle) -----------------------
# triangle_count over the undirected trade graph. The engine uses the
# degree-ordered edge-iterator (hub-safe wedge bound); the oracle uses
# the id-ordered 3-way join — different plans, identical integer
# counts by construction.


@query(
    "q107_trade_graph_triangles",
    oracle=f"""
    WITH e AS MATERIALIZED ({_Q104_EDGES_SQL}),
    und AS MATERIALIZED (
      SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      FROM e WHERE src <> dst
    ),
    nodes AS (
      SELECT u AS node FROM und UNION SELECT v FROM und
    ),
    tri AS (
      SELECT x.u AS a, x.v AS b, y.v AS c
      FROM und x
      JOIN und y ON y.u = x.v
      JOIN und z ON z.u = x.u AND z.v = y.v
    ),
    corners AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT n.node, coalesce(cnt.n, 0)::BIGINT AS n_triangles
    FROM nodes n
    LEFT JOIN (SELECT node, count(*) AS n FROM corners GROUP BY node) cnt
      ON cnt.node = n.node
    ORDER BY n.node
    """,
)
def q107_trade_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.graph import triangle_count

    edges = _trade_edges(spark, sf_dir)
    return triangle_count(edges).orderBy("node")


# --- q109: k-core of the customer-supplier graph (full value oracle) ----------
# kcore over the bipartite trade graph (customer and supplier node ids
# disjoint by a +10M offset). The engine peels to a true fixpoint; the
# oracle unrolls 12 peel rounds — rounds past convergence are no-ops
# (the peel set is empty and the edge relation passes through), so the
# unroll is exact for any convergence depth <= 12, with multi-round
# cascades covered by the unit tests. All-integer algebra.

_Q109_K = 3
_Q109_ROUNDS = 12

_Q109_EDGES_SQL = """
      SELECT DISTINCT c.c_custkey AS u, s.s_suppkey + 10000000 AS v
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE l.l_quantity > 45
"""


def _q109_oracle() -> str:
    steps = []
    for i in range(1, _Q109_ROUNDS + 1):
        steps.append(f"""
    keep{i} AS MATERIALIZED (
      SELECT node FROM (
        SELECT u AS node FROM er{i - 1} UNION ALL SELECT v FROM er{i - 1}
      ) GROUP BY node HAVING count(*) >= {_Q109_K}
    ),
    er{i} AS MATERIALIZED (
      SELECT e.u, e.v FROM er{i - 1} e
      WHERE e.u IN (SELECT node FROM keep{i})
        AND e.v IN (SELECT node FROM keep{i})
    )""")
    return f"""
    WITH er0 AS MATERIALIZED ({_Q109_EDGES_SQL}),{",".join(steps)}
    SELECT node, count(*) AS core_degree FROM (
      SELECT u AS node FROM er{_Q109_ROUNDS}
      UNION ALL SELECT v FROM er{_Q109_ROUNDS}
    ) GROUP BY node
    ORDER BY node
    """


@query("q109_trade_kcore", oracle=_q109_oracle())
def q109_trade_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.graph import kcore

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    ).where(F.col("l_quantity") > _Q104_MIN_QTY)
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    edges = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .select(
            F.col("c_custkey").alias("src"),
            (F.col("s_suppkey") + 10_000_000).alias("dst"),
        )
    )
    return kcore(edges, k=_Q109_K).orderBy("node")


# --- q110: weighted PageRank (full value oracle) -------------------------------
# The weighted variant end-to-end: edge weight = number of qualifying
# lineitems per (customer-nation, supplier-nation) pair, so the walk
# follows trade VOLUME, not mere existence. Oracle = the q104 unroll
# with weighted out-degrees and weighted contributions.

_Q110_ITER = 8

_Q110_WEDGES_SQL = f"""
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             count(*)::DOUBLE AS w
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE l.l_quantity > {_Q104_MIN_QTY}
      GROUP BY c.c_nationkey, s.s_nationkey
"""


def _q110_oracle() -> str:
    steps = []
    for i in range(1, _Q110_ITER + 1):
        steps.append(f"""
    pr{i} AS MATERIALIZED (
      SELECT n.node,
             (1.0 - {_Q104_DAMP}) / cnt.nn + {_Q104_DAMP} * (
               COALESCE(c.contrib, 0.0) + dm.m / cnt.nn
             ) AS rank
      FROM nodes n
      CROSS JOIN cnt
      CROSS JOIN (
        SELECT COALESCE(sum(rank), 0.0) AS m FROM pr{i - 1}
        WHERE node NOT IN (SELECT src FROM deg)
      ) dm
      LEFT JOIN (
        SELECT e.dst, sum(p.rank * e.w / d.deg) AS contrib
        FROM e
        JOIN pr{i - 1} p ON p.node = e.src
        JOIN deg d ON d.src = e.src
        GROUP BY e.dst
      ) c ON c.dst = n.node
    )""")
    return f"""
    WITH e AS MATERIALIZED ({_Q110_WEDGES_SQL}),
    nodes AS (
      SELECT src AS node FROM e UNION SELECT dst FROM e
    ),
    deg AS (
      SELECT src, sum(w) AS deg FROM e GROUP BY src
    ),
    cnt AS (
      SELECT count(*)::DOUBLE AS nn FROM nodes
    ),
    pr0 AS (
      SELECT node, 1.0 / cnt.nn AS rank FROM nodes CROSS JOIN cnt
    ),{",".join(steps)}
    SELECT node, round(rank, 6) AS pagerank
    FROM pr{_Q110_ITER}
    ORDER BY node
    """


@query("q110_weighted_trade_pagerank", oracle=_q110_oracle())
def q110_weighted_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.graph import pagerank

    wedges = _trade_edges(spark, sf_dir).groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("double").alias("w")
    )
    pr = pagerank(wedges, n_iter=_Q110_ITER, damping=_Q104_DAMP, weight_col="w")
    return pr.select("node", F.round("pagerank", 6).alias("pagerank")).orderBy("node")


# --- q114: hop-bounded BFS reach over the part co-purchase graph --------------
# Multi-source shortest-hop distances (the TrustRank/seed-distance
# curation signal): parts co-ordered with another high-quantity part
# form an undirected co-purchase graph; seeds are the size-50 parts.
# The hop bound is part of the semantics ("within <= 4 hops"), so the
# unrolled oracle is exact BY DEFINITION — no convergence argument, in
# contrast to the q78 components fixpoint. All-integer algebra.

_Q114_HOPS = 4
_Q114_MIN_QTY = 48
_Q114_SEED_SIZE = 50

_Q114_BASKET_SQL = f"""
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      FROM lineitem WHERE l_quantity >= {_Q114_MIN_QTY}
"""


def _q114_oracle() -> str:
    steps = []
    for h in range(1, _Q114_HOPS + 1):
        steps.append(f"""
    r{h} AS MATERIALIZED (
      SELECT DISTINCT e.v AS node FROM e JOIN r{h - 1} r ON r.node = e.u
    )""")
    unions = "\n      UNION ALL ".join(
        f"SELECT node, {h} AS d FROM r{h}" for h in range(_Q114_HOPS + 1)
    )
    return f"""
    WITH b AS MATERIALIZED ({_Q114_BASKET_SQL}),
    und AS MATERIALIZED (
      SELECT x.pk AS u, y.pk AS v FROM b x JOIN b y ON x.ok = y.ok AND x.pk < y.pk
    ),
    e AS MATERIALIZED (
      SELECT DISTINCT u, v FROM (
        SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und
      )
    ),
    r0 AS (
      SELECT p_partkey AS node FROM part WHERE p_size = {_Q114_SEED_SIZE}
    ),{",".join(steps)}
    SELECT node, min(d)::INTEGER AS distance
    FROM ({unions})
    GROUP BY node
    ORDER BY node
    """


@query("q114_copurchase_reach", oracle=_q114_oracle())
def q114_copurchase_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.graph import bfs_distances

    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= _Q114_MIN_QTY)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a, b = baskets.alias("a"), baskets.alias("b")
    und = (
        a.join(b, "ok")
        .where(F.col("a.pk") < F.col("b.pk"))
        .select(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
    )
    # symmetrize row-locally (explode, not a two-branch union): the
    # union would re-execute the basket self-join per branch — only
    # the exchanges below it are reused across branches
    edges = und.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    seeds = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_size") == _Q114_SEED_SIZE)
        .select(F.col("p_partkey").alias("node"))
    )
    return bfs_distances(edges, seeds, max_hops=_Q114_HOPS).orderBy("node")


# --- q115: label-propagation communities on the weighted nation graph ---------
# Deterministic SYNCHRONOUS label propagation (fixed rounds, max-pull
# label, smallest-label ties) over the same weighted trade graph as
# q110 — community detection where connected components is too coarse
# (the nation graph is one component; LPA splits it along trade-volume
# lines). Weights are lineitem counts, so per-label pulls are exact in
# double on both engines and the argmax is engine-portable.

_Q115_ITER = 4


def _q115_oracle() -> str:
    steps = []
    for i in range(1, _Q115_ITER + 1):
        steps.append(f"""
    l{i} AS MATERIALIZED (
      SELECT node, community FROM (
        SELECT a AS node, community,
               row_number() OVER (
                 PARTITION BY a ORDER BY pull DESC, community ASC
               ) AS rn
        FROM (
          SELECT s.a, p.community, sum(s.w) AS pull
          FROM sym s JOIN l{i - 1} p ON p.node = s.b
          GROUP BY s.a, p.community
        )
      ) WHERE rn = 1
    )""")
    return f"""
    WITH e AS MATERIALIZED ({_Q110_WEDGES_SQL}),
    sym AS MATERIALIZED (
      SELECT a, b, sum(w) AS w FROM (
        SELECT src AS a, dst AS b, w FROM e WHERE src <> dst
        UNION ALL
        SELECT dst AS a, src AS b, w FROM e WHERE src <> dst
      ) GROUP BY a, b
    ),
    l0 AS (
      SELECT DISTINCT a AS node, a AS community FROM sym
    ),{",".join(steps)}
    SELECT node, community FROM l{_Q115_ITER}
    ORDER BY node
    """


@query("q115_trade_communities", oracle=_q115_oracle())
def q115_trade_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.graph import label_propagation

    wedges = _trade_edges(spark, sf_dir).groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("double").alias("w")
    )
    return label_propagation(wedges, n_iter=_Q115_ITER, weight_col="w").orderBy("node")
