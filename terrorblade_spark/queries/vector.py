"""Vector-search query surface over the embeddings table (V1–V8):
exact cosine top-k, threshold search, k-NN join, within-label near-dup,
and centroid stats. Dot products are sequential double folds that
DuckDB's list_cosine_similarity/list_dot_product reproduce bit-for-bit
(verified by tests; both engines fold the 64-dim lists left-to-right
in double precision after casting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terrorblade_spark.functions.exprs import csv_join
from terrorblade_spark.operators.vector import (
    ann_lsh_topk,
    cosine,
    cosine_topk,
    ivf_topk,
    knn_join,
)
from terrorblade_spark.registry import query
from terrorblade_spark.tables import load_table

# cast embeddings to DOUBLE[] in the oracle so accumulation precision
# matches Spark's double fold
_Q = "(SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0)"
_COS = (
    "list_dot_product(e.embedding::DOUBLE[], q.qvec)"
    " / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(q.qvec, q.qvec)))"
)


# --- q36: exact cosine top-k (V2 similarity_search) -------------------------

# q37 (threshold search) was merged into this query's threshold
# parameter to fit the harness's 50-slot gate budget: one gated query
# now exercises V2 (top-k) AND V3/V4 (threshold-filtered scored scan);
# the separate shapes keep unit coverage in tests/test_vector_ops.py.
@query(
    "q36_cosine_topk",
    oracle=f"""
    SELECT e.vec_id, {_COS} AS cosine_sim
    FROM embeddings e, {_Q} q
    WHERE {_COS} >= 0.25
    ORDER BY cosine_sim DESC, e.vec_id
    LIMIT 20
    """,
)
def q36_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0)
    return cosine_topk(
        emb, q, k=20, id_col="vec_id", vec_col="embedding", threshold=0.25
    )


# --- q38: k-NN join for the first 5 vectors (V5 fan-out shape) --------------

@query(
    "q38_knn_join",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_dot_product(e.embedding::DOUBLE[], q.qvec)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(q.qvec, q.qvec))) AS cosine_sim
      FROM embeddings e, q
      WHERE e.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, rank, cosine_sim FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS INTEGER) AS rank
      FROM scored
    ) WHERE rank <= 3
    ORDER BY query_id, rank
    """,
)
def q38_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    return knn_join(q, emb, k=3, id_col="vec_id", vec_col="embedding").orderBy(
        "query_id", "rank"
    )


# --- q39: embedding near-dup pairs within label (bounded brute force) -------

@query(
    "q39_embedding_neardup",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
             / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cosine_sim
    FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
             / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.4
    ORDER BY id_a, id_b
    """,
)
def q39_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded brute force: exact pairwise cosine WITHIN a label.

    SCALE CONTRACT: cost is quadratic in label population and the join
    parallelism is the label cardinality — safe only while groups stay
    bounded (measured: a 10x scale-up that grew populations instead of
    group count took q39 from seconds to tens of minutes on ~10 hot
    keys). When a group can grow with the corpus, use the LSH-bucketed
    (q52 shape) or MinHash-LSH (q33) candidate path instead.
    """
    from terrorblade_spark.operators.vector import dot, norm

    emb = load_table(spark, sf_dir, "embeddings")
    # Round-10 (guide §3.2/§2.6): fold each vector's L2 norm ONCE per
    # row before the join instead of re-folding both norms per pair
    # (3 array aggregates per pair -> 1; bit-identical — same fold,
    # same multiply order). Broadcast the build side explicitly and
    # spread the probe side across the cluster: a shuffle join keyed
    # on label caps parallelism at label cardinality (10 here), while
    # broadcast + probe-side repartition balances pair generation
    # regardless of label skew — each probe row emits only its own
    # group's pairs.
    from terrorblade_spark.tables import spread

    emb = emb.withColumn("__nrm", norm(F.col("embedding")))
    a = emb.alias("a")
    b = spread(emb).alias("b")
    d = dot(F.col("a.embedding"), F.col("b.embedding"))
    n = F.col("a.__nrm") * F.col("b.__nrm")
    sim = F.when(n > 0, d / n)
    return (
        F.broadcast(a)
        .join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            sim.alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= 0.4)
        .orderBy("id_a", "id_b")
    )


# --- q40: per-label centroid stats (vector agg via element-wise mean) -------

@query(
    "q40_label_vector_stats",
    oracle="""
    SELECT label,
           count(*) AS n_vectors,
           sum(CAST(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS DECIMAL(18,6)))::DOUBLE
             / count(*) AS avg_sq_norm
    FROM embeddings
    GROUP BY label
    ORDER BY label
    """,
)
def q40_label_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.functions.exprs import dec_sum
    from terrorblade_spark.operators.vector import dot

    emb = load_table(spark, sf_dir, "embeddings")
    sq = dot(F.col("embedding"), F.col("embedding"))
    return (
        emb.select("label", sq.alias("sq_norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            (dec_sum("sq_norm", 6) / F.count(F.lit(1))).alias("avg_sq_norm"),
        )
        .orderBy("label")
    )


# --- q53: IVF approximate top-k (the ANN scale path, fully oracled) ---------

@query(
    "q53_ivf_ann_topk",
    oracle=f"""
    WITH q AS {_Q},
    ex AS (
      SELECT label, generate_subscripts(embedding, 1) AS pos, unnest(embedding::DOUBLE[]) AS v
      FROM embeddings
    ),
    means AS (
      SELECT label, pos,
             sum(CAST(v AS DECIMAL(25,12)))::DOUBLE / count(*) AS m
      FROM ex GROUP BY label, pos
    ),
    cents AS (
      SELECT label, list(m ORDER BY pos) AS centroid FROM means GROUP BY label
    ),
    probed AS (
      SELECT c.label
      FROM cents c, q
      ORDER BY list_dot_product(c.centroid, q.qvec)
                 / (sqrt(list_dot_product(c.centroid, c.centroid))
                    * sqrt(list_dot_product(q.qvec, q.qvec))) DESC, c.label
      LIMIT 3
    )
    SELECT e.vec_id, {_COS} AS cosine_sim
    FROM embeddings e JOIN probed p ON e.label = p.label, q
    ORDER BY cosine_sim DESC, e.vec_id
    LIMIT 20
    """,
)
def q53_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0)
    return ivf_topk(emb, q, k=20, nprobe=3, id_col="vec_id", vec_col="embedding", list_col="label")


# --- q54: sign-LSH bucketed approximate top-k (fully oracled) ---------------

def _duck_lsh_signs(planes: int = 8, dims: int = 64) -> str:
    """DuckDB twin of operators.vector.sign_lsh_bucket's hyperplanes."""
    return f"""
      SELECT p, list(CASE WHEN ('0x' || substring(md5('p:' || p || ':' || d), 1, 15))::BIGINT & 1 = 1
                          THEN 1.0 ELSE -1.0 END ORDER BY d) AS signs
      FROM (SELECT unnest(range({planes})) AS p), (SELECT unnest(range({dims})) AS d)
      GROUP BY p
    """


@query(
    "q54_lsh_ann_topk",
    oracle=f"""
    WITH signs AS ({_duck_lsh_signs(5, 64)}),
    buckets AS (
      SELECT e.vec_id, CAST(sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], s.signs) > 0
                                     THEN 1 << s.p ELSE 0 END) AS INTEGER) AS bucket
      FROM embeddings e, signs s GROUP BY e.vec_id
    ),
    q AS (
      SELECT e.embedding::DOUBLE[] AS qvec, b.bucket
      FROM embeddings e JOIN buckets b USING (vec_id) WHERE e.vec_id = 0
    )
    SELECT e.vec_id,
           list_dot_product(e.embedding::DOUBLE[], q.qvec)
             / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                * sqrt(list_dot_product(q.qvec, q.qvec))) AS cosine_sim
    FROM embeddings e JOIN buckets b USING (vec_id) JOIN q ON b.bucket = q.bucket
    ORDER BY cosine_sim DESC, e.vec_id
    LIMIT 20
    """,
)
def q54_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0)
    return ann_lsh_topk(emb, q, k=20, id_col="vec_id", vec_col="embedding", planes=5, dims=64)


# --- q55: composed similarity search with text + context (V5/Q9) ------------
# The reference's flagship query (vector_store.py:315-414): top-k cosine
# hits joined to message text and ±context rows. It issues one SQL per
# hit for snippets (N+1, vector_store.py:400-405); here the snippet
# window is computed set-wise so the whole thing is ONE plan.

@query(
    "q55_search_with_context",
    oracle=f"""
    WITH hits AS (
      SELECT e.vec_id, {_COS} AS cosine_sim
      FROM embeddings e, {_Q} q
      ORDER BY cosine_sim DESC, e.vec_id
      LIMIT 10
    ),
    ctx AS (
      SELECT doc_id, source,
             substring(regexp_replace(text, '\n', ' ', 'g'), 1, 80) AS snippet,
             array_to_string(list(doc_id) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), ',') AS context_ids
      FROM documents
    )
    SELECT h.vec_id, h.cosine_sim, c.source, c.snippet, c.context_ids
    FROM hits h JOIN ctx c ON c.doc_id = h.vec_id
    ORDER BY h.cosine_sim DESC, h.vec_id
    """,
)
def q55_search_with_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    q = emb.where(F.col("vec_id") == 0)
    hits = cosine_topk(emb, q, k=10, id_col="vec_id", vec_col="embedding")
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(-2, 2)
    ctx = docs.select(
        "doc_id",
        "source",
        F.substring(F.regexp_replace("text", "\n", " "), 1, 80).alias("snippet"),
        csv_join(F.collect_list("doc_id").over(w)).alias("context_ids"),
    )
    return (
        hits.join(ctx, hits["vec_id"] == ctx["doc_id"])
        .select("vec_id", "cosine_sim", "source", "snippet", "context_ids")
        .orderBy(F.desc("cosine_sim"), "vec_id")
    )


# --- q82: semantic near-dup components, fully oracled ------------------------
# The deterministic (sign-LSH-bucketed) twin of operators.dedup.
# semantic_dedup's candidate stage, taken all the way through connected
# components against a recursive-CTE closure (q78's pattern, but over
# EMBEDDING-space pairs): corpus = embeddings + a re-ingested copy
# (q31's pattern) so every vector carries one exact semantic twin. Sign
# buckets come from the raw vectors (scale-invariant, one shared base
# for both engines' float math); pair scores are dots of L2-normalized
# vectors (sequential folds, bit-identical across engines).

_Q82_OFFSET = 5_000_000
_Q82_PLANES = 6
_Q82_THRESHOLD = 0.999


@query(
    "q82_semantic_neardup_components",
    oracle=f"""
    WITH RECURSIVE corpus AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      UNION ALL
      SELECT vec_id + {_Q82_OFFSET} AS vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    signs AS ({_duck_lsh_signs(_Q82_PLANES, 64)}),
    bucketed AS (
      SELECT c.vec_id,
             CAST(sum(CASE WHEN list_dot_product(c.v, s.signs) > 0
                           THEN 1 << s.p ELSE 0 END) AS INTEGER) AS b
      FROM corpus c, signs s GROUP BY c.vec_id
    ),
    unit AS (
      SELECT vec_id,
             list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS u
      FROM corpus WHERE list_dot_product(v, v) > 0
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, bb.vec_id AS id_b
      FROM unit a JOIN bucketed ba ON a.vec_id = ba.vec_id
      JOIN bucketed bb ON ba.b = bb.b AND a.vec_id < bb.vec_id
      JOIN unit b2 ON b2.vec_id = bb.vec_id
      WHERE list_dot_product(a.u, b2.u) >= {_Q82_THRESHOLD}
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach(node, r) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, r.r FROM edges e JOIN reach r ON e.v = r.node
    )
    SELECT node, min(r) AS component
    FROM reach GROUP BY node ORDER BY node
    """,
)
def q82_semantic_neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.components import connected_components
    from terrorblade_spark.operators.dedup import semantic_neardup_pairs_lsh

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = emb.unionByName(
        emb.select((F.col("vec_id") + _Q82_OFFSET).alias("vec_id"), "embedding")
    )
    pairs = semantic_neardup_pairs_lsh(
        corpus, threshold=_Q82_THRESHOLD, planes=_Q82_PLANES, dims=64
    )
    return connected_components(pairs, "id_a", "id_b").orderBy("node")


# --- q130: incremental semantic ingest gate, fully oracled -------------------
# The round-6 gate operator (dedup.semantic_dedup_incremental) under a
# full value oracle: state = every base embedding as an admitted
# canonical at its top-2 probe cells over FIXED one-hot centroids (the
# quantizer is literal, so cell assignment is pure coordinate
# comparison — identical doubles on both engines); batch = an exact
# re-ingest (vec_id + OFF, must ALL reject against state) plus the
# negated vectors (vec_id + 2*OFF, cosine -1 to everything, must ALL
# admit). The oracle replicates the gate's decision rule generally —
# pairs vs state, batch-internal pair closure (q82's recursive-CTE
# components), taint propagation, min-id keep — not just the expected
# outcome, so a semantics drift on either side hash-mismatches.
# Robustness: twin pairs sit at cosine exactly 1 (identical unit
# vectors) and everything else far below 0.999, so last-ulp matmul vs
# sequential-fold dot differences cannot flip a pair.

_Q130_OFF = 5_000_000
_Q130_K = 8
_Q130_TH = 0.999

_Q130_UNIT = """
      SELECT vec_id,
             CASE WHEN list_dot_product(v, v) > 0
                  THEN list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
                  ELSE v END AS u
      FROM base
"""


@query(
    "q130_semantic_ingest_gate",
    oracle=f"""
    WITH RECURSIVE base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    ub AS ({_Q130_UNIT}),
    dims AS (SELECT unnest(range(0, {_Q130_K})) AS dim),
    scells AS (
      SELECT vec_id, dim FROM (
        SELECT s.vec_id, d.dim,
               row_number() OVER (
                 PARTITION BY s.vec_id ORDER BY s.u[d.dim + 1] DESC, d.dim
               ) AS rn
        FROM ub s, dims d
      ) WHERE rn <= 2
    ),
    batch AS (
      SELECT vec_id + {_Q130_OFF} AS vec_id, u FROM ub
      UNION ALL
      SELECT vec_id + {2 * _Q130_OFF} AS vec_id,
             list_transform(u, x -> -x) AS u
      FROM ub
    ),
    bcells AS (
      SELECT vec_id, dim FROM (
        SELECT b.vec_id, d.dim,
               row_number() OVER (
                 PARTITION BY b.vec_id ORDER BY b.u[d.dim + 1] DESC, d.dim
               ) AS rn
        FROM batch b, dims d
      ) WHERE rn <= 2
    ),
    p_old AS (
      SELECT DISTINCT b.vec_id
      FROM batch b
      JOIN bcells bc ON bc.vec_id = b.vec_id
      JOIN scells sc ON sc.dim = bc.dim
      JOIN ub s ON s.vec_id = sc.vec_id
      WHERE list_dot_product(b.u, s.u) >= {_Q130_TH}
    ),
    e0 AS (
      SELECT DISTINCT a.vec_id AS ia, b.vec_id AS ib
      FROM batch a
      JOIN bcells ca ON ca.vec_id = a.vec_id
      JOIN bcells cb ON cb.dim = ca.dim AND cb.vec_id > ca.vec_id
      JOIN batch b ON b.vec_id = cb.vec_id
      WHERE list_dot_product(a.u, b.u) >= {_Q130_TH}
    ),
    edges AS (
      SELECT ia AS s, ib AS t FROM e0 UNION SELECT ib, ia FROM e0
    ),
    reach(node, r) AS (
      SELECT s, s FROM edges
      UNION
      SELECT e.s, r.r FROM edges e JOIN reach r ON e.t = r.node
    ),
    comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
    tainted AS (
      SELECT DISTINCT c.component FROM comp c JOIN p_old p ON p.vec_id = c.node
    ),
    rejected AS (
      SELECT node FROM comp WHERE component IN (SELECT component FROM tainted)
      UNION
      SELECT node FROM comp
      WHERE component NOT IN (SELECT component FROM tainted) AND node <> component
      UNION
      SELECT vec_id AS node FROM p_old
    )
    SELECT b.vec_id FROM batch b
    WHERE b.vec_id NOT IN (SELECT node FROM rejected)
    ORDER BY b.vec_id
    """,
)
def q130_semantic_ingest_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.dedup import (
        _assign_probes_blas,
        semantic_dedup_incremental,
    )
    from terrorblade_spark.operators.vector import unit_normalize

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = spark.createDataFrame(
        [(i, [1.0 if j == i else 0.0 for j in range(64)]) for i in range(_Q130_K)],
        "list_id int, centroid array<double>",
    )
    # state: every base vector admitted, at its top-2 probe cells over
    # the normalized vectors (the gate's persisted state shape);
    # assignment tie-breaks toward the lower list_id (stable argsort)
    # exactly as the oracle's ORDER BY d2, dim does
    unit = unit_normalize(emb, "vec_id", "embedding")
    state, state_bc = _assign_probes_blas(unit, cents, 2, "vec_id", "embedding")
    batch = emb.select(
        (F.col("vec_id") + _Q130_OFF).alias("vec_id"), "embedding"
    ).unionByName(
        emb.select(
            (F.col("vec_id") + 2 * _Q130_OFF).alias("vec_id"),
            F.transform(F.col("embedding"), lambda x: -x.cast("double")).alias(
                "embedding"
            ),
        )
    )
    try:
        admitted, _state_out = semantic_dedup_incremental(
            batch, state, cents, threshold=_Q130_TH, assign_probes=2,
            # this query verifies ADMISSION only and discards the state
            # relation — skip its eager checkpoint (round 11: one whole
            # job off the gate's fixed job graph; admitted unchanged)
            materialize_state=False,
        )
    finally:
        state_bc.unpersist()
    return admitted.select("vec_id").orderBy("vec_id")


# --- q83: per-dimension embedding moments (PCA's distributed stats) ---------
# The value-oracled surface of operators/pca.py: the same per-dimension
# mean/variance the Arrow Gram partials produce (cross-checked in
# tests/test_pca.py), computed via posexplode + order-independent
# decimal sums. The double->decimal cast itself can tie-break a 1-ulp
# difference between engines (observed once in 32k values at sf0.01),
# so the query rounds both sides to 6 decimals — the q81 determinism
# pattern. The eigensolve consuming these moments is driver-side numpy
# (corpus-independent), unit-tested against an exact reference.


@query(
    "q83_embedding_moments",
    oracle="""
    WITH ex AS (
      SELECT generate_subscripts(embedding, 1) - 1 AS dim,
             unnest(embedding::DOUBLE[]) AS v
      FROM embeddings
    ),
    agg AS (
      SELECT dim, count(*) AS n_vectors,
             sum(CAST(v AS DECIMAL(25,12)))::DOUBLE / count(*) AS mean,
             sum(CAST(v * v AS DECIMAL(25,12)))::DOUBLE / count(*) AS msq
      FROM ex GROUP BY dim
    )
    SELECT dim, n_vectors, round(mean, 6) AS mean_r,
           round(msq - mean * mean, 6) AS variance_r
    FROM agg ORDER BY dim
    """,
)
def q83_embedding_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.pca import embedding_moments

    emb = load_table(spark, sf_dir, "embeddings")
    m = embedding_moments(emb, "embedding")
    return m.select(
        "dim",
        "n_vectors",
        F.round("mean", 6).alias("mean_r"),
        F.round("variance", 6).alias("variance_r"),
    ).orderBy("dim")


# --- q84: quantization retrieval eval (ranking_metrics, full oracle) --------
# Measures what int8 quantization (q64's machinery) costs retrieval:
# truth = exact-cosine top-k per query, results = the same search over
# the DEQUANTIZED corpus (asymmetric search — float query, int8-stored
# corpus, the standard serving layout), scored by recall@k / MRR@k /
# NDCG@k via operators/evalmetrics.ranking_metrics. Everything is
# deterministic (q64-proven codes, fold-identical dots, vec_id
# tie-breaks); the metrics are rounded to 6 dp on both engines (log2
# is libm — the q81 pattern). The query set is a bounded modulus
# slice: eval harnesses score a sample of queries, not the corpus.

_Q84_K = 10
_Q84_MOD = 101
_Q84_COS = (
    "CASE WHEN sqrt(list_dot_product({v}, {v})) * sqrt(list_dot_product(q.qv, q.qv)) > 0 "
    "THEN list_dot_product({v}, q.qv) / (sqrt(list_dot_product({v}, {v})) * sqrt(list_dot_product(q.qv, q.qv))) END"
)


def _q84_topk(rel: str, vcol: str) -> str:
    cos = _Q84_COS.format(v=f"c.{vcol}")
    return f"""(
      SELECT query_id, vec_id, rank FROM (
        SELECT q.query_id, c.vec_id,
               CAST(row_number() OVER (
                 PARTITION BY q.query_id ORDER BY {cos} DESC, c.vec_id
               ) AS INTEGER) AS rank
        FROM {rel} c, q WHERE c.vec_id != q.query_id
      ) WHERE rank <= {_Q84_K}
    )"""


@query(
    "q84_quantization_recall",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id % {_Q84_MOD} = 0
    ),
    corpus AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    sc AS (
      SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      FROM corpus
    ),
    deq AS (
      SELECT vec_id,
             list_transform(
               v, x -> (CASE WHEN scale > 0 THEN round(x / scale, 0) ELSE 0.0 END)::INT::DOUBLE * scale
             ) AS v
      FROM sc
    ),
    truth AS {_q84_topk("corpus", "v")},
    results AS {_q84_topk("deq", "v")},
    pt AS (
      SELECT query_id, count(*) AS n_truth,
             sum(1.0 / log2(rank + 1.0)) AS idcg
      FROM truth GROUP BY query_id
    ),
    hits AS (
      SELECT r.query_id, count(*) AS n_hits, min(r.rank) AS first_hit,
             sum(1.0 / log2(r.rank + 1.0)) AS dcg
      FROM results r JOIN truth t ON r.query_id = t.query_id AND r.vec_id = t.vec_id
      GROUP BY r.query_id
    )
    SELECT pt.query_id, n_truth, coalesce(n_hits, 0)::BIGINT AS n_hits,
           round(coalesce(n_hits, 0)::DOUBLE / n_truth, 6) AS recall_r,
           round(coalesce(1.0 / first_hit, 0.0), 6) AS mrr_r,
           round(coalesce(dcg, 0.0) / idcg, 6) AS ndcg_r
    FROM pt LEFT JOIN hits ON pt.query_id = hits.query_id
    ORDER BY pt.query_id
    """,
)
def q84_quantization_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.evalmetrics import ranking_metrics
    from terrorblade_spark.operators.vector import quantize_int8

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.where(F.col("vec_id") % _Q84_MOD == 0)
    truth = knn_join(queries, emb, k=_Q84_K)
    deq = quantize_int8(emb).select(
        "vec_id",
        F.transform("qvec", lambda x: x.cast("double") * F.col("scale")).alias(
            "embedding"
        ),
    )
    results = knn_join(queries, deq, k=_Q84_K)
    m = ranking_metrics(results, truth, k=_Q84_K)
    return m.select(
        "query_id",
        "n_truth",
        "n_hits",
        F.round("recall_at_k", 6).alias("recall_r"),
        F.round("mrr_at_k", 6).alias("mrr_r"),
        F.round("ndcg_at_k", 6).alias("ndcg_r"),
    ).orderBy("query_id")


# --- q97: hard-negative mining (full value oracle) ---------------------------
# The contrastive-data complement of q92's random negatives: each
# anchor's most-similar non-positive corpus vectors (fetch_k
# over-fetch -> positive exclusion -> re-rank to k). Cosines are the
# q38 fold-identical doubles; positives are (anchor, anchor+1) so the
# exclusion visibly reshapes the ranking.

_Q97_K = 3
_Q97_FETCH = _Q97_K + 16  # hard_negatives' default over-fetch


@query(
    "q97_hard_negatives",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS anchor_id, embedding::DOUBLE[] AS qvec
      FROM embeddings WHERE vec_id < 5
    ),
    scored AS (
      SELECT q.anchor_id, e.vec_id AS neighbor_id,
             list_dot_product(e.embedding::DOUBLE[], q.qvec)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(q.qvec, q.qvec))) AS cosine_sim
      FROM embeddings e, q
      WHERE e.vec_id != q.anchor_id
    ),
    fetched AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY anchor_id ORDER BY cosine_sim DESC, neighbor_id) AS r
        FROM scored
      ) WHERE r <= {_Q97_FETCH}
    ),
    ex AS (SELECT * FROM fetched WHERE neighbor_id != anchor_id + 1),
    ranked AS (
      SELECT anchor_id, neighbor_id AS neg_id,
             CAST(row_number() OVER (
               PARTITION BY anchor_id ORDER BY cosine_sim DESC, neighbor_id) AS INT)
               AS neg_rank,
             cosine_sim
      FROM ex
    )
    SELECT anchor_id, neg_id, neg_rank, cosine_sim
    FROM ranked WHERE neg_rank <= {_Q97_K}
    ORDER BY anchor_id, neg_rank
    """,
)
def q97_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.sampling import hard_negatives

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    anchors = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("anchor_id"), "embedding"
    )
    positives = anchors.select(
        "anchor_id", (F.col("anchor_id") + 1).alias("vec_id")
    )
    out = hard_negatives(anchors, emb, k=_Q97_K, positives=positives)
    return out.select("anchor_id", "neg_id", "neg_rank", "cosine_sim").orderBy(
        "anchor_id", "neg_rank"
    )
