"""Vector similarity operators (SURVEY §2.10 V1–V8 re-expressed).

The reference uses DuckDB VSS/HNSW; Spark has no native ANN, so:

- exact cosine top-k is the default (oracle-comparable bit-for-bit) —
  a scan + TakeOrderedAndProject, embarrassingly parallel;
- sign-LSH (random-hyperplane) bucketing is the approximate scale
  path: hash each vector to a small bucket key, join on bucket, score
  only within buckets. Hyperplanes are derived from the shared md5
  hash so the oracle can reproduce them (no RNG).
- an IVF-style variant partitions by a coarse key: either a provided
  column (the oracle-gated q53 uses `label`) or a learned k-means
  quantizer (``ivf_build``, the real-corpus path — measured recall@50
  1.00 at nprobe=6/16 where random lists give 0.00).

Dot products / norms are higher-order-function folds over
array<float> cast to double: sequential left-to-right accumulation,
which DuckDB's list_* functions match bit-for-bit (verified in tests).
No Python UDF in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def unit_normalize(df, id_col: str, vec_col: str):
    """``(id_col, vec_col)`` with the vector L2-normalized to doubles;
    zero vectors pass through unchanged (they pair/score as zero
    downstream). THE one canonical normalization every SemDeDup path
    shares — the batch operator, the incremental gate, q130, and the
    scale probe must produce bit-identical unit vectors or the gate's
    persisted state diverges from the operator's geometry. The norm is
    computed as a COLUMN the lambda references (an embedded norm
    re-folds the array per element — O(d^2), measured 16x at d=1024).
    """
    nrm = norm(F.col(vec_col))
    return df.withColumn("__n", nrm).select(
        id_col,
        F.when(
            F.col("__n") > 0,
            F.transform(F.col(vec_col), lambda x: x.cast("double") / F.col("__n")),
        )
        .otherwise(F.col(vec_col).cast("array<double>"))
        .alias(vec_col),
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; null if either norm is 0."""
    d = dot(a, b)
    n = norm(a) * norm(b)
    return F.when(n > 0, d / n)


def cosine_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float | None = None,
) -> DataFrame:
    """V2 similarity_search: exact cosine of every vector against a
    1-row query DataFrame, ordered desc with id tiebreak, top k.

    The broadcast cross-join ships ONE row to every task; the scan
    stays fully parallel and Spark plans TakeOrderedAndProject (no full
    sort). This is the pattern that survives 100 TB: no collect, no
    driver loop.
    """
    # the query norm is hoisted into the broadcast row: computed once
    # instead of re-folded per scanned vector (halves the per-row
    # arithmetic; bit-identical — same fold, same multiply order)
    q = F.broadcast(
        query.select(
            F.col(vec_col).alias("__qvec"), norm(F.col(vec_col)).alias("__qnorm")
        )
    )
    n = norm(F.col(vec_col)) * F.col("__qnorm")
    scored = vectors.crossJoin(q).select(
        F.col(id_col),
        F.when(n > 0, dot(F.col(vec_col), F.col("__qvec")) / n).alias("cosine_sim"),
    )
    if threshold is not None:
        scored = scored.where(F.col("cosine_sim") >= threshold)
    return scored.orderBy(F.desc("cosine_sim"), F.col(id_col)).limit(k)


def knn_join(
    queries: DataFrame,
    vectors: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Brute-force k-NN join: for each query row, its top-k neighbors
    (excluding itself). Queries are broadcast; per-query top-k via
    row_number window partitioned by query id."""
    from pyspark.sql import Window

    q = F.broadcast(
        queries.select(
            F.col(id_col).alias(query_id_col),
            F.col(vec_col).alias("__qvec"),
            norm(F.col(vec_col)).alias("__qnorm"),  # hoisted, once per query
        )
    )
    n = norm(F.col(vec_col)) * F.col("__qnorm")
    scored = vectors.crossJoin(q).where(F.col(id_col) != F.col(query_id_col)).select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        F.when(n > 0, dot(F.col(vec_col), F.col("__qvec")) / n).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine_sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "cosine_sim")
    )


def _plane_sign(salt: str, p: int, d: int) -> float:
    """Driver-side bit-exact twin of the sign expression
    ``conv(substring(md5('salt:p:d'), 1, 15), 16, 10) & 1``: 15 hex
    chars are 60 bits (< 2^63, no overflow on either side), and hex
    parse parity == conv-to-decimal parity. Gated by
    tests/test_vector_ops.py::test_plane_sign_matches_engine_md5,
    which evaluates the original Spark expression against this."""
    import hashlib

    h = int(hashlib.md5(f"{salt}:{p}:{d}".encode()).hexdigest()[:15], 16)
    return 1.0 if h & 1 == 1 else -1.0


def sign_lsh_bucket(vec_col: Column, planes: int = 8, dims: int = 64, salt: str = "p") -> Column:
    """Random-hyperplane LSH bucket id (0..2^planes-1).

    Hyperplane p's component for dimension d is ±1 derived from the
    shared md5 hash64(salt:p:d) parity — deterministic, reproducible in
    SQL, no stored model. bucket bit p = sign(Σ_d ±1 · v[d]).

    Round 10 (guide §1.2/§5): the signs are computed DRIVER-SIDE
    (``_plane_sign``) and emitted as literal arrays. The previous form
    built planes x dims md5/conv/when subtrees for Catalyst to
    constant-fold — the VALUES folded fine, but planning the 320-node
    tree (5 planes x 64 dims) cost ~3.7 s PER QUERY before a single
    row moved (measured: plan-only 3.68 s, full q54 8.0 s). The fold
    result is identical by the gated parity above; only the plan
    shrinks.
    """
    bits = []
    for p in range(planes):
        signs = F.lit([_plane_sign(salt, p, d) for d in range(dims)])
        # coalesce: zip_with pads the shorter array with NULLs, and one
        # NULL poisons the whole fold — a vector shorter than `dims`
        # would project to NULL, land every row (and the query) in
        # bucket 0, and silently turn the pruned scan into a full scan.
        # Missing positions contribute 0 (project on the prefix).
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                signs,
                lambda x, s: F.coalesce(x.cast("double"), F.lit(0.0))
                * F.coalesce(s, F.lit(0.0)),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj > 0, F.shiftleft(F.lit(1), p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def ivf_centroids(
    vectors: DataFrame,
    list_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 12,
) -> DataFrame:
    """IVF coarse index: element-wise mean vector per inverted list.

    posexplode -> per-(list, pos) decimal-exact mean (order-independent,
    so the oracle matches bit-for-bit) -> re-assemble ordered arrays.
    Two shuffles over NARROW rows ((key, pos, sum) — payload vectors
    never shuffle). At 100 TB the list assignment comes from k-means on
    a sample and this same plan computes the centroids in one pass.
    """
    ex = vectors.select(list_col, F.posexplode(F.col(vec_col)).alias("pos", "v"))
    means = ex.groupBy(list_col, "pos").agg(
        (
            F.sum(F.col("v").cast("double").cast(f"decimal(25,{scale})")).cast("double")
            / F.count(F.lit(1))
        ).alias("m")
    )
    return means.groupBy(list_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("centroid")
    )


def ivf_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "label",
) -> DataFrame:
    """IVF-style approximate top-k: score the query against the coarse
    centroids, probe only the ``nprobe`` nearest inverted lists, exact
    cosine within them.

    The probed-list set is tiny -> broadcast semi-join; with the table
    partitioned/bucketed by ``list_col`` that join is partition pruning,
    so a 1000-executor scan touches nprobe/n_lists of the data.
    """
    cents = ivf_centroids(vectors, list_col, vec_col)
    q = F.broadcast(query.select(F.col(vec_col).alias("__qvec")))
    probed = (
        cents.crossJoin(q)
        .select(list_col, cosine(F.col("centroid"), F.col("__qvec")).alias("__csim"))
        .orderBy(F.desc("__csim"), F.col(list_col))
        .limit(nprobe)
        .select(list_col)
    )
    cand = vectors.join(F.broadcast(probed), on=list_col, how="left_semi")
    scored = cand.crossJoin(q).select(
        F.col(id_col), cosine(F.col(vec_col), F.col("__qvec")).alias("cosine_sim")
    )
    return scored.orderBy(F.desc("cosine_sim"), F.col(id_col)).limit(k)


def ann_lsh_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    dims: int = 64,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket.

    At scale the bucket column is a partition/bucketing key, so this is
    a partition-pruned scan of ~1/2^planes of the data.
    """
    # Guide §2.7 (stragglers): the bucket projection is planes x dims
    # interpreted HOF folds per row — CPU-bound, so its wall time is
    # set by scan parallelism. A single-file local input arrives as ONE
    # partition and runs serially (measured 3.4 s for 2000 rows at
    # sf0.1, ~0.1 s spread over the cluster). tables.spread only
    # round-robins when the scan undersupplies parallelism: at scale
    # inputs are already wide and the repartition (a full shuffle of
    # the vector relation — exactly what must NOT happen at 100 TB)
    # never fires.
    from terrorblade_spark.tables import spread

    vectors = spread(vectors)
    bucketed = vectors.withColumn("__bucket", sign_lsh_bucket(F.col(vec_col), planes, dims))
    q = F.broadcast(
        query.select(
            F.col(vec_col).alias("__qvec"),
            sign_lsh_bucket(F.col(vec_col), planes, dims).alias("__bucket"),
        )
    )
    scored = bucketed.join(q, on="__bucket").select(
        F.col(id_col), cosine(F.col(vec_col), F.col("__qvec")).alias("cosine_sim")
    )
    return scored.orderBy(F.desc("cosine_sim"), F.col(id_col)).limit(k)


def ivf_build(
    vectors: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
    train_fraction: float | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Learn an IVF coarse quantizer with distributed k-means (MLlib)
    and assign every vector to its nearest list.

    Returns ``(assigned, centroids)``: the input plus ``list_id``, and
    the (list_id, centroid array<double>) table for :func:`ivf_topk`'s
    probe stage. This is the learned-list path the synthetic ``label``
    column stands in for in the oracle-gated q53 — real corpora have no
    meaningful list column, so recall depends on clustering the actual
    geometry (probe measured: random labels 0.00 recall@50, learned
    lists ~1.00 at nprobe=3/16).

    Scale: fit on a seeded sample (``train_fraction``; a coarse
    quantizer needs only ~100x n_lists training points — at 100 TB you
    fit on ~1M sampled vectors, seconds of work), then one distributed
    transform assigns all rows. Write the result partitioned/bucketed
    by ``list_id`` so ``ivf_topk``'s semi-join prunes partitions.
    """
    from pyspark import StorageLevel
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feat = vectors.withColumn(
        "__v", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    train = feat if train_fraction is None else feat.sample(train_fraction, seed=seed)
    # pin the training relation for the duration of the fit: k-means is
    # iterative and an unpersisted lineage re-runs the upstream plan
    # (sample + array->vector + whatever produced the vectors) every
    # iteration — measured 30x on a 35k-vector fit (90s -> 3s)
    train = train.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        model = KMeans(
            k=n_lists, seed=seed, maxIter=max_iter, featuresCol="__v", predictionCol="list_id"
        ).fit(train)
    finally:
        train.unpersist()
    assigned = model.transform(feat).drop("__v")
    spark = vectors.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        f"list_id int, centroid array<double>",
    )
    return assigned, centroids


def pq_build(
    vectors: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
    train_fraction: float | None = None,
) -> DataFrame:
    """Learn product-quantization codebooks: the vector space is split
    into ``m`` contiguous subspaces and each gets its own ``n_codes``-
    centroid k-means codebook (classic PQ, Jégou et al. 2011 — public
    method). Returns (sub_id, code_id, centroid array<double>).

    Pick ``m`` so subspaces are ~4-8 dims (768-d -> m of 96-192):
    measured on the 64-d test fixture, 8-d subspaces at 16 codes get
    only 0.5 shortlist recall@10-in-50 while 4-d subspaces hit 1.0 at
    the same code budget — quantization error grows fast with subspace
    dimensionality on weakly-clustered data.

    The compression lever past int8: a 768-d float32 vector (3 KB)
    becomes ``m`` single-byte codes (8-16 B, ~200-400x), which is what
    lets a 100 TB embedding corpus hold its ANN working set in cluster
    memory. Codebooks are MODEL-sized (m * n_codes * dim/m doubles =
    one vector's worth per codebook), so collecting them to the driver
    is legitimate — they are parameters, not data.

    Scale: each subspace k-means fits on a seeded sample
    (``train_fraction``) of a NARROW slice projection — the full
    vectors never leave the executors; ``m`` sequential sample-fits of
    ~100x n_codes points are seconds of driver-coordinated work at any
    corpus size.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    dim = len(vectors.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    ds = dim // m
    spark = vectors.sparkSession
    rows = []
    for s in range(m):
        sub = vectors.select(
            array_to_vector(
                F.slice(F.col(vec_col).cast("array<double>"), s * ds + 1, ds)
            ).alias("__v")
        )
        train = sub if train_fraction is None else sub.sample(train_fraction, seed=seed + s)
        model = KMeans(
            k=n_codes, seed=seed + s, maxIter=max_iter, featuresCol="__v", predictionCol="__c"
        ).fit(train)
        rows += [
            (s, c, [float(x) for x in cent])
            for c, cent in enumerate(model.clusterCenters())
        ]
    return spark.createDataFrame(rows, "sub_id int, code_id int, centroid array<double>")


def _sq_l2(a: Column, b: Column) -> Column:
    """Squared L2 distance as a sequential fold (shared by PQ encode
    and the ADC lookup table, so both sides rank identically)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_encode(
    vectors: DataFrame,
    codebooks: DataFrame,
    m: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "codes",
) -> DataFrame:
    """Assign every vector its PQ code array: codes[s] = argmin_c
    ||v_sub(s) - codebook[s][c]||² (ties -> lowest code id).

    Plan shape: explode each vector into its m subvectors (narrow
    (id, sub_id, subvec) rows) -> broadcast-join the codebooks
    (model-sized) -> per-(row, sub) min_by -> re-assemble the ordered
    code array. Two shuffles over (id, sub, code) integer rows; the
    full vectors never shuffle. This is the plan that encodes a
    billion-vector corpus: work is m * n_codes distance folds per row,
    all JVM-side, embarrassingly parallel.
    """
    # subvector width comes from the MODEL-sized codebooks relation, not
    # a corpus scan: building this plan must not run a job over the
    # vectors (the package's plan-build contract), and an empty corpus
    # must encode to an empty result rather than crash on first()=None
    first_cb = codebooks.select("centroid").first()
    if first_cb is None:
        raise ValueError("pq_encode needs non-empty codebooks (run pq_build first)")
    ds = len(first_cb[0])
    subs = vectors.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("sub_id"),
                        F.slice(F.col(vec_col).cast("array<double>"), s * ds + 1, ds).alias(
                            "subvec"
                        ),
                    )
                    for s in range(m)
                ]
            )
        ).alias("sv"),
    ).select(id_col, F.col("sv.sub_id").alias("sub_id"), F.col("sv.subvec").alias("subvec"))
    scored = subs.join(F.broadcast(codebooks), "sub_id").select(
        id_col,
        "sub_id",
        "code_id",
        _sq_l2(F.col("subvec"), F.col("centroid")).alias("d"),
    )
    best = scored.groupBy(id_col, "sub_id").agg(
        F.min(F.struct(F.col("d"), F.col("code_id"))).alias("b")
    )
    codes = best.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("sub_id"), F.col("b.code_id").alias("c")))),
            lambda s: s["c"],
        ).alias(code_col)
    )
    return vectors.join(codes, id_col)


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: DataFrame,
    query_vec: list[float],
    k: int,
    m: int,
    id_col: str = "vec_id",
    code_col: str = "codes",
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC): the
    query stays full-precision; per subspace a lookup table of squared
    L2 distances to every codebook centroid is precomputed, and each
    row's distance is the m-term LUT sum addressed by its code array.

    The LUT is m x n_codes doubles built driver-side from the
    model-sized codebooks; it enters the plan as a literal nested
    array, so scoring a row is m element_at + adds — no vector math on
    the scan side at all. With codes at 1 B/subspace this is the scan
    shape that ranks a billion rows per executor-second; compose with
    IVF lists (``ivf_build``) to prune the scan to nprobe lists first.
    """
    dist = _adc_dist(codebooks, query_vec, m, code_col)
    return (
        encoded.select(F.col(id_col), dist.alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.col(id_col))
        .limit(k)
    )


def _adc_dist(codebooks: DataFrame, query_vec: list[float], m: int, code_col: str) -> Column:
    """The ADC distance column: an m-term LUT sum addressed by the code
    array. The LUT (m x n_codes doubles) is built driver-side from the
    model-sized codebooks and enters the plan as a literal nested array."""
    cb = {
        (r["sub_id"], r["code_id"]): r["centroid"]
        for r in codebooks.collect()  # model-sized (m * n_codes rows)
    }
    n_codes = 1 + max(c for _, c in cb)
    ds = len(next(iter(cb.values())))
    lut = [
        [
            sum((query_vec[s * ds + i] - cb[(s, c)][i]) ** 2 for i in range(ds))
            for c in range(n_codes)
        ]
        for s in range(m)
    ]
    lut_lit = F.array(*[F.array(*[F.lit(float(v)) for v in row]) for row in lut])
    return F.aggregate(
        F.zip_with(
            F.col(code_col),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, s: F.element_at(F.element_at(lut_lit, s + 1), c + 1),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def ivf_knn_join(
    queries: DataFrame,
    assigned: DataFrame,
    centroids: DataFrame,
    k: int,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    list_col: str = "list_id",
) -> DataFrame:
    """Batch approximate k-NN JOIN over an IVF index: every query row
    gets its top-k neighbors from its own ``nprobe`` nearest lists —
    the set-wise shape batch jobs need (hard-negative mining, near-dup
    discovery, recommendation backfills), where a per-query loop over
    ``ivf_topk`` would be a driver loop.

    Plan: queries x broadcast centroids (model-sized) -> per-query
    row_number keeps nprobe lists -> equi-join that (query, list)
    relation with the assigned corpus ON ``list_col`` -> exact cosine
    -> per-query top-k window. The corpus side shuffles on list_id at
    most once (zero times if written partitioned by list, the
    ``save_ivf`` layout); each query scores ~nprobe/n_lists of the
    corpus instead of all of it — the brute ``knn_join`` broadcast
    stays preferable only when the query set is tiny.

    Returns (query_id, neighbor_id, rank, cosine_sim); self-matches
    (neighbor == query id) are excluded like ``knn_join``.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("__qvec"),
        norm(F.col(vec_col)).alias("__qnorm"),
    )
    probed = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("__csim", cosine(F.col("centroid"), F.col("__qvec")))
        .withColumn(
            "__pr",
            F.row_number().over(
                Window.partitionBy(query_id_col).orderBy(
                    F.desc("__csim"), F.col(list_col)
                )
            ),
        )
        .where(F.col("__pr") <= nprobe)
        .select(query_id_col, list_col, "__qvec", "__qnorm")
    )
    n = norm(F.col(vec_col)) * F.col("__qnorm")
    scored = (
        assigned.join(probed, on=list_col)
        .where(F.col(id_col) != F.col(query_id_col))
        .select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            F.when(n > 0, dot(F.col(vec_col), F.col("__qvec")) / n).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine_sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "cosine_sim")
    )


def ivfpq_build(
    vectors: DataFrame,
    n_lists: int = 256,
    m: int = 8,
    n_codes: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
    train_fraction: float | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build the full residual IVF-PQ index: coarse k-means lists, then
    PQ codebooks trained on the RESIDUALS ``v - centroid[list]`` (the
    FAISS IVFPQ design, Jégou et al. 2011 — public method).

    Residual encoding is what makes PQ useful INSIDE a list: raw-vector
    codebooks spend their codes on global geometry, so every member of
    one coarse cell maps to near-identical codes and the ADC scan
    cannot rank within the cell (measured on 20k clustered vectors:
    shortlist-64 recall@10 0.30 raw vs 1.00 residual). Encoding the
    offset from the cell centroid re-centers every list at the origin,
    so the code budget resolves exactly the within-cell differences the
    re-rank needs.

    Returns ``(encoded, centroids, codebooks)`` ready for
    :func:`ivfpq_topk` with ``residual=True``. ``encoded`` keeps the
    original ``vec_col`` (stage-3 re-rank) plus ``list_id`` and
    ``codes``; write it partitioned by ``list_id`` so the probe's
    semi-join prunes partitions.

    Scale: the residual is a row-local zip_with after a model-sized
    broadcast join; both k-means fits run on seeded samples. Nothing
    here shuffles the full vectors.
    """
    assigned, cents = ivf_build(
        vectors, n_lists=n_lists, id_col=id_col, vec_col=vec_col,
        seed=seed, max_iter=max_iter, train_fraction=train_fraction,
    )
    res = assigned.join(F.broadcast(cents), "list_id").withColumn(
        "__res",
        F.zip_with(
            F.col(vec_col), F.col("centroid"),
            lambda x, c: x.cast("double") - c,
        ),
    ).drop("centroid")
    # res feeds m sequential codebook fits plus the encode pass — each
    # would otherwise re-run ivf_build's transform + the residual join
    # over the full corpus (~m+2 recomputes for the default m=8)
    res = res.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        cb = pq_build(
            res, m=m, n_codes=n_codes, vec_col="__res",
            seed=seed, max_iter=max_iter, train_fraction=train_fraction,
        )
        enc = pq_encode(res, cb, m=m, id_col=id_col, vec_col="__res").drop("__res")
        enc = enc.persist(StorageLevel.MEMORY_AND_DISK)
        enc.count()  # materialize while res is still cached
    finally:
        res.unpersist()
    return enc, cents, cb


def ivfpq_topk(
    encoded: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    query_vec: list[float],
    k: int,
    m: int,
    nprobe: int = 8,
    shortlist: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "codes",
    list_col: str = "list_id",
    residual: bool = False,
) -> DataFrame:
    """IVF-PQ serving: the composed billion-scale ANN path and the
    distributed analog of the reference's HNSW index
    (/root/reference/terrorblade/data/database/vector_store.py:191-214)
    at its demonstrated ~1M-vector scale.

    Three pruning stages, each bounding the next:

    1. PROBE — score the query against the ``n_lists`` coarse centroids
       (model-sized, driver math) and keep the ``nprobe`` nearest lists.
       With the encoded table partitioned by ``list_col`` the broadcast
       semi-join IS partition pruning: the scan touches
       nprobe/n_lists of the corpus.
    2. ADC SHORTLIST — rank the probed lists' rows by the PQ lookup-table
       distance: m element_at + adds per row over 1-byte codes, no
       vector math, no shuffle, TakeOrderedAndProject. ``shortlist``
       defaults to max(16*k, 256) — the re-rank budget (the FAISS
       k_factor dial; measured on 20k clustered vectors residual
       recall@10 goes 0.43 -> 0.93 -> 1.00 at shortlist 64/256/1024,
       and re-ranking a few hundred vectors is trivial next to the
       code scan).
    3. EXACT RE-RANK — fetch the shortlist's full vectors (semi-join on
       id, shortlist-sized broadcast) and order by true cosine; top k.

    With ``residual=True`` (indexes from :func:`ivfpq_build`) the codes
    encode ``v - centroid[list]``, so the ADC lookup table is PER
    PROBED LIST (distances from the query's residual against that
    list's centroid). The nprobe LUTs are built driver-side from the
    model-sized centroids + codebooks and join candidates as a
    broadcast (list_id, lut) relation — still zero vector math on the
    scan side. Residual is the configuration that holds recall at a
    small fixed shortlist (see ``ivfpq_build``); raw mode needs
    shortlists that grow with the coarse-cell population.

    ``encoded`` is ``ivfpq_build(...)[0]`` (or ``pq_encode`` output for
    raw mode) — it carries ``list_id``, ``codes``, and the original
    ``vec_col`` (only read in stage 3, so a column-pruned scan ships
    codes, not vectors). Returns (id, cosine_sim) like the other top-k
    operators.
    """
    short_n = shortlist if shortlist is not None else max(16 * k, 256)
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    spark = encoded.sparkSession
    if residual:
        # stage 1 driver-side: centroids are the model (n_lists x dim);
        # scoring nprobe needs them in hand anyway to build the LUTs.
        # One-shot path: collect the model here; a serving deployment
        # holds it resident via ivfpq_server (the collects are 2 jobs
        # per query otherwise — the dominant steady-state cost).
        cents = {r[list_col]: r["centroid"] for r in centroids.collect()}
        cb = {
            (r["sub_id"], r["code_id"]): r["centroid"] for r in codebooks.collect()
        }
        return _ivfpq_query_resident(
            encoded, cents, cb, query_vec, k, m, nprobe, short_n,
            id_col, vec_col, code_col, list_col,
        )
    else:
        # stage 1: centroid probe (model-sized relation, broadcast)
        probed = (
            centroids.select(list_col, cosine(F.col("centroid"), qlit).alias("__csim"))
            .orderBy(F.desc("__csim"), F.col(list_col))
            .limit(nprobe)
            .select(list_col)
        )
        cand = encoded.join(F.broadcast(probed), on=list_col, how="left_semi")
        dist = _adc_dist(codebooks, query_vec, m, code_col)
    return _adc_shortlist_rerank(encoded, cand, dist, qlit, k, short_n, id_col, vec_col)


def _adc_shortlist_rerank(
    encoded: DataFrame,
    cand: DataFrame,
    dist,
    qlit,
    k: int,
    short_n: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Stages 2-3 shared by every IVF-PQ query path (one-shot raw,
    one-shot residual, resident serving): ADC shortlist over the probed
    candidates, then exact cosine re-rank of the shortlist's full
    vectors. One place so shortlist semantics / tie-breaking cannot
    drift between the paths (they are asserted bit-identical in
    tests/test_vector_ops.py)."""
    short = (
        cand.select(F.col(id_col), dist.alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.col(id_col))
        .limit(short_n)
        .select(id_col)
    )
    rer = encoded.join(F.broadcast(short), on=id_col, how="left_semi").select(
        F.col(id_col), cosine(F.col(vec_col), qlit).alias("cosine_sim")
    )
    return rer.orderBy(F.desc("cosine_sim"), F.col(id_col)).limit(k)


def ivfpq_server(
    encoded: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    m: int,
    nprobe: int = 8,
    shortlist: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "codes",
    list_col: str = "list_id",
):
    """Resident-model IVF-PQ serving session (residual mode): collects
    the model-sized centroids + codebooks ONCE and returns a
    ``query(query_vec, k, nprobe=..., shortlist=...) -> DataFrame``
    closure whose per-query cost is pure driver LUT math plus the
    probed-cell scan — no per-query model collects (two Spark jobs per
    query in :func:`ivfpq_topk`, the dominant steady-state cost at
    10M vectors) and no per-query recompute of anything model-sized.

    The serving deployment shape: ``encoded`` persisted (ideally
    partitioned by ``list_col``), the session held for the process
    lifetime, queries amortizing plan/JIT warm-up. Results are
    bit-identical to ``ivfpq_topk(..., residual=True)`` — both paths
    run :func:`_ivfpq_query_resident` (unit-gated).
    """
    cents = {r[list_col]: r["centroid"] for r in centroids.collect()}
    cb = {(r["sub_id"], r["code_id"]): r["centroid"] for r in codebooks.collect()}

    def query(
        query_vec: list[float],
        k: int,
        nprobe: int = nprobe,
        shortlist: int | None = shortlist,
    ) -> DataFrame:
        short_n = shortlist if shortlist is not None else max(16 * k, 256)
        return _ivfpq_query_resident(
            encoded, cents, cb, query_vec, k, m, nprobe, short_n,
            id_col, vec_col, code_col, list_col,
        )

    return query


def _ivfpq_query_resident(
    encoded: DataFrame,
    cents: dict,
    cb: dict,
    query_vec: list[float],
    k: int,
    m: int,
    nprobe: int,
    short_n: int,
    id_col: str,
    vec_col: str,
    code_col: str,
    list_col: str,
) -> DataFrame:
    """Residual IVF-PQ query against a resident model: driver-side
    probe + per-list LUTs, one broadcast hash join attaching the LUT
    to the probed cells, ADC shortlist, exact re-rank."""
    spark = encoded.sparkSession
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])

    def _cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(y * y for y in b) ** 0.5
        return d / (na * nb) if na > 0 and nb > 0 else float("-inf")

    probed_ids = sorted(
        cents, key=lambda l: (-_cos(cents[l], query_vec), l)
    )[:nprobe]
    n_codes = 1 + max(c for _, c in cb)
    ds = len(next(iter(cb.values())))
    rows = []
    for l in probed_ids:
        qres = [q - c for q, c in zip(query_vec, cents[l])]
        lut = [
            [
                sum((qres[s * ds + i] - cb[(s, c)][i]) ** 2 for i in range(ds))
                for c in range(n_codes)
            ]
            for s in range(m)
        ]
        rows.append((int(l), lut))
    probed = spark.createDataFrame(
        rows, f"{list_col} int, __lut array<array<double>>"
    )
    # probe semi-join and LUT attach are ONE broadcast hash join
    cand = encoded.join(F.broadcast(probed), on=list_col)
    dist = F.aggregate(
        F.zip_with(
            F.col(code_col),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, s: F.element_at(F.element_at(F.col("__lut"), s + 1), c + 1),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return _adc_shortlist_rerank(encoded, cand, dist, qlit, k, short_n, id_col, vec_col)


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", qvec_col: str = "qvec", scale_col: str = "scale"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|v| / 127,
    q[i] = round(v[i] / scale) in [-127, 127] (all-zero vectors get
    scale 0 and an all-zero qvec). Dequantize as q[i] * scale.

    The memory lever for billion-vector ANN: float32 -> int8 is a 4x
    cut (float64 8x), which at 100 TB decides whether an IVF list or
    LSH bucket fits an executor's memory or spills. Pure JVM
    higher-order functions — one aggregate fold for the max, one
    transform for the rounding; no UDF, no shuffle, row-local.
    """
    maxabs = F.aggregate(
        vec_col, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    d = df.withColumn(scale_col, maxabs / F.lit(127.0))
    q = F.transform(
        vec_col,
        lambda x: F.when(
            F.col(scale_col) > 0, F.round(x.cast("double") / F.col(scale_col), 0)
        )
        .otherwise(F.lit(0.0))
        .cast("int"),
    )
    return d.withColumn(qvec_col, q)


class LocalIVFPQIndex:
    """Driver-resident IVF-PQ serving index: the ms-latency point-query
    tier the reference gets from HNSW
    (/root/reference/terrorblade/data/database/vector_store.py:191-214),
    built by Spark, served without Spark.

    ``ivfpq_server`` (above) already amortizes the model collects, but
    every query is still a Spark job over the probed cells — ~1 s at
    10M vectors, a scheduling floor no plan shape removes. A point-query
    SLA in the milliseconds needs the scan itself resident. This class
    holds the ENCODED relation (ids, list assignments, PQ codes, and
    the raw vectors for the exact re-rank) as flat numpy arrays in
    CSR-by-list layout and answers queries in pure numpy: centroid
    probe -> per-list ADC LUT -> shortlist -> exact re-rank, the same
    four stages as :func:`_ivfpq_query_resident`, stage-for-stage.

    Memory bound (the reason this is a SERVING-TIER component, not a
    query operator): ~(8 + 4 + m + 4*dim) bytes/row for f32 vectors —
    ~2.8 GB at 10M rows, dim 64, m 8. The builder refuses past
    ``max_bytes``. At 100 TB the corpus does not fit one process; the
    deployment shape is the one this build pass already has: the
    ``mapInPandas`` packer emits one binary shard per partition, and a
    serving fleet assigns each node a LIST-ID RANGE of shards (the
    coarse quantizer is the shard router, exactly like the distributed
    probe's partition pruning). This class is one such node holding
    every shard — the single-box deployment.
    """

    def __init__(self, ids, lists, codes, vecs, cent_ids, cents, cb):
        import numpy as np

        order = np.lexsort((ids, lists))
        self.ids = ids[order]
        self.lists = lists[order]
        self.codes = codes[order]
        self.vecs = vecs[order]  # source element width (f32 OR f64 shards)
        self.cent_ids = cent_ids
        self.cents = cents  # (n_lists, dim) float64, row i = cent_ids[i]
        self.cb = cb  # (m, n_codes, ds) float64
        self.m = cb.shape[0]
        self.ds = cb.shape[2]
        # CSR: list_id -> row slice
        uniq, starts = np.unique(self.lists, return_index=True)
        ends = np.append(starts[1:], len(self.lists))
        self._slices = {int(l): (int(s), int(e)) for l, s, e in zip(uniq, starts, ends)}
        cent_norm = np.linalg.norm(self.cents, axis=1)
        self._cent_unit = self.cents / np.where(cent_norm > 0, cent_norm, 1.0)[:, None]
        # a zero-norm centroid must order BELOW every real one in the
        # coarse probe, matching the distributed _cos (which scores it
        # -inf); unit-zeroing alone would score it 0.0 and could
        # out-probe a negatively-correlated real centroid
        self._cent_zero = cent_norm == 0
        self._cent_by_id = {int(i): self.cents[j] for j, i in enumerate(cent_ids)}

    def warm(self) -> None:
        """One sequential read pass over the resident arrays so first
        queries pay compute, not page-in: the build's read-back
        buffers are freshly written, but a long build (KMeans at 10M)
        can see early pages evicted/compressed before serving starts —
        measured p90 at 10M dropped from ~3-4x median (first-touch) to
        the compute envelope after this pass."""
        import numpy as np

        for arr in (self.ids, self.lists, self.codes, self.vecs):
            np.add.reduce(arr.reshape(-1).view(np.uint8)[:: 4096], dtype=np.int64)

    def nbytes(self) -> int:
        return int(
            self.ids.nbytes + self.lists.nbytes + self.codes.nbytes + self.vecs.nbytes
        )

    def _probe_lists(self, q, qn, nprobe):
        """Global coarse probe: top-nprobe list_ids by centroid cosine
        (ties to the lower list_id; zero-norm centroids sort last,
        matching the distributed _cos which scores them -inf)."""
        import numpy as np

        sims = self._cent_unit @ (q / qn if qn > 0 else q)
        sims[self._cent_zero] = -np.inf
        probe_order = np.lexsort((self.cent_ids, -sims))[:nprobe]
        return [int(self.cent_ids[j]) for j in probe_order]

    def _shortlist(self, q, qn, short_n, probe_lids):
        """ADC stage over this index's rows in ``probe_lids`` ->
        (row_indices, adc) for the (adc asc, id asc)-smallest short_n.
        Lists this index does not hold are skipped — on a fleet node
        holding a list-id range, ``probe_lids`` is the GLOBAL probe
        set and the node scores only its owned slice of it."""
        import numpy as np

        cand_rows = []
        cand_adc = []
        arange_m = np.arange(self.m)
        for lid in probe_lids:
            sl = self._slices.get(lid)
            if sl is None:  # empty/unowned list
                continue
            s, e = sl
            qres = (q - self._cent_by_id[lid]).reshape(self.m, self.ds)
            lut = ((qres[:, None, :] - self.cb) ** 2).sum(axis=2)  # (m, n_codes)
            adc = lut[arange_m[None, :], self.codes[s:e]].sum(axis=1)
            cand_rows.append(np.arange(s, e))
            cand_adc.append(adc)
        if not cand_rows:
            return (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.float64),
            )
        rows = np.concatenate(cand_rows)
        adc = np.concatenate(cand_adc)
        if len(rows) > short_n:
            # exact (adc, id)-smallest short_n via O(n) argpartition
            # instead of a full two-key lexsort over every candidate
            # (the sort dominated query wall at 315k candidates):
            # everything strictly below the short_n-th adc value is in;
            # rows AT the boundary value tie-break by id, same rule as
            # the distributed shortlist's (adc_dist asc, id asc)
            part = np.argpartition(adc, short_n - 1)[:short_n]
            thresh = adc[part].max()
            below = np.flatnonzero(adc < thresh)
            eq = np.flatnonzero(adc == thresh)
            take_eq = eq[np.argsort(self.ids[rows[eq]], kind="stable")][
                : short_n - len(below)
            ]
            pick = np.concatenate([below, take_eq])
            return rows[pick], adc[pick]
        return rows, adc

    def _rerank(self, q, qn, keep):
        """Exact cosine over the shortlist's stored vectors (their
        source values — the same floats the JVM re-rank reads)."""
        import numpy as np

        vs = self.vecs[keep].astype(np.float64)
        norms = np.linalg.norm(vs, axis=1)
        denom = norms * qn
        return np.where(
            denom > 0, (vs @ q) / np.where(denom > 0, denom, 1.0), -np.inf
        )

    def query_rows(
        self, query_vec, k: int, nprobe: int = 8, shortlist: int | None = None
    ) -> list[tuple[int, float]]:
        """Top-k (id, cosine) — pure numpy, no Spark job. Stages mirror
        :func:`_ivfpq_query_resident`; ties break to the lower id at
        both the shortlist and the final ordering, and the coarse probe
        breaks centroid-score ties to the lower list_id, so results
        match the distributed path (set-gated in tests; float64 sum
        ORDER differs — numpy pairwise vs JVM sequential fold — which
        can flip last-ULP near-ties, nothing else)."""
        import numpy as np

        short_n = shortlist if shortlist is not None else max(16 * k, 256)
        q = np.asarray(query_vec, dtype=np.float64)
        qn = np.linalg.norm(q)
        keep, _adc = self._shortlist(
            q, qn, short_n, self._probe_lists(q, qn, nprobe)
        )
        if len(keep) == 0:
            return []
        short_ids = self.ids[keep]
        cos = self._rerank(q, qn, keep)
        top = np.lexsort((short_ids, -cos))[:k]
        return [
            (int(short_ids[i]), (None if cos[i] == -np.inf else float(cos[i])))
            for i in top
        ]

    def shortlist_rows(self, query_vec, nprobe, short_n, probe_lids=None):
        """One fleet NODE's answer to the router: ``(ids, adc, cos)``
        numpy arrays for this node's (adc, id)-smallest ``short_n``
        rows among the probed lists it owns. ``probe_lids`` is the
        GLOBAL probe set the router computed from the (replicated)
        coarse quantizer; the router merges nodes' rows, re-applies
        the same (adc asc, id asc) short_n cut — node-local cuts are
        supersets of the global cut's members within each node, so
        the merge reconstructs the single-box shortlist EXACTLY — and
        takes top-k by (cos desc, id asc). See
        ``tools/ann_fleet_probe.py`` for the two-node router."""
        import numpy as np

        q = np.asarray(query_vec, dtype=np.float64)
        qn = np.linalg.norm(q)
        if probe_lids is None:
            probe_lids = self._probe_lists(q, qn, nprobe)
        keep, adc = self._shortlist(q, qn, short_n, probe_lids)
        if len(keep) == 0:
            return (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.float64),
                np.empty(0, dtype=np.float64),
            )
        return self.ids[keep], adc, self._rerank(q, qn, keep)


def ivfpq_local_index(
    encoded: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    m: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "codes",
    list_col: str = "list_id",
    max_bytes: int = 12_000_000_000,
    shard_path: str | None = None,
    list_range: tuple[int, int] | None = None,
) -> LocalIVFPQIndex:
    """Build a :class:`LocalIVFPQIndex` from ``ivfpq_build`` outputs.

    One distributed ``mapInPandas`` pass packs each partition's rows
    into binary shards (ids/lists/codes/vectors as raw little-endian
    buffers — numpy end to end, never one Python object per row),
    WRITTEN AS PARQUET and read back driver-side via pyarrow: shard
    loading never rides the task-result channel, so
    ``spark.driver.maxResultSize`` (1 GiB default — a 10M x 64d index
    is ~2.8 GiB) does not cap the index, and the shard files ARE the
    serving artifact a fleet node would load for its list-id range.
    Pass ``shard_path`` to keep them; default is a temp dir removed
    after load. The size guard runs BEFORE any data moves, from a
    count + the model dims, so an oversized corpus fails fast instead
    of OOMing the driver.

    The shards PRESERVE the source element width: float32 embeddings
    pack 4-byte shards, float64 pack 8-byte shards (any other element
    type is cast to double first) — the exact re-rank reads the same
    floats the distributed re-rank reads either way, so the two paths
    cannot diverge by a float32 truncation. Shard rows carry
    ``(dim, vecdt)`` so a serving node can load a shard dir without
    out-of-band metadata (:func:`ivfpq_local_index_from_shards`), and
    ``list_range=(lo, hi)`` keeps only rows with lo <= list_id < hi —
    the fleet shape where each node owns a coarse-quantizer range.
    """
    import numpy as np
    from pyspark.sql.types import ArrayType, FloatType

    cent_rows = centroids.collect()
    if not cent_rows:
        raise ValueError("local index needs non-empty centroids")
    cent_ids = np.array([r[list_col] for r in cent_rows], dtype=np.int64)
    cents = np.array([list(r["centroid"]) for r in cent_rows], dtype=np.float64)
    dim = cents.shape[1]
    cb_rows = codebooks.collect()
    if not cb_rows:
        raise ValueError("local index needs non-empty codebooks")
    n_codes = 1 + max(r["code_id"] for r in cb_rows)
    ds = len(cb_rows[0]["centroid"])
    cb = np.zeros((m, n_codes, ds), dtype=np.float64)
    for r in cb_rows:
        cb[r["sub_id"], r["code_id"]] = list(r["centroid"])

    if n_codes > 256:
        raise ValueError(
            f"local index packs codes as uint8; n_codes {n_codes} > 256"
        )
    vtype = encoded.schema[vec_col].dataType
    src_is_f32 = isinstance(vtype, ArrayType) and isinstance(
        vtype.elementType, FloatType
    )
    np_dt = np.float32 if src_is_f32 else np.float64
    sql_elem = "float" if src_is_f32 else "double"
    n = encoded.count()
    est = n * (8 + 4 + m + np.dtype(np_dt).itemsize * dim)
    if est > max_bytes:
        raise ValueError(
            f"local index would need ~{est / 1e9:.1f} GB for {n} rows "
            f"(> max_bytes {max_bytes / 1e9:.1f} GB); shard by {list_col} "
            f"ranges across serving nodes instead"
        )
    if n == 0:
        empty = LocalIVFPQIndex(
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int32),
            np.empty((0, m), dtype=np.uint8),
            np.empty((0, dim), dtype=np_dt),
            cent_ids,
            cents,
            cb,
        )
        return empty  # nothing to pack; skip the mapInPandas round-trip

    src = encoded.select(
        F.col(id_col).alias("__id"),
        F.col(list_col).cast("int").alias("__list"),
        F.col(code_col).alias("__codes"),
        F.col(vec_col).cast(f"array<{sql_elem}>").alias("__vec"),
    )

    def pack(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids_a = pdf["__id"].to_numpy(dtype=np.int64)
            lists_a = pdf["__list"].to_numpy(dtype=np.int32)
            codes_a = np.stack(pdf["__codes"].to_numpy()).astype(np.uint8)
            vecs_a = np.stack(pdf["__vec"].to_numpy()).astype(np_dt)
            yield pd.DataFrame(
                {
                    "n": [len(pdf)],
                    "dim": [int(dim)],
                    "vecdt": [np.dtype(np_dt).name],
                    "ids": [ids_a.tobytes()],
                    "lists": [lists_a.tobytes()],
                    "codes": [codes_a.tobytes()],
                    "vecs": [vecs_a.tobytes()],
                }
            )

    import shutil
    import tempfile

    packed = src.mapInPandas(
        pack,
        "n long, dim int, vecdt string, ids binary, lists binary, "
        "codes binary, vecs binary",
    )
    tmp_dir = None
    if shard_path is None:
        tmp_dir = tempfile.mkdtemp(prefix="ivfpq_local_shards_")
        shard_path = tmp_dir
    try:
        packed.write.mode("overwrite").parquet(shard_path)
        ids, lists, codes, vecs = _read_local_shards(
            shard_path, m=m, list_range=list_range
        )
    finally:
        if tmp_dir is not None:
            shutil.rmtree(tmp_dir, ignore_errors=True)
    idx = LocalIVFPQIndex(ids, lists, codes, vecs, cent_ids, cents, cb)
    idx.warm()
    return idx


def _read_local_shards(
    shard_path: str, m: int, list_range: tuple[int, int] | None = None
):
    """Driver-side load of a packed shard dir -> (ids, lists, codes,
    vecs) numpy arrays; ``list_range=(lo, hi)`` masks to
    lo <= list_id < hi (a serving node's coarse-quantizer range).
    dim/dtype come from the shard rows themselves."""
    import numpy as np
    import pyarrow.parquet as papq

    tbl = papq.read_table(
        shard_path, columns=["dim", "vecdt", "ids", "lists", "codes", "vecs"]
    )
    if tbl.num_rows == 0:
        raise ValueError(f"no shard rows under {shard_path}")
    dim = int(tbl.column("dim")[0].as_py())
    np_dt = np.dtype(tbl.column("vecdt")[0].as_py())
    ids = np.concatenate(
        [np.frombuffer(b.as_py(), dtype=np.int64) for b in tbl.column("ids")]
    )
    lists = np.concatenate(
        [np.frombuffer(b.as_py(), dtype=np.int32) for b in tbl.column("lists")]
    )
    codes = np.concatenate(
        [
            np.frombuffer(b.as_py(), dtype=np.uint8).reshape(-1, m)
            for b in tbl.column("codes")
        ]
    )
    vecs = np.concatenate(
        [
            np.frombuffer(b.as_py(), dtype=np_dt).reshape(-1, dim)
            for b in tbl.column("vecs")
        ]
    )
    del tbl
    if list_range is not None:
        lo, hi = list_range
        keep = (lists >= lo) & (lists < hi)
        ids, lists, codes, vecs = ids[keep], lists[keep], codes[keep], vecs[keep]
    return ids, lists, codes, vecs


def ivfpq_local_index_from_shards(
    shard_path: str,
    centroids: DataFrame,
    codebooks: DataFrame,
    m: int,
    list_col: str = "list_id",
    list_range: tuple[int, int] | None = None,
) -> LocalIVFPQIndex:
    """A serving NODE's load path: attach to a shard dir written by
    :func:`ivfpq_local_index` (``shard_path=``) and hold only the
    rows whose list_id falls in this node's ``list_range`` — the
    fleet deployment the class docstring describes, where the coarse
    quantizer routes queries to the node(s) owning the probed lists.
    The full centroid/codebook model is loaded on every node (it is
    model-sized); only the row payload is range-partitioned."""
    import numpy as np

    cent_rows = centroids.collect()
    if not cent_rows:
        raise ValueError("local index needs non-empty centroids")
    cent_ids = np.array([r[list_col] for r in cent_rows], dtype=np.int64)
    cents = np.array([list(r["centroid"]) for r in cent_rows], dtype=np.float64)
    cb_rows = codebooks.collect()
    if not cb_rows:
        raise ValueError("local index needs non-empty codebooks")
    n_codes = 1 + max(r["code_id"] for r in cb_rows)
    ds = len(cb_rows[0]["centroid"])
    cb = np.zeros((m, n_codes, ds), dtype=np.float64)
    for r in cb_rows:
        cb[r["sub_id"], r["code_id"]] = list(r["centroid"])
    ids, lists, codes, vecs = _read_local_shards(
        shard_path, m=m, list_range=list_range
    )
    idx = LocalIVFPQIndex(ids, lists, codes, vecs, cent_ids, cents, cb)
    idx.warm()
    return idx


def ivfpq_local_server(
    encoded: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    m: int,
    nprobe: int = 8,
    shortlist: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "codes",
    list_col: str = "list_id",
    max_bytes: int = 12_000_000_000,
):
    """:func:`ivfpq_server`'s exact interface over the driver-resident
    index: returns ``query(query_vec, k, nprobe=..., shortlist=...) ->
    DataFrame`` with the same ``(id, cosine_sim)`` schema. Per-query
    cost is numpy only (ms at 10M vectors) plus one small
    ``createDataFrame``; use ``.index.query_rows`` directly when the
    caller wants tuples without the DataFrame wrapper."""
    spark = encoded.sparkSession
    index = ivfpq_local_index(
        encoded, centroids, codebooks, m=m, id_col=id_col, vec_col=vec_col,
        code_col=code_col, list_col=list_col, max_bytes=max_bytes,
    )

    def query(
        query_vec,
        k: int,
        nprobe: int = nprobe,
        shortlist: int | None = shortlist,
    ) -> DataFrame:
        rows = index.query_rows(query_vec, k, nprobe=nprobe, shortlist=shortlist)
        return spark.createDataFrame(
            rows, f"{id_col} long, cosine_sim double"
        )

    query.index = index
    return query
