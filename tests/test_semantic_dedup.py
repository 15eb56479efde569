"""SemDeDup (operators/dedup.py semantic_dedup): embedding-space
near-dup removal via k-means clusters + within-cluster cosine pairs +
connected components. Geometry is constructed so cluster membership,
duplicate groups, and the farthest-from-centroid representative are
all known a priori.
"""

from __future__ import annotations

import math

import pytest

from terrorblade_spark.operators.dedup import semantic_dedup


def _rot(theta: float, i: int, j: int, dims: int = 4) -> list[float]:
    """Unit vector rotated by theta from axis i toward axis j."""
    v = [0.0] * dims
    v[i] = math.cos(theta)
    v[j] = math.sin(theta)
    return v


@pytest.fixture(scope="module")
def geometry(spark):
    """Three well-separated clusters; known duplicate groups inside.

    Cluster A (axis 0): ids 5,10 are twins (0.10 rad apart, cos 0.995);
    id 11 is a member but below threshold vs both (0.35-0.45 rad).
    Cluster B (axis 1): ids 19,20 are twins (0.08 rad); id 22 pulls the
    centroid so the farthest twin is unambiguous. Cluster C: singleton.
    Centroids sit at the member means, so within each twin group the
    member at angle 0 is FARTHER from the centroid than its twin.
    """
    rows = [
        (5, _rot(0.10, 0, 1)),   # A twin (closer to centroid)
        (10, _rot(0.00, 0, 1)),  # A twin (farther from centroid)
        (11, _rot(0.45, 0, 1)),  # A non-dup member
        (19, _rot(0.08, 1, 2)),  # B twin (closer)
        (20, _rot(0.00, 1, 2)),  # B twin (farther)
        (22, _rot(0.40, 1, 2)),  # B non-dup member
        (30, _rot(0.0, 2, 3)),   # C singleton
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_duplicate_groups_and_counts(spark, geometry):
    out = semantic_dedup(geometry, threshold=0.95, n_clusters=3).collect()
    by_id = {r.vec_id: r for r in out}
    assert len(out) == 7
    # exactly one duplicate flagged per twin group
    assert sum(r.is_duplicate for r in out) == 2
    # twins share a canonical; non-dups are their own canonical
    assert by_id[5].canonical_id == by_id[10].canonical_id
    assert by_id[19].canonical_id == by_id[20].canonical_id
    for vid in (11, 22, 30):
        assert by_id[vid].canonical_id == vid
        assert not by_id[vid].is_duplicate
    # twin groups never merge across clusters
    assert by_id[5].canonical_id != by_id[19].canonical_id


def test_farthest_keep_prefers_least_prototypical(spark, geometry):
    out = {r.vec_id: r for r in semantic_dedup(geometry, threshold=0.95, n_clusters=3).collect()}
    # the angle-0 member of each twin pair is farther from the pulled
    # centroid -> it is the kept representative (SemDeDup's keep rule)
    assert out[10].canonical_id == 10 and not out[10].is_duplicate
    assert out[5].is_duplicate
    assert out[20].canonical_id == 20 and not out[20].is_duplicate
    assert out[19].is_duplicate


def test_min_id_keep(spark, geometry):
    out = {
        r.vec_id: r
        for r in semantic_dedup(geometry, threshold=0.95, n_clusters=3, keep="min_id").collect()
    }
    assert out[5].canonical_id == 5 and not out[5].is_duplicate
    assert out[10].is_duplicate
    assert out[19].canonical_id == 19 and not out[19].is_duplicate
    assert out[20].is_duplicate


def test_deterministic_across_calls(spark, geometry):
    a = sorted(map(tuple, semantic_dedup(geometry, threshold=0.95, n_clusters=3).collect()))
    b = sorted(map(tuple, semantic_dedup(geometry, threshold=0.95, n_clusters=3).collect()))
    assert a == b


def test_threshold_1_keeps_only_exact(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),  # exact twin of 1
        (3, _rot(0.05, 0, 1)),      # near but not exact
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in semantic_dedup(df, threshold=1.0, n_clusters=2).collect()}
    assert out[1].canonical_id == out[2].canonical_id
    assert not out[3].is_duplicate


def test_single_cluster_refused(spark, geometry):
    with pytest.raises(ValueError):
        semantic_dedup(geometry, n_clusters=1)


def test_bad_keep_raises(spark, geometry):
    with pytest.raises(ValueError):
        semantic_dedup(geometry, keep="best")


def test_blas_and_join_pair_methods_agree(spark, geometry):
    a = sorted(
        map(tuple, semantic_dedup(geometry, threshold=0.95, n_clusters=3).collect())
    )
    b = sorted(
        map(
            tuple,
            semantic_dedup(
                geometry, threshold=0.95, n_clusters=3, pair_method="join"
            ).collect(),
        )
    )
    assert a == b


def test_multi_probe_finds_boundary_straddling_twins(spark):
    """The candidate-expansion mechanism itself, with HAND-SPECIFIED
    centroids (a k-means fit would make the boundary placement
    run-dependent): a twin pair whose members lean to opposite sides
    of a Voronoi boundary shares no cell at p=1 (pair invisible) but
    shares both cells at p=2 (pair found). Deterministic by
    construction — pure matmul assignment."""
    from terrorblade_spark.operators.dedup import (
        _assign_probes_blas,
        _cluster_edges_blas,
    )

    a = math.sqrt(0.5)
    df = spark.createDataFrame(
        [
            (500, [a + 0.02, a - 0.02, 0.0, 0.0]),  # leans to axis-0 cell
            (501, [a - 0.02, a + 0.02, 0.0, 0.0]),  # leans to axis-1 cell
            (1, [1.0, 0.0, 0.0, 0.0]),              # axis-0 anchor
            (2, [0.0, 1.0, 0.0, 0.0]),              # axis-1 anchor
        ],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "list_id int, centroid array<double>",
    )
    # cos(500, 501) ~ 0.9992, well above the 0.99 threshold
    p1, _bc1 = _assign_probes_blas(df, cents, 1, "vec_id", "embedding")
    cells = {r.vec_id: r.list_id for r in p1.collect()}
    assert cells[500] != cells[501]  # the straddle premise, asserted
    e1 = _cluster_edges_blas(p1, "vec_id", "embedding", 0.99).collect()
    assert (500, 501) not in {(r.id_a, r.id_b) for r in e1}

    p2, _bc2 = _assign_probes_blas(df, cents, 2, "vec_id", "embedding")
    assert p2.count() == 8  # every vector in both cells
    e2 = _cluster_edges_blas(p2, "vec_id", "embedding", 0.99).distinct().collect()
    assert (500, 501) in {(r.id_a, r.id_b) for r in e2}
    # anchors never pair with anything (cos vs twins ~ 0.71)
    ids_in_pairs = {r.id_a for r in e2} | {r.id_b for r in e2}
    assert ids_in_pairs == {500, 501}


def test_multi_probe_noop_when_no_straddling(spark, geometry):
    """On well-separated geometry, probes=2 returns exactly the
    probes=1 result (extra cells add candidates, never pairs below
    threshold) — the q82 determinism contract is probe-invariant."""
    base = sorted(
        (r.vec_id, r.canonical_id, r.is_duplicate)
        for r in semantic_dedup(geometry, threshold=0.95, n_clusters=3).collect()
    )
    probed = sorted(
        (r.vec_id, r.canonical_id, r.is_duplicate)
        for r in semantic_dedup(
            geometry, threshold=0.95, n_clusters=3, assign_probes=2
        ).collect()
    )
    assert base == probed


def test_assign_probes_rejects_bad_values(spark, geometry):
    with pytest.raises(ValueError, match="assign_probes"):
        semantic_dedup(geometry, n_clusters=3, assign_probes=0)
    with pytest.raises(ValueError, match="assign_probes"):
        semantic_dedup(geometry, n_clusters=3, assign_probes=9)


def test_assign_probes_clamped_to_cluster_count(spark, geometry):
    """probes > n_clusters degrades to all-cells candidacy (every pair
    compared) instead of crashing — same groups as the exact answer."""
    out = {
        r.vec_id: r
        for r in semantic_dedup(
            geometry, threshold=0.95, n_clusters=3, assign_probes=8
        ).collect()
    }
    assert out[5].canonical_id == out[10].canonical_id
    assert out[19].canonical_id == out[20].canonical_id
    assert sum(r.is_duplicate for r in out.values()) == 2


def test_blas_blocking_matches_unblocked(spark):
    """Many vectors in one cluster with block_rows smaller than the
    cluster: the blocked matmul must find the same pairs."""
    import math

    rows = []
    for i in range(40):
        theta = 0.02 * (i % 5)  # 8 groups of 5 near-identical directions
        axis = i % 5
        v = [0.0] * 8
        v[axis] = math.cos(theta)
        v[(axis + 1) % 8] = math.sin(theta)
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    from terrorblade_spark.operators.dedup import _cluster_edges_blas
    from terrorblade_spark.operators.vector import norm
    from pyspark.sql import functions as F

    nrm = norm(F.col("embedding"))
    unit = df.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x / nrm).alias("embedding"),
        F.lit(0).alias("list_id"),
    )
    small = sorted(
        map(tuple, _cluster_edges_blas(unit, "vec_id", "embedding", 0.999, block_rows=7).collect())
    )
    big = sorted(
        map(tuple, _cluster_edges_blas(unit, "vec_id", "embedding", 0.999, block_rows=4096).collect())
    )
    assert small == big
    assert len(small) > 0


def test_lsh_pairs_find_twins_and_skip_zero_norm(spark):
    from terrorblade_spark.operators.dedup import semantic_neardup_pairs_lsh

    rows = [
        (1, [0.5, 0.1, 0.2, 0.0] * 16),
        (2, [1.0, 0.2, 0.4, 0.0] * 16),   # scaled twin of 1 (cos 1.0)
        (3, [0.0, 0.0, 0.0, 0.0] * 16),   # zero norm: excluded
        (4, [0.0, 1.0, 0.0, 0.3] * 16),   # distinct direction
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = sorted(
        map(tuple, semantic_neardup_pairs_lsh(df, threshold=0.999, planes=4).collect())
    )
    assert pairs == [(1, 2)]


def test_lsh_pairs_threshold_excludes_moderate_similarity(spark):
    from terrorblade_spark.operators.dedup import semantic_neardup_pairs_lsh

    rows = [
        (1, _rot(0.00, 0, 1, 64)),
        (2, _rot(0.30, 0, 1, 64)),  # cos ~0.955 < 0.999
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assert semantic_neardup_pairs_lsh(df, threshold=0.999, planes=4).count() == 0
    # ...but a looser threshold admits it IF the bucket agrees; with
    # nearby directions and 4 planes the twin usually shares the bucket
    loose = semantic_neardup_pairs_lsh(df, threshold=0.9, planes=1).collect()
    assert [(r.id_a, r.id_b) for r in loose] == [(1, 2)]


# --- incremental semantic gate -------------------------------------------------

from terrorblade_spark.operators.dedup import semantic_dedup_incremental


def _cents(spark):
    return spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "list_id int, centroid array<double>",
    )


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_incremental_gate_blocks_state_and_batch_dups(spark):
    """Batch 1: internal twin collapses to min id. Batch 2: a twin of
    an admitted canonical is rejected, fresh content admits, and a new
    internal twin pair keeps one member."""
    cents = _cents(spark)
    b1 = _vecs(spark, [
        (1, _rot(0.00, 0, 1)),
        (2, _rot(0.40, 0, 1)),   # distinct from 1 (cos 0.92 < 0.95)
        (3, _rot(0.00, 1, 2)),
        (4, _rot(0.05, 1, 2)),   # twin of 3
    ])
    adm1, state1 = semantic_dedup_incremental(b1, None, cents, threshold=0.95)
    assert sorted(r.vec_id for r in adm1.collect()) == [1, 2, 3]
    srows = state1.collect()
    assert {r.vec_id for r in srows} == {1, 2, 3}
    assert len(srows) == 6  # 3 canonicals x 2 probe cells

    b2 = _vecs(spark, [
        (10, _rot(0.03, 0, 1)),  # twin of admitted 1 -> rejected
        (11, _rot(0.80, 0, 1)),  # fresh direction -> admitted
        (12, _rot(0.50, 1, 2)),  # twin pair with 13, distinct from 3
        (13, _rot(0.55, 1, 2)),
    ])
    adm2, state2 = semantic_dedup_incremental(b2, state1, cents, threshold=0.95)
    assert sorted(r.vec_id for r in adm2.collect()) == [11, 12]
    assert {r.vec_id for r in state2.collect()} == {11, 12}


def test_incremental_materialize_state_optout_identical(spark):
    """materialize_state=False (q130's admission-only path) must leave
    the admitted set AND the state relation's rows identical — it only
    skips the eager checkpoint job for callers that discard the state."""
    cents = _cents(spark)
    b1 = _vecs(spark, [
        (1, _rot(0.00, 0, 1)),
        (2, _rot(0.40, 0, 1)),
        (3, _rot(0.00, 1, 2)),
        (4, _rot(0.05, 1, 2)),
    ])
    adm_e, state_e = semantic_dedup_incremental(b1, None, cents, threshold=0.95)
    adm_l, state_l = semantic_dedup_incremental(
        b1, None, cents, threshold=0.95, materialize_state=False
    )
    assert sorted(r.vec_id for r in adm_l.collect()) == sorted(
        r.vec_id for r in adm_e.collect()
    )
    # the lazy state is still executable after the operator returned
    # (recomputes through the checkpointed admitted relation)
    assert sorted((r.vec_id, r.list_id) for r in state_l.collect()) == sorted(
        (r.vec_id, r.list_id) for r in state_e.collect()
    )


def test_incremental_replay_is_noop(spark):
    """At-least-once delivery: re-feeding an already-folded batch
    admits nothing (every row pairs with its own admitted twin in
    state, including via the id_a == id_b self-edge)."""
    cents = _cents(spark)
    b1 = _vecs(spark, [(1, _rot(0.00, 0, 1)), (3, _rot(0.00, 1, 2))])
    adm1, state1 = semantic_dedup_incremental(b1, None, cents)
    assert adm1.count() == 2
    adm_replay, state_replay = semantic_dedup_incremental(b1, state1, cents)
    assert adm_replay.count() == 0
    assert state_replay.count() == 0


def test_incremental_chain_through_new_member_rejects_both(spark):
    """Transitive duplicates: new A pairs an old canonical, new B
    pairs only A — the component touches state, so BOTH are rejected
    (same semantics as the batch operator's connected components)."""
    cents = _cents(spark)
    b1 = _vecs(spark, [(1, _rot(0.00, 0, 1))])
    _, state1 = semantic_dedup_incremental(b1, None, cents)
    b2 = _vecs(spark, [
        (20, _rot(0.04, 0, 1)),  # pairs with old 1 (cos 0.9992)
        (21, _rot(0.35, 0, 1)),  # pairs with 20 (cos 0.952), NOT with 1 (0.939)
    ])
    adm2, _ = semantic_dedup_incremental(b2, state1, cents, threshold=0.95)
    assert adm2.count() == 0


def test_incremental_first_batch_matches_batch_operator_min_id(spark, geometry):
    """On one batch with no prior state, the gate's admit set equals
    the batch operator's keep='min_id' canonical set (same pairs, same
    components, same keep rule)."""
    cents = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [0.0, 0.0, 1.0, 0.0]),
        ],
        "list_id int, centroid array<double>",
    )
    adm, _ = semantic_dedup_incremental(geometry, None, cents, threshold=0.95)
    got = sorted(r.vec_id for r in adm.collect())
    batch = semantic_dedup(geometry, threshold=0.95, n_clusters=3, keep="min_id")
    want = sorted(
        r.vec_id for r in batch.collect() if not r.is_duplicate
    )
    assert got == want


def test_incremental_mega_group_guard_raises(spark):
    """The ordering contract, ENFORCED (VERDICT r6 task 3): an
    exact-duplicate mega-group fed directly to the semantic gate gets
    a named error instead of a quadratic pair stage. The guard is one
    map-side-combined xxhash64 count over the batch."""
    cents = _cents(spark)
    base = _rot(0.00, 0, 1)
    replicated = _vecs(spark, [(i, base) for i in range(100)])
    with pytest.raises(ValueError, match="max_exact_group"):
        semantic_dedup_incremental(replicated, None, cents, threshold=0.95)
    # the same content routed through the exact gate's shape (distinct
    # vectors) passes; and an explicit opt-out also passes
    adm, _ = semantic_dedup_incremental(
        replicated, None, cents, threshold=0.95, max_exact_group=None
    )
    assert [r.vec_id for r in adm.collect()] == [0]


def test_incremental_gate_requires_integral_ids(spark):
    """String ids would silently cast to NULL in the long-keyed pair
    kernels and ADMIT duplicates — the gate fails fast instead
    (ADVICE r6)."""
    cents = _cents(spark)
    bad = spark.createDataFrame(
        [("doc-a", [1.0, 0.0, 0.0, 0.0])], "vec_id string, embedding array<double>"
    )
    with pytest.raises(TypeError, match="integral"):
        semantic_dedup_incremental(bad, None, cents)


def test_semantic_ingest_txn_exactly_once(spark, tmp_path):
    """The transactional fold: state lands atomically with the
    applied-batch marker; a replayed batch admits nothing and leaves
    state untouched; a new batch gates against the folded state."""
    from terrorblade_spark.operators.dedup import semantic_ingest_txn
    from terrorblade_spark.txn import TxnTable

    t = TxnTable(str(tmp_path / "sem_state"))
    cents = _cents(spark)
    b1 = _vecs(spark, [(1, _rot(0.00, 0, 1)), (3, _rot(0.00, 1, 2))])
    adm1 = semantic_ingest_txn(t, b1, cents, threshold=0.95, applied_id="b1")
    assert sorted(r.vec_id for r in adm1.collect()) == [1, 3]
    v1 = t.latest().version
    assert t.read(spark).count() == 4  # 2 canonicals x 2 probe cells

    # replayed applied_id: no admits, no new manifest state rows
    replay = semantic_ingest_txn(t, b1, cents, threshold=0.95, applied_id="b1")
    assert replay.count() == 0
    assert t.latest().version == v1

    # second batch: twin of 1 rejected, fresh row admitted
    b2 = _vecs(spark, [(10, _rot(0.03, 0, 1)), (11, _rot(0.80, 0, 1))])
    adm2 = semantic_ingest_txn(t, b2, cents, threshold=0.95, applied_id="b2")
    assert sorted(r.vec_id for r in adm2.collect()) == [11]
    assert {r.vec_id for r in t.read(spark).collect()} == {1, 3, 11}
