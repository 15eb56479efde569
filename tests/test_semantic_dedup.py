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
