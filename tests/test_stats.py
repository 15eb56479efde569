"""Contingency chi-square + Cramer's V (operators/stats.py)."""

from __future__ import annotations

import pytest

from terrorblade_spark.operators.stats import chi_square, crosstab_stats


def _mk(spark, cells):
    rows = []
    for (r, c), n in cells.items():
        rows += [(r, c)] * n
    return spark.createDataFrame(rows, "lang string, source string")


def test_crosstab_hand_computed_2x2(spark):
    df = _mk(spark, {("A", "X"): 30, ("A", "Y"): 10, ("B", "X"): 10, ("B", "Y"): 30})
    got = {
        (r["row"], r["col"]): r for r in crosstab_stats(df, "lang", "source").collect()
    }
    # uniform margins of 40 over N=80: every expected is 20
    assert all(v["expected"] == pytest.approx(20.0) for v in got.values())
    assert got[("A", "X")]["contrib"] == pytest.approx(100 / 20)
    s = chi_square(df, "lang", "source").collect()[0]
    assert s["chi2"] == pytest.approx(20.0)
    assert s["dof"] == 1 and s["n"] == 80
    assert s["cramers_v"] == pytest.approx(0.5)


def test_chi_square_includes_zero_observed_cells(spark):
    """A grid cell with no observations still contributes its expected
    count — folded in analytically, never materialized."""
    df = _mk(spark, {("A", "X"): 5, ("A", "Y"): 5, ("B", "X"): 5})
    s = chi_square(df, "lang", "source").collect()[0]
    # by hand: chi2 = 0.41667 + 0.83333 + 0.83333 + E(B,Y)=1.66667
    assert s["chi2"] == pytest.approx(3.75, abs=1e-5)


def test_chi_square_independent_is_zero(spark):
    """Perfectly proportional table: chi2 = 0 = Cramer's V."""
    df = _mk(spark, {("A", "X"): 20, ("A", "Y"): 10, ("B", "X"): 40, ("B", "Y"): 20})
    s = chi_square(df, "lang", "source").collect()[0]
    assert s["chi2"] == pytest.approx(0.0, abs=1e-9)
    assert s["cramers_v"] == pytest.approx(0.0, abs=1e-6)


def test_crosstab_keeps_null_level(spark):
    df = spark.createDataFrame(
        [("A", "X"), (None, "X"), (None, "Y")], "lang string, source string"
    )
    got = crosstab_stats(df, "lang", "source").collect()
    assert {r["row"] for r in got} == {"A", None}


def test_chi_square_null_level_counts_toward_dof(spark):
    """NULL is a real category level (its cells enter the chi2 sum),
    so it must count toward dof and cramers_v's min_dim too: levels
    {A, NULL} x {X, Y} is a 2x2 grid -> dof 1, not 0."""
    df = spark.createDataFrame(
        [("A", "X"), ("A", "Y"), (None, "X"), (None, "Y")],
        "lang string, source string",
    )
    s = chi_square(df, "lang", "source").collect()[0]
    assert s["dof"] == 1
    assert s["n"] == 4
    # perfectly proportional 2x2 -> chi2 = 0, and min_dim = 1 (not 0)
    assert s["chi2"] == pytest.approx(0.0, abs=1e-9)
    assert s["cramers_v"] == pytest.approx(0.0, abs=1e-6)


def test_single_category_degenerate(spark):
    """One row level: dof = 0 and V = 0 (no association possible)."""
    df = _mk(spark, {("A", "X"): 5, ("A", "Y"): 7})
    s = chi_square(df, "lang", "source").collect()[0]
    assert s["dof"] == 0
    assert s["chi2"] == pytest.approx(0.0, abs=1e-9)
    assert s["cramers_v"] == 0.0


# --- pearson_corr ------------------------------------------------------------

from terrorblade_spark.operators.stats import pearson_corr


def _corr(spark, pairs):
    df = spark.createDataFrame(pairs, "x double, y double")
    row = pearson_corr(df, "x", "y").collect()[0]
    return row["n"], row["corr"]


def test_corr_perfect_linear(spark):
    n, r = _corr(spark, [(float(i), 2.0 * i + 1) for i in range(10)])
    assert n == 10 and r == pytest.approx(1.0)
    n, r = _corr(spark, [(float(i), -3.0 * i) for i in range(10)])
    assert r == pytest.approx(-1.0)


def test_corr_matches_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    xs = rng.rand(50).round(4)
    ys = (0.3 * xs + rng.rand(50) * 0.5).round(4)
    n, r = _corr(spark, [(float(a), float(b)) for a, b in zip(xs, ys)])
    assert r == pytest.approx(float(np.corrcoef(xs, ys)[0, 1]), abs=1e-9)


def test_corr_excludes_null_pairs_and_zero_variance(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, None), (None, 5.0), (3.0, 6.0)],
        "x double, y double",
    )
    row = pearson_corr(df, "x", "y").collect()[0]
    assert row["n"] == 2 and row["corr"] == pytest.approx(1.0)
    flat = spark.createDataFrame([(1.0, 5.0), (2.0, 5.0)], "x double, y double")
    assert pearson_corr(flat, "x", "y").collect()[0]["corr"] is None


def test_corr_grouped(spark):
    rows = [("a", float(i), float(i)) for i in range(5)] + [
        ("b", float(i), float(-i)) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {
        r["g"]: r["corr"] for r in pearson_corr(df, "x", "y", ["g"]).collect()
    }
    assert got["a"] == pytest.approx(1.0) and got["b"] == pytest.approx(-1.0)


# --- spearman_corr -----------------------------------------------------------

from terrorblade_spark.operators.stats import spearman_corr


def test_spearman_monotone_nonlinear_is_one(spark):
    """The defining property Pearson lacks: any monotone transform
    gives |rho| = 1 even when the relation is nonlinear."""
    pairs = [(float(i), float(i**3)) for i in range(1, 12)]
    df = spark.createDataFrame(pairs, "x double, y double")
    row = spearman_corr(df, "x", "y").collect()[0]
    assert row["spearman"] == pytest.approx(1.0)
    drow = spearman_corr(
        spark.createDataFrame([(x, -y) for x, y in pairs], "x double, y double"),
        "x",
        "y",
    ).collect()[0]
    assert drow["spearman"] == pytest.approx(-1.0)


def test_spearman_matches_scipy_formula_with_ties(spark):
    """Tie-averaged ranks: cross-checked against the closed form over
    hand-averaged ranks computed in numpy."""
    import numpy as np

    xs = [1.0, 2.0, 2.0, 3.0, 4.0, 4.0, 4.0, 5.0]
    ys = [10.0, 30.0, 20.0, 20.0, 50.0, 40.0, 60.0, 55.0]

    def avg_ranks(v):
        v = np.asarray(v)
        order = np.argsort(v, kind="stable")
        ranks = np.empty(len(v), dtype=float)
        i = 0
        sv = v[order]
        while i < len(v):
            j = i
            while j < len(v) and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (i + 1 + j) / 2.0
            i = j
        return ranks

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    want = float(np.corrcoef(rx, ry)[0, 1])
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    got = spearman_corr(df, "x", "y").collect()[0]["spearman"]
    assert got == pytest.approx(want, abs=1e-9)


def test_spearman_grouped_and_null_pairs(spark):
    rows = (
        [("a", float(i), float(2 * i)) for i in range(6)]
        + [("b", float(i), float(-i)) for i in range(6)]
        + [("a", 99.0, None)]
    )
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {
        r["g"]: (r["n"], r["spearman"])
        for r in spearman_corr(df, "x", "y", ["g"]).collect()
    }
    assert got["a"] == (6, pytest.approx(1.0))
    assert got["b"][1] == pytest.approx(-1.0)
