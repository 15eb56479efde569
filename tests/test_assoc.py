"""Association rules (operators/assoc.py): hand-computed support,
confidence, lift; dedup of repeated (basket, item) rows; the oversized
basket cap."""

from __future__ import annotations

import pytest

from terrorblade_spark.operators.assoc import association_rules


def _rules(df):
    return {
        (r["item_a"], r["item_b"]): r
        for r in df.collect()
    }


def test_rules_hand_computed(spark):
    """4 baskets: {a,b,c} {a,b} {a,c} {b}. Pair (a,b): pair=2, na=3,
    nb=3, N=4 -> confidence 2/3, lift 2*4/9."""
    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"),
    ]
    b = spark.createDataFrame(rows, "bk long, it string")
    got = _rules(association_rules(b, "bk", "it", min_pair_support=1))
    ab = got[("a", "b")]
    assert ab["pair_count"] == 2 and ab["count_a"] == 3 and ab["count_b"] == 3
    assert ab["confidence"] == pytest.approx(2 / 3)
    assert ab["lift"] == pytest.approx(2 * 4 / (3 * 3))
    ac = got[("a", "c")]
    assert ac["pair_count"] == 2
    assert ac["lift"] == pytest.approx(2 * 4 / (3 * 2))
    bc = got[("b", "c")]
    assert bc["pair_count"] == 1
    # lift < 1 = negatively associated; b appears in 3 baskets, c in 2
    assert bc["lift"] == pytest.approx(1 * 4 / (3 * 2))


def test_rules_min_support_filters(spark):
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")]
    b = spark.createDataFrame(rows, "bk long, it string")
    got = _rules(association_rules(b, "bk", "it", min_pair_support=2))
    assert set(got) == {("a", "b")}


def test_rules_duplicate_lines_count_once(spark):
    """The same item twice in one basket (two lineitems of one part)
    is ONE co-occurrence — the relation is distinct (basket, item)."""
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    b = spark.createDataFrame(rows, "bk long, it string")
    got = _rules(association_rules(b, "bk", "it", min_pair_support=1))
    assert got[("a", "b")]["pair_count"] == 2
    assert got[("a", "b")]["count_a"] == 2


def test_rules_basket_cap_truncates_deterministically(spark):
    """A basket over the cap keeps its lexicographically-smallest
    items: with cap=2, basket {a,b,c} contributes only (a,b)."""
    rows = [(1, "a"), (1, "b"), (1, "c")]
    b = spark.createDataFrame(rows, "bk long, it string")
    got = _rules(association_rules(b, "bk", "it", min_pair_support=1, max_basket_items=2))
    assert set(got) == {("a", "b")}


def test_rules_rejects_bad_params(spark):
    b = spark.createDataFrame([(1, "a")], "bk long, it string")
    with pytest.raises(ValueError):
        association_rules(b, "bk", "it", min_pair_support=0)
    with pytest.raises(ValueError):
        association_rules(b, "bk", "it", max_basket_items=1)
