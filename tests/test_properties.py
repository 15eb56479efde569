"""Property-based determinism tests (hypothesis): order-sensitive
operators must return identical results regardless of input
partitioning and arrival order — the property that makes them safe on
1000 executors where shuffle order is nondeterministic.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from terrorblade_spark.operators.windows import run_ids, sessionize

_slow = settings(
    max_examples=8,  # each example runs Spark jobs; keep the budget tight
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),        # entity
        st.integers(min_value=0, max_value=10_000),   # offset seconds
    ),
    min_size=1,
    max_size=40,
)


def _df(spark, rows, n_parts):
    t0 = datetime(2024, 1, 1)
    data = [
        (i, ent, t0 + timedelta(seconds=off))
        for i, (ent, off) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, entity long, ts timestamp"
    ).repartition(n_parts)


@given(rows=_events)
@_slow
def test_sessionize_partitioning_invariant(spark, rows):
    outs = []
    for n_parts in (1, 7):
        df = _df(spark, rows, n_parts)
        got = sessionize(df, "ts", ["entity"], "event_id", gap=600).collect()
        outs.append(sorted((r["event_id"], r["session_id"]) for r in got))
    assert outs[0] == outs[1]
    # sanity: session ids start at 0
    assert min(sid for _, sid in outs[0]) == 0


@given(rows=_events)
@_slow
def test_run_ids_partitioning_invariant(spark, rows):
    outs = []
    for n_parts in (1, 5):
        df = _df(spark, rows, n_parts).withColumn("flag", F.col("event_id") % 3)
        got = run_ids(
            df, F.col("flag"), ["entity"], ["ts", "event_id"], "rid"
        ).collect()
        outs.append(sorted((r["event_id"], r["rid"]) for r in got))
    assert outs[0] == outs[1]


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Zs")),
            max_size=60,
        ),
        min_size=1,
        max_size=20,
    )
)
@_slow
def test_minhash_partitioning_invariant(spark, texts):
    from terrorblade_spark.operators.dedup import minhash_signatures

    data = [(i, t) for i, t in enumerate(texts)]
    outs = []
    for n_parts in (1, 6):
        df = spark.createDataFrame(data, "doc_id long, text string").repartition(n_parts)
        got = minhash_signatures(df, "doc_id", "text", num_hashes=8, shingle_n=2).collect()
        outs.append(sorted((r["doc_id"], tuple(r["signature"])) for r in got))
    assert outs[0] == outs[1]


@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=15,
    )
)
@_slow
def test_topk_deterministic_under_ties(spark, vecs):
    # duplicate every vector so cosine ties are guaranteed; the id
    # tiebreaker must make top-k stable across partitionings
    from terrorblade_spark.operators.vector import cosine_topk

    data = [(i, [float(x) for x in v]) for i, v in enumerate(vecs + vecs)]
    outs = []
    for n_parts in (1, 4):
        df = spark.createDataFrame(data, "vec_id long, embedding array<float>").repartition(
            n_parts
        )
        q = df.where(F.col("vec_id") == 0)
        got = cosine_topk(df, q, k=5).collect()
        outs.append([(r["vec_id"], r["cosine_sim"]) for r in got])
    assert outs[0] == outs[1]
