"""Build a scaled-up fixture dir by key-shifted replication of an
existing scale factor (default: 10 x sf0.1 -> "sf1").

The driver's generator is not available, so scale-up data is made the
same way as the repo's 16x/64x corpus probes: N referentially-
consistent copies, each with every entity key shifted into its own id
band. Per-replica perturbations keep the WORKLOAD SHAPE a faithful
N-fold of the base instead of an accidental near-dup bomb:

- documents.text: every word in replica i>0 gets an ``_i`` suffix, so
  shingle sets across replicas are fully disjoint (each replica
  contributes its own copy of the base corpus's near-dup cluster
  structure; pair counts scale Nx, not quadratically);
- embeddings.embedding: replica i's vectors are rotated by i positions
  (an orthogonal transform — within-replica cosine geometry is
  EXACTLY preserved, across-replica similarity is decorrelated);
- events: user_id/event_id shifted per replica; timestamps unchanged
  (N x density, per-user session structure preserved).

Pure DuckDB (no Spark) — writes one parquet per table.

Usage: python tools/make_scale_dir.py [--base /root/testdata/sf0.1]
    [--out /root/repo/.data/sf1] [--copies 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

OFF = 1_000_000_000  # key band per replica, beyond any fixture key range

# per-table key-shift expressions; {i} is the replica index
SHIFTS = {
    "region": None,  # dims replicate once, unshifted
    "nation": None,
    "customer": {"c_custkey": True},
    "supplier": {"s_suppkey": True},
    "part": {"p_partkey": True},
    "orders": {"o_orderkey": True, "o_custkey": True},
    "lineitem": {"l_orderkey": True, "l_partkey": True, "l_suppkey": True},
    "events": {"event_id": True, "user_id": True},
    "documents": {"doc_id": True},
    # label IS shifted (by a small int32-safe band): it is a per-corpus
    # cluster id, not a shared dim. Leaving it unshifted multiplies each
    # label's population by N and makes every within-label pairwise
    # operator (q39's bounded brute force) N^2x instead of Nx — the
    # first sf1 build did exactly that and q39 went from seconds to
    # tens of minutes on ~10 hot join keys.
    "embeddings": {"vec_id": True, "label": 1000},
}


def build(base: str, out: str, copies: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table, shift in SHIFTS.items():
        src = f"{base}/{table}.parquet"
        dst = f"{out}/{table}.parquet"
        cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        if shift is None:
            con.sql(f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)")
            print(f"{table}: copied (dim)")
            continue
        exprs = []
        for c in cols:
            if shift.get(c):
                # True -> the wide BIGINT band; an int -> a narrow
                # type-preserving band (int32 columns like label)
                band = OFF if shift[c] is True else int(shift[c])
                cast = "BIGINT" if shift[c] is True else "INTEGER"
                exprs.append(f"{c} + CAST(i AS {cast}) * {band} AS {c}")
            elif table == "documents" and c == "text":
                # word-suffix every token in replicas > 0: disjoint
                # shingle sets across replicas, identical within
                exprs.append(
                    "CASE WHEN i = 0 THEN text ELSE "
                    "regexp_replace(text, '(\\S+)', '\\1_' || i, 'g') END AS text"
                )
            elif table == "embeddings" and c == "embedding":
                # rotate by i: orthogonal, so within-replica cosine
                # structure is exactly preserved
                exprs.append(
                    "CASE WHEN i = 0 THEN embedding ELSE "
                    "list_concat(embedding[(i+1):], embedding[1:i]) END AS embedding"
                )
            else:
                exprs.append(c)
        sel = ", ".join(exprs)
        con.sql(
            f"COPY (SELECT {sel} FROM '{src}', "
            f"(SELECT CAST(range AS INTEGER) AS i FROM range({copies})) "
            f"ORDER BY i) TO '{dst}' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{table}: {n} rows ({copies} copies)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.data/sf1")
    ap.add_argument("--copies", type=int, default=10)
    a = ap.parse_args()
    build(a.base, a.out, a.copies)
