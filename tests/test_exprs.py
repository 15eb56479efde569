"""Unit tests for the deterministic expression helpers — the contract
that makes the whole oracle strategy work (bit-identical numerics and
hashes across Spark and DuckDB).
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from terrorblade_spark.functions.exprs import (
    dec_sum,
    duck_hash64,
    duck_tokens,
    hash64,
    tokens,
)


def test_dec_sum_order_independent(spark):
    vals = [0.1, 0.2, 0.3, 1e9, -1e9, 0.4] * 100
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    total_fwd = df.agg(dec_sum("x", 6).alias("s")).collect()[0]["s"]
    total_rev = (
        spark.createDataFrame([(v,) for v in reversed(vals)], ["x"])
        .repartition(7)
        .agg(dec_sum("x", 6).alias("s"))
        .collect()[0]["s"]
    )
    assert total_fwd == total_rev  # bit-for-bit, any partitioning


def test_hash64_matches_duckdb(spark):
    samples = ["", "hello", "a b  c", "Ünïcode ✓", "0:the quick brown"]
    df = spark.createDataFrame([(s,) for s in samples], ["t"])
    got = {
        r["t"]: r["h"]
        for r in df.select("t", hash64(F.col("t")).alias("h")).collect()
    }
    con = duckdb.connect()
    for s in samples:
        expected = con.execute(
            f"SELECT {duck_hash64('?')}", [s]
        ).fetchone()[0]
        assert got[s] == expected, s


def test_hash64_salt(spark):
    df = spark.createDataFrame([("x",)], ["t"])
    h0 = df.select(hash64(F.col("t")).alias("h")).collect()[0]["h"]
    h1 = df.select(hash64(F.col("t"), salt="3:").alias("h")).collect()[0]["h"]
    assert h0 != h1
    con = duckdb.connect()
    expected = con.execute(f"SELECT {duck_hash64('?', salt='3:')}", ["x"]).fetchone()[0]
    assert h1 == expected


def test_tokens_matches_duckdb(spark):
    samples = ["", "   ", "one", " a  b\tc\nd ", "x,y z"]
    df = spark.createDataFrame([(s,) for s in samples], ["t"])
    got = {r["t"]: r["tk"] for r in df.select("t", tokens("t").alias("tk")).collect()}
    con = duckdb.connect()
    for s in samples:
        expected = con.execute(f"SELECT {duck_tokens('?')}", [s]).fetchone()[0]
        assert got[s] == expected, repr(s)
