"""Scale-layout operators: bucketed joins must plan with no exchange,
partitioned writes must prune, salted aggregation/join must match the
plain results exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from terrorblade_spark.io import (
    salted_agg,
    salted_join,
    write_bucketed,
    write_partitioned,
)
from terrorblade_spark.tables import load_table


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # saveAsTable writes to the session warehouse; point it somewhere
    # disposable once for this module
    return spark


def test_bucketed_join_no_exchange(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").limit(2000)
    n_rows = ev.count()
    agg = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    write_bucketed(ev, "t_events_b", ["user_id"], n_buckets=8, sort_cols=["user_id"])
    write_bucketed(agg, "t_users_b", ["user_id"], n_buckets=8, sort_cols=["user_id"])
    # force the co-located sort-merge path (a broadcast join would hide
    # the bucketing; at real scale neither side fits in a broadcast)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_events_b").join(spark.table("t_users_b"), "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # co-bucketed scan: no shuffle on either side
        assert "Exchange hashpartitioning" not in plan, plan[:1500]
        assert "Bucketed: true" in plan
        assert joined.count() == n_rows
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_events_b")
        spark.sql("DROP TABLE IF EXISTS t_users_b")


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").limit(2000)
    path = str(tmp_path / "ev_part")
    write_partitioned(ev, path, ["event_type"])
    q = spark.read.parquet(path).where(F.col("event_type") == "purchase")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # partition filters appear as PartitionFilters on the scan,
    # and the pruned scan reads only matching directories
    assert "PartitionFilters: [isnotnull(event_type" in plan
    want = ev.where("event_type = 'purchase'").count()
    assert q.count() == want


def test_salted_agg_matches_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plain = {
        r["user_id"]: (r["n"], r["mx"])
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("event_id").alias("mx"))
        .collect()
    }
    salted = {
        r["user_id"]: (r["n"], r["mx"])
        for r in salted_agg(
            ev,
            ["user_id"],
            partial_aggs={
                "pn": F.count(F.lit(1)),
                "pmx": F.max("event_id"),
            },
            merge_aggs={"n": F.sum("pn"), "mx": F.max("pmx")},
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").limit(5000)
    dim = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("user_n"))
    plain = ev.join(dim, "user_id").groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("user_n").alias("s")
    )
    salted = salted_join(ev, dim, ["user_id"], n_salts=4).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("user_n").alias("s")
    )
    p = {r["user_id"]: (r["n"], r["s"]) for r in plain.collect()}
    s = {r["user_id"]: (r["n"], r["s"]) for r in salted.collect()}
    assert s == p


def test_incremental_dedup_against_bucketed_index_shuffles_batch_only(spark, sf_dir):
    """The ingest-dedup scale contract: the durable content-hash index
    is stored bucketed by hash, so the per-batch anti-join repartitions
    ONLY the (small) batch — the corpus-sized index is read in place,
    never re-shuffled per ingest."""
    from terrorblade_spark.functions.exprs import hash64
    from terrorblade_spark.operators.dedup import incremental_dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    index = docs.select(hash64(F.col("text")).alias("content_hash")).distinct()
    write_bucketed(index, "t_hash_index", ["content_hash"], n_buckets=8,
                   sort_cols=["content_hash"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        batch = spark.createDataFrame(
            [(1, "a brand new document"), (2, "another new one")],
            "doc_id long, text string",
        )
        admitted, _ = incremental_dedup(
            batch, spark.table("t_hash_index"), id_col="doc_id"
        )
        plan = admitted._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan and "LeftAnti" in plan
        # ONE exchange in the whole plan — the batch side's, shared by
        # its window dedup and the anti-join (both keyed on the hash);
        # the bucketed index scan contributes none
        assert plan.count("Exchange") == 1, plan
        assert "Bucketed: true" in plan
        assert admitted.count() == 2  # both new, both admitted
        # replay: everything now known -> nothing admitted
        idx2 = spark.table("t_hash_index").unionByName(
            admitted.select("content_hash")
        )
        again, _ = incremental_dedup(batch, idx2, id_col="doc_id")
        assert again.count() == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_hash_index")


def test_cluster_write_builds_zone_maps(spark, sf_dir, tmp_path):
    # range-clustered files own disjoint key ranges -> a point predicate
    # can prune all but one file from its parquet stats alone
    import pyarrow.parquet as pq
    import os

    from terrorblade_spark.io import cluster_write
    from terrorblade_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "ev_clustered")
    cluster_write(ev, path, ["user_id"], n_files=8)

    ranges = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        col_idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "user_id"
        )
        los, his = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            los.append(st.min); his.append(st.max)
        ranges.append((min(los), max(his)))
    assert len(ranges) > 1
    ranges.sort()
    # disjoint: each file's max < next file's min (range partitioner
    # assigns every key to exactly one partition)
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
    # a point lookup matches exactly one file's range
    probe = ranges[len(ranges) // 2][0]
    containing = [r for r in ranges if r[0] <= probe <= r[1]]
    assert len(containing) == 1
    # rewrite preserved every row
    assert spark.read.parquet(path).count() == ev.count()


def test_compact_rewrites_to_target_file_count(spark, sf_dir, tmp_path):
    import os

    from terrorblade_spark.io import compact
    from terrorblade_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    debris = str(tmp_path / "debris")
    # simulate micro-batch debris: 16 files for a tiny table
    ev.repartition(16).write.parquet(debris)
    n_small = len([f for f in os.listdir(debris) if f.endswith(".parquet")])
    assert n_small >= 16

    out = str(tmp_path / "compacted")
    total = sum(
        os.path.getsize(os.path.join(debris, f))
        for f in os.listdir(debris) if f.endswith(".parquet")
    )
    written = compact(spark, debris, out, target_file_bytes=total)  # fits in ~1
    n_big = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert written == 1 and n_big == 1
    assert spark.read.parquet(out).count() == n

    # sort-preserving variant keeps zone maps (delegates to cluster_write)
    out2 = str(tmp_path / "compacted_sorted")
    compact(spark, debris, out2, target_file_bytes=total // 4, preserve_sort=["user_id"])
    assert spark.read.parquet(out2).count() == n


def test_zorder_write_prunes_both_dimensions(spark, tmp_path):
    """Linear clustering on x gives a y-predicate nothing to prune;
    z-order gives every file a tight envelope in BOTH dims, so a
    selective filter on either column skips most files on footer
    stats alone."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from terrorblade_spark.io import cluster_write, zorder_write

    # 64k points on a 256x256 grid, shuffled arrival order
    df = (
        spark.range(0, 65_536)
        .select(
            (F.col("id") % 256).alias("x"),
            (F.col("id") / 256).cast("long").alias("y"),
        )
        .repartition(16)
    )

    lin_path, z_path = str(tmp_path / "linear"), str(tmp_path / "zorder")
    cluster_write(df, lin_path, ["x"], n_files=16)
    zorder_write(df, z_path, ["x", "y"], bits=4, n_files=16)

    def file_ranges(path, col):
        out = []
        for f in sorted(os.listdir(path)):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            ci = next(
                i
                for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == col
            )
            stats = [md.row_group(rg).column(ci).statistics for rg in range(md.num_row_groups)]
            out.append((min(s.min for s in stats), max(s.max for s in stats)))
        return out

    def files_matching(ranges, lo, hi):
        return sum(1 for mn, mx in ranges if not (mx < lo or mn > hi))

    # y-band predicate: y BETWEEN 0 AND 15 (1/16 of the data)
    lin_hit = files_matching(file_ranges(lin_path, "y"), 0, 15)
    z_hit = files_matching(file_ranges(z_path, "y"), 0, 15)
    assert lin_hit == 16  # x-clustered files all span full y
    assert z_hit <= 8  # z-order prunes at least half on y alone

    # and the x dimension still prunes too (the point of interleaving)
    zx_hit = files_matching(file_ranges(z_path, "x"), 0, 15)
    assert zx_hit <= 8

    # round-trip: no rows lost or duplicated
    assert spark.read.parquet(z_path).count() == 65_536


def test_zorder_accepts_timestamp_columns(spark, sf_dir, tmp_path):
    """(entity, time) is the advertised use case: timestamp cluster
    keys must rank-bucket through the double cast, not crash."""
    from terrorblade_spark.io import zorder_write
    from terrorblade_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "zts")
    zorder_write(ev, path, ["user_id", "ts"], bits=3, n_files=4)
    assert spark.read.parquet(path).count() == ev.count()


def test_write_jsonl_shards_deterministic_and_manifested(spark, tmp_path):
    """Two exports of the same corpus produce identical shard
    assignment and in-shard order; the manifest counts match; reading
    a shard back yields rows in position order."""
    from terrorblade_spark.io import write_jsonl_shards

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(500)], "doc_id long, text string"
    )
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = write_jsonl_shards(df, p1, "doc_id", n_shards=8)
    write_jsonl_shards(df, p2, "doc_id", n_shards=8)

    counts = {r["shard"]: r["n_rows"] for r in m1.collect()}
    assert sum(counts.values()) == 500 and len(counts) == 8
    # persisted manifest equals the returned one
    stored = {
        r["shard"]: r["n_rows"]
        for r in spark.read.parquet(f"{p1}/_manifest").collect()
    }
    assert stored == counts

    import json as _json
    import pathlib

    def shard_rows(root, shard):
        rows = []
        for f in sorted(pathlib.Path(root, f"shard={shard}").glob("*.json")):
            rows += [_json.loads(ln) for ln in f.read_text().splitlines()]
        return rows

    for s in (0, 3, 7):
        a, b = shard_rows(p1, s), shard_rows(p2, s)
        assert a == b and len(a) == counts[s]
        assert [r["pos"] for r in a] == sorted(r["pos"] for r in a)


def manifest_rows(spark, path):
    return spark.read.parquet(f"{path}/_manifest").collect()


def test_read_jsonl_shards_validates_manifest(spark, tmp_path):
    import pathlib

    import pytest as _pytest

    from terrorblade_spark.io import read_jsonl_shards, write_jsonl_shards

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(300)], "doc_id long, text string"
    )
    p = str(tmp_path / "x")
    write_jsonl_shards(df, p, "doc_id", n_shards=4)
    back = read_jsonl_shards(spark, p)
    assert back.count() == 300

    # lose one shard file (with its Hadoop .crc sidecar — in-place
    # EDITS are already caught by the local FS checksum layer; the
    # manifest gate exists for the silent case: a valid-looking but
    # incomplete export)
    victim = next(pathlib.Path(p, "shard=2").glob("*.json"))
    lost = {r["shard"]: r["n_rows"] for r in manifest_rows(spark, p)}[2]
    victim.unlink()
    crc = victim.parent / f".{victim.name}.crc"
    if crc.exists():
        crc.unlink()
    spark.catalog.refreshByPath(p)
    with _pytest.raises(ValueError, match="integrity"):
        read_jsonl_shards(spark, p)
    # opt-out still reads what remains
    assert read_jsonl_shards(spark, p, validate=False).count() == 300 - lost
