"""Streaming steady-state probe: multi-trigger micro-batch latency and
state-store growth, default (HDFS-backed) vs RocksDB state store.

The gate queries (q47/q57) drain an availableNow backlog in one go —
they prove semantics, not steady-state behavior. This probe splits the
sf0.1 events table into N time-ordered parquet chunks, streams them
with maxFilesPerTrigger=1 (one chunk per micro-batch, in event-time
order so the watermark advances and EVICTS finalized sessions), and
records per-batch wall time and state rows from the engine's own
progress metrics. Pass criteria: state does not grow unboundedly
across >= 8 batches once the watermark starts closing sessions.

Usage:
    python tools/streaming_steady_probe.py [--batches 10] [--store both]
Prints one JSON line per store backend; paste into COVERAGE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def split_events(spark, sf_dir: str, out_dir: str, n_chunks: int) -> None:
    """Time-ordered chunking: chunk i holds the i-th slice of event
    time, so streaming files in name order replays the table as a
    plausible live feed (watermark advances monotonically-ish)."""
    from pyspark.sql import functions as F

    from terrorblade_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.select(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).first()
    lo, hi = bounds["lo"], bounds["hi"]
    span = (hi - lo).total_seconds() or 1.0
    chunk = (
        F.least(
            F.lit(n_chunks - 1),
            F.floor(
                (F.col("ts").cast("double") - F.lit(lo.timestamp()))
                / F.lit(span / n_chunks)
            ).cast("int"),
        )
    )
    df = ev.withColumn("__chunk", chunk)
    for i in range(n_chunks):
        (
            df.where(F.col("__chunk") == i)
            .drop("__chunk")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"tmp_{i:03d}"))
        )
        # one file per chunk, named in replay order
        tmp = os.path.join(out_dir, f"tmp_{i:03d}")
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        os.rename(
            os.path.join(tmp, part), os.path.join(out_dir, f"events_{i:03d}.parquet")
        )
        shutil.rmtree(tmp)


def run_stream(spark, src_dir: str, store: str, n_batches: int) -> dict:
    from terrorblade_spark.streaming.pipeline import (
        session_aggregate,
        use_rocksdb_state,
    )

    use_rocksdb_state(spark, enable=(store == "rocksdb"))
    raw = spark.read.parquet(os.path.join(src_dir, "events_000.parquet"))
    stream = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    from terrorblade_spark.tables import normalize_ts

    # short gap/watermark relative to the fixture's time span so
    # sessions finalize and evict WITHIN the replay (steady state),
    # instead of all state survival to the end (backlog drain)
    agg = session_aggregate(normalize_ts(stream), gap="5 minutes", watermark="10 minutes")

    with tempfile.TemporaryDirectory() as tmp:
        q = (
            agg.writeStream.format("noop")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "cp"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        batches = []
        seen = set()
        deadline = time.time() + 600
        while len(batches) < n_batches and time.time() < deadline:
            time.sleep(0.3)
            for p in q.recentProgress:
                bid = p["batchId"]
                if bid in seen or p["numInputRows"] == 0:
                    continue
                seen.add(bid)
                st = (p.get("stateOperators") or [{}])[0]
                batches.append(
                    {
                        "batch": bid,
                        "input_rows": p["numInputRows"],
                        "batch_ms": p["batchDuration"],
                        "state_rows": st.get("numRowsTotal"),
                        "state_bytes": st.get("memoryUsedBytes"),
                        "evicted_rows": st.get("numRowsRemoved"),
                    }
                )
        q.stop()
    batches.sort(key=lambda b: b["batch"])
    lat = [b["batch_ms"] for b in batches]
    return {
        "store": store,
        "batches": len(batches),
        "batch_ms_first": lat[0] if lat else None,
        "batch_ms_median": sorted(lat)[len(lat) // 2] if lat else None,
        "batch_ms_max_after_first": max(lat[1:]) if len(lat) > 1 else None,
        "state_rows_peak": max((b["state_rows"] or 0) for b in batches),
        "state_rows_final": batches[-1]["state_rows"] if batches else None,
        "total_evicted": sum(b["evicted_rows"] or 0 for b in batches),
        "per_batch": batches,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--store", choices=["default", "rocksdb", "both"], default="both")
    args = ap.parse_args()

    from terrorblade_spark.session import get_spark

    spark = get_spark("streaming-steady-probe")
    stores = ["default", "rocksdb"] if args.store == "both" else [args.store]
    with tempfile.TemporaryDirectory() as src:
        split_events(spark, args.sf_dir, src, args.batches)
        for store in stores:
            out = run_stream(spark, src, store, args.batches)
            detail = out.pop("per_batch")
            for b in detail:
                print(f"# {store} {b}", file=sys.stderr)
            print(json.dumps(out))


if __name__ == "__main__":
    main()
