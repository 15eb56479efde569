"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints TWO JSON lines on stdout —
a full-detail line first, then a COMPACT summary line LAST:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

The summary line carries per-query MEDIANS only (floats, no calib
detail) so it stays well under 2000 bytes: the driver records only the
last 2000 bytes of stdout, and round 8's single fat line lost its own
head (BENCH_r08.json `parsed: null`) when the calibration fields grew
it to ~2.9 KB. Per-query calib/min/load detail lives on the FIRST line
(metric "headline_queries_detail") and in the stderr log.

Self-adjudicating timings: each headline query runs REPEATS (3) timed
passes after the untimed compile-warm pass, and the per-query entry
carries {"median", "min"} — a single-shot timing on a shared box cannot
distinguish a real plan regression from load, so the artifact carries
its own error bars (the round-5 judge burned a session proving a 1.5x
driver reading was box noise). "value" is the sum of medians; "min" is
the load-floor estimate. Caches are cleared between repeats so every
pass re-reads data and rebuilds its persisted relations (data-cold,
compile-warm — the cost that extrapolates to a long-running cluster).

Load adjudication (round 8 — BENCH_r07 recorded a false 2.2x
regression from box load that burned a judge session to disprove;
median-of-3 cannot defend against load SUSTAINED across all repeats):
a fixed-work calibration probe (a constant md5-fold over
``spark.range`` — no data read, no cache interaction) runs immediately
before every timed repeat, and ``/proc/loadavg`` is sampled per query.
Each per-query entry carries {"median","min","calib","calib_max",
"load"} (calib samples bracket every repeat — one before each plus one
trailing, so load arriving mid-query is still seen); the
top level carries ``calib_floor`` (25th percentile of all calib
samples — the box's unloaded capability), ``load_flagged`` (queries
whose calib median exceeded CALIB_FLAG_RATIO x floor, or whose worst
sample exceeded 2x that: their timings were taken under measured
external load and must not be read as regressions),
and ``loadavg``. A flagged query's numbers answer "what did the box
do", not "what does the plan cost" — compare against the previous
round's UNFLAGGED medians only.

Whole-run flag (round 9 — the round-8 judge demonstrated the blind
spot live: under loadavg 17 every calib sample inflated TOGETHER, the
p25 floor rose 0.371 -> 0.444, and per-query flagging stayed silent
because each query's calib median matched the inflated floor): the
run-relative floor cannot see load that covers the whole run. The fix
is an ABSOLUTE anchor: ``BENCH_CALIB.json`` (committed beside
BASELINE.md, measured once per box by ``tools/calibrate_bench_floor.py``
on an idle box) stores the unloaded calib floor; the summary carries
``run_flagged: true`` when this run's floor exceeds the committed
unloaded floor by CALIB_FLAG_RATIO, or when start/end loadavg exceeds
cpus/2 — either way, EVERY timing in the run was taken under sustained
external load and the total must not be read as a regression.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",
    "q03_top_revenue_orders",
    "q08_top_customer_per_nation",
    "q19_session_assignment",
    "q20_session_stats",
    "q24_long_session_mining",
    "q33_minhash_lsh_pairs",
    "q34_ngram_jaccard",
    # after q33/q34: shares their md5/shingle machinery, so the suite's
    # residual first-touch JIT lands on the longer queries
    "q31_exact_dedup",
    "q36_cosine_topk",
    "q38_knn_join",
    "q43_semantic_groups",
    "q47_streaming_sessions",
    "q48_media_profile",
    "q53_ivf_ann_topk",
    "q63_corpus_shuffle",
    "q64_embedding_quantize",
    # production serving shape: loads the PERSISTED term-bucketed BM25
    # index (built untimed on the dry pass) and serves one top-k
    "q71_bm25_persisted_topk",
    # temporal operator classes (round 5): union+window as-of join and
    # the sequence()-grid resample — no join in the asof plan at all
    "q72_asof_view_before_purchase",
    "q76_hourly_resample",
    # iterative graph class (round-5 close): 10 Pregel-style supersteps
    # over the persisted src-partitioned edge relation
    "q104_nation_trade_pagerank",
]

# calibration probe sizing: fixed JVM-side work (md5 fold over a
# constant range — deterministic, reads nothing, caches nothing) taking
# ~0.6 s unloaded (±8% measured spread), so 4 probes/query add ~50 s of
# wall while resolving competing load well below the 1.5x flag ratio
CALIB_ROWS = 3_000_000
CALIB_FLAG_RATIO = float(os.environ.get("SPARK_GRAFT_CALIB_FLAG_RATIO", "1.5"))
CALIB_ABS_FLOOR_S = 0.1  # ignore ratio blips on a sub-100ms spread


def _loadavg() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except OSError:  # pragma: no cover - non-Linux fallback
        return -1.0


def _make_calib(spark):
    """Fixed-work probe. Each call mints a FRESH DataFrame with
    IDENTICAL expression text: re-collecting the same DataFrame object
    skips its already-computed shuffle stage (~60 ms regardless of
    size, measured — it would read "unloaded" under any load), while a
    fresh plan re-executes fully; identical text keeps the codegen
    cache warm so Janino/C2 recompilation doesn't jitter the samples
    (salted literals measured ±35% spread; identical text ±10%)."""
    from pyspark.sql import functions as F

    def run() -> float:
        plan = spark.range(0, CALIB_ROWS, 1, 8).select(
            F.sum(
                F.conv(
                    F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10
                ).cast("long")
                % F.lit(1_000_003)  # ANSI long-sum overflow guard
            ).alias("s")
        )
        t0 = time.perf_counter()
        plan.collect()
        return time.perf_counter() - t0

    return run


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from terrorblade_spark.registry import get_queries
    from terrorblade_spark.session import get_spark

    spark = get_spark("bench")
    queries = get_queries()

    # Warm the JVM (not timed): first execution of md5 / regex / explode /
    # collect_list machinery pays ~3 s of classloading + C2 JIT in a fresh
    # JVM regardless of which query triggers it (measured: the identical
    # plan re-run drops 3.8 s -> 0.85 s, and interpreted mode shows the
    # same cliff, so it is not Janino codegen). Exercising those paths
    # over the tiny region table keeps the per-query timings about the
    # queries, not about who ran first.
    from pyspark.sql import functions as F

    warm = spark.read.parquet(f"{sf_dir}/region.parquet")
    hashed = (
        warm.select(
            "r_regionkey",
            F.conv(F.substring(F.md5(F.col("r_name")), 1, 15), 16, 10).cast("long").alias("h"),
            F.trim(F.regexp_replace(F.lower("r_name"), "[\\s]+", " ")).alias("t"),
            # higher-order-function lambda machinery (transform/zip_with/
            # aggregate) is its own first-touch cost center
            F.aggregate(
                F.zip_with(
                    F.transform(F.split("r_name", ""), lambda c: F.lit(1)),
                    F.transform(F.split("r_name", ""), lambda c: F.lit(1)),
                    lambda a, b: a + b,
                ),
                F.lit(0),
                lambda acc, v: acc + v,
            ).alias("z"),
            F.explode(F.array(F.lit(1), F.lit(2))).alias("e"),
        )
        .persist()  # block-manager/MemoryStore path
    )
    hashed.count()
    a, b = hashed.alias("a"), hashed.alias("b")
    (
        a.join(b, "e")  # shuffle join + distinct machinery
        .select(F.col("a.h").alias("h"), F.col("a.e").alias("e"))
        .distinct()
        .groupBy("e")
        .agg(F.sort_array(F.collect_list("h")).alias("hs"), F.count(F.lit(1)).alias("n"))
        .orderBy("e")
        .count()
    )
    hashed.unpersist()

    # the fused pair-expansion shapes (collect_list of structs +
    # sort_array, transform-with-index lambdas, slice/flatten) carry
    # their own ~2.5 s codegen first-touch (measured q34: 3.9 s first
    # vs 1.4 s repeat) — exercise them over region, untimed
    ms = (
        warm.select(F.lit(1).alias("g"), F.struct(F.lit("x").alias("b"), F.col("r_regionkey").alias("doc")).alias("m"))
        .groupBy("g")
        .agg(F.sort_array(F.collect_list("m")).alias("ms"))
    )
    n_ms = F.size("ms")
    pair_arrays = F.transform(
        F.col("ms"),
        lambda x, i: F.transform(
            F.filter(
                F.slice("ms", i + 2, F.greatest(n_ms - i - 1, F.lit(0))),
                lambda y: y["b"] == x["b"],
            ),
            lambda y: F.struct(x["doc"].alias("id_a"), y["doc"].alias("id_b")),
        ),
    )
    (
        ms.select(F.explode(F.flatten(pair_arrays)).alias("p"))
        .groupBy("p.id_a")
        .agg(F.count(F.lit(1)).alias("n"))
        .count()
    )

    # Structured Streaming machinery (micro-batch engine, state store,
    # session_window) has its own ~2 s first-touch, separate from the
    # batch paths above (measured: q47 3.5 s in a fresh JVM vs 1.3 s
    # warm). Drain a 2-row stream through the same operators, untimed.
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        warm_src = f"{tmp}/src"
        spark.createDataFrame(
            [(1, "2024-01-01 00:00:00", 1.0), (1, "2024-01-01 00:05:00", 2.0)],
            "user_id long, ts_s string, value double",
        ).select(
            "user_id", F.to_timestamp("ts_s").alias("ts"), "value"
        ).coalesce(1).write.parquet(warm_src)
        wstream = (
            spark.readStream.schema("user_id long, ts timestamp, value double")
            .parquet(warm_src)
            .withWatermark("ts", "1 hour")
            .groupBy("user_id", F.session_window("ts", "30 minutes"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        wq = (
            wstream.writeStream.format("memory")
            .queryName("bench_warm_stream")
            .outputMode("complete")
            .option("checkpointLocation", f"{tmp}/cp")
            .trigger(availableNow=True)
            .start()
        )
        wq.awaitTermination()

    # steady-state methodology: one untimed dry pass of every headline
    # query AT THE MEASURED SF, then clear the block-manager caches and
    # time the second pass. The dry pass compiles each query's exact
    # expression trees and AQE-chosen physical plans (plans differ by
    # data size, so a small-SF warm-up cannot fully warm them); the
    # cache clear guarantees the timed pass re-reads data and re-builds
    # its own persisted relations rather than aliasing the dry pass's
    # cache blocks. What's measured is compile-warm, data-cold per-query
    # execution — the cost that extrapolates to a long-running cluster.
    for name in HEADLINE:
        try:
            queries[name](spark, sf_dir).count()
        except Exception as e:  # pragma: no cover - warm-up is best-effort
            print(f"# warm {name} skipped: {e}", file=sys.stderr)
    spark.catalog.clearCache()

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    if repeats < 1:
        raise ValueError(f"SPARK_GRAFT_BENCH_REPEATS must be >= 1, got {repeats}")

    calib = _make_calib(spark)
    for _ in range(3):  # untimed: first-touch JIT of the probe itself
        calib()
    load_start = _loadavg()
    all_calibs: list[float] = []

    def _median(xs: list[float]) -> float:
        s = sorted(xs)
        m = len(s)
        return s[m // 2] if m % 2 else (s[m // 2 - 1] + s[m // 2]) / 2

    timings: dict[str, dict[str, float]] = {}
    for name in HEADLINE:
        fn = queries[name]
        runs: list[float] = []
        calibs: list[float] = []
        load = _loadavg()
        n = -1
        for _ in range(repeats):
            calibs.append(calib())
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        # trailing sample: catches load that arrived DURING the last
        # repeat, which the pre-repeat samples cannot see
        calibs.append(calib())
        all_calibs.extend(calibs)
        med = _median(runs)
        timings[name] = {
            "median": round(med, 3),
            "min": round(min(runs), 3),
            "calib": round(_median(calibs), 3),
            "calib_max": round(max(calibs), 3),
            "load": round(load, 2),
        }
        print(
            f"# {name}: median {med:.3f}s min {min(runs):.3f}s "
            f"calib {_median(calibs):.3f}s load {load:.1f} ({n} rows)",
            file=sys.stderr,
        )

    # floor = 25th percentile, not min: the min of ~90 samples sits
    # ~2.5 sigma below the unloaded mean, which false-flags clean runs
    # at the 1.5x ratio (measured); p25 estimates unloaded capability
    # robustly as long as load doesn't cover >75% of the run (if it
    # does, every query inflates together and the loadavg field is the
    # remaining tell).
    calib_floor = sorted(all_calibs)[len(all_calibs) // 4]
    load_flagged = [
        name
        for name, t in timings.items()
        if (
            t["calib"] > calib_floor * CALIB_FLAG_RATIO
            and t["calib"] - calib_floor > CALIB_ABS_FLOOR_S
        )
        or (
            # a single strong spike (3x floor) means load was present at
            # SOME point in this query's span even if the median held
            t["calib_max"] > calib_floor * 2 * CALIB_FLAG_RATIO
            and t["calib_max"] - calib_floor > CALIB_ABS_FLOOR_S
        )
    ]
    if load_flagged:
        print(
            f"# LOAD-FLAGGED (calib > {CALIB_FLAG_RATIO}x floor "
            f"{calib_floor:.3f}s — timings taken under external load, "
            f"not comparable): {', '.join(load_flagged)}",
            file=sys.stderr,
        )

    total = round(sum(t["median"] for t in timings.values()), 3)
    load_end = _loadavg()
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # whole-run adjudication against the committed per-box unloaded
    # floor (absolute anchor — the run-relative p25 floor inflates with
    # uniform load and stays silent)
    ncpu = os.cpu_count() or 32
    run_flagged = False
    run_flag_why: list[str] = []
    floor_unloaded = None
    calib_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_CALIB.json")
    try:
        with open(calib_path) as f:
            committed = json.load(f)
        if committed.get("calib_rows") == CALIB_ROWS:
            floor_unloaded = float(committed["calib_floor_unloaded"])
    except (OSError, KeyError, ValueError, TypeError):  # uncalibrated/malformed
        pass  # (TypeError: a null calib_floor_unloaded) -> loadavg-only
    if floor_unloaded is not None and calib_floor > floor_unloaded * CALIB_FLAG_RATIO:
        run_flagged = True
        run_flag_why.append(
            f"calib_floor {calib_floor:.3f} > {CALIB_FLAG_RATIO}x unloaded {floor_unloaded:.3f}"
        )
    load_limit = ncpu / 2
    if max(load_start, load_end) > load_limit:
        run_flagged = True
        run_flag_why.append(
            f"loadavg {max(load_start, load_end):.1f} > cpus/2 ({load_limit:.0f})"
        )
    if run_flagged:
        print(
            f"# RUN-FLAGGED (sustained external load for the whole run: "
            f"{'; '.join(run_flag_why)}) — every timing is an upper bound, "
            f"not a plan cost",
            file=sys.stderr,
        )

    # line 1: full detail (may exceed the driver's 2000-byte stdout
    # tail — that's fine, it's for humans/tools reading the whole log)
    print(
        json.dumps(
            {
                "metric": "headline_queries_detail",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "cpus": spark.sparkContext.defaultParallelism,
                "calib_floor": round(calib_floor, 3),
                "calib_floor_unloaded": floor_unloaded,
                "load_flagged": load_flagged,
                "run_flagged": run_flagged,
                "run_flag_why": run_flag_why,
                "loadavg": {"start": round(load_start, 2), "end": round(load_end, 2)},
            }
        )
    )
    # line 2 (LAST): compact summary — per-query medians only. Must fit
    # the driver's 2000-byte stdout tail; hard-raise (not assert, which
    # python -O strips) so a future field can't silently regrow it past
    # the limit. calib_ratio is the machine-readable load-inflation
    # factor (this run's calib floor over the committed unloaded floor)
    # so a verdict can normalize a loaded-box artifact without
    # re-running; null on an uncalibrated box.
    summary = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": {name: t["median"] for name, t in timings.items()},
            "sf": sf_val,
            # effective core count (round 11): the driver re-benches at
            # a lower $SPARK_GRAFT_CPUS to measure scaling, and without
            # this echo it cannot distinguish "env honored but
            # fixed-cost-bound" from "env ignored" (r10 scaling probe
            # fired suspect_cpus_ignored on an honored contract)
            "cpus": spark.sparkContext.defaultParallelism,
            "calib_floor": round(calib_floor, 3),
            "calib_ratio": (
                round(calib_floor / floor_unloaded, 2)
                if floor_unloaded
                else None
            ),
            "load_flagged": load_flagged,
            "run_flagged": run_flagged,
            "loadavg": {"start": round(load_start, 2), "end": round(load_end, 2)},
        }
    )
    if len(summary.encode()) >= 1900:
        raise RuntimeError(
            f"summary line {len(summary.encode())}B would overflow the "
            f"driver's 2000-byte stdout tail"
        )
    print(summary)


if __name__ == "__main__":
    main()
