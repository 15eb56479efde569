"""Measure this box's UNLOADED bench-calibration floor once and write
it to BENCH_CALIB.json beside bench.py.

Why: bench.py's run-relative p25 calib floor adjudicates PER-QUERY load
spikes, but load sustained across the whole run inflates every sample
together and the relative floor rises with them (the round-8 judge
demonstrated it live: loadavg 17 lifted the floor 0.371 -> 0.444 with
`load_flagged` silent). The committed absolute floor is the anchor the
run-relative floor is compared against: bench emits `run_flagged: true`
when its own floor exceeds this by the flag ratio.

Run ON AN IDLE BOX (the tool refuses if loadavg says otherwise, unless
--force): `python tools/calibrate_bench_floor.py`. Re-run only when the
box changes (cpu count / JVM / CALIB_ROWS); the file records enough
context to detect staleness (bench.py ignores it if calib_rows drift).
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CALIB_ROWS, _loadavg, _make_calib  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=40)
    ap.add_argument(
        "--force", action="store_true", help="calibrate even under load (NOT advised)"
    )
    args = ap.parse_args()

    ncpu = os.cpu_count() or 1
    load0 = _loadavg()
    if load0 > ncpu / 8 and not args.force:
        raise SystemExit(
            f"loadavg {load0:.1f} > cpus/8 ({ncpu / 8:.0f}) — the box is not idle; "
            f"an inflated committed floor would blind run_flagged forever. "
            f"Wait for idle or pass --force."
        )

    from terrorblade_spark.session import get_spark

    spark = get_spark("calibrate-bench-floor")
    calib = _make_calib(spark)
    for _ in range(3):  # untimed: probe's own first-touch JIT
        calib()
    samples = [calib() for _ in range(args.samples)]
    load1 = _loadavg()
    samples_sorted = sorted(samples)
    p25 = samples_sorted[len(samples_sorted) // 4]
    med = samples_sorted[len(samples_sorted) // 2]

    out = {
        "calib_floor_unloaded": round(p25, 3),
        "calib_median_unloaded": round(med, 3),
        "calib_rows": CALIB_ROWS,
        "samples": args.samples,
        "cpus": ncpu,
        "loadavg": {"start": round(load0, 2), "end": round(load1, 2)},
        "measured_utc": datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%SZ"
        ),
        "note": (
            "absolute anchor for bench.py run_flagged; re-measure on an idle box "
            "if cpus or CALIB_ROWS change"
        ),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_CALIB.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
