"""Where do q47/q57's availableNow drains spend their time? (r10
verdict task 4.)

Runs each streaming pipeline once untimed (JIT/compile warm), then
once timed, and dumps every micro-batch's StreamingQueryProgress
durationMs breakdown (queryPlanning / getBatch / addBatch / walCommit /
commitOffsets / triggerExecution) plus the state-operator commit
metrics. If the wall lives in addBatch (the actual stateful
computation) the cost is the plan; if it lives in walCommit/
commitOffsets/queryPlanning it is Structured Streaming engine fixed
cost that no operator reshape can remove without changing what the
query measures.

Usage: python tools/streaming_phase_probe_r11.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def drain_with_progress(spark, sf_dir, which: str):
    """Same drains, but started inline so recentProgress is readable."""
    from terrorblade_spark.streaming.pipeline import (
        _state_partitions,
        session_aggregate,
        stateful_session_counts,
        stream_events,
    )

    t0 = time.perf_counter()
    with _state_partitions(spark, 8):
        if which == "q47":
            plan = session_aggregate(stream_events(spark, sf_dir), gap="30 minutes")
            name = "probe_q47"
        else:
            plan = stateful_session_counts(spark, sf_dir, gap_s=1800)
            name = "probe_q57"
        q = (
            plan.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete" if which == "q47" else "update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    wall = time.perf_counter() - t0
    out = []
    for p in q.recentProgress:
        j = json.loads(p.json) if hasattr(p, "json") else p
        out.append(
            {
                "batchId": j.get("batchId"),
                "numInputRows": j.get("numInputRows"),
                "durationMs": j.get("durationMs"),
                "stateOperators": [
                    {
                        k: so.get(k)
                        for k in (
                            "operatorName",
                            "commitTimeMs",
                            "numRowsTotal",
                            "numShufflePartitions",
                        )
                    }
                    for so in j.get("stateOperators", [])
                ],
            }
        )
    spark.catalog.dropTempView(name)
    return wall, out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from terrorblade_spark.session import get_spark

    spark = get_spark("streaming-phase-probe")
    for which in ("q47", "q57"):
        drain_with_progress(spark, sf_dir, which)  # untimed warm pass
        wall, prog = drain_with_progress(spark, sf_dir, which)
        tot_trigger = sum(
            (p["durationMs"] or {}).get("triggerExecution", 0) for p in prog
        )
        print(
            json.dumps(
                {
                    "which": which,
                    "wall_s": round(wall, 3),
                    "n_batches": len(prog),
                    "sum_triggerExecution_ms": tot_trigger,
                    "batches": prog,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
