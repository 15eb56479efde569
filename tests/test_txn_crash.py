"""Crash-injection tests for the transactional tables: a writer
process is SIGKILLed at the manifest-swap boundary (data files fully
written, manifest NOT linked) and the table must behave as if the
commit never happened — old snapshot readable, a retry converges, and
vacuum reclaims the orphaned data directory.

The kill is a real process death (os.kill SIGKILL from inside a
subprocess), not an exception: nothing in the writer gets a chance to
clean up, which is exactly the durability claim the manifest-swap
design makes. The crash point is injected by monkeypatching
TxnTable._commit in the SUBPROCESS (after _write_data has run), so
every code path that publishes state — append, replace_partitions, the
sketch txn folds — dies at its own swap boundary.

One subprocess per scenario (each needs its own Spark JVM, ~20 s); the
parent session then verifies the table with the shared fixture.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys

from terrorblade_spark.txn import TxnTable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The subprocess: patches _commit to die by SIGKILL (before the tmp
# write for crash_point=pre_manifest, after it for mid_manifest), then
# runs one writer scenario against the table path in argv.
_CRASH_WRITER = r"""
import os, signal, sys
sys.path.insert(0, sys.argv[4])
from terrorblade_spark import txn as T
from terrorblade_spark.session import get_spark

scenario, path, crash_point = sys.argv[1], sys.argv[2], sys.argv[3]

_orig = T.TxnTable._commit
def crashing_commit(self, manifest):
    if crash_point == "mid_manifest":
        # reproduce the tmp-file write, then die before the link
        os.makedirs(self._log, exist_ok=True)
        with open(os.path.join(self._log, ".tmp.crashed"), "w") as fh:
            fh.write(manifest.to_json())
    os.kill(os.getpid(), signal.SIGKILL)
T.TxnTable._commit = crashing_commit

spark = get_spark("crash-writer")
t = T.TxnTable(path)
if scenario == "append":
    t.append(spark.createDataFrame([(100, 1000), (101, 1010)], "k long, v long"))
elif scenario == "replace":
    t.replace_partitions(
        spark.createDataFrame([(7, 1, 70)], "k long, p long, v long"), "p"
    )
elif scenario == "fold":
    from terrorblade_spark.operators.sketches import quantile_sketch_update_txn
    batch = spark.createDataFrame(
        [(i, float(i)) for i in range(200, 300)], "id long, v double"
    )
    quantile_sketch_update_txn(t, batch, "v", "id", k=32, applied_id="batch-2")
raise SystemExit(f"writer survived past the crash point: {scenario}")
"""


def _run_crashed_writer(tmp_path, scenario: str, table_path: str, crash_point="pre_manifest"):
    script = tmp_path / "crash_writer.py"
    script.write_text(_CRASH_WRITER)
    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    proc = subprocess.run(
        [sys.executable, str(script), scenario, table_path, crash_point, REPO],
        capture_output=True,
        timeout=300,
        env=env,
    )
    # SIGKILL -> negative returncode; anything else means the writer
    # survived to publish state (the test premise is broken)
    assert proc.returncode == -signal.SIGKILL, (
        proc.returncode,
        proc.stdout[-500:],
        proc.stderr[-500:],
    )


def _data_dirs(path: str) -> set[str]:
    root = os.path.join(path, "data")
    return set(os.listdir(root)) if os.path.isdir(root) else set()


def test_append_crash_between_data_and_manifest(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"))
    v0 = t.latest().version
    dirs0 = _data_dirs(t.path)

    _run_crashed_writer(tmp_path, "append", t.path)

    # no partial state visible: same version, same rows
    assert t.latest().version == v0
    assert sorted(r["k"] for r in t.read(spark).collect()) == [1, 2]
    # the dead writer's data files are on disk but unreferenced
    orphans = _data_dirs(t.path) - dirs0
    assert orphans, "crash writer should have left an orphan data dir"

    # a retry of the same logical write converges
    t.append(spark.createDataFrame([(100, 1000), (101, 1010)], "k long, v long"))
    assert sorted(r["k"] for r in t.read(spark).collect()) == [1, 2, 100, 101]

    # vacuum with age guard 0 reclaims the orphan, never the live dirs
    t.vacuum(retain_versions=1, min_age_s=0)
    left = _data_dirs(t.path)
    assert not (left & orphans)
    assert sorted(r["k"] for r in t.read(spark).collect()) == [1, 2, 100, 101]


def test_replace_partitions_crash_keeps_old_partitions(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    sch = "k long, p long, v long"
    t.overwrite(
        spark.createDataFrame([(1, 1, 10), (2, 2, 20)], sch), partition_col="p"
    )
    v0 = t.latest().version

    _run_crashed_writer(tmp_path, "replace", t.path, crash_point="mid_manifest")

    # old partition content intact, orphan tmp manifest present
    assert t.latest().version == v0
    assert sorted(r["v"] for r in t.read(spark).collect()) == [10, 20]
    log_dir = t._log
    assert any(n.startswith(".tmp.") for n in os.listdir(log_dir))

    # retry converges: p=1 replaced, p=2 untouched
    t.replace_partitions(spark.createDataFrame([(7, 1, 70)], sch), "p")
    assert sorted(r["v"] for r in t.read(spark).collect()) == [20, 70]

    # vacuum clears both the orphan data dir and the stale tmp manifest
    t.vacuum(retain_versions=1, min_age_s=0, tmp_age_floor_s=0)
    assert not any(n.startswith(".tmp.") for n in os.listdir(log_dir))
    assert sorted(r["v"] for r in t.read(spark).collect()) == [20, 70]


def test_sketch_fold_crash_then_exactly_once_retry(spark, tmp_path):
    from terrorblade_spark.operators.sketches import (
        quantile_sketch_estimate,
        quantile_sketch_update_txn,
    )

    t = TxnTable(str(tmp_path / "t"))
    batch1 = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "id long, v double"
    )
    quantile_sketch_update_txn(t, batch1, "v", "id", k=32, applied_id="batch-1")
    v0 = t.latest().version
    before = quantile_sketch_estimate(t.read(spark), [0.5]).collect()[0][0]

    _run_crashed_writer(tmp_path, "fold", t.path)

    # the half-folded batch is invisible
    assert t.latest().version == v0
    assert "batch-2" not in t.latest().applied_ids
    assert quantile_sketch_estimate(t.read(spark), [0.5]).collect()[0][0] == before

    # retry with the same applied_id lands the fold exactly once
    batch2 = spark.createDataFrame(
        [(i, float(i)) for i in range(200, 300)], "id long, v double"
    )
    quantile_sketch_update_txn(t, batch2, "v", "id", k=32, applied_id="batch-2")
    assert "batch-2" in t.latest().applied_ids
    after = quantile_sketch_estimate(t.read(spark), [0.5]).collect()[0][0]
    assert after > before  # the 200..299 values shifted the median up
    # a replayed fold of the same batch is a no-op
    quantile_sketch_update_txn(t, batch2, "v", "id", k=32, applied_id="batch-2")
    assert quantile_sketch_estimate(t.read(spark), [0.5]).collect()[0][0] == after
