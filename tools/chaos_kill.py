#!/usr/bin/env python
"""Executor-loss fault-tolerance evidence (round 4).

The north rule's resume story has two layers: job-internal task retry
(Spark's own lineage — a lost executor's tasks re-run elsewhere) and
pipeline-level checkpoint resume (lineage.py bucket commits, already
E2E-tested). This tool exercises the FIRST layer through the real
executor boundary that local[N] threads cannot provide:

  1. run the full extraction aggregate once on local-cluster[4,1]
     undisturbed → reference counts;
  2. run it again, and ~25% in, SIGKILL one executor JVM (a real
     CoarseGrainedExecutorBackend process, found via ps);
  3. the standalone master relaunches the executor, the lost tasks
     retry, the job completes — and every count (turns, chars, spans)
     must equal the undisturbed run byte-for-byte.

Prints ONE JSON line. A wrong count or a job failure exits nonzero.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from documentai_ocr_spark.extract import extract_turns  # noqa: E402
from documentai_ocr_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_SF_TAG = SF_DIR.strip("/").replace("/", "_")
INPUT = f"/tmp/spark_graft_bench/{_SF_TAG}_t192_scaling.parquet"
ZIP_PATH = "/tmp/documentai_ocr_spark_bench.zip"


def _build_zip() -> None:
    import zipfile

    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with zipfile.ZipFile(ZIP_PATH, "w") as zf:
        for root, _d, files in os.walk(
            os.path.join(pkg_root, "documentai_ocr_spark")
        ):
            if "__pycache__" in root:
                continue
            for fn in files:
                full = os.path.join(root, fn)
                zf.write(full, os.path.relpath(full, pkg_root))


def _executor_pids() -> list[int]:
    out = subprocess.run(
        ["ps", "-eo", "pid,args"], capture_output=True, text=True
    ).stdout
    pids = []
    for ln in out.splitlines():
        if "CoarseGrainedExecutorBackend" in ln:
            pids.append(int(ln.strip().split()[0]))
    return pids


def _run(kill_one: bool) -> dict:
    s = get_spark(
        app_name=f"chaos-{'kill' if kill_one else 'ref'}",
        cores=4,
        shuffle_partitions=8,
        master="local-cluster[4,1,2560]",
        extra={
            "spark.executor.memory": "2g",
            "spark.sql.files.maxPartitionBytes": "4m",
            "spark.sql.files.openCostInBytes": "1m",
        },
    )
    s.sparkContext.addPyFile(ZIP_PATH)
    killed = {"pid": None}
    if kill_one:

        def assassin():
            # let the job get ~25% in, then kill a real executor JVM
            time.sleep(8)
            pids = _executor_pids()
            if pids:
                killed["pid"] = pids[0]
                os.kill(pids[0], signal.SIGKILL)

        t = threading.Thread(target=assassin, daemon=True)
        t.start()
    ext = extract_turns(s.read.parquet(INPUT))
    row = ext.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("text")).alias("chars"),
        F.sum("n_spans").alias("spans"),
    ).collect()[0]
    s.stop()
    time.sleep(2)
    return {
        "turns": int(row["n"]),
        "chars": int(row["chars"]),
        "spans": int(row["spans"]),
        "killed_pid": killed["pid"] if kill_one else None,
    }


def main() -> int:
    if not os.path.exists(os.path.join(INPUT, "_SUCCESS")):
        print(
            json.dumps({"error": f"scale input missing: {INPUT} — run "
                        "bench.py once to build it"}),
        )
        return 2
    _build_zip()
    ref = _run(kill_one=False)
    chaos = _run(kill_one=True)
    ok = (
        chaos["killed_pid"] is not None
        and ref["turns"] == chaos["turns"]
        and ref["chars"] == chaos["chars"]
        and ref["spans"] == chaos["spans"]
    )
    print(
        json.dumps(
            {
                "metric": "executor_kill_recovery",
                "reference": ref,
                "with_executor_killed": chaos,
                "counts_identical": ok,
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
