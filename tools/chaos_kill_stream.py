#!/usr/bin/env python
"""Executor-loss chaos for a STREAMING stateful maintainer (round-5
verdict item 8).

tools/chaos_kill.py proves batch-job recovery; this tool proves the
streaming layer's claim — "idempotent per-batch overwrite" — under
REAL process loss: an executor JVM is SIGKILLed mid-drain of the
stream_slo_burn maintainer (foreachBatch → per-batch_id dynamic
partition overwrite, checkpointed batch ids). The standalone master
relaunches the executor, the lost tasks retry, a half-written batch
partition is replaced by its retry, the checkpoint advances — and the
final persisted state table must equal the batch query q_slo_burn on
the same corpus ROW-FOR-ROW (the same parity the undisturbed pytest
pins at sf0.001, now through a process-loss window at sf0.1).

Prints ONE JSON line. State≠batch, no kill landing, or a hung drain
exits nonzero.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from documentai_ocr_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/spark_graft_chaos_stream"
ZIP_PATH = "/tmp/documentai_ocr_spark_chaos_stream.zip"


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
    return [
        int(ln.strip().split()[0])
        for ln in out.splitlines()
        if "CoarseGrainedExecutorBackend" in ln
    ]


def main() -> int:
    _build_zip()
    shutil.rmtree(WORK, ignore_errors=True)
    ind = f"{WORK}/in"
    out = f"{WORK}/out"
    ckpt = f"{WORK}/ckpt"

    s = get_spark(
        app_name="chaos-stream",
        cores=4,
        shuffle_partitions=8,
        master="local-cluster[4,1,2560]",
        extra={
            "spark.executor.memory": "2g",
            "spark.sql.files.maxPartitionBytes": "4m",
        },
    )
    s.sparkContext.addPyFile(ZIP_PATH)

    from documentai_ocr_spark.queries.relational import q_slo_burn
    from documentai_ocr_spark.streaming import (
        extract_stream_writer,
        slo_burn_read_current,
        stream_slo_burn,
    )

    ev = s.read.parquet(f"{SF_DIR}/events.parquet")
    # many small files → many micro-batches → a wide kill window
    ev.repartition(40).write.parquet(ind)

    src = (
        s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(ind)
    )
    killed = {"pid": None, "t": None}

    def assassin():
        time.sleep(10)  # let several micro-batches commit first
        pids = _executor_pids()
        if pids:
            killed["pid"] = pids[0]
            killed["t"] = round(time.time() - t0, 1)
            os.kill(pids[0], signal.SIGKILL)

    t = threading.Thread(target=assassin, daemon=True)
    t0 = time.time()
    t.start()
    q = (
        extract_stream_writer(src, stream_slo_burn(s, out))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(600)
    wall = round(time.time() - t0, 1)

    got = sorted(tuple(r) for r in slo_burn_read_current(s, out).collect())
    want = sorted(tuple(r) for r in q_slo_burn(s, SF_DIR).collect())
    n_batches = (
        s.read.parquet(f"{out}/slo").select("batch_id").distinct().count()
    )
    s.stop()

    ok = (
        finished
        and killed["pid"] is not None
        and len(got) > 0
        and got == want
    )
    print(
        json.dumps(
            {
                "metric": "streaming_executor_kill_recovery",
                "maintainer": "stream_slo_burn",
                "drain_finished": bool(finished),
                "killed_pid": killed["pid"],
                "killed_at_sec": killed["t"],
                "wall_sec": wall,
                "micro_batches_committed": int(n_batches),
                "state_rows": len(got),
                "state_equals_batch": got == want,
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
