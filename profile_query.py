"""Per-query Spark job profiler (guide §1: measure first).

Runs one registry query at $SPARK_GRAFT_SF_DIR with event logging on,
then parses the event log to print per-job wall time with the job's
callsite/description — the local[] stand-in for the Spark UI's Jobs
page. Usage:

    python profile_query.py ingest_hnsw_index_search [repeat]

The first run of the process pays JVM/codegen warmup; pass repeat=2+
to see the steady-state number the bench measures (bench.py warms the
session before timing).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def main() -> None:
    name = sys.argv[1]
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = tempfile.mkdtemp(prefix="spark_events_")

    from image_indexing_and_retrival_with_qdrant_spark.registry import REGISTRY
    from image_indexing_and_retrival_with_qdrant_spark.session import get_spark

    spark = get_spark(
        app_name=f"profile_{name}",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    # the bench's warmup discipline: one flagship query to spin up
    # JVM/codegen/python workers so the profile shows steady state
    REGISTRY["knn_dense_top5"].builder(spark, sf_dir).collect()

    import re

    from bench import SMALL_RESULT, materialize

    for i in range(repeat):
        marker = f"__PROFILE_{i}__"
        spark.sparkContext.setJobDescription(marker)
        t0 = time.perf_counter()
        materialize(REGISTRY[name].builder(spark, sf_dir), name)
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        print(f"RUN {i}: {dt:.3f}s", flush=True)
    spark.stop()

    # parse the event log: job timing + description
    logs = []
    for root, _dirs, files in os.walk(evdir):
        for f in files:
            p = os.path.join(root, f)
            if (not f.startswith(".") and "appstatus" not in f
                    and os.path.isfile(p)):
                logs.append(p)
    jobs = {}
    stages = {}
    for lf in logs:
        with open(lf) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    props = ev.get("Properties") or {}
                    jobs[jid] = {
                        "start": ev["Submission Time"],
                        "desc": props.get("spark.job.description")
                        or props.get("callSite.short", ""),
                        "callsite": props.get("callSite.short", ""),
                        "stages": [s["Stage ID"] for s in
                                   ev.get("Stage Infos", [])],
                    }
                elif e == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in jobs:
                        jobs[jid]["end"] = ev["Completion Time"]
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    stages[si["Stage ID"]] = {
                        "name": si["Stage Name"],
                        "tasks": si["Number of Tasks"],
                        "ms": (si.get("Completion Time", 0)
                               - si.get("Submission Time", 0)),
                    }
    total = 0.0
    for jid in sorted(jobs):
        j = jobs[jid]
        if "end" not in j:
            continue
        ms = j["end"] - j["start"]
        total += ms
        stage_str = "; ".join(
            f"{stages[s]['name'].split(chr(10))[0][:120]}"
            f"[{stages[s]['tasks']}t {stages[s]['ms']}ms]"
            for s in j["stages"] if s in stages)
        print(f"job {jid:3d} {ms:6d}ms  {j['desc'][:30]:30s} {stage_str}")
    print(f"sum of job wall times: {total/1000:.3f}s "
          "(driver-side gaps not included)")
    print(f"event log dir kept: {evdir}")


if __name__ == "__main__":
    main()
