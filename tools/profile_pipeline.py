"""Round-6 profiling: one warm kg-pipeline iteration with the Spark
event log on, then a per-stage duration report attributed to phases via
job descriptions. Not part of the bench contract."""

from __future__ import annotations

import glob
import io
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    logdir = "/tmp/ghs_profile_logs"
    os.makedirs(logdir, exist_ok=True)
    for f in glob.glob(logdir + "/*"):
        subprocess.run(["rm", "-rf", f])
    from golden_horse_spark.config import get_spark

    spark = get_spark(
        "profile-pipeline",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": logdir,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    import bench

    pipe = bench.run_pipeline_bench(spark)
    print(json.dumps(pipe), flush=True)
    spark.stop()
    time.sleep(2)

    d = max(glob.glob(logdir + "/*"), key=os.path.getmtime)
    p = glob.glob(d + "/events_*")[0]
    out = subprocess.run(["zstd", "-dc", p], capture_output=True)
    jobs = {}
    stage_to_job = {}
    stages = {}
    for line in io.StringIO(out.stdout.decode()):
        e = json.loads(line)
        ev = e["Event"]
        if ev == "SparkListenerJobStart":
            desc = (e.get("Properties") or {}).get(
                "spark.job.description", ""
            ) or (e.get("Properties") or {}).get("callSite.short", "")
            jobs[e["Job ID"]] = desc
            for sid in e.get("Stage IDs", []):
                stage_to_job[sid] = e["Job ID"]
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            dur = (
                si.get("Completion Time", 0) - si.get("Submission Time", 0)
            ) / 1000
            name = si["Stage Name"].split("\n")[0][:60]
            stages[si["Stage ID"]] = (dur, si["Number of Tasks"], name)
    print("\n== stages >= 0.3s ==")
    for sid in sorted(stages):
        dur, n, name = stages[sid]
        if dur >= 0.3:
            jid = stage_to_job.get(sid)
            print(f"stage {sid:4d} {dur:6.2f}s tasks={n:4d} "
                  f"job={jid} [{jobs.get(jid, '')[:50]}] {name}")
    total = sum(d for d, _, _ in stages.values())
    print(f"total stage time {total:.1f}s over {len(stages)} stages")


if __name__ == "__main__":
    main()
