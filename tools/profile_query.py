"""Per-query job/stage breakdown via the Spark event log (guide §1/§7):
runs one declared query (warmup + timed, like bench.py) with the event
log on, then prints each job of the timed run with its stages' wall,
task-time sum, and max task.

Usage: python tools/profile_query.py <query> [sf_dir]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/spark-events-pq"


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    os.makedirs(EVDIR, exist_ok=True)
    for f in glob.glob(f"{EVDIR}/*"):
        os.remove(f)

    import __spark_entry__ as entry_mod
    from aida_spark.session import get_spark

    spark = get_spark(
        "profile-query",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.driver.memory": "16g",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
            "spark.eventLog.dir": EVDIR,
            "spark.ui.showConsoleProgress": "false",
        },
    )
    qfns = entry_mod.queries()
    warm = qfns[name](spark, sf_dir)
    warm.count()
    warm.unpersist()
    spark.sparkContext._jvm.System.gc()
    spark.sparkContext.setJobDescription(f"TIMED:{name}")
    t0 = time.time()
    timed = qfns[name](spark, sf_dir)
    timed.count()
    wall = time.time() - t0
    timed.unpersist()
    spark.sparkContext.setJobDescription(None)
    app = spark.sparkContext.applicationId
    spark.stop()
    print(f"{name}: {wall:.3f}s   (timed region)")

    stages, jobs, tt = {}, {}, {}
    with open(glob.glob(f"{EVDIR}/*{app}*")[0]) as fh:
        for line in fh:
            e = json.loads(line)
            t = e.get("Event")
            if t == "SparkListenerJobStart":
                jobs[e["Job ID"]] = {
                    "desc": e.get("Properties", {}).get(
                        "spark.job.description", ""
                    ),
                    "stages": [s["Stage ID"] for s in e["Stage Infos"]],
                    "t0": e["Submission Time"],
                }
            elif t == "SparkListenerJobEnd":
                if e["Job ID"] in jobs:
                    jobs[e["Job ID"]]["t1"] = e["Completion Time"]
            elif t == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:50],
                    "tasks": si["Number of Tasks"],
                    "t0": si.get("Submission Time", 0),
                    "t1": si.get("Completion Time", 0),
                }
            elif t == "SparkListenerTaskEnd":
                m = e.get("Task Metrics") or {}
                d = tt.setdefault(e["Stage ID"], {"run": 0, "max": 0, "n": 0})
                rt = m.get("Executor Run Time", 0)
                d["run"] += rt
                d["max"] = max(d["max"], rt)
                d["n"] += 1

    prev_end = None
    for jid in sorted(jobs):
        j = jobs[jid]
        if not j["desc"].startswith("TIMED:"):
            continue
        gap = "" if prev_end is None else f" (+{(j['t0']-prev_end)/1000:.2f}s gap)"
        prev_end = j.get("t1", j["t0"])
        print(f"job {jid}: wall={(j.get('t1',0)-j['t0'])/1000:6.2f}s{gap}")
        for sid in sorted(j["stages"]):
            s, d = stages.get(sid), tt.get(sid)
            if s and d:
                print(
                    f"   st{sid:4d}: {s['tasks']:4d}t wall="
                    f"{(s['t1']-s['t0'])/1000:6.2f}s sum={d['run']/1000:6.1f}s"
                    f" max={d['max']/1000:5.2f}s  {s['name']}"
                )


if __name__ == "__main__":
    main()
