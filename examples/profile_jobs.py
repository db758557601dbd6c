"""Job-level profiler for registry queries (optimization round 11).

Runs the named registry queries in one warm session with the Spark event
log enabled, then parses the log to attribute wall time to individual
Spark JOBS (job group = query name, description = the rep).  This answers
"where do the seconds of query X go" at a finer grain than bench.py:
every eager materialization (localCheckpoint, count, broadcast build,
noop write) is its own job line.

Usage:  python examples/profile_jobs.py d12_triangle_count d11_pagerank
Env:    SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), PROFILE_REPS.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from dshackle_archive_spark import queries as Q  # noqa: E402
from dshackle_archive_spark.core.checkpoint import release_all_pinned  # noqa: E402
from dshackle_archive_spark.session import ship_package  # noqa: E402

EVDIR = "/tmp/spark-events-profile"


def get_spark_with_eventlog(cpus: str) -> SparkSession:
    os.makedirs(EVDIR, exist_ok=True)
    return (
        SparkSession.builder.appName("profile-jobs")
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(max(32, int(cpus))))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVDIR)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: profile_jobs.py <query> [query...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("PROFILE_REPS", "2"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shutil.rmtree(EVDIR, ignore_errors=True)
    spark = get_spark_with_eventlog(cpus)
    ship_package(spark)
    spark.sparkContext.setLogLevel("ERROR")
    reg = Q.registry()
    data_root = os.path.dirname(sf_dir.rstrip("/"))

    # warmup on the smallest sf (JIT/codegen)
    for n in names:
        spark.sparkContext.setJobGroup("warmup", n)
        reg[n](spark, os.path.join(data_root, "sf0.001")).write.mode(
            "overwrite"
        ).format("noop").save()
        release_all_pinned(spark)

    walls: dict[str, list[float]] = {}
    for n in names:
        walls[n] = []
        for r in range(reps):
            spark.sparkContext.setJobGroup(n, f"{n} rep{r}")
            t0 = time.perf_counter()
            reg[n](spark, sf_dir).write.mode("overwrite").format("noop").save()
            walls[n].append(time.perf_counter() - t0)
            release_all_pinned(spark)
    spark.sparkContext.setJobGroup("tail", "tail")
    spark.stop()

    # parse the event log (Spark 4 rolling layout: a dir of events_* files)
    logs = sorted(glob.glob(os.path.join(EVDIR, "*")), key=os.path.getmtime)
    target = logs[-1]
    if os.path.isdir(target):
        parts = sorted(glob.glob(os.path.join(target, "events_*")))
    else:
        parts = [target]
    jobs: dict[int, dict] = {}
    stage_info: dict[int, dict] = {}
    def _lines():
        for p in parts:
            with open(p) as f:
                yield from f
    if True:
        for line in _lines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                jobs[ev["Job ID"]] = {
                    "group": props.get("spark.jobGroup.id", "?"),
                    "desc": (props.get("spark.job.description") or "")[:110],
                    "callsite": (props.get("callSite.short") or "")[:60],
                    "t0": ev["Submission Time"],
                    "stages": ev.get("Stage IDs", []),
                }
            elif ev.get("Event") == "SparkListenerJobEnd":
                j = jobs.get(ev["Job ID"])
                if j is not None:
                    j["dt"] = (ev["Completion Time"] - j["t0"]) / 1000.0
            elif ev.get("Event") == "SparkListenerStageCompleted":
                si = ev.get("Stage Info", {})
                t0 = si.get("Submission Time")
                t1 = si.get("Completion Time")
                stage_info[si.get("Stage ID")] = {
                    "name": (si.get("Stage Name") or "")[:70],
                    "dt": ((t1 - t0) / 1000.0) if t0 and t1 else -1,
                    "tasks": si.get("Number of Tasks"),
                }

    for n in names:
        print(f"\n=== {n}  walls={['%.2f' % w for w in walls[n]]}")
        sel = [
            (jid, j) for jid, j in sorted(jobs.items()) if j["group"] == n
        ]
        per_rep: dict[str, float] = {}
        for jid, j in sel:
            per_rep.setdefault(j["desc"], 0.0)
        # print only rep0's jobs in order, with durations
        repN = [x for x in sel if x[1]["desc"].endswith(f"rep{reps-1}")]
        tot = 0.0
        for jid, j in repN:
            dt = j.get("dt", -1)
            tot += max(dt, 0)
            names = "; ".join(
                f"{stage_info[s]['name']}[{stage_info[s]['dt']:.2f}s/{stage_info[s]['tasks']}t]"
                for s in j["stages"] if s in stage_info
            )
            print(f"  job {jid:4d} {dt:7.3f}s  {names[:150]}")
        print(f"  rep{reps-1} job-time total {tot:.3f}s  (wall {walls[n][-1]:.3f}s; gap = driver/planning)")


if __name__ == "__main__":
    main()
