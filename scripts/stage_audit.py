#!/usr/bin/env python3
"""Event-log stage-latency audit (optimization round 19 — verdict r18 #7).

Parses a Spark event log produced by a graft.Bench pass run with
  SPARK_GRAFT_JAVA_OPTS="-Dspark.eventLog.enabled=true \
                         -Dspark.eventLog.dir=file:///tmp/eventlog"
and attributes each query's wall time (jobs carry the query name via
spark.job.description — Bench.time() labels them) to:

  - task_s        sum of task wall (executor busy+wait), all tasks
  - run_s         sum of Executor Run Time (actual compute)
  - gc_s          sum of JVM GC time inside tasks
  - fetch_s       sum of shuffle-read fetch wait
  - deser_s/ser_s task (de)serialization
  - sched_s       wall - busy-coverage estimate: for each job,
                  wall_job - task_s_job / min(cores, max_concurrency);
                  >~50% means per-stage scheduling latency dominates,
                  i.e. the query's cost is stage COUNT, not data.

Usage: stage_audit.py <event-log-file> [cores] > bench/stage_audit.json
"""
import json, sys, collections

path = sys.argv[1]
cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

stage2job = {}
job2query = {}
jobwall = collections.defaultdict(float)     # query -> sum of job walls
jobsub = {}
njobs = collections.defaultdict(int)
nstages = collections.defaultdict(int)
ntasks = collections.defaultdict(int)
agg = collections.defaultdict(lambda: collections.defaultdict(float))
jobtask = collections.defaultdict(float)     # job id -> task seconds

with open(path) as f:
    for line in f:
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            jid = e["Job ID"]
            q = (e.get("Properties") or {}).get("spark.job.description")
            if not q or not q.startswith("q_"):
                q = "_unlabeled"
            job2query[jid] = q
            jobsub[jid] = e.get("Submission Time", 0)
            njobs[q] += 1
            for sid in e.get("Stage IDs", []):
                stage2job[sid] = jid
            nstages[q] += len(e.get("Stage IDs", []))
        elif ev == "SparkListenerJobEnd":
            jid = e["Job ID"]
            q = job2query.get(jid, "_unlabeled")
            if jid in jobsub:
                jobwall[q] += (e.get("Completion Time", 0) - jobsub[jid]) / 1e3
        elif ev == "SparkListenerTaskEnd":
            sid = e.get("Stage ID")
            jid = stage2job.get(sid)
            q = job2query.get(jid, "_unlabeled")
            ti = e.get("Task Info") or {}
            tm = e.get("Task Metrics") or {}
            dur = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1e3
            ntasks[q] += 1
            a = agg[q]
            a["task_s"] += dur
            if jid is not None:
                jobtask[jid] += dur
            a["run_s"] += tm.get("Executor Run Time", 0) / 1e3
            a["gc_s"] += tm.get("JVM GC Time", 0) / 1e3
            a["deser_s"] += tm.get("Executor Deserialize Time", 0) / 1e3
            a["ser_s"] += tm.get("Result Serialization Time", 0) / 1e3
            sr = tm.get("Shuffle Read Metrics") or {}
            a["fetch_s"] += sr.get("Fetch Wait Time", 0) / 1e3
            a["shuffle_read_mb"] += (sr.get("Remote Bytes Read", 0) +
                                     sr.get("Local Bytes Read", 0)) / 2**20
            sw = tm.get("Shuffle Write Metrics") or {}
            a["shuffle_write_mb"] += sw.get("Shuffle Bytes Written", 0) / 2**20

# scheduling share: wall minus the densest possible packing of task time
sched = collections.defaultdict(float)
for jid, q in job2query.items():
    pass  # per-job packing needs per-job wall; approximate at query level

out = {}
for q in sorted(set(list(jobwall.keys()) + list(agg.keys()))):
    a = agg[q]
    wall = jobwall.get(q, 0.0)
    # densest packing of the query's task seconds on `cores` cores
    packed = a["task_s"] / cores
    schedv = max(0.0, wall - max(packed, a["task_s"] / max(1, ntasks[q])
                                 if ntasks[q] else 0.0))
    out[q] = {
        "jobs": njobs[q], "stages": nstages[q], "tasks": ntasks[q],
        "wall_s": round(wall, 3),
        "task_s": round(a["task_s"], 3),
        "run_s": round(a["run_s"], 3),
        "gc_s": round(a["gc_s"], 3),
        "fetch_s": round(a["fetch_s"], 3),
        "deser_s": round(a["deser_s"], 3),
        "ser_s": round(a["ser_s"], 3),
        "shuffle_read_mb": round(a["shuffle_read_mb"], 2),
        "shuffle_write_mb": round(a["shuffle_write_mb"], 2),
        "sched_s": round(schedv, 3),
        "sched_share": round(schedv / wall, 3) if wall > 0 else None,
    }
print(json.dumps(out, indent=1))
