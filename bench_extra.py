"""Round-8 profiling harness (bench.py is FROZEN; this file is the
optimization round's measurement side-car — guide §1).

Modes:
  python bench_extra.py time q1 q2 ...      # noop-sink wall per query (best-of-2)
  python bench_extra.py profile q1 q2 ...   # + Spark event log, per-stage report
  python bench_extra.py plans q1 q2 ...     # dump .explain("formatted") to plans/r08/
  python bench_extra.py jobs q1 ...         # count Spark jobs/stages per query

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
EVDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench", "r8", "eventlog")
PLANS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r08")


def _spark(event_log: bool = False):
    from gregor_spark.session import get_spark

    extra = {}
    if event_log:
        os.makedirs(EVDIR, exist_ok=True)
        extra = {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{EVDIR}",
        }
    return get_spark(app="gregor-bench-extra", master=f"local[{CPUS}]", extra=extra)


def _registry():
    from gregor_spark.entry_queries import REGISTRY

    return REGISTRY


def run_noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def cmd_time(names, reps=2):
    spark = _spark()
    R = _registry()
    R["token_count"][0](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    out = {}
    for name in names:
        best = float("inf")
        for _ in range(reps):
            best = min(best, run_noop(R[name][0](spark, SF_DIR)))
        out[name] = round(best, 3)
        print(f"{name}: {out[name]}s", flush=True)
    print(json.dumps(out))
    spark.stop()


def cmd_plans(names, suffix="before"):
    spark = _spark()
    R = _registry()
    os.makedirs(PLANS, exist_ok=True)
    for name in names:
        df = R[name][0](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(PLANS, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote plans/r08/{name}_{suffix}.txt", flush=True)
    spark.stop()


def cmd_jobs(names):
    """Job/stage count per query via the status tracker (fixed-overhead
    census: every job is >=0.1 s of scheduler latency on this box)."""
    spark = _spark()
    R = _registry()
    R["token_count"][0](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    st = spark.sparkContext.statusTracker()
    for name in names:
        j0 = len(st.getJobIdsForGroup(None) or [])
        jobs_before = set(st.getJobIdsForGroup(None) or [])
        t0 = time.time()
        run_noop(R[name][0](spark, SF_DIR))
        sec = time.time() - t0
        jobs_after = set(st.getJobIdsForGroup(None) or [])
        new_jobs = jobs_after - jobs_before
        n_stages = 0
        for j in new_jobs:
            info = st.getJobInfo(j)
            if info:
                n_stages += len(info.stageIds)
        print(f"{name}: {sec:.2f}s jobs={len(new_jobs)} stages={n_stages}", flush=True)
    spark.stop()


def cmd_profile(names):
    spark = _spark(event_log=True)
    app_id = spark.sparkContext.applicationId
    R = _registry()
    R["token_count"][0](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    marks = []
    for name in names:
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        run_noop(R[name][0](spark, SF_DIR))
        marks.append((name, round(time.time() - t0, 3)))
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: {marks[-1][1]}s", flush=True)
    spark.stop()
    report(os.path.join(EVDIR, app_id))


def report(path):
    """Aggregate the event log: per job-description, per-stage wall and
    task time, shuffle bytes."""
    jobs = {}       # jobId -> desc
    stage_job = {}  # stageId -> jobId
    stages = {}     # stageId -> dict
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except Exception:
                continue
            k = ev.get("Event")
            if k == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                jobs[ev["Job ID"]] = desc
                for sid in ev.get("Stage IDs", []):
                    stage_job[sid] = ev["Job ID"]
            elif k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                stages[sid] = {
                    "name": si.get("Stage Name", "")[:80],
                    "wall": (comp - sub) / 1000.0 if sub and comp else None,
                    "tasks": si.get("Number of Tasks"),
                }
            elif k == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                st = stages.setdefault(sid, {})
                st["task_time"] = st.get("task_time", 0) + m.get("Executor Run Time", 0)
                srm = m.get("Shuffle Read Metrics") or {}
                swm = m.get("Shuffle Write Metrics") or {}
                st["sh_read"] = st.get("sh_read", 0) + srm.get(
                    "Remote Bytes Read", 0
                ) + srm.get("Local Bytes Read", 0)
                st["sh_write"] = st.get("sh_write", 0) + swm.get(
                    "Shuffle Bytes Written", 0
                )
                st["fetch_wait"] = st.get("fetch_wait", 0) + srm.get(
                    "Fetch Wait Time", 0
                )
    by_desc = {}
    for sid, st in sorted(stages.items()):
        desc = jobs.get(stage_job.get(sid, -1), "?")
        by_desc.setdefault(desc, []).append((sid, st))
    for desc, ss in by_desc.items():
        wall = sum(s.get("wall") or 0 for _, s in ss)
        print(f"\n== {desc or '(warmup)'}  stages={len(ss)} stage_wall_sum={wall:.2f}s")
        for sid, s in sorted(ss, key=lambda t: -(t[1].get("wall") or 0))[:12]:
            print(
                f"  stage {sid}: wall={s.get('wall')}s tasks={s.get('tasks')} "
                f"task_time={s.get('task_time', 0) / 1000.0:.2f}s "
                f"shR={s.get('sh_read', 0) // 1024}k shW={s.get('sh_write', 0) // 1024}k "
                f"fetchWait={s.get('fetch_wait', 0) / 1000.0:.2f}s  {s.get('name', '')}"
            )


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    names = sys.argv[2:]
    if mode == "time":
        cmd_time(names)
    elif mode == "plans":
        cmd_plans(names, suffix=os.environ.get("PLAN_SUFFIX", "before"))
    elif mode == "jobs":
        cmd_jobs(names)
    elif mode == "profile":
        cmd_profile(names)
    elif mode == "report":
        report(names[0])
    else:
        raise SystemExit(f"unknown mode {mode}")
