#!/usr/bin/env python3
"""Stage-level profile of one queries() entry (guide §1.1/§7.1 without a UI):
runs the query with the noop sink under an event log, then prints per-stage
wall/task-time/shuffle metrics parsed from the log — the empirical loop's
"which stage is slow" answer in a headless sandbox.

Usage: python3 scripts/profile_query.py [--sf DIR] [--warm N] <query>
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--warm", type=int, default=1)
    args = ap.parse_args()

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    se = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(se)

    from document_quality_assessment_ocr_spark.session import get_spark

    evdir = tempfile.mkdtemp(prefix="spark_ev_")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name=f"profile[{args.query}]",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 8),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": evdir,
        },
    )
    qs = se.queries()
    fn = qs[args.query]
    for _ in range(args.warm):
        fn(spark, args.sf).write.mode("overwrite").format("noop").save()
    sc = spark.sparkContext
    sc.setJobDescription(f"profile:{args.query}")
    t0 = time.time()
    fn(spark, args.sf).write.mode("overwrite").format("noop").save()
    wall = time.time() - t0
    app_id = sc.applicationId
    spark.stop()

    path = os.path.join(evdir, app_id)
    if not os.path.exists(path):
        path = os.path.join(evdir, app_id + ".inprogress")
    if not os.path.exists(path):
        d = os.path.join(evdir, f"eventlog_v2_{app_id}")
        parts = sorted(
            p for p in os.listdir(d) if p.startswith("events_")
        )
        path = [os.path.join(d, p) for p in parts]
    if isinstance(path, str):
        path = [path]
    stages = {}
    profiled_stages = set()
    profiling = False
    def lines():
        for p in path:
            if p.endswith(".zstd"):
                import subprocess

                out = subprocess.run(
                    ["zstd", "-dc", p], capture_output=True, check=True
                ).stdout.decode()
                yield from out.splitlines()
            else:
                with open(p) as f:
                    yield from f

    if True:
        for line in lines():
            ev = json.loads(line)
            t = ev.get("Event")
            if t == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get("spark.job.description", "")
                if desc.startswith("profile:"):
                    profiling = True
                    for sid in ev.get("Stage IDs", []):
                        profiled_stages.add(sid)
            elif t == "SparkListenerStageCompleted" and profiling:
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                if sid not in profiled_stages:
                    continue
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                st = stages.setdefault(sid, {
                    "name": "?", "wall_ms": None, "tasks": 0, "details": "",
                    "exec_ms": 0, "cpu_ms": 0, "sh_read_mb": 0.0,
                    "sh_write_mb": 0.0, "input_mb": 0.0,
                })
                st["name"] = si.get("Stage Name", "")[:70]
                st["wall_ms"] = (comp - sub) if sub and comp else None
                st["tasks"] = si.get("Number of Tasks")
            elif t == "SparkListenerTaskEnd" and profiling:
                sid = ev["Stage ID"]
                if sid not in profiled_stages:
                    continue
                st = stages.setdefault(sid, {
                    "name": "?", "wall_ms": None, "tasks": 0, "details": "",
                    "exec_ms": 0, "cpu_ms": 0, "sh_read_mb": 0.0,
                    "sh_write_mb": 0.0, "input_mb": 0.0,
                })
                m = ev.get("Task Metrics") or {}
                st["exec_ms"] += m.get("Executor Run Time", 0)
                st["cpu_ms"] += (m.get("Executor CPU Time", 0)) // 1_000_000
                sr = m.get("Shuffle Read Metrics") or {}
                st["sh_read_mb"] += (
                    sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)
                ) / 1e6
                sw = m.get("Shuffle Write Metrics") or {}
                st["sh_write_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
                im = m.get("Input Metrics") or {}
                st["input_mb"] += im.get("Bytes Read", 0) / 1e6

    print(f"PROFILE {args.query} wall={wall:.2f}s stages={len(stages)}")
    tot_exec = sum(s["exec_ms"] for s in stages.values())
    print(f"  total executor-ms {tot_exec}  (wall*cores = {wall*cpus*1000:.0f})")
    for sid in sorted(stages, key=lambda s: -(stages[s]["wall_ms"] or 0)):
        s = stages[sid]
        print(
            f"  stage {sid:4d} wall={s['wall_ms'] or 0:6d}ms tasks={s['tasks']:4d} "
            f"exec={s['exec_ms']:7d}ms cpu={s['cpu_ms']:7d}ms "
            f"shR={s['sh_read_mb']:7.1f}MB shW={s['sh_write_mb']:7.1f}MB "
            f"in={s['input_mb']:6.1f}MB  {s['name']}"
        )


if __name__ == "__main__":
    main()
