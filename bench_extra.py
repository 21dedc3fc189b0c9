#!/usr/bin/env python3
"""Per-query isolation bench (guide §1.4): times individual queries()
entries with the noop sink and optionally dumps .explain("formatted") to
plans/r06/. NOT the driver-timed bench — bench.py stays frozen; numbers
from this file are cited in OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--explain out_suffix] q213_bitext_margin ...

Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS honored like bench.py.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain", default=None,
                    help="write plans/r06/<query>_<suffix>.txt explain captures")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")

    import importlib.util

    repo = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(repo, "__spark_entry__.py")
    )
    se = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(se)

    from document_quality_assessment_ocr_spark.session import get_spark

    spark = get_spark(app_name=f"bench_extra[{cpus}]", master=master,
                      shuffle_partitions=max(2 * cpus, 8))
    qs = se.queries()
    timings = {}
    for name in args.queries:
        fn = qs[name]
        if args.explain:
            df = fn(spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            out = os.path.join(repo, "plans", "r06")
            os.makedirs(out, exist_ok=True)
            with open(os.path.join(out, f"{name}_{args.explain}.txt"), "w") as f:
                f.write(buf.getvalue())
        best = float("inf")
        samples = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn(spark, args.sf).write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            samples.append(round(dt, 3))
            best = min(best, dt)
        timings[name] = {"best": round(best, 3), "samples": samples}
        print(f"RESULT_EXTRA {name} {json.dumps(timings[name])}", flush=True)
    print("RESULT_EXTRA_ALL " + json.dumps(timings), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
