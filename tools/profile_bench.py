#!/usr/bin/env python
"""Per-query profiling for the optimization rounds (guide §1).

For every registry query, measures separately:
  * build_s   — spec.fn(spark, sf_dir): Python plan construction + analysis
  * exec1_s   — first noop write (includes codegen/JIT for this plan)
  * exec2_s   — second noop write (warm; steady-state execution)
  * jobs      — Spark jobs launched by the second execution
and writes plans/<tag>/<name>_before.txt with explain("formatted") when
--plans is passed (only for queries above --plan-floor seconds).

Usage: python tools/profile_bench.py [--out FILE] [--names a,b,...]
           [--plans DIR] [--sf DIR]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/profile_bench.json")
    ap.add_argument("--names", default="")
    ap.add_argument("--plans", default="")
    ap.add_argument("--plan-floor", type=float, default=0.0)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--skip-warm", action="store_true")
    ap.add_argument("--bench", action="store_true",
                    help="bench-identical timing: per-query sf0.001 warm "
                         "then min-of-3 (fn + noop) at the target sf")
    args = ap.parse_args()

    from bioio_spark.queries import REGISTRY
    from bioio_spark.session import get_session

    spark = get_session("bioio_spark_profile")
    sc = spark.sparkContext
    spark.range(1000).count()

    names = ([n for n in args.names.split(",") if n]
             if args.names else sorted(REGISTRY))

    # codegen warm pass at sf0.001 (mirrors bench.py)
    warm_dir = "/root/testdata/sf0.001"
    if not args.skip_warm and os.path.isdir(warm_dir) and warm_dir != args.sf:
        for name in names:
            try:
                (REGISTRY[name].fn(spark, warm_dir)
                 .write.format("noop").mode("overwrite").save())
            except Exception:
                pass

    if args.bench:
        rows = {}
        for name in names:
            spec = REGISTRY[name]
            try:
                if os.path.isdir(warm_dir) and warm_dir != args.sf:
                    (spec.fn(spark, warm_dir)
                     .write.format("noop").mode("overwrite").save())
                best = None
                for _ in range(3):
                    t0 = time.perf_counter()
                    (spec.fn(spark, args.sf)
                     .write.format("noop").mode("overwrite").save())
                    dt = time.perf_counter() - t0
                    best = dt if best is None or dt < best else best
                rows[name] = {"bench_s": round(best, 3)}
            except Exception as exc:
                rows[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
            print(f"{name}: {rows[name]}", flush=True)
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1, sort_keys=True)
        print(f"wrote {args.out} ({len(rows)} queries)")
        return

    rows = {}
    for name in names:
        spec = REGISTRY[name]
        try:
            t0 = time.perf_counter()
            df = spec.fn(spark, args.sf)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            group = f"prof_{name}"
            sc.setJobGroup(group, name)
            df2 = spec.fn(spark, args.sf)
            t3 = time.perf_counter()
            df2.write.format("noop").mode("overwrite").save()
            t4 = time.perf_counter()
            sc.setJobGroup(None, None)
            try:
                jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            except Exception:
                jobs = -1
            rows[name] = {
                "build_s": round(t1 - t0, 3),
                "exec1_s": round(t2 - t1, 3),
                "build2_s": round(t3 - t2, 3),
                "exec2_s": round(t4 - t3, 3),
                "jobs": jobs,
            }
            if args.plans and (t4 - t2) >= args.plan_floor:
                os.makedirs(args.plans, exist_ok=True)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df2.explain("formatted")
                with open(os.path.join(args.plans, f"{name}.txt"), "w") as f:
                    f.write(buf.getvalue())
        except Exception as exc:
            rows[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
        print(f"{name}: {rows[name]}", flush=True)

    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1, sort_keys=True)
    print(f"wrote {args.out} ({len(rows)} queries)")


if __name__ == "__main__":
    main()
