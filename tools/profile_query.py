#!/usr/bin/env python3
"""Per-query cost breakdown for the optimization rounds (guide §1).

Usage: python tools/profile_query.py <query> [query ...] [--sf DIR] [--reps N]

For each named query, on one warm session, reports:

- build_s   — ``fn(spark, sf_dir)`` alone: Python-side DataFrame
              construction (includes any shared-artifact build on the
              first query that triggers it; run twice, second reported)
- plan_s    — analysis+optimization probe: ``df.queryExecution``
              executedPlan render (Catalyst work without running a job)
- count_s   — the bench's timed action, median of N warm repeats
              (full rebuild per repeat, the bench protocol)
- noop_s    — noop-sink write, median of N (computes EVERY column;
              guide §1.4), on the same rebuilt-per-repeat protocol
- rows, and the plan facts (exchanges, broadcasts, scans)

The count/noop split separates "the aggregation is cheap once columns
prune" from "materializing every column is the cost"; build/plan vs
count separates driver-side overhead from cluster work.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def median(xs):
    return sorted(xs)[len(xs) // 2]


def _machine_cpu_s() -> float:
    """Machine-wide CPU seconds consumed so far (user+nice+system from
    /proc/stat) — a contention-robust complement to wall-clock: under
    hypervisor-level time-sharing wall inflates 2-3x while the work's
    CPU seconds stay ~flat (r15 sandbox). Valid as a per-query meter
    only while nothing else runs in the sandbox, which is how the
    profiling sessions are driven."""
    hz = os.sysconf("SC_CLK_TCK")
    f = open("/proc/stat").readline().split()
    return (int(f[1]) + int(f[2]) + int(f[3])) / hz


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    import __spark_entry__ as entrymod

    from mit_map_reduce_spark.catalog import drain_build_events
    from mit_map_reduce_spark.plans import plan_report
    from mit_map_reduce_spark.session import get_spark

    qs = entrymod.queries()
    spark = get_spark("profile_query")
    # bench-equivalent warmup: JVM + parquet reader + python worker pool
    spark.range(1000).selectExpr("sum(id)").collect()

    def _noop(batches):
        for b in batches:
            yield b

    spark.range(spark.sparkContext.defaultParallelism * 4).selectExpr(
        "id", "cast(id as double) x"
    ).repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        _noop, "id long, x double"
    ).count()

    out = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"profile: {name}")
        # warm shared artifacts (excluded from bench medians too)
        df = fn(spark, sf_dir)
        df.count()
        drain_build_events()

        t0 = time.time()
        df = fn(spark, sf_dir)
        build_s = time.time() - t0

        t0 = time.time()
        _ = df._jdf.queryExecution().executedPlan().toString()
        plan_s = time.time() - t0

        counts, cpus, rows = [], [], 0
        for _ in range(reps):
            c0, t0 = _machine_cpu_s(), time.time()
            rows = fn(spark, sf_dir).count()
            counts.append(time.time() - t0)
            cpus.append(_machine_cpu_s() - c0)
        noops = []
        for _ in range(reps):
            d = fn(spark, sf_dir)
            t0 = time.time()
            d.write.format("noop").mode("overwrite").save()
            noops.append(time.time() - t0)
        rep = plan_report(df)
        out[name] = {
            "build_s": round(build_s, 3),
            "plan_s": round(plan_s, 3),
            "count_s": round(median(counts), 3),
            "count_runs": [round(x, 3) for x in counts],
            "cpu_s": round(median(cpus), 2),
            "noop_s": round(median(noops), 3),
            "rows": rows,
            "exchanges": rep.get("shuffles"),
            "broadcasts": rep.get("broadcast_joins"),
            "codegen_spans": rep.get("codegen_spans"),
        }
        print(f"# {name}: {json.dumps(out[name])}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
