#!/usr/bin/env python3
"""A/B the pinned shuffle widths at the grading parallelism (r10 #3).

The three width pins (``graph_supplier_projection``'s plan-embedded
``repartition``, ``_knn_copurchase_edges``'s pinned exchanges, and the
dedup CC fixpoint's scoped ``spark.sql.shuffle.partitions``) were
validated on vanilla local[4]-style sessions; this tool re-runs the
comparison under the driver's shape — a BARE ``local[32]`` session
(conf width 200, the default the grading driver would see) at sf0.1 —
so the pins are re-grounded at the parallelism that actually grades.

Usage (fresh process per variant — the shared-artifact registry and
JVM state must not leak between arms; run on a QUIET machine):

    python tools/ab_pinned_width.py pinned
    python tools/ab_pinned_width.py confwidth

``confwidth`` monkeypatches ``bounded_shuffle_width`` (in catalog and
both importing operator modules) to return the session conf width,
reproducing the pre-pin behavior of riding conf width.

Round-11 numbers (vanilla local[32], conf 200, sf0.1, cold then
warm-median-of-3, quiet machine):

    query                       pinned        confwidth
    graph_supplier_projection   9.79 / 1.32   21.85 / 11.61  (warm 8.8x)
    graph_triangle_count        6.13 / 0.72   10.48 /  1.38  (warm 1.9x)
    dedup_cluster_size_report  10.04 / 1.41   19.99 /  1.44  (build 2.0x)

The pins win everywhere at local[32]; nothing is neutral-or-worse.
The supplier projection's gap is largest because its pin lives in the
RETURNED lazy plan (paid every call); the CC pin lives in the
once-per-session build (cold only); triangle_count pays conf width on
its cached-edge consumers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "graph_supplier_projection",
    "graph_triangle_count",
    "dedup_cluster_size_report",
]


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "pinned"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "100g")
        .appName(f"ab_{variant}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if variant == "confwidth":
        import mit_map_reduce_spark.catalog as catalog
        import mit_map_reduce_spark.operators.dedup as dedup
        import mit_map_reduce_spark.operators.graph as graph

        def conf_width(spark, floor=16):
            return int(spark.conf.get("spark.sql.shuffle.partitions"))

        # patch the importing modules too: they bound the symbol at
        # import time, so patching catalog alone would miss them
        catalog.bounded_shuffle_width = conf_width
        graph.bounded_shuffle_width = conf_width
        dedup.bounded_shuffle_width = conf_width

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    res = {}
    for name in QUERIES:
        t0 = time.time()
        qs[name](spark, sf).count()
        cold = time.time() - t0
        warm = []
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, sf).count()
            warm.append(time.time() - t0)
        res[name] = {"cold": round(cold, 2), "warm_med": round(sorted(warm)[1], 2)}
    print(
        json.dumps(
            {
                "variant": variant,
                "conf_width": spark.conf.get("spark.sql.shuffle.partitions"),
                "results": res,
            }
        )
    )


if __name__ == "__main__":
    main()
