"""Physical-plan introspection.

The reference has no optimizer and a fixed two-stage plan (SURVEY §4:
no pushdown, no pruning, no reordering — every map task always reads
its whole file, ``src/mr/worker.go:137``). On Spark the plan is
Catalyst's, so the engineering burden inverts: instead of *building*
the plan we must *verify* the optimizer produced the one that survives
100 TB. This package is that verification surface — used by the plan
tests in CI and available to users as a pre-flight check before
launching a query on a real cluster.
"""

from mit_map_reduce_spark.plans.inspect import (  # noqa: F401
    physical_plan,
    formatted_plan,
    scan_read_schema,
    pushed_filters,
    count_shuffles,
    broadcast_join_count,
    wholestage_codegen_ids,
    plan_report,
    streaming_plan_report,
    unpartitioned_corpus_windows,
)
