"""Physical-plan assertions — the scale story, checked in CI.

Correctness says the operator works at sf0.001; these assertions say
the *plan shape* survives 100 TB: filters reach the parquet scan,
scans prune columns, dimension joins broadcast, and the hot path stays
in whole-stage codegen.
"""

from pyspark.sql import functions as F

from mit_map_reduce_spark.catalog import load_table
from mit_map_reduce_spark.operators.relational import (
    rel_q1_pricing_summary,
    rel_q3_shipping_priority,
    rel_q5_local_supplier_volume,
)
from mit_map_reduce_spark.operators.mr_queries import mr_wordcount


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    plan = _formatted(rel_q1_pricing_summary(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q1_column_pruning(spark, sf_dir):
    plan = _formatted(rel_q1_pricing_summary(spark, sf_dir))
    # ReadSchema must NOT include unused columns like l_orderkey/l_comment
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read
    assert "l_returnflag" in read


def test_q3_broadcasts_filtered_customer(spark, sf_dir):
    plan = _plan(rel_q3_shipping_priority(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_q5_broadcasts_dims(spark, sf_dir):
    plan = _plan(rel_q5_local_supplier_volume(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2


def test_wordcount_partial_aggregation(spark, sf_dir):
    # The reference ships unaggregated (word,1) pairs across its
    # shuffle (src/mrapps/wc.go:27-30); our plan must show a partial
    # hash aggregate BEFORE the exchange — the map-side combine.
    plan = _plan(mr_wordcount(spark, sf_dir))
    assert "HashAggregate" in plan and "Exchange hashpartitioning" in plan
    # the subtree under the hash-partitioning exchange (printed below it)
    # must contain the partial HashAggregate — i.e. the combine happens
    # before word counts cross the shuffle
    below = plan.split("Exchange hashpartitioning", 1)[1]
    assert "HashAggregate" in below


def test_wordcount_wholestage_codegen(spark, sf_dir):
    df = mr_wordcount(spark, sf_dir)
    df.collect()  # AQE finalizes the plan only after execution
    plan = _plan(df)
    # whole-stage-codegen stages render as "*(n) Operator" in the plan
    assert "*(1)" in plan and "*(2)" in plan


def test_projection_prunes_parquet_columns(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plan = _formatted(df)
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_extendedprice" not in read
