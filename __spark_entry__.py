"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``mit_map_reduce_spark`` package; this
module only aggregates the per-module QUERIES / ORACLES registries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mit_map_reduce_spark import operators
from mit_map_reduce_spark.streaming import queries as streaming_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: word count over documents at sf0.001 — the
    DataFrame-native descendant of the reference's flagship wc app
    (reference src/mrapps/wc.go over pg-*.txt)."""
    from mit_map_reduce_spark.operators.mr_queries import mr_wordcount

    return mr_wordcount(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = dict(operators.all_queries())
    out.update(streaming_queries.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out = dict(operators.all_oracles())
    out.update(streaming_queries.ORACLES)
    return out
