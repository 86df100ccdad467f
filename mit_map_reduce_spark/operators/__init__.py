"""Operator library: every query is a pure (spark, sf_dir) -> DataFrame
function, declared with the DataFrame API so Catalyst owns the physical
plan. Each module exports ``QUERIES`` (name -> callable) and ``ORACLES``
(name -> equivalent DuckDB SQL) for the driver's differential harness —
the Spark-native analog of the reference's sequential-oracle golden
testing (reference ``src/main/test-mr.sh:81-83,103``).
"""

from mit_map_reduce_spark.operators import (  # noqa: F401
    mr_queries,
    relational,
    advanced,
    dedup,
    graph,
    similarity,
    sketch,
    text,
    multimodal,
    sources_queries,
)

ALL_MODULES = (
    mr_queries, relational, advanced, dedup, graph, similarity, sketch, text,
    multimodal, sources_queries,
)


def all_queries():
    out = {}
    for m in ALL_MODULES:
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in ALL_MODULES:
        out.update(m.ORACLES)
    return out
