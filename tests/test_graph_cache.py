"""Cache hygiene for the iterative graph loops (round-3 verdict #4).

Contract: the trade-graph edge list is built and persisted ONCE per
(session, corpus) via the catalog's shared_persist registry, shared by
PageRank / k-core / degree distribution; iterative loops release every
superseded per-round frame; and a second invocation of an iterative
query is a pure registry hit (zero new cached RDDs).
"""

from pyspark.sql import functions as F  # noqa: F401

from mit_map_reduce_spark.catalog import _SHARED_CACHE
from mit_map_reduce_spark.operators.graph import (
    PR_ITERS,
    graph_degree_distribution,
    graph_kcore_prune,
    graph_pagerank_trade,
)


def _cached_rdd_count(spark):
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _registry_keys(spark, sf_dir):
    return {k[1] for k in _SHARED_CACHE if k[0] == id(spark) and k[2] == sf_dir}


def test_graph_queries_share_one_edge_list(spark, sf_dir):
    graph_degree_distribution(spark, sf_dir).collect()
    # Order-robust: if another test in this session already ran
    # PageRank, its ranks are a registry hit and add ZERO frames.
    already = "graph_pagerank_ranks" in _registry_keys(spark, sf_dir)
    before = _cached_rdd_count(spark)
    graph_pagerank_trade(spark, sf_dir).collect()
    after = _cached_rdd_count(spark)
    keys = _registry_keys(spark, sf_dir)
    assert "trade_edges" in keys and "graph_pagerank_ranks" in keys
    # PageRank adds exactly ONE resident frame (its final ranks): the
    # edge list was a registry hit and all superseded per-iteration
    # frames were released (round 3 kept all PR_ITERS of them).
    assert after - before == (0 if already else 1), (before, after, PR_ITERS)


def test_second_invocation_is_registry_hit(spark, sf_dir):
    first = graph_kcore_prune(spark, sf_dir).collect()
    before = _cached_rdd_count(spark)
    second = graph_kcore_prune(spark, sf_dir).collect()
    assert _cached_rdd_count(spark) == before  # zero new cached frames
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))


def test_cc_fixpoint_is_registry_backed(spark, sf_dir):
    # Same contract for the dedup connected-components fixpoint: the
    # loop runs once per (session, corpus); a second invocation adds
    # zero cached frames and returns identical labels (bench calls
    # every query 3x — without the registry each call re-ran the loop
    # and re-persisted identical lineage).
    from mit_map_reduce_spark.operators.dedup import dedup_connected_components

    first = dedup_connected_components(spark, sf_dir).collect()
    assert "dedup_cc_labels" in _registry_keys(spark, sf_dir)
    before = _cached_rdd_count(spark)
    second = dedup_connected_components(spark, sf_dir).collect()
    assert _cached_rdd_count(spark) == before
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))


def test_hits_degrades_to_empty_frame_on_empty_edges(spark, sf_dir, tmp_path):
    """An empty trade graph (no lineitem/orders rows) must yield an
    empty scored frame with the (node, role, score) schema — the 1-row
    L1-total agg returns NULL there and an unguarded float(None) raised
    TypeError (round-7 advice)."""
    from mit_map_reduce_spark.catalog import TABLES, table_path
    from mit_map_reduce_spark.operators.graph import graph_hits_scores

    src = sf_dir
    empty_sf = str(tmp_path / "sf_empty")
    for name in TABLES:
        df = spark.read.parquet(table_path(src, name))
        if name in ("lineitem", "orders"):
            df = df.limit(0)
        df.write.parquet(table_path(empty_sf, name))
    out = graph_hits_scores(spark, empty_sf)
    assert [f.name for f in out.schema.fields] == ["node", "role", "score"]
    assert out.count() == 0


def test_fixpoint_conf_restore_preserves_caller_coalescing(spark):
    """_restore_fixpoint_conf must put back the CAPTURED pre-scope
    coalescing value, not a hard-coded "true": a session that
    deliberately disabled AQE coalescing stays disabled after a
    fixpoint scope (r14 ADVICE)."""
    from mit_map_reduce_spark.operators.graph import (
        GRAPH_SHUFFLE_PARTITIONS,
        _restore_fixpoint_conf,
        _saved_fixpoint_conf,
        _set_fixpoint_width,
    )

    key = "spark.sql.adaptive.coalescePartitions.enabled"
    before = spark.conf.get(key, "true")
    try:
        spark.conf.set(key, "false")
        saved = _saved_fixpoint_conf(spark)
        # Width past the floor flips coalescing off inside the scope...
        width = _set_fixpoint_width(spark, 250_000 * 64)
        assert width > GRAPH_SHUFFLE_PARTITIONS
        assert spark.conf.get(key) == "false"
        _restore_fixpoint_conf(spark, saved)
        # ...and restore yields the caller's "false", not "true".
        assert spark.conf.get(key) == "false"
        assert spark.conf.get("spark.sql.shuffle.partitions") == saved[0]
    finally:
        spark.conf.set(key, before)
