"""The engine's SQL surface: register the catalog, run ANSI SQL.

Everything the operator library does via the DataFrame API is equally
available as ``spark.sql`` over the registered views — this is the
surface a reference user migrating from hand-written MapReduce apps to
declarative queries would touch first.
"""

from mit_map_reduce_spark.catalog import register_views


def test_sql_over_registered_views(spark, sf_dir, duck):
    register_views(spark, sf_dir)
    sql = """
        SELECT c_mktsegment,
               count(*) AS n_orders,
               floor(sum(o_totalprice) * 100.0 + 0.5) / 100.0 AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY c_mktsegment
    """
    # float(): Spark parses the 100.0 literals as DECIMAL, DuckDB as
    # DOUBLE — values are identical, the carrier type differs.
    got = {
        r.c_mktsegment: (r.n_orders, float(r.total))
        for r in spark.sql(sql).collect()
    }
    exp = {
        seg: (n, float(t))
        for seg, n, t in duck.execute(sql).fetchall()
    }
    assert got == exp


def test_sql_sees_all_tables(spark, sf_dir):
    register_views(spark, sf_dir)
    for t in ("region", "nation", "lineitem", "documents", "embeddings", "events"):
        assert spark.sql(f"SELECT count(*) AS n FROM {t}").first().n > 0
