"""API-contract tests: the errors the engine promises to raise."""

import pytest
from pyspark.sql import Row

from mit_map_reduce_spark.catalog import BROADCAST_TABLES, TABLES, load_table
from mit_map_reduce_spark.sources import write_parquet


def test_unknown_table_raises(spark, sf_dir):
    with pytest.raises(KeyError, match="unknown table"):
        load_table(spark, sf_dir, "no_such_table")


def test_catalog_lists_all_driver_tables():
    assert set(TABLES) == {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    assert set(BROADCAST_TABLES) <= set(TABLES)


def test_bucketby_requires_table_name(spark, tmp_path):
    df = spark.createDataFrame([Row(k=1)])
    with pytest.raises(ValueError, match="table_name"):
        write_parquet(df, str(tmp_path / "x"), bucket_by=(4, ["k"]))


def test_events_ts_is_timestamp(spark, sf_dir):
    # the TIMESTAMP(NANOS) normalization must hold on any session
    from pyspark.sql import types as T

    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)


def test_priority_is_a_permutation_of_the_registry():
    # _PRIORITY drives the driver's bounded verification window: a
    # duplicate would waste a slot, a missing name would push a query
    # permanently behind the window. It must be exactly a permutation
    # of the registered query names.
    import __spark_entry__ as e

    pr = e._PRIORITY
    assert len(pr) == len(set(pr)), "duplicate _PRIORITY entries"
    assert set(pr) == set(e.queries()), "registry/_PRIORITY mismatch"


def test_bench_headline_names_are_registered():
    # A typo in bench.py's HEADLINE tuple would crash the driver's
    # per-round benchmark run; pin every name to the registry.
    import bench
    import __spark_entry__ as e

    missing = [n for n in bench.HEADLINE if n not in e.queries()]
    assert missing == [], missing
