"""Differential tests for the operator library at sf0.001 (fast).

Each registered query runs on Spark and on DuckDB (its oracle) over
the same parquet; results must match as an order-insensitive multiset —
the same gate the driver applies at sf0.01.
"""

import pytest

import __spark_entry__ as entrymod
from tests.util import assert_df_matches_oracle

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_query_has_oracle_or_is_flagged():
    missing = set(QUERIES) - set(ORACLES)
    # Any query without an oracle gets only a rows-only check from the
    # driver; keep that set EMPTY unless genuinely non-SQL-expressible.
    assert missing == set()


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    assert_df_matches_oracle(sdf, duck, ORACLES[name])


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["word", "cnt"]
