"""Table catalog for the driver-generated parquet testdata.

The reference engine has no catalog — its "dataset" is an argv list of
text files, one map task per file (reference ``src/main/mrcoordinator.go:21-26``,
``src/mr/coordinator.go:242-253``). Here every table is self-describing
parquet; Spark's DataSource v2 gives column pruning + predicate pushdown
into the scan, which the reference cannot do (it always materializes the
whole file — ``src/mr/worker.go:137``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any realistic scale
#: factor (region=5 rows, nation=25 rows always; supplier/part grow
#: slowly). Used by operators to hint broadcast joins.
BROADCAST_TABLES = ("region", "nation", "supplier", "part")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Fan a small input out across the cluster before compute-heavy
    derivation (shingling, hashing, pair joins).

    A single small parquet file arrives as ONE partition, so any
    operator that multiplies work per row (explode x k, self-join)
    would otherwise run on one core. The repartition shuffles only the
    small source rows — cheap — and buys full parallelism downstream.
    At 100 TB inputs are already thousands of partitions and this is a
    no-op cost-wise (still one extra round-robin shuffle; callers only
    use it ahead of work that dwarfs it).
    """
    n = df.sparkSession.sparkContext.defaultParallelism * factor
    return df.repartition(n)


def normalize_nanos_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Convert a TIMESTAMP(NANOS)-read-as-long column to timestamp.

    Spark has no nanosecond timestamp; with
    ``spark.sql.legacy.parquet.nanosAsLong`` the parquet NANOS column
    arrives as epoch-nanos long. Integer ``div`` keeps full precision
    (the values exceed double's 2^53 mantissa).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if col in df.columns and isinstance(df.schema[col].dataType, T.LongType):
        df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # Runtime-settable; required even when the session wasn't built
        # by our factory (e.g. the verification driver's own session).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = normalize_nanos_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
