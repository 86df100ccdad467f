"""Schema-explicit readers and scale-aware writers.

Design rules, applied uniformly:

- **Readers take an explicit schema** (or read a self-describing
  format). ``inferSchema`` on CSV/JSON costs a full extra pass over
  the data — at 100 TB that is a second 100 TB scan before the first
  real job starts. The reference never infers either: its schema is
  the hard-coded ``KeyValue{string,string}`` struct (reference
  ``src/mr/worker.go:18-21``).
- **Writers never coalesce to one file.** One file per task is what
  the output committer parallelizes; the reference likewise writes one
  ``mr-out-<R>`` per reduce partition (``src/mr/worker.go:219``).
  Atomic publish (temp file + rename, ``src/mr/worker.go:150-163``) is
  Spark's committer, not our code.
- ``partition_by`` columns turn into directory-level partition pruning
  for every downstream reader — the scan-time analog of the
  reference's per-file map tasks, but predicate-driven.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


# ---------------------------------------------------------------- readers


def read_whole_text(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """One row per file: (path string, content string).

    DataFrame-native version of the reference's whole-file scan
    (``src/mr/worker.go:243-254``): ``wholetext`` keeps each file a
    single record (never line-split — reference map fns receive entire
    contents), ``input_file_name()`` recovers the map key (the
    filename, used by e.g. ``src/mrapps/indexer.go:27``).

    Scale note: a whole file must fit in one task's memory — same
    constraint as the reference, which buffers the full file in one
    string (``src/mr/worker.go:137``).
    """
    if isinstance(paths, str):
        paths = [paths]
    # NB: must be the kwarg — pyspark 4.x's .text() wrapper overrides a
    # previously-set "wholetext" reader option with its parameter default.
    return spark.read.text(paths, wholetext=True).select(
        F.input_file_name().alias("path"), F.col("value").alias("content")
    )


def read_text_lines(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """One row per line: (path, line). The splittable variant — unlike
    ``wholetext``, Spark can split a large file across tasks at newline
    boundaries, so a single 1 TB log file still parallelizes."""
    if isinstance(paths, str):
        paths = [paths]
    return spark.read.text(paths).select(
        F.input_file_name().alias("path"), F.col("value").alias("line")
    )


def read_csv(
    spark: SparkSession,
    paths: list[str] | str,
    schema: StructType | str,
    *,
    header: bool = True,
    delimiter: str = ",",
    options: dict[str, str] | None = None,
) -> DataFrame:
    """CSV with a REQUIRED schema; malformed rows are captured, not
    dropped silently (PERMISSIVE + columnNameOfCorruptRecord).
    ``options`` passes reader options through (e.g. timestampFormat —
    pin it on BOTH sides of a round trip; the default format carries
    only millisecond precision)."""
    r = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
    )
    for k, v in (options or {}).items():
        r = r.option(k, v)
    return r.csv(paths if isinstance(paths, list) else [paths])


def read_json(
    spark: SparkSession,
    paths: list[str] | str,
    schema: StructType | str,
    *,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """JSON-lines with a REQUIRED schema (no sampling inference pass)."""
    r = spark.read.schema(schema)
    for k, v in (options or {}).items():
        r = r.option(k, v)
    return r.json(paths if isinstance(paths, list) else [paths])


def read_parquet(
    spark: SparkSession, paths: list[str] | str, columns: list[str] | None = None
) -> DataFrame:
    """Parquet scan; optional eager projection so column pruning is
    visible at the call site (Catalyst prunes either way)."""
    df = spark.read.parquet(*(paths if isinstance(paths, list) else [paths]))
    return df.select(*columns) if columns else df


def read_orc(
    spark: SparkSession, paths: list[str] | str, columns: list[str] | None = None
) -> DataFrame:
    """ORC scan — the other columnar format Spark ships natively;
    self-describing like parquet, with the same pushdown/pruning via
    DataSource v2."""
    df = spark.read.orc(*(paths if isinstance(paths, list) else [paths]))
    return df.select(*columns) if columns else df


# ---------------------------------------------------------------- writers


def write_text_kv(df: DataFrame, out_dir: str, n_partitions: int | None = None) -> None:
    """``"key value"`` lines — the reference's sink format
    (``src/mr/worker.go:214``). Expects columns (key, value)."""
    out = df.select(F.format_string("%s %s", F.col("key"), F.col("value")).alias("line"))
    if n_partitions:
        out = out.repartition(n_partitions, F.col("line"))
    out.write.mode("overwrite").text(out_dir)


def write_csv(
    df: DataFrame,
    out_dir: str,
    *,
    partition_by: list[str] | None = None,
    options: dict[str, str] | None = None,
) -> None:
    w = df.write.mode("overwrite").option("header", "true")
    for k, v in (options or {}).items():
        w = w.option(k, v)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.csv(out_dir)


def write_json(
    df: DataFrame,
    out_dir: str,
    *,
    partition_by: list[str] | None = None,
    options: dict[str, str] | None = None,
) -> None:
    w = df.write.mode("overwrite")
    for k, v in (options or {}).items():
        w = w.option(k, v)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(out_dir)


def write_parquet(
    df: DataFrame,
    out_dir: str,
    *,
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
    table_name: str | None = None,
) -> None:
    """Parquet sink; ``partition_by`` gives directory pruning,
    ``bucket_by`` (with ``table_name``, saveAsTable path) gives
    shuffle-free joins/aggs on the bucket keys for every downstream
    query — the 100 TB answer to a join both of whose sides are big.
    """
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        if not table_name:
            raise ValueError("bucketBy requires saveAsTable; pass table_name")
        w.bucketBy(n, *cols).sortBy(*cols).option("path", out_dir).saveAsTable(
            table_name
        )
    else:
        w.parquet(out_dir)


def write_orc(
    df: DataFrame, out_dir: str, *, partition_by: list[str] | None = None
) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(out_dir)
