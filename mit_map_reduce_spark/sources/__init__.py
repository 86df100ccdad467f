"""Source / sink surface of the engine.

The reference's only source is a whole-file text scan (its dataset is
an argv list of files — reference ``src/main/mrcoordinator.go:21-26``,
scan ``src/mr/worker.go:243-254``) and its only sink is partitioned
``"key value"`` text files (``src/mr/worker.go:214``). Those two live
with the MapReduce facade (:mod:`mit_map_reduce_spark.mapreduce.job`).

This package is the *general* connector surface a Spark-native engine
exposes beyond that: schema-explicit readers (no inference scans) and
scale-aware writers for text / CSV / JSON / parquet / ORC.
"""

from mit_map_reduce_spark.sources.io import (  # noqa: F401
    read_whole_text,
    read_text_lines,
    read_csv,
    read_json,
    read_parquet,
    read_orc,
    write_text_kv,
    write_csv,
    write_json,
    write_parquet,
    write_orc,
)
