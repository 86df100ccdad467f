"""mit_map_reduce_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
the reference MapReduce engine (adylanrff/mit-map-reduce, MIT 6.5840
Lab 1), re-expressed Spark-first:

- the reference's *entire* user API is ``Map(file, contents) -> [(k, v)]``
  / ``Reduce(k, [v]) -> v'`` over whole text files with a hash-shuffle
  barrier between the phases (reference ``src/mr/worker.go:46``,
  ``src/mr/coordinator.go:58-95``) — reproduced faithfully by
  :mod:`mit_map_reduce_spark.mapreduce`;
- every engine concern the reference hand-rolls (task scheduling,
  heartbeats, retry, shuffle materialization, phase barrier, atomic
  output commit — reference ``src/mr/coordinator.go``) is delegated to
  the Spark runtime, which provides the same or stronger guarantees;
- the relational / dedup / similarity / text / streaming operator
  library in :mod:`mit_map_reduce_spark.operators` and
  :mod:`mit_map_reduce_spark.streaming` fills the capability categories
  the reference lacks (SURVEY.md §2c), declared via DataFrame/SQL so
  Catalyst picks physical plans that survive 100 TB scale.
"""

__version__ = "0.1.0"

from mit_map_reduce_spark.session import get_spark  # noqa: F401
from mit_map_reduce_spark.catalog import load_table, load_tables  # noqa: F401
