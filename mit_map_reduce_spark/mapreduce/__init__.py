"""MapReduce-compatible job facade — the reference's entire user API.

The reference engine's contract (reference ``src/mr/worker.go:18-21,46``):

- input: a list of text files; each map call receives
  ``(filename, whole file contents)``;
- ``map_fn(filename, contents) -> list[(key, value)]`` (a UDTF);
- shuffle: hash-partition by key into ``n_reduce`` buckets
  (``src/mr/worker.go:32-38,140``), then group all values per key;
- ``reduce_fn(key, values) -> value`` (a UDAF over the collected group;
  value order within the group is UNSPECIFIED — reference apps sort
  inside reduce when they need determinism, ``src/mrapps/indexer.go:37``);
- output: ``"key value"`` text lines partitioned into ``n_reduce``
  files (``src/mr/worker.go:214``).

Everything else the reference implements — task scheduling, heartbeats,
10 s straggler timeout, phase barrier, atomic output publish
(``src/mr/coordinator.go``) — is the Spark runtime here and is
deliberately not reimplemented.
"""

from mit_map_reduce_spark.mapreduce.job import run_job, save_text_output  # noqa: F401
from mit_map_reduce_spark.mapreduce.sequential import run_sequential  # noqa: F401
