"""Migrating from the reference MapReduce engine: word count.

The reference runs this as ``mrcoordinator pg-*.txt`` + N workers
loading ``wc.so`` (reference src/main/mrcoordinator.go, src/mrapps/wc.go).
Here the same two user functions — identical signatures — run through
``run_job``; Spark replaces the coordinator, workers, shuffle files,
heartbeats, and crash recovery.

    python examples/wordcount_mapreduce.py /path/to/texts/'*.txt'
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mit_map_reduce_spark.mapreduce import run_job, save_text_output
from mit_map_reduce_spark.mapreduce.apps import wc_map, wc_reduce
from mit_map_reduce_spark.session import get_spark


def main() -> None:
    inputs = sys.argv[1:] or ["/root/testdata/README-like-corpus-goes-here/*.txt"]
    spark = get_spark("wordcount_example")

    # map/reduce contract identical to the reference:
    #   wc_map(filename, contents) -> [(word, "1"), ...]
    #   wc_reduce(word, values)    -> str(len(values))
    result = run_job(spark, wc_map, wc_reduce, inputs, n_reduce=10)

    # "key value" lines, one file per reduce partition — the mr-out-*
    # layout (reference src/mr/worker.go:214,219)
    save_text_output(result, "/tmp/mr-out-wordcount", n_reduce=10)
    for row in result.orderBy("key").limit(10).collect():
        print(row.key, row.value)


if __name__ == "__main__":
    main()
