"""Fault-injection analog of the reference crash test.

The reference crashes workers randomly and asserts the output still
equals the no-crash golden (src/mrapps/crash.go, src/main/test-mr.sh:289-319).
Spark's equivalent guarantee is task re-execution from lineage: a map
function that fails on the FIRST attempt of each partition must still
yield exactly-once output, because Spark retries the task and only a
completed attempt commits.
"""

import os

import pytest
from pyspark import TaskContext

from mit_map_reduce_spark.mapreduce import run_sequential
from mit_map_reduce_spark.mapreduce.apps import wc_map, wc_reduce


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("crash_corpus")
    for i in range(4):
        (d / f"f{i}.txt").write_text(f"alpha beta gamma file{i} " * 20)
    return str(d)


def test_retry_yields_exactly_once_output(corpus_dir):
    from mit_map_reduce_spark.mapreduce.job import run_job
    from mit_map_reduce_spark.session import get_spark

    # maxFailures must exceed 1; it is cluster-wide, so build a session
    # with the option set (getOrCreate reuses the JVM if compatible).
    spark = get_spark("mmrs_crash_test")
    master = spark.sparkContext.master
    if "," not in master:
        pytest.skip(f"master {master} has no task retries")

    def crashing_wc_map(filename: str, contents: str):
        # First attempt of every task dies mid-map — like crash.go's
        # os.Exit(1) at p≈1/3, but deterministic. Defined inside the
        # test so cloudpickle serializes it by value.
        if TaskContext.get().attemptNumber() == 0:
            raise RuntimeError("injected crash (first attempt)")
        return wc_map(filename, contents)

    inputs = [os.path.join(corpus_dir, "f*.txt")]
    golden = sorted(run_sequential(wc_map, wc_reduce, inputs))
    got = sorted(
        (r["key"], r["value"])
        for r in run_job(spark, crashing_wc_map, wc_reduce, inputs, n_reduce=3).collect()
    )
    assert got == golden
