"""Property-based parity: distributed run == sequential oracle.

The reference amplifies its differential tests by rerunning the whole
suite N times (``src/main/test-mr-many.sh:15-21``); Hypothesis gets the
same effect by generating many random corpora. The invariant is SURVEY
§1: sorted (key, value) output of the Spark facade must equal the
pure-Python sequential executor for ANY input corpus and any of the
reference apps.

Spark jobs cost ~1 s each, so examples are capped; corpora include the
edge shapes that broke MapReduce implementations historically: empty
files, empty corpus-wide token sets, unicode, keys colliding across
files, single-file inputs.
"""

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mit_map_reduce_spark.mapreduce import run_job, run_sequential
from mit_map_reduce_spark.mapreduce.apps import (
    crashsafe_map,
    crashsafe_reduce,
    indexer_map,
    indexer_reduce,
    wc_map,
    wc_reduce,
)

# Text with ascii letters, digits, unicode letters, separators/controls.
TEXT = st.text(
    alphabet=st.sampled_from(list("abAB12 \n\t.,-_éß日") ),
    max_size=80,
)
CORPUS = st.dictionaries(
    keys=st.sampled_from([f"pg-{i}.txt" for i in range(4)]),
    values=TEXT,
    min_size=1,
    max_size=4,
)

APPS = [
    (wc_map, wc_reduce),
    (indexer_map, indexer_reduce),
    (crashsafe_map, crashsafe_reduce),
]


@pytest.mark.parametrize("app_idx", range(len(APPS)))
@given(corpus=CORPUS)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_distributed_equals_sequential(spark, tmp_path_factory, app_idx, corpus):
    map_fn, reduce_fn = APPS[app_idx]
    d = tmp_path_factory.mktemp("prop_corpus")
    for name, text in corpus.items():
        (d / name).write_text(text, encoding="utf-8")
    inputs = [os.path.join(str(d), "pg-*.txt")]
    golden = sorted(run_sequential(map_fn, reduce_fn, inputs))
    got = sorted(
        (r["key"], r["value"])
        for r in run_job(spark, map_fn, reduce_fn, inputs, n_reduce=3).collect()
    )
    assert got == golden
