"""Sequential single-process MapReduce executor — the parity oracle.

Plays the role of the reference's ``mrsequential``
(``src/main/mrsequential.go:28-90``): scan all files, run map over
each, globally sort the intermediate pairs, group runs of equal keys,
run reduce per group. Used by the test suite to differential-test
:func:`mit_map_reduce_spark.mapreduce.job.run_job`, mirroring the
reference's golden-output methodology (``src/main/test-mr.sh:81-83``).
"""

from __future__ import annotations

import glob
import os
from itertools import groupby
from operator import itemgetter

from mit_map_reduce_spark.mapreduce.job import MapFn, ReduceFn


def run_sequential(
    map_fn: MapFn,
    reduce_fn: ReduceFn,
    inputs: list[str],
    *,
    use_basename: bool = True,
) -> list[tuple[str, str]]:
    paths: list[str] = []
    for pattern in inputs:
        matched = sorted(glob.glob(pattern))
        paths.extend(matched if matched else [pattern])

    intermediate: list[tuple[str, str]] = []
    for path in paths:
        with open(path, encoding="utf-8") as f:
            contents = f.read()
        name = os.path.basename(path) if use_basename else path
        intermediate.extend(map_fn(name, contents))

    # Global sort by key, then group — the reference's sort.Sort +
    # linear group scan (src/main/mrsequential.go:62,71-80).
    intermediate.sort(key=itemgetter(0))
    out: list[tuple[str, str]] = []
    for key, group in groupby(intermediate, key=itemgetter(0)):
        values = [v for _, v in group]
        out.append((key, reduce_fn(key, values)))
    return out
