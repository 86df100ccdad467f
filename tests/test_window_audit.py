"""Repo-wide unpartitioned-window sweep as a pytest GATE (round-6
verdict #3): the audit that used to be a manually-run tool
(tools/scan_global_windows.py) now fails the suite if ANY of the 250
registered queries — batch or streaming — grows a single-partition
window the allowlist doesn't justify. The fuzzy-match single-task
scan hid for a round precisely because this class of check was
manual; a gate can't be forgotten.

One test, one pass over the registry (~2 min at sf0.001): per-query
parametrization would rebuild the SparkSession-shared artifacts 250
times for no added signal, and a single report lists every deviation
at once.
"""

from __future__ import annotations

from tools.scan_global_windows import scan_repo


def test_no_query_has_unexplained_unpartitioned_windows(spark, sf_dir):
    flags = scan_repo(spark, sf_dir)
    assert flags == []
