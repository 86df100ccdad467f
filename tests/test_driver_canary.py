"""Driver-environment canary for the artifact-backed source queries.

The grading driver runs in a FRESH container: empty TMPDIR, a vanilla
``SparkSession`` (none of our session-factory configs), and it writes
every scratch artifact itself. Three times (rounds 6-8) a ``src_*``
query passed every local check yet failed the driver's value hash —
an environment-class divergence this suite is built to reproduce
BEFORE the driver run: each ``src_*`` family is driven through
``tools/check_correctness.py --vanilla`` in a SUBPROCESS whose
``TMPDIR`` points at a throwaway directory, so every shared scratch
artifact is rebuilt from nothing exactly as the driver container
rebuilds it.

One subprocess per test (not per query) keeps JVM startup cost to a
few seconds while still giving per-family failure isolation; the
gate's own output (PASS/FAIL per query with first mismatching rows)
is surfaced on assertion failure.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE = os.path.join(REPO, "tools", "check_correctness.py")
SF_DIR = "/root/testdata/sf0.01"

#: Split so a failure names the family, while JVM startup (~5 s) is
#: paid only a few times. The quarantine query runs ALONE — it is the
#: three-time red driver row this canary exists for (scratch-free and
#: integer-math since round 9, so the fresh-TMPDIR posture is now a
#: regression tripwire rather than the suspect surface).
FAMILIES = {
    "quarantine": ["src_csv_malformed_quarantine"],
    "roundtrips": [
        "src_csv_roundtrip_orders",
        "src_orc_roundtrip_lineitem",
        "src_json_roundtrip_events",
        "src_gzip_jsonl_roundtrip_docs",
        "src_fixed_width_roundtrip",
        "src_text_kv_roundtrip_wc",
    ],
    "layout": [
        "src_partitioned_pruning_events",
        "src_dynamic_partition_overwrite",
        "src_compact_small_files",
        "src_schema_evolution_merge",
    ],
}


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_src_queries_match_oracle_in_fresh_driverlike_env(family, tmp_path):
    names = FAMILIES[family]
    scratch = tmp_path / "driver-tmp"
    scratch.mkdir()
    env = dict(os.environ)
    env["TMPDIR"] = str(scratch)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, GATE, SF_DIR, "--vanilla", *names],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"vanilla fresh-TMPDIR gate failed for {family}:\n"
        f"{proc.stdout[-4000:]}\n{proc.stderr[-2000:]}"
    )
    # Every requested query must actually have produced a PASS line —
    # a typo'd name silently matching nothing would be a vacuous green.
    for name in names:
        assert f"PASS {name} " in proc.stdout, (
            f"no PASS line for {name}:\n{proc.stdout[-4000:]}"
        )
