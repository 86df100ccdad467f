"""Same-session double-invocation determinism audit.

Invokes every registered query twice in ONE session and compares the
two results as sorted row multisets. The second invocation is the one
that hits the session-shared caches (shared_persist frames, keyed
artifacts, stream scratch reuse) instead of building them — a stale or
half-keyed cache shows up as a diff here and nowhere else
(tests/test_artifact_reuse.py covers six representative queries; this
tool sweeps all of them).

    python tools/double_invoke_audit.py [sf_dir] [names...]

Prints PASS/DIFF per query and exits nonzero on any DIFF.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rows(df):
    # NULL-safe total order: rollup/cube results carry None grouping
    # cells, which plain tuple comparison cannot order against str.
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


def main() -> int:
    import __spark_entry__ as entrymod
    from mit_map_reduce_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("mmrs_double_invoke")
    failures = []
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            first = _rows(fn(spark, sf_dir))
            second = _rows(fn(spark, sf_dir))
        except Exception as ex:  # surfaced for triage
            failures.append(name)
            print(f"ERROR {name}: {ex}")
            continue
        if first == second and first is not None:
            print(f"PASS {name} ({time.time() - t0:.1f}s, {len(first)} rows)")
        else:
            failures.append(name)
            a, b = len(first), len(second)
            diff = next(
                (pair for pair in zip(first, second) if pair[0] != pair[1]),
                None,
            )
            print(f"DIFF {name}: {a} vs {b} rows; first diff {diff}")
    print(f"{len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
