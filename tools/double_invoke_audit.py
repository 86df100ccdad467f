"""Same-session double-invocation determinism audit.

Invokes every registered query twice in ONE session and compares the
two results as sorted row multisets. The second invocation is the one
that hits the session-shared caches (shared_persist frames, keyed
artifacts, stream scratch reuse) instead of building them — a stale or
half-keyed cache shows up as a diff here and nowhere else
(tests/test_artifact_reuse.py covers six representative queries; this
tool sweeps all of them).

    python tools/double_invoke_audit.py [--trials N] [sf_dir] [names...]

Prints PASS/DIFF per query and exits nonzero on any DIFF.

``--trials N`` (default 2) is the soak analog of the reference's
``test-mr-many.sh`` flakiness amplifier (src/main/test-mr-many.sh:15-21
reruns the whole suite N times because rare races need repetition to
surface): every query runs N times in the one session and ALL N row
multisets must agree — trial i vs trial 1, any difference fails.
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

    argv = sys.argv[1:]
    trials = 2
    if "--trials" in argv:
        i = argv.index("--trials")
        trials = int(argv[i + 1])
        del argv[i : i + 2]
    if trials < 2:
        print("--trials must be >= 2 (a single run compares nothing)")
        return 2
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    spark = get_spark("mmrs_double_invoke")
    failures = []
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            first = _rows(fn(spark, sf_dir))
            bad = None
            for t in range(1, trials):
                again = _rows(fn(spark, sf_dir))
                if again != first:
                    bad = (t + 1, again)
                    break
        except Exception as ex:  # surfaced for triage
            failures.append(name)
            print(f"ERROR {name}: {ex}")
            continue
        if bad is None and first is not None:
            print(f"PASS {name} ({time.time() - t0:.1f}s, {len(first)} rows, {trials} trials)")
        else:
            failures.append(name)
            trial_no, second = bad
            a, b = len(first), len(second)
            diff = next(
                (pair for pair in zip(first, second) if pair[0] != pair[1]),
                None,
            )
            print(f"DIFF {name}: trial {trial_no}: {a} vs {b} rows; first diff {diff}")
    print(f"{len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
