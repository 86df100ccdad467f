"""Non-vacuous-output invariant (round-12 verdict order #4).

The driver's hash comparison passes when BOTH engines return 0 rows
(`tools/check_correctness.py` only WARNs on the 0-row branch), so a
regression to empty output could silently hash-match an equally-empty
oracle forever. Pin the invariant the judge audited by hand across
eleven correctness rounds: every registered query returns >=1 row.

Default check runs at the suite SF (sf0.001). Queries whose output is
legitimately empty at that tiny scale go in SMALL_SF_EMPTY_OK with a
justification, and the companion test verifies each of THOSE returns
>=1 row at sf0.01 — the SF the grading driver actually compares at —
so no registry entry is ever exempt from the invariant entirely.
"""

import pytest

import __spark_entry__ as e

# name -> why sf0.001 alone is legitimately empty. Every entry here is
# still pinned non-vacuous at sf0.01 by test_allowlisted_nonvacuous_at_driver_sf.
SMALL_SF_EMPTY_OK = {
    "graph_jaccard_link_prediction": (
        "the sf0.001 co-purchase graph is too sparse for any vertex pair "
        "to share a neighbor above the score floor — zero candidate edges "
        "exist in the data (7 rows at sf0.01, driver-green r11)"
    ),
    "rel_q21_waiting_suppliers": (
        "TPC-H Q21's pattern (multi-supplier order where exactly one "
        "supplier is late) does not occur in the sf0.001 orders sample"
    ),
}

_ALL = sorted(e.queries())


def test_allowlist_names_are_registered():
    unknown = sorted(set(SMALL_SF_EMPTY_OK) - set(_ALL))
    assert unknown == [], f"allowlist entries not in the registry: {unknown}"


@pytest.mark.parametrize("name", _ALL)
def test_query_nonvacuous_at_suite_sf(name, spark, sf_dir):
    if name in SMALL_SF_EMPTY_OK:
        pytest.skip(
            "legitimately empty at tiny SF; pinned at sf0.01 by "
            "test_allowlisted_nonvacuous_at_driver_sf"
        )
    row = e.queries()[name](spark, sf_dir).first()
    assert row is not None, (
        f"{name} returned 0 rows at {sf_dir} — an equally-empty oracle "
        "would vacuously hash-match in the driver's correctness check"
    )


@pytest.mark.parametrize("name", sorted(SMALL_SF_EMPTY_OK))
def test_allowlisted_nonvacuous_at_driver_sf(name, spark):
    row = e.queries()[name](spark, "/root/testdata/sf0.01").first()
    assert row is not None, (
        f"{name} is allowlisted as empty-at-sf0.001 but must be "
        "non-vacuous at sf0.01, the driver's comparison SF"
    )
