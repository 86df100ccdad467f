"""A pre-publish warehouse quality audit over the star schema.

Composes the engine's data-quality operators the way a nightly load
gate does: referential integrity across every FK edge, calendar
completeness of the order history, order-invariant table checksums
(the numbers a replica must reproduce), a snapshot diff localizing
drift against the last load, and the chi-square independence screen.
Everything stays distributed; each section prints its verdict.

    python examples/warehouse_quality_audit.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mit_map_reduce_spark.operators.relational import (
    rel_calendar_gap_audit,
    rel_fk_integrity_audit,
    rel_segment_priority_chi2,
    rel_snapshot_diff_orders,
    rel_table_checksums,
)
from mit_map_reduce_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("warehouse_quality_audit")

    print("== referential integrity ==")
    fk = rel_fk_integrity_audit(spark, sf_dir).collect()
    for r in fk:
        flag = "OK " if r.ok else "FAIL"
        print(f"  [{flag}] {r.fk_edge}: {r.orphan_rows} orphans / {r.child_rows} rows")

    print("== calendar completeness (orders) ==")
    gaps = rel_calendar_gap_audit(spark, sf_dir).collect()
    if not gaps:
        print("  no missing days")
    for r in sorted(gaps, key=lambda r: r.day)[:10]:
        print(f"  missing {r.day.date()} ({r.n_missing_in_year} gaps in {r.year})")

    print("== table checksums (hand these to the replica) ==")
    for r in rel_table_checksums(spark, sf_dir).collect():
        print(f"  {r.table_name:10s} rows={r.n_rows:>9} checksum={r.checksum}")

    print("== snapshot diff vs prior load ==")
    for r in rel_snapshot_diff_orders(spark, sf_dir).collect():
        print(
            f"  {r.o_orderpriority}: +{r.n_added} ~{r.n_changed} "
            f"-{r.n_deleted} ={r.n_identical}"
        )

    print("== segment x priority independence ==")
    chi = rel_segment_priority_chi2(spark, sf_dir).first()
    print(f"  chi2={chi.chi2} dof={chi.dof} over {chi.n_cells} cells")

    spark.stop()


if __name__ == "__main__":
    main()
