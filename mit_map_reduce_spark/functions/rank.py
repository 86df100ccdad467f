"""Two-pass distributed rank / prefix-sum over a total order.

The scale-safe replacement for an unpartitioned global WindowExec
(Spark's ``WARN WindowExec: No Partition Defined ... moving all data
to a single partition``): range-partition on the order key, run the
window per partition IN PARALLEL, roll each partition's subtotal into
a tiny (``n_groups * n_parts``-row) offset table, and broadcast the
offsets back. Wall-clock is two scans of the frame and a broadcast —
no single task ever holds more than one range partition.

Factored out of ``text_shuffle_order`` / ``text_pack_sequences``
(round-4 verdict #3) so the order-statistics family — deciles, AUC
rank sums, RFM ntiles, weighted medians, Gini ranks, trimmed means —
shares one pinned, property-tested construction instead of each query
documenting "swap in the two-pass rank at 100 TB".

Determinism contract: ``group_by + order_by`` must be a TOTAL order
(unique per row). ``repartitionByRange`` picks boundaries from a
nondeterministic reservoir sample, so two rows that compare equal may
land in different partitions and rank in either order; with a unique
key, ranks depend only on the ordering, never on the boundaries
(pinned by the partitioning-invariance property test). Callers with
duplicate natural keys aggregate them first (AUC collapses to
distinct scores) or append a tie-break column (``doc_id``,
``event_id``). Order keys must also be non-null: Spark ranks nulls
FIRST on ASC where the DuckDB oracles rank them LAST, so a nullable
key would order differently across engines long before it reached
this helper (current callers rank on non-null columns or md5 keys).

No reference analog — the reference's sort is a per-reduce-task
in-memory ``sort.Slice`` (reference ``src/main/mrworker.go`` path,
``src/mr`` worker reduce phase); this is the multi-partition total
order that construction scales to.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["distributed_prefix", "ntile_from_rank"]


def _pinned_range_partition(
    df: DataFrame,
    part_exprs: Sequence[Column | str],
    n_parts: int,
    label_facts: str = "",
) -> DataFrame:
    """Range-partition ``df`` and pin ``spark_partition_id`` by
    materializing the exchange ONCE (session-registry persist,
    MEMORY_AND_DISK).

    Why: ``repartitionByRange`` samples its boundaries per physical
    exchange, and ``spark_partition_id()`` is nondeterministic, so two
    plan branches over the same repartition get two INDEPENDENT
    samples — the window branch and the offset branch would then
    disagree about which partition a row sits in (observed: decile
    sizes 1012/1040/... instead of N/10; AQE stage reuse does not
    reliably deduplicate the exchanges). Persisting the partitioned
    frame freezes one boundary draw for every consumer — the same data
    a distributed sort materializes as run files anyway. The registry
    key includes the input's canonicalized plan, so repeated calls
    (bench repeats, gate double-runs) share one cache instead of
    stacking duplicates; ``catalog.clear_shared_caches`` unpersists.
    """
    from mit_map_reduce_spark import catalog

    d = df.repartitionByRange(n_parts, *part_exprs).withColumn(
        "__pid", F.spark_partition_id()
    )
    key = "rank:{}|{}|{}".format(
        df._jdf.queryExecution().analyzed().canonicalized().toString(),
        ",".join(str(c) for c in part_exprs),
        n_parts,
    )
    # Build-event label from STABLE call-site facts only: the key's
    # canonicalized plan text varies across sessions (commutative
    # operand order), which made the derived label's hash drift and
    # lapse the bench's per-artifact cold-build coverage (r12).
    # label_facts (the caller's requested output names) distinguishes
    # same-shaped frames from different call sites; residual risk: two
    # calls with identical columns, ordering, width AND output names
    # still merge — acceptable for a drift ADVISORY, and the unstable
    # plan text cannot help without reintroducing the hash drift.
    label = "rank:{}|{}|cols={}{}".format(
        ",".join(str(c) for c in part_exprs),
        n_parts,
        ",".join(df.columns),
        f"|{label_facts}" if label_facts else "",
    )
    return catalog.shared_persist(
        df.sparkSession,
        key,
        "",
        lambda: d.persist(StorageLevel.MEMORY_AND_DISK),
        label=label,
    )


def distributed_prefix(
    df: DataFrame,
    order_by: Sequence[Column | str],
    *,
    group_by: Sequence[str] = (),
    sums: Mapping[str, Column | str] | None = None,
    row_number: str | None = None,
    total_count: str | None = None,
    n_parts: int | None = None,
) -> DataFrame:
    """Append global (or per-``group_by``) order statistics to ``df``
    without an unpartitioned window.

    order_by: sort expressions (Columns, possibly ``.desc()``, or
        column names). Together with ``group_by`` they must order rows
        totally — see the module docstring.
    group_by: optional partition keys (plain column names). Ranks and
        prefix sums restart per group, and NO group ever runs as a
        single task: range partitioning splits on
        ``(group_by, order_by)``, so one hot group spreads over many
        partitions while the per-(group, partition) offset table keeps
        ranks exact. Intended for LOW-cardinality groups (the offset
        table, ``n_groups * n_parts`` rows, must broadcast) — a
        high-cardinality group key means small groups, where a plain
        ``partitionBy(group)`` window is already the right plan.
        Null group keys are safe: the offset join matches them with
        ``eqNullSafe`` (still valid broadcast-hash-join keys), so a
        null group ranks as its own group — the same semantics a plain
        ``partitionBy(group)`` window gives — instead of silently
        vanishing through a null-unsafe equi-join.
    sums: ``{out_col: summed_col}`` — inclusive running totals over
        the order (the distributed prefix sum).
    row_number: name for a 1-based rank column.
    total_count: name for the group's total row count (the ``n`` that
        quantile/ntile/trim cuts need) — computed from the same offset
        table, not a second window pass.

    Returns ``df`` with the requested columns appended. Cost: one
    range-exchange of ``df`` + per-partition sort, a
    ``n_groups * n_parts``-row aggregate, and a broadcast join.
    """
    sums = dict(sums or {})
    if not (sums or row_number or total_count):
        raise ValueError("request at least one of sums/row_number/total_count")
    group_by = list(group_by)
    order_cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    if n_parts is None:
        n_parts = max(2, df.sparkSession.sparkContext.defaultParallelism // 2)

    facts = ",".join(
        filter(None, [*sums, row_number or "", total_count or ""])
    )
    d = _pinned_range_partition(
        df, [*group_by, *order_cols], n_parts, label_facts=f"out={facts}"
    )
    w_in = (
        W.partitionBy(*group_by, "__pid")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local_cols = [
        F.sum(c).over(w_in).alias(f"__loc_{name}") for name, c in sums.items()
    ]
    if row_number or total_count:
        local_cols.append(
            F.row_number()
            .over(W.partitionBy(*group_by, "__pid").orderBy(*order_cols))
            .alias("__loc_rn")
        )
    local = d.select("*", *local_cols)

    # Offset table: one row per (group, range partition). RangePartitioner
    # assigns ascending key ranges to ascending partition ids, so the
    # exclusive prefix over __pid is exactly each partition's global offset.
    subtotal_aggs = [F.count("*").alias("__cnt")] + [
        F.sum(c).alias(f"__sub_{name}") for name, c in sums.items()
    ]
    sub = d.groupBy(*group_by, "__pid").agg(*subtotal_aggs)
    w_off = (
        W.partitionBy(*group_by)
        .orderBy("__pid")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    off_cols = [
        (F.sum(f"__sub_{name}").over(w_off) - F.col(f"__sub_{name}")).alias(
            f"__off_{name}"
        )
        for name in sums
    ]
    if row_number or total_count:
        off_cols.append(
            (F.sum("__cnt").over(w_off) - F.col("__cnt")).alias("__off_rn")
        )
    if total_count:
        w_all = (
            W.partitionBy(*group_by)
            .orderBy("__pid")
            .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        )
        off_cols.append(F.sum("__cnt").over(w_all).alias("__grp_total"))
    offsets = sub.select(*group_by, "__pid", *off_cols)

    off = offsets
    for c in [*group_by, "__pid"]:
        off = off.withColumnRenamed(c, f"__r_{c}")
    cond = F.col("__pid") == F.col("__r___pid")
    for g in group_by:
        # eqNullSafe: a NULL group must join its own offset row, not
        # silently drop out (plain windows keep null groups).
        cond = cond & F.col(g).eqNullSafe(F.col(f"__r_{g}"))
    joined = local.join(F.broadcast(off), cond).drop(
        *[f"__r_{c}" for c in [*group_by, "__pid"]]
    )
    out_cols = [
        (F.col(f"__off_{name}") + F.col(f"__loc_{name}")).alias(name)
        for name in sums
    ]
    if row_number:
        out_cols.append((F.col("__off_rn") + F.col("__loc_rn")).alias(row_number))
    if total_count:
        out_cols.append(F.col("__grp_total").alias(total_count))
    return joined.select(*df.columns, *out_cols)


def ntile_from_rank(rn: Column, n: Column, k: int) -> Column:
    """SQL-standard ``ntile(k)`` from a 1-based rank and group size —
    first ``n % k`` buckets get ``n div k + 1`` rows, the rest
    ``n div k`` (the rule Spark and DuckDB both implement) — so an
    ntile can ride :func:`distributed_prefix` instead of a single-task
    ordered window.

    Integer-exact while ``n`` stays under 2^52 (double division below
    is correctly rounded and the quotients are off-boundary); beyond
    that, swap the casts for decimal division.
    """
    base = F.floor(n / k)  # bucket floor size
    rem = n - base * k  # first `rem` buckets take base+1 rows
    big = rem * (base + 1)  # rows covered by the bigger buckets
    in_big = F.ceil(rn / (base + 1))
    in_small = rem + F.ceil((rn - big) / F.greatest(base, F.lit(1)))
    return (
        F.when(rn <= big, in_big).otherwise(in_small).cast("int")
    )
