"""The two-pass distributed rank (functions/rank.py): value parity
against naive single-window ranking, SQL-ntile parity, partitioning
invariance, and the structural pin that NO query routed through it
runs an unpartitioned window over a corpus-sized (file-scan-rooted)
frame — the round-4 verdict's "wire the two-pass rank in" item.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mit_map_reduce_spark.functions.rank import distributed_prefix, ntile_from_rank


def synth(spark, n=4000):
    # Unique id, duplicate-heavy value, 5-way group — the shapes the
    # order-statistics family feeds in.
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 7).alias("grp"),
        F.md5(F.col("id").cast("string")).alias("u"),
        ((F.col("id") * 2654435761) % 97).alias("v"),
    )


def test_global_rank_and_sums_match_naive_window(spark):
    df = synth(spark)
    got = (
        distributed_prefix(
            df,
            [F.col("v").asc(), F.col("id").asc()],
            sums={"cum_v": "v"},
            row_number="rn",
            total_count="n",
        )
        .select("id", "rn", "cum_v", "n")
        .collect()
    )
    w = W.orderBy("v", "id").rowsBetween(W.unboundedPreceding, W.currentRow)
    exp = df.select(
        "id",
        F.row_number().over(W.orderBy("v", "id")).alias("rn"),
        F.sum("v").over(w).alias("cum_v"),
        F.count("*").over(W.partitionBy()).alias("n"),
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))


def test_desc_order_matches_naive_window(spark):
    df = synth(spark)
    got = distributed_prefix(
        df, [F.col("v").desc(), F.col("id").asc()], row_number="rn"
    ).select("id", "rn")
    exp = df.select(
        "id", F.row_number().over(W.orderBy(F.col("v").desc(), "id")).alias("rn")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_grouped_rank_matches_naive_window(spark):
    df = synth(spark)
    got = distributed_prefix(
        df,
        ["v", "id"],
        group_by=["grp"],
        sums={"cum_v": "v"},
        row_number="rn",
        total_count="n",
    ).select("id", "rn", "cum_v", "n")
    wg = W.partitionBy("grp").orderBy("v", "id")
    exp = df.select(
        "id",
        F.row_number().over(wg).alias("rn"),
        F.sum("v").over(wg.rowsBetween(W.unboundedPreceding, W.currentRow)).alias(
            "cum_v"
        ),
        F.count("*").over(W.partitionBy("grp")).alias("n"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_rank_is_permutation_and_nparts_invariant(spark):
    # The contract that broke round-5's first draft: both consumers of
    # the range exchange must see ONE boundary draw — ranks must form
    # an exact permutation 1..N at any partition count.
    df = synth(spark, 3001)
    for n_parts in (2, 7, 32):
        r = distributed_prefix(df, ["u"], row_number="rn", n_parts=n_parts)
        agg = r.agg(
            F.count("*").alias("c"),
            F.countDistinct("rn").alias("d"),
            F.min("rn").alias("mn"),
            F.max("rn").alias("mx"),
        ).collect()[0]
        assert (agg.c, agg.d, agg.mn, agg.mx) == (3001, 3001, 1, 3001)


def test_empty_and_singleton_frames(spark):
    empty = synth(spark, 4000).filter(F.col("id") < 0)
    out = distributed_prefix(
        empty, ["u"], sums={"cum_v": "v"}, row_number="rn", total_count="n"
    )
    assert out.count() == 0
    assert set(out.columns) == {"id", "grp", "u", "v", "cum_v", "rn", "n"}
    one = synth(spark, 1)
    row = distributed_prefix(
        one, ["u"], sums={"cum_v": "v"}, row_number="rn", total_count="n"
    ).collect()[0]
    assert (row.rn, row.n, row.cum_v) == (1, 1, row.v)


def test_requires_some_output_column(spark):
    with pytest.raises(ValueError):
        distributed_prefix(synth(spark, 10), ["u"])


def test_grouped_rank_survives_extreme_group_skew(spark):
    # One group holds ~99% of rows (the viral-boilerplate shape): the
    # helper must still rank it correctly — range partitioning on
    # (group, order) spreads the hot group across partitions, and the
    # per-(group, pid) offsets must reassemble an exact permutation.
    df = spark.range(5000).select(
        F.col("id"),
        F.when(F.col("id") < 4950, F.lit("hot")).otherwise(
            F.concat(F.lit("cold"), (F.col("id") % 7).cast("string"))
        ).alias("grp"),
    )
    r = distributed_prefix(df, ["id"], group_by=["grp"], row_number="rn", n_parts=16)
    agg = r.groupBy("grp").agg(
        F.count("*").alias("c"),
        F.countDistinct("rn").alias("d"),
        F.min("rn").alias("mn"),
        F.max("rn").alias("mx"),
    )
    for row in agg.collect():
        assert (row.d, row.mn, row.mx) == (row.c, 1, row.c), row
    # ...and the hot group really does span multiple range partitions.
    spans = (
        df.repartitionByRange(16, "grp", "id")
        .withColumn("p", F.spark_partition_id())
        .filter(F.col("grp") == "hot")
        .select("p")
        .distinct()
        .count()
    )
    assert spans > 1


@pytest.mark.parametrize("n,k", [(7, 5), (10, 10), (23, 4), (1024, 10), (3, 8)])
def test_ntile_from_rank_matches_sql_ntile(spark, n, k):
    df = spark.range(1, n + 1).select(F.col("id").alias("rn"))
    got = df.select(
        "rn", ntile_from_rank(F.col("rn"), F.lit(n).cast("long"), k).alias("t")
    )
    exp = df.select("rn", F.ntile(k).over(W.orderBy("rn")).alias("t"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_ntile_from_rank_exhaustive_grid(spark):
    # Every (n, k, rn) for n<=40, k<=12 in ONE job, against a Python
    # transliteration of the SQL ntile rule (first n%k buckets get
    # floor(n/k)+1 rows) — the spot-checked parametrize above can miss
    # a boundary; 40*12 grids cannot.
    def sql_ntile(rn, n, k):
        base, rem = divmod(n, k)
        big = rem * (base + 1)
        if rn <= big:
            return (rn + base) // (base + 1)
        return rem + (rn - big + max(base, 1) - 1) // max(base, 1)

    rows = [
        (n, k, rn, sql_ntile(rn, n, k))
        for n in range(1, 41)
        for k in range(1, 13)
        for rn in range(1, n + 1)
    ]
    df = spark.createDataFrame(rows, "n long, k int, rn long, exp int")
    mismatches = [
        df.filter(F.col("k") == k)
        .withColumn("got", ntile_from_rank(F.col("rn"), F.col("n"), k))
        .filter(F.col("got") != F.col("exp"))
        .count()
        for k in range(1, 13)
    ]
    assert mismatches == [0] * 12


# ---------------------------------------------------------------------------
# Structural pin: no unpartitioned WindowExec over a file-scan-rooted
# subtree in any query routed through the helper (probe from the plans
# product API; tools/scan_global_windows.py sweeps the whole registry).
# Bounded windows are fine in two shapes: partition spec non-empty
# (per-__pid locals), or an unpartitioned window whose subtree is
# capped by a limit/TakeOrdered (terasort's fixed-K sample) or rooted
# at a cached/aggregated frame.
# ---------------------------------------------------------------------------

from mit_map_reduce_spark.plans import unpartitioned_corpus_windows


#: query -> allowed unpartitioned scan-rooted windows. Zero except
#: terasort, whose single allowed window is the lag over the 16-row
#: (TERA_PARTS-row) manifest aggregate — scan-rooted but provably
#: bounded by the pid grouping.
_REWIRED = {
    # 1: the running-lift window over the 10 decile cells — bounded
    # domain, visible since the probe descends into the pinned
    # exchange's cached plan (also in the repo-wide allowlist).
    "adv_decile_lift_table": 1,
    "adv_auc_purchase_score": 0,
    "adv_rfm_segmentation": 0,
    "adv_iqr_outlier_orders": 0,
    "rel_trimmed_mean_acctbal": 0,
    "rel_join_key_skew_report": 0,
    "text_weighted_median_quality": 0,
    "text_pack_sequences": 0,
    "text_shuffle_order": 0,
    "mr_terasort_manifest": 1,
}


@pytest.mark.parametrize("qname", sorted(_REWIRED))
def test_no_unpartitioned_corpus_window(spark, sf_dir, qname):
    import __spark_entry__ as entrymod

    df = entrymod.queries()[qname](spark, sf_dir)
    assert len(unpartitioned_corpus_windows(df)) == _REWIRED[qname]


def test_null_group_keys_rank_as_their_own_group(spark):
    # A NULL group must not vanish through the offset join (it is
    # null-safe); parity with the plain-window semantics that keep
    # null-keyed groups.
    df = synth(spark, 600).withColumn(
        "grp", F.when(F.col("grp") == 3, None).otherwise(F.col("grp"))
    )
    got = distributed_prefix(
        df, ["v", "id"], group_by=["grp"], row_number="rn", total_count="n"
    ).select("id", "rn", "n")
    wg = W.partitionBy("grp").orderBy("v", "id")
    exp = df.select(
        "id",
        F.row_number().over(wg).alias("rn"),
        F.count("*").over(W.partitionBy("grp")).alias("n"),
    )
    assert got.count() == 600
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))
