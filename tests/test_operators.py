"""Differential tests for the operator library at sf0.001 (fast).

Each registered query runs on Spark and on DuckDB (its oracle) over
the same parquet; results must match as an order-insensitive multiset —
the same gate the driver applies at sf0.01.
"""

import pytest

import __spark_entry__ as entrymod
from tests.util import assert_df_matches_oracle

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_query_has_oracle_or_is_flagged():
    missing = set(QUERIES) - set(ORACLES)
    # Any query without an oracle gets only a rows-only check from the
    # driver; keep that set EMPTY unless genuinely non-SQL-expressible.
    assert missing == set()


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    assert_df_matches_oracle(sdf, duck, ORACLES[name])


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["word", "cnt"]


def test_ivf_trained_cells_recall_vs_bruteforce(spark, sf_dir):
    # The trained-k-means IVF is approximate by design (fixed k cells,
    # N_PROBE probes); this pins a recall@k floor against the exact
    # brute-force path so a broken quantizer (e.g. all vectors in one
    # cell, empty probes) fails loudly. Synthetic embeddings are
    # near-random, so the floor is modest; measured ~0.32 at sf0.001,
    # ~0.40 at sf0.01 with k=16, n_probe=2.
    from mit_map_reduce_spark.operators.similarity import (
        ann_bruteforce_topk,
        ann_ivf_topk,
    )

    exact: dict[int, set] = {}
    for r in ann_bruteforce_topk(spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx: dict[int, set] = {}
    for r in ann_ivf_topk(spark, sf_dir).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.25


def test_ivf_centroid_count_fixed(spark, sf_dir):
    # The round-1 quantizer grew centroids with the corpus (vec_id % 50
    # -> k = n/50); the trained quantizer must keep k = K_CELLS at any
    # scale factor (the property that makes the assignment broadcast
    # safe at 100 TB).
    from mit_map_reduce_spark.operators.similarity import (
        K_CELLS,
        _emb_with_norm,
        _trained_centroids,
    )

    cents = _trained_centroids(_emb_with_norm(spark, sf_dir))
    assert cents.count() <= K_CELLS


def test_hot_shingle_cap_bounds_pair_count(spark):
    # A planted stop-phrase shared by every document must not generate
    # O(n^2) pairs once its document frequency exceeds the cap. 40 docs
    # share ONE hot shingle; each also has a unique shingle, and one
    # genuine near-dup pair shares a second (cool) shingle.
    from pyspark.sql import functions as F
    from mit_map_reduce_spark.operators.dedup import _jaccard_pairs_from_shingles

    rows = []
    for i in range(40):
        shingles = ["every doc has this stop phrase", f"unique shingle number {i} here"]
        if i in (0, 1):
            shingles.append("genuine duplicate content shingle x")
        rows.append((i, shingles, len(shingles)))
    arrs = spark.createDataFrame(rows, "doc_id long, shingles array<string>, sz int")

    uncapped = _jaccard_pairs_from_shingles(arrs, max_df=10**9).count()
    assert uncapped == 40 * 39 // 2  # the quadratic blowup the cap prevents

    capped = _jaccard_pairs_from_shingles(arrs, max_df=10)
    got = {(r.doc_a, r.doc_b): r.n_shared for r in capped.collect()}
    # Only the genuine pair survives, counting only its cool shingle.
    assert got == {(0, 1): 1}


def test_embedding_lsh_pairs_recall_vs_exact(spark, sf_dir):
    # The banded-LSH near-dup path must recover a usable fraction of
    # the exact quadratic baseline's pairs (it can only MISS pairs,
    # never invent them — every candidate is re-scored with exact
    # cosine). Measured ~0.5 recall at sf0.01 with 4 bands x 4 rows.
    from mit_map_reduce_spark.operators.dedup import (
        embedding_dup_pairs,
        embedding_lsh_dup_pairs,
    )

    exact = {(r.vec_a, r.vec_b) for r in embedding_dup_pairs(spark, sf_dir).collect()}
    lsh = {(r.vec_a, r.vec_b) for r in embedding_lsh_dup_pairs(spark, sf_dir).collect()}
    assert lsh <= exact  # no false positives
    if exact:
        assert len(lsh & exact) / len(exact) >= 0.3


def test_lsh_multiprobe_recall_vs_bruteforce(spark, sf_dir):
    # Multi-probe (own bucket + all Hamming-1 buckets) is what makes
    # the single-table LSH usable: recall was 0.16 probing one bucket,
    # ~0.52-0.60 with multi-probe. Floor well below measured, far above
    # the single-probe regime, so losing the probe fan-out fails this.
    from mit_map_reduce_spark.operators.similarity import (
        ann_bruteforce_topk,
        ann_lsh_topk,
    )

    exact: dict[int, set] = {}
    for r in ann_bruteforce_topk(spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx: dict[int, set] = {}
    for r in ann_lsh_topk(spark, sf_dir).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.4


def test_retention_cohorts_invariants(spark, sf_dir):
    # Day-0 retention is exactly 1.0 (every user is active on their
    # own first day), n_active never exceeds cohort_size, and summing
    # cohort sizes recovers the distinct user count.
    from pyspark.sql import functions as F
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.operators.advanced import adv_retention_cohorts

    r = adv_retention_cohorts(spark, sf_dir)
    assert r.filter((F.col("day_offset") == 0) & (F.col("retention") != 1.0)).count() == 0
    assert r.filter(F.col("n_active") > F.col("cohort_size")).count() == 0
    total = (
        r.filter(F.col("day_offset") == 0).agg(F.sum("cohort_size")).first()[0]
    )
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert total == n_users


def test_audio_energy_windows_cover_all_frames(spark, sf_dir):
    # Window geometry invariant: per doc, the windows tile the decoded
    # frame stream exactly — sum(n_win_frames) == n_frames, indexes
    # contiguous from 0, every window holds 1..AUDIO_WIN frames.
    from pyspark.sql import functions as F
    from mit_map_reduce_spark.operators.multimodal import (
        AUDIO_WIN,
        mm_audio_energy_windows,
        mm_decode_assets,
    )

    win = mm_audio_energy_windows(spark, sf_dir)
    per_doc = win.groupBy("doc_id").agg(
        F.sum("n_win_frames").alias("covered"),
        F.count("*").alias("n_windows"),
        F.max("window_idx").alias("max_idx"),
        F.min("n_win_frames").alias("min_w"),
        F.max("n_win_frames").alias("max_w"),
    )
    frames = mm_decode_assets(spark, sf_dir).filter(
        (F.col("media_type") == "audio") & (F.col("n_frames") > 0)
    )
    j = frames.join(per_doc, "doc_id", "full")
    bad = j.filter(
        F.col("covered").isNull()
        | F.col("n_frames").isNull()
        | (F.col("covered") != F.col("n_frames"))
        | (F.col("max_idx") != F.col("n_windows") - 1)
        | (F.col("min_w") < 1)
        | (F.col("max_w") > AUDIO_WIN)
    )
    assert bad.count() == 0


def test_hll_union_merge_equals_single_level_sketch(spark, sf_dir):
    # The property the operator exists to demonstrate: merging
    # per-nation sketches must give the same estimate as sketching the
    # region's raw stream directly — partial states are lossless under
    # union, so incremental rollups are safe.
    from pyspark.sql import functions as F
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.operators.sketch import HLL_LGK, sketch_hll_union_merge

    merged_rows = sketch_hll_union_merge(spark, sf_dir).collect()
    two_level = {r.r_name: r.exact_buyers for r in merged_rows}
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    direct = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey", F.lit(HLL_LGK))).alias("est"))
        .collect()
    )
    assert all(r.hll_union_within_tol for r in merged_rows)
    for r in direct:
        # At test cardinalities the sketch is in exact (sparse) mode,
        # so direct and merged estimates both equal the exact count.
        assert abs(r.est - two_level[r.r_name]) <= 0.05 * two_level[r.r_name]


def test_label_propagation_separates_planted_communities(spark, tmp_path):
    # Two disconnected complete-bipartite blocks: customers {1,2} x
    # suppliers {10,11} and customers {3,4} x suppliers {12,13}. Labels
    # must never cross blocks. Within a block, synchronous LPA on a
    # bipartite graph oscillates by side (documented), so after an odd
    # round count each side holds the other side's min id as label.
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mit_map_reduce_spark.operators.graph import (
        NODE_OFFSET,
        graph_label_propagation,
    )

    orders, lines = [], []
    ok = 0
    for custs, supps in (((1, 2), (10, 11)), ((3, 4), (12, 13))):
        for c in custs:
            ok += 1
            orders.append((ok, c))
            lines.extend((ok, s) for s in supps)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
                "o_custkey": pa.array([o[1] for o in orders], pa.int64()),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([l[0] for l in lines], pa.int64()),
                "l_suppkey": pa.array([l[1] for l in lines], pa.int64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    rows = graph_label_propagation(spark, str(tmp_path)).collect()
    got = {r.label: (r.n_members, r.n_customers, r.n_suppliers, r.min_node) for r in rows}
    assert got == {
        10: (2, 2, 0, NODE_OFFSET + 1),  # block-A customers hold supp min id
        NODE_OFFSET + 1: (2, 0, 2, 10),  # block-A suppliers hold cust min id
        12: (2, 2, 0, NODE_OFFSET + 3),
        NODE_OFFSET + 3: (2, 0, 2, 12),
    }


def test_pagerank_mass_conservation(spark, sf_dir):
    # On a symmetric graph with no dangling nodes the total rank mass
    # stays ~1 every iteration (up to the per-iteration rounding); a
    # broken degree join or lost contribution shows up here instantly.
    from pyspark.sql import functions as F
    from mit_map_reduce_spark.operators.graph import graph_pagerank_trade

    pr = graph_pagerank_trade(spark, sf_dir)
    total = pr.agg(F.sum("rank")).first()[0]
    assert abs(total - 1.0) < 1e-3
    assert pr.filter(F.col("rank") <= 0).count() == 0


def test_triangle_count_invariants(spark, sf_dir):
    # Each triangle contributes exactly one participation to each of
    # its 3 corners, so the global participation total is divisible by
    # 3, and a node in any triangle participates at least once. A
    # double-generated triangle (broken id orientation in the wedge
    # join) breaks the divisibility instantly.
    from pyspark.sql import functions as F
    from mit_map_reduce_spark.operators.graph import graph_triangle_count

    tri = graph_triangle_count(spark, sf_dir)
    rows = tri.collect()
    assert rows, "sf0.001 kNN graph is known to contain triangles"
    assert all(r.n_triangles >= 1 for r in rows)
    total = sum(r.n_triangles for r in rows)
    assert total % 3 == 0


def test_link_prediction_predicts_only_non_edges(spark, sf_dir):
    # Every scored pair must be ABSENT from the edge set (that is the
    # definition of link prediction) and its Jaccard must sit in (0, 1].
    from mit_map_reduce_spark.operators.graph import (
        _knn_copurchase_edges,
        graph_jaccard_link_prediction,
    )

    edges = {(r.a, r.b) for r in _knn_copurchase_edges(spark, sf_dir).collect()}
    for r in graph_jaccard_link_prediction(spark, sf_dir).collect():
        assert r.supp_a < r.supp_b
        assert (r.supp_a, r.supp_b) not in edges
        assert 0.0 < r.jaccard <= 1.0


def test_markov_transition_rows_are_distributions(spark, sf_dir):
    # Each prev_type's outgoing probabilities must sum to ~1 (they are
    # 4-dp-rounded ratios of a common integer total), and every state
    # pair must appear at most once.
    from collections import defaultdict
    from mit_map_reduce_spark.operators.advanced import adv_markov_event_transitions

    rows = adv_markov_event_transitions(spark, sf_dir).collect()
    seen = set()
    sums = defaultdict(float)
    for r in rows:
        assert (r.prev_type, r.next_type) not in seen
        seen.add((r.prev_type, r.next_type))
        sums[r.prev_type] += r.prob
    for prev, s in sums.items():
        assert abs(s - 1.0) < 5e-4, (prev, s)


def test_rolling_active_users_dominates_daily(spark, sf_dir):
    # The 7-day rolling distinct count can never be smaller than the
    # same day's plain daily distinct count (the window contains the
    # day itself), and both series cover exactly the same days.
    from pyspark.sql import functions as F
    from mit_map_reduce_spark.operators.advanced import adv_rolling_active_users
    from mit_map_reduce_spark.catalog import load_table

    rolling = {
        r.day: r.n_active_7d
        for r in adv_rolling_active_users(spark, sf_dir).collect()
    }
    daily = {
        r.day: r.n
        for r in load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(rolling) == set(daily)
    for day, n in daily.items():
        assert rolling[day] >= n


def test_association_rules_bounds(spark, sf_dir):
    # Confidences are probabilities; support respects the minimum cut;
    # pairs are id-ordered and unique.
    from mit_map_reduce_spark.operators.advanced import (
        RULES_MIN_SUPPORT,
        adv_association_rules_sessions,
    )

    rows = adv_association_rules_sessions(spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.event_a < r.event_b
        assert (r.event_a, r.event_b) not in seen
        seen.add((r.event_a, r.event_b))
        assert r.n_both >= RULES_MIN_SUPPORT
        assert 0.0 < r.conf_a_to_b <= 1.0
        assert 0.0 < r.conf_b_to_a <= 1.0
        assert r.lift > 0.0


def test_semantic_dedup_keeps_cell_minimum(spark, sf_dir):
    # The drop rule is "cosine >= T to a LOWER-id cell-mate", so the
    # smallest vec_id in every cell can never be dropped, and every
    # cell retains at least one representative.
    from collections import defaultdict
    from mit_map_reduce_spark.operators.similarity import semantic_dedup_ivf

    rows = semantic_dedup_ivf(spark, sf_dir).collect()
    by_cell = defaultdict(list)
    for r in rows:
        by_cell[r.cell].append(r)
    for cell, members in by_cell.items():
        lowest = min(members, key=lambda r: r.vec_id)
        assert lowest.kept, (cell, lowest)
        assert any(r.kept for r in members)


def test_hard_negatives_never_share_query_label(spark, sf_dir):
    # Every mined negative must carry a label different from its
    # query's — that is the definition of the operator — and ranks are
    # dense from 1 within each query.
    from collections import defaultdict
    from mit_map_reduce_spark.operators.similarity import hard_negative_mining

    rows = hard_negative_mining(spark, sf_dir).collect()
    assert rows
    by_q = defaultdict(list)
    for r in rows:
        assert r.neg_label != r.q_label
        by_q[r.query_id].append(r.rank)
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q


def test_terasort_manifest_is_total_order(spark, sf_dir):
    # Partitions must tile the key space: every row contiguous, counts
    # sum to the corpus size, and all TERA_PARTS partitions non-empty
    # (md5 keys are uniform, so the sampled boundaries cannot starve a
    # partition at any tested SF).
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.operators.mr_queries import (
        TERA_PARTS,
        mr_terasort_manifest,
    )

    rows = sorted(mr_terasort_manifest(spark, sf_dir).collect(), key=lambda r: r.pid)
    assert [r.pid for r in rows] == list(range(1, TERA_PARTS + 1))
    assert all(r.contiguous for r in rows)
    assert all(r.min_key <= r.max_key for r in rows)
    total = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_rows for r in rows) == total


def test_personalized_pagerank_mass_and_positivity(spark, sf_dir):
    # Teleporting (1-d) wholly onto the seed set keeps total mass at
    # ~1 through every iteration (the graph is symmetric: no dangling
    # loss), and the emitted rows are exactly the reachable positive
    # ranks.
    from pyspark.sql import functions as F
    from mit_map_reduce_spark.operators.graph import graph_personalized_pagerank

    pr = graph_personalized_pagerank(spark, sf_dir)
    total = pr.agg(F.sum("rank")).first()[0]
    assert abs(total - 1.0) < 1e-3
    assert pr.filter(F.col("rank") <= 0).count() == 0


def test_auc_matches_naive_python(spark, sf_dir):
    # Golden check: the rank-sum AUC must equal a direct average-rank
    # Mann-Whitney computation in plain Python over the same rows.
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.operators.advanced import adv_auc_purchase_score

    rows = (
        load_table(spark, sf_dir, "events")
        .select("value", "event_type")
        .collect()
    )
    scored = sorted((r.value, r.event_type == "purchase") for r in rows)
    # average ranks with ties
    ranks = {}
    i = 0
    while i < len(scored):
        j = i
        while j < len(scored) and scored[j][0] == scored[i][0]:
            j += 1
        avg = (i + 1 + j) / 2  # mean of ranks i+1 .. j
        ranks[scored[i][0]] = avg
        i = j
    n_pos = sum(1 for _, p in scored if p)
    n_neg = len(scored) - n_pos
    u = sum(ranks[v] for v, p in scored if p) - n_pos * (n_pos + 1) / 2
    expected = u / (n_pos * n_neg)
    got = adv_auc_purchase_score(spark, sf_dir).first()
    assert got.n_pos == n_pos and got.n_neg == n_neg
    assert abs(got.auc - expected) < 1e-6


def test_vad_segments_partition_voiced_windows(spark, sf_dir):
    # Segments must be disjoint per asset, cover every voiced window
    # exactly once, and contain no silent window.
    from collections import defaultdict
    from pyspark.sql import functions as F
    from mit_map_reduce_spark.operators.multimodal import (
        mm_audio_energy_windows,
        mm_audio_vad_segments,
    )

    voiced = defaultdict(set)
    for r in mm_audio_energy_windows(spark, sf_dir).collect():
        if r.voiced:
            voiced[r.doc_id].add(r.window_idx)
    covered = defaultdict(set)
    for r in mm_audio_vad_segments(spark, sf_dir).collect():
        span = set(range(r.seg_start, r.seg_end + 1))
        assert len(span) == r.n_windows  # contiguous, no gaps inside
        assert not (covered[r.doc_id] & span)  # disjoint
        assert span <= voiced[r.doc_id]  # no silent window swallowed
        covered[r.doc_id] |= span
    assert covered == {k: v for k, v in voiced.items() if v}


def test_modularity_within_theoretical_bounds(spark, sf_dir):
    # Newman modularity is bounded in [-1/2, 1); the report's exact
    # integer construction must land inside, and community/edge counts
    # must be positive.
    from mit_map_reduce_spark.operators.graph import graph_modularity_report

    r = graph_modularity_report(spark, sf_dir).first()
    assert r.n_communities >= 1
    assert r.n_edges >= 1
    assert -0.5 <= r.modularity < 1.0


def test_fk_audit_covers_every_edge_and_is_clean(spark, sf_dir):
    # The synthetic star schema is referentially intact by
    # construction; the audit must say so for every declared edge, and
    # child_rows must equal the child table's cardinality (no rows
    # dropped by the probe join).
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.operators.relational import (
        _FK_EDGES,
        rel_fk_integrity_audit,
    )

    rows = {r.fk_edge: r for r in rel_fk_integrity_audit(spark, sf_dir).collect()}
    assert set(rows) == {e[0] for e in _FK_EDGES}
    for label, child_t, _, _, _, _ in _FK_EDGES:
        r = rows[label]
        assert r.orphan_rows == 0 and r.ok
        assert r.child_rows == load_table(spark, sf_dir, child_t).count()


def test_incremental_merge_equals_full_recompute(spark, sf_dir):
    # Merged partial state must be bit-identical to a single-pass
    # recompute of the same rollup — the associativity contract that
    # makes the state incrementally maintainable.
    from pyspark.sql import functions as F
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.functions.columns import money_grains, round_half_up
    from mit_map_reduce_spark.operators.relational import rel_incremental_agg_merge

    full = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.date_trunc("month", "l_shipdate").alias("month"))
        .agg(
            F.count("*").alias("n_items"),
            F.sum(money_grains("l_extendedprice")).alias("g"),
            round_half_up(F.min("l_extendedprice"), 2).alias("min_price"),
            round_half_up(F.max("l_extendedprice"), 2).alias("max_price"),
        )
    )
    expect = {
        r.month: (r.n_items, int(r.g), r.min_price, r.max_price)
        for r in full.collect()
    }
    got = rel_incremental_agg_merge(spark, sf_dir).collect()
    assert len(got) == len(expect)
    for r in got:
        n, g, lo, hi = expect[r.month]
        assert r.n_items == n
        assert r.min_price == lo and r.max_price == hi
        assert r.total_price == __import__("math").floor(g / 1e4 * 100.0 + 0.5) / 100.0


def test_scd2_intervals_tile_per_user(spark, sf_dir):
    # SCD2 contract: per user, intervals are contiguous (valid_to ==
    # next valid_from), exactly one is_current (the last), consecutive
    # tiers differ (no zero-change interval splits), and event counts
    # reassemble the user's full event history.
    from collections import defaultdict
    from pyspark.sql import functions as F
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.operators.advanced import adv_scd2_user_tier_history

    per_user = defaultdict(list)
    for r in adv_scd2_user_tier_history(spark, sf_dir).collect():
        per_user[r.user_id].append(r)
    totals = {
        r.user_id: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(per_user) == set(totals)
    for uid, ivs in per_user.items():
        ivs.sort(key=lambda r: r.interval_seq)
        assert [r.interval_seq for r in ivs] == list(range(1, len(ivs) + 1))
        assert sum(r.n_events for r in ivs) == totals[uid]
        assert [r.is_current for r in ivs] == [False] * (len(ivs) - 1) + [True]
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from  # contiguous, no gaps
            assert a.tier != b.tier  # a new interval means a real change


def test_cusum_has_single_peak_and_zero_sum(spark, sf_dir):
    # The scaled CUSUM telescopes to zero at the last day by
    # construction; exactly one changepoint flag is set, at the
    # global |S| max.
    from mit_map_reduce_spark.operators.advanced import adv_cusum_changepoint_revenue

    rows = sorted(
        adv_cusum_changepoint_revenue(spark, sf_dir).collect(), key=lambda r: r.day
    )
    assert sum(1 for r in rows if r.is_changepoint) == 1
    assert abs(rows[-1].cusum) < 0.01  # S_n == 0 up to the 2dp render
    peak = max(abs(r.cusum) for r in rows)
    flagged = next(r for r in rows if r.is_changepoint)
    assert abs(flagged.cusum) == peak


def test_campaign_overlap_equals_theta_join(spark, sf_dir):
    # The grid-cell candidate join + exact re-check must reproduce the
    # direct theta-join exactly (completeness of the cell covering).
    from pyspark.sql import functions as F
    from mit_map_reduce_spark.operators.advanced import (
        CAMPAIGN_EVERY_H,
        CAMPAIGN_LEN_H,
        CAMPAIGN_N,
        CAMPAIGN_START,
        adv_campaign_session_overlap,
        adv_sessionize_events,
    )

    sess = adv_sessionize_events(spark, sf_dir).select(
        "user_id",
        F.unix_millis("session_start").alias("lo"),
        (F.unix_millis("session_start") + F.col("duration_ms")).alias("hi"),
    )
    camp = spark.range(CAMPAIGN_N).select(
        F.col("id").alias("campaign_id"),
        (
            F.unix_millis(F.lit(CAMPAIGN_START).cast("timestamp"))
            + F.col("id") * (CAMPAIGN_EVERY_H * 3600 * 1000)
        ).alias("clo"),
    ).withColumn("chi", F.col("clo") + CAMPAIGN_LEN_H * 3600 * 1000)
    naive = {
        (r.campaign_id): r.n
        for r in sess.join(
            camp, (F.col("lo") < F.col("chi")) & (F.col("clo") < F.col("hi"))
        )
        .groupBy("campaign_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got = {r.campaign_id: r.n_sessions for r in adv_campaign_session_overlap(spark, sf_dir).collect()}
    assert got == naive


def test_bfs_distances_are_minimal_hops(spark, sf_dir):
    # Cross-check the frontier loop against a driver-side Dijkstra-ish
    # BFS over the same collected edge list: distances must be the
    # exact min-hop values, truncated at BFS_ROUNDS.
    from collections import deque
    from mit_map_reduce_spark.operators.graph import (
        BFS_ROUNDS,
        BFS_SEED_MOD,
        _knn_copurchase_edges,
        graph_bfs_reach,
    )

    adj = {}
    for r in _knn_copurchase_edges(spark, sf_dir).collect():
        adj.setdefault(r.a, set()).add(r.b)
        adj.setdefault(r.b, set()).add(r.a)
    dist = {n: 0 for n in adj if n % BFS_SEED_MOD == 0}
    q = deque(dist)
    while q:
        n = q.popleft()
        if dist[n] >= BFS_ROUNDS:
            continue
        for m in adj.get(n, ()):
            if m not in dist:
                dist[m] = dist[n] + 1
                q.append(m)
    got = {r.node: r.dist for r in graph_bfs_reach(spark, sf_dir).collect()}
    assert got == dist


def test_embedding_norm_audit_counts(spark, sf_dir):
    # Label partition must cover the table; no synthetic vector is
    # degenerate or mis-dimensioned; bounds hold per label.
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.operators.similarity import embedding_norm_audit

    rows = embedding_norm_audit(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vectors for r in rows) == n
    for r in rows:
        assert r.n_bad_dim == 0 and r.n_degenerate == 0
        assert 0 < r.min_norm <= r.mean_norm <= r.max_norm


def test_gram_matrix_symmetry_and_diagonal(spark, sf_dir):
    # X^T X must be symmetric, its diagonal must equal the per-column
    # sum of squares (cross-checked against a NumPy recomputation),
    # and the shape must be exactly DIM x DIM.
    import numpy as np
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.operators.similarity import DIM, embedding_gram_matrix

    rows = embedding_gram_matrix(spark, sf_dir).collect()
    assert len(rows) == DIM * DIM
    g = {(r.i, r.j): r.value for r in rows}
    for (i, j), v in g.items():
        assert g[(j, i)] == v
    X = np.array(
        [r.embedding for r in load_table(spark, sf_dir, "embeddings").collect()],
        dtype=np.float64,
    )
    ref = X.T @ X
    for i in range(0, DIM, 7):
        for j in range(0, DIM, 11):
            assert abs(g[(i, j)] - ref[i, j]) < 1e-4


def test_keyframes_partition_sampled_frames(spark, sf_dir):
    # Shots must tile each video's sampled frames: contiguous spans,
    # one more shot than boundaries, and the keyframe starts its span.
    from collections import defaultdict
    from mit_map_reduce_spark.operators.multimodal import (
        mm_keyframe_select,
        mm_shot_boundaries,
    )

    bounds = {r.doc_id: r for r in mm_shot_boundaries(spark, sf_dir).collect()}
    shots = defaultdict(list)
    for r in mm_keyframe_select(spark, sf_dir).collect():
        shots[r.doc_id].append(r)
    assert set(shots) == set(bounds)
    for doc, ss in shots.items():
        ss.sort(key=lambda r: r.shot_id)
        assert len(ss) == bounds[doc].n_boundaries + 1
        assert sum(r.n_frames for r in ss) == bounds[doc].n_frames_sampled
        for a, b in zip(ss, ss[1:]):
            assert a.last_frame_idx < b.keyframe_idx
        for s in ss:
            assert s.keyframe_idx <= s.last_frame_idx


def test_seasonality_index_weighted_mean_is_one(spark, sf_dir):
    # The occurrence-weighted mean of the seasonal index is exactly 1
    # by construction (up to the 4dp render).
    from mit_map_reduce_spark.operators.relational import rel_seasonality_index_monthly

    rows = rel_seasonality_index_monthly(spark, sf_dir).collect()
    assert {r.month for r in rows} <= set(range(1, 13))
    n = sum(r.n_occurrences for r in rows)
    wmean = sum(r.seasonal_index * r.n_occurrences for r in rows) / n
    assert abs(wmean - 1.0) < 1e-3


def test_snapshot_diff_counts_match_synthesis_rules(spark, sf_dir):
    # The planted drift is exactly recoverable: the old snapshot
    # misses every 97th key, so those surface as ADDED in new;
    # changed == (key % 89 == 0) minus the added overlap; nothing is
    # deleted; and the four buckets partition the keyspace.
    from pyspark.sql import functions as F
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.operators.relational import (
        DIFF_CHANGED_MOD,
        DIFF_MISSING_MOD,
        rel_snapshot_diff_orders,
    )

    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    n_add = orders.filter(F.col("o_orderkey") % DIFF_MISSING_MOD == 0).count()
    n_chg = orders.filter(
        (F.col("o_orderkey") % DIFF_CHANGED_MOD == 0)
        & (F.col("o_orderkey") % DIFF_MISSING_MOD != 0)
    ).count()
    rows = rel_snapshot_diff_orders(spark, sf_dir).collect()
    assert sum(r.n_added for r in rows) == n_add
    assert sum(r.n_changed for r in rows) == n_chg
    assert sum(r.n_deleted for r in rows) == 0
    assert sum(r.n_added + r.n_changed + r.n_identical for r in rows) == n


def test_table_checksums_detect_any_row_change(spark, sf_dir):
    # The fingerprint must (a) cover every table with its true row
    # count, (b) be reproducible across partitionings, and (c) move
    # when a single row changes.
    from pyspark.sql import functions as F
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.operators.relational import (
        CHECKSUM_SCHEMAS,
        rel_table_checksums,
    )

    rows = {r.table_name: r for r in rel_table_checksums(spark, sf_dir).collect()}
    assert set(rows) == set(CHECKSUM_SCHEMAS)
    for t in CHECKSUM_SCHEMAS:
        assert rows[t].n_rows == load_table(spark, sf_dir, t).count()
    # reproducibility: the same hash-sum computed over a repartitioned
    # copy of one table must agree (commutativity of the sum)
    nat = load_table(spark, sf_dir, "nation").repartition(7)
    h = F.conv(
        F.md5(
            F.concat_ws(
                "|",
                F.col("n_nationkey").cast("string"),
                F.col("n_name").cast("string"),
                F.col("n_regionkey").cast("string"),
            )
        ).substr(1, 12),
        16,
        10,
    ).cast("decimal(38,0)")
    again = nat.agg(F.sum(h).cast("string")).first()[0]
    assert again == rows["nation"].checksum
    # sensitivity: perturbing one row's key changes the sum
    perturbed = nat.withColumn(
        "n_nationkey",
        F.when(F.col("n_nationkey") == 0, 999).otherwise(F.col("n_nationkey")),
    )
    h2 = F.conv(
        F.md5(
            F.concat_ws(
                "|",
                F.col("n_nationkey").cast("string"),
                F.col("n_name").cast("string"),
                F.col("n_regionkey").cast("string"),
            )
        ).substr(1, 12),
        16,
        10,
    ).cast("decimal(38,0)")
    assert perturbed.agg(F.sum(h2).cast("string")).first()[0] != again


def test_positional_index_reconstructs_documents(spark, sf_dir):
    # Inverting the positional index must reproduce every document's
    # token sequence exactly (positions are 1-based, contiguous, and
    # collision-free).
    from collections import defaultdict
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.operators.mr_queries import mr_positional_index
    from mit_map_reduce_spark.functions.columns import tokenize_letters
    from pyspark.sql import functions as F

    rebuilt = defaultdict(dict)
    for r in mr_positional_index(spark, sf_dir).collect():
        for p in r.positions.split("|"):
            assert int(p) not in rebuilt[r.doc_id]
            rebuilt[r.doc_id][int(p)] = r.word
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokenize_letters(F.col("text")).alias("toks")
    )
    for row in docs.collect():
        toks = rebuilt.get(row.doc_id, {})
        assert [toks[i] for i in range(1, len(toks) + 1)] == list(row.toks)


def test_ivf_balance_shares_sum_to_one(spark, sf_dir):
    # Occupied cells must cover the whole corpus; load factors average
    # to K/occupied >= 1 over occupied cells; shares sum to 1.
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.operators.similarity import (
        K_CELLS,
        ivf_cell_balance_report,
    )

    rows = ivf_cell_balance_report(spark, sf_dir).collect()
    assert 1 <= len(rows) <= K_CELLS
    n = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vectors for r in rows) == n
    assert abs(sum(r.share for r in rows) - 1.0) < 0.01
    for r in rows:
        assert abs(r.load_factor - r.n_vectors * K_CELLS / n) < 1e-3


def test_pmi_is_symmetric_in_counts_and_bounded(spark, sf_dir):
    # PMI must equal ln(n12*N/(n1*n2)) recomputed from the row's own
    # exact counters, and can never exceed ln(N/max(n1,n2)) (attained
    # when the rarer word only occurs with the other).
    import math
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.operators.text import text_pmi_collocations

    n = load_table(spark, sf_dir, "documents").count()
    rows = text_pmi_collocations(spark, sf_dir).collect()
    assert rows
    for r in rows:
        expect = math.log(r.n_docs_pair * n / (r.df1 * r.df2))
        assert abs(r.pmi - expect) < 1e-5
        assert r.pmi <= math.log(n / max(r.df1, r.df2)) + 1e-9
        assert r.n_docs_pair <= min(r.df1, r.df2)


def test_error_alerts_match_batch_rule(spark, sf_dir):
    # The emitted windows must agree with a direct batch evaluation of
    # the same rule over closed 6-hour windows.
    from pyspark.sql import functions as F
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.streaming.queries import (
        ALERT_ERROR_SHARE,
        stream_error_rate_alerts,
    )

    got = {r.ws: r for r in stream_error_rate_alerts(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    wm = ev.agg(F.max("ts")).first()[0]
    batch = (
        ev.groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("event_type") == "error", 1)).alias("e"),
        )
        .collect()
    )
    import datetime

    closed = {
        r.w.start: r
        for r in batch
        if r.w.end <= wm - datetime.timedelta(hours=1)
    }
    assert set(got) == set(closed)
    for ws, r in got.items():
        b = closed[ws]
        assert (r.n_events, r.n_errors) == (b.n, b.e)
        assert r.alert == (b.e / b.n > ALERT_ERROR_SHARE)


def test_hits_scores_normalized_and_bipartite(spark, sf_dir):
    # Hubs are customer nodes, authorities supplier nodes; each score
    # vector L1-normalizes to ~1; scores are positive.
    from mit_map_reduce_spark.operators.graph import NODE_OFFSET, graph_hits_scores

    rows = graph_hits_scores(spark, sf_dir).collect()
    hubs = [r for r in rows if r.role == "hub"]
    auths = [r for r in rows if r.role == "authority"]
    assert hubs and auths
    assert all(r.node >= NODE_OFFSET for r in hubs)
    assert all(r.node < NODE_OFFSET for r in auths)
    assert abs(sum(r.score for r in hubs) - 1.0) < 1e-4
    assert abs(sum(r.score for r in auths) - 1.0) < 1e-4
    assert min(r.score for r in rows) > 0


def test_pit_join_never_reads_future_signups(spark, sf_dir):
    # Cross-check against a driver-side replay: the tier at each
    # purchase must be the LAST signup tier at or before it (ties by
    # event_id), or NULL before the first signup.
    from collections import defaultdict
    import json
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.operators.advanced import (
        TIER_WIDTH,
        adv_pit_join_purchase_tier,
    )

    ev = defaultdict(list)
    for r in (
        load_table(spark, sf_dir, "events")
        .filter("event_type in ('signup', 'purchase')")
        .collect()
    ):
        ev[r.user_id].append(r)
    expect = {}
    for uid, rows in ev.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        tier = None
        for r in rows:
            if r.event_type == "signup":
                tier = json.loads(r.props)["k"] // TIER_WIDTH
            else:
                expect[r.event_id] = tier
    got = {
        r.purchase_id: r.tier_at_event
        for r in adv_pit_join_purchase_tier(spark, sf_dir).collect()
    }
    assert got == expect


def test_lift_table_monotone_capture_and_weighted_mean(spark, sf_dir):
    # Cumulative capture rises to exactly 1.0; decile sizes cover the
    # event table; the size-weighted mean lift is 1 by construction.
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.operators.advanced import adv_decile_lift_table

    rows = sorted(adv_decile_lift_table(spark, sf_dir).collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    assert sum(r.n for r in rows) == load_table(spark, sf_dir, "events").count()
    caps = [r.cumulative_capture for r in rows]
    assert caps == sorted(caps) and abs(caps[-1] - 1.0) < 1e-9
    n = sum(r.n for r in rows)
    wmean = sum(r.lift * r.n for r in rows) / n
    assert abs(wmean - 1.0) < 1e-3


def test_chi2_matches_scipy_free_recompute(spark, sf_dir):
    # Recompute the statistic driver-side from the raw contingency
    # table; dof must match the table shape.
    from collections import Counter
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.operators.relational import rel_segment_priority_chi2

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    seg = {r.c_custkey: r.c_mktsegment for r in c.collect()}
    cells = Counter((seg[r.o_custkey], r.o_orderpriority) for r in o.collect())
    rows_t, cols_t = Counter(), Counter()
    for (s, p), v in cells.items():
        rows_t[s] += v
        cols_t[p] += v
    n = sum(cells.values())
    chi2 = sum(
        (v - rows_t[s] * cols_t[p] / n) ** 2 / (rows_t[s] * cols_t[p] / n)
        for (s, p), v in cells.items()
    )
    got = rel_segment_priority_chi2(spark, sf_dir).first()
    assert got.dof == (len(rows_t) - 1) * (len(cols_t) - 1)
    assert abs(got.chi2 - chi2) < 0.01


def test_js_divergence_bounds_and_symmetry_of_pairing(spark, sf_dir):
    # JS is bounded by ln 2, non-negative, and every unordered source
    # pair appears exactly once.
    import math
    from mit_map_reduce_spark.operators.text import text_js_divergence_sources

    rows = text_js_divergence_sources(spark, sf_dir).collect()
    seen = set()
    for r in rows:
        assert r.source_a < r.source_b
        assert (r.source_a, r.source_b) not in seen
        seen.add((r.source_a, r.source_b))
        assert -1e-9 <= r.js_divergence <= math.log(2) + 1e-6


def test_survivorship_reconciles_with_keep_list(spark, sf_dir):
    # Shares sum to 1, doc counts reconcile with the keep-list, and
    # the kept group is never smaller than the dropped one here
    # (near-dup clusters are a small corpus fraction).
    from mit_map_reduce_spark.operators.dedup import (
        dedup_survivorship_report,
        near_dup_keep_list,
    )

    rows = {r.keep: r for r in dedup_survivorship_report(spark, sf_dir).collect()}
    kl = near_dup_keep_list(spark, sf_dir).collect()
    n_keep = sum(1 for r in kl if r.keep)
    assert rows[True].n_docs == n_keep
    if False in rows:
        assert rows[False].n_docs == len(kl) - n_keep
        assert abs(rows[True].share + rows[False].share - 1.0) < 0.01
    assert rows[True].n_docs >= rows.get(False, rows[True]).n_docs


def test_new_returning_split_reconciles(spark, sf_dir):
    # Per day n_new + n_returning == n_active; summed n_new over all
    # days equals the distinct user count (everyone is new exactly
    # once); day-1 has zero returning.
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.operators.advanced import adv_new_vs_returning_users

    rows = sorted(adv_new_vs_returning_users(spark, sf_dir).collect(), key=lambda r: r.day)
    for r in rows:
        assert r.n_new + r.n_returning == r.n_active
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert sum(r.n_new for r in rows) == n_users
    assert rows[0].n_returning == 0


def test_zscore_warmup_and_recompute(spark, sf_dir):
    # First 7 days emit NULL z (warmup); spot-check z against a
    # driver-side recompute over the trailing window.
    import statistics
    from mit_map_reduce_spark.operators.advanced import (
        ZSCORE_WINDOW_DAYS,
        adv_rolling_zscore_anomalies,
    )

    rows = sorted(adv_rolling_zscore_anomalies(spark, sf_dir).collect(), key=lambda r: r.day)
    assert all(r.zscore is None for r in rows[:7])
    revs = [r.revenue for r in rows]
    for i in (50, 200, len(rows) - 1):
        wnd = revs[max(0, i - ZSCORE_WINDOW_DAYS): i]
        mu = statistics.mean(wnd)
        sd = statistics.stdev(wnd)
        assert abs(rows[i].zscore - (revs[i] - mu) / sd) < 0.01


def test_calendar_gaps_are_really_absent(spark, sf_dir):
    # Every reported day must have zero orders, lie strictly inside
    # the observed span, and the per-year counts must agree.
    from collections import Counter
    from pyspark.sql import functions as F
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.operators.relational import rel_calendar_gap_audit

    rows = rel_calendar_gap_audit(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    present = {
        r.day for r in orders.select(F.date_trunc("day", "o_orderdate").alias("day")).distinct().collect()
    }
    lo, hi = min(present), max(present)
    per_year = Counter(r.year for r in rows)
    for r in rows:
        assert r.day not in present
        assert lo < r.day < hi
        assert r.n_missing_in_year == per_year[r.year]


def test_kaplan_meier_monotone_and_reconciles(spark, sf_dir):
    # S is non-increasing from <= 1; at-risk counts telescope (each
    # row's at_risk minus its events+censored equals the next row's
    # at_risk); totals reconcile with the session count.
    from mit_map_reduce_spark.operators.advanced import (
        adv_kaplan_meier_retention,
        adv_sessionize_events,
    )

    rows = sorted(
        adv_kaplan_meier_retention(spark, sf_dir).collect(),
        key=lambda r: r.duration_min,
    )
    assert rows and rows[0].n_at_risk == adv_sessionize_events(spark, sf_dir).count()
    s_prev = 1.0 + 1e-9
    for i, r in enumerate(rows):
        assert 0.0 <= r.survival <= s_prev + 1e-9
        s_prev = r.survival
        if i + 1 < len(rows):
            assert rows[i + 1].n_at_risk == r.n_at_risk - r.n_events - r.n_censored
    # some sessions genuinely end inside the horizon (curve not flat)
    assert rows[-1].survival < 1.0


def test_funnel_is_monotone_and_anchored(spark, sf_dir):
    # Stage counts never increase; stage 0 == corpus size; the last
    # stage equals the training mix's row count; drops reconcile.
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.operators.text import (
        text_pipeline_funnel_report,
        text_training_mix,
    )

    rows = sorted(
        text_pipeline_funnel_report(spark, sf_dir).collect(), key=lambda r: r.stage
    )
    assert rows[0].n_docs == load_table(spark, sf_dir, "documents").count()
    assert rows[-1].n_docs == text_training_mix(spark, sf_dir).count()
    for a, b in zip(rows, rows[1:]):
        assert b.n_docs <= a.n_docs
        assert b.n_dropped == a.n_docs - b.n_docs


def test_sequence_support_bounds_and_antisymmetry(spark, sf_dir):
    # For any unordered type pair, sessions(a before b) +
    # sessions(b before a) == sessions containing both (first
    # positions are distinct integers, so exactly one order holds);
    # confidence <= 1; support <= confidence.
    from collections import defaultdict
    from mit_map_reduce_spark.operators.advanced import adv_sequence_pattern_support

    rows = adv_sequence_pattern_support(spark, sf_dir).collect()
    ordered = {(r.antecedent, r.consequent): r.n_sessions_ordered for r in rows}
    for r in rows:
        assert 0 < r.support <= r.confidence <= 1.0
    both = defaultdict(int)
    for (a, b), n in ordered.items():
        both[frozenset((a, b))] += n
    # cross-check one pair against a direct recomputation
    from pyspark.sql import functions as F
    from mit_map_reduce_spark.operators.advanced import adv_sessionize_events
    from mit_map_reduce_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "purchase")
    )
    # sessions containing both types, any order (session key re-derived
    # implicitly through the operator's own totals): just assert the
    # antisymmetric split is consistent for every pair
    for pair, n in both.items():
        a, b = sorted(pair)
        assert ordered.get((a, b), 0) + ordered.get((b, a), 0) == n


def test_pk_audit_covers_tables_and_is_clean(spark, sf_dir):
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.operators.relational import (
        _PK_COLUMNS,
        rel_pk_uniqueness_audit,
    )

    rows = {r.table_name: r for r in rel_pk_uniqueness_audit(spark, sf_dir).collect()}
    assert set(rows) == set(_PK_COLUMNS)
    for t in _PK_COLUMNS:
        r = rows[t]
        assert r.pk_ok and r.n_rows_in_dup_groups == 0
        assert r.n_rows == r.n_distinct_keys == load_table(spark, sf_dir, t).count()


def test_coverage_curve_monotone_in_k(spark, sf_dir):
    from mit_map_reduce_spark.operators.text import text_vocab_coverage_curve

    rows = sorted(
        text_vocab_coverage_curve(spark, sf_dir).collect(), key=lambda r: r.vocab_k
    )
    totals = {r.tokens_total for r in rows}
    assert len(totals) == 1
    prev = -1
    for r in rows:
        assert r.tokens_covered >= prev
        prev = r.tokens_covered
        assert 0 < r.coverage <= 1.0


def test_ltv_curve_monotone_per_cohort(spark, sf_dir):
    # Cumulative revenue per user never decreases within a cohort and
    # cohort sizes sum to the distinct user count at offset 0.
    from collections import defaultdict
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.operators.advanced import adv_cohort_ltv_curve

    per = defaultdict(list)
    for r in adv_cohort_ltv_curve(spark, sf_dir).collect():
        per[r.cohort_day].append(r)
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert sum(rs[0].cohort_size for rs in per.values()) == n_users
    for rs in per.values():
        rs.sort(key=lambda r: r.day_offset)
        assert rs[0].day_offset == 0
        for a, b in zip(rs, rs[1:]):
            assert b.cum_revenue_per_user >= a.cum_revenue_per_user - 1e-9


def test_smoothing_shrinks_toward_prior(spark, sf_dir):
    # Every smoothed rate lies between its raw rate and the global
    # rate (shrinkage), and both rank columns are permutations.
    from mit_map_reduce_spark.operators.advanced import adv_smoothed_conversion_ranking

    rows = adv_smoothed_conversion_ranking(spark, sf_dir).collect()
    tot_e = sum(r.n_events for r in rows)
    tot_p = sum(r.n_purchases for r in rows)
    prior = tot_p / tot_e
    for r in rows:
        lo, hi = sorted((r.raw_rate, prior))
        assert lo - 1e-4 <= r.smoothed_rate <= hi + 1e-4
    n = len(rows)
    assert sorted(r.raw_rank for r in rows) == list(range(1, n + 1))
    assert sorted(r.smoothed_rank for r in rows) == list(range(1, n + 1))


def test_attribution_credit_conserved(spark, sf_dir):
    # Total attributed credit equals the purchase count exactly
    # (up to the 1e-6 grain per split), and channels are event types
    # (or the explicit no-touch bucket).
    from pyspark.sql import functions as F
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.operators.advanced import adv_linear_touch_attribution

    rows = adv_linear_touch_attribution(spark, sf_dir).collect()
    n_purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert abs(sum(r.attributed_purchases for r in rows) - n_purchases) < 0.05
    assert {r.channel for r in rows} <= {"click", "view", "signup", "error", "(none)"}


def test_clustering_coefficient_bounds_and_reconciles(spark, sf_dir):
    # CC in [0, 1]; triangle counts match graph_triangle_count; every
    # reported node has >= 2 neighbors.
    from mit_map_reduce_spark.operators.graph import (
        graph_clustering_coefficient,
        graph_triangle_count,
    )

    tri = {r.supp: r.n_triangles for r in graph_triangle_count(spark, sf_dir).collect()}
    rows = graph_clustering_coefficient(spark, sf_dir).collect()
    for r in rows:
        assert r.degree >= 2
        assert 0.0 <= r.clustering_coef <= 1.0
        assert r.n_triangles == tri.get(r.node, 0)


def test_autocorrelation_matches_numpy(spark, sf_dir):
    # Golden: recompute lag-1 Pearson r with NumPy over the same
    # daily grain series.
    import numpy as np
    from pyspark.sql import functions as F
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.functions.columns import money_grains
    from mit_map_reduce_spark.operators.relational import rel_revenue_autocorrelation

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(money_grains("o_totalprice")).alias("g"))
        .orderBy("day")
        .collect()
    )
    g = np.array([float(r.g) for r in daily])
    expect = float(np.corrcoef(g[:-1], g[1:])[0, 1])
    got = rel_revenue_autocorrelation(spark, sf_dir).first()
    assert got.n_pairs == len(g) - 1
    assert abs(got.lag1_autocorr - expect) < 1e-5
    assert got.looks_like_noise == (abs(expect) < 0.1)


def test_bloom_union_merge_equals_direct(spark, sf_dir):
    # The OR-merge of per-segment filters must equal the directly
    # built global filter bit-for-bit, and each segment's bits are a
    # subset of the merged set (n_bits_set can only grow).
    from mit_map_reduce_spark.operators.sketch import sketch_bloom_union_merge

    rows = {r.scope: r for r in sketch_bloom_union_merge(spark, sf_dir).collect()}
    assert rows["MERGED"].bits_md5 == rows["DIRECT"].bits_md5
    assert rows["MERGED"].n_bits_set == rows["DIRECT"].n_bits_set
    for scope, r in rows.items():
        if scope not in ("MERGED", "DIRECT"):
            assert r.n_bits_set <= rows["MERGED"].n_bits_set
