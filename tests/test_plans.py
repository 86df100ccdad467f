"""Physical-plan assertions — the scale story, checked in CI.

Correctness says the operator works at sf0.001; these assertions say
the *plan shape* survives 100 TB: filters reach the parquet scan,
scans prune columns, dimension joins broadcast, and the hot path stays
in whole-stage codegen. All probes come from the
:mod:`mit_map_reduce_spark.plans` product API.
"""

from pyspark.sql import functions as F

from mit_map_reduce_spark.catalog import load_table
from mit_map_reduce_spark.plans import (
    broadcast_join_count,
    count_shuffles,
    physical_plan,
    plan_report,
    pushed_filters,
    scan_read_schema,
    wholestage_codegen_ids,
)
from mit_map_reduce_spark.operators.relational import (
    rel_q1_pricing_summary,
    rel_q3_shipping_priority,
    rel_q5_local_supplier_volume,
)
from mit_map_reduce_spark.operators.mr_queries import mr_wordcount


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    pushed = pushed_filters(rel_q1_pricing_summary(spark, sf_dir))
    assert "IsNotNull(l_shipdate)" in pushed
    assert any(p.startswith("LessThanOrEqual(l_shipdate") for p in pushed)


def test_q1_column_pruning(spark, sf_dir):
    read = scan_read_schema(rel_q1_pricing_summary(spark, sf_dir))
    assert "l_orderkey" not in read and "l_comment" not in read
    assert "l_returnflag" in read


def test_q3_broadcasts_filtered_customer(spark, sf_dir):
    assert broadcast_join_count(rel_q3_shipping_priority(spark, sf_dir)) >= 1


def test_q5_broadcasts_dims(spark, sf_dir):
    assert broadcast_join_count(rel_q5_local_supplier_volume(spark, sf_dir)) >= 2


def test_q5_single_fact_shuffle_for_agg(spark, sf_dir):
    # dims broadcast; the only shuffles should be the orders<->lineitem
    # join and the final aggregation — not one per join.
    assert count_shuffles(rel_q5_local_supplier_volume(spark, sf_dir)) <= 4


def test_wordcount_partial_aggregation(spark, sf_dir):
    # The reference ships unaggregated (word,1) pairs across its
    # shuffle (src/mrapps/wc.go:27-30); our plan must show a partial
    # hash aggregate BEFORE the hash-partitioning exchange — the
    # map-side combine the reference lacks.
    plan = physical_plan(mr_wordcount(spark, sf_dir))
    assert "HashAggregate" in plan and "Exchange hashpartitioning" in plan
    below = plan.split("Exchange hashpartitioning", 1)[1]
    assert "HashAggregate" in below


def test_wordcount_wholestage_codegen(spark, sf_dir):
    df = mr_wordcount(spark, sf_dir)
    df.collect()  # AQE finalizes the plan only after execution
    assert len(wholestage_codegen_ids(df)) >= 2


def test_projection_prunes_parquet_columns(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    read = scan_read_schema(df)
    assert "l_extendedprice" not in read


def test_plan_report_shape(spark, sf_dir):
    rpt = plan_report(rel_q5_local_supplier_volume(spark, sf_dir))
    assert rpt["broadcast_joins"] >= 2
    assert rpt["shuffles"] >= 1
    assert isinstance(rpt["read_columns"], list) and rpt["read_columns"]


def test_filter_pushdown_via_api(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") == 42)
    assert any(p.startswith("EqualTo(o_orderkey") for p in pushed_filters(df))


def test_merge_upsert_does_not_force_broadcast(spark, sf_dir):
    # The MERGE update side is a constant fraction of the fact-sized
    # customer table — a forced broadcast would OOM at 100×. The plan
    # must carry NO broadcast hint: Catalyst/AQE may still *choose* a
    # broadcast at tiny SF from measured sizes (fine — that decision
    # reverses automatically at scale), but a hint would pin it.
    from mit_map_reduce_spark.operators.relational import rel_merge_upsert_customers

    df = rel_merge_upsert_customers(spark, sf_dir)
    logical = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in logical and "UnresolvedHint" not in logical


def test_q8_broadcasts_dims_single_fact_shuffle(spark, sf_dir):
    # Q8 joins 6 tables around the lineitem fact; the 4 true dims
    # (part/nation x2/region/supplier) are hint-broadcast. Orders and
    # customer are fact-sized at scale, so the static plan keeps two
    # fact-side shuffle joins (plus the tiny year agg); at test SF AQE
    # auto-broadcasts them, which is why the shuffle bound below is
    # loose rather than asserting the exact production shuffle count.
    from mit_map_reduce_spark.operators.relational import rel_q8_market_share

    rpt = plan_report(rel_q8_market_share(spark, sf_dir))
    assert rpt["broadcast_joins"] >= 4
    assert rpt["shuffles"] <= 2


def test_q16_prunes_and_broadcasts_exclusion(spark, sf_dir):
    from mit_map_reduce_spark.operators.relational import rel_q16_supplier_variety

    df = rel_q16_supplier_variety(spark, sf_dir)
    rpt = plan_report(df)
    assert rpt["broadcast_joins"] >= 2  # part dim + NOT-IN exclusion list
    read = scan_read_schema(df)
    assert "l_extendedprice" not in read  # fact scan pruned to join keys


def test_mapside_operators_have_no_hash_shuffle(spark, sf_dir):
    # These operators are implemented as pure per-document projections
    # (fold/sort/slice over arrays); the ONLY allowed exchange is the
    # round-robin spread() fan-out of the small input — never a hash
    # shuffle of derived rows. Regression guard for the map-side
    # rewrites of fingerprint/simhash/minhash-signatures.
    from mit_map_reduce_spark.operators.dedup import minhash_signatures, simhash_fingerprints
    from mit_map_reduce_spark.operators.text import text_fingerprint, text_rolling_hash

    for fn in (text_fingerprint, simhash_fingerprints, minhash_signatures):
        plan = physical_plan(fn(spark, sf_dir))
        assert "Exchange hashpartitioning" not in plan, fn.__name__
        assert "Exchange rangepartitioning" not in plan, fn.__name__

    # rolling hash reads one partition and needs no fan-out at all
    assert count_shuffles(text_rolling_hash(spark, sf_dir)) == 0


def test_round4_mapside_operators_have_no_hash_shuffle(spark, sf_dir):
    # Chunking, int8 quantization, and the audio window expansion are
    # all pure per-row work (explode / HOFs / mapInPandas): the only
    # exchange allowed is the spread() round-robin fan-out.
    from mit_map_reduce_spark.operators.multimodal import mm_audio_energy_windows
    from mit_map_reduce_spark.operators.similarity import embedding_quantize_int8
    from mit_map_reduce_spark.operators.text import text_chunk_overlap

    for fn in (text_chunk_overlap, embedding_quantize_int8, mm_audio_energy_windows):
        plan = physical_plan(fn(spark, sf_dir))
        assert "Exchange hashpartitioning" not in plan, fn.__name__
        assert "Exchange rangepartitioning" not in plan, fn.__name__


def test_reduce_side_join_is_single_exchange(spark, sf_dir):
    # The pattern's whole point: union-tag + one hash aggregate joins
    # AND aggregates with a single shuffle (join-then-agg would cost
    # an exchange per side plus the agg exchange).
    from mit_map_reduce_spark.operators.mr_queries import mr_reduce_side_join

    assert count_shuffles(mr_reduce_side_join(spark, sf_dir)) == 1


def test_bpe_pair_extraction_runs_on_distinct_vocab(spark, sf_dir):
    # The scale claim in the docstring: pair explosion happens AFTER
    # the word-frequency aggregation, so the plan shows the corpus-
    # sized explode (tokenize) feeding a partial+final hash aggregate,
    # and the pair explode feeding off the AGGREGATE — i.e. exactly two
    # hash exchanges (word agg, pair agg) + the top-k single-partition
    # window, never an exchange of exploded per-occurrence pairs.
    from mit_map_reduce_spark.operators.text import text_bpe_pair_counts

    plan = physical_plan(text_bpe_pair_counts(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_contamination_broadcasts_benchmark_grams(spark, sf_dir):
    # The eval-set gram table must BROADCAST: at 100 TB the corpus side
    # is the crawl and cannot be the build side of a shuffle join.
    from mit_map_reduce_spark.operators.text import text_contamination

    assert broadcast_join_count(text_contamination(spark, sf_dir)) >= 1


def test_langid_ngram_broadcasts_profiles(spark, sf_dir):
    # Profile table is fixed-size (|langs| * K rows): scoring must be a
    # broadcast HASH probe of the corpus gram stream (the corpus's gram
    # explosion must never be shuffled by content). The doc x lang grid
    # rides a BroadcastNestedLoopJoin (cross with the tiny lang list),
    # which broadcast_join_count does not include.
    from mit_map_reduce_spark.operators.text import text_langid_ngram

    df = text_langid_ngram(spark, sf_dir)
    assert broadcast_join_count(df) >= 1
    assert "BroadcastNestedLoopJoin" in physical_plan(df)


def test_repetition_has_partial_aggregation(spark, sf_dir):
    # The (doc_id, gram) counting must show a partial hash aggregate
    # before its exchange, so document-length explosion is absorbed
    # map-side (same combine discipline as wordcount). Probe the BUILD
    # pipeline with the shared registry cleared first: with the cached
    # copy alive, Spark's CacheManager substitutes the InMemoryRelation
    # into ANY equivalent plan, which would make this pin vacuous.
    from mit_map_reduce_spark.catalog import clear_shared_caches
    from mit_map_reduce_spark.operators.text import _text_repetition_build

    clear_shared_caches()
    plan = physical_plan(_text_repetition_build(spark, sf_dir))
    first_exchange = plan.index("Exchange")
    assert "HashAggregate" in plan[:first_exchange]


def test_partitioned_scan_prunes_directories(spark, sf_dir):
    # The event_type filter must become directory-level PartitionFilters
    # on the partitioned layout — no per-row data filter remains.
    from mit_map_reduce_spark.operators.sources_queries import (
        src_partitioned_pruning_events,
    )

    plan = physical_plan(src_partitioned_pruning_events(spark, sf_dir))
    assert "PartitionFilters: [" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_type" in m.group(1)


def test_latest_event_uses_window_group_limit(spark, sf_dir):
    """Top-1-per-key must plan as WindowGroupLimit (losers discarded
    before the per-partition sort materializes) — the property that
    makes the current-state view beat groupBy(max)+self-join at scale."""
    from mit_map_reduce_spark.operators.advanced import adv_latest_event_per_user

    plan = physical_plan(adv_latest_event_per_user(spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_bloom_prefilter_never_shuffles_the_fact_side(spark, sf_dir):
    """The Bloom bit array must reach the fact scan by broadcast; the
    only nested-loop join allowed is the 1-row filter row itself."""
    from mit_map_reduce_spark.operators.sketch import sketch_bloom_prefilter

    plan = physical_plan(sketch_bloom_prefilter(spark, sf_dir))
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # the 1-row bloom
    assert "SortMergeJoin" not in plan  # premium dim broadcasts


def test_link_prediction_broadcasts_degree_tables(spark, sf_dir):
    # Node-degree lookups are node-cardinality-sized; both must ride
    # broadcast joins so no fact-sized exchange re-keys the wedges.
    from mit_map_reduce_spark.operators.graph import graph_jaccard_link_prediction

    assert broadcast_join_count(graph_jaccard_link_prediction(spark, sf_dir)) >= 2


def test_burstiness_shuffle_budget_and_broadcast_total(spark, sf_dir):
    # Exactly two hash-aggregate exchanges carry real data ((doc,term)
    # then term); the other exchanges are the deliberate round-robin
    # input spread and the 1-row total's SinglePartition. The corpus
    # total must arrive via a broadcast (nested-loop on a 1-row frame),
    # never by re-shuffling the per-term rows.
    from mit_map_reduce_spark.operators.text import text_term_burstiness

    df = text_term_burstiness(spark, sf_dir)
    assert count_shuffles(df) <= 5
    plan = physical_plan(df)
    assert plan.count("Exchange hashpartitioning") == 2
    assert "BroadcastExchange" in plan


def test_profiler_is_per_column_pruned_passes(spark, sf_dir):
    # Round 7: one pruned pass PER COLUMN, combined by broadcast
    # crossJoins of 1-row aggregates — NOT the single-scan EXPAND plan
    # (which duplicated every fact row once per exact distinct
    # aggregate into one (columns+1)x-wide shuffle; measured 4x slower
    # at sf0.1). Each scan must read only its own column.
    from mit_map_reduce_spark.operators.relational import (
        _PROFILE_COLS,
        rel_table_profile_orders,
    )

    plan = physical_plan(rel_table_profile_orders(spark, sf_dir))
    assert "Expand" not in plan
    assert plan.count("Scan parquet") == len(_PROFILE_COLS)
    assert plan.count("BroadcastExchange") == len(_PROFILE_COLS) - 1
    # scan_read_schema flattens all scans' ReadSchemas: with one
    # pruned column per scan it is exactly the profile column list.
    read = scan_read_schema(rel_table_profile_orders(spark, sf_dir))
    assert sorted(read) == sorted(c for c, _ in _PROFILE_COLS), read


def test_markov_single_fact_pass(spark, sf_dir):
    # ONE scan of events, one user_id window exchange, then only
    # |types|^2-sized frames: the row-probability divisor is a window
    # sum over the counts, so the fact lineage must not be duplicated
    # into a second subtree (a groupBy+join-back divisor would scan
    # and window the fact table twice).
    from mit_map_reduce_spark.operators.advanced import adv_markov_event_transitions

    df = adv_markov_event_transitions(spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("Scan parquet") == 1
    assert count_shuffles(df) <= 3


def test_rolling_actives_explodes_instead_of_range_join(spark, sf_dir):
    # The 7-day window rides a bounded generator explode; the plan
    # must show Generate and NO nested-loop join (a range self-join of
    # the fact table would be quadratic in days).
    from mit_map_reduce_spark.operators.advanced import adv_rolling_active_users

    plan = physical_plan(adv_rolling_active_users(spark, sf_dir))
    assert "Generate" in plan
    assert "NestedLoop" not in plan


def test_terasort_never_sorts_the_full_corpus(spark, sf_dir):
    # The corpus side must reach its range assignment through a
    # broadcast boundary-array comparison — no global sort, no hash
    # exchange before the pid aggregate. The boundary sample is a
    # CAPPED TakeOrdered reduction (fixed K, corpus-independent); the
    # only SinglePartition exchange is the 16-row manifest window; the
    # only hash exchange keys on pid.
    from mit_map_reduce_spark.operators.mr_queries import (
        TERA_SAMPLE_K,
        mr_terasort_manifest,
    )

    plan = physical_plan(mr_terasort_manifest(spark, sf_dir))
    assert f"TakeOrderedAndProject(limit={TERA_SAMPLE_K}" in plan
    assert plan.count("Exchange SinglePartition") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastNestedLoopJoin" in plan  # boundary array broadcast


def test_hard_negative_mining_broadcasts_probe_and_query_sides(spark, sf_dir):
    # The corpus is scanned once; probes, queries, and labels must all
    # arrive via broadcast joins so no corpus-sized exchange re-keys
    # the candidate stream.
    from mit_map_reduce_spark.operators.similarity import hard_negative_mining

    assert broadcast_join_count(hard_negative_mining(spark, sf_dir)) >= 2


def test_campaign_overlap_never_nested_loop(spark, sf_dir):
    # The bucketed interval join must plan as hash joins on the grid
    # cell — a BroadcastNestedLoopJoin means the theta-join form leaked
    # through and the operator dies at scale.
    from mit_map_reduce_spark.operators.advanced import adv_campaign_session_overlap

    plan = physical_plan(adv_campaign_session_overlap(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_fk_audit_broadcasts_dimension_parents(spark, sf_dir):
    # Six of seven FK edges probe dimension parents — those joins must
    # broadcast (the fact side never shuffles for them); only the
    # lineitem->orders edge may shuffle.
    from mit_map_reduce_spark.operators.relational import rel_fk_integrity_audit

    assert broadcast_join_count(rel_fk_integrity_audit(spark, sf_dir)) >= 6


def test_gram_matrix_has_no_join(spark, sf_dir):
    # The outer-product expansion is map-side: the plan must contain
    # no join at all — one scan, one exchange for the final aggregate.
    from mit_map_reduce_spark.operators.similarity import embedding_gram_matrix

    plan = physical_plan(embedding_gram_matrix(spark, sf_dir))
    assert "Join" not in plan
    assert count_shuffles(embedding_gram_matrix(spark, sf_dir)) <= 2


def test_table_checksums_scans_have_no_shuffle_per_table(spark, sf_dir):
    # Eight single-row aggregates unioned: at most one exchange per
    # table (the partial-sum gather); no joins anywhere.
    from mit_map_reduce_spark.operators.relational import (
        CHECKSUM_SCHEMAS,
        rel_table_checksums,
    )

    df = rel_table_checksums(spark, sf_dir)
    assert "Join" not in physical_plan(df)
    assert count_shuffles(df) <= len(CHECKSUM_SCHEMAS)


def test_entropy_shuffle_carries_counts_not_text(spark, sf_dir):
    # The (doc, char) aggregation must partial-aggregate map-side and
    # the scan must read only what it needs (doc_id + text).
    from mit_map_reduce_spark.operators.text import text_char_entropy

    df = text_char_entropy(spark, sf_dir)
    read = scan_read_schema(df)
    assert "doc_id" in read and "text" in read
    assert "lang" not in read and "source" not in read


def test_vocab_topk_queries_use_takeordered_not_global_sort(spark, sf_dir):
    # Top-K over a vocab-sized frame must plan as TakeOrderedAndProject
    # (per-partition top-K + K-row merge) — a row_number window over
    # the whole vocabulary would be one single task holding the full
    # term table at 100 TB.
    from mit_map_reduce_spark.operators.text import (
        text_bpe_pair_counts,
        text_stopword_discovery,
        text_vocab_coverage_curve,
    )

    for fn in (
        text_bpe_pair_counts,
        text_stopword_discovery,
        text_vocab_coverage_curve,
    ):
        plan = physical_plan(fn(spark, sf_dir))
        assert "TakeOrderedAndProject" in plan, fn.__name__


def test_fuzzy_match_compares_distinct_names_not_rows(spark, sf_dir):
    # Aggregate-then-compare: the pair join must run over the DISTINCT
    # (block, name) frame, so the number of levenshtein-scored
    # candidate pairs is vocabulary-bounded — independent of catalog
    # row count — and the join itself is a hash/sort-merge equi-join
    # on the composite (blk, band) key, never a nested loop.
    from mit_map_reduce_spark.operators.advanced import (
        FUZZY_BAND_W,
        adv_fuzzy_blocked_match,
    )

    sf01 = "/root/testdata/sf0.1"
    plan = physical_plan(adv_fuzzy_blocked_match(spark, sf01))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    # the distinct frame this corpus produces: candidate pairs must be
    # bounded by C(vocab,2)-ish, not C(rows,2) (~2e8 at sf0.1).
    part = load_table(spark, sf01, "part").select(
        F.element_at(F.split("p_name", " "), -1).alias("blk"), "p_name"
    )
    names = part.groupBy("blk", "p_name").count().withColumn(
        "band", F.floor(F.length("p_name") / F.lit(FUZZY_BAND_W))
    )
    a, b = names.alias("a"), names.alias("b")
    candidates = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.abs(F.col("a.band") - F.col("b.band")) <= 1)
        & (F.col("a.p_name") < F.col("b.p_name")),
    ).count()
    rows = part.count()
    assert candidates <= 1_000, candidates
    assert candidates < rows  # vocab-bounded, not row-bounded


def test_topic_classify_broadcasts_lexicon(spark, sf_dir):
    # The lexicon is dozens of rows: it must broadcast into the token
    # stream — a shuffled join would re-partition the exploded corpus
    # to meet a 22-row table.
    from mit_map_reduce_spark.operators.text import text_keyword_topic_classify

    df = text_keyword_topic_classify(spark, sf_dir)
    assert broadcast_join_count(df) >= 1
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan


def test_ks_test_has_no_unpartitioned_window(spark, sf_dir):
    # The prefix sums run through distributed_prefix (range exchange +
    # offset broadcast), never a single-task global window over the
    # distinct-value frame.
    from mit_map_reduce_spark.operators.advanced import adv_ks_test_segments

    plan = physical_plan(adv_ks_test_segments(spark, sf_dir))
    # the unpartitioned-window check lives in the repo-wide window
    # audit (test_window_audit); here pin that the plan stays
    # join/aggregate shaped:
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cumulative_distinct_users_shape(spark, sf_dir):
    # Two fact-sized shuffles (per-user min, per-day distinct) plus the
    # day-frame prefix machinery — and the day-frame join must not
    # devolve into a nested loop.
    from mit_map_reduce_spark.operators.advanced import (
        adv_cumulative_distinct_users,
    )

    df = adv_cumulative_distinct_users(spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = df.collect()
    # the running total is monotone and ends at the corpus's distinct
    # user count — a wrong join/fill shows up here immediately.
    cums = [r.cum_users for r in sorted(rows, key=lambda r: r.day)]
    assert cums == sorted(cums)
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert cums[-1] == n_users


def test_quarantine_is_single_shuffle_two_column_scan(spark, sf_dir):
    # The round-9 environment-free rewrite must stay the plan it
    # shipped as: lines built in-memory (no second scan, no file read),
    # exactly ONE exchange (the per-priority rollup), and the orders
    # scan pruned to the two columns the lines are built from —
    # o_totalprice left entirely unread.
    from mit_map_reduce_spark.operators.sources_queries import (
        src_csv_malformed_quarantine,
    )

    df = src_csv_malformed_quarantine(spark, sf_dir)
    assert count_shuffles(df) == 1
    read = scan_read_schema(df)
    assert "o_orderkey" in read and "o_orderpriority" in read
    assert "o_totalprice" not in read and "o_orderdate" not in read


def test_strip_cached_subtrees_is_materialization_invariant(spark, sf_dir):
    """Plan counts above a cache boundary must not change when the
    cache is materialized — the raw text DOES change (the stored
    subtree re-renders as an AQE final plan with query-stage nodes),
    which made PLAN_SNAPSHOT graph counts depend on sweep order
    (round-10 triage)."""
    from mit_map_reduce_spark.plans.inspect import strip_cached_subtrees

    cached = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
        .persist()
    )
    try:
        q = cached.groupBy((F.col("n") % 10).alias("b")).agg(
            F.sum("n").alias("s")
        )
        before = (
            count_shuffles(q, exclude_cached=True),
            broadcast_join_count(q, exclude_cached=True),
        )
        cached.count()  # materialize: cached subtree now renders final
        after = (
            count_shuffles(q, exclude_cached=True),
            broadcast_join_count(q, exclude_cached=True),
        )
        assert before == after
        # and the stripper really removed the cached build's exchange
        stripped = strip_cached_subtrees(physical_plan(q))
        assert "InMemoryRelation" in stripped  # boundary line kept
        # the cached BUILD's own shuffle (hashpartitioning on the group
        # key) must be gone from the stripped text
        assert "hashpartitioning(o_custkey" not in stripped.split(
            "InMemoryRelation"
        )[1]
    finally:
        cached.unpersist()


def test_strip_cached_subtrees_text_contract():
    from mit_map_reduce_spark.plans.inspect import strip_cached_subtrees

    plan = "\n".join(
        [
            "AdaptiveSparkPlan isFinalPlan=false",
            "+- HashAggregate",
            "   +- Exchange hashpartitioning(a, 32)",
            "      +- InMemoryTableScan [a]",
            "            +- InMemoryRelation [a, b]",
            "                  +- Exchange hashpartitioning(b, 32)",
            "                     +- BroadcastHashJoin",
            "                        :- FileScan parquet",
            "                        +- BroadcastExchange",
            "+- SecondBranch after cache",
        ]
    )
    got = strip_cached_subtrees(plan)
    assert "hashpartitioning(a" in got            # above cache: kept
    assert "InMemoryRelation" in got              # boundary line: kept
    assert "hashpartitioning(b" not in got        # stored build: dropped
    assert "BroadcastHashJoin" not in got
    assert "SecondBranch after cache" in got      # sibling at shallower depth resumes


def test_strip_cached_subtrees_markerless_boundary():
    """Corner case (r10 advice): an InMemoryRelation line with NO tree
    marker is the plan root — the whole remainder is its stored build
    plan and must be stripped, without the old depth=0 fallback's
    drop-marker-less/keep-column-0-marker behavior."""
    from mit_map_reduce_spark.plans.inspect import strip_cached_subtrees

    plan = "\n".join(
        [
            "InMemoryRelation [a, b]",
            "+- Exchange hashpartitioning(b, 32)",
            "   +- FileScan parquet",
        ]
    )
    got = strip_cached_subtrees(plan)
    assert "InMemoryRelation" in got
    assert "hashpartitioning(b" not in got
    assert "FileScan" not in got


def test_supplier_projection_has_no_join_after_hub_cap(spark, sf_dir):
    """Round-10 rewrite: after the hub cap the pair generation is a
    bounded collect_set + map-side explode — no self-join. At most
    three pinned-width hash shuffles above the edge cache: incidence
    on cust for the set-collect, the degree branch's own (narrower,
    one-column — column pruning beats exchange reuse here) cust
    shuffle, and the (a, b) pair agg. The only join left is the
    broadcast anti for the hub drop."""
    from mit_map_reduce_spark.operators.graph import graph_supplier_projection

    df = graph_supplier_projection(spark, sf_dir)
    plan = physical_plan(df)
    assert "SortMergeJoin" not in plan
    assert count_shuffles(df, exclude_cached=True) <= 3
    # every hash exchange is pinned (REPARTITION_BY_NUM), none rides
    # session conf width
    import re as _re

    from mit_map_reduce_spark.plans.inspect import strip_cached_subtrees

    hash_exchanges = _re.findall(
        r"Exchange hashpartitioning[^\n]*", strip_cached_subtrees(plan)
    )
    assert hash_exchanges and all(
        "REPARTITION_BY_NUM" in x for x in hash_exchanges
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_knn_edge_build_has_no_join_after_hub_cap(spark, sf_dir):
    """Round-10 rewrite of the mutual-kNN co-purchase build: pair
    generation is a bounded collect_set + explode (no self-join), the
    top-k window rides the SAME pinned exchange as the weight agg,
    and mutuality is a count==2 aggregate (no reversed-key join). The
    only join in the whole build is the broadcast anti hub drop."""
    from mit_map_reduce_spark.operators.graph import _knn_copurchase_edges

    df = _knn_copurchase_edges(spark, sf_dir)
    plan = physical_plan(df)
    assert "SortMergeJoin" not in plan
    # exactly one join: the broadcast-anti hub filter
    assert plan.count("Join") == plan.count("BroadcastHashJoin")
    import re as _re

    hash_exchanges = _re.findall(r"Exchange hashpartitioning[^\n]*", plan)
    assert hash_exchanges and all(
        "REPARTITION_BY_NUM" in x for x in hash_exchanges
    )
