"""Semantic tests for the corpus-filter operators added in round 3:
repetition flags, benchmark-contamination audit, stratified sampling,
and SimHash band-blocked near-dup pairs.

The differential (vs-DuckDB) check for each runs in test_operators.py;
these tests pin the SEMANTICS — planted inputs must be flagged, the
banding must be lossless at the Hamming radius it guarantees, and the
sampler must actually balance strata.
"""

import itertools

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mit_map_reduce_spark.operators import dedup as D
from mit_map_reduce_spark.operators import text as T


def _write_documents(tmp_path, rows):
    """Write a documents.parquet shaped like the testdata tables so
    operators can load the tmp dir as an sf_dir."""
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array(["synthetic"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_simhash_banding_is_lossless_within_radius(spark, sf_dir):
    # Pigeonhole: 4 bands x 8 bits find EVERY pair within Hamming <= 3.
    # Compare the operator against a brute-force all-pairs scan of the
    # fingerprints themselves — banding may only add no pairs, never
    # miss one inside the radius.
    fps = {r.doc_id: r.simhash for r in D.simhash_fingerprints(spark, sf_dir).collect()}
    want = set()
    for (a, sa), (b, sb) in itertools.combinations(sorted(fps.items()), 2):
        ham = sum(x != y for x, y in zip(sa, sb))
        if ham <= D.SIMHASH_MAX_HAMMING:
            want.add((a, b, ham))
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in D.simhash_band_pairs(spark, sf_dir).collect()
    }
    assert got == want


def test_contamination_planted_overlap(spark, tmp_path):
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    sf = _write_documents(
        tmp_path,
        [
            # doc 0: benchmark member (0 % 17 == 0)
            (0, f"benchmark question about {shared} end of prompt", "en"),
            # doc 1: training doc leaking the full benchmark 8-gram
            (1, f"some crawl page copying {shared} plus more text", "en"),
            # doc 2: clean training doc, no 8-token overlap
            (2, "totally unrelated content with its own distinct words here", "en"),
        ],
    )
    got = {r.doc_id: r for r in T.text_contamination(spark, sf).collect()}
    assert set(got) == {1, 2}  # benchmark docs excluded from the audit
    assert got[1].contaminated and got[1].n_contaminated_ngrams >= 1
    assert got[1].n_bench_docs == 1
    assert not got[2].contaminated and got[2].n_contaminated_ngrams == 0


def test_repetition_flags_degenerate_doc(spark, tmp_path):
    sf = _write_documents(
        tmp_path,
        [
            (1, "buy now " * 50, "en"),  # one bigram dominates
            (
                2,
                "a genuinely varied document where nearly every token "
                "differs from the previous one so no single bigram or "
                "token can possibly dominate the distribution",
                "en",
            ),
        ],
    )
    got = {r.doc_id: r for r in T.text_repetition(spark, sf).collect()}
    assert got[1].repetitive
    assert got[1].top_bigram_share > 0.4
    assert not got[2].repetitive
    assert got[2].distinct_ratio > 0.5


def test_containment_catches_inclusion_jaccard_misses(spark, tmp_path):
    # A short doc pasted verbatim inside a much longer one: containment
    # of the short side is ~1 while Jaccard stays below the near-dup
    # threshold — the case this operator exists for.
    quote = " ".join(f"quoted token number{i}" for i in range(10))  # 30 tokens
    filler = " ".join(f"host body word number{i} extra" for i in range(60))
    sf = _write_documents(
        tmp_path,
        [
            (1, quote, "en"),
            (2, f"{filler} {quote}", "en"),
            (3, "entirely different third document with its own words", "en"),
        ],
    )
    pairs = {(r.doc_a, r.doc_b): r for r in D.ngram_containment_pairs(spark, sf).collect()}
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)].containment_a >= 0.95  # short side fully contained
    assert pairs[(1, 2)].containment_b < 0.5  # long side is not
    jrows = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.ngram_jaccard_pairs(spark, sf).collect()
    }
    # Jaccard sees the same pair but scores it under the near-dup
    # threshold — inclusion is invisible to symmetric similarity.
    if (1, 2) in jrows:
        assert jrows[(1, 2)] < D.JACCARD_THRESHOLD


def test_span_dedup_removes_copy_keeps_owner(spark, tmp_path):
    span = " ".join(f"boiler plate token number{i}" for i in range(4))  # 12 tokens
    sf = _write_documents(
        tmp_path,
        [
            (1, f"owner document starts here {span} and then continues onward", "en"),
            (2, f"copying document prefix words {span} with its own unique suffix", "en"),
            (3, "a third document sharing nothing with the other two at all", "en"),
        ],
    )
    got = {r.doc_id: r for r in D.span_dedup_clean(spark, sf).collect()}
    assert got[1].n_removed == 0  # canonical owner keeps the span
    assert got[2].n_removed >= 12  # the copied span is stripped
    assert "boiler" not in got[2].text_clean
    assert "unique suffix" in got[2].text_clean  # non-span words survive
    assert got[3].n_removed == 0


def test_stratified_sample_balances_strata(spark, tmp_path):
    # 200-doc majority lang vs a 10-doc minority: the minority stratum
    # passes through whole (n_lang <= target keeps every bucket), the
    # majority is cut to ~STRATA_TARGET.
    rows = [(i, f"majority document number {i} text", "en") for i in range(200)]
    rows += [(1000 + i, f"minority document number {i} text", "sw") for i in range(10)]
    sf = _write_documents(tmp_path, rows)
    kept = T.text_stratified_sample(spark, sf).collect()
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r.lang, []).append(r.doc_id)
    assert len(by_lang["sw"]) == 10  # small stratum: kept whole
    # majority: hash-binomial around 200 * 30/200 = 30; generous bounds
    assert 10 <= len(by_lang["en"]) <= 60
    # determinism: a second run keeps the identical doc set
    again = {r.doc_id for r in T.text_stratified_sample(spark, sf).collect()}
    assert again == {r.doc_id for r in kept}


def test_span_dedup_absorbs_viral_boilerplate(spark, tmp_path):
    """Adversarial skew (round-4 verdict #7): ONE boilerplate span
    planted in 1000 documents — the 90%-boilerplate-corpus shape. The
    per-gram ownership aggregation must absorb the hot gram map-side
    (its output is one row per distinct gram, never per occurrence),
    every non-owner loses the span, and the covered-position relation
    stays linear in occurrences (<= docs x span positions), never
    quadratic in the gram's document frequency.
    """
    # letter-only ids: the tokenizer drops digits ([^\p{L}]+ split),
    # so "part42" would collapse to "part" and alias every document
    alpha = lambda i: "".join(chr(ord("a") + int(d)) for d in str(i))  # noqa: E731
    span = " ".join(f"viral boiler plate token num{alpha(i)}" for i in range(4))  # 24 tokens
    n_docs = 1000
    rows = [
        (i, f"document ident{alpha(i)} unique opening words {span} unique closing part{alpha(i)}", "en")
        for i in range(n_docs)
    ]
    sf = _write_documents(tmp_path, rows)
    got = {r.doc_id: r for r in D.span_dedup_clean(spark, sf).collect()}
    assert len(got) == n_docs
    assert got[0].n_removed == 0  # owner (min doc_id) keeps the span
    strip = [r for r in got.values() if r.doc_id != 0]
    assert all(r.n_removed >= 24 for r in strip)  # span gone everywhere else
    assert all("viral" not in r.text_clean for r in strip)
    assert all(f"part{alpha(r.doc_id)}" in r.text_clean for r in strip)  # unique text survives
    # Plan sanity: the ownership agg runs partial (map-side) before its
    # exchange — two HashAggregate levels around one gram-keyed shuffle.
    docs = D.spread(D.load_table(spark, sf, "documents"))
    ws = D.tokenize_letters(D.F.col("text"))
    grams = docs.select("doc_id", D.F.explode(D.word_kgrams(ws, D.SPAN_K)).alias("gram"))
    owners = grams.groupBy("gram").agg(
        D.F.countDistinct("doc_id").alias("nd"), D.F.min("doc_id").alias("owner")
    )
    plan = owners._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2


def test_split_leakage_audit_consistency(spark, sf_dir):
    # Counters must reconcile: train+test == corpus, cross pairs <=
    # pairs, every leaked doc is a test doc appearing in a cross pair
    # (cross-checked against a direct recomputation from the pair
    # table), and the rate derives from the exact integers.
    from pyspark.sql import functions as F
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.operators.dedup import (
        LEAK_TEST_PCT,
        dedup_split_leakage_audit,
        minhash_lsh_pairs,
    )

    r = dedup_split_leakage_audit(spark, sf_dir).first()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert r.n_train + r.n_test == n_docs
    assert 0 <= r.n_cross_pairs <= r.n_pairs
    assert r.n_pairs == minhash_lsh_pairs(spark, sf_dir).count()
    # direct recomputation of the leaked-doc set
    bucket = (
        F.conv(F.md5(F.col("doc_id").cast("string")).substr(1, 4), 16, 10).cast("int")
        % 100
    )
    test_ids = {
        row.doc_id
        for row in load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(bucket < LEAK_TEST_PCT)
        .collect()
    }
    leaked = set()
    for p in minhash_lsh_pairs(spark, sf_dir).collect():
        a_t, b_t = p.doc_a in test_ids, p.doc_b in test_ids
        if a_t != b_t:
            leaked.add(p.doc_a if a_t else p.doc_b)
    assert r.n_leaked_test_docs == len(leaked)


def test_cluster_size_report_reconciles_with_keep_list(spark, sf_dir):
    # The histogram must partition the corpus (sum n_docs == corpus
    # size) and its dropped count must equal the keep-list's drops.
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.operators.dedup import (
        dedup_cluster_size_report,
        near_dup_keep_list,
    )

    rows = dedup_cluster_size_report(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    kl = near_dup_keep_list(spark, sf_dir).collect()
    n_dropped = sum(1 for r in kl if not r.keep)
    assert sum(r.n_docs_dropped for r in rows) == n_dropped
    assert abs(sum(r.corpus_share for r in rows) - 1.0) < 0.01


def test_bbit_estimator_formula_and_exact_match_saturation(spark, sf_dir):
    # The estimator recomputes from the row's own integers; pairs with
    # identical full signatures (all 8 b-bit slots match) estimate 1.0.
    from mit_map_reduce_spark.operators.dedup import (
        BBIT_C,
        bbit_minhash_report,
        minhash_lsh_pairs,
    )

    rows = bbit_minhash_report(spark, sf_dir).collect()
    assert len(rows) == minhash_lsh_pairs(spark, sf_dir).count()
    for r in rows:
        mf = r.n_matches / 8
        expect = max(0.0, (mf - BBIT_C) / (1 - BBIT_C))
        assert abs(r.bbit_estimate - expect) < 1e-4
        assert abs(r.abs_error - abs(expect - r.exact_jaccard)) < 1e-4
        if r.n_matches == 8:
            assert r.bbit_estimate == 1.0
