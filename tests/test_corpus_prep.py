"""Semantic tests for the round-4 corpus-prep additions: BPE pair
counting (one tokenizer-training merge iteration) and overlapping
context chunking. The vs-DuckDB differential check runs in
test_operators.py; these pin the SEMANTICS on planted inputs where the
expected output is hand-computable.
"""

import pyarrow as pa
import pyarrow.parquet as pq

from mit_map_reduce_spark.operators import text as T


def _write_documents(tmp_path, rows):
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


def test_quantize_int8_planted_vector(spark, tmp_path):
    # [1.0, -0.5, 0.25]: scale=1.0, q = [127, floor(-63.5+0.5)=-63,
    # floor(31.75+0.5)=32] — pins the round-half-up-toward-+inf rule
    # both engines share (NOT banker's rounding).
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mit_map_reduce_spark.operators.similarity import embedding_quantize_int8

    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1], pa.int64()),
                "embedding": pa.array(
                    [[1.0, -0.5, 0.25], [0.0, 0.0, 0.0]], pa.list_(pa.float32())
                ),
                "label": pa.array([0, 0], pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    rows = {r.vec_id: r for r in embedding_quantize_int8(spark, str(tmp_path)).collect()}
    r = rows[0]
    assert (r.scale, r.n_dims, r.q_min, r.q_max, r.q_sum, r.q_l1) == (
        1.0, 3, -63, 127, 96, 222,
    )
    z = rows[1]  # all-zero vector: scale 0, all-zero lanes (guarded 0/0)
    assert (z.scale, z.q_min, z.q_max, z.q_sum, z.q_l1) == (0.0, 0, 0, 0, 0)


def test_quantize_int8_full_scale_lane(spark, sf_dir):
    # Symmetric max-abs scaling means every vector's largest-|x| lane
    # quantizes to exactly +/-127, and no lane can exceed the range.
    from pyspark.sql import functions as F

    from mit_map_reduce_spark.operators.similarity import embedding_quantize_int8

    q = embedding_quantize_int8(spark, sf_dir)
    bad = q.filter(
        (F.abs(F.col("q_min")) > 127)
        | (F.abs(F.col("q_max")) > 127)
        | (
            (F.col("scale") != 0)  # all-zero vectors quantize to zeros
            & (F.col("q_max") != 127)
            & (F.col("q_min") != -127)
        )
    )
    assert bad.count() == 0


def test_bpe_pair_counts_planted_vocab(spark, tmp_path):
    # banana x3 + bandana x1. Per-occurrence pair multisets:
    #   banana:  ba an na an na  -> an:2 na:2 ba:1   (x3)
    #   bandana: ba an nd da an na -> an:2 ba:1 nd:1 da:1 na:1
    # Totals: an=8, na=7, ba=4, da=1, nd=1 (alphabetical tie-break).
    sf = _write_documents(
        tmp_path,
        [(0, "banana banana banana", "en"), (1, "bandana", "en")],
    )
    rows = T.text_bpe_pair_counts(spark, sf).collect()
    got = [(r.rank, r.pair, r.pair_count) for r in sorted(rows, key=lambda r: r.rank)]
    assert got == [(1, "an", 8), (2, "na", 7), (3, "ba", 4), (4, "da", 1), (5, "nd", 1)]


def test_bpe_single_char_words_emit_no_pairs(spark, tmp_path):
    # 1-char words have no adjacent pair; Spark's sequence() infers a
    # negative step for start > stop, so an unguarded explode would
    # fabricate pairs here.
    sf = _write_documents(tmp_path, [(0, "a a a b ab", "en")])
    rows = T.text_bpe_pair_counts(spark, sf).collect()
    assert [(r.pair, r.pair_count) for r in rows] == [("ab", 1)]


def test_chunk_overlap_geometry_and_coverage(spark, tmp_path):
    # 100 two-letter tokens: chunks start at 0/32/64 (96 is dropped:
    # its 4 remaining tokens are inside the previous chunk's 48).
    letters = "abcdefghij"
    toks = [letters[i // 10] + letters[i % 10] for i in range(100)]
    sf = _write_documents(
        tmp_path, [(0, " ".join(toks), "en"), (1, "solo tiny doc", "en")]
    )
    rows = T.text_chunk_overlap(spark, sf).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    long_doc = sorted(by_doc[0], key=lambda r: r.chunk_idx)
    assert [
        (r.chunk_idx, r.start_tok, r.n_chunk_tokens, r.first_tok, r.last_tok)
        for r in long_doc
    ] == [
        (0, 0, 48, toks[0], toks[47]),
        (1, 32, 48, toks[32], toks[79]),
        (2, 64, 36, toks[64], toks[99]),
    ]
    # Every token index is covered by at least one chunk.
    covered = set()
    for r in long_doc:
        covered.update(range(r.start_tok, r.start_tok + r.n_chunk_tokens))
    assert covered == set(range(100))
    # Consecutive chunks overlap by exactly CHUNK_SIZE - CHUNK_STRIDE
    # while both are full-size.
    assert long_doc[0].start_tok + T.CHUNK_SIZE - long_doc[1].start_tok == (
        T.CHUNK_SIZE - T.CHUNK_STRIDE
    )
    # Short doc: one chunk holding everything.
    assert [(r.chunk_idx, r.start_tok, r.n_chunk_tokens) for r in by_doc[1]] == [
        (0, 0, 3)
    ]


def test_incremental_ingest_verdicts_planted(spark, tmp_path):
    # Incoming batch = doc_id % 4 == 0. Planted outcomes:
    #   doc 0: byte-identical to existing doc 1       -> exact_dup(1)
    #   doc 4: last word changed vs existing doc 1    -> near_dup(1)
    #   doc 8: unique                                 -> new
    #   doc 12: identical to INCOMING doc 16 only     -> new (in-batch
    #           dups are out of scope by contract)
    from mit_map_reduce_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        dedup_incremental_ingest,
    )

    base = ("quick brown foxes jump over lazy sleeping dogs near quiet "
            "rivers while golden eagles circle high above misty mountain "
            "valleys watching tiny scurrying marmots below")
    near = base.replace("below", "beneath")  # tail word: 4 of 21 shingles differ
    twin = "completely separate incoming duplicate text repeated verbatim here " * 3
    sf = _write_documents(
        tmp_path,
        [
            (0, base, "en"),
            (1, base, "en"),
            (2, "an existing document about duckdb storage internals", "en"),
            (4, near, "en"),
            (8, "an utterly unrelated document about spark physical plans", "en"),
            (12, twin, "en"),
            (16, twin, "en"),
        ],
    )
    rows = {r.doc_id: r for r in dedup_incremental_ingest(spark, sf).collect()}
    assert set(rows) == {0, 4, 8, 12, 16}
    assert (rows[0].verdict, rows[0].match_doc, rows[0].jaccard) == ("exact_dup", 1, None)
    assert rows[4].verdict == "near_dup" and rows[4].match_doc == 1
    assert rows[4].jaccard >= JACCARD_THRESHOLD
    assert rows[8].verdict == "new" and rows[8].match_doc is None
    assert rows[12].verdict == "new"  # its only twin is incoming
    assert rows[16].verdict == "new"


def test_mmr_reranks_near_duplicate_hits(spark, tmp_path):
    # Query [1,0]; two near-identical high-relevance "twins" (ids 1,2)
    # and a slightly-less-relevant but diverse vector (id 3, opposite
    # side of the query). Plain top-3 by relevance is [1,2,3]; MMR must
    # demote the second twin: [1,3,2]. Geometry chosen so
    # 0.7*rel - 0.3*max_sim flips: twin2 ~ 0.7*0.990-0.3*1.000=0.393 <
    # diverse ~ 0.7*0.985-0.3*0.951=0.404.
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mit_map_reduce_spark.operators.similarity import ann_mmr_diversified_topk

    def ang(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]

    vecs = {0: ang(0), 1: ang(8), 2: ang(8.05), 3: ang(-10)}
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(sorted(vecs), pa.int64()),
                "embedding": pa.array(
                    [vecs[k] for k in sorted(vecs)], pa.list_(pa.float32())
                ),
                "label": pa.array([0] * 4, pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    picks = sorted(
        (r.pick_rank, r.neighbor_id)
        for r in ann_mmr_diversified_topk(spark, str(tmp_path)).collect()
    )
    assert picks == [(1, 1), (2, 3), (3, 2)]


def test_trigram_backoff_levels_planted(spark, tmp_path):
    # train doc 1: "a b c a b c" -> trigrams {a b c: 2, b c a, c a b};
    # eval doc 0: "a b c b c d" -> per-trigram resolution:
    #   "a b c": seen        -> S = 2/2 = 1.0        (tri)
    #   "b c b": bg "c b" unseen, uni c(b)=1, N=4 -> S = .16/4 (uni)
    #   "c b c": bg "b c" seen(2), c(b)=2 -> S = .4*2/2 = 0.4 (bi)
    #   "b c d": unseen all the way, c(d)=0 -> floor .16*(1/4) (uni)
    # micronats: 0 + 3218876 + 916291 + 3218876 -> avg 1.8385
    from mit_map_reduce_spark.operators.text import text_trigram_backoff_logprob

    sf = _write_documents(
        tmp_path, [(0, "a b c b c d", "en"), (1, "a b c a b c", "en")]
    )
    (r,) = text_trigram_backoff_logprob(spark, sf).collect()
    assert (
        r.doc_id, r.n_trigrams, r.avg_neg_logp,
        r.n_tri_hits, r.n_bi_backoffs, r.n_uni_backoffs,
    ) == (0, 4, 1.8385, 1, 1, 2)


def test_langid_agreement_totals_and_diagonal(spark, sf_dir):
    # Matrix cells must partition the corpus; correctness counters are
    # bounded by cell size; diagonal cells are where both agree.
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.operators.text import text_langid_agreement

    rows = text_langid_agreement(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 0 <= r.n_lex_correct <= r.n_docs
        assert 0 <= r.n_trigram_correct <= r.n_docs
    assert abs(sum(r.share for r in rows) - 1.0) < 0.01


def test_char_entropy_bounds_and_planted_extremes(spark, sf_dir):
    # Entropy of any distribution over k symbols lies in [0, log2 k];
    # a single-char doc must score exactly 0 bits, and a doc of
    # distinct chars scores log2(n). Planted via a tiny local frame
    # running the same aggregation shape end-to-end on real docs.
    import math
    from mit_map_reduce_spark.operators.text import text_char_entropy

    rows = text_char_entropy(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r.entropy_bits <= math.log2(r.n_distinct_chars) + 1e-6
        assert r.low_entropy == (r.entropy_bits < 3.0 or abs(r.entropy_bits - 3.0) < 5e-5)
        assert r.n_distinct_chars <= r.n_chars_scored <= 256


def test_tokenizer_fertility_ratio_sanity(spark, sf_dir):
    # BPE-ish pre-tokenization never yields fewer tokens than the
    # whitespace split (every ws token is >= 1 BPE token), so
    # fertility >= 1; chars/token is positive and bounded by the
    # longest token.
    from mit_map_reduce_spark.operators.text import text_tokenizer_fertility

    rows = text_tokenizer_fertility(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.fertility >= 1.0
        assert 0 < r.chars_per_token < 50
        assert r.bpe_tokens >= r.ws_tokens > 0


def test_perplexity_buckets_partition_corpus(spark, sf_dir):
    # Buckets tile each language's scored docs; head scores <= tail
    # scores within a language; doc counts recover the scored corpus.
    from collections import defaultdict
    from mit_map_reduce_spark.operators.text import (
        text_perplexity_buckets,
        text_unigram_logprob,
    )

    n_scored = text_unigram_logprob(spark, sf_dir).count()
    per_lang = defaultdict(list)
    for r in text_perplexity_buckets(spark, sf_dir).collect():
        per_lang[r.lang].append(r)
    assert sum(r.n_docs for rs in per_lang.values() for r in rs) == n_scored
    for rs in per_lang.values():
        rs.sort(key=lambda r: r.bucket)
        for a, b in zip(rs, rs[1:]):
            assert a.avg_neg_logp <= b.avg_neg_logp + 1e-9
        for r in rs:
            assert r.min_neg_logp <= r.avg_neg_logp <= r.max_neg_logp


def test_bpe_trainer_matches_pure_python_bpe(spark, sf_dir):
    # Golden test: re-run Sennrich-style BPE training in plain Python
    # over the same word-frequency table; the learned merge sequence
    # (pairs AND counts) must match exactly.
    from collections import Counter
    from pyspark.sql import functions as F
    from mit_map_reduce_spark.catalog import load_table, spread
    from mit_map_reduce_spark.functions.columns import tokenize_letters
    from mit_map_reduce_spark.operators.text import (
        BPE_TRAIN_MERGES,
        text_bpe_train_merges,
    )

    freq = Counter()
    for r in (
        spread(load_table(spark, sf_dir, "documents"))
        .select(F.explode(tokenize_letters(F.lower(F.col("text")))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .collect()
    ):
        freq[tuple(r.w)] = r.c
    expect = []
    vocab = dict(freq)
    for rank in range(BPE_TRAIN_MERGES):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((rank, a, b, a + b, n))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    got = [
        (r.merge_rank, r.sym_a, r.sym_b, r.merged, r.pair_count)
        for r in sorted(
            text_bpe_train_merges(spark, sf_dir).collect(),
            key=lambda r: r.merge_rank,
        )
    ]
    assert got == expect


def test_bpe_apply_compression_bounded_by_merges(spark, sf_dir):
    # Token counts are bounded: chars >= bpe tokens >= words (merges
    # only shrink, never below one symbol per word); compression
    # ratio recomputes from the row's own integers.
    from mit_map_reduce_spark.operators.text import text_bpe_apply_encode

    rows = text_bpe_apply_encode(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_chars >= r.n_bpe_tokens >= r.n_words
        import math
        assert r.chars_per_token == math.floor(r.n_chars / r.n_bpe_tokens * 10000 + 0.5) / 10000
