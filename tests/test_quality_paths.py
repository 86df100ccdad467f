"""Quality gates for the approximate and fast paths.

- Recall floors for every approximate candidate-generation path vs its
  exact baseline (a parameter change that silently drops recall below
  the floor now fails the suite — the numbers were only stated in
  commit messages before).
- Bit-parity of the NumPy-vectorized dot product with the Catalyst HOF
  fold (same sequential accumulation — see functions/vectorized.py).
- Train-once IVF centroid artifact reuse.
- Watermark late-data semantics: an over-late event is DROPPED from an
  append sink (the semantics the stream_append_tumbling_file_sink
  oracle encodes, provoked by an actual late micro-batch here).
"""

import os

import pytest

from mit_map_reduce_spark.operators import dedup as D
from mit_map_reduce_spark.operators import similarity as S

# Floors sit ~0.05-0.1 below the measured sf0.001 values (LSH 0.52,
# IVF 0.40, banded 0.54) — loose enough for benign data regeneration,
# tight enough to catch a real parameter regression.
LSH_RECALL_FLOOR = 0.45
IVF_RECALL_FLOOR = 0.30
BAND_RECALL_FLOOR = 0.45


def _topk_set(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


@pytest.fixture(scope="module")
def exact_topk(spark, sf_dir):
    return _topk_set(S.ann_bruteforce_topk(spark, sf_dir))


def test_lsh_multiprobe_recall_floor(spark, sf_dir, exact_topk):
    got = _topk_set(S.ann_lsh_topk(spark, sf_dir))
    recall = len(got & exact_topk) / len(exact_topk)
    assert recall >= LSH_RECALL_FLOOR, f"LSH recall@5 {recall:.2f} < {LSH_RECALL_FLOOR}"


def test_ivf_recall_floor(spark, sf_dir, exact_topk):
    got = _topk_set(S.ann_ivf_topk(spark, sf_dir))
    recall = len(got & exact_topk) / len(exact_topk)
    assert recall >= IVF_RECALL_FLOOR, f"IVF recall@5 {recall:.2f} < {IVF_RECALL_FLOOR}"


def test_banded_embedding_lsh_pair_recall_floor(spark, sf_dir):
    exact = {(r.vec_a, r.vec_b) for r in D.embedding_dup_pairs(spark, sf_dir).collect()}
    got = {(r.vec_a, r.vec_b) for r in D.embedding_lsh_dup_pairs(spark, sf_dir).collect()}
    assert exact, "exact near-dup baseline unexpectedly empty"
    recall = len(got & exact) / len(exact)
    assert recall >= BAND_RECALL_FLOOR, f"banded recall {recall:.2f} < {BAND_RECALL_FLOOR}"
    # precision is 1 by construction: candidates are verified with the
    # same exact cosine + threshold as the baseline
    assert got <= exact


def test_vectorized_bruteforce_bit_identical(spark, sf_dir):
    hof = sorted(map(tuple, S.ann_bruteforce_topk(spark, sf_dir).collect()))
    vec = sorted(map(tuple, S.ann_bruteforce_topk_np(spark, sf_dir).collect()))
    assert hof == vec  # includes the rounded cosine — bit parity, not approx


def test_vectorized_all_pairs_bit_identical(spark, sf_dir):
    from mit_map_reduce_spark.operators import dedup as D

    hof = sorted(map(tuple, D.embedding_dup_pairs(spark, sf_dir).collect()))
    vec = sorted(map(tuple, D.embedding_dup_pairs_np(spark, sf_dir).collect()))
    assert hof and hof == vec


def test_ivf_centroid_artifact_trained_once(spark, sf_dir, monkeypatch):
    # first call trains and materializes the artifact
    S.ann_ivf_topk(spark, sf_dir).count()
    # retraining would now be a bug: poison the trainer and search again
    def boom(*a, **k):
        raise AssertionError("centroids retrained despite existing artifact")

    monkeypatch.setattr(S, "_trained_centroids", boom)
    assert S.ann_ivf_topk(spark, sf_dir).count() > 0


def test_append_sink_drops_over_watermark_late_event(spark, tmp_path):
    """Three micro-batches: batch 0 advances the watermark past day 1's
    window end; batch 1 lets that watermark take effect for late-event
    filtering (since SPARK-40925 the LATE-EVENT watermark lags one
    batch behind the EVICTION watermark) and emits+evicts day 1; batch
    2 delivers a day-1 event that is now over-late. The append sink
    must contain day 1 WITHOUT the late event — and exactly once: were
    the late row admitted, it would resurrect the evicted day-1 state
    and append a duplicate day-1 row, breaking append's
    once-per-window contract. The still-open day-2 window is absent."""
    import pandas as pd
    from pyspark.sql import functions as F

    src = tmp_path / "src"
    src.mkdir()

    def write(name, rows, mtime):
        pdf = pd.DataFrame(rows, columns=["ts", "user_id"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        p = str(src / name)
        # micros, not pandas' default nanos: the session reads parquet
        # TIMESTAMP(NANOS) as long (nanosAsLong), which would clash
        # with the declared timestamp schema
        pdf.to_parquet(p, coerce_timestamps="us", allow_truncated_timestamps=True)
        os.utime(p, (mtime, mtime))

    # batch 0: three day-1 events + one day-2 event that pushes the
    # (eviction) watermark to day-2 11:00, past day 1's window end
    write(
        "f1.parquet",
        [("2024-01-01 10:00:00", 1), ("2024-01-01 10:05:00", 2),
         ("2024-01-01 10:10:00", 3), ("2024-01-02 12:00:00", 4)],
        mtime=1_000_000,
    )
    # batch 1: benign day-2 event; day 1 emits (n=3) and is evicted
    write("f2.parquet", [("2024-01-02 13:00:00", 6)], mtime=2_000_000)
    # batch 2: a day-1 event arriving after the late-event watermark
    # passed its window — must be dropped, not resurrect day 1
    write("f3.parquet", [("2024-01-01 05:00:00", 5)], mtime=3_000_000)

    schema = "ts timestamp, user_id bigint"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch, mtime order
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").cast("string").alias("ws"), "n")
    )
    name = "late_drop_sink"
    q = agg.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r.ws: r.n for r in spark.table(name).collect()}
    assert rows == {"2024-01-01 00:00:00": 3}  # late event dropped, day 2 open


def test_pq_distortion_beats_single_global_codebook_floor(spark, sf_dir):
    # PQ invariants: every vector encodes to 4 in-range codes; the
    # reconstruction error is non-negative and, averaged, lower than
    # the trivial all-zeros reconstruction (sum of squared norms) —
    # i.e., the codebooks actually learned something.
    from pyspark.sql import functions as F
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.functions.columns import vec_norm
    from mit_map_reduce_spark.operators.similarity import (
        PQ_K,
        PQ_SUBSPACES,
        pq_encode_report,
    )

    rows = pq_encode_report(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == n
    for r in rows:
        codes = [int(c) for c in r.codes.split("|")]
        assert len(codes) == PQ_SUBSPACES
        assert all(0 <= c < PQ_K for c in codes)
        assert r.recon_err >= 0
    avg_err = sum(r.recon_err for r in rows) / n
    avg_sq_norm = (
        load_table(spark, sf_dir, "embeddings")
        .select((vec_norm(F.col("embedding")) ** 2).alias("s"))
        .agg(F.avg("s"))
        .first()[0]
    )
    assert avg_err < avg_sq_norm


def test_pq_adc_recall_vs_exact_bruteforce(spark, sf_dir):
    # ADC over 4x8 codebooks is a coarse quantization of a coarse
    # quantization — recall floor is modest but must be far above
    # random (TOP_K/corpus ~ 1%). A broken distance table or code
    # melt collapses to random.
    from mit_map_reduce_spark.operators.similarity import (
        ann_bruteforce_topk,
        pq_adc_topk,
    )

    exact: dict[int, set] = {}
    for r in ann_bruteforce_topk(spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx: dict[int, set] = {}
    for r in pq_adc_topk(spark, sf_dir).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(approx) == set(exact)
    recalls = [len(exact[q] & approx[q]) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.1


def test_embedding_drift_matches_numpy(spark, sf_dir):
    # Golden: recompute each label's batch-mean L2 shift with NumPy.
    import numpy as np
    from collections import defaultdict
    from mit_map_reduce_spark.catalog import load_table
    from mit_map_reduce_spark.operators.similarity import embedding_drift_report

    by = defaultdict(lambda: ([], []))
    for r in load_table(spark, sf_dir, "embeddings").collect():
        by[r.label][0 if r.vec_id % 2 == 0 else 1].append(r.embedding)
    got = {r.label: r for r in embedding_drift_report(spark, sf_dir).collect()}
    for label, (a, b) in by.items():
        if not a or not b:
            assert label not in got
            continue
        shift = float(
            np.linalg.norm(
                np.mean(np.array(a, dtype=np.float64), axis=0)
                - np.mean(np.array(b, dtype=np.float64), axis=0)
            )
        )
        r = got[label]
        assert (r.n_batch_a, r.n_batch_b) == (len(a), len(b))
        assert abs(r.mean_l2_shift - shift) < 1e-4
