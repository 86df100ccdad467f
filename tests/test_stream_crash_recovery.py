"""Crash-recovery equivalence for every STATEFUL streaming family.

The reference's hardest test kills processes mid-job and requires the
final output to converge with an uninterrupted run
(src/main/test-mr.sh:294-319). Round 11 closed that for the batch
surface (tests/test_fault_injection.py) and for ONE stream shape
(stream_incremental_restart); this module applies it to each remaining
stateful family, driving the SAME transformation builders the
registered queries use (streaming/queries.py) over an incremental
feed:

- session windows       (session_window state merge across restart)
- dedup-within-watermark (dedup state + chained window agg)
- stream-stream join    (buffered join state on both sides)
- stateful user profile (applyInPandasWithState + foreachBatch upsert)

Protocol per family: run 1 processes the first half of the event
timeline and STOPS (the kill point — state lives only in the
checkpoint); run 2 is a brand-new query instance on the same
checkpoint + sink processing the rest; the final sink must equal a
clean single-run over all the data. The split is by event time, so
run 2 only advances the watermark — what is under test is
state/offset/sink recovery, not late data (stream_late_data_metrics'
job). The upsert family additionally gets a TORN-COMMIT abort: a crash
injected after the snapshot files are written but before the pointer
swap (the `pre_commit_hook` seam), then a restart that must converge.
"""

import datetime
import os

import pytest
from pyspark.sql import functions as F

from mit_map_reduce_spark.catalog import load_table
from mit_map_reduce_spark.streaming.queries import (
    _attribution_join,
    _dedup_within_watermark_agg,
    _profile_update_out,
    _run_to_upsert_sink,
    _session_windows_agg,
    _stage_single_parquet,
)


def _halves(spark, sf_dir):
    """events split by event time at day 15 — run 2's half only
    ADVANCES the watermark (same split as stream_incremental_restart)."""
    ev = load_table(spark, sf_dir, "events")
    cut = ev.agg(F.date_trunc("day", F.min("ts")).alias("d")).first()["d"]
    mid = cut + datetime.timedelta(days=15)
    return ev.filter(F.col("ts") < F.lit(mid)), ev.filter(F.col("ts") >= F.lit(mid))


def _stream(spark, feed, schema):
    return spark.readStream.schema(schema).parquet(feed)


def _drain_append(agg, sink, ckpt):
    """One drain of an append-mode query into a parquet file sink —
    processAllAvailable + stop, the production runners' choreography
    (availableNow can terminate before the post-watermark no-data
    flush batch, which would skew the interrupted/clean comparison)."""
    spark = agg.sparkSession
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _read_sink(spark, sink, schema):
    if not os.path.isdir(sink) or not any(
        f.endswith(".parquet") for f in os.listdir(sink) if not f.startswith("_")
    ):
        return spark.createDataFrame([], schema)
    return spark.read.parquet(sink)


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def _append_family_recovery(spark, sf_dir, tmp_path, build, dup_feed=False):
    """Interrupted (2 runs, one checkpoint) vs clean (1 run) for an
    append-mode builder over the events stream; returns both row sets.

    ``dup_feed`` stages every half TWICE (two files, same content) —
    the at-least-once redelivery the dedup family collapses.
    """
    h1, h2 = _halves(spark, sf_dir)
    feed_i = str(tmp_path / "feed_interrupted")
    feed_c = str(tmp_path / "feed_clean")
    os.makedirs(feed_i), os.makedirs(feed_c)
    copies = ("", "x") if dup_feed else ("",)

    def stage(half, feed, tag):
        for c in copies:
            _stage_single_parquet(half, os.path.join(feed, f"b{tag}{c}.parquet"))

    stage(h1, feed_i, 0)
    schema = spark.read.parquet(os.path.join(feed_i, "b0.parquet")).schema

    sink_i, ckpt_i = str(tmp_path / "sink_i"), str(tmp_path / "ckpt_i")
    # run 1: first half only, then STOP — the kill point
    _drain_append(build(lambda: _stream(spark, feed_i, schema)), sink_i, ckpt_i)
    # run 2: new query instance, same checkpoint+sink, rest of the data
    stage(h2, feed_i, 1)
    _drain_append(build(lambda: _stream(spark, feed_i, schema)), sink_i, ckpt_i)

    stage(h1, feed_c, 0)
    stage(h2, feed_c, 1)
    sink_c, ckpt_c = str(tmp_path / "sink_c"), str(tmp_path / "ckpt_c")
    _drain_append(build(lambda: _stream(spark, feed_c, schema)), sink_c, ckpt_c)

    out_schema = build(lambda: _stream(spark, feed_c, schema)).schema
    return (
        _sorted_rows(_read_sink(spark, sink_i, out_schema)),
        _sorted_rows(_read_sink(spark, sink_c, out_schema)),
    )


def test_session_windows_recovery(spark, sf_dir, tmp_path):
    # sessions spanning the split must MERGE across the restart (their
    # open state lives only in the checkpoint between runs)
    interrupted, clean = _append_family_recovery(
        spark, sf_dir, tmp_path, lambda mk: _session_windows_agg(mk())
    )
    assert len(clean) > 0
    assert interrupted == clean


def test_dedup_within_watermark_recovery(spark, sf_dir, tmp_path):
    # each half delivered twice (redelivery); dedup state + the chained
    # window agg state both recover from the checkpoint
    interrupted, clean = _append_family_recovery(
        spark, sf_dir, tmp_path, lambda mk: _dedup_within_watermark_agg(mk()), dup_feed=True
    )
    assert len(clean) > 0
    assert interrupted == clean


def test_stream_stream_join_recovery(spark, sf_dir, tmp_path):
    # purchases in run 2 must still match clicks buffered during run 1
    # — the buffered-rows join state recovers from the checkpoint
    interrupted, clean = _append_family_recovery(
        spark, sf_dir, tmp_path, _attribution_join
    )
    assert len(clean) > 0
    assert interrupted == clean


@pytest.mark.parametrize("stage", ["pre_swap", "post_swap"])
def test_stateful_profile_recovery_with_torn_commit(spark, sf_dir, tmp_path, stage):
    # applyInPandasWithState + foreachBatch upsert: run 1 commits the
    # first half; run 2 CRASHES at a torn-commit point — pre_swap
    # (snapshot files written, pointer not swapped) or post_swap
    # (pointer swapped, batch not committed to the stream checkpoint:
    # the replay reads the crashed attempt's own output as the current
    # snapshot); run 3 restarts from the checkpoint and must converge.
    h1, h2 = _halves(spark, sf_dir)
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    _stage_single_parquet(h1, os.path.join(feed, "b0.parquet"))
    schema = spark.read.parquet(os.path.join(feed, "b0.parquet")).schema
    run_dir = str(tmp_path / "upsert_run")
    os.makedirs(run_dir)

    def profile(hook=None):
        out = _profile_update_out(_stream(spark, feed, schema))
        kw = {"pre_commit_hook": hook} if stage == "pre_swap" else {"post_commit_hook": hook}
        return _run_to_upsert_sink(out, keys=["user_id"], run_dir=run_dir, **kw)

    profile()  # run 1: half 1 committed, then stopped
    _stage_single_parquet(h2, os.path.join(feed, "b1.parquet"))

    crashed = {"fired": False}

    def crash_once(batch_id):
        if not crashed["fired"] and batch_id > 0:
            crashed["fired"] = True
            raise RuntimeError("injected torn-commit crash")

    with pytest.raises(Exception):
        profile(hook=crash_once)
    assert crashed["fired"], "injection never fired - the test is vacuous"

    recovered = profile()  # run 3: restart, re-run the batch, converge

    # clean single run over all the data, fresh everything
    feed_c = str(tmp_path / "feed_clean")
    os.makedirs(feed_c)
    _stage_single_parquet(h1, os.path.join(feed_c, "b0.parquet"))
    _stage_single_parquet(h2, os.path.join(feed_c, "b1.parquet"))
    clean = _run_to_upsert_sink(
        _profile_update_out(_stream(spark, feed_c, schema)),
        keys=["user_id"],
        run_dir=str(tmp_path / "upsert_clean"),
    )

    rec, cln = _sorted_rows(recovered), _sorted_rows(clean)
    assert len(cln) > 0
    assert rec == cln
