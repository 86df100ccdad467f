"""Mid-batch SIGKILL recovery for the streaming surface.

The reference's hardest fault test kills workers WHILE they process a
task (src/main/test-mr.sh:294-319). The round-12 crash-recovery suite
(tests/test_stream_crash_recovery.py) stops streams at micro-batch
BOUNDARIES — state recovery, but never a torn batch. This test kills
the whole driver process group with SIGKILL in the middle of batch 0
(offsets WAL written, commit not yet) and requires a restart on the
same checkpoint + sink to converge to the uninterrupted result: the
offsets log must replay the torn batch and the parquet sink's
_spark_metadata log must fence out whatever files the killed attempt
managed to write.

Mechanics: the stream runs in a SUBPROCESS session (its own process
group — SIGKILL to the group takes the JVM down with it, the only way
to kill mid-batch without cooperation). A mapInPandas stage sleeps
per Arrow batch while a flag file exists, pinning batch 0 open long
enough to kill inside it; recovery deletes the flag, so the restarted
query has the IDENTICAL plan (same UDF — only its runtime behavior
changes), which checkpoint resume requires. maxFilesPerTrigger=1
makes each staged file its own micro-batch.
"""

import datetime
import os
import signal
import subprocess
import sys
import time

import pytest
from pyspark.sql import functions as F

from mit_map_reduce_spark.catalog import load_table
from mit_map_reduce_spark.streaming.queries import _stage_single_parquet

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import os, sys
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

feed, ckpt, sink, slow_flag, ready = sys.argv[1:6]
spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
schema = spark.read.parquet(os.path.join(feed, "b0.parquet")).schema

def slow(batches):
    import time as _t
    import os as _o
    for b in batches:
        if _o.path.exists(slow_flag):
            _t.sleep(8.0)
        yield b

stream = (
    spark.readStream.schema(schema)
    .option("maxFilesPerTrigger", "1")
    .parquet(feed)
)
rows = stream.mapInPandas(slow, schema)
agg = (
    rows.withWatermark("ts", "1 hour")
    .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
    .agg(F.count("*").alias("n"))
    .select(F.col("w.start").alias("ws"), "event_type", "n")
)
q = (
    agg.writeStream.outputMode("append")
    .format("parquet")
    .option("path", sink)
    .option("checkpointLocation", ckpt)
    .start()
)
with open(ready, "w") as fh:
    fh.write(str(os.getpid()))
q.processAllAvailable()
q.stop()
spark.stop()
print("DRAINED", flush=True)
"""


def _launch(script, feed, ckpt, sink, slow_flag, ready):
    return subprocess.Popen(
        [sys.executable, script, feed, ckpt, sink, slow_flag, ready],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        start_new_session=True,  # own process group: SIGKILL reaches the JVM
        env=dict(os.environ, PYTHONPATH=REPO),
    )


def _wait_for(path, timeout, what):
    t0 = time.monotonic()
    while not os.path.exists(path):
        if time.monotonic() - t0 > timeout:
            pytest.fail(f"timed out waiting for {what} ({path})")
        time.sleep(0.2)


def _read_sink(spark, sink):
    return sorted(map(tuple, spark.read.parquet(sink).collect()))


def test_sigkill_mid_batch_then_restart_converges(spark, sf_dir, tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    ev = load_table(spark, sf_dir, "events")
    cut = ev.agg(F.date_trunc("day", F.min("ts")).alias("d")).first()["d"]
    mid = cut + datetime.timedelta(days=15)
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    _stage_single_parquet(ev.filter(F.col("ts") < F.lit(mid)), os.path.join(feed, "b0.parquet"))
    _stage_single_parquet(ev.filter(F.col("ts") >= F.lit(mid)), os.path.join(feed, "b1.parquet"))

    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    slow_flag = str(tmp_path / "slow_on")
    ready = str(tmp_path / "ready")
    open(slow_flag, "w").write("1")

    # run 1: batch 0 pinned open by the sleep stage; kill INSIDE it
    proc = _launch(str(script), feed, ckpt, sink, slow_flag, ready)
    try:
        _wait_for(ready, 120, "worker session up")
        _wait_for(os.path.join(ckpt, "offsets", "0"), 120, "batch-0 offsets WAL")
        time.sleep(1.5)  # inside the 8 s sleep stage
        # the mid-batch property this test exists for: the batch has
        # STARTED (offsets present) but not COMMITTED
        assert not os.path.exists(os.path.join(ckpt, "commits", "0")), (
            "batch 0 already committed - the kill would be a boundary stop, "
            "not mid-batch; raise the sleep"
        )
        os.killpg(proc.pid, signal.SIGKILL)
    finally:
        # kill UNCONDITIONALLY before waiting: if an assertion above
        # fired first, the worker is still alive and a bare wait would
        # raise TimeoutExpired over the real failure AND leak the JVM
        import contextlib

        with contextlib.suppress(ProcessLookupError):
            os.killpg(proc.pid, signal.SIGKILL)
        proc.wait(timeout=30)

    def _drain(proc_):
        # mirror run 1's unconditional-kill pattern: a hung drain
        # raises TimeoutExpired, and without the killpg the whole
        # process GROUP (JVM + Python workers) outlives the test
        import contextlib

        try:
            out_, _ = proc_.communicate(timeout=300)
        except BaseException:
            with contextlib.suppress(ProcessLookupError):
                os.killpg(proc_.pid, signal.SIGKILL)
            proc_.wait(timeout=30)
            raise
        return out_

    # run 2: same checkpoint + sink, sleep disabled (identical plan,
    # the UDF just stops sleeping) — must replay batch 0 and drain
    os.remove(slow_flag)
    os.remove(ready)
    rec = _launch(str(script), feed, ckpt, sink, slow_flag, ready)
    out = _drain(rec)
    assert rec.returncode == 0 and "DRAINED" in out

    # clean single run over the same feed, fresh everything
    ckpt_c, sink_c = str(tmp_path / "ckpt_c"), str(tmp_path / "sink_c")
    cln = _launch(str(script), feed, ckpt_c, sink_c, slow_flag, str(tmp_path / "ready_c"))
    out = _drain(cln)
    assert cln.returncode == 0 and "DRAINED" in out

    recovered, clean = _read_sink(spark, sink), _read_sink(spark, sink_c)
    assert len(clean) > 0
    assert recovered == clean
