"""Second-invocation determinism for artifact-backed queries.

Several queries materialize a reusable side artifact on first use (IVF
centroids, bucketed warehouse tables, source-format round-trip copies)
or probe session-shared caches (normed embeddings, shingle arrays,
SimHash fingerprints). The driver and bench call each query more than
once across a round, so the SECOND invocation — the one that hits the
artifact/cache instead of building it — must produce byte-identical
results. A stale or half-keyed artifact shows up here as a diff.
"""

import pytest

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()

ARTIFACT_BACKED = [
    "sim_ann_ivf_topk",  # parquet centroid artifact
    "rel_bucketed_join_revenue",  # bucketed saveAsTable pair
    "src_csv_roundtrip_orders",  # csv scratch copy
    "src_partitioned_pruning_events",  # partitioned scratch copy
    "dedup_simhash_band_pairs",  # shared_persist fingerprint cache
    "sketch_cms_heavy_hitters",  # pure recompute (control)
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", ARTIFACT_BACKED)
def test_second_invocation_identical(spark, sf_dir, name):
    first = _rows(QUERIES[name](spark, sf_dir))
    second = _rows(QUERIES[name](spark, sf_dir))
    assert first == second
    assert len(first) > 0


def test_artifact_keys_track_corpus_content(tmp_path):
    """Regenerating a source table in place must yield a DIFFERENT
    artifact key (round-4 advice: path-only keys aggregate stale bytes
    after the driver rewrites testdata)."""
    import os
    import shutil

    from mit_map_reduce_spark.catalog import corpus_fingerprint, table_path
    from mit_map_reduce_spark.operators.sources_queries import _artifact_dir

    sf = tmp_path / "sf"
    sf.mkdir()
    shutil.copy("/root/testdata/sf0.001/orders.parquet", table_path(str(sf), "orders"))
    k1 = _artifact_dir(str(sf), "csv", "orders")
    fp1 = corpus_fingerprint(str(sf), "orders")
    # simulate in-place regeneration: same path, new bytes/mtime
    p = table_path(str(sf), "orders")
    st = os.stat(p)
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    k2 = _artifact_dir(str(sf), "csv", "orders")
    fp2 = corpus_fingerprint(str(sf), "orders")
    assert fp1 != fp2
    assert k1 != k2
    # unchanged content -> stable key (artifacts still reused)
    assert _artifact_dir(str(sf), "csv", "orders") == k2


def test_publish_protocol_write_once_and_marker(tmp_path):
    """The winner writes once, publishes atomically (marker inside the
    renamed dir), and every later call reuses without re-invoking the
    writer."""
    from mit_map_reduce_spark.operators.sources_queries import (
        _PUBLISH_MARKER,
        _ensure_written,
        _is_published,
    )

    out = str(tmp_path / "art")
    calls = []

    def write(d):
        import os

        os.makedirs(d, exist_ok=True)
        calls.append(d)
        with open(os.path.join(d, "data.txt"), "w") as fh:
            fh.write("x")

    got1 = _ensure_written(write, out)
    got2 = _ensure_written(write, out)
    assert got1 == got2 == out
    assert len(calls) == 1
    assert _is_published(out)
    import os

    assert os.path.exists(os.path.join(out, _PUBLISH_MARKER))
    assert not os.path.exists(out + ".lock")  # lock released


def test_publish_sweeps_aged_crash_leftovers(tmp_path):
    """A writer that crashed between its rename steps leaves orphan
    .tmp*/.trash* siblings nothing else reclaims (round-8 advice): the
    next lock-winning writer sweeps AGED ones (beyond 4x the lock TTL
    — sources writers have no mtime toucher) and keeps FRESH ones (a
    concurrent live writer's in-flight dir must survive)."""
    import os
    import time

    from mit_map_reduce_spark.operators.sources_queries import (
        _LOCK_TTL_S,
        _ensure_written,
        _is_published,
    )

    out = str(tmp_path / "art")
    aged_tmp, aged_trash = out + ".tmpdead1234", out + ".trashdead567"
    fresh_tmp = out + ".tmplive9999"
    for d in (aged_tmp, aged_trash, fresh_tmp):
        os.makedirs(d)
        with open(os.path.join(d, "junk.txt"), "w") as fh:
            fh.write("x")
    old = time.time() - (4 * _LOCK_TTL_S + 60)
    for d in (aged_tmp, aged_trash):
        os.utime(d, (old, old))

    def write(d):
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "data.txt"), "w") as fh:
            fh.write("x")

    got = _ensure_written(write, out)
    assert got == out and _is_published(out)
    assert not os.path.exists(aged_tmp)
    assert not os.path.exists(aged_trash)
    assert os.path.exists(fresh_tmp)


def test_publish_protocol_expires_stale_lock(tmp_path):
    """A lock left by a crashed writer (old mtime, nothing published)
    is expired so the SHARED path heals — no 30s wait, no pid-private
    copy (round-6 ADVICE)."""
    import os
    import time

    from mit_map_reduce_spark.operators.sources_queries import (
        _LOCK_TTL_S,
        _ensure_written,
        _is_published,
    )

    out = str(tmp_path / "art")
    lock = out + ".lock"
    os.makedirs(lock)
    old = time.time() - (_LOCK_TTL_S + 60)
    os.utime(lock, (old, old))

    def write(d):
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "data.txt"), "w") as fh:
            fh.write("x")

    t0 = time.monotonic()
    got = _ensure_written(write, out)
    assert time.monotonic() - t0 < 5.0  # healed, did not wait out the loop
    assert got == out
    assert _is_published(out)
    assert not os.path.exists(lock)


def test_publish_protocol_fresh_lock_falls_back_private(tmp_path, monkeypatch):
    """A FRESH lock (writer plausibly alive) is respected: after the
    bounded wait the caller writes a session-private copy and returns
    its path — correctness before reuse."""
    import os

    from mit_map_reduce_spark.operators import sources_queries as sq
    from mit_map_reduce_spark.operators.sources_queries import (
        _ensure_written,
        _is_published,
    )

    monkeypatch.setattr(sq, "_LOCK_POLL_S", 0.001)
    out = str(tmp_path / "art")
    os.makedirs(out + ".lock")  # fresh mtime: looks in-flight

    def write(d):
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "data.txt"), "w") as fh:
            fh.write("x")

    got = _ensure_written(write, out)
    assert got != out and got.startswith(out + ".pid")
    assert _is_published(got)
    assert not _is_published(out)


def test_publish_protocol_restores_racer_artifact(tmp_path, monkeypatch):
    """TOCTOU closure (round-7 advice): a racer that publishes between
    _write_and_publish's marker check and its move-aside must have its
    COMPLETE artifact restored (it may already have readers), with the
    late writer's copy discarded — and nothing may rmtree the live
    path in between."""
    import os

    from mit_map_reduce_spark.operators import sources_queries as sq

    out = str(tmp_path / "art")
    # The racer's complete published artifact is already in place ...
    os.makedirs(out)
    with open(os.path.join(out, sq._PUBLISH_MARKER), "w") as fh:
        fh.write("ok\n")
    with open(os.path.join(out, "racer.txt"), "w") as fh:
        fh.write("theirs")
    # ... but the first marker check misses it (the TOCTOU window).
    real = sq._is_published
    seen = {"n": 0}

    def late_publish_view(d):
        seen["n"] += 1
        if seen["n"] == 1 and d == out:
            return False
        return real(d)

    monkeypatch.setattr(sq, "_is_published", late_publish_view)

    def write(d):
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "mine.txt"), "w") as fh:
            fh.write("mine")

    sq._write_and_publish(write, out)
    # racer's artifact survived intact; ours was discarded; no scratch left
    assert real(out)
    assert os.path.exists(os.path.join(out, "racer.txt"))
    assert not os.path.exists(os.path.join(out, "mine.txt"))
    leftovers = [p for p in os.listdir(tmp_path) if p != "art"]
    assert leftovers == [], leftovers


def test_truncated_artifact_probe_passthrough_and_cleanup(spark):
    """The r15 localCheckpoint lineage truncation must not blind the
    plan probes (r15 ADVICE): shared_persist stashes the PRE-truncation
    build frame keyed by the checkpoint RDD id, and
    unpartitioned_corpus_windows descends through the RDDScanExec leaf
    into it. clear_shared_caches must also free the checkpoint blocks
    themselves (they live outside the CacheManager, so plain
    DataFrame.unpersist() is a no-op on them)."""
    from pyspark.sql import Window, functions as F

    from mit_map_reduce_spark import catalog
    from mit_map_reduce_spark.plans import unpartitioned_corpus_windows

    # a build frame with an unpartitioned scan-rooted window inside —
    # the exact shape the probe exists to flag
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/probe_src.parquet"
        spark.range(100).selectExpr("id", "id % 7 AS k").write.parquet(path)

        def factory():
            df = (
                spark.read.parquet(path)
                .withColumn("rn", F.row_number().over(Window.orderBy("id")))
            )
            df.persist().count()  # eager, like the fixpoint builders
            return df

        art = catalog.shared_persist(
            spark, "test_probe_passthrough", d, factory
        )
        # truncated: the artifact frame itself is a checkpoint leaf ...
        leaf = art._jdf.queryExecution().executedPlan().toString()
        assert "ExistingRDD" in leaf and "row_number" not in leaf
        # ... but the probe still sees the window inside the build frame
        consumer = art.groupBy("k").agg(F.max("rn").alias("m"))
        assert len(unpartitioned_corpus_windows(consumer)) == 1
        # checkpoint blocks are tracked and freed on clear
        key = (id(spark), "test_probe_passthrough", d)
        jrdd = catalog._CHECKPOINT_RDDS.get(key)
        assert jrdd is not None
        assert jrdd.id() in catalog._SHARED_BUILD_FRAMES
        catalog.clear_shared_caches()
        assert catalog._CHECKPOINT_RDDS == {}
        assert catalog._SHARED_BUILD_FRAMES == {}
        # the unpersist call went through without raising; block drop is
        # async (blocking=False) so we only pin the registry hygiene here
