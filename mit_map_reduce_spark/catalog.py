"""Table catalog for the driver-generated parquet testdata.

The reference engine has no catalog — its "dataset" is an argv list of
text files, one map task per file (reference ``src/main/mrcoordinator.go:21-26``,
``src/mr/coordinator.go:242-253``). Here every table is self-describing
parquet; Spark's DataSource v2 gives column pruning + predicate pushdown
into the scan, which the reference cannot do (it always materializes the
whole file — ``src/mr/worker.go:137``).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any realistic scale
#: factor (region=5 rows, nation=25 rows always; supplier/part grow
#: slowly). Used by operators to hint broadcast joins.
BROADCAST_TABLES = ("region", "nation", "supplier", "part")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def corpus_fingerprint(sf_dir: str, *tables: str) -> str:
    """Content fingerprint (mtime_ns + size per source file) for keying
    derived artifacts (source round-trip scratch copies, IVF centroids,
    bucketed-table layouts).

    Artifacts keyed only by (path, params) silently aggregate STALE
    bytes after the corpus is regenerated in place — the driver does
    regenerate testdata between rounds (events.ts even changed
    encoding once). Folding the source file's identity into the key
    makes regeneration invalidate every derived artifact for free.
    """
    parts = []
    for t in tables:
        p = table_path(sf_dir, t)
        try:
            st = os.stat(p)
            parts.append(f"{t}:{st.st_mtime_ns}:{st.st_size}")
        except OSError:
            parts.append(f"{t}:missing")
    return "|".join(parts)


def scratch_base() -> str:
    """Root directory for cross-run scratch artifacts (bucketed table
    copies, staged source-format round-trips, trained IVF centroids,
    streaming feeds/sinks/checkpoints).

    Defaults to the machine-local tempdir — correct for any
    single-machine ``local[...]`` deployment, where driver and
    executors share one filesystem. On a MULTI-NODE cluster set
    ``SPARK_GRAFT_SCRATCH_DIR`` to a path on shared storage that every
    executor and the driver resolve to the same files, and that
    supports POSIX rename within the base — the artifact publish
    protocol is atomic temp-dir-then-rename, and the bucketed/source
    scratch registers external tables over these paths (NFS/Lustre or
    a fuse-mounted object store qualify; raw S3 paths would need the
    Hadoop FS API instead of os.rename and are out of scope here).
    """
    import tempfile

    return os.environ.get("SPARK_GRAFT_SCRATCH_DIR", tempfile.gettempdir())


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Fan a small input out across the cluster before compute-heavy
    derivation (shingling, hashing, pair joins).

    A single small parquet file arrives as ONE partition, so any
    operator that multiplies work per row (explode x k, self-join)
    would otherwise run on one core. The repartition shuffles only the
    small source rows — cheap — and buys full parallelism downstream.
    At 100 TB inputs are already thousands of partitions and this is a
    no-op cost-wise (still one extra round-robin shuffle; callers only
    use it ahead of work that dwarfs it).
    """
    n = df.sparkSession.sparkContext.defaultParallelism * factor
    return df.repartition(n)


def arrow_stage_width(
    n_rows: int, rows_per_task: int, cap: int = 4096, floor: int = 1
) -> int:
    """Partition count for a Python-boundary (Arrow) stage, derived
    from the stage's input VOLUME instead of the parent frame's
    partitioning (guide §2: scale-adaptive partitioning; §4: the
    JVM<->Python boundary is the cost).

    Measured (r15): every Python task pays a fixed ~0.25-0.35 CPU-s
    JVM<->worker round-trip in this environment — payload-independent,
    even on REUSED workers (a 32-task mapInPandas stage burns ~10 CPU-s
    on a 2000-row input whether the function is a no-op or the IVF
    assignment; syscall-heavy sandbox). Tiny inputs must therefore not
    ride a cores-wide cache layout into a Python stage; the width
    grows linearly with input volume up to the cap (the same
    volume-law as emb_lsh_pair_width). Callers ``coalesce()`` cached
    inputs to this width (narrow, never exceeds the cache's own
    one-task-wave width) or ``repartition()`` scan-rooted ones.

    ``floor`` is a small LATENCY floor (not a cores constant): a
    width-1 stage serializes its upstream narrow chain into one task;
    callers whose input rides a wider cached layout pass a few tasks'
    worth of overlap (measured r15: the IVF assign at width 1 ran
    1.6 s wall vs 0.9 s at width 4, at a quarter of width-32's CPU)."""
    import math

    return max(floor, min(cap, math.ceil(n_rows / max(1, rows_per_task))))


def bounded_shuffle_width(spark: SparkSession, floor: int = 16) -> int:
    """Shuffle width for plan-embedded ``repartition`` calls and
    scoped-conf iterative builds: scales with the CLUSTER (one task
    wave — total cores, floored), never with
    ``spark.sql.shuffle.partitions``.

    A returned lazy frame executes under the CALLER's conf — under a
    bare driver session that means 200-partition shuffles even for
    kilobyte-scale stages, which is pure task overhead (the round-9
    20.6 s graph_supplier_projection vanilla row). Pinning an explicit
    width into the plan (or into an in-scope materialized build) keeps
    stage width proportional to actual parallelism at every scale.
    Exactly one wave, not 2x: an A/B at sf0.1 measured the projection
    at 0.98 s with width=cores vs 2.47 s at 2x cores — REPARTITION_BY_NUM
    is exempt from AQE coalescing, so every extra pinned partition is
    pure scheduling overhead on the many kilobyte-scale stages this
    serves. Use it where a stage would otherwise ride conf width; do
    NOT pin stages AQE already handles well (tiny ENSURE_REQUIREMENTS
    shuffles coalesce to fewer tasks than any honest pin).
    """
    return max(spark.sparkContext.defaultParallelism, floor)


def normalize_nanos_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the events timestamp column to ``TimestampType``.

    The driver's parquet encoding has varied across rounds, so accept
    both forms and converge on one engine-facing type:

    - TIMESTAMP(NANOS): Spark has no nanosecond timestamp; with
      ``spark.sql.legacy.parquet.nanosAsLong`` the column arrives as
      epoch-nanos long. Integer ``div`` keeps full precision (the
      values exceed double's 2^53 mantissa).
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
      ``TimestampNTZType``; the wall clock IS the UTC instant (the
      generator and the DuckDB oracle are both tz-naive), so a cast
      under the session's pinned UTC timezone is lossless.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if col not in df.columns:
        return df
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    elif isinstance(dt, T.TimestampNTZType):
        df = df.withColumn(col, F.col(col).cast(T.TimestampType()))
    return df


#: Session-scoped registry of shared persisted intermediates, keyed by
#: (session id, logical name, sf_dir). Multi-consumer derivations (the
#: per-doc shingle arrays, the normed embedding corpus) used to call
#: ``.persist()`` inside every query that needed them; across an
#: 87-query session that accumulated duplicate cached copies of the
#: same lineage and spammed ``CacheManager: asked to cache already
#: cached data`` warnings. One registry entry per logical dataset keeps
#: exactly one persisted copy per session, shared by every consumer
#: (the pair queries and connected components now probe the SAME cache)
#: — the single-JVM analog of materializing the intermediate to parquet
#: once at 100 TB.
_SHARED_CACHE: dict[tuple, DataFrame] = {}

#: checkpoint-RDD id -> the PRE-truncation build frame. The r15 lineage
#: truncation (see shared_persist) re-stores a materialized artifact
#: behind a LogicalRDD leaf, which blinded every plan-introspection
#: probe (plans.inspect.unpartitioned_corpus_windows, the repo-wide
#: window audit) to the artifact's internals — the r15 ADVICE flagged
#: that as silently weakening the structural safety net. The probes
#: resolve an RDDScanExec leaf back to its build frame through this map
#: and keep descending, so structural pins cover artifact internals
#: again. Query paths never touch it; only probes pay the build frame's
#: (re-)analysis cost.
_SHARED_BUILD_FRAMES: dict[int, DataFrame] = {}

#: registry key -> the checkpointed JVM RDD. localCheckpoint blocks are
#: NOT managed by the CacheManager, so DataFrame.unpersist() on the
#: truncated frame is a no-op and repeated build/clear cycles (tests,
#: long sessions) would accumulate orphaned checkpoint blocks (r15
#: ADVICE); clear_shared_caches unpersists these explicitly.
_CHECKPOINT_RDDS: dict[tuple, object] = {}


#: (artifact name, factory seconds) per first-use build — bench drains
#: this to tell a query's steady-state runs from the one run per
#: session that pays a shared-artifact build (eager builders like the
#: dedup CC fixpoint spend the whole cost inside factory(); lazy
#: persists materialize during the same run's action, so the event
#: still marks the right run even though its duration reads ~0).
_BUILD_EVENTS: list[tuple[str, float]] = []


def drain_build_events() -> list[tuple[str, float]]:
    """Return and clear the shared-artifact build events recorded
    since the last drain (see ``_BUILD_EVENTS``)."""
    out = list(_BUILD_EVENTS)
    _BUILD_EVENTS.clear()
    return out


#: session id -> this process's artifact scratch dir (cluster masters).
_ARTIFACT_SCRATCH: dict[int, str] = {}


def _session_artifact_dir(spark: SparkSession) -> str:
    """Process-unique scratch dir for cluster-master artifact
    materialization, swept at interpreter exit. Process-unique and
    exit-swept ON PURPOSE: a cross-run artifact store keyed on the
    testdata would be result caching across runs (the bench/oracle
    must compute from the parquet inputs every invocation); this dir
    only ever serves the session that wrote it."""
    import atexit
    import shutil
    import tempfile
    import uuid

    base = _ARTIFACT_SCRATCH.get(id(spark))
    if base is None:
        base = os.path.join(
            scratch_base(),
            f"mmrs_session_artifacts_{os.getpid()}_{uuid.uuid4().hex[:8]}",
        )
        os.makedirs(base, exist_ok=True)
        atexit.register(shutil.rmtree, base, ignore_errors=True)
        _ARTIFACT_SCRATCH[id(spark)] = base
    return base


def _materialize_artifact(
    spark: SparkSession, df: DataFrame, name: str
) -> DataFrame | None:
    """Cluster-master twin of the local localCheckpoint truncation
    (r15 verdict #3): write the already-computed artifact to session
    scratch parquet and re-read it, so every consumer's plan is a leaf
    file scan — O(1) analysis instead of re-analyzing the unrolled
    fixpoint build, and (unlike checkpoint blocks) re-readable after
    executor loss. Requires ``SPARK_GRAFT_SCRATCH_DIR`` on storage all
    executors share (the standing scratch_base contract). Read back
    with the frame's own schema so nullability survives the parquet
    round-trip (bare parquet marks every column nullable, which would
    ripple into consumer output schemas the oracle checks). Returns
    None if materialization fails (caller keeps the persisted form —
    correctness never depends on the truncation)."""
    import hashlib
    import uuid

    try:
        path = os.path.join(
            _session_artifact_dir(spark),
            hashlib.md5(name.encode()).hexdigest()[:16]
            + "_"
            + uuid.uuid4().hex[:8],
        )
        df.write.parquet(path)
        return spark.read.schema(df.schema).parquet(path)
    except Exception:
        return None


def shared_persist(
    spark: SparkSession, name: str, sf_dir: str, factory, label: str | None = None
) -> DataFrame:
    """Return the session's persisted copy of ``name`` for ``sf_dir``,
    building it via ``factory()`` on first use.

    ``label`` names the build EVENT (bench's cold-build bookkeeping)
    when ``name`` is not cross-session-stable: rank registry keys are
    whole canonicalized plan strings, and Catalyst's canonicalization
    is NOT stable across sessions (r12: a commutative add rendered as
    ``0.5 + x`` in one bench run and ``x + 0.5`` in the next, so the
    derived hash label changed and the artifact's cold-build drift
    coverage silently lapsed — the exact lapse the r11 advice
    predicted). Callers with plan-text keys must pass a label built
    from stable call-site facts instead.
    """
    key = (id(spark), name, sf_dir)
    df = _SHARED_CACHE.get(key)
    if df is None:
        t0 = time.monotonic()
        df = factory()
        # The event log is for humans — keep names one-line and short,
        # but IDENTITY-STABLE: a bare prefix truncation would merge
        # distinct long keys and break the bench's cross-round
        # cold-build comparison whenever the plan text shifts, so long
        # labels carry a hash of the FULL string.
        label = " ".join((label or name).split())
        if len(label) > 60:
            import hashlib

            digest = hashlib.md5(label.encode()).hexdigest()[:8]
            label = f"{label[:48]}...#{digest}"
        _BUILD_EVENTS.append((label, round(time.monotonic() - t0, 3)))
        # Iterative builders (graph loops) hand back a frame they
        # already persisted+materialized; re-persisting would emit the
        # very CacheManager duplicate-cache warning this registry kills.
        if df.storageLevel.useMemory or df.storageLevel.useDisk:
            if spark.sparkContext.master.startswith("local"):
                # Truncate the unrolled-loop lineage (guide §3.3/§5,
                # r15): a fixpoint artifact's cached frame still
                # CARRIES its whole iterative build plan, and every
                # consumer invocation re-analyzes that tree — measured
                # 0.3-0.7 s of driver time PER CALL on the CC-label /
                # graph-rank consumers (dedup_cluster_size_report's
                # plan rendered 3136 Exchange nodes). The eager local
                # checkpoint re-stores the already-materialized rows
                # behind a leaf LogicalRDD — true cached stats carry
                # over (verified: broadcasts still fire), analysis
                # becomes O(1). local-master only: checkpoint blocks
                # are not recomputable after executor loss, which is
                # free under one JVM (block loss == session loss) but
                # would break cluster fault-tolerance — cluster
                # masters take the else branch below and materialize
                # to shared-scratch parquet instead (r16; same leaf-
                # scan benefit, executor-loss-safe).
                ck = df.localCheckpoint(eager=True)
                try:
                    # LogicalRDD exposes the checkpoint RDD: key it for
                    # the probe pass-through and the explicit cleanup
                    # (both documented on the registries above).
                    jrdd = ck._jdf.queryExecution().analyzed().rdd()
                    _SHARED_BUILD_FRAMES[jrdd.id()] = df
                    _CHECKPOINT_RDDS[key] = jrdd
                except Exception:
                    pass
                df.unpersist()
                df = ck
            else:
                # Cluster master: the consumer-side O(1)-analysis win
                # must exist off local[...] too (r15 verdict #3) — the
                # 100 TB doctrine form materializes the artifact to
                # shared-scratch parquet; consumers scan a leaf.
                out = _materialize_artifact(spark, df, name)
                if out is not None:
                    df.unpersist()
                    df = out
            _SHARED_CACHE[key] = df
        else:
            df = df.persist()
            _SHARED_CACHE[key] = df
    return df


def clear_shared_caches() -> None:
    """Unpersist and forget every registry entry (tests / shutdown)."""
    for df in _SHARED_CACHE.values():
        try:
            df.unpersist()
        except Exception:
            pass
    # Checkpoint blocks live outside the CacheManager — free them
    # explicitly (blocking=False: drop asynchronously, callers never
    # need the space synchronously).
    for jrdd in _CHECKPOINT_RDDS.values():
        try:
            jrdd.unpersist(False)
        except Exception:
            pass
    _SHARED_CACHE.clear()
    _CHECKPOINT_RDDS.clear()
    _SHARED_BUILD_FRAMES.clear()


def ensure_nanos_flag(spark: SparkSession) -> None:
    """The ONE place that sets ``spark.sql.legacy.parquet.nanosAsLong``.

    events.parquet stores TIMESTAMP(NANOS), which Spark cannot read at
    all without this flag (even schema inference throws). Sessions from
    our factory set it at construction (session.py); this defensive set
    covers vanilla sessions (the grading driver's). It is session-wide
    and deliberately never restored — the package's read path
    (``load_table`` / ``normalize_nanos_ts``) is flag-proof either way,
    and a half-restored flag mid-stream would break lazy stream plans.
    Anyone raw-reading events.parquet must use ``load_table``.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def table_footer_count(sf_dir: str, name: str) -> int:
    """Row count from parquet FOOTER metadata only — no Spark job, no
    data pages read. The bounded driver decision that sizes
    volume-derived shuffle widths (dedup.emb_lsh_pair_width, the graph
    edge-build width): at any scale this is a metadata read over file
    footers (pyarrow dataset handles both a single file and a
    directory of part files)."""
    import pyarrow.dataset as pads

    dataset = pads.dataset(table_path(sf_dir, name), format="parquet")
    return sum(frag.metadata.num_rows for frag in dataset.get_fragments())


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        ensure_nanos_flag(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = normalize_nanos_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
