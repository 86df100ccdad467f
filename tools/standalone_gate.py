"""Run the correctness gate on a REAL multi-process Spark cluster.

Every green result in rounds 1-12 came from one JVM (``local[32]``):
driver, "executors", and python workers all share a process and an
env. The reference's own harness is the opposite shape — one
coordinator plus 2-3 *separate worker processes* over a shared
filesystem (``src/main/test-mr.sh:87-96``, data plane crossing
processes in ``src/mr/worker.go:148-165``). This tool closes that
fidelity gap: it boots a local Spark STANDALONE cluster (one master +
N worker JVMs, each spawning its own executor process and python
workers), points the engine at it via ``SPARK_GRAFT_MASTER``, routes
all cross-run scratch through a shared ``SPARK_GRAFT_SCRATCH_DIR``,
and runs ``tools/check_correctness.py`` — the full 267-query gate —
across actual process boundaries. What this exercises that
``local[*]`` cannot:

* closure/function shipping: the MapReduce facade pickles map/reduce
  callables by reference — executors must IMPORT the package
  (``spark.executorEnv.PYTHONPATH``), not inherit the driver's
  modules;
* the artifact publish/lock protocol (bucketed tables, IVF
  centroids, source round-trips) with readers and writers in
  different processes against one shared scratch dir;
* real shuffle data-plane between executor processes (netty fetch,
  not in-process handoff) and broadcast distribution to remote
  executors.

Committed result: see the RESULTS block at the end of this docstring
(updated per run).

Usage:
  python tools/standalone_gate.py                       # full gate, sf0.01
  python tools/standalone_gate.py /root/testdata/sf0.001 q1 q2
  SPARK_GRAFT_STANDALONE_WORKERS=3 python tools/standalone_gate.py

The opt-in pytest twin lives in tests/test_standalone_cluster.py
(set SPARK_GRAFT_STANDALONE=1 to run it).

RESULTS (updated per committed run):
* r13 subset smoke (sf0.001, 6 queries incl. streaming + bucketed):
  rc=0 in 38 s.
* r13 family sample via the pytest twin (sf0.001, 13 queries, one
  per family): green in 82 s.
* r13 FULL GATE (sf0.01, this machine, 2 workers x 8 cores / 16g,
  executor mem 8g, shared scratch): **267/267 PASS, 0 failures,
  339 s wall** — first multi-process run of the whole registry; no
  engine changes were needed beyond session.get_spark's non-local
  conf block (executor memory / executorEnv.PYTHONPATH / pyspark
  python), i.e. the closure-shipping, artifact-lock, and scratch
  contracts built under local[*] held across real process
  boundaries on the first try.
* r13 full gate at sf0.1 (same shape, 10x the data — real netty
  shuffle volume, executor-resident caches, the bucketed warehouse
  and IVF/centroid artifacts rebuilt on shared scratch): **267/267
  PASS, 0 failures, 667 s wall.**
"""

from __future__ import annotations

import os
import shutil
import signal
import socket
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_class() -> str:
    import pyspark

    return os.path.join(pyspark.__path__[0], "bin", "spark-class")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _wait_for(predicate, timeout: float, what: str) -> None:
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if predicate():
            return
        time.sleep(0.5)
    raise TimeoutError(f"timed out waiting for {what}")


def _contains(path: str, needle: str) -> bool:
    try:
        with open(path, errors="replace") as fh:
            return needle in fh.read()
    except OSError:
        return False


class StandaloneCluster:
    """Boot (and tear down) a master + N worker JVMs on this machine.

    Each process runs in its own process group so teardown kills the
    whole JVM tree (incl. executor children) even on a wedged exit.
    """

    def __init__(self, workers: int = 2, cores: int = 8, memory: str = "16g"):
        self.workers = workers
        self.cores = cores
        self.memory = memory
        self.workdir = tempfile.mkdtemp(prefix="mmrs_standalone_")
        self.port = _free_port()
        self.master_url = f"spark://127.0.0.1:{self.port}"
        self.procs: list[subprocess.Popen] = []
        #: set by callers when a run failed without raising (gate
        #: rc != 0) — keeps the daemon/executor logs for diagnosis
        self.keep_logs = False

    def _launch(self, name: str, args: list[str]) -> subprocess.Popen:
        log = os.path.join(self.workdir, f"{name}.log")
        env = dict(
            os.environ,
            SPARK_NO_DAEMONIZE="1",
            PYSPARK_PYTHON=sys.executable,
            PYTHONPATH=REPO,
            SPARK_WORKER_DIR=os.path.join(self.workdir, name),
            # keep the daemons off the driver's conf dir
            SPARK_LOG_DIR=os.path.join(self.workdir, "logs"),
        )
        logfh = open(log, "w")
        try:
            proc = subprocess.Popen(
                [_spark_class(), *args],
                stdout=logfh,
                stderr=subprocess.STDOUT,
                env=env,
                start_new_session=True,
            )
        finally:
            logfh.close()  # the child holds its own fd
        proc._log = log  # type: ignore[attr-defined]
        self.procs.append(proc)
        return proc

    def start(self) -> str:
        # on any launch/registration failure, kill whatever is already
        # up — a TimeoutError out of __enter__ never reaches __exit__,
        # and orphaned master/worker JVMs would otherwise accumulate
        try:
            return self._start()
        except BaseException:
            self.stop()
            print(f"# cluster startup failed; logs at {self.workdir}", file=sys.stderr)
            raise

    def _start(self) -> str:
        m = self._launch(
            "master",
            [
                "org.apache.spark.deploy.master.Master",
                "--host",
                "127.0.0.1",
                "--port",
                str(self.port),
                "--webui-port",
                "0",
            ],
        )
        _wait_for(
            lambda: _contains(m._log, "I have been elected leader"),
            90,
            "master ALIVE",
        )
        ws = [
            self._launch(
                f"worker{i}",
                [
                    "org.apache.spark.deploy.worker.Worker",
                    self.master_url,
                    "--cores",
                    str(self.cores),
                    "--memory",
                    self.memory,
                    "--webui-port",
                    "0",
                ],
            )
            for i in range(self.workers)
        ]
        for w in ws:
            _wait_for(
                lambda w=w: _contains(w._log, "Successfully registered with master"),
                90,
                "worker registration",
            )
        return self.master_url

    def stop(self) -> None:
        # workers first (their executors die with the group), master last
        for proc in reversed(self.procs):
            try:
                os.killpg(proc.pid, signal.SIGTERM)
            except ProcessLookupError:
                continue
        deadline = time.monotonic() + 20
        for proc in self.procs:
            try:
                proc.wait(timeout=max(0.1, deadline - time.monotonic()))
            except subprocess.TimeoutExpired:
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                proc.wait(timeout=10)
        self.procs.clear()

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()
        # keep logs on failure for diagnosis — both a raised exception
        # AND a non-zero gate rc (which raises nothing; callers set
        # keep_logs) — sweep only on a genuinely clean exit
        if exc == (None, None, None) and not self.keep_logs:
            shutil.rmtree(self.workdir, ignore_errors=True)
        else:
            print(f"# standalone cluster logs kept at {self.workdir}", file=sys.stderr)


def run_gate(sf_dir: str, only: list[str], cluster: StandaloneCluster) -> int:
    """Run check_correctness.py as a subprocess pointed at the cluster
    via SPARK_GRAFT_MASTER, with scratch on a shared dir every worker
    process resolves identically."""
    scratch = os.path.join(cluster.workdir, "scratch")
    os.makedirs(scratch, exist_ok=True)
    env = dict(
        os.environ,
        SPARK_GRAFT_MASTER=cluster.master_url,
        SPARK_GRAFT_SCRATCH_DIR=scratch,
    )
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "check_correctness.py"),
            sf_dir,
            *only,
        ],
        env=env,
        cwd=REPO,
    )
    return proc.returncode


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = args[1:]
    workers = int(os.environ.get("SPARK_GRAFT_STANDALONE_WORKERS", "2"))
    cores = int(os.environ.get("SPARK_GRAFT_STANDALONE_CORES", "8"))
    mem = os.environ.get("SPARK_GRAFT_STANDALONE_WORKER_MEM", "16g")
    t0 = time.monotonic()
    with StandaloneCluster(workers=workers, cores=cores, memory=mem) as cluster:
        print(
            f"# standalone cluster up: {cluster.master_url}, "
            f"{workers} workers x {cores} cores / {mem}",
            file=sys.stderr,
        )
        rc = run_gate(sf_dir, only, cluster)
        cluster.keep_logs = rc != 0
    print(f"# standalone gate rc={rc} in {time.monotonic() - t0:.0f}s", file=sys.stderr)
    sys.exit(rc)


if __name__ == "__main__":
    main()
