"""Unit pins for tools/spill_audit.py's event-log parsing and
aggregation — the pure functions every committed spill/skew number in
its docstring flows through. No SparkSession needed: the fixture is a
synthetic event log with the exact JSON shapes Spark 4 writes
(SparkListenerJobStart carries the job group in Properties and the
stage ids in "Stage IDs"; SparkListenerTaskEnd carries Task Metrics)."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.spill_audit import _aggregate, _parse_event_log


_AUTO_INDEX = iter(range(10_000))


def _task_end(
    stage_id,
    sw=0,
    local=0,
    remote=0,
    mem_spill=0,
    disk_spill=0,
    peak=0,
    reason="Success",
    index=None,
    attempt=0,
):
    return {
        "Event": "SparkListenerTaskEnd",
        "Stage ID": stage_id,
        "Stage Attempt ID": attempt,
        "Task End Reason": {"Reason": reason},
        "Task Info": {"Index": next(_AUTO_INDEX) if index is None else index},
        "Task Metrics": {
            "Memory Bytes Spilled": mem_spill,
            "Disk Bytes Spilled": disk_spill,
            "Peak Execution Memory": peak,
            "Shuffle Write Metrics": {"Shuffle Bytes Written": sw},
            "Shuffle Read Metrics": {
                "Local Bytes Read": local,
                "Remote Bytes Read": remote,
            },
        },
    }


@pytest.fixture()
def event_log(tmp_path):
    MB = 1024 * 1024
    events = [
        {
            "Event": "SparkListenerJobStart",
            "Job ID": 0,
            "Stage IDs": [0, 1],
            "Properties": {"spark.jobGroup.id": "cold:q"},
        },
        _task_end(0, sw=4 * MB, peak=8 * MB),
        _task_end(0, sw=4 * MB, peak=2 * MB),
        # reducer stage: 3 tasks reading 1/1/8 MB — skew 8.0
        _task_end(1, local=1 * MB, mem_spill=1 * MB),
        _task_end(1, local=1 * MB),
        _task_end(1, local=4 * MB, remote=4 * MB, disk_spill=2 * MB),
        # a second job group whose tasks must NOT leak into cold:q
        {
            "Event": "SparkListenerJobStart",
            "Job ID": 1,
            "Stage IDs": [2],
            "Properties": {"spark.jobGroup.id": "warm:q"},
        },
        _task_end(2, local=1 * MB),
        # ungrouped job (warmup): ignored entirely
        {"Event": "SparkListenerJobStart", "Job ID": 2, "Stage IDs": [3], "Properties": {}},
        _task_end(3, sw=99 * MB),
        "not json at all",  # parser must skip garbage lines
    ]
    p = tmp_path / "evlog"
    with open(p, "w") as fh:
        for ev in events:
            fh.write(ev if isinstance(ev, str) else json.dumps(ev))
            fh.write("\n")
    return str(p)


def test_parse_groups_and_stages(event_log):
    group_stages, stage_tasks = _parse_event_log(event_log)
    assert group_stages == {"cold:q": {0, 1}, "warm:q": {2}}
    assert set(stage_tasks) == {0, 1, 2, 3}
    assert len(stage_tasks[1]) == 3


def test_aggregate_metrics(event_log):
    group_stages, stage_tasks = _parse_event_log(event_log)
    agg = _aggregate(group_stages["cold:q"], stage_tasks)
    assert agg["tasks"] == 5
    assert agg["spill_mb"] == 3.0  # 1 mem + 2 disk
    assert agg["shuffle_write_mb"] == 8.0
    assert agg["shuffle_read_mb"] == 10.0  # 1 + 1 + (4 local + 4 remote)
    assert agg["max_task_sw_mb"] == 4.0
    assert agg["max_task_sr_mb"] == 8.0  # local+remote of the hot task
    assert agg["sr_skew"] == 8.0  # max 8 MB / median 1 MB, stage 1 only
    assert agg["peak_mem_mb"] == 8.0


def test_aggregate_skew_needs_two_reducers(event_log):
    _, stage_tasks = _parse_event_log(event_log)
    # warm:q's one stage has a single reducer task — no width to
    # balance, so skew must be None, not 1.0 (a fake perfect score)
    agg = _aggregate({2}, stage_tasks)
    assert agg["sr_skew"] is None
    assert agg["tasks"] == 1


def test_aggregate_skipped_stage_is_empty_not_keyerror(event_log):
    _, stage_tasks = _parse_event_log(event_log)
    # a reused/skipped stage appears in the job's Stage IDs but never
    # runs tasks — aggregation must tolerate it
    agg = _aggregate({0, 1, 999}, stage_tasks)
    assert agg["tasks"] == 5


def test_failed_and_speculative_attempts_do_not_count(tmp_path):
    """ADVICE r12: retried/failed/speculative TaskEnd events carry
    partial metrics; only committed (Success, first-per-partition)
    work may contribute to spill/shuffle numbers."""
    MB = 1024 * 1024
    events = [
        {
            "Event": "SparkListenerJobStart",
            "Job ID": 0,
            "Stage IDs": [0],
            "Properties": {"spark.jobGroup.id": "cold:q"},
        },
        # partition 0: a failed attempt (huge bogus spill), then success
        _task_end(0, sw=1 * MB, mem_spill=500 * MB, reason="ExceptionFailure", index=0),
        _task_end(0, sw=2 * MB, index=0),
        # partition 1: speculation — two Success ends, second must dedupe
        _task_end(0, sw=3 * MB, index=1),
        _task_end(0, sw=3 * MB, index=1),
        # partition 1 recomputed on a RETRIED stage attempt must ALSO
        # dedupe (ADVICE r13: committed-work-only — a partition that
        # succeeded on attempt 0 and was recomputed on attempt 1 is
        # one unit of committed work, not two)
        _task_end(0, sw=4 * MB, index=1, attempt=1),
    ]
    path = tmp_path / "evlog"
    path.write_text("\n".join(json.dumps(e) for e in events))
    group_stages, stage_tasks = _parse_event_log(str(path))
    agg = _aggregate(group_stages["cold:q"], stage_tasks)
    assert agg["tasks"] == 2  # p0 success + p1 first success, attempts deduped
    assert agg["spill_mb"] == 0.0  # the failed attempt's 500 MB is gone
    assert agg["shuffle_write_mb"] == 5.0  # 2 + 3; the attempt-1 recompute is not committed work
