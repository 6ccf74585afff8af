"""Scheduled runner: hot reload, interval throttle, records, result feedback."""

import os
import time

import pytest

from data_misc_tools_spark.runner import Runner, ScriptTask, parse_iso_duration


def test_parse_iso_duration():
    assert parse_iso_duration("PT1M") == 60
    assert parse_iso_duration("PT60M") == 3600
    assert parse_iso_duration("PT1H") == 3600
    assert parse_iso_duration("P1D") == 86400
    assert parse_iso_duration("PT0.5S") == 0.5
    with pytest.raises(ValueError):
        parse_iso_duration("1 minute")


def _write_script(path, body):
    with open(path, "w") as f:
        f.write(body)
    # ensure a distinct mtime for reload detection on fast filesystems
    os.utime(path, (time.time(), time.time() + 0.01))


def test_run_and_result_feedback(spark, tmp_path):
    script = tmp_path / "task.py"
    _write_script(script, "def run(spark, param):\n    return (param or 0) + 1\n")
    runner = Runner(spark, str(tmp_path / "records"))
    t = ScriptTask(str(script), interval="PT0.1S")
    assert runner.run_once(t) == 1
    time.sleep(0.15)
    assert runner.run_once(t) == 2  # previous result fed back as param


def test_interval_throttle(spark, tmp_path):
    script = tmp_path / "task.py"
    _write_script(script, "def run(spark, param):\n    return (param or 0) + 1\n")
    runner = Runner(spark, str(tmp_path / "records"))
    t = ScriptTask(str(script), interval="PT1H")
    assert runner.run_once(t) == 1
    assert runner.run_once(t) == 1  # throttled: returns last result, no new run
    assert runner.run_once(t, force=True) == 2


def test_hot_reload_on_mtime_change(spark, tmp_path):
    script = tmp_path / "task.py"
    _write_script(script, "def run(spark, param):\n    return 'v1'\n")
    runner = Runner(spark, str(tmp_path / "records"))
    t = ScriptTask(str(script), interval="PT0S")
    assert runner.run_once(t) == "v1"
    time.sleep(0.02)
    _write_script(script, "def run(spark, param):\n    return 'v2'\n")
    assert runner.run_once(t) == "v2"  # mtime change -> fresh module


def test_failure_recorded_not_raised(spark, tmp_path):
    script = tmp_path / "bad.py"
    _write_script(script, "def run(spark, param):\n    raise RuntimeError('boom')\n")
    runner = Runner(spark, str(tmp_path / "records"))
    t = ScriptTask(str(script), interval="PT0S")
    assert runner.run_once(t) is None
    recs = runner.records().collect()
    done = [r for r in recs if r.status != "running"]
    assert len(done) == 1 and len(recs) == 2  # start row + failed completion
    assert done[0].status == "failed" and "boom" in done[0].result


def test_sql_script_task(spark, tmp_path):
    script = tmp_path / "q.sql"
    _write_script(script, "select 1 as a;\nselect 2 as b;\n")
    runner = Runner(spark, str(tmp_path / "records"))
    result = runner.run_once(ScriptTask(str(script), interval="PT0S"))
    assert result == [(2,)]  # last statement's rows
    rec = runner.records().filter("status != 'running'").first()
    assert rec.script_type == "sql" and rec.status == "succeeded"


def test_records_accumulate(spark, tmp_path):
    script = tmp_path / "task.py"
    _write_script(script, "def run(spark, param):\n    return 1\n")
    runner = Runner(spark, str(tmp_path / "records"))
    t = ScriptTask(str(script), interval="PT0S")
    runner.run_once(t)
    runner.run_once(t, force=True)
    recs = (
        runner.records().filter("status != 'running'").orderBy("started_at").collect()
    )
    assert len(recs) == 2
    assert all(r.status == "succeeded" for r in recs)
    assert all(r.finished_at >= r.started_at for r in recs)


def test_throttle_survives_runner_restart(spark, tmp_path):
    script = tmp_path / "task.py"
    _write_script(script, "def run(spark, param):\n    return (param or 0) + 1\n")
    records = str(tmp_path / "records")
    r1 = Runner(spark, records)
    t = ScriptTask(str(script), interval="PT1H")
    assert r1.run_once(t) == 1
    # a NEW runner instance must see the prior start via the records table
    r2 = Runner(spark, records)
    t2 = ScriptTask(str(script), interval="PT1H")
    assert not r2.is_ready(t2)
    assert r2.run_once(t2) is None  # throttled; no prior in-memory result


def test_crash_mid_task_records_failure_and_restart_throttles(spark, tmp_path):
    """Kill the runner mid-task (KeyboardInterrupt escapes run_once
    after the start record lands, before any completion row — the
    crash shape): the restarted runner must (a) mark the orphaned run
    failed in the records table and (b) still throttle the slot, since
    the crashed run consumed its interval (reference:
    process/ScriptHelper.scala:143-156 start/finalize record
    semantics)."""
    script = tmp_path / "task.py"
    _write_script(
        script, "def run(spark, param):\n    raise KeyboardInterrupt\n"
    )
    records = str(tmp_path / "records")
    r1 = Runner(spark, records)
    t = ScriptTask(str(script), interval="PT1H")
    with pytest.raises(KeyboardInterrupt):
        r1.run_once(t)
    recs = r1.records().collect()
    assert [r.status for r in recs] == ["running"]  # no completion row

    r2 = Runner(spark, records)  # restart
    recs2 = r2.records().orderBy("finished_at").collect()
    assert [r.status for r in recs2] == ["running", "failed"]
    assert "crashed" in recs2[-1].result
    assert recs2[-1].started_at == recs2[0].started_at  # same run slot
    assert not r2.is_ready(t)  # the crashed run consumed the interval
    # a second restart must not double-mark the orphan
    r3 = Runner(spark, records)
    assert [r.status for r in r3.records().orderBy("finished_at").collect()] == [
        "running", "failed",
    ]


def test_background_loop_and_graceful_stop(spark, tmp_path):
    script = tmp_path / "task.py"
    _write_script(script, "def run(spark, param):\n    return (param or 0) + 1\n")
    runner = Runner(spark, str(tmp_path / "records"))
    t = ScriptTask(str(script), interval="PT0S")
    th = runner.start_background([t], tick_sec=0.05)
    deadline = time.time() + 30
    while time.time() < deadline and runner.last_result.get(str(script), 0) < 2:
        time.sleep(0.1)
    runner.stop()
    th.join(timeout=10)
    assert not th.is_alive()
    assert runner.last_result[str(script)] >= 2  # ran multiple ticks


def test_script_source_versions_are_auditable(spark, tmp_path):
    """A modified-then-rerun script yields records whose src_sha values
    differ AND whose exact content is recoverable from the snapshot
    table (reference: records/ScriptSrc.scala:8-24)."""
    script = tmp_path / "task.py"
    _write_script(script, "def run(spark, param):\n    return 'v1'\n")
    runner = Runner(spark, str(tmp_path / "records"))
    t = ScriptTask(str(script), interval="PT0.1S")
    assert runner.run_once(t, force=True) == "v1"
    _write_script(script, "def run(spark, param):\n    return 'v2'\n")
    assert runner.run_once(t, force=True) == "v2"

    recs = (
        runner.records()
        .filter("status = 'succeeded'")
        .orderBy("started_at")
        .collect()
    )
    assert len(recs) == 2
    sha1, sha2 = recs[0].src_sha, recs[1].src_sha
    assert sha1 and sha2 and sha1 != sha2
    srcs = {r.src_sha: r.content for r in runner.script_sources().collect()}
    assert "'v1'" in srcs[sha1] and "'v2'" in srcs[sha2]
    # snapshots are deduplicated: rerunning the same content adds no row
    time.sleep(0.15)
    assert runner.run_once(t) == "v2"
    assert runner.script_sources().count() == 2
    # a restarted runner rediscovers known shas (no duplicate snapshot)
    runner2 = Runner(spark, str(tmp_path / "records"))
    assert runner2.run_once(t, force=True) == "v2"
    assert runner2.script_sources().count() == 2
