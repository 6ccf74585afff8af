"""Scheduled hot-reload script runner — the Spark Runner analog.

Reference behavior (reference: process/InterpreterLoader.scala:106-152,
process/ScriptHelper.scala:30-159): a long-lived driver loops every
≥60 s, hot-reloads a script when its mtime changes (compiled instance
cached otherwise), invokes it as ``(SparkSession, prev_result) -> Any``
feeding the previous result back in, enforces a per-task minimum
interval (ISO-8601, default PT1M; annotation/ProcDescription.java:12-21),
and persists an execution record per run (records/RecordDao.scala:19-22,
ExecutionRecord.scala:8-45).

Spark-native redesign: scripts are Python modules exposing
``run(spark, param) -> Any`` (SQL scripts run through the statement
splitter); "compilation" is importlib loading into a fresh module
namespace per reload (no stale-closure reuse); execution records land
in a parquet table instead of MySQL-over-JDO. No classloader
machinery — PySpark ships closures to executors natively.
"""

from __future__ import annotations

import importlib.util
import os
import re
import time
import traceback
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

RECORD_SCHEMA = (
    "path string, script_type string, started_at bigint, finished_at bigint, "
    "status string, result string, src_sha string"
)

# Normalized script-source snapshots (reference: records/ScriptSrc.scala:8-24
# persists script CONTENT + metadata per version as a CLOB): one row per
# distinct (path, sha256-of-content); execution records reference the sha,
# so a post-mortem can recover EXACTLY which version of a hot-reloaded
# script each run executed without storing the text once per run.
SRC_SCHEMA = "src_sha string, path string, content string, first_seen_ms bigint"


def parse_iso_duration(s: str) -> float:
    """ISO-8601 duration (the PT1M-style subset the reference uses,
    ProcDescription.java:20) -> seconds."""
    m = re.fullmatch(
        r"P(?:(?P<d>\d+)D)?(?:T(?:(?P<h>\d+)H)?(?:(?P<m>\d+)M)?(?:(?P<s>\d+(?:\.\d+)?)S)?)?",
        s.strip().upper(),
    )
    if not m or not any(m.groupdict().values()):
        raise ValueError(f"invalid ISO-8601 duration: {s!r}")
    g = {k: float(v) if v else 0.0 for k, v in m.groupdict().items()}
    return g["d"] * 86400 + g["h"] * 3600 + g["m"] * 60 + g["s"]


@dataclass
class _Loaded:
    mtime: float
    instance: Any  # callable(spark, param) -> Any


@dataclass
class ScriptTask:
    """One scheduled unit: a Python script exposing ``run(spark, param)``
    or a ``.sql`` script executed statement-by-statement."""

    path: str
    interval: str = "PT1M"
    name: str | None = None
    _cache: _Loaded | None = field(default=None, repr=False)

    @property
    def script_type(self) -> str:
        return "sql" if self.path.endswith(".sql") else "py"

    def source_snapshot(self) -> tuple[str, str]:
        """(sha256-hex, content) of the script file as it is NOW —
        taken at run start so the record pins the exact hot-reload
        version that executed (reference: ScriptSrc.scala:8-24).

        Hashes the RAW bytes and decodes with errors='replace': a
        script with a stray non-UTF-8 byte must still snapshot (a
        UnicodeDecodeError here would escape run_once and kill the
        scheduler loop before any record is written)."""
        import hashlib

        with open(self.path, "rb") as f:
            raw = f.read()
        return hashlib.sha256(raw).hexdigest(), raw.decode("utf-8", errors="replace")

    def _load(self) -> Any:
        """mtime-cached load; reload only on modification (reference:
        ScriptHelper.getTaskInstance:62-88). Old instances with a
        ``close()`` are closed before replacement (:113-115)."""
        mtime = os.stat(self.path).st_mtime
        if self._cache is not None and self._cache.mtime == mtime:
            return self._cache.instance
        if self._cache is not None:
            close = getattr(self._cache.instance, "close", None)
            if close:
                try:
                    close()
                except Exception:
                    pass
        if self.script_type == "sql":
            with open(self.path, encoding="utf-8") as f:
                script = f.read()

            def run_sql(spark: SparkSession, _param: Any) -> Any:
                from data_misc_tools_spark.plans.sql_script import run_sql_script

                results = run_sql_script(spark, script)
                # materialize the final statement's result as the task value
                if not results:
                    return None
                last = results[-1][1]
                return [tuple(r) for r in last.collect()]

            instance = run_sql
        else:
            # fresh module name per reload: no stale attributes survive
            mod_name = f"_dmt_task_{uuid.uuid4().hex}"
            spec = importlib.util.spec_from_file_location(mod_name, self.path)
            assert spec and spec.loader
            module = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(module)
            if not hasattr(module, "run"):
                raise AttributeError(f"{self.path} must define run(spark, param)")
            instance = module.run
        self._cache = _Loaded(mtime, instance)
        return instance


class Runner:
    """Scheduler + execution-record keeper for a set of ScriptTasks."""

    def __init__(
        self,
        spark: SparkSession,
        records_path: str,
        records_jdbc_url: str | None = None,
        records_table: str = "execution_records",
        jdbc_properties: dict[str, str] | None = None,
    ) -> None:
        """``records_path`` is the parquet records table; passing
        ``records_jdbc_url`` instead persists records to a database
        table like the reference's JDO-backed RecordDao
        (records/RecordDao.scala:19-22 writes MySQL)."""
        self.spark = spark
        self.records_path = records_path
        self.records_jdbc_url = records_jdbc_url
        self.records_table = records_table
        self.jdbc_properties = dict(jdbc_properties or {})
        self.src_path = records_path.rstrip("/") + "_src"
        self.src_table = records_table + "_src"
        self.last_result: dict[str, Any] = {}
        self.last_started: dict[str, float] = {}
        self._known_src: set[str] = set()
        self._stop = False
        self._jdbc_src_sha_ok = False
        if self.records_jdbc_url is not None:
            self._ensure_jdbc_src_sha()
        try:
            self._known_src = {
                r.src_sha for r in self.script_sources().select("src_sha").collect()
            }
        except Exception:
            pass  # no source snapshots yet
        # Recover last-start times from the records table so interval
        # throttling survives runner restarts (reference looks up the
        # last execution record: records/RecordDao.scala:85-90,
        # hive/HiveBeeLine.scala:218-224). 'running' rows count: a run
        # that crashed mid-task still consumed its interval slot.
        try:
            from pyspark.sql import functions as F

            for row in (
                self.records()
                .groupBy("path")
                .agg(F.max("started_at").alias("ms"))
                .collect()
            ):
                self.last_started[row.path] = row.ms / 1000.0
            self._fail_orphans()
        except Exception:
            pass  # no records yet

    # -- records ---------------------------------------------------------
    def _ensure_jdbc_src_sha(self) -> None:
        """Upgrade a pre-src_sha JDBC records table in place.

        The parquet path handles schema drift with mergeSchema, but a
        JDBC table created before the src_sha column existed would
        fail both the widened 7-column append and _fail_orphans'
        ``select('src_sha')``. ALTER TABLE ADD COLUMN once on first
        touch (Derby and MySQL syntax agree); a missing table means
        the first append creates it already widened."""
        if self._jdbc_src_sha_ok:
            return
        from data_misc_tools_spark.sources.jdbc import exec_update, jdbc_to_df

        try:
            cols = jdbc_to_df(
                self.spark, self.records_jdbc_url,
                f"SELECT * FROM {self.records_table} WHERE 1=0",
                properties=self.jdbc_properties,
            ).columns
        except Exception:
            self._jdbc_src_sha_ok = True  # no table yet
            return
        if "src_sha" not in {c.lower() for c in cols}:
            exec_update(
                self.spark, self.records_jdbc_url,
                f"ALTER TABLE {self.records_table} ADD COLUMN src_sha VARCHAR(64)",
                properties=self.jdbc_properties,
            )
        self._jdbc_src_sha_ok = True

    def _record(
        self, task: ScriptTask, started: float, finished: float, status: str,
        result: Any, src_sha: str | None = None,
    ) -> None:
        self._append_row(
            task.path,
            task.script_type,
            int(started * 1000),
            int(finished * 1000),
            status,
            str(result)[:4000],
            src_sha,
        )

    def _append_row(
        self, path: str, script_type: str, started_ms: int, finished_ms: int,
        status: str, result: str, src_sha: str | None = None,
    ) -> None:
        row = [(path, script_type, started_ms, finished_ms, status, result, src_sha)]
        df = self.spark.createDataFrame(row, RECORD_SCHEMA).coalesce(1)
        if self.records_jdbc_url is not None:
            from data_misc_tools_spark.sources.jdbc import df_to_jdbc

            df_to_jdbc(
                df, self.records_jdbc_url, self.records_table,
                mode="append", properties=self.jdbc_properties,
            )
        else:
            df.write.mode("append").parquet(self.records_path)

    def records(self):
        if self.records_jdbc_url is not None:
            from data_misc_tools_spark.sources.jdbc import jdbc_to_df

            return jdbc_to_df(
                self.spark, self.records_jdbc_url,
                f"SELECT * FROM {self.records_table}",
                properties=self.jdbc_properties,
            )
        # mergeSchema: pre-src_sha records tables lack the column;
        # mixed files must still read as one relation
        return self.spark.read.option("mergeSchema", "true").parquet(
            self.records_path
        )

    def script_sources(self):
        """The (src_sha, path, content, first_seen_ms) snapshot table:
        join records.src_sha against it to recover the exact script
        text any run executed."""
        if self.records_jdbc_url is not None:
            from data_misc_tools_spark.sources.jdbc import jdbc_to_df

            return jdbc_to_df(
                self.spark, self.records_jdbc_url,
                f"SELECT * FROM {self.src_table}",
                properties=self.jdbc_properties,
            )
        return self.spark.read.parquet(self.src_path)

    def _snapshot_source(self, task: ScriptTask) -> str:
        """Persist the current script content once per distinct sha;
        returns the sha for the execution record."""
        sha, content = task.source_snapshot()
        if sha in self._known_src:
            return sha
        row = [(sha, task.path, content, int(time.time() * 1000))]
        df = self.spark.createDataFrame(row, SRC_SCHEMA).coalesce(1)
        if self.records_jdbc_url is not None:
            from data_misc_tools_spark.sources.jdbc import df_to_jdbc

            df_to_jdbc(
                df, self.records_jdbc_url, self.src_table,
                mode="append", properties=self.jdbc_properties,
            )
        else:
            df.write.mode("append").parquet(self.src_path)
        self._known_src.add(sha)
        return sha

    def _fail_orphans(self) -> None:
        """Mark crash-orphaned runs failed: a 'running' start row with
        no completion row for the same (path, started_at) means the
        previous runner died mid-task (reference: the execution record
        written at start and finalized at finish,
        process/ScriptHelper.scala:143-156 — a crash leaves it
        unfinished, and the restarted runner must both see the start
        for throttling and record the failure)."""
        recs = self.records()
        done = recs.filter(recs.status != "running").select(
            "path", "started_at"
        )
        orphans = (
            recs.filter(recs.status == "running")
            .select("path", "script_type", "started_at", "src_sha")
            .join(done, ["path", "started_at"], "left_anti")
            .collect()
        )
        now_ms = int(time.time() * 1000)
        for o in orphans:
            self._append_row(
                o.path, o.script_type, o.started_at, now_ms,
                "failed", "crashed: no completion record (runner restart)",
                o.src_sha,
            )

    # -- scheduling ------------------------------------------------------
    def is_ready(self, task: ScriptTask, now: float | None = None) -> bool:
        """Interval throttle: has ≥ interval elapsed since the last
        start? (reference: ScriptHelper.isReady via execution-record
        lookup, HiveBeeLine.scala:218-224)."""
        now = now if now is not None else time.time()
        last = self.last_started.get(task.path)
        return last is None or (now - last) >= parse_iso_duration(task.interval)

    def run_once(self, task: ScriptTask, force: bool = False) -> Any:
        """Execute the task if due; feeds the previous result back as
        ``param`` (reference: InterpreterLoader.scala:141-152)."""
        if not force and not self.is_ready(task):
            return self.last_result.get(task.path)
        started = time.time()
        self.last_started[task.path] = started
        # Snapshot the script source BEFORE running (reference persists
        # ScriptSrc per version): the sha on both records pins exactly
        # which hot-reload version this run executed, even if the file
        # changes again mid-run.
        try:
            src_sha = self._snapshot_source(task)
        except (OSError, ValueError):
            src_sha = None  # unreadable file: _load will record the failure
        # Start record FIRST (reference writes the execution record at
        # task start and finalizes it at finish): a crash mid-task
        # leaves this 'running' row behind, so the restarted runner
        # both throttles the slot and marks the run failed
        # (_fail_orphans).
        self._record(task, started, 0, "running", "", src_sha)
        try:
            fn = task._load()
            result = fn(self.spark, self.last_result.get(task.path))
            status = "succeeded"
        except Exception:
            result = traceback.format_exc()
            status = "failed"
        finished = time.time()
        self._record(task, started, finished, status, result, src_sha)
        if status == "succeeded":
            self.last_result[task.path] = result
            return result
        return None

    def loop(self, tasks: list[ScriptTask], tick_sec: float = 60.0, max_ticks: int | None = None) -> None:
        """The reference's ≥60 s timer loop (InterpreterLoader:127-131).
        ``max_ticks`` bounds the loop for tests; None = run until
        :meth:`stop` (the graceful-shutdown analog of the reference's
        POSIX signal handlers, process/MiscHelper.scala:31-45)."""
        ticks = 0
        while not self._stop and (max_ticks is None or ticks < max_ticks):
            for task in tasks:
                if self._stop:
                    break
                self.run_once(task)
            ticks += 1
            if not self._stop and (max_ticks is None or ticks < max_ticks):
                time.sleep(tick_sec)

    def start_background(self, tasks: list[ScriptTask], tick_sec: float = 60.0):
        """Run the loop on a daemon thread; returns the thread. Call
        :meth:`stop` to end it after the in-flight task finishes."""
        import threading

        self._stop = False
        t = threading.Thread(
            target=self.loop, args=(tasks, tick_sec), daemon=True, name="dmt-runner"
        )
        t.start()
        return t

    def stop(self) -> None:
        self._stop = True
