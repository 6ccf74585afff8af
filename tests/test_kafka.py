"""Kafka wrapper semantics testable without a broker."""

import pytest

from data_misc_tools_spark.operators import kafka as K


def test_time_window_slice_boundaries(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-10 00:00:00"), (2, "2024-01-15 12:00:00"),
         (3, "2024-01-19 23:59:59"), (4, "2024-01-20 00:00:00")],
        "id int, s string",
    ).selectExpr("id", "cast(s as timestamp) as ts")
    got = {r.id for r in
           K.time_window_slice(df, "ts", "2024-01-10 00:00:00", "2024-01-20 00:00:00").collect()}
    assert got == {1, 2, 3}  # [start, end): start inclusive, end exclusive


def test_empty_window_semantics(spark):
    df = spark.createDataFrame([(1, "2024-01-10 00:00:00")], "id int, s string") \
        .selectExpr("id", "cast(s as timestamp) as ts")
    assert K.time_window_slice(df, "ts", "2024-01-10 00:00:00", "2024-01-10 00:00:00").count() == 0
    assert K.time_window_slice(df, "ts", "2024-01-20 00:00:00", "2024-01-10 00:00:00").count() == 0


def test_to_millis_formats():
    assert K._to_millis("1970-01-01 00:00:01") == 1000
    assert K._to_millis("1970-01-01T00:00:01") == 1000
    assert K._to_millis("1970-01-02") == 86_400_000
    assert K._to_millis("1970-01-01 00:00:00.5") == 500
    with pytest.raises(ValueError):
        K._to_millis("not a time")


def test_kf_pull_contract_without_broker(spark):
    # start >= end -> empty frame in the record shape, no broker needed
    df = K.kf_pull(spark, "broker:9092", "2024-01-02", "2024-01-01", "topic_a")
    assert df.columns == ["t", "ct", "k", "v"]
    assert df.count() == 0
    with pytest.raises(ValueError):
        K.kf_pull(spark, "", "2024-01-01", "2024-01-02", "topic_a")


def test_default_cfgs_match_reference():
    c = K.consumer_defaults()
    assert c["max.poll.records"] == "1000"            # Configs.scala:74
    assert c["max.partition.fetch.bytes"] == "2097152"  # :75
    assert c["enable.auto.commit"] == "false"
    p = K.producer_defaults()
    assert p["compression.type"] == "gzip"
    assert p["request.timeout.ms"] == "1000"          # UDTFKafkaPush.java:41


class TestRateLimitedBackfillPlan:
    """plan_rate_limited_backfill: the offline twin of Spark's
    maxOffsetsPerTrigger proration (reference throttles via
    backpressure + max.poll.records, Configs.scala:52-64)."""

    def _reconstruct(self, plan):
        """Concatenate each partition's windows across triggers."""
        seen: dict = {}
        for step in plan:
            for p, (frm, until) in step.items():
                assert until > frm, "empty window emitted"
                if p in seen:
                    assert frm == seen[p], f"gap/overlap at {p}"
                seen[p] = until
        return seen

    def test_exact_coverage_and_cap(self):
        start = {("t", 0): 100, ("t", 1): 0, ("u", 0): 5}
        end = {("t", 0): 1100, ("t", 1): 37, ("u", 0): 5}
        plan = K.plan_rate_limited_backfill(start, end, 100)
        total_lag = sum(end[p] - start[p] for p in start)
        # every trigger takes exactly min(cap, remaining)
        takes = [sum(u - f for f, u in step.values()) for step in plan]
        assert takes == [100] * (total_lag // 100) + (
            [total_lag % 100] if total_lag % 100 else []
        )
        ends = self._reconstruct(plan)
        assert ends == {p: e for p, e in end.items() if e > start[p]}
        # the zero-lag partition never appears
        assert all(("u", 0) not in step for step in plan)

    def test_proportional_to_lag(self):
        start = {("t", 0): 0, ("t", 1): 0}
        end = {("t", 0): 900, ("t", 1): 100}
        step = K.plan_rate_limited_backfill(start, end, 100)[0]
        assert step[("t", 0)] == (0, 90)
        assert step[("t", 1)] == (0, 10)

    def test_budget_smaller_than_partition_count_still_progresses(self):
        start = {("t", i): 0 for i in range(8)}
        end = {("t", i): 3 for i in range(8)}
        plan = K.plan_rate_limited_backfill(start, end, 2)
        assert len(plan) == 12  # 24 offsets / 2 per trigger
        assert all(sum(u - f for f, u in s.values()) == 2 for s in plan)
        self._reconstruct(plan)

    def test_deterministic(self):
        start = {("t", i): i * 7 for i in range(5)}
        end = {("t", i): i * 7 + 13 * (i + 1) for i in range(5)}
        a = K.plan_rate_limited_backfill(start, end, 17)
        b = K.plan_rate_limited_backfill(start, end, 17)
        assert a == b

    def test_validation(self):
        with pytest.raises(ValueError, match="max_offsets_per_trigger"):
            K.plan_rate_limited_backfill({}, {}, 0)
        with pytest.raises(ValueError, match="different partitions"):
            K.plan_rate_limited_backfill({("t", 0): 0}, {}, 1)
        with pytest.raises(ValueError, match="below start"):
            K.plan_rate_limited_backfill({("t", 0): 5}, {("t", 0): 4}, 1)

    def test_single_giant_partition(self):
        plan = K.plan_rate_limited_backfill(
            {("t", 0): 0}, {("t", 0): 10_000}, 999
        )
        assert len(plan) == 11
        assert self._reconstruct(plan) == {("t", 0): 10_000}


def test_kafka_backfill_stream_validates_budget(spark):
    with pytest.raises(ValueError, match="max_offsets_per_trigger"):
        K.kafka_backfill_stream(spark, "broker:9092", "topic_a", 0)

def test_backfill_batch_options_shapes():
    plan = K.plan_rate_limited_backfill(
        {("t", 0): 0, ("t", 1): 10, ("u", 0): 0},
        {("t", 0): 150, ("t", 1): 110, ("u", 0): 40},
        100,
    )
    opts = K.backfill_batch_options(plan)
    assert len(opts) == len(plan)
    import json

    # per-trigger JSON mirrors the window maps exactly, and chaining
    # triggers is seamless: trigger N's endingOffsets == trigger N+1's
    # startingOffsets on every partition present in both
    for step, o in zip(plan, opts):
        starting = json.loads(o["startingOffsets"])
        ending = json.loads(o["endingOffsets"])
        for (topic, part), (frm, until) in step.items():
            assert starting[topic][str(part)] == frm
            assert ending[topic][str(part)] == until
    for prev, nxt in zip(opts, opts[1:]):
        e = json.loads(prev["endingOffsets"])
        s = json.loads(nxt["startingOffsets"])
        for topic in set(e) & set(s):
            for p in set(e[topic]) & set(s[topic]):
                assert e[topic][p] == s[topic][p]


def test_backfill_plan_replay_equals_unthrottled_slice(spark, sf_dir):
    """VERDICT r6 #6: the planner's reconstructed trigger windows,
    replayed as bounded slices, reproduce EXACTLY the rows of one
    unthrottled [start, end) time slice of the events fixture.

    Offsets are simulated Kafka-style: partition = user_id % 4, offset
    = arrival rank within the partition (row_number over ts, event_id
    — unique, so the mapping row<->offset is bijective)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_misc_tools_spark.session import load_tables

    events = load_tables(spark, sf_dir, ["events"])["events"]
    start, end = "2024-01-05 00:00:00", "2024-01-20 00:00:00"
    target = K.time_window_slice(events, "ts", start, end)

    w = Window.partitionBy("part").orderBy("ts", "event_id")
    numbered = (
        target.withColumn("part", (F.col("user_id") % 4).cast("int"))
        .withColumn("offset", F.row_number().over(w) - 1)
        .select("event_id", "part", "offset")
        .collect()
    )
    end_offsets = {}
    for r in numbered:
        key = ("events", r.part)
        end_offsets[key] = max(end_offsets.get(key, 0), r.offset + 1)
    start_offsets = {k: 0 for k in end_offsets}

    plan = K.plan_rate_limited_backfill(start_offsets, end_offsets, 500)
    assert len(plan) > 1, "fixture too small to exercise multiple triggers"

    replayed = []
    for step in plan:
        for (_, part), (frm, until) in step.items():
            replayed.extend(
                r.event_id for r in numbered
                if r.part == part and frm <= r.offset < until
            )
    expected = [r.event_id for r in numbered]
    assert sorted(replayed) == sorted(expected)
    assert len(replayed) == len(set(replayed)), "a row was replayed twice"
