"""Scale-path I/O evidence: partition pruning and sketch aggregates."""

import pyspark.sql.functions as F


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_then_pruned_read(spark, sf_dir, tmp_path):
    """write.partitionBy(lang) -> a lang filter becomes a PARTITION
    filter (directory pruning), not a data filter: the scan never opens
    the other languages' files. This is the layout that turns a 100 TB
    corpus scan into a per-language slice read."""
    from data_misc_tools_spark.session import load_tables

    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    out = str(tmp_path / "docs_by_lang")
    d.write.partitionBy("lang").parquet(out)

    rd = spark.read.parquet(out).filter(F.col("lang") == "en")
    plan = _plan(rd)
    assert "PartitionFilters" in plan
    # the lang predicate is satisfied by pruning, pushed as partition
    # (not data) filter
    assert plan.split("PartitionFilters")[1].split("]")[0].count("lang") >= 1
    want = d.filter(F.col("lang") == "en").count()
    assert rd.count() == want


def test_partition_pruning_reads_fewer_files(spark, sf_dir, tmp_path):
    from data_misc_tools_spark.session import load_tables

    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    out = str(tmp_path / "docs_by_source")
    d.write.partitionBy("source").parquet(out)
    all_rows = spark.read.parquet(out)
    one = all_rows.filter(F.col("source") == "src1")
    # selected files metric: pruned scan touches a strict subset
    assert one.count() < all_rows.count()
    assert one.select("source").distinct().count() == 1


def test_sketch_aggregates_within_tolerance(spark, sf_dir):
    """approx_count_distinct (HLL++) and percentile_approx are the
    documented scale substitutes for their exact twins (1000x less
    shuffle state); pin their error here so the trade is explicit."""
    from data_misc_tools_spark.session import load_tables

    e = load_tables(spark, sf_dir, ["events"])["events"]
    exact, approx = e.agg(
        F.countDistinct("user_id").alias("x"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("a"),
    ).first()
    assert abs(approx - exact) / exact < 0.05

    p_exact = e.agg(F.expr("percentile(value, 0.9)")).first()[0]
    p_approx = e.agg(F.percentile_approx("value", 0.9, 1000)).first()[0]
    spread = e.agg(F.max("value") - F.min("value")).first()[0]
    assert abs(p_approx - p_exact) <= 0.05 * spread


def test_hll_sketch_union_matches_exact_within_tolerance(spark, sf_dir):
    """The MERGEABLE sketch path (hll_sketch_agg per group, then
    hll_union_agg across groups) must estimate the true per-day
    distinct-user count within 5% — the correctness pin behind the
    hll_users_mergeable_rollup catalog entry: pre-aggregated sketches
    answer coarser rollups without re-scanning raw events."""
    from data_misc_tools_spark.session import load_tables

    e = load_tables(spark, sf_dir, ["events"])["events"]
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day_str")
    exact = {
        r.day_str: r.x
        for r in e.groupBy(day)
        .agg(F.countDistinct("user_id").alias("x"))
        .collect()
    }
    merged = {
        r.day_str: r.est
        for r in e.groupBy(day, "event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy("day_str")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("est"))
        .collect()
    }
    assert set(merged) == set(exact)
    for d, x in exact.items():
        assert abs(merged[d] - x) / x < 0.05, (d, merged[d], x)


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Two tables bucketed on the join key with equal bucket counts
    must join with ZERO Exchange operators (the 100 TB fact-join
    layout: the shuffle happens once at write time, never again)."""
    from data_misc_tools_spark.session import load_tables
    from data_misc_tools_spark.sources.bucketing import bucketed_join, write_bucketed

    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    write_bucketed(
        t["orders"].withColumnRenamed("o_orderkey", "key"), "b_orders", "key", 4
    )
    write_bucketed(
        t["lineitem"].withColumnRenamed("l_orderkey", "key"), "b_lineitem", "key", 4
    )
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bucketed_join(spark, "b_orders", "b_lineitem", "key")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert "SortMergeJoin" in plan
            # cross-check the result is the real join
            n = joined.count()
            want = (
                t["orders"]
                .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
                .count()
            )
            assert n == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_count_min_sketch_mergeable_frequencies(spark, sf_dir):
    """Count-min sketches are the mergeable FREQUENCY twin of the HLL
    distinct path: build one sketch per event_type group, merge them
    driver-side, and the merged estimate over-counts each user's
    event total by at most eps*N (CMS errs only upward) — heavy-user
    frequencies without carrying per-key counts through the shuffle."""
    from data_misc_tools_spark.session import load_tables

    e = load_tables(spark, sf_dir, ["events"])["events"]
    exact = {
        r.user_id: r.n
        for r in e.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    per_group = e.groupBy("event_type").agg(
        F.count_min_sketch(
            "user_id", F.lit(0.001), F.lit(0.99), F.lit(42)
        ).alias("sk")
    ).collect()
    jvm = spark._jvm
    merged = None
    for r in per_group:
        sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            bytes(r.sk)
        )
        merged = sk if merged is None else merged.mergeInPlace(sk)
    total = sum(exact.values())
    for uid, n in exact.items():
        est = merged.estimateCount(uid)
        assert est >= n  # CMS never undercounts
        assert est - n <= 0.001 * total + 1


def test_hll_overlap_inclusion_exclusion_within_tolerance(spark, sf_dir):
    """Pairwise audience overlap from sketches (|A|+|B|-|A∪B|) must
    track the exact intersections — backs hll_audience_overlap.
    Inclusion-exclusion compounds three estimator errors, so the
    tolerance is wider than the single-sketch pin: ±10% of |A∪B|."""
    from data_misc_tools_spark.catalog import QUERIES
    from data_misc_tools_spark.session import load_tables

    est = {(r.type_a, r.type_b): r.n_overlap_est
           for r in QUERIES["hll_audience_overlap"](spark, sf_dir).collect()}
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    users = {t: {r.user_id for r in rows}
             for t, rows in (
                 (t, ev.filter(F.col("event_type") == t)
                       .select("user_id").distinct().collect())
                 for t in {k for p in est for k in p}
             )}
    assert len(est) == 10  # C(5,2) type pairs
    for (ta, tb), got in est.items():
        exact = len(users[ta] & users[tb])
        union = len(users[ta] | users[tb])
        assert abs(got - exact) <= max(0.1 * union, 5), (ta, tb, got, exact)
