"""Connected components / dedup clustering."""

from data_misc_tools_spark.operators.cluster import connected_components, dedup_clusters


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        (r.node, r.component) for r in connected_components(df).collect()
    }


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: diameter 4, everything labels to 1
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {(n, 1) for n in [1, 2, 3, 4, 5]}


def test_disjoint_components_stay_apart(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)])
    comp = dict(got)
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10
    assert comp[20] == comp[21] == comp[22] == 20


def test_self_loops_and_duplicates_ignored(spark):
    got = _cc(spark, [(5, 5), (1, 2), (2, 1), (1, 2)])
    assert dict(got) == {1: 1, 2: 1}  # the 5-5 self-loop adds no node


def test_star_converges_in_one_round(spark):
    center = [(100, i) for i in range(101, 106)]
    got = _cc(spark, center)
    assert {c for _, c in got} == {100}


def test_dedup_clusters_sizes_and_survivors(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    rows = {(r.component, r.size, r.keep_id) for r in dedup_clusters(df).collect()}
    assert rows == {(1, 3, 1), (10, 2, 10)}


def test_components_on_real_neardup_pairs(spark, sf_dir):
    """End-to-end: n-gram Jaccard pairs over the doubled-docs fixture
    -> clusters; every doubled doc pairs with its twin, so every
    cluster has >= 2 members and keep_id == component."""
    import pyspark.sql.functions as F

    from data_misc_tools_spark.catalog import _doubled_docs

    docs = _doubled_docs(spark, sf_dir)
    # every doubled doc shares its twin's exact text: md5-group pairs
    pairs = (
        docs.select(F.md5("text").alias("h"), F.col("doc_id"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_a"), F.max("doc_id").alias("doc_b"))
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    clusters = dedup_clusters(pairs).collect()
    assert len(clusters) > 0
    assert all(r.size >= 2 for r in clusters)
    assert all(r.keep_id == r.component for r in clusters)


def _cc_star(spark, edges):
    from data_misc_tools_spark.operators.cluster import connected_components_star

    df = spark.createDataFrame(edges, "src long, dst long")
    return {(r.node, r.component) for r in connected_components_star(df).collect()}


def test_star_variant_basic_shapes(spark):
    assert _cc_star(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]) == {
        (n, 1) for n in [1, 2, 3, 4, 5]
    }
    got = dict(_cc_star(spark, [(1, 2), (10, 11), (11, 12)]))
    assert got == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10}


def test_star_variant_long_chain_few_rounds(spark):
    """A 64-node chain (diameter 63): the star algorithm must converge
    within its 25-round cap, where plain propagation would need 63."""
    chain = [(i, i + 1) for i in range(1, 64)]
    got = dict(_cc_star(spark, chain))
    assert set(got.values()) == {1}
    assert len(got) == 64


def test_star_variant_matches_propagation_on_random_graph(spark):
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    edges = [e for e in edges if e[0] != e[1]]
    df = spark.createDataFrame(edges, "src long, dst long")
    star = dict(_cc_star(spark, edges))
    plain = {
        r.node: r.component for r in connected_components(df, max_iter=60).collect()
    }
    assert star == plain
