"""Connected components / dedup clustering."""

from data_misc_tools_spark.operators.cluster import connected_components, dedup_clusters
from data_misc_tools_spark.operators import cluster as C


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


class TestPageRank:
    def _reference_pagerank(self, edges, damping=0.85, iters=10):
        """Pure-Python power iteration, identical update rule."""
        nodes = sorted({n for e in edges for n in e})
        out = {}
        for a, b in set(edges):
            out.setdefault(a, set()).add(b)
        n = len(nodes)
        rank = {v: 1.0 / n for v in nodes}
        for _ in range(iters):
            dangling = sum(rank[v] for v in nodes if v not in out)
            base = (1 - damping) / n + damping * dangling / n
            new = {v: 0.0 for v in nodes}
            for a, targets in out.items():
                for b in targets:
                    new[b] += rank[a] / len(targets)
            rank = {v: base + damping * new[v] for v in nodes}
        return rank

    def test_matches_reference_implementation(self, spark):
        edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]  # 4 -> sink-ish
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.rank for r in C.pagerank(df, max_iter=10).collect()}
        want = self._reference_pagerank(edges)
        assert set(got) == set(want)
        for v in want:
            assert abs(got[v] - want[v]) < 1e-9, v
        assert abs(sum(got.values()) - 1.0) < 1e-9

    def test_dangling_mass_is_conserved(self, spark):
        # node 3 has no out-edges: total rank must still sum to 1
        df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
        got = {r.node: r.rank for r in C.pagerank(df, max_iter=8).collect()}
        assert abs(sum(got.values()) - 1.0) < 1e-9
        # downstream of the chain ranks higher than the source
        assert got[3] > got[1]

    def test_symmetric_cycle_is_uniform(self, spark):
        df = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
        )
        got = [r.rank for r in C.pagerank(df, max_iter=5).collect()]
        assert all(abs(r - 0.25) < 1e-12 for r in got)


class TestPageRankExact:
    def _reference(self, edges, d=85, iters=5):
        """Pure-Python integer twin of cluster.pagerank_exact: e6 mass,
        half-up divisions, no dangling (edges must be symmetrized)."""

        def half_up(a, b):
            return (2 * a + b) // (2 * b)

        e = set(edges)
        out = {}
        for a, b in e:
            out.setdefault(a, set()).add(b)
        nodes = sorted(out)
        n = len(nodes)
        base = half_up((100 - d) * 1_000_000, 100 * n)
        v = {x: 1_000_000 // n for x in nodes}
        for _ in range(iters):
            inc = {}
            for a, targets in out.items():
                s = half_up(v[a], len(targets))
                for b in targets:
                    inc[b] = inc.get(b, 0) + s
            v = {b: base + half_up(d * s, 100) for b, s in inc.items()}
        return v

    def test_matches_integer_reference(self, spark):
        import random

        rng = random.Random(7)
        raw = {(rng.randrange(12), rng.randrange(12)) for _ in range(30)}
        edges = [(a, b) for a, b in raw if a != b]
        both = edges + [(b, a) for a, b in edges]
        df = spark.createDataFrame(both, "src long, dst long")
        got = {r.node: r.v_e6 for r in C.pagerank_exact(df, max_iter=5).collect()}
        assert got == self._reference(both)

    def test_symmetric_cycle_is_uniform(self, spark):
        cyc = [(1, 2), (2, 3), (3, 4), (4, 1)]
        both = cyc + [(b, a) for a, b in cyc]
        df = spark.createDataFrame(both, "src long, dst long")
        got = {r.v_e6 for r in C.pagerank_exact(df, max_iter=5).collect()}
        assert got == {250_000}


class TestPageRankFast:
    """The float production twin (VERDICT r5 ask): on the symmetrized
    graphs it is specified for, it must agree with the dangling-aware
    float pagerank to machine precision AND track the integer-exact
    graded twin to e6 truncation tolerance."""

    def _random_symmetrized(self, seed=7, n=12, m=30):
        import random

        rng = random.Random(seed)
        raw = {(rng.randrange(n), rng.randrange(n)) for _ in range(m)}
        edges = [(a, b) for a, b in raw if a != b]
        return edges + [(b, a) for a, b in edges]

    def test_matches_float_pagerank_on_symmetrized_graph(self, spark):
        both = self._random_symmetrized()
        df = spark.createDataFrame(both, "src long, dst long")
        fast = {r.node: r.rank for r in C.pagerank_fast(df, max_iter=5).collect()}
        full = {r.node: r.rank for r in C.pagerank(df, max_iter=5).collect()}
        assert set(fast) == set(full)
        for v in full:
            # identical update rule, no dangling mass on a symmetrized
            # graph: only float association order can differ
            assert abs(fast[v] - full[v]) < 1e-12, v

    def test_tracks_integer_exact_twin(self, spark):
        both = self._random_symmetrized(seed=11)
        df = spark.createDataFrame(both, "src long, dst long")
        fast = {r.node: r.rank for r in C.pagerank_fast(df, max_iter=5).collect()}
        exact = {r.node: r.v_e6 for r in C.pagerank_exact(df, max_iter=5).collect()}
        assert set(fast) == set(exact)
        n = len(exact)
        for v in exact:
            # e6 truncation drifts ~1 unit per half-up per round
            assert abs(fast[v] - exact[v] / 1e6) < 5 * 5 * n / 1e6, v

    def test_checkpoint_cadence_does_not_change_results(self, spark):
        both = self._random_symmetrized(seed=3)
        df = spark.createDataFrame(both, "src long, dst long")
        a = {r.node: r.rank for r in C.pagerank_fast(
            df, max_iter=6, checkpoint_every=2
        ).collect()}
        b = {r.node: r.rank for r in C.pagerank_fast(
            df, max_iter=6, checkpoint_every=0
        ).collect()}
        assert a == b

    def test_dangling_graph_raises(self, spark):
        # ADVICE r6: node 3 has in-edges only — its rank mass would
        # silently leak; the guard must fail loudly instead
        df = spark.createDataFrame(
            [(0, 1), (1, 0), (1, 3), (2, 3), (0, 2), (2, 0)],
            "src long, dst long",
        )
        import pytest as _pytest

        with _pytest.raises(ValueError, match="no-dangling"):
            C.pagerank_fast(df, max_iter=2)


class TestIncrementalCC:
    def test_matches_full_recompute_on_random_split(self, spark):
        """Split a random edge set into two batches: CC(batch1) merged
        with batch2 incrementally must equal CC(all edges) exactly —
        including nodes first seen in batch2."""
        import random

        from data_misc_tools_spark.operators.cluster import (
            connected_components_incremental,
        )

        rng = random.Random(13)
        edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(120)]
        edges = [e for e in edges if e[0] != e[1]]
        cut = len(edges) // 2
        df_all = spark.createDataFrame(edges, "src long, dst long")
        df1 = spark.createDataFrame(edges[:cut], "src long, dst long")
        df2 = spark.createDataFrame(edges[cut:], "src long, dst long")

        full = {
            r.node: r.component
            for r in connected_components(df_all, max_iter=60).collect()
        }
        lab1 = connected_components(df1, max_iter=60)
        inc = {
            r.node: r.component
            for r in connected_components_incremental(lab1, df2).collect()
        }
        assert inc == full

    def test_new_batch_merges_two_old_clusters(self, spark):
        from data_misc_tools_spark.operators.cluster import (
            connected_components_incremental,
        )

        base = spark.createDataFrame([(1, 2), (10, 11)], "src long, dst long")
        lab = connected_components(base)
        # bridge the clusters and introduce a brand-new node 50
        bridge = spark.createDataFrame([(2, 10), (50, 11)], "src long, dst long")
        got = {
            r.node: r.component
            for r in connected_components_incremental(lab, bridge).collect()
        }
        assert got == {1: 1, 2: 1, 10: 1, 11: 1, 50: 1}

    def test_untouched_clusters_keep_labels(self, spark):
        from data_misc_tools_spark.operators.cluster import (
            connected_components_incremental,
        )

        base = spark.createDataFrame([(1, 2), (10, 11)], "src long, dst long")
        lab = connected_components(base)
        only_new = spark.createDataFrame([(30, 31)], "src long, dst long")
        got = {
            r.node: r.component
            for r in connected_components_incremental(lab, only_new).collect()
        }
        assert got == {1: 1, 2: 1, 10: 10, 11: 10, 30: 30, 31: 30}


def test_triangle_count_known_graphs_and_random(spark):
    from itertools import combinations
    import random

    from data_misc_tools_spark.operators.cluster import triangle_count

    def run(edge_list):
        df = spark.createDataFrame(edge_list, "src long, dst long")
        return triangle_count(df).collect()[0].n_triangles

    # K4: every 3-subset closes -> C(4,3) = 4
    k4 = list(combinations(range(4), 2))
    assert run(k4) == 4
    # chain has none; duplicate/reversed/self edges must not inflate
    assert run([(1, 2), (2, 3), (3, 4)]) == 0
    assert run(k4 + [(b, a) for a, b in k4] + [(2, 2)]) == 4

    rng = random.Random(11)
    nodes, edges = 40, set()
    while len(edges) < 150:
        a, b = rng.sample(range(nodes), 2)
        edges.add((min(a, b), max(a, b)))
    adj = {n: set() for n in range(nodes)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    brute = sum(
        1 for a, b, c in combinations(range(nodes), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    assert run(sorted(edges)) == brute


def test_k_core_peels_to_reference(spark):
    import random
    from collections import defaultdict

    from data_misc_tools_spark.operators.cluster import k_core

    def ref_k_core(edge_list, k):
        edges = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
        while True:
            deg = defaultdict(int)
            for a, b in edges:
                deg[a] += 1
                deg[b] += 1
            dead = {n for n, d in deg.items() if d < k}
            if not dead:
                return edges
            nxt = {e for e in edges if e[0] not in dead and e[1] not in dead}
            if nxt == edges:
                return edges
            edges = nxt

    def run(edge_list, k):
        df = spark.createDataFrame(edge_list, "src long, dst long")
        return {(r.a, r.b) for r in k_core(df, k).collect()}

    # triangle with a pendant tail: 2-core keeps only the triangle
    tri_tail = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    assert run(tri_tail, 2) == {(1, 2), (2, 3), (1, 3)}
    # chain: 2-core is empty (cascading peel from both ends)
    assert run([(1, 2), (2, 3), (3, 4)], 2) == set()

    rng = random.Random(5)
    edges = set()
    while len(edges) < 160:
        x, y = rng.sample(range(40), 2)
        edges.add((min(x, y), max(x, y)))
    for k in (2, 3, 4):
        assert run(sorted(edges), k) == ref_k_core(edges, k), k


class TestLabelPropagation:
    def _sym(self, spark, edges):
        both = edges + [(b, a) for a, b in edges]
        return spark.createDataFrame(both, "src long, dst long")

    def test_two_cliques_with_a_bridge_split(self, spark):
        """Two 4-cliques joined by one edge: CC sees one component,
        LPA must recover the two dense families."""
        k1 = [(a, b) for a in range(4) for b in range(4) if a < b]
        k2 = [(a + 10, b + 10) for a, b in k1]
        df = self._sym(spark, k1 + k2 + [(3, 10)])
        got = {r.node: r.community for r in C.label_propagation(df, max_iter=4).collect()}
        left = {got[n] for n in range(4)}
        right = {got[n + 10] for n in range(4)}
        assert len(left) == 1 and len(right) == 1
        assert left != right

    def test_matches_python_reference(self, spark):
        import random

        rng = random.Random(5)
        raw = {(rng.randrange(14), rng.randrange(14)) for _ in range(40)}
        edges = [(a, b) for a, b in raw if a != b]
        both = edges + [(b, a) for a, b in edges]
        df = spark.createDataFrame(both, "src long, dst long")
        got = {r.node: r.community for r in C.label_propagation(df, max_iter=3).collect()}
        # pure-python synchronous LPA, same tie rule
        nbrs = {}
        for a, b in set(both):
            nbrs.setdefault(a, []).append(b)
        label = {v: v for v in nbrs}
        for _ in range(3):
            new = {}
            for v, ns in nbrs.items():
                votes = {}
                for u in ns:
                    votes[label[u]] = votes.get(label[u], 0) + 1
                best = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
                new[v] = best
            label = new
        assert got == label


class TestPersonalizedPageRankExact:
    def _reference(self, edges, seeds, d=85, iters=5):
        def half_up(a, b):
            return (2 * a + b) // (2 * b)

        out = {}
        for a, b in set(edges):
            out.setdefault(a, set()).add(b)
        sd = sorted(set(seeds) & set(out))
        ns = len(sd)
        base = half_up((100 - d) * 1_000_000, 100 * ns)
        v = {x: 1_000_000 // ns for x in sd}
        for _ in range(iters):
            inc = {}
            for a, va in v.items():
                s = half_up(va, len(out[a]))
                for b in out[a]:
                    inc[b] = inc.get(b, 0) + s
            nv = {b: half_up(d * s, 100) for b, s in inc.items()}
            for x in sd:
                nv[x] = nv.get(x, 0) + base
            v = nv
        return v

    def test_matches_integer_reference(self, spark):
        import random

        rng = random.Random(13)
        raw = {(rng.randrange(15), rng.randrange(15)) for _ in range(40)}
        edges = [(a, b) for a, b in raw if a != b]
        both = edges + [(b, a) for a, b in edges]
        df = spark.createDataFrame(both, "src long, dst long")
        seeds = spark.createDataFrame([(0,), (1,), (2,)], "node long")
        got = {
            r.node: r.v_e6
            for r in C.personalized_pagerank_exact(df, seeds, max_iter=5).collect()
        }
        assert got == self._reference(both, [0, 1, 2])

    def test_seed_dominates_and_far_end_gets_least(self, spark):
        """Chain 0-1-2-3-4 symmetrized, seed {0}: the seed holds the
        most mass and the far end the least. (Strict monotone decay
        is NOT asserted — synchronous power iteration on a path has
        odd/even parity oscillation at finite round counts.)"""
        chain = [(i, i + 1) for i in range(4)]
        both = chain + [(b, a) for a, b in chain]
        df = spark.createDataFrame(both, "src long, dst long")
        seeds = spark.createDataFrame([(0,)], "node long")
        got = {
            r.node: r.v_e6
            for r in C.personalized_pagerank_exact(df, seeds, max_iter=8).collect()
        }
        assert got[0] == max(got.values())
        # far pair (3,4) below near pair (1,2) — parity decides WITHIN
        # each pair, distance decides BETWEEN them
        assert min(got[1], got[2]) > max(got[3], got[4])

    def test_absent_seeds_raise(self, spark):
        df = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
        seeds = spark.createDataFrame([(99,)], "node long")
        import pytest

        with pytest.raises(ValueError, match="seed"):
            C.personalized_pagerank_exact(df, seeds)


class TestAdamicAdar:
    @staticmethod
    def _hup(x: float) -> int:
        import decimal

        return int(
            decimal.Decimal(x).quantize(0, rounding=decimal.ROUND_HALF_UP)
        )

    def test_matches_brute_force_reference(self, spark):
        import itertools
        import math
        import random

        from data_misc_tools_spark.operators.cluster import adamic_adar

        random.seed(7)
        edges = set()
        for _ in range(40):
            u, v = random.sample(range(20), 2)
            edges.add((min(u, v), max(u, v)))
        edf = spark.createDataFrame(sorted(edges), "src long, dst long")
        got = {
            (r.node_a, r.node_b): (r.n_common, r.aa_e6)
            for r in adamic_adar(edf).collect()
        }
        adj: dict[int, set[int]] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        ref = {}
        for u, v in itertools.combinations(sorted(adj), 2):
            if (u, v) in edges:
                continue
            common = adj[u] & adj[v]
            if not common:
                continue
            terms = [
                self._hup(1_000_000.0 / math.log(len(adj[w]))) for w in common
            ]
            ref[(u, v)] = (len(common), sum(terms))
        assert got == ref

    def test_max_degree_drops_hub_centers(self, spark):
        from data_misc_tools_spark.operators.cluster import adamic_adar

        # star: 0 is a hub of degree 5; spokes 1..5 pairwise share only 0
        star = [(0, i) for i in range(1, 6)]
        edf = spark.createDataFrame(star, "src long, dst long")
        full = adamic_adar(edf).count()
        assert full == 10  # C(5,2) spoke pairs via the hub
        assert adamic_adar(edf, max_degree=4).count() == 0

    def test_top_k_is_deterministic_prefix(self, spark):
        from data_misc_tools_spark.operators.cluster import adamic_adar

        edges = [(i, (i + 1) % 8) for i in range(8)]  # 8-cycle
        edf = spark.createDataFrame(edges, "src long, dst long")
        all_rows = sorted(
            adamic_adar(edf).collect(),
            key=lambda r: (-r.aa_e6, r.node_a, r.node_b),
        )
        top = adamic_adar(edf, top_k=3).collect()
        assert [(r.node_a, r.node_b) for r in top] == [
            (r.node_a, r.node_b) for r in all_rows[:3]
        ]

    def test_e6_log_terms_clear_rounding_boundaries(self):
        """The engine-portability contract: round(1e6/ln(d)) must sit
        far from a .5 decimal boundary for every plausible degree, so
        a few-ulp libm disagreement between Spark and a SQL twin can
        never flip the rounded integer. Scan d = 2..200000 (any real
        near-dup graph degree): the tightest degree is d=154431 at
        2.6e-6 from a boundary, while a 1-ulp ln() disagreement moves
        1e6/ln(d) by only ~1e-10 at this magnitude — four orders of
        margin. Pin > 1e-6 so a changed constant or scale can't
        silently land on a boundary."""
        import math

        worst = min(
            abs((1_000_000.0 / math.log(d)) % 1.0 - 0.5)
            for d in range(2, 200_001)
        )
        assert worst > 1e-6, worst


def test_local_clustering_coefficients(spark):
    from data_misc_tools_spark.operators.cluster import (
        local_clustering_coefficients,
    )

    # K4 on {1..4} plus a pendant 5-1 and an isolated edge 6-7
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (5, 1),
        (6, 7),
    ]
    df = spark.createDataFrame(edges, "src int, dst int")
    out = {r.node: r for r in local_clustering_coefficients(df).collect()}
    # inside K4 (nodes 2,3,4): deg 3, in 3 triangles, lcc = 1
    for n in (2, 3, 4):
        assert (out[n].deg, out[n].n_triangles, out[n].lcc) == (3, 3, 1.0)
    # node 1: deg 4 (K4 + pendant), still 3 triangles -> 6/12
    assert (out[1].deg, out[1].n_triangles, out[1].lcc) == (4, 3, 0.5)
    # pendant and isolated-edge nodes: deg 1, lcc 0
    for n in (5, 6, 7):
        assert (out[n].deg, out[n].n_triangles, out[n].lcc) == (1, 0, 0.0)
    # duplicate + reversed edges collapse before counting
    noisy = df.unionAll(
        spark.createDataFrame([(2, 1), (1, 2)], "src int, dst int")
    )
    out2 = {
        r.node: r for r in local_clustering_coefficients(noisy).collect()
    }
    assert out2[1].deg == 4 and out2[1].n_triangles == 3


def test_hits_separates_hubs_from_authorities(spark):
    from data_misc_tools_spark.operators.cluster import hits_scores

    # star bipartite graph: user 1 touches items 10,20,30; users 2,3
    # each touch only item 10. Item 10 has most endorsements ->
    # top authority; user 1 touches the most good items -> top hub.
    edges = [(1, 10), (1, 20), (1, 30), (2, 10), (3, 10)]
    df = spark.createDataFrame(edges, "u int, it int")
    out = hits_scores(df, "u", "it", max_iter=3).collect()
    hubs = {r.node: r.score_e6 for r in out if r.kind == "hub"}
    auth = {r.node: r.score_e6 for r in out if r.kind == "authority"}
    assert max(hubs, key=hubs.get) == 1
    assert max(auth, key=auth.get) == 10
    assert hubs[1] == 1_000_000 and auth[10] == 1_000_000  # max-normalized
    assert hubs[2] == hubs[3]  # symmetric users tie exactly
    assert auth[20] == auth[30]
    # python reference of the same integer recurrence
    def half_up(a, b):
        return (2 * a * 1_000_000 + b) // (2 * b)

    h = {1: 10**6, 2: 10**6, 3: 10**6}
    for _ in range(3):
        ar = {}
        for u, it in edges:
            ar[it] = ar.get(it, 0) + h[u]
        m = max(ar.values())
        a = {it: half_up(s, m) for it, s in ar.items()}
        hr = {}
        for u, it in edges:
            hr[u] = hr.get(u, 0) + a[it]
        m = max(hr.values())
        h = {u: half_up(s, m) for u, s in hr.items()}
    assert hubs == h and auth == a

class TestFastTwinsRound7:
    """label_propagation_fast / personalized_pagerank_fast (VERDICT r6
    ask #1): the lazy-plan production twins of the two remaining
    expensive e6/eager graded rows."""

    def _random_symmetrized(self, seed=7, n=12, m=30):
        import random

        rng = random.Random(seed)
        raw = {(rng.randrange(n), rng.randrange(n)) for _ in range(m)}
        edges = [(a, b) for a, b in raw if a != b]
        return edges + [(b, a) for a, b in edges]

    def test_lpa_fast_equals_eager_exactly(self, spark):
        # integer votes + deterministic tie-break: the twin's output
        # must be IDENTICAL, not merely close
        for seed in (3, 7, 11):
            both = self._random_symmetrized(seed=seed)
            df = spark.createDataFrame(both, "src long, dst long")
            fast = {(r.node, r.community)
                    for r in C.label_propagation_fast(df, max_iter=4).collect()}
            eager = {(r.node, r.community)
                     for r in C.label_propagation(df, max_iter=4).collect()}
            assert fast == eager, seed

    def test_lpa_fast_checkpoint_cadence_invariant(self, spark):
        both = self._random_symmetrized(seed=5)
        df = spark.createDataFrame(both, "src long, dst long")
        a = {(r.node, r.community)
             for r in C.label_propagation_fast(df, max_iter=5, checkpoint_every=1).collect()}
        b = {(r.node, r.community)
             for r in C.label_propagation_fast(df, max_iter=5, checkpoint_every=0).collect()}
        assert a == b

    def test_ppr_fast_tracks_integer_exact_twin(self, spark):
        both = self._random_symmetrized(seed=11)
        df = spark.createDataFrame(both, "src long, dst long")
        seeds = spark.createDataFrame([(0,), (1,)], "node long")
        fast = {r.node: r.rank for r in
                C.personalized_pagerank_fast(df, seeds, max_iter=5).collect()}
        exact = {r.node: r.v_e6 for r in
                 C.personalized_pagerank_exact(df, seeds, max_iter=5).collect()}
        assert set(fast) == set(exact)
        n = len(exact)
        for v in exact:
            # e6 truncation drifts ~1 unit per half-up per round
            assert abs(fast[v] - exact[v] / 1e6) < 5 * 5 * n / 1e6, v

    def test_ppr_fast_dangling_graph_raises(self, spark):
        df = spark.createDataFrame(
            [(0, 1), (1, 0), (1, 3)], "src long, dst long"
        )
        seeds = spark.createDataFrame([(0,)], "node long")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="no-dangling"):
            C.personalized_pagerank_fast(df, seeds, max_iter=2)

    def test_ppr_fast_no_seed_raises(self, spark):
        both = self._random_symmetrized(seed=2)
        df = spark.createDataFrame(both, "src long, dst long")
        seeds = spark.createDataFrame([(999,)], "node long")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="no seed"):
            C.personalized_pagerank_fast(df, seeds, max_iter=2)


class TestEdgeTriangleSupport:
    def test_matches_brute_force(self, spark):
        import itertools
        import random

        rng = random.Random(7)
        raw = {(rng.randrange(15), rng.randrange(15)) for _ in range(45)}
        edges = [(a, b) for a, b in raw if a != b]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {(r.a, r.b): r.support
               for r in C.edge_triangle_support(df).collect()}
        canon = {(min(a, b), max(a, b)) for a, b in edges}
        sup = {e: 0 for e in canon}
        nodes = sorted({n for e in canon for n in e})
        for x, y, z in itertools.combinations(nodes, 3):
            if (x, y) in canon and (x, z) in canon and (y, z) in canon:
                sup[(x, y)] += 1
                sup[(x, z)] += 1
                sup[(y, z)] += 1
        assert got == sup

    def test_consistency_with_triangle_count(self, spark):
        """Σ support == 3 · n_triangles, exactly."""
        import random

        rng = random.Random(11)
        raw = {(rng.randrange(20), rng.randrange(20)) for _ in range(80)}
        edges = [(a, b) for a, b in raw if a != b]
        df = spark.createDataFrame(edges, "src long, dst long")
        total_sup = sum(r.support for r in C.edge_triangle_support(df).collect())
        n_tri = C.triangle_count(df).collect()[0].n_triangles
        assert total_sup == 3 * n_tri

    def test_clique_and_star(self, spark):
        # K4: every edge sits in exactly 2 triangles; a star has none
        k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
        star = [(100, i) for i in range(101, 105)]
        df = spark.createDataFrame(k4 + star, "src long, dst long")
        got = {(r.a, r.b): r.support
               for r in C.edge_triangle_support(df).collect()}
        for e in k4:
            assert got[e] == 2, e
        for a, b in star:
            assert got[(min(a, b), max(a, b))] == 0


class TestKTruss:
    def _py_ktruss(self, edges, k):
        import itertools

        cur = {(min(a, b), max(a, b)) for a, b in edges if a != b}
        while True:
            sup = {e: 0 for e in cur}
            nodes = sorted({n for e in cur for n in e})
            for x, y, z in itertools.combinations(nodes, 3):
                if (x, y) in cur and (x, z) in cur and (y, z) in cur:
                    sup[(x, y)] += 1
                    sup[(x, z)] += 1
                    sup[(y, z)] += 1
            kept = {e for e in cur if sup[e] >= k - 2}
            if kept == cur:
                return {e: sup[e] for e in cur}
            cur = kept

    def test_matches_python_peeling(self, spark):
        import random

        rng = random.Random(13)
        raw = {(rng.randrange(18), rng.randrange(18)) for _ in range(70)}
        edges = [(a, b) for a, b in raw if a != b]
        # planted K5 guarantees a nonempty 5-truss core
        edges += [(100 + a, 100 + b) for a in range(5) for b in range(5) if a < b]
        df = spark.createDataFrame(edges, "src long, dst long")
        for k in (3, 4, 5):
            got = {(r.a, r.b): r.support for r in C.k_truss(df, k).collect()}
            assert got == self._py_ktruss(edges, k), k
        got5 = {(r.a, r.b) for r in C.k_truss(df, 5).collect()}
        assert all((100 + a, 100 + b) in got5
                   for a in range(5) for b in range(5) if a < b)

    def test_cascade_peeling(self, spark):
        """Two triangles sharing an edge + a pendant triangle chained
        on: 4-truss requires >= 2 triangles per edge, so the whole
        chain unravels in CASCADING rounds, not one pass."""
        edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 4), (2, 4)]
        df = spark.createDataFrame(edges, "src long, dst long")
        assert C.k_truss(df, 4).count() == 0
        # but every edge of the two shared triangles survives k=3
        got3 = {(r.a, r.b) for r in C.k_truss(df, 3).collect()}
        assert got3 == {(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 4), (2, 4)}

    def test_validation_and_empty(self, spark):
        import pytest as _pytest

        df = spark.createDataFrame([(0, 1)], "src long, dst long")
        with _pytest.raises(ValueError, match="k >= 3"):
            C.k_truss(df, 2)
        assert C.k_truss(df, 3).count() == 0  # a lone edge has no triangle


class TestJaccardSimilarity:
    def _ref(self, edges):
        import collections
        import itertools

        adj = collections.defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        out = {}
        nodes = sorted(adj)
        for u, v in itertools.combinations(nodes, 2):
            common = len(adj[u] & adj[v])
            if common == 0:
                continue
            union = len(adj[u]) + len(adj[v]) - common
            jac = (2 * 1_000_000 * common + union) // (2 * union)
            out[(u, v)] = (common, len(adj[u]), len(adj[v]), jac,
                           v in adj[u])
        return out

    def test_matches_python_reference(self, spark):
        import random

        from data_misc_tools_spark.operators.cluster import jaccard_similarity

        rng = random.Random(13)
        edges = {
            tuple(sorted(rng.sample(range(30), 2))) for _ in range(80)
        }
        df = spark.createDataFrame(sorted(edges), "src long, dst long")
        got = {
            (r["node_a"], r["node_b"]): (
                r["n_common"], r["deg_a"], r["deg_b"], r["jac_e6"],
                r["is_edge"],
            )
            for r in jaccard_similarity(df).collect()
        }
        assert got == self._ref(edges)

    def test_perfect_twins_score_1(self, spark):
        """Two non-adjacent nodes with identical neighborhoods ->
        J = 1e6 exactly; an edge inside a triangle scores below."""
        from data_misc_tools_spark.operators.cluster import jaccard_similarity

        # 1 and 2 both connect to {10, 11, 12} and not to each other
        edges = [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (2, 12)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            (r["node_a"], r["node_b"]): r
            for r in jaccard_similarity(df).collect()
        }
        r = got[(1, 2)]
        assert r["jac_e6"] == 1_000_000 and not r["is_edge"]

    def test_max_degree_drops_hub_centers(self, spark):
        from data_misc_tools_spark.operators.cluster import jaccard_similarity

        # star: hub 0 with 5 leaves; leaves pair only THROUGH the hub
        edges = [(0, i) for i in range(1, 6)]
        df = spark.createDataFrame(edges, "src long, dst long")
        assert jaccard_similarity(df).count() == 10  # C(5,2) leaf pairs
        assert jaccard_similarity(df, max_degree=4).count() == 0


class TestDegreeAssortativity:
    def _ref(self, edges):
        import collections
        import math

        adj = collections.defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        xs, ys = [], []
        for a, b in edges:
            xs += [len(adj[a]), len(adj[b])]
            ys += [len(adj[b]), len(adj[a])]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        return (n * sxy - sx * sy) / (
            math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
        )

    def test_matches_python_reference(self, spark):
        import random

        from data_misc_tools_spark.operators.cluster import degree_assortativity

        rng = random.Random(53)
        edges = sorted(
            {tuple(sorted(rng.sample(range(40), 2))) for _ in range(120)}
        )
        df = spark.createDataFrame(edges, "src long, dst long")
        r = degree_assortativity(df).collect()[0]
        assert r["n_rows"] == 2 * len(edges)
        assert abs(r["corr"] - self._ref(edges)) < 1e-12

    def test_star_is_maximally_disassortative(self, spark):
        from data_misc_tools_spark.operators.cluster import degree_assortativity

        edges = [(0, i) for i in range(1, 8)]
        df = spark.createDataFrame(edges, "src long, dst long")
        r = degree_assortativity(df).collect()[0]
        assert r["corr"] == -1.0  # perfect hub-and-spoke


class TestHarmonicCentralityK:
    def test_matches_python_bfs_reference(self, spark):
        from collections import deque

        from data_misc_tools_spark.operators.cluster import (
            harmonic_centrality_k,
        )

        # path 1-2-3-4-5, clique {10,11,12}, bridge 5-10, isolate pair
        edges = [
            (1, 2), (2, 3), (3, 4), (4, 5),
            (10, 11), (10, 12), (11, 12), (5, 10),
            (20, 21),
        ]
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)

        def bfs_reach(root, k):
            dist = {root: 0}
            q = deque([root])
            reach = [0] * (k + 1)
            while q:
                u = q.popleft()
                if dist[u] == k:
                    continue
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = dist[u] + 1
                        reach[dist[w]] += 1
                        q.append(w)
            return reach[1:]

        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r for r in harmonic_centrality_k(df, max_dist=3).collect()}
        assert set(got) == set(adj)
        cd = [(2 * 10**6 + d) // (2 * d) for d in (1, 2, 3)]
        for node in adj:
            r1, r2, r3 = bfs_reach(node, 3)
            r = got[node]
            assert (r.reach_1, r.reach_2, r.reach_3) == (r1, r2, r3), node
            assert r.harmonic_e6 == cd[0] * r1 + cd[1] * r2 + cd[2] * r3

    def test_guard(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.cluster import (
            harmonic_centrality_k,
        )

        df = spark.createDataFrame([(1, 2)], "src long, dst long")
        with _pytest.raises(ValueError, match="max_dist"):
            harmonic_centrality_k(df, max_dist=0)
        with _pytest.raises(ValueError, match="max_dist"):
            harmonic_centrality_k(df, max_dist=7)
