"""Fellegi–Sunter record-linkage weights + scoring."""

import math
import random

import pytest

from data_misc_tools_spark.operators.linkage import (
    fellegi_sunter_weights,
    fs_score_pairs,
)


def _e6ln(x):
    return round(math.log(x) * 1e6)


def _fixture(seed=11, n=300):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        is_m = i % 3 == 0

        def flip(p):
            return rng.random() < p

        rows.append(
            (i, is_m,
             flip(0.95) if is_m else flip(0.3),
             flip(0.9) if is_m else flip(0.1),
             flip(0.8) if is_m else flip(0.5))
        )
    return rows


def _ref_weights(rows):
    nm = sum(1 for r in rows if r[1])
    nu = len(rows) - nm
    out = {}
    for idx, f in [(2, "f1"), (3, "f2"), (4, "f3")]:
        am = sum(1 for r in rows if r[1] and r[idx])
        au = sum(1 for r in rows if not r[1] and r[idx])
        out[f] = {
            "nm": nm, "nu": nu, "am": am, "au": au,
            "wa": _e6ln(am + 1) - _e6ln(nm + 2) - _e6ln(au + 1) + _e6ln(nu + 2),
            "wd": _e6ln(nm - am + 1) - _e6ln(nm + 2)
                  - _e6ln(nu - au + 1) + _e6ln(nu + 2),
        }
    return out


def test_weights_match_python_reference(spark):
    rows = _fixture()
    df = spark.createDataFrame(
        rows, "pair_id long, is_match boolean, f1 boolean, f2 boolean, f3 boolean"
    )
    got = {r.field: r for r in
           fellegi_sunter_weights(df, ["f1", "f2", "f3"], "is_match").collect()}
    ref = _ref_weights(rows)
    for f in ("f1", "f2", "f3"):
        g, e = got[f], ref[f]
        assert (g.n_match, g.n_unmatch) == (e["nm"], e["nu"]), f
        assert (g.n_agree_match, g.n_agree_unmatch) == (e["am"], e["au"]), f
        assert (g.w_agree_e6, g.w_disagree_e6) == (e["wa"], e["wd"]), f


def test_scores_match_python_reference_and_separate_classes(spark):
    rows = _fixture(seed=23)
    df = spark.createDataFrame(
        rows, "pair_id long, is_match boolean, f1 boolean, f2 boolean, f3 boolean"
    )
    out = {r.pair_id: (r.n_agree, r.score_e6)
           for r in fs_score_pairs(df, ["f1", "f2", "f3"], "is_match").collect()}
    ref = _ref_weights(rows)
    for r in rows:
        want = sum(
            ref[f]["wa"] if r[idx] else ref[f]["wd"]
            for idx, f in [(2, "f1"), (3, "f2"), (4, "f3")]
        )
        assert out[r[0]][1] == want, r[0]
        assert out[r[0]][0] == sum(1 for idx in (2, 3, 4) if r[idx])
    nm = sum(1 for r in rows if r[1])
    avg_m = sum(out[r[0]][1] for r in rows if r[1]) / nm
    avg_u = sum(out[r[0]][1] for r in rows if not r[1]) / (len(rows) - nm)
    assert avg_m > avg_u  # informative fields must separate the classes


def test_null_agreement_counts_as_disagreement(spark):
    df = spark.createDataFrame(
        [(0, True, True), (1, True, None), (2, False, False), (3, False, True)],
        "pair_id long, is_match boolean, f1 boolean",
    )
    w = fellegi_sunter_weights(df, ["f1"], "is_match").collect()[0]
    assert (w.n_match, w.n_agree_match) == (2, 1)  # the NULL row did not agree
    s = {r.pair_id: r.n_agree for r in
         fs_score_pairs(df, ["f1"], "is_match").collect()}
    assert s[1] == 0


def test_agreement_on_discriminative_field_raises_score(spark):
    # w_agree > w_disagree whenever m > u — sanity on the sign
    rows = _fixture(seed=5)
    df = spark.createDataFrame(
        rows, "pair_id long, is_match boolean, f1 boolean, f2 boolean, f3 boolean"
    )
    for r in fellegi_sunter_weights(df, ["f1", "f2"], "is_match").collect():
        assert r.w_agree_e6 > 0 > r.w_disagree_e6


def test_validation(spark):
    df = spark.createDataFrame([(0, True)], "pair_id long, is_match boolean")
    with pytest.raises(ValueError, match="agreement"):
        fellegi_sunter_weights(df, [], "is_match")
    with pytest.raises(ValueError, match="agreement"):
        fs_score_pairs(df, [], "is_match")


class TestFsEmWeights:
    def test_em_matches_pairlevel_python_em(self, spark):
        """The pattern-census EM must equal a pair-level reference EM
        exactly (same float ops, same iteration count)."""
        import math

        rows = _fixture(seed=31, n=240)
        df = spark.createDataFrame(
            rows,
            "pair_id long, is_match boolean, f1 boolean, f2 boolean, f3 boolean",
        )
        from data_misc_tools_spark.operators.linkage import fs_em_weights

        wdf, lam = fs_em_weights(df, ["f1", "f2", "f3"], max_iter=15)
        got = {r.field: (r.m, r.u, r.w_agree, r.w_disagree)
               for r in wdf.collect()}

        # reference EM over raw pairs (same clamps, same order of ops
        # per pattern — group pairs by pattern to mirror the census)
        import collections

        cens = collections.Counter(tuple(int(r[i]) for i in (2, 3, 4))
                                   for r in rows)
        m, u, lam_ref = [0.9] * 3, [0.1] * 3, 0.5
        eps, total = 1e-12, len(rows)
        for _ in range(15):
            sm, su, tm = [0.0] * 3, [0.0] * 3, 0.0
            for gamma, n in cens.items():
                pm, pu = lam_ref, 1 - lam_ref
                for i in range(3):
                    pm *= m[i] if gamma[i] else 1 - m[i]
                    pu *= u[i] if gamma[i] else 1 - u[i]
                w = pm / (pm + pu) if pm + pu > 0 else 0.0
                tm += w * n
                for i in range(3):
                    if gamma[i]:
                        sm[i] += w * n
                        su[i] += (1 - w) * n
            lam_ref = min(max(tm / total, eps), 1 - eps)
            tu = total - tm
            for i in range(3):
                m[i] = min(max(sm[i] / tm, eps), 1 - eps)
                u[i] = min(max(su[i] / tu, eps), 1 - eps)
        assert abs(lam - lam_ref) < 1e-12
        for i, f in enumerate(("f1", "f2", "f3")):
            assert abs(got[f][0] - m[i]) < 1e-12, f
            assert abs(got[f][1] - u[i]) < 1e-12, f
            assert abs(got[f][2] - math.log(m[i] / u[i])) < 1e-9

    def test_em_recovers_planted_structure(self, spark):
        """On the planted fixture (matches agree at .95/.9/.8,
        unmatches at .3/.1/.5) EM without labels must land m above u
        on every field and λ near the true 1/3 prevalence."""
        rows = _fixture(seed=7, n=3000)
        df = spark.createDataFrame(
            rows,
            "pair_id long, is_match boolean, f1 boolean, f2 boolean, f3 boolean",
        )
        from data_misc_tools_spark.operators.linkage import fs_em_weights

        wdf, lam = fs_em_weights(df, ["f1", "f2", "f3"], max_iter=40)
        got = {r.field: r for r in wdf.collect()}
        for f in ("f1", "f2", "f3"):
            assert got[f].m > got[f].u, f
            assert got[f].w_agree > 0 > got[f].w_disagree, f
        assert 0.15 < lam < 0.55  # true prevalence 1/3

    def test_field_blowup_guard(self, spark):
        from data_misc_tools_spark.operators.linkage import fs_em_weights

        df = spark.createDataFrame([(True,) * 17], ", ".join(
            f"c{i} boolean" for i in range(17)))
        import pytest as _pytest

        with _pytest.raises(ValueError, match="patterns"):
            fs_em_weights(df, [f"c{i}" for i in range(17)])


class TestJaroWinklerE6:
    def _py_jw_e6(self, s1, s2):
        l1, l2 = len(s1), len(s2)
        if l1 == 0 and l2 == 0:
            return 1_000_000
        if l1 == 0 or l2 == 0:
            return 0
        w = max(max(l1, l2) // 2 - 1, 0)
        matched2 = [False] * l2
        m1 = []
        for i in range(l1):
            for j in range(max(0, i - w), min(l2, i + w + 1)):
                if not matched2[j] and s2[j] == s1[i]:
                    matched2[j] = True
                    m1.append(s1[i])
                    break
        m = len(m1)
        if m == 0:
            return 0
        m2 = [s2[j] for j in range(l2) if matched2[j]]
        t = sum(1 for a, b in zip(m1, m2) if a != b)
        p = 0
        for i in range(min(4, l1, l2)):
            if s1[i] == s2[i]:
                p += 1
            else:
                break
        num = 2 * m * m * l2 + 2 * m * m * l1 + l1 * l2 * (2 * m - t)
        dd = 6 * l1 * l2 * m
        jw_num = 1_000_000 * ((10 - p) * num + p * dd)
        jw_den = 10 * dd
        return (2 * jw_num + jw_den) // (2 * jw_den)

    def test_textbook_values_and_python_reference(self, spark):
        from data_misc_tools_spark.operators.linkage import jaro_winkler_e6

        cases = [
            ("martha", "marhta"), ("dixon", "dicksonx"),
            ("jellyfish", "smellyfish"), ("duane", "dwayne"),
            ("", ""), ("a", ""), ("", "b"), ("abc", "abc"),
            ("Customer#000000001", "Customer#000000010"),
            ("xyz", "abc"), ("ab", "ba"), ("crate", "trace"),
        ]
        df = spark.createDataFrame(cases, "a string, b string")
        got = {(r.a, r.b): r.jw for r in df.select(
            "a", "b", jaro_winkler_e6("a", "b").alias("jw")).collect()}
        for a, b in cases:
            assert got[(a, b)] == self._py_jw_e6(a, b), (a, b)
        # the published values (Winkler 1990 examples)
        assert got[("martha", "marhta")] == 961111   # 0.961111
        assert got[("dixon", "dicksonx")] == 813333  # 0.813333

    def test_random_fuzz_vs_reference(self, spark):
        import random
        import string

        from data_misc_tools_spark.operators.linkage import jaro_winkler_e6

        rng = random.Random(17)
        cases = []
        for _ in range(60):
            a = "".join(rng.choice("abcde") for _ in range(rng.randint(0, 12)))
            b = "".join(rng.choice("abcde") for _ in range(rng.randint(0, 12)))
            cases.append((a, b))
        df = spark.createDataFrame(cases, "a string, b string")
        got = [r.jw for r in df.select(
            jaro_winkler_e6("a", "b", max_len=16).alias("jw")).collect()]
        rows = df.collect()
        for r, jw in zip(rows, got):
            assert jw == self._py_jw_e6(r.a, r.b), (r.a, r.b)

    def test_length_guard_raises(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.linkage import jaro_winkler_e6

        df = spark.createDataFrame([("x" * 70, "y")], "a string, b string")
        with _pytest.raises(Exception, match="max_len"):
            df.select(jaro_winkler_e6("a", "b")).collect()
        with _pytest.raises(ValueError, match="BIGINT"):
            jaro_winkler_e6("a", "b", max_len=63)

    def _py_components(self, s1, s2):
        l1, l2 = len(s1), len(s2)
        w = max(max(l1, l2) // 2 - 1, 0)
        matched2 = [False] * l2
        m1 = []
        for i in range(l1):
            for j in range(max(0, i - w), min(l2, i + w + 1)):
                if not matched2[j] and s2[j] == s1[i]:
                    matched2[j] = True
                    m1.append(s1[i])
                    break
        m = len(m1)
        m2 = [s2[j] for j in range(l2) if matched2[j]]
        t = sum(1 for a, b in zip(m1, m2) if a != b)
        p = 0
        for i in range(min(4, l1, l2)):
            if s1[i] == s2[i]:
                p += 1
            else:
                break
        return m, t, p

    def test_components_match_python_reference(self, spark):
        """The r8 oracle promotion rides the component struct: m/t/p
        must equal the greedy-matching reference exactly, and jw_e6
        must equal the score recomputed FROM those components."""
        from data_misc_tools_spark.operators.linkage import (
            jaro_winkler_components,
        )

        cases = [
            ("martha", "marhta"), ("dixon", "dicksonx"),
            ("jellyfish", "smellyfish"), ("crate", "trace"),
            ("ab", "ba"), ("abc", "abc"), ("xyz", "abc"),
        ]
        df = spark.createDataFrame(cases, "a string, b string")
        got = {
            (r.a, r.b): r
            for r in df.select(
                "a", "b",
                jaro_winkler_components("a", "b").alias("c"),
            ).select("a", "b", "c.m", "c.t", "c.p", "c.jw_e6").collect()
        }
        for a, b in cases:
            m, t, p = self._py_components(a, b)
            r = got[(a, b)]
            assert (r.m, r.t, r.p) == (m, t, p), (a, b)
            assert r.jw_e6 == self._py_jw_e6(a, b), (a, b)
        # martha/marhta: 6 matches, 2 mismatched aligned positions
        # (one transposition), prefix 3 — the textbook decomposition
        assert (got[("martha", "marhta")].m,
                got[("martha", "marhta")].t,
                got[("martha", "marhta")].p) == (6, 2, 3)


class TestGoldenRecord:
    def test_majority_and_tiebreak(self, spark):
        from data_misc_tools_spark.operators.linkage import golden_record

        rows = [
            (1, "red", "x"),
            (1, "red", "y"),
            (1, "blue", "y"),
            (2, "blue", None),   # NULL abstains
            (2, "green", None),  # tie 1-1 -> lexicographically smaller
        ]
        df = spark.createDataFrame(rows, "cid long, color string, tag string")
        got = {
            (r["cluster"], r["attr"]): (r["value"], r["votes"], r["n_obs"])
            for r in golden_record(df, "cid", ["color", "tag"]).collect()
        }
        assert got[(1, "color")] == ("red", 2, 3)
        assert got[(1, "tag")] == ("y", 2, 3)
        assert got[(2, "color")] == ("blue", 1, 2)  # tie -> smaller value
        assert (2, "tag") not in got  # never observed -> no row

    def test_guard(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.linkage import golden_record

        df = spark.createDataFrame([(1, "a")], "cid long, v string")
        with _pytest.raises(ValueError):
            golden_record(df, "cid", [])


class TestMutualBestMatch:
    def test_hub_keeps_only_its_own_best(self, spark):
        from data_misc_tools_spark.operators.linkage import mutual_best_match

        # hub 0 is best-FOR 1, 2 and 3, but keeps only its own best
        # (node 1): a single RBM round is one-shot, NOT iterative
        # stable matching, so 2 (whose best is the hub) stays
        # unmatched here...
        pairs = [
            (0, 1, 90), (0, 2, 80), (0, 3, 70),
            (2, 3, 60),
        ]
        df = spark.createDataFrame(pairs, "a long, b long, score long")
        got = {
            (r["node_a"], r["node_b"]): r["score"]
            for r in mutual_best_match(df, "a", "b", "score").collect()
        }
        assert got == {(0, 1): 90}
        # ...while a pair that mutually prefers EACH OTHER over the
        # hub survives alongside the hub's own match
        pairs2 = [
            (0, 1, 90), (0, 2, 50), (0, 3, 40),
            (2, 3, 60),
        ]
        df2 = spark.createDataFrame(pairs2, "a long, b long, score long")
        got2 = {
            (r["node_a"], r["node_b"]): r["score"]
            for r in mutual_best_match(df2, "a", "b", "score").collect()
        }
        assert got2 == {(0, 1): 90, (2, 3): 60}

    def test_tie_resolves_to_smaller_partner(self, spark):
        from data_misc_tools_spark.operators.linkage import mutual_best_match

        pairs = [(1, 2, 50), (1, 3, 50), (2, 3, 10)]
        df = spark.createDataFrame(pairs, "a long, b long, score long")
        got = {
            (r["node_a"], r["node_b"])
            for r in mutual_best_match(df, "a", "b", "score").collect()
        }
        # 1's best ties between 2 and 3 -> smaller partner 2; 2's best
        # is 1 -> mutual; 3's best is 1 but 1 chose 2 -> 3 unmatched
        assert got == {(1, 2)}

    def test_each_node_at_most_once(self, spark):
        import random

        from data_misc_tools_spark.operators.linkage import mutual_best_match

        rng = random.Random(61)
        pairs = [
            (*sorted(rng.sample(range(25), 2)), rng.randrange(1, 1000))
            for _ in range(150)
        ]
        # dedupe pair keys keeping first
        seen, uniq = set(), []
        for a, b, s in pairs:
            if (a, b) not in seen:
                seen.add((a, b))
                uniq.append((a, b, s))
        df = spark.createDataFrame(uniq, "a long, b long, score long")
        got = mutual_best_match(df, "a", "b", "score").collect()
        nodes = [n for r in got for n in (r["node_a"], r["node_b"])]
        assert len(nodes) == len(set(nodes))


class TestBlockingQuality:
    def test_hand_counts(self, spark):
        from data_misc_tools_spark.operators.linkage import blocking_quality

        cand = spark.createDataFrame(
            [(1, 2), (1, 3), (4, 5), (1, 2)], "doc_a long, doc_b long"
        )  # dup row distincts away -> 3 candidates
        truth = spark.createDataFrame(
            [(1, 2), (4, 5), (6, 7)], "doc_a long, doc_b long"
        )
        r = blocking_quality(cand, truth, n_records=10).collect()[0]
        assert r.n_universe_pairs == 45
        assert (r.n_candidates, r.n_truth, r.n_matched) == (3, 3, 2)
        assert abs(r.reduction_ratio - (1 - 3 / 45)) < 1e-15
        assert abs(r.pairs_completeness - 2 / 3) < 1e-15
        assert abs(r.pairs_quality - 2 / 3) < 1e-15

    def test_empty_denominators_null(self, spark):
        from data_misc_tools_spark.operators.linkage import blocking_quality

        empty = spark.createDataFrame([], "doc_a long, doc_b long")
        r = blocking_quality(empty, empty, n_records=1).collect()[0]
        assert r.n_universe_pairs == 0
        assert r.reduction_ratio is None
        assert r.pairs_completeness is None
        assert r.pairs_quality is None

    def test_guard(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.linkage import blocking_quality

        empty = spark.createDataFrame([], "doc_a long, doc_b long")
        with _pytest.raises(ValueError, match="n_records"):
            blocking_quality(empty, empty, n_records=-1)
