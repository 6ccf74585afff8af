

class TestSpearmanExact:
    def _ref(self, data, xs_scale, ys_scale):
        import collections
        import math

        xs = [round(x * xs_scale) for x, _ in data]
        ys = [round(y * ys_scale) for _, y in data]

        def avg_ranks(vals):
            c = collections.Counter(vals)
            out, before = {}, 0
            for v in sorted(c):
                out[v] = before + (c[v] + 1) / 2
                before += c[v]
            return [out[v] for v in vals]

        rx, ry = avg_ranks(xs), avg_ranks(ys)
        n = len(data)
        sx, sy = sum(rx), sum(ry)
        sxy = sum(a * b for a, b in zip(rx, ry))
        sxx = sum(a * a for a in rx)
        syy = sum(b * b for b in ry)
        dxx, dyy = n * sxx - sx * sx, n * syy - sy * sy
        if dxx == 0 or dyy == 0:
            return None
        return (n * sxy - sx * sy) / math.sqrt(dxx * dyy)

    def test_matches_python_reference_with_ties(self, spark):
        from data_misc_tools_spark.operators.profile import spearman_exact

        import random

        rng = random.Random(5)
        data = [
            (round(rng.uniform(0, 100), 2), round(rng.uniform(0, 100), 2))
            for _ in range(400)
        ]
        # tie-heavy monotone block exercises the tied-average ranks
        data += [(float(i // 3), float((i // 3) ** 2)) for i in range(60)]
        df = spark.createDataFrame(data, "x double, y double")
        r = spearman_exact(df, "x", "y", 100, 100).collect()[0]
        ref = self._ref(data, 100, 100)
        # the rank arithmetic is exact; the only float step is the
        # shared closed form — bitwise agreement expected (the
        # reference multiplies under one sqrt, allow 1 ulp-ish slack)
        assert abs(r.spearman - ref) < 1e-12
        assert r.n_rows == len(data)

    def test_monotone_is_one_outliers_ignored(self, spark):
        from data_misc_tools_spark.operators.profile import spearman_exact

        # y = exp blowup (bounded inside the fixed-point long): Pearson
        # is dominated by the tail, Spearman sees pure monotonicity
        data = [(float(i), float(10 ** (i % 14)) + i) for i in range(50)]
        df = spark.createDataFrame(data, "x double, y double")
        r = spearman_exact(df, "x", "y").collect()[0]
        assert r.spearman is not None and -1 <= r.spearman <= 1
        mono = spark.createDataFrame(
            [(float(i), float(i * i)) for i in range(50)], "x double, y double"
        )
        r2 = spearman_exact(mono, "x", "y").collect()[0]
        assert r2.spearman > 0.999999  # algebraically 1; IEEE sqrt chain

    def test_constant_axis_is_null(self, spark):
        from data_misc_tools_spark.operators.profile import spearman_exact

        df = spark.createDataFrame(
            [(1.0, float(i)) for i in range(5)], "x double, y double"
        )
        assert spearman_exact(df, "x", "y").collect()[0].spearman is None


class TestGiniConcentration:
    def test_matches_python_reference(self, spark):
        from data_misc_tools_spark.operators.profile import gini_concentration

        import random

        rng = random.Random(7)
        vals = [round(rng.expovariate(1 / 50.0), 2) for _ in range(400)]
        vals += [0.0] * 20 + [123.45] * 15  # zero mass + a tie block
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        r = gini_concentration(df, "x", 100).collect()[0]
        xs = sorted(round(v * 100) for v in vals)
        n, sx = len(xs), sum(xs)
        g_ref = (2 * sum((i + 1) * x for i, x in enumerate(xs)) - (n + 1) * sx) / (
            n * sx
        )
        hhi_ref = sum(x * x for x in xs) / (sx * sx)
        assert r.gini == g_ref and r.hhi == hhi_ref
        assert (r.n_rows, r.total) == (n, sx)

    def test_extremes(self, spark):
        from data_misc_tools_spark.operators.profile import gini_concentration

        # perfectly equal -> gini 0, hhi = 1/n
        eq = spark.createDataFrame([(5.0,)] * 10, "x double")
        r = gini_concentration(eq, "x").collect()[0]
        assert r.gini == 0.0 and abs(r.hhi - 0.1) < 1e-15
        # one whale holds everything -> gini (n-1)/n, hhi 1
        wh = spark.createDataFrame([(0.0,)] * 9 + [(100.0,)], "x double")
        r2 = gini_concentration(wh, "x").collect()[0]
        assert r2.gini == 0.9 and r2.hhi == 1.0

    def test_negative_values_raise(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.profile import gini_concentration

        df = spark.createDataFrame([(1.0,), (-2.0,)], "x double")
        with _pytest.raises(Exception, match="negative"):
            gini_concentration(df, "x").collect()

    def test_all_zero_total_is_null(self, spark):
        from data_misc_tools_spark.operators.profile import gini_concentration

        df = spark.createDataFrame([(0.0,)] * 4, "x double")
        r = gini_concentration(df, "x").collect()[0]
        assert r.gini is None and r.hhi is None and r.total == 0


class TestTCloseness:
    def _fixture(self, seed=3, n=600):
        import random

        rng = random.Random(seed)
        rows = []
        for _ in range(n):
            q = rng.choice(["a", "b", "c", "d"])
            # class 'd' is skewed toward high buckets
            v = (rng.choice([0, 1, 2, 3]) if q != "d"
                 else rng.choices([0, 1, 2, 3], [1, 1, 3, 10])[0])
            rows.append((q, v))
        return rows

    def _refs(self, rows):
        import collections

        g = collections.Counter(v for _, v in rows)
        n, vals = len(rows), sorted(g)
        m = len(vals)
        cls = collections.defaultdict(collections.Counter)
        for q, v in rows:
            cls[q][v] += 1
        emd, tvd = {}, {}
        for q, c in cls.items():
            s = sum(c.values())
            num, cumc, cumg = 0, 0, 0
            for v in vals:
                cumc += c.get(v, 0)
                cumg += g[v]
                num += abs(n * cumc - s * cumg)
            den = (m - 1) * s * n
            emd[q] = (s, (2 * 1000000 * num + den) // (2 * den) if den else 0)
            num2 = sum(abs(n * c.get(v, 0) - s * g[v]) for v in vals)
            den2 = 2 * s * n
            tvd[q] = (2 * 1000000 * num2 + den2) // (2 * den2)
        return emd, tvd

    def test_ordered_emd_matches_python_reference(self, spark):
        from data_misc_tools_spark.operators.profile import t_closeness

        rows = self._fixture()
        df = spark.createDataFrame(rows, "q string, v int")
        got = {r.q: (r.class_size, r.t_closeness_e6)
               for r in t_closeness(df, ["q"], "v").collect()}
        emd, _ = self._refs(rows)
        assert got == emd
        # the planted skewed class scores highest
        assert got["d"][1] == max(t for _, t in got.values())

    def test_unordered_tvd_matches_python_reference(self, spark):
        from data_misc_tools_spark.operators.profile import t_closeness

        rows = self._fixture(seed=9)
        df = spark.createDataFrame(rows, "q string, v int")
        got = {r.q: r.t_closeness_e6
               for r in t_closeness(df, ["q"], "v", ordered=False).collect()}
        _, tvd = self._refs(rows)
        assert got == tvd

    def test_absent_values_contribute_their_gap(self, spark):
        """A class missing a value entirely must still pay the
        cumulative gap — the grid is not optional."""
        from data_misc_tools_spark.operators.profile import t_closeness

        rows = [("a", 0)] * 50 + [("b", 1)] * 50
        df = spark.createDataFrame(rows, "q string, v int")
        got = {r.q: r.t_closeness_e6 for r in t_closeness(df, ["q"], "v").collect()}
        # each class holds exactly one of two equal-mass values:
        # |cum gap| at step 1 is n*s/2 -> t = 1/2 exactly
        assert got == {"a": 500000, "b": 500000}

    def test_single_value_attribute_is_zero(self, spark):
        from data_misc_tools_spark.operators.profile import t_closeness

        df = spark.createDataFrame([("a", 7), ("b", 7)], "q string, v int")
        got = {r.q: r.t_closeness_e6 for r in t_closeness(df, ["q"], "v").collect()}
        assert got == {"a": 0, "b": 0}

    def test_cardinality_guard(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.profile import t_closeness

        df = spark.createDataFrame([("a", i) for i in range(30)], "q string, v int")
        with _pytest.raises(ValueError, match="levels"):
            t_closeness(df, ["q"], "v", max_values=10)


class TestCalibrationReport:
    def test_matches_python_reference(self, spark):
        from data_misc_tools_spark.operators.profile import calibration_report

        import random

        rng = random.Random(13)
        rows = []
        for _ in range(500):
            s = rng.randint(0, 1_000_000)
            # planted miscalibration: true rate is score/2
            y = rng.random() < (s / 1e6) / 2
            rows.append((s, y))
        df = spark.createDataFrame(rows, "score_e6 long, y boolean")
        got = {r.bucket: (r.n_rows, r.n_pos, r.mean_score_e6,
                          r.pos_rate_e6, r.gap_e6)
               for r in calibration_report(df, "score_e6", "y").collect()}
        import collections

        agg = collections.defaultdict(lambda: [0, 0, 0])
        for s, y in rows:
            b = min(s * 10 // 1_000_000, 9)
            agg[b][0] += 1
            agg[b][1] += int(y)
            agg[b][2] += s
        for b, (n, pos, ss) in agg.items():
            mean = (2 * ss + n) // (2 * n)
            rate = (2 * 1_000_000 * pos + n) // (2 * n)
            assert got[b] == (n, pos, mean, rate, abs(mean - rate)), b
        # the planted half-rate miscalibration shows in the top bucket
        assert got[9][4] > 300_000

    def test_boundary_bucketing_is_exact(self, spark):
        from data_misc_tools_spark.operators.profile import calibration_report

        df = spark.createDataFrame(
            [(0, False), (99_999, False), (100_000, True), (1_000_000, True)],
            "score_e6 long, y boolean",
        )
        got = {r.bucket: r.n_rows
               for r in calibration_report(df, "score_e6", "y").collect()}
        # 0 and 99999 -> bucket 0; 100000 -> bucket 1; 1e6 clamps to 9
        assert got == {0: 2, 1: 1, 9: 1}

    def test_out_of_range_score_raises(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.profile import calibration_report

        df = spark.createDataFrame([(2_000_000, True)], "score_e6 long, y boolean")
        with _pytest.raises(Exception, match="outside"):
            calibration_report(df, "score_e6", "y").collect()
        with _pytest.raises(ValueError, match="buckets"):
            calibration_report(df, "score_e6", "y", n_buckets=1)


class TestJoinSkewReport:
    def test_exact_cardinality_and_shares(self, spark):
        from data_misc_tools_spark.operators.etl import join_skew_report

        import random

        rng = random.Random(5)
        left = [(rng.choice("abcde"),) for _ in range(300)] + [("hot",)] * 200
        right = [(rng.choice("abcdef"),) for _ in range(250)] + [("hot",)] * 100
        l = spark.createDataFrame(left, "k string")
        r = spark.createDataFrame(right, "k string")
        rows = join_skew_report(l, "k", r, "k", top_k=3).collect()

        import collections

        cl = collections.Counter(k for k, in left)
        cr = collections.Counter(k for k, in right)
        per = {k: cl[k] * cr[k] for k in cl if k in cr}
        total = sum(per.values())
        want_top = sorted(per, key=lambda k: (-per[k], k))[:3]
        assert [x.key for x in rows] == want_top
        for x in rows:
            assert x.pairs == per[x.key]
            assert x.total_pairs == total
            assert x.matched_keys == len(per)
            assert x.share_e6 == (2 * 1_000_000 * per[x.key] + total) // (2 * total)
        # the planted hot key dominates — and equals the REAL join size
        assert rows[0].key == "hot"
        assert total == l.join(r, "k").count()

    def test_disjoint_keys_yield_empty(self, spark):
        from data_misc_tools_spark.operators.etl import join_skew_report

        l = spark.createDataFrame([("a",)], "k string")
        r = spark.createDataFrame([("b",)], "k string")
        assert join_skew_report(l, "k", r, "k").count() == 0


class TestMutualInformation:
    def test_matches_python_reference(self, spark):
        from data_misc_tools_spark.operators.profile import mutual_information

        import collections
        import math
        import random

        rng = random.Random(9)
        rows = []
        for _ in range(800):
            a = rng.choice("wxyz")
            b = a.upper() if rng.random() < 0.7 else rng.choice("WXYZ")
            rows.append((a, b))
        df = spark.createDataFrame(rows, "a string, b string")
        r = mutual_information(df, "a", "b").collect()[0]

        def e6ln(x):
            return round(math.log(x) * 1e6)

        cells = collections.Counter(rows)
        ca = collections.Counter(a for a, _ in rows)
        cb = collections.Counter(b for _, b in rows)
        n = len(rows)
        mi_sum = sum(
            c * (e6ln(c) + e6ln(n) - e6ln(ca[a]) - e6ln(cb[b]))
            for (a, b), c in cells.items()
        )
        assert r.mi_e6 == (2 * max(mi_sum, 0) + n) // (2 * n)
        assert r.h_a_e6 == (
            2 * sum(c * (e6ln(n) - e6ln(c)) for c in ca.values()) + n
        ) // (2 * n)
        assert r.h_b_e6 == (
            2 * sum(c * (e6ln(n) - e6ln(c)) for c in cb.values()) + n
        ) // (2 * n)
        assert (r.n_rows, r.n_cells) == (n, len(cells))
        # e6 nats track the true MI
        true_mi = sum(
            c / n * math.log(c / n * n * n / (ca[a] * cb[b]))
            for (a, b), c in cells.items()
        )
        assert abs(r.mi_e6 / 1e6 - true_mi) < 1e-3

    def test_independent_columns_score_near_zero(self, spark):
        from data_misc_tools_spark.operators.profile import mutual_information

        import random

        rng = random.Random(2)
        df = spark.createDataFrame(
            [(rng.choice("ab"), rng.choice("cd")) for _ in range(2000)],
            "a string, b string",
        )
        r = mutual_information(df, "a", "b").collect()[0]
        assert r.mi_e6 < 2000  # ~0 nats, allowing sampling noise

    def test_determined_column_reaches_entropy(self, spark):
        from data_misc_tools_spark.operators.profile import mutual_information

        # b = f(a): MI == H(B)
        df = spark.createDataFrame(
            [("a", "X")] * 30 + [("b", "Y")] * 20 + [("c", "X")] * 10,
            "a string, b string",
        )
        r = mutual_information(df, "a", "b").collect()[0]
        assert abs(r.mi_e6 - r.h_b_e6) <= 2  # e6 rounding slack


class TestMadOutlierReport:
    def test_matches_python_reference(self, spark):
        from data_misc_tools_spark.operators.profile import mad_outlier_report

        import random

        rng = random.Random(4)
        vals = [round(rng.gauss(100, 10), 2) for _ in range(501)]
        vals += [999.99] * 5 + [-500.0] * 3  # planted extremes
        df = spark.createDataFrame([(x,) for x in vals], "v double")
        r = mad_outlier_report(df, "v", 100, 3000).collect()[0]
        xs = sorted(round(x * 100) for x in vals)
        n = len(xs)
        med = xs[(n + 1) // 2 - 1]
        devs = sorted(abs(x - med) for x in xs)
        mad = devs[(n + 1) // 2 - 1]
        outl = sum(1 for x in xs if 1000 * abs(x - med) > 3000 * mad)
        assert (r.n_rows, r.median_scaled, r.mad_scaled, r.n_outliers) == (
            n, med, mad, outl,
        )
        assert r.n_outliers >= 8  # every planted extreme caught

    def test_outliers_do_not_drag_the_gate(self, spark):
        """The robustness point: adding huge outliers must not move
        median/MAD (mean/stddev would chase them)."""
        from data_misc_tools_spark.operators.profile import mad_outlier_report

        base = [(float(v),) for v in range(1, 102)]
        df1 = spark.createDataFrame(base, "v double")
        df2 = spark.createDataFrame(base + [(1e6,)] * 10, "v double")
        r1 = mad_outlier_report(df1, "v").collect()[0]
        r2 = mad_outlier_report(df2, "v").collect()[0]
        # 10 adversarial rows among 101 move the median by at most 10
        # RANKS (bounded influence); the mean would jump by ~1e5
        assert r1.median_scaled == 5100
        assert abs(r2.median_scaled - r1.median_scaled) <= 1000
        assert abs(r2.mad_scaled - r1.mad_scaled) <= 1000
        assert r2.n_outliers >= 10

    def test_constant_column(self, spark):
        from data_misc_tools_spark.operators.profile import mad_outlier_report

        df = spark.createDataFrame([(5.0,)] * 9, "v double")
        r = mad_outlier_report(df, "v").collect()[0]
        assert (r.median_scaled, r.mad_scaled, r.n_outliers) == (500, 0, 0)


class TestHeapsLawFit:
    def test_matches_python_reference(self, spark):
        import math
        import random

        from data_misc_tools_spark.operators.profile import heaps_law_fit

        rng = random.Random(21)
        vocab = [f"w{i}" for i in range(400)]
        docs = []
        for d in range(40):
            # zipf-ish draws: growing corpora add types sublinearly
            words = [vocab[min(int(rng.paretovariate(1.2)) - 1, 399)]
                     for _ in range(rng.randint(20, 60))]
            docs.append((d, " ".join(words)))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        r = heaps_law_fit(df).collect()[0]

        # reference: cumulative tokens / first-occurrence types in order
        seen, pts, N, V = set(), [], 0, 0
        for d, t in docs:
            ws = t.split()
            N += len(ws)
            for w in ws:
                if w not in seen:
                    seen.add(w)
                    V += 1
            pts.append((round(math.log(N) * 1e6), round(math.log(V) * 1e6)))
        n = len(pts)
        sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts); syy = sum(y * y for _, y in pts)
        beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        assert (r.n_docs, r.n_tokens, r.n_types) == (n, N, V)
        assert r.beta == beta
        assert 0.0 < r.beta < 1.0  # Heaps regime

    def test_closed_vocabulary_flattens(self, spark):
        from data_misc_tools_spark.operators.profile import heaps_law_fit

        # every doc reuses the same 5 words: V saturates instantly
        docs = [(d, "a b c d e " * 10) for d in range(30)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        r = heaps_law_fit(df).collect()[0]
        assert r.n_types == 5
        assert abs(r.beta) < 0.05  # essentially flat

    def test_all_new_tokens_is_linear(self, spark):
        from data_misc_tools_spark.operators.profile import heaps_law_fit

        docs = [(d, " ".join(f"u{d}_{i}" for i in range(10))) for d in range(30)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        r = heaps_law_fit(df).collect()[0]
        assert r.n_types == r.n_tokens == 300
        assert abs(r.beta - 1.0) < 1e-9  # V == N exactly -> slope 1


class TestAbPowerMde:
    def test_matches_python_reference(self, spark):
        import math
        import random

        import pyspark.sql.functions as F

        from data_misc_tools_spark.operators.profile import ab_power_mde

        rng = random.Random(3)
        rows = [(True, round(rng.gauss(100, 15), 2)) for _ in range(400)]
        rows += [(False, round(rng.gauss(98, 14), 2)) for _ in range(350)]
        df = spark.createDataFrame(rows, "v boolean, x double")
        r = ab_power_mde(df, F.col("v"), "x", 100).collect()[0]
        xa = [round(x * 100) for v, x in rows if v]
        xb = [round(x * 100) for v, x in rows if not v]
        na, nb = len(xa), len(xb)
        sa, sb = sum(xa), sum(xb)
        qa = sum(x * x for x in xa)
        qb = sum(x * x for x in xb)
        z = (1_959_964 + 841_621) / 1e6
        mean_b = sb / nb
        sd = math.sqrt(((na * qa - sa * sa) / na + (nb * qb - sb * sb) / nb)
                       / (na + nb - 2))
        mde = z * math.sqrt(
            (na * qa - sa * sa) / (na * (na - 1) * na)
            + (nb * qb - sb * sb) / (nb * (nb - 1) * nb)
        )
        assert (r.n_a, r.n_b) == (na, nb)
        assert r.mean_a == sa / na and r.mean_b == mean_b
        assert abs(r.sd_pooled - sd) < 1e-9
        assert abs(r.mde_abs - mde) < 1e-9
        assert r.n_per_arm_5pct == math.ceil(
            z * z * 2 * sd * sd / (0.05 * mean_b * 0.05 * mean_b)
        )

    def test_mde_shrinks_with_sample_size(self, spark):
        import pyspark.sql.functions as F

        from data_misc_tools_spark.operators.profile import ab_power_mde

        import random

        rng = random.Random(9)

        def mk(n):
            rows = [(i % 2 == 0, round(rng.gauss(50, 5), 2))
                    for i in range(n)]
            return spark.createDataFrame(rows, "v boolean, x double")

        small = ab_power_mde(mk(100), F.col("v"), "x").collect()[0]
        big = ab_power_mde(mk(2000), F.col("v"), "x").collect()[0]
        assert big.mde_abs < small.mde_abs / 3  # ~ 1/sqrt(20)

    def test_degenerate_groups_are_null(self, spark):
        import pyspark.sql.functions as F

        from data_misc_tools_spark.operators.profile import ab_power_mde

        df = spark.createDataFrame(
            [(True, 1.0), (False, 2.0)], "v boolean, x double"
        )
        r = ab_power_mde(df, F.col("v"), "x").collect()[0]
        assert r.sd_pooled is None and r.mde_abs is None
        assert r.n_per_arm_5pct is None


class TestUniqueColumnCombinations:
    def test_matches_python_reference(self, spark):
        import collections

        from data_misc_tools_spark.operators.profile import (
            unique_column_combinations,
        )

        rows = [
            (1, "a", None),
            (1, "a", None),   # exact dup of row 0 on all cols
            (1, "b", 10),
            (2, "a", 10),
            (2, "b", None),
            (2, "b", 20),
            (None, "a", 10),  # NULL groups as a value
            (None, "a", 10),
        ]
        df = spark.createDataFrame(rows, "x int, y string, z int")
        combos = [("x",), ("y",), ("x", "y"), ("x", "y", "z")]
        got = {
            r["cols"]: r.asDict()
            for r in unique_column_combinations(df, combos).collect()
        }
        for combo in combos:
            label = "+".join(combo)
            idx = [{"x": 0, "y": 1, "z": 2}[c] for c in combo]
            census = collections.Counter(
                tuple(row[i] for i in idx) for row in rows
            )
            r = got[label]
            assert r["n_rows"] == len(rows)
            assert r["n_groups"] == len(census)
            assert r["max_group_size"] == max(census.values())
            assert r["n_extra_rows"] == sum(c - 1 for c in census.values())
            assert r["is_unique"] == (len(census) == len(rows))
        assert not got["x+y"]["is_unique"]
        assert not got["x+y+z"]["is_unique"]  # rows 0/1 dup, rows 6/7 dup

    def test_unique_combo_flagged(self, spark):
        from data_misc_tools_spark.operators.profile import (
            unique_column_combinations,
        )

        df = spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "a")], "x int, y string"
        )
        got = {
            r["cols"]: r["is_unique"]
            for r in unique_column_combinations(df, [("x",), ("x", "y")]).collect()
        }
        assert got == {"x": False, "x+y": True}

    def test_bad_input_raises(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.profile import (
            unique_column_combinations,
        )

        df = spark.createDataFrame([(1,)], "x int")
        with _pytest.raises(ValueError):
            unique_column_combinations(df, [])
        with _pytest.raises(ValueError):
            unique_column_combinations(df, [("x",), ("x",)])


class TestExpectationsReport:
    def test_all_check_kinds(self, spark):
        from data_misc_tools_spark.operators.profile import expectations_report

        df = spark.createDataFrame(
            [
                (1, "A-1", 10.0, "red"),
                (2, "B-2", -5.0, "blue"),
                (3, None, 20.0, "red"),
                (3, "C-3", 30.0, "green"),
            ],
            "id int, code string, v double, color string",
        )
        rep = expectations_report(
            df,
            [
                {"check": "not_null", "column": "code"},
                {"check": "distinct", "column": "id"},
                {"check": "in_set", "column": "color",
                 "values": ["red", "blue"]},
                {"check": "matches", "column": "code", "pattern": "^[A-Z]-"},
                {"check": "min_ge", "column": "v", "value": 0},
                {"check": "max_le", "column": "v", "value": 25},
                {"check": "satisfies", "column": "big_v",
                 "expr": "v > 15", "min_rate_e6": 400_000},
            ],
        ).collect()
        by_id = {r["check_id"]: r for r in rep}
        assert [r["check_id"] for r in rep] == list(range(7))
        # not_null: 3/4
        assert by_id[0]["n_satisfied"] == 3 and not by_id[0]["passed"]
        assert by_id[0]["rate_e6"] == 750_000
        # distinct: 3 distinct ids of 4 rows
        assert by_id[1]["n_satisfied"] == 3 and not by_id[1]["passed"]
        # in_set: 3/4 (green out)
        assert by_id[2]["n_satisfied"] == 3
        # matches: NULL does not match -> 3/4
        assert by_id[3]["n_satisfied"] == 3
        # min_ge 0: -5 fails -> 3/4
        assert by_id[4]["n_satisfied"] == 3
        # max_le 25: 30 fails -> 3/4
        assert by_id[5]["n_satisfied"] == 3
        # satisfies v>15: 2/4 = 500000 >= 400000 -> passes
        assert by_id[6]["n_satisfied"] == 2 and by_id[6]["passed"]
        assert by_id[6]["rate_e6"] == 500_000

    def test_half_up_rate(self, spark):
        from data_misc_tools_spark.operators.profile import expectations_report

        # 1/8 = 0.125 -> 125000 exactly; 1/3 -> 333333 (truncates the
        # repeating third); 1/16 = 62500 exact boundary check
        df = spark.createDataFrame([(i,) for i in range(8)], "x int")
        r = expectations_report(
            df, [{"check": "satisfies", "column": "x", "expr": "x = 0"}]
        ).collect()[0]
        assert r["rate_e6"] == 125_000

    def test_empty_table_vacuous_pass(self, spark):
        from data_misc_tools_spark.operators.profile import expectations_report

        df = spark.createDataFrame([], "x int")
        r = expectations_report(
            df, [{"check": "not_null", "column": "x"}]
        ).collect()[0]
        assert r["n_rows"] == 0 and r["rate_e6"] == 1_000_000 and r["passed"]

    def test_unknown_kind_raises(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.profile import expectations_report

        df = spark.createDataFrame([(1,)], "x int")
        with _pytest.raises(ValueError):
            expectations_report(df, [{"check": "bogus", "column": "x"}])
        with _pytest.raises(ValueError):
            expectations_report(df, [])


class TestNelsonAalen:
    def _ref(self, spells):
        """Python integer reference: H via half-up e6 terms."""
        import collections

        per = collections.Counter()
        ev = collections.Counter()
        for d, e in spells:
            per[d] += 1
            ev[d] += e
        out = {}
        cum = 0
        n_after = sum(per.values())
        for d in sorted(per):
            n_risk = n_after
            n_after -= per[d]
            term = (2 * 1_000_000 * ev[d] + n_risk) // (2 * n_risk)
            cum += term
            out[d] = (n_risk, ev[d], per[d] - ev[d], cum)
        return out

    def test_matches_python_reference(self, spark):
        import random

        from data_misc_tools_spark.operators.profile import nelson_aalen

        rng = random.Random(7)
        spells = [
            (rng.randrange(1, 20), rng.randrange(2)) for _ in range(400)
        ]
        df = spark.createDataFrame(spells, "duration int, event int")
        ref = self._ref(spells)
        got = nelson_aalen(df).collect()
        assert len(got) == len(ref)
        for r in got:
            n_risk, n_event, n_cens, cum = ref[r["duration"]]
            assert r["n_risk"] == n_risk
            assert r["n_event"] == n_event
            assert r["n_censored"] == n_cens
            assert r["cumhaz_e6"] == cum

    def test_exp_neg_h_tracks_km(self, spark):
        """exp(-H_NA) approximates the KM curve (and is >= it)."""
        import math
        import random

        from data_misc_tools_spark.operators.profile import (
            kaplan_meier,
            nelson_aalen,
        )

        rng = random.Random(11)
        spells = [
            (rng.randrange(1, 30), rng.randrange(2)) for _ in range(600)
        ]
        df = spark.createDataFrame(spells, "duration int, event int")
        km = {r["duration"]: r["log_surv_e6"] for r in kaplan_meier(df).collect()}
        na = {r["duration"]: r["cumhaz_e6"] for r in nelson_aalen(df).collect()}
        for d, h in na.items():
            if km[d] is None:
                continue
            s_km = math.exp(km[d] / 1e6)
            s_na = math.exp(-h / 1e6)
            assert s_na >= s_km - 1e-9
            assert abs(s_na - s_km) < 0.05

    def test_absorbing_time_stays_finite(self, spark):
        from data_misc_tools_spark.operators.profile import nelson_aalen

        # every spell dies at t=5: d=n there, H jumps by exactly 1e6
        df = spark.createDataFrame(
            [(5, 1), (5, 1), (5, 1)], "duration int, event int"
        )
        r = nelson_aalen(df).collect()[0]
        assert r["cumhaz_e6"] == 1_000_000 and r["n_risk"] == 3


class TestKmvDistinct:
    def _hash(self, x):
        import hashlib

        return int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16)

    def test_small_group_is_exact(self, spark):
        from data_misc_tools_spark.operators.profile import kmv_distinct

        rows = [("g", i % 10) for i in range(100)]
        df = spark.createDataFrame(rows, "g string, k long")
        r = kmv_distinct(df, "k", ["g"], k=64).collect()[0]
        assert r["is_exact"] and r["estimate"] == 10 and r["n_kept"] == 10

    def test_estimate_matches_formula_and_is_close(self, spark):
        from data_misc_tools_spark.operators.profile import kmv_distinct

        n, k = 5000, 64
        df = spark.createDataFrame([("g", i) for i in range(n)], "g string, k long")
        r = kmv_distinct(df, "k", ["g"], k=k).collect()[0]
        vk = sorted(self._hash(i) for i in range(n))[k - 1]
        assert r["kth_hash"] == vk
        assert r["estimate"] == (2 * (k - 1) * (1 << 32) + vk) // (2 * vk)
        assert abs(r["estimate"] - n) / n < 0.35  # ~3 sigma at k=64

    def test_merge_equals_recompute(self, spark):
        """Bottom-k of a union == bottom-k over the unioned bottom-k
        sketches — the KMV merge property."""
        from data_misc_tools_spark.operators.profile import kmv_distinct

        k = 16
        a = [("a", i) for i in range(300)]
        b = [("b", i + 150) for i in range(300)]  # overlapping ranges
        df = spark.createDataFrame(a + b, "g string, k long")
        merged_direct = kmv_distinct(
            df.selectExpr("'m' as g", "k"), "k", ["g"], k=k
        ).collect()[0]
        # merge path: union the two per-group sketches' kept hashes
        hashes_a = sorted({self._hash(i) for _, i in a})[:k]
        hashes_b = sorted({self._hash(i) for _, i in b})[:k]
        merged_hashes = sorted(set(hashes_a) | set(hashes_b))[:k]
        assert merged_direct["kth_hash"] == merged_hashes[-1]

    def test_guard(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.profile import kmv_distinct

        df = spark.createDataFrame([("g", 1)], "g string, k long")
        with _pytest.raises(ValueError):
            kmv_distinct(df, "k", ["g"], k=1)


class TestConformalReport:
    def _hash_role(self, id_, salt="conf"):
        import hashlib

        return int(
            hashlib.md5((salt + str(id_)).encode()).hexdigest()[:8], 16
        ) % 4

    def test_matches_python_reference(self, spark):
        import random

        from data_misc_tools_spark.operators.profile import conformal_report

        rng = random.Random(21)
        rows = [
            (i, "g" + str(i % 2), round(rng.uniform(0, 100), 2))
            for i in range(2000)
        ]
        df = spark.createDataFrame(rows, "id long, g string, v double")
        got = {
            r["group"]: r
            for r in conformal_report(df, "g", "v", "id").collect()
        }
        for g in ("g0", "g1"):
            grp = [(i, round(v * 100)) for i, gg, v in rows if gg == g]
            train = [x for i, x in grp if self._hash_role(i) <= 1]
            calib = [x for i, x in grp if self._hash_role(i) == 2]
            test = [x for i, x in grp if self._hash_role(i) == 3]
            pred = (2 * sum(train) + len(train)) // (2 * len(train))
            res = sorted(abs(x - pred) for x in calib)
            j = ((len(calib) + 1) * 900 + 999) // 1000
            qhat = res[j - 1] if j <= len(res) else None
            r = got[g]
            assert r["n_train"] == len(train)
            assert r["n_calib"] == len(calib)
            assert r["n_test"] == len(test)
            assert r["pred_cents"] == pred
            assert r["qhat"] == qhat
            cov = sum(1 for x in test if abs(x - pred) <= qhat)
            assert r["covered_e6"] == (
                2 * 1_000_000 * cov + len(test)
            ) // (2 * len(test))
            # the conformal guarantee: coverage ~ 90% on iid data
            assert 820_000 < r["covered_e6"] < 980_000

    def test_tiny_calibration_yields_null(self, spark):
        """n_calib too small for the 90% order statistic -> qhat NULL
        (conformal's +infinity), coverage NULL."""
        from data_misc_tools_spark.operators.profile import conformal_report

        # ids chosen so every role appears but calib has ~2 rows:
        # with n_calib=2, j = ceil(3*0.9) = 3 > 2 -> NULL
        rows = []
        n_calib = 0
        i = 0
        while True:
            role = self._hash_role(i)
            if role == 2:
                if n_calib >= 2:
                    i += 1
                    continue
                n_calib += 1
            rows.append((i, "g", 10.0))
            i += 1
            if len(rows) >= 40 and n_calib == 2:
                break
        df = spark.createDataFrame(rows, "id long, g string, v double")
        r = conformal_report(df, "g", "v", "id").collect()[0]
        assert r["n_calib"] == 2
        assert r["qhat"] is None and r["covered_e6"] is None

    def test_alpha_guard(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.profile import conformal_report

        df = spark.createDataFrame([(1, "g", 1.0)], "id long, g string, v double")
        with _pytest.raises(ValueError):
            conformal_report(df, "g", "v", "id", alpha_permille=0)
        with _pytest.raises(ValueError):
            conformal_report(df, "g", "v", "id", alpha_permille=1000)

    def test_thin_group_still_emits_row(self, spark):
        """ADVICE r7: a group whose calibration (or test) role slice is
        EMPTY must still emit its one row with NULL qhat/covered_e6 —
        not vanish through an inner join."""
        from data_misc_tools_spark.operators.profile import conformal_report

        # build a group whose every id lands in roles {0,1} only: ids
        # screened driver-side with the same md5 role hash
        train_only = [i for i in range(4000) if self._hash_role(i) <= 1][:30]
        rows = [(i, "thin", 10.0) for i in train_only]
        # plus one healthy group with all roles present
        rows += [(10_000 + i, "full", float(i % 50)) for i in range(400)]
        df = spark.createDataFrame(rows, "id long, g string, v double")
        got = {r["group"]: r for r in conformal_report(df, "g", "v", "id").collect()}
        assert set(got) == {"thin", "full"}
        t = got["thin"]
        assert t["n_train"] == 30
        assert t["n_calib"] is None and t["qhat"] is None
        assert t["n_test"] is None and t["covered_e6"] is None
        assert got["full"]["qhat"] is not None


class TestOls2Exact:
    def test_recovers_planted_coefficients(self, spark):
        import random

        from data_misc_tools_spark.operators.profile import ols2_exact

        rng = random.Random(31)
        rows = [
            (
                round(3.0 + 2.0 * x1 - 0.5 * x2 + rng.gauss(0, 0.01), 2),
                round(x1, 2),
                round(x2, 2),
            )
            for x1, x2 in (
                (rng.uniform(0, 10), rng.uniform(0, 10)) for _ in range(3000)
            )
        ]
        df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
        r = ols2_exact(df, "y", "x1", "x2").collect()[0]
        # scaled units: all three columns scaled by 100, so beta1/2
        # are unitless (cents per cent) and beta0 is in cents
        assert abs(r.beta1 - 2.0) < 0.01
        assert abs(r.beta2 - (-0.5)) < 0.01
        assert abs(r.beta0 - 300.0) < 2.0
        assert r.r2 > 0.99

    def test_matches_numpy_lstsq(self, spark):
        import random

        import numpy as np

        from data_misc_tools_spark.operators.profile import ols2_exact

        rng = random.Random(41)
        rows = [
            (round(rng.uniform(0, 50), 2), round(rng.uniform(0, 9), 2),
             round(rng.uniform(0, 5), 2))
            for _ in range(500)
        ]
        df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
        r = ols2_exact(df, "y", "x1", "x2").collect()[0]
        ys = np.array([round(y * 100) for y, _, _ in rows], dtype=float)
        x1 = np.array([round(a * 100) for _, a, _ in rows], dtype=float)
        x2 = np.array([round(b * 100) for _, _, b in rows], dtype=float)
        X = np.column_stack([np.ones_like(x1), x1, x2])
        beta, *_ = np.linalg.lstsq(X, ys, rcond=None)
        assert abs(r.beta0 - beta[0]) < 1e-6 * max(1, abs(beta[0]))
        assert abs(r.beta1 - beta[1]) < 1e-9
        assert abs(r.beta2 - beta[2]) < 1e-9

    def test_collinear_features_null(self, spark):
        from data_misc_tools_spark.operators.profile import ols2_exact

        rows = [(float(i), float(i), 2.0 * i) for i in range(100)]
        df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
        r = ols2_exact(df, "y", "x1", "x2").collect()[0]
        assert r.beta1 is None and r.beta2 is None

    def test_constant_y_r2_null(self, spark):
        import random

        from data_misc_tools_spark.operators.profile import ols2_exact

        rng = random.Random(5)
        rows = [(7.0, rng.uniform(0, 1), rng.uniform(0, 1)) for _ in range(50)]
        df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
        r = ols2_exact(df, "y", "x1", "x2").collect()[0]
        assert r.r2 is None


class TestPsiReport:
    def _ref(self, ref_vals, cur_vals, n_bins=10):
        import math

        n = len(ref_vals)
        sr = sorted(ref_vals)
        edges = sorted(
            {sr[((j * n + n_bins - 1) // n_bins) - 1] for j in range(1, n_bins)}
        )
        b = len(edges) + 1

        def bin_of(x):
            return sum(1 for e in edges if x > e)

        import collections

        rn = collections.Counter(bin_of(x) for x in ref_vals)
        cn = collections.Counter(bin_of(x) for x in cur_vals)
        nr, nc = len(ref_vals), len(cur_vals)
        out = {}
        for bi in sorted(set(rn) | set(cn)):
            r, c = rn.get(bi, 0), cn.get(bi, 0)
            a_num = (r + 1) * (nc + b)
            b_num = (c + 1) * (nr + b)
            d = a_num - b_num
            l = round(math.log(a_num) * 1e6) - round(math.log(b_num) * 1e6)
            den = (nr + b) * (nc + b)
            out[bi] = (
                r, c,
                (2 * 1_000_000 * r + nr) // (2 * nr),
                (2 * 1_000_000 * c + nc) // (2 * nc),
                (2 * d * l + den) // (2 * den),
            )
        return out

    def test_matches_python_reference(self, spark):
        import random

        from data_misc_tools_spark.operators.profile import psi_report

        rng = random.Random(7)
        ref = [rng.randrange(0, 500) for _ in range(3000)]
        cur = [rng.randrange(100, 700) for _ in range(2500)]  # shifted
        rdf = spark.createDataFrame([(v,) for v in ref], "x long")
        cdf = spark.createDataFrame([(v,) for v in cur], "x long")
        got = {
            r["bin"]: (
                r["ref_n"], r["cur_n"], r["ref_share_e6"],
                r["cur_share_e6"], r["term_e6"],
            )
            for r in psi_report(rdf, cdf, "x").collect()
        }
        assert got == self._ref(ref, cur)
        # a clearly shifted distribution must read as drifted
        assert sum(v[4] for v in got.values()) > 250_000

    def test_identical_slices_read_stable(self, spark):
        import random

        from data_misc_tools_spark.operators.profile import psi_report

        rng = random.Random(9)
        vals = [rng.randrange(0, 300) for _ in range(2000)]
        df = spark.createDataFrame([(v,) for v in vals], "x long")
        got = psi_report(df, df, "x").collect()
        psi = sum(r["term_e6"] for r in got)
        assert psi < 1_000  # ~0 on identical data
        assert all(r["term_e6"] >= 0 for r in got)

    def test_guard(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.profile import psi_report

        df = spark.createDataFrame([(1,)], "x long")
        with _pytest.raises(ValueError):
            psi_report(df, df, "x", n_bins=1)
        empty = spark.createDataFrame([], "x long")
        with _pytest.raises(ValueError):
            psi_report(empty, df, "x")


class TestDidReport:
    def test_recovers_planted_effect(self, spark):
        import random

        from data_misc_tools_spark.operators.profile import did_report

        rng = random.Random(3)
        rows = []
        for _ in range(4000):
            t = rng.random() < 0.5
            p = rng.random() < 0.5
            base = 50.0 if not t else 60.0       # group level difference
            trend = 5.0 if p else 0.0            # shared time trend
            effect = 7.0 if (t and p) else 0.0   # the causal effect
            rows.append((t, p, round(base + trend + effect
                                     + rng.gauss(0, 0.5), 2)))
        df = spark.createDataFrame(rows, "t boolean, p boolean, v double")
        r = did_report(df, "t", "p", "v").collect()[0]
        assert abs(r.did / 100.0 - 7.0) < 0.2  # cents scale
        assert r.n_c_pre > 0 and r.n_t_post > 0

    def test_matches_python_means(self, spark):
        import random

        from data_misc_tools_spark.operators.profile import did_report

        rng = random.Random(11)
        rows = [
            (rng.random() < 0.5, rng.random() < 0.5,
             round(rng.uniform(0, 10), 2))
            for _ in range(500)
        ]
        df = spark.createDataFrame(rows, "t boolean, p boolean, v double")
        r = did_report(df, "t", "p", "v").collect()[0]
        import collections

        sums = collections.Counter()
        ns = collections.Counter()
        for t, p, v in rows:
            k = ("t" if t else "c") + ("_post" if p else "_pre")
            sums[k] += round(v * 100)
            ns[k] += 1
        m = {k: sums[k] / ns[k] for k in ns}
        assert r.m_c_pre == m["c_pre"]
        assert r.m_t_post == m["t_post"]
        assert r.did == (m["t_post"] - m["t_pre"]) - (m["c_post"] - m["c_pre"])

    def test_empty_cell_is_null(self, spark):
        from data_misc_tools_spark.operators.profile import did_report

        rows = [(False, False, 1.0), (False, True, 2.0), (True, True, 3.0)]
        df = spark.createDataFrame(rows, "t boolean, p boolean, v double")
        r = did_report(df, "t", "p", "v").collect()[0]
        assert r.m_t_pre is None and r.did is None


class TestBrownForsythe:
    def test_matches_python_reference_and_detects_spread(self, spark):
        import random
        from fractions import Fraction

        from data_misc_tools_spark.operators.profile import brown_forsythe

        rng = random.Random(53)
        rows = []
        for g, spread in (("a", 3.0), ("b", 3.0), ("c", 30.0)):
            rows += [
                (g, round(10.0 + rng.uniform(-spread, spread), 2))
                for _ in range(400)
            ]
        df = spark.createDataFrame(rows, "g string, v double")
        got = {r["group"]: r for r in brown_forsythe(df, "g", "v").collect()}

        by = {}
        for g, v in rows:
            by.setdefault(g, []).append(round(v * 100))
        B = 0
        S_tot = Q_tot = N = 0
        for g, xs in by.items():
            xs_sorted = sorted(xs)
            med = xs_sorted[(len(xs) + 1) // 2 - 1]
            assert got[g]["median_scaled"] == med
            z = [abs(x - med) for x in xs]
            s, q, n = sum(z), sum(x * x for x in z), len(z)
            bt = (2 * 10**6 * s * s + n) // (2 * n)
            assert got[g]["b_term_e6"] == bt
            B += bt
            S_tot += s
            Q_tot += q
            N += n
        k = len(by)
        grand = (2 * 10**6 * S_tot * S_tot + N) // (2 * N)
        f = ((N - k) * (B - grand)) / ((k - 1) * (10**6 * Q_tot - B))
        assert got["a"]["f_stat"] == f  # bit-exact pinned chain
        assert f > 10  # the planted 10x-spread group is detected

    def test_equal_spreads_near_one_and_degenerate_null(self, spark):
        import random

        from data_misc_tools_spark.operators.profile import brown_forsythe

        rng = random.Random(9)
        rows = [
            (g, round(rng.uniform(0, 10), 2))
            for g in ("a", "b", "c")
            for _ in range(600)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        f = brown_forsythe(df, "g", "v").collect()[0]["f_stat"]
        assert f is not None and 0 <= f < 4  # no spread difference planted
        # zero within-group spread -> NULL, not a huge negative F
        dfx = spark.createDataFrame(
            [("a", 1.0), ("a", 1.0), ("b", 5.0), ("b", 5.0)],
            "g string, v double",
        )
        assert brown_forsythe(dfx, "g", "v").collect()[0]["f_stat"] is None
        # single group -> k < 2 -> NULL
        one = spark.createDataFrame(
            [("a", 1.0), ("a", 3.0)], "g string, v double"
        )
        assert brown_forsythe(one, "g", "v").collect()[0]["f_stat"] is None

    def test_zero_between_spread_clamps_to_zero(self, spark):
        """ADVICE r8: with identical deviation multisets per group the
        between-group numerator B - grand can be epsilon-negative
        (half-up terms overshoot by <= k/2 micro-units) — the clamp
        must emit F >= 0, never a tiny negative F."""
        from data_misc_tools_spark.operators.profile import brown_forsythe

        # group a and b have the SAME |x - median| multiset {0, 200}
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", 7.0)],
            "g string, v double",
        )
        f = brown_forsythe(df, "g", "v").collect()[0]["f_stat"]
        assert f == 0.0
        # and on any random grouping F never exits the [0, inf) range
        import random

        rng = random.Random(4)
        rows = [
            (g, round(rng.uniform(0, 10), 2))
            for g in ("a", "b", "c", "d", "e")
            for _ in range(7)
        ]
        df2 = spark.createDataFrame(rows, "g string, v double")
        for r in brown_forsythe(df2, "g", "v").collect():
            assert r["f_stat"] is None or r["f_stat"] >= 0.0


class TestKruskalWallis:
    def test_matches_python_reference_and_scipy_formula(self, spark):
        import random
        from fractions import Fraction

        from data_misc_tools_spark.operators.profile import kruskal_wallis

        rng = random.Random(41)
        rows = []
        for g, shift in (("a", 0.0), ("b", 2.0), ("c", 8.0)):
            rows += [
                (g, round(rng.uniform(0, 20) + shift, 2)) for _ in range(400)
            ]
        df = spark.createDataFrame(rows, "g string, v double")
        got = {r["group"]: r for r in kruskal_wallis(df, "g", "v").collect()}

        # exact python reference with Fractions
        vals = sorted({round(v * 100) for _, v in rows})
        pooled = {x: sum(1 for _, v in rows if round(v * 100) == x)
                  for x in vals}
        cum = 0
        start = {}
        for x in vals:
            start[x] = cum
            cum += pooled[x]
        N = len(rows)
        T = sum(c**3 - c for c in pooled.values())
        hsum = Fraction(0)
        for g in ("a", "b", "c"):
            xs = [round(v * 100) for gg, v in rows if gg == g]
            r2 = sum(2 * start[x] + pooled[x] + 1 for x in xs)
            n_g = len(xs)
            assert got[g]["n_g"] == n_g and got[g]["r2_g"] == r2
            h_term = Fraction(3 * r2 * r2, N * (N + 1) * n_g)
            e6 = (2 * 10**6 * h_term.numerator + h_term.denominator) // (
                2 * h_term.denominator
            )
            assert got[g]["h_term_e6"] == e6
        h_num = sum(got[g]["h_term_e6"] for g in ("a", "b", "c")) - 3 * (
            N + 1
        ) * 10**6
        n3n = N**3 - N
        corr = (2 * h_num * n3n + (n3n - T)) // (2 * (n3n - T))
        any_row = got["a"]
        assert any_row["h_e6"] == h_num
        assert any_row["h_corr_e6"] == corr
        # the planted shift is large: H far above the chi2(2) critical
        assert any_row["h_corr_e6"] > 50 * 10**6

    def test_all_tied_yields_null(self, spark):
        from data_misc_tools_spark.operators.profile import kruskal_wallis

        df = spark.createDataFrame(
            [("a", 5.0), ("a", 5.0), ("b", 5.0)], "g string, v double"
        )
        for r in kruskal_wallis(df, "g", "v").collect():
            assert r["h_e6"] is None and r["h_corr_e6"] is None


class TestCochranArmitage:
    def _py(self, rows):
        import math

        per = {}
        for w, s in rows:
            d = per.setdefault(w, [0, 0])
            d[0] += 1
            d[1] += s
        N = sum(n for n, _ in per.values())
        R = sum(r for _, r in per.values())
        swr = sum(w * r for w, (_, r) in per.items())
        swn = sum(w * n for w, (n, _) in per.items())
        sw2n = sum(w * w * n for w, (n, _) in per.items())
        num = N * swr - R * swn
        var = R * (N - R) * (N * sw2n - swn * swn)
        z = None if var <= 0 else num / math.sqrt(var / N)
        return num, z

    def test_matches_python_reference(self, spark):
        import random

        from data_misc_tools_spark.operators.profile import cochran_armitage

        rng = random.Random(31)
        rows = [
            (w, 1 if rng.random() < 0.1 + 0.15 * w else 0)
            for w in (1, 2, 3, 4)
            for _ in range(500)
        ]
        df = spark.createDataFrame(rows, "w long, s long")
        r = cochran_armitage(df, "w", "s").collect()[0]
        num, z = self._py(rows)
        assert r["num"] == num
        assert r["z"] == z  # bit-exact: same pinned IEEE chain
        assert r["z"] > 5  # the planted monotone trend is detected
        assert r["k_levels"] == 4

    def test_flat_rates_near_zero_and_degenerate_null(self, spark):
        import random

        from data_misc_tools_spark.operators.profile import cochran_armitage

        rng = random.Random(7)
        rows = [
            (w, 1 if rng.random() < 0.3 else 0)
            for w in (1, 2, 3)
            for _ in range(800)
        ]
        df = spark.createDataFrame(rows, "w long, s long")
        r = cochran_armitage(df, "w", "s").collect()[0]
        assert abs(r["z"]) < 2.5  # no trend planted
        # all-success: variance factor R(N-R) = 0 -> NULL
        allsucc = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1)], "w long, s long"
        )
        assert cochran_armitage(allsucc, "w", "s").collect()[0]["z"] is None
        # single score level: N*sw2n - swn^2 = 0 -> NULL
        one = spark.createDataFrame([(2, 1), (2, 0)], "w long, s long")
        assert cochran_armitage(one, "w", "s").collect()[0]["z"] is None


class TestRmstReport:
    def test_step_integral_matches_python(self, spark):
        import math

        from data_misc_tools_spark.operators.profile import (
            kaplan_meier,
            rmst_report,
        )

        # spells: events at 2,2,5 and censors at 4,9
        rows = [(2, 1), (2, 1), (5, 1), (4, 0), (9, 0)]
        df = spark.createDataFrame(rows, "duration long, event long")
        km = {r["duration"]: r for r in kaplan_meier(df).collect()}
        got = rmst_report(kaplan_meier(df), tau=8).collect()
        s = {
            d: round(math.exp(r["log_surv_e6"] / 1e6) * 1e6)
            for d, r in km.items()
            if r["log_surv_e6"] is not None
        }
        # intervals: [0,2) S=1e6; [2,4) S(2); [4,5) S(4)=S(2) (censor
        # only, no drop); [5,8) S(5); capped at tau=8
        want = [
            (0, 2, 1_000_000),
            (2, 4, s[2]),
            (4, 5, s[4]),
            (5, 8, s[5]),
        ]
        assert [(r.t_start, r.t_end, r.s_e6) for r in got] == want
        for r in got:
            assert r.rmst_term_e6 == r.s_e6 * (r.t_end - r.t_start)
        total = sum(r.rmst_term_e6 for r in got)
        assert 0 < total <= 8 * 1_000_000  # RMST in (0, tau]

    def test_absorbed_curve_contributes_zero_and_tau_caps(self, spark):
        from data_misc_tools_spark.operators.profile import (
            kaplan_meier,
            rmst_report,
        )

        # everyone dies at 3 -> absorption (log NULL), S after 3 is 0
        df = spark.createDataFrame(
            [(3, 1), (3, 1)], "duration long, event long"
        )
        got = rmst_report(kaplan_meier(df), tau=10).collect()
        # the absorbed tail is an explicit zero-survival row (term 0),
        # not a silent drop
        assert [(r.t_start, r.t_end, r.s_e6) for r in got] == [
            (0, 3, 1_000_000), (3, 10, 0),
        ]
        assert got[1].rmst_term_e6 == 0
        # tau below the first step: one full-survival interval
        got2 = rmst_report(kaplan_meier(df), tau=2).collect()
        assert [(r.t_start, r.t_end, r.rmst_term_e6) for r in got2] == [
            (0, 2, 2_000_000)
        ]

    def test_tau_guard(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.profile import (
            kaplan_meier,
            rmst_report,
        )

        df = spark.createDataFrame([(3, 1)], "duration long, event long")
        with _pytest.raises(ValueError, match="tau"):
            rmst_report(kaplan_meier(df), tau=0)


class TestSprtReport:
    def test_matches_python_reference_and_stops(self, spark):
        """A 30%-success stream under H0=10% vs H1=30%: the llr must
        match the python replay exactly and cross the upper boundary;
        a 10% stream must cross the lower one."""
        import math
        import random

        from data_misc_tools_spark.operators.profile import sprt_report

        def e6ln(x):
            return round(math.log(float(x)) * 1e6)

        c1 = e6ln(300) - e6ln(100)
        c2 = e6ln(700) - e6ln(900)
        upper = e6ln(800) - e6ln(50)
        lower = e6ln(200) - e6ln(950)

        for rate, expect in ((0.30, "accept_h1"), (0.10, "accept_h0")):
            rng = random.Random(5)
            rows = [
                (i // 50, rng.random() < rate) for i in range(3000)
            ]
            df = spark.createDataFrame(rows, "day long, s boolean")
            got = sprt_report(
                df, "s", "day", 100, 300, 50, 200
            ).collect()
            cs = cn = 0
            by_day = {}
            for d, s in rows:
                st = by_day.setdefault(d, [0, 0])
                st[0] += 1
                st[1] += int(s)
            decisions = []
            for r in got:
                n, s = by_day[r["period"]]
                cn += n
                cs += s
                want_llr = c1 * cs + c2 * (cn - cs)
                assert r["llr_e6"] == want_llr, r["period"]
                decisions.append(r["decision"])
            assert expect in decisions  # the monitor actually stops
        # engine constants equal python's math.log here (sanity; the
        # shared-double idiom the repo's e6ln queries rely on)
        one = spark.sql(
            "SELECT cast(round(ln(cast(300 as double)) * 1e6) as long) AS v"
        ).collect()[0]["v"]
        assert one == e6ln(300)

    def test_guards(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.profile import sprt_report

        df = spark.createDataFrame([(1, True)], "day long, s boolean")
        with _pytest.raises(ValueError, match="permille"):
            sprt_report(df, "s", "day", 0, 300)
        with _pytest.raises(ValueError, match="differ"):
            sprt_report(df, "s", "day", 200, 200)


class TestFairnessReport:
    def test_matches_python_reference_and_null_denominators(self, spark):
        import random

        from data_misc_tools_spark.operators.profile import fairness_report

        rng = random.Random(3)
        rows = []
        for i in range(800):
            g = "g" + str(i % 3)
            y = rng.random() < (0.1 + 0.2 * (i % 3))
            s = rng.randrange(0, 1_000_001)
            rows.append((g, y, s))
        # group with NO positives -> tpr NULL; none selected -> ppv NULL
        rows += [("empty_pos", False, 0) for _ in range(20)]
        df = spark.createDataFrame(rows, "grp string, y boolean, s long")
        got = {
            r["group"]: r
            for r in fairness_report(df, "grp", "y", "s", 500_000).collect()
        }
        for g in {r[0] for r in rows}:
            sub = [r for r in rows if r[0] == g]
            n = len(sub)
            pos = sum(1 for r in sub if r[1])
            pred = sum(1 for r in sub if r[2] >= 500_000)
            tp = sum(1 for r in sub if r[1] and r[2] >= 500_000)
            fp = sum(1 for r in sub if not r[1] and r[2] >= 500_000)
            r = got[g]
            assert (r["n"], r["n_pos"], r["n_pred"], r["tp"], r["fp"]) == (
                n, pos, pred, tp, fp,
            )
            assert r["sel_rate_e6"] == (2 * 10**6 * pred + n) // (2 * n)
            if pos:
                assert r["tpr_e6"] == (2 * 10**6 * tp + pos) // (2 * pos)
            else:
                assert r["tpr_e6"] is None
            if pred:
                assert r["ppv_e6"] == (2 * 10**6 * tp + pred) // (2 * pred)
            else:
                assert r["ppv_e6"] is None
        assert got["empty_pos"]["tpr_e6"] is None
        assert got["empty_pos"]["ppv_e6"] is None
        assert got["empty_pos"]["fpr_e6"] == 0


class TestIpwAteReport:
    @staticmethod
    def _tdiv(num, den):
        q = abs(num) // den
        return q if num >= 0 else -q

    def test_matches_python_reference_signed_and_null(self, spark):
        """Random cells incl. NEGATIVE per-cell terms and one
        positivity-violation cell (no control rows) -> NULL term."""
        import random

        from data_misc_tools_spark.operators.profile import ipw_ate_report

        rng = random.Random(7)
        rows = []
        for i in range(2000):
            cell = rng.randrange(5)
            t = rng.random() < (0.2 + 0.12 * cell)  # cell-confounded
            y = round(rng.uniform(0, 50) + (8.0 if t else 0.0), 2)
            rows.append((i, t, cell, y))
        # cell 9: treated-only (positivity violation)
        rows += [(10_000 + i, True, 9, 5.0) for i in range(10)]
        df = spark.createDataFrame(rows, "id long, t boolean, cell long, v double")
        got = {
            r["cell"]: r
            for r in ipw_ate_report(df, "t", "cell", "v").collect()
        }
        nn = len(rows)
        by_cell = {}
        for _, t, c, v in rows:
            d = by_cell.setdefault(c, [0, 0, 0, 0, 0])  # n, nt, nc, st, sc
            y = round(v * 100)
            d[0] += 1
            if t:
                d[1] += 1
                d[3] += y
            else:
                d[2] += 1
                d[4] += y
        assert set(got) == set(by_cell)
        for c, (n, ntr, nc, st, sc) in by_cell.items():
            r = got[c]
            assert (r["n"], r["n_t"], r["n_c"]) == (n, ntr, nc)
            assert (r["sum_t_cents"], r["sum_c_cents"]) == (st, sc)
            if ntr == 0 or nc == 0:
                assert r["ipw_term_e6"] is None
            else:
                num = st * n * nc - sc * n * ntr
                den = nn * ntr * nc
                assert r["ipw_term_e6"] == self._tdiv(
                    2 * 1_000_000 * num + den, 2 * den
                )
        # the weighted estimate recovers the planted +800-cent effect
        # (within integer-rounding + sampling tolerance)
        ate = sum(
            r["ipw_term_e6"] for r in got.values()
            if r["ipw_term_e6"] is not None
        )
        assert 600 * 1_000_000 < ate < 1000 * 1_000_000

    def test_unconfounded_equals_difference_of_means_shape(self, spark):
        """With ONE cell, IPW collapses to the plain difference of
        means (cross-multiplied): a closed-form sanity pin."""
        from data_misc_tools_spark.operators.profile import ipw_ate_report

        rows = [(1, True, 0, 10.0), (2, True, 0, 14.0),
                (3, False, 0, 4.0), (4, False, 0, 6.0)]
        df = spark.createDataFrame(rows, "id long, t boolean, cell long, v double")
        r = ipw_ate_report(df, "t", "cell", "v").collect()[0]
        # mean_t - mean_c = 1200 - 500 = 700 cents
        assert r["ipw_term_e6"] == 700 * 1_000_000


class TestWeightedMedian:
    def _ref(self, rows):
        import collections

        by_g = collections.defaultdict(list)
        for g, x, w in rows:
            if w > 0:
                by_g[g].append((x, w))
        out = {}
        for g, vs in by_g.items():
            tw = sum(w for _, w in vs)
            cum = 0
            for x, w in sorted(vs):
                cum += w
                if 2 * cum >= tw:
                    out[g] = (tw, x)
                    break
        return out

    def test_matches_python_reference(self, spark):
        import random

        from data_misc_tools_spark.operators.profile import weighted_median

        rng = random.Random(37)
        rows = [
            ("g" + str(i % 3), rng.randrange(0, 100), rng.randrange(0, 5))
            for i in range(1000)
        ]
        df = spark.createDataFrame(rows, "g string, x long, w long")
        got = {
            r["g"]: (r["total_weight"], r["wmedian"])
            for r in weighted_median(df, "x", "w", ["g"]).collect()
        }
        assert got == self._ref(rows)

    def test_weight_shifts_the_median(self, spark):
        from data_misc_tools_spark.operators.profile import weighted_median

        # unweighted median of {1, 2, 3} is 2; weighting 3 heavily
        # pulls the weighted median up to 3
        rows = [("g", 1, 1), ("g", 2, 1), ("g", 3, 10)]
        df = spark.createDataFrame(rows, "g string, x long, w long")
        r = weighted_median(df, "x", "w", ["g"]).collect()[0]
        assert r["wmedian"] == 3 and r["total_weight"] == 12

    def test_global_form(self, spark):
        from data_misc_tools_spark.operators.profile import weighted_median

        rows = [("a", 5, 2), ("b", 9, 2)]
        df = spark.createDataFrame(rows, "g string, x long, w long")
        r = weighted_median(df, "x", "w").collect()[0]
        assert r["wmedian"] == 5  # 2*2 >= 4 at x=5 (lower median)


class TestIsotonicCalibration:
    def _pava(self, buckets):
        """Classic pool-adjacent-violators on (bucket, n, pos) rows."""
        blocks = [[b, n, pos] for b, n, pos in sorted(buckets)]
        out = []
        for blk in blocks:
            out.append(blk[:])
            while len(out) >= 2 and (
                out[-2][2] * out[-1][1] > out[-1][2] * out[-2][1]
            ):  # prev mean > cur mean -> pool (exact cross-multiply)
                b2 = out.pop()
                out[-1][1] += b2[1]
                out[-1][2] += b2[2]
        fitted = {}
        idx = 0
        for blk_start, n, pos in out:
            rate = pos / n
            # assign this pooled rate to every original bucket in the block
            total = n
            while total > 0:
                b0, n0, _ = blocks[idx]
                fitted[b0] = rate
                total -= n0
                idx += 1
        return fitted

    def test_matches_pava_reference(self, spark):
        import random

        from data_misc_tools_spark.operators.profile import (
            isotonic_calibration,
        )

        rng = random.Random(43)
        rows = []
        for _ in range(4000):
            s = rng.randrange(0, 1_000_001)
            # noisy, non-monotone-in-places positive rate
            p = 0.2 + 0.6 * (s / 1e6) + rng.uniform(-0.25, 0.25)
            rows.append((s, 1 if rng.random() < p else 0))
        df = spark.createDataFrame(rows, "score_e6 long, y int")
        nb = 16
        got = {
            r["bucket"]: r
            for r in isotonic_calibration(df, "score_e6", "y", nb).collect()
        }
        import collections

        agg = collections.Counter()
        npos = collections.Counter()
        for s, y in rows:
            b = min(s * nb // 1_000_000, nb - 1)
            agg[b] += 1
            npos[b] += y
        ref = self._pava([(b, agg[b], npos[b]) for b in agg])
        assert set(got) == set(ref)
        for b, r in got.items():
            assert r["n_rows"] == agg[b] and r["n_pos"] == npos[b]
            assert abs(r["iso_rate"] - ref[b]) < 1e-12, (b, r["iso_rate"], ref[b])
        # monotone by construction
        seq = [got[b]["iso_rate"] for b in sorted(got)]
        assert all(a <= c + 1e-15 for a, c in zip(seq, seq[1:]))

    def test_already_monotone_is_identity(self, spark):
        from data_misc_tools_spark.operators.profile import (
            isotonic_calibration,
        )

        # clean monotone rates: isotonic fit == raw rates
        rows = []
        for b, p in enumerate([0.1, 0.3, 0.7, 0.9]):
            s = b * 250_000 + 100
            k = int(p * 100)
            rows += [(s, 1)] * k + [(s, 0)] * (100 - k)
        df = spark.createDataFrame(rows, "score_e6 long, y int")
        got = isotonic_calibration(df, "score_e6", "y", 4).collect()
        for r in got:
            assert abs(r["iso_rate"] - r["n_pos"] / r["n_rows"]) < 1e-15

    def test_guards(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.profile import (
            isotonic_calibration,
        )

        df = spark.createDataFrame([(500, 1)], "score_e6 long, y int")
        with _pytest.raises(ValueError):
            isotonic_calibration(df, "score_e6", "y", 1)
        with _pytest.raises(ValueError):
            isotonic_calibration(df, "score_e6", "y", 200)
        bad = spark.createDataFrame([(2_000_000, 1)], "score_e6 long, y int")
        with _pytest.raises(Exception, match="outside"):
            isotonic_calibration(bad, "score_e6", "y").collect()


class TestSchemaDriftReport:
    def test_statuses_and_drift(self, spark):
        from data_misc_tools_spark.operators.profile import schema_drift_report

        old = spark.createDataFrame(
            [(1, "a", 1.0), (2, None, 2.0), (3, "c", 3.0)],
            "id long, name string, v double",
        )
        new = spark.createDataFrame(
            [(1, "a", "x"), (2, None, "y"), (3, None, "y"), (4, "d", "z")],
            "id long, name string, tag string",
        )
        got = {
            r["col_name"]: r
            for r in schema_drift_report(old, new).collect()
        }
        assert got["v"]["status"] == "removed" and got["v"]["n_rows_new"] is None
        assert got["tag"]["status"] == "added" and got["tag"]["n_rows_old"] is None
        assert got["id"]["status"] == "kept"
        assert got["name"]["status"] == "kept"
        # null rate: 1/3 -> 2/4
        assert got["name"]["null_rate_old_e6"] == (2 * 1_000_000 * 1 + 3) // 6
        assert got["name"]["null_rate_new_e6"] == 500_000
        assert got["name"]["null_drift_e6"] == (
            got["name"]["null_rate_new_e6"] - got["name"]["null_rate_old_e6"]
        )
        assert got["id"]["n_distinct_old"] == 3
        assert got["id"]["n_distinct_new"] == 4

    def test_type_change_detected(self, spark):
        from data_misc_tools_spark.operators.profile import schema_drift_report

        old = spark.createDataFrame([(1,)], "x int")
        new = spark.createDataFrame([(1.0,)], "x double")
        r = schema_drift_report(old, new).collect()[0]
        assert r["status"] == "type_changed"
        assert r["dtype_old"] == "int" and r["dtype_new"] == "double"


class TestRocAucExact:
    def _ref_auc(self, pairs):
        pos = [s for s, y in pairs if y]
        neg = [s for s, y in pairs if not y]
        u = 0.0
        for p in pos:
            for q in neg:
                u += 1.0 if p > q else (0.5 if p == q else 0.0)
        return u, u / (len(pos) * len(neg))

    def test_matches_brute_force_with_ties(self, spark):
        import random

        from data_misc_tools_spark.operators.profile import roc_auc_exact

        rng = random.Random(71)
        pairs = [
            (rng.randrange(0, 40) + (30 if rng.random() < 0.5 else 0),
             rng.random() < 0.45)
            for _ in range(400)
        ]
        # make score genuinely predictive: positives shifted up
        pairs = [(s + (15 if y else 0), y) for s, y in pairs]
        df = spark.createDataFrame(pairs, "s long, y boolean")
        r = roc_auc_exact(df, df.y, "s", scale=1).collect()[0]
        u, auc = self._ref_auc(pairs)
        assert r["u_pos"] == u
        assert abs(r["auc"] - auc) < 1e-15
        assert r["auc"] > 0.5  # predictive by construction

    def test_perfect_and_random_extremes(self, spark):
        from data_misc_tools_spark.operators.profile import roc_auc_exact

        perfect = [(i, i >= 50) for i in range(100)]
        df = spark.createDataFrame(perfect, "s long, y boolean")
        assert roc_auc_exact(df, df.y, "s", 1).collect()[0]["auc"] == 1.0
        constant = [(7, i % 2 == 0) for i in range(100)]
        df2 = spark.createDataFrame(constant, "s long, y boolean")
        assert roc_auc_exact(df2, df2.y, "s", 1).collect()[0]["auc"] == 0.5
        onesided = [(i, True) for i in range(10)]
        df3 = spark.createDataFrame(onesided, "s long, y boolean")
        assert roc_auc_exact(df3, df3.y, "s", 1).collect()[0]["auc"] is None


class TestPrCurve:
    def test_matches_python_reference(self, spark):
        import random

        from data_misc_tools_spark.operators.profile import pr_curve

        rng = random.Random(73)
        rows = [
            (rng.randrange(0, 20) * 50_000, rng.random() < 0.4)
            for _ in range(500)
        ]
        df = spark.createDataFrame(rows, "score_e6 long, y boolean")
        got = {
            r["threshold_e6"]: (r["tp"], r["fp"], r["fn"],
                                r["precision_e6"], r["recall_e6"], r["f1_e6"])
            for r in pr_curve(df, "score_e6", "y").collect()
        }
        for t in {s for s, _ in rows}:
            tp = sum(1 for s, y in rows if s >= t and y)
            fp = sum(1 for s, y in rows if s >= t and not y)
            fn = sum(1 for s, y in rows if s < t and y)
            want = (
                tp, fp, fn,
                (2 * 1_000_000 * tp + tp + fp) // (2 * (tp + fp)),
                (2 * 1_000_000 * tp + tp + fn) // (2 * (tp + fn)),
                (2 * 1_000_000 * 2 * tp + 2 * tp + fp + fn)
                // (2 * (2 * tp + fp + fn)),
            )
            assert got[t] == want

    def test_curve_endpoints(self, spark):
        from data_misc_tools_spark.operators.profile import pr_curve

        rows = [(100, True), (200, True), (50, False), (150, False)]
        df = spark.createDataFrame(rows, "score_e6 long, y boolean")
        curve = pr_curve(df, "score_e6", "y").collect()
        # lowest threshold admits everything: recall 1, precision = base rate
        last = curve[-1]
        assert last["recall_e6"] == 1_000_000
        assert last["precision_e6"] == 500_000
        # highest threshold: only the top score
        first = curve[0]
        assert first["tp"] == 1 and first["fp"] == 0
        assert first["precision_e6"] == 1_000_000
        # recall is monotone non-increasing as threshold rises
        recalls = [r["recall_e6"] for r in curve]  # DESC threshold order
        assert recalls == sorted(recalls)


class TestHillTailIndex:
    def test_recovers_pareto_exponent(self, spark):
        import random

        from data_misc_tools_spark.operators.profile import hill_tail_index

        rng = random.Random(83)
        alpha_true = 2.5
        # Pareto(alpha): x = xm * U^(-1/alpha)
        vals = [
            round(10.0 * (rng.random() ** (-1.0 / alpha_true)), 2)
            for _ in range(20_000)
        ]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        r = hill_tail_index(df, "v", k=500).collect()[0]
        assert r["n_pos"] == len(vals)
        assert abs(r["alpha"] - alpha_true) < 0.4  # ~3 se at k=500

    def test_matches_python_reference(self, spark):
        import math
        import random

        from data_misc_tools_spark.operators.profile import hill_tail_index

        rng = random.Random(89)
        vals = [round(rng.uniform(0.5, 500.0), 2) for _ in range(2000)]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        k = 100
        r = hill_tail_index(df, "v", k=k).collect()[0]
        xs = sorted((round(v * 100) for v in vals), reverse=True)[: k + 1]
        s = sum(round(math.log(x) * 1e6) for x in xs)
        la = round(math.log(xs[-1]) * 1e6)
        want = (2 * (s - (k + 1) * la) + k) // (2 * k)
        assert r["hill_e6"] == want
        assert r["anchor"] == xs[-1]
        assert r["alpha"] == 1e6 / want

    def test_insufficient_data_null(self, spark):
        from data_misc_tools_spark.operators.profile import hill_tail_index

        df = spark.createDataFrame([(float(i),) for i in range(1, 50)], "v double")
        r = hill_tail_index(df, "v", k=100).collect()[0]
        assert r["hill_e6"] is None and r["alpha"] is None

    def test_all_tied_top_null_alpha(self, spark):
        from data_misc_tools_spark.operators.profile import hill_tail_index

        df = spark.createDataFrame([(5.0,)] * 300, "v double")
        r = hill_tail_index(df, "v", k=100).collect()[0]
        assert r["hill_e6"] == 0 and r["alpha"] is None


class TestTrimmedStats:
    def _ref(self, rows, trim=50):
        import collections

        by_g = collections.defaultdict(list)
        for g, v in rows:
            by_g[g].append(v)
        out = {}
        for g, vs in by_g.items():
            vs = sorted(vs)
            n = len(vs)
            cut = n * trim // 1000
            core = vs[cut: n - cut]
            mean = sum(vs) / n
            if not core:
                out[g] = (n, cut, mean, None, None)
                continue
            tm = sum(core) / len(core)
            wm = (sum(core) + cut * vs[cut] + cut * vs[n - cut - 1]) / n
            out[g] = (n, cut, mean, tm, wm)
        return out

    def test_matches_python_reference(self, spark):
        import random

        from data_misc_tools_spark.operators.profile import trimmed_stats

        rng = random.Random(101)
        rows = [
            ("g" + str(i % 3), rng.randrange(0, 500))
            for i in range(2000)
        ]
        df = spark.createDataFrame(
            [(g, v / 100.0) for g, v in rows], "g string, v double"
        )
        got = {
            r["g"]: (r["n"], r["cut"], r["mean_scaled"],
                     r["trimmed_mean"], r["winsorized_mean"])
            for r in trimmed_stats(df, "v", ["g"], 50).collect()
        }
        ref = self._ref(rows, 50)
        assert set(got) == set(ref)
        for g in ref:
            for a, b in zip(got[g], ref[g]):
                if b is None:
                    assert a is None
                else:
                    assert abs(a - b) < 1e-9, (g, got[g], ref[g])

    def test_outlier_immunity(self, spark):
        from data_misc_tools_spark.operators.profile import trimmed_stats

        vals = [1.0] * 90 + [10000.0] * 5  # 5% contamination
        df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
        r = trimmed_stats(df, "v", ["g"], trim_permille=100).collect()[0]
        assert abs(r["trimmed_mean"] - 100.0) < 1e-9  # cents of 1.0
        assert r["mean_scaled"] > 50_000  # the raw mean is wrecked
        assert r["winsorized_mean"] < r["mean_scaled"]

    def test_overtrim_yields_null(self, spark):
        from data_misc_tools_spark.operators.profile import trimmed_stats

        df = spark.createDataFrame([("g", 1.0), ("g", 2.0)], "g string, v double")
        r = trimmed_stats(df, "v", ["g"], trim_permille=499).collect()[0]
        assert r["n"] == 2
        # cut = 2*499 div 1000 = 0 -> keeps everything; use a bigger n
        df2 = spark.createDataFrame(
            [("g", float(i)) for i in range(4)], "g string, v double"
        )
        r2 = trimmed_stats(df2, "v", ["g"], trim_permille=499).collect()[0]
        # cut = 4*499 div 1000 = 1, core of 2 -> defined
        assert r2["trimmed_mean"] is not None
        import pytest as _pytest

        with _pytest.raises(ValueError):
            trimmed_stats(df, "v", ["g"], trim_permille=500)


class TestCramersV:
    def _ref(self, pairs):
        import collections
        import math

        cells = collections.Counter(pairs)
        ca = collections.Counter(a for a, _ in pairs)
        cb = collections.Counter(b for _, b in pairs)
        n = len(pairs)
        s = 0
        e = 0
        for (a, b), c in cells.items():
            d = n * c - ca[a] * cb[b]
            ee = ca[a] * cb[b]
            s += (2 * 1_000_000 * d * d + n * ee) // (2 * n * ee)
            e += ee
        chi2_e6 = s + (2 * 1_000_000 * (n * n - e) + n) // (2 * n)
        k = min(len(ca), len(cb))
        v = (
            None
            if k <= 1
            else math.sqrt(chi2_e6 / (1_000_000.0 * n * (k - 1)))
        )
        return n, len(ca), len(cb), chi2_e6, v

    def test_matches_python_reference(self, spark):
        import random

        from data_misc_tools_spark.operators.profile import cramers_v

        rng = random.Random(103)
        # dependent-ish: b leans on a
        pairs = []
        for _ in range(3000):
            a = rng.randrange(4)
            b = a if rng.random() < 0.4 else rng.randrange(6)
            pairs.append((f"a{a}", f"b{b}"))
        df = spark.createDataFrame(pairs, "x string, y string")
        r = cramers_v(df, "x", "y").collect()[0]
        n, ra, rb, chi2, v = self._ref(pairs)
        assert (r["n_rows"], r["n_levels_a"], r["n_levels_b"]) == (n, ra, rb)
        assert r["chi2_e6"] == chi2
        assert abs(r["v"] - v) < 1e-15
        assert 0.2 < r["v"] < 0.9  # genuinely associated

    def test_independence_and_identity_extremes(self, spark):
        from data_misc_tools_spark.operators.profile import cramers_v

        # perfect association: b == a -> v == 1
        pairs = [(f"k{i % 4}", f"k{i % 4}") for i in range(400)]
        df = spark.createDataFrame(pairs, "x string, y string")
        r = cramers_v(df, "x", "y").collect()[0]
        assert abs(r["v"] - 1.0) < 1e-9
        # single-level column -> NULL
        one = spark.createDataFrame([("a", f"b{i % 3}") for i in range(30)],
                                    "x string, y string")
        assert cramers_v(one, "x", "y").collect()[0]["v"] is None


class TestFisherExact2x2:
    @staticmethod
    def _exact(a, b, c, d):
        """Exact rational two-sided Fisher p (method of small
        p-values) via python bigints — the independent reference."""
        from fractions import Fraction
        from math import comb

        r1, r2, c1, n = a + b, c + d, a + c, a + b + c + d
        den = comb(n, c1)

        def prob(x):
            return Fraction(comb(r1, x) * comb(r2, c1 - x), den)

        pa = prob(a)
        return float(
            sum(
                prob(x)
                for x in range(max(0, c1 - r2), min(r1, c1) + 1)
                if prob(x) <= pa
            )
        )

    def _table_df(self, spark, a, b, c, d):
        rows = (
            [(1, 1)] * a + [(1, 0)] * b + [(0, 1)] * c + [(0, 0)] * d
        )
        return spark.createDataFrame(rows, "v int, s int")

    def test_matches_exact_rational_reference(self, spark):
        from pyspark.sql import functions as F

        from data_misc_tools_spark.operators.profile import fisher_exact_2x2

        for a, b, c, d in [
            (3, 1, 1, 3),      # Fisher's tea tasting: p = 17/35
            (12, 5, 3, 14),    # strongly associated
            (10, 10, 10, 10),  # perfectly balanced: p = 1
            (1, 9, 11, 3),     # R's fisher.test example
            (0, 5, 5, 0),      # degenerate diagonal
        ]:
            out = fisher_exact_2x2(
                self._table_df(spark, a, b, c, d),
                F.col("v") == 1,
                F.col("s") == 1,
            ).collect()[0]
            want = self._exact(a, b, c, d)
            assert abs(out["p_fisher"] - want) < 1e-5, (a, b, c, d)
            assert (out["n11"], out["n10"], out["n01"], out["n00"]) == (
                a, b, c, d,
            )
        # tea tasting exactly: 17/35 = 0.4857142857...
        out = fisher_exact_2x2(
            self._table_df(spark, 3, 1, 1, 3),
            F.col("v") == 1,
            F.col("s") == 1,
        ).collect()[0]
        assert abs(out["p_fisher"] - 17 / 35) < 1e-5
        assert out["support_n"] == 5

    def test_zero_margin_and_guard(self, spark):
        import pytest as _pytest
        from pyspark.sql import functions as F

        from data_misc_tools_spark.operators.profile import fisher_exact_2x2

        # empty success column -> NULL p
        df = self._table_df(spark, 0, 4, 0, 6)
        out = fisher_exact_2x2(df, F.col("v") == 1, F.col("s") == 1).collect()[0]
        assert out["p_fisher"] is None and out["support_n"] == 0

        big = self._table_df(spark, 3, 1, 1, 3)
        with _pytest.raises(ValueError, match="max_n"):
            fisher_exact_2x2(
                big, F.col("v") == 1, F.col("s") == 1, max_n=5
            )


class TestCohensKappa:
    def _df(self, spark, a, b, c, d):
        rows = [(1, 1)] * a + [(1, 0)] * b + [(0, 1)] * c + [(0, 0)] * d
        return spark.createDataFrame(rows, "ra int, rb int")

    def test_known_values_and_mirror(self, spark):
        from pyspark.sql import functions as F

        from data_misc_tools_spark.operators.profile import cohens_kappa_2x2

        def mirror(a, b, c, d):
            n = a + b + c + d
            num = n * (a + d) - ((a + b) * (a + c) + (c + d) * (b + d))
            den = n * n - ((a + b) * (a + c) + (c + d) * (b + d))
            return float(num) / float(den)

        # textbook: po=0.7, pe=0.5 -> kappa = 0.4
        out = cohens_kappa_2x2(
            self._df(spark, 20, 5, 10, 15), F.col("ra") == 1, F.col("rb") == 1
        ).collect()[0]
        assert out["kappa"] == mirror(20, 5, 10, 15)
        assert abs(out["kappa"] - 0.4) < 1e-12
        # perfect agreement -> 1; perfect disagreement -> negative
        assert cohens_kappa_2x2(
            self._df(spark, 10, 0, 0, 10), F.col("ra") == 1, F.col("rb") == 1
        ).collect()[0]["kappa"] == 1.0
        assert cohens_kappa_2x2(
            self._df(spark, 0, 10, 10, 0), F.col("ra") == 1, F.col("rb") == 1
        ).collect()[0]["kappa"] == -1.0
        # statistically independent raters -> ~0
        out = cohens_kappa_2x2(
            self._df(spark, 9, 21, 21, 49), F.col("ra") == 1, F.col("rb") == 1
        ).collect()[0]
        assert abs(out["kappa"]) < 1e-12  # margins 30/70 exactly indep
        # both raters constant -> NULL (0/0)
        assert cohens_kappa_2x2(
            self._df(spark, 10, 0, 0, 0), F.col("ra") == 1, F.col("rb") == 1
        ).collect()[0]["kappa"] is None


class TestBrierDecomposition:
    def test_matches_python_reference_and_identity(self, spark):
        import random

        from data_misc_tools_spark.operators.profile import (
            brier_decomposition,
        )

        rng = random.Random(17)
        rows = []
        for _ in range(600):
            s = rng.randrange(0, 1_000_001)
            y = 1 if rng.random() * 1_000_000 < s * 0.8 + 100_000 else 0
            rows.append((s, y))
        df = spark.createDataFrame(rows, "score_e6 long, y int")
        got = brier_decomposition(df, "score_e6", "y").collect()

        buckets: dict = {}
        for s, y in rows:
            b = min((s * 10) // 1_000_000, 9)
            n, p, ss = buckets.get(b, (0, 0, 0))
            buckets[b] = (n + 1, p + y, ss + s)
        N = sum(n for n, _, _ in buckets.values())
        P = sum(p for _, p, _ in buckets.values())
        rel = res = 0
        for b, (n, p, ss) in sorted(buckets.items()):
            rel += (2 * (ss - 10**6 * p) ** 2 + 1000 * n) // (2 * 1000 * n)
            res += (
                2 * 10**9 * (N * p - P * n) ** 2 + n * N * N
            ) // (2 * n * N * N)
        unc = (2 * 10**9 * P * (N - P) + N * N) // (2 * N * N)
        by_b = {r["bucket"]: r for r in got}
        for b, (n, p, ss) in buckets.items():
            r = by_b[b]
            assert (r["n_rows"], r["n_pos"]) == (n, p)
        rel_tot = (2 * rel + N) // (2 * N)
        res_tot = (2 * res + N) // (2 * N)
        r0 = got[0]
        assert r0["rel_e9"] == rel_tot and r0["res_e9"] == res_tot
        assert r0["unc_e9"] == unc
        # Murphy identity: binned Brier = rel - res + unc (within the
        # e9 quantization of <=10 bucket terms)
        # direct binned Brier vs decomposition
        direct = 0.0
        for n, p, ss in buckets.values():
            sbar = ss / n / 1e6
            ybar = p / n
            direct += n * (sbar - ybar) ** 2 - n * (ybar - P / N) ** 2
        direct = direct / N + (P / N) * (1 - P / N)
        assert abs((rel_tot - res_tot + unc) / 1e9 - direct) < 1e-5

    def test_perfectly_calibrated_score_has_zero_reliability(self, spark):
        from data_misc_tools_spark.operators.profile import (
            brier_decomposition,
        )

        # bucket means exactly equal positive rates: 1/4 of rows
        # positive at score 250000, 3/4 at 750000
        rows = (
            [(250_000, 1)] * 25 + [(250_000, 0)] * 75
            + [(750_000, 1)] * 75 + [(750_000, 0)] * 25
        )
        df = spark.createDataFrame(rows, "score_e6 long, y int")
        got = brier_decomposition(df, "score_e6", "y").collect()
        assert all(r["rel_term_e9"] == 0 for r in got)
        assert got[0]["rel_e9"] == 0
        assert got[0]["res_e9"] > 0  # the buckets DO separate outcomes

    def test_guards(self, spark):
        import pytest as _pytest

        from data_misc_tools_spark.operators.profile import (
            brier_decomposition,
        )

        df = spark.createDataFrame([(2_000_000, 1)], "score_e6 long, y int")
        with _pytest.raises(Exception, match="outside"):
            brier_decomposition(df, "score_e6", "y").collect()
        with _pytest.raises(ValueError, match="buckets"):
            brier_decomposition(df, "score_e6", "y", n_buckets=1)


class TestWilsonCI:
    def test_matches_python_mirror_and_textbook(self, spark):
        import math

        from pyspark.sql import functions as F

        from data_misc_tools_spark.operators.profile import wilson_ci

        rows = [("a", 1)] * 8 + [("a", 0)] * 2 + [("b", 1)] * 1 + [("b", 0)] * 29
        df = spark.createDataFrame(rows, "grp string, s int")
        got = {r["grp"]: r for r in
               wilson_ci(df, "grp", F.col("s") == 1).collect()}

        z = 1_959_964 / 1e6
        for grp, n, k in (("a", 10, 8), ("b", 30, 1)):
            p = k / n
            c = (p + z * z / (2.0 * n)) / (1.0 + z * z / n)
            h = (z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))) \
                / (1.0 + z * z / n)
            r = got[grp]
            assert (r["n"], r["k"]) == (n, k)
            assert r["p_hat"] == p
            assert abs(r["wilson_lo"] - (c - h)) < 1e-12
            assert abs(r["wilson_hi"] - (c + h)) < 1e-12
        # textbook sanity: 8/10 Wilson 95% ~ (0.490, 0.943)
        assert abs(got["a"]["wilson_lo"] - 0.4901) < 5e-3
        assert abs(got["a"]["wilson_hi"] - 0.9433) < 5e-3
        # bounds stay inside [0,1] even at p_hat extremes
        ext = spark.createDataFrame([("c", 0)] * 5, "grp string, s int")
        r = wilson_ci(ext, "grp", F.col("s") == 1).collect()[0]
        assert 0.0 <= r["wilson_lo"] <= r["wilson_hi"] <= 1.0
        assert r["wilson_lo"] == 0.0  # p_hat = 0: lo pinned at 0


class TestKendallTauB:
    @staticmethod
    def _ref(pairs):
        """O(n^2) textbook tau-b."""
        import math

        n = len(pairs)
        c = d = 0
        for i in range(n):
            for j in range(i + 1, n):
                (x1, y1), (x2, y2) = pairs[i], pairs[j]
                s = (x1 - x2) * (y1 - y2)
                if (x1 != x2) and (y1 != y2):
                    if s > 0:
                        c += 1
                    else:
                        d += 1
        n0 = n * (n - 1) // 2
        n1 = 0
        from collections import Counter

        for t in Counter(x for x, _ in pairs).values():
            n1 += t * (t - 1) // 2
        n2 = 0
        for t in Counter(y for _, y in pairs).values():
            n2 += t * (t - 1) // 2
        den = math.sqrt(float(n0 - n1) * float(n0 - n2))
        return c, d, (c - d) / den if den else None

    def test_matches_quadratic_reference(self, spark):
        import random

        from pyspark.sql import functions as F

        from data_misc_tools_spark.operators.profile import kendall_tau_b

        rng = random.Random(11)
        pairs = [(rng.randrange(6), rng.randrange(4)) for _ in range(300)]
        df = spark.createDataFrame(pairs, "x long, y long")
        row = kendall_tau_b(df, F.col("x"), F.col("y")).collect()[0]
        c, d, tau = self._ref(pairs)
        assert (row.nc, row.nd) == (c, d)
        assert abs(row.tau_b - tau) < 1e-12
        assert row.n == 300 and row.n_cells <= 24

    def test_perfect_and_reversed(self, spark):
        from pyspark.sql import functions as F

        from data_misc_tools_spark.operators.profile import kendall_tau_b

        up = spark.createDataFrame([(i, i) for i in range(20)], "x long, y long")
        assert kendall_tau_b(up, F.col("x"), F.col("y")).collect()[0].tau_b == 1.0
        dn = spark.createDataFrame(
            [(i, -i) for i in range(20)], "x long, y long"
        )
        assert kendall_tau_b(dn, F.col("x"), F.col("y")).collect()[0].tau_b == -1.0

    def test_degenerate_single_value_null(self, spark):
        from pyspark.sql import functions as F

        from data_misc_tools_spark.operators.profile import kendall_tau_b

        df = spark.createDataFrame([(1, i) for i in range(5)], "x long, y long")
        assert kendall_tau_b(df, F.col("x"), F.col("y")).collect()[0].tau_b is None

    def test_max_cells_guard(self, spark):
        import pytest as _pytest

        from pyspark.sql import functions as F

        from data_misc_tools_spark.operators.profile import kendall_tau_b

        df = spark.createDataFrame(
            [(i, i + 1) for i in range(40)], "x long, y long"
        )
        with _pytest.raises(ValueError, match="max_cells"):
            kendall_tau_b(df, F.col("x"), F.col("y"), max_cells=10)


class TestDpHistogram:
    @staticmethod
    def _ref_noise_e9(group: str, b_e3: int, salt: str = "dp") -> int:
        import hashlib
        import math

        u = int(hashlib.md5((salt + group).encode()).hexdigest()[:8], 16)
        t = 2 * u - 4294967295
        l_e6 = round(1e6 * math.log((4294967296.0 - abs(float(t))) / 4294967296.0))
        return (-1 if t >= 0 else 1) * b_e3 * int(l_e6)

    def test_matches_python_reference(self, spark):
        from pyspark.sql import functions as F

        from data_misc_tools_spark.operators.profile import dp_histogram

        rows = [(f"g{i % 7}",) for i in range(700)]
        df = spark.createDataFrame(rows, "g string")
        got = {
            r.k: r.noisy_count_e3
            for r in dp_histogram(df, F.col("g"), b_e3=2000).collect()
        }
        for i in range(7):
            g = f"g{i}"
            r9 = 100 * 10**9 + self._ref_noise_e9(g, 2000)
            want = (
                (2 * r9 + 10**6) // (2 * 10**6)
                if r9 >= 0
                else -((2 * -r9 + 10**6) // (2 * 10**6))
            )
            assert got[g] == want, g

    def test_salt_changes_draw_and_release_is_deterministic(self, spark):
        from pyspark.sql import functions as F

        from data_misc_tools_spark.operators.profile import dp_histogram

        df = spark.createDataFrame([("a",)] * 50, "g string")
        one = dp_histogram(df, F.col("g"), b_e3=3000).collect()[0]
        two = dp_histogram(df, F.col("g"), b_e3=3000).collect()[0]
        assert one.noisy_count_e3 == two.noisy_count_e3  # replayable
        other = dp_histogram(df, F.col("g"), b_e3=3000, salt="v2").collect()[0]
        assert other.noisy_count_e3 != one.noisy_count_e3  # fresh draw

    def test_noise_scale_tracks_b(self, spark):
        """Mean |noise| over many groups ~ b (Laplace mean abs = b)."""
        from pyspark.sql import functions as F

        from data_misc_tools_spark.operators.profile import dp_histogram

        df = spark.createDataFrame([(f"u{i}",) for i in range(400)], "g string")
        rel = dp_histogram(df, F.col("g"), b_e3=5000).collect()
        errs = [abs(r.noisy_count_e3 - 1000) for r in rel]  # true n = 1
        mean_abs = sum(errs) / len(errs)
        assert 3000 < mean_abs < 7500  # b_e3 = 5000 +/- sampling slack
        assert any(r.noisy_count_e3 < 0 for r in rel)  # unclamped tails

    def test_b_guard(self, spark):
        import pytest as _pytest

        from pyspark.sql import functions as F

        from data_misc_tools_spark.operators.profile import dp_histogram

        df = spark.createDataFrame([("a",)], "g string")
        with _pytest.raises(ValueError, match="b_e3"):
            dp_histogram(df, F.col("g"), b_e3=0)


class TestKmvIntersect:
    def test_exact_small_sets(self, spark):
        from pyspark.sql import functions as F

        from data_misc_tools_spark.operators.profile import kmv_intersect

        rows = [(i, "a") for i in range(10)] + [(i, "b") for i in range(5, 15)]
        df = spark.createDataFrame(rows, "uid long, side string")
        r = kmv_intersect(
            df, "uid", F.col("side") == "a", F.col("side") == "b", k=64
        ).collect()[0]
        assert r.is_exact
        assert r.n_union_kept == 15
        assert r.intersect_est == 5  # exact overlap {5..9}
        assert r.union_est == 15

    def test_estimate_tracks_truth(self, spark):
        from pyspark.sql import functions as F

        from data_misc_tools_spark.operators.profile import kmv_intersect

        n, overlap = 5000, 1500
        rows = [(i, "a") for i in range(n)] + [
            (i, "b") for i in range(n - overlap, 2 * n - overlap)
        ]
        df = spark.createDataFrame(rows, "uid long, side string")
        r = kmv_intersect(
            df, "uid", F.col("side") == "a", F.col("side") == "b", k=256
        ).collect()[0]
        assert not r.is_exact
        true_union = 2 * n - overlap
        assert abs(r.union_est - true_union) / true_union < 0.25
        assert abs(r.intersect_est - overlap) / overlap < 0.4  # k=256 noise

    def test_disjoint_sets(self, spark):
        from pyspark.sql import functions as F

        from data_misc_tools_spark.operators.profile import kmv_intersect

        rows = [(i, "a") for i in range(20)] + [(1000 + i, "b") for i in range(20)]
        df = spark.createDataFrame(rows, "uid long, side string")
        r = kmv_intersect(
            df, "uid", F.col("side") == "a", F.col("side") == "b", k=64
        ).collect()[0]
        assert r.intersect_est == 0 and r.jaccard_e6 == 0

    def test_k_guard(self, spark):
        import pytest as _pytest

        from pyspark.sql import functions as F

        from data_misc_tools_spark.operators.profile import kmv_intersect

        df = spark.createDataFrame([(1, "a")], "uid long, side string")
        with _pytest.raises(ValueError, match="k must be"):
            kmv_intersect(df, "uid", F.col("side") == "a", F.col("side") == "b", k=1)


class TestWilcoxonSignedRank:
    @staticmethod
    def _ref(diffs):
        """Textbook tie-corrected normal approximation (no CC)."""
        import math

        nz = [d for d in diffs if d != 0]
        n = len(nz)
        if n == 0:
            return 0, None, None
        by_abs = sorted(range(n), key=lambda i: abs(nz[i]))
        ranks = [0.0] * n
        i = 0
        tie_t = 0
        while i < n:
            j = i
            while j < n and abs(nz[by_abs[j]]) == abs(nz[by_abs[i]]):
                j += 1
            avg = (i + 1 + j) / 2
            for k in range(i, j):
                ranks[by_abs[k]] = avg
            c = j - i
            tie_t += c**3 - c
            i = j
        w_plus = sum(r for r, d in zip(ranks, nz) if d > 0)
        var = n * (n + 1) * (2 * n + 1) / 24 - tie_t / 48
        z = (w_plus - n * (n + 1) / 4) / math.sqrt(var) if var > 0 else None
        return n, w_plus, z

    def test_matches_reference_with_ties_and_zeros(self, spark):
        import random

        from pyspark.sql import functions as F

        from data_misc_tools_spark.operators.profile import (
            wilcoxon_signed_rank,
        )

        rng = random.Random(7)
        rows = [
            (rng.randrange(10), rng.randrange(10)) for _ in range(300)
        ]  # many ties, some zeros
        df = spark.createDataFrame(rows, "pre long, post long")
        got = wilcoxon_signed_rank(
            df, F.col("pre"), F.col("post"), scale=1
        ).collect()[0]
        n, w_plus, z = self._ref([b - a for a, b in rows])
        assert got.n_pairs == 300 and got.n_nonzero == n
        assert got.w_plus == w_plus
        assert abs(got.z_stat - z) < 1e-9

    def test_planted_shift_is_significant(self, spark):
        from pyspark.sql import functions as F

        from data_misc_tools_spark.operators.profile import (
            wilcoxon_signed_rank,
        )

        rows = [(i % 7, i % 7 + 1 + (i % 3)) for i in range(100)]
        df = spark.createDataFrame(rows, "pre long, post long")
        got = wilcoxon_signed_rank(df, F.col("pre"), F.col("post"), scale=1)
        assert got.collect()[0].z_stat > 5  # every diff positive

    def test_degenerate_all_zero_null(self, spark):
        from pyspark.sql import functions as F

        from data_misc_tools_spark.operators.profile import (
            wilcoxon_signed_rank,
        )

        df = spark.createDataFrame([(3, 3)] * 10, "pre long, post long")
        r = wilcoxon_signed_rank(df, F.col("pre"), F.col("post"), scale=1).collect()[0]
        assert r.n_nonzero == 0 and r.z_stat is None and r.w_plus == 0.0


class TestBlandAltman:
    def test_matches_numpy_reference(self, spark):
        import math
        import random

        from pyspark.sql import functions as F

        from data_misc_tools_spark.operators.profile import bland_altman

        rng = random.Random(3)
        rows = [
            (x := rng.randrange(100, 200), x + rng.randrange(-5, 9))
            for _ in range(200)
        ]
        df = spark.createDataFrame(rows, "a long, b long")
        r = bland_altman(df, F.col("a"), F.col("b"), scale=1).collect()[0]
        ds = [a - b for a, b in rows]
        n = len(ds)
        bias = sum(ds) / n
        sd = math.sqrt(
            (n * sum(d * d for d in ds) - sum(ds) ** 2) / (n * (n - 1))
        )
        z = 1959964 / 1000000
        assert abs(r.bias - bias) < 1e-12
        assert abs(r.sd_diff - sd) < 1e-12
        assert abs(r.loa_low - (bias - z * sd)) < 1e-9
        assert abs(r.loa_high - (bias + z * sd)) < 1e-9
        n_within = sum(1 for d in ds if r.loa_low <= d <= r.loa_high)
        assert r.n_within == n_within
        assert r.within_e6 == (2 * 10**6 * n_within + n) // (2 * n)
        assert r.within_e6 > 900_000  # ~95% by construction

    def test_constant_difference_null_limits(self, spark):
        from pyspark.sql import functions as F

        from data_misc_tools_spark.operators.profile import bland_altman

        df = spark.createDataFrame([(10, 7)] * 5, "a long, b long")
        r = bland_altman(df, F.col("a"), F.col("b"), scale=1).collect()[0]
        assert r.bias == 3.0
        assert r.sd_diff is None and r.loa_low is None
        assert r.n_within is None and r.within_e6 is None
