

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
