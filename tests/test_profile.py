

def test_source_scorecard_signals(spark):
    from atiesh_spark.operators.profile import source_scorecard

    rows = [
        (1, "a", "en", "hello world text"),
        (2, "a", "en", "hello world text"),   # exact dup within source a
        (3, "a", "fr", "bonjour tout le monde"),
        (4, "b", "en", "hello world text"),   # same text, DIFFERENT source: not a within-source dup
        (5, "b", "en", "unique text for b here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, lang string, text string")
    got = {r["source"]: r for r in source_scorecard(
        df, "source", "doc_id", "text", "lang").collect()}
    a, b = got["a"], got["b"]
    assert a["n_docs"] == 3 and b["n_docs"] == 2
    assert abs(a["dup_rate"] - 2 / 3) < 1e-4   # docs 1,2 are dups
    assert b["dup_rate"] == 0.0                 # doc 4 unique within b
    assert abs(a["pct_target_lang"] - 2 / 3) < 1e-4
    assert b["pct_target_lang"] == 1.0
    # no lm_scores frame: scored count 0, sum NULL
    assert a["n_scored"] == 0 and a["sum_bits_per_char"] is None


def test_ks_statistic_known_values(spark):
    import pytest

    from atiesh_spark.operators.profile import ks_statistic

    # identical samples: D = 0
    a = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
    r = ks_statistic(a, a, "v").collect()[0]
    assert r["ks_d"] == 0.0 and r["n_a"] == r["n_b"] == 10

    # disjoint supports: D = 1
    b = spark.createDataFrame([(float(i + 100),) for i in range(10)], "v double")
    assert ks_statistic(a, b, "v").collect()[0]["ks_d"] == 1.0

    # hand-computed: a = {1,2,3,4}, b = {3,4,5,6} -> D = 0.5 at x=2..3
    a2 = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (4.0,)], "v double")
    b2 = spark.createDataFrame([(3.0,), (4.0,), (5.0,), (6.0,)], "v double")
    assert ks_statistic(a2, b2, "v").collect()[0]["ks_d"] == 0.5

    # NULLs excluded; empty side raises
    with_null = spark.createDataFrame([(None,), (1.0,)], "v double")
    assert ks_statistic(with_null, a2, "v").collect()[0]["n_a"] == 1
    with pytest.raises(ValueError):
        ks_statistic(a2.filter("v > 99"), b2, "v")


def test_drift_report_matches_python_reference(spark):
    """Randomized differential for the PSI report: A-bounds equal-width
    binning with edge clamping, the full emitted grid, union-of-
    categories, Laplace smoothing and per-bin contribs recomputed
    sequentially must match every row (numeric + categorical) and the
    per-feature psi to its 6dp rounding."""
    import math
    import random

    import pytest

    from atiesh_spark.operators.profile import drift_report

    rng = random.Random(25)
    a_num = [float(rng.randint(0, 100)) for _ in range(90)]
    b_num = [float(rng.randint(-20, 130)) for _ in range(70)]  # clamps
    cats = ["x", "y", "z", "w"]
    a_cat = [rng.choice(cats[:3]) for _ in range(90)]
    b_cat = [rng.choice(cats[1:]) for _ in range(70)]
    bins, s = 10, 0.5

    df_a = spark.createDataFrame(list(zip(a_num, a_cat)), "v double, c string")
    df_b = spark.createDataFrame(list(zip(b_num, b_cat)), "v double, c string")
    got = {
        (r["feature"], r["bin_idx"], r["category"]): r
        for r in drift_report(df_a, df_b, numeric_cols=["v"],
                              categorical_cols=["c"],
                              num_bins=bins, smoothing=s).collect()
    }

    # numeric reference
    lo, hi = min(a_num), max(a_num)
    width = (hi - lo) / bins

    def bin_of(v):
        return min(bins - 1, max(0, math.floor((v - lo) / width)))

    rows = {}
    for i in range(bins):
        na = sum(bin_of(v) == i for v in a_num)
        nb = sum(bin_of(v) == i for v in b_num)
        rows[("v", i, None)] = (na, nb)
    for cat in sorted(set(a_cat) | set(b_cat)):
        rows[("c", None, cat)] = (a_cat.count(cat), b_cat.count(cat))

    for feat in ("v", "c"):
        keys = [k for k in rows if k[0] == feat]
        k_ = len(keys)
        na_tot = sum(rows[k][0] for k in keys)
        nb_tot = sum(rows[k][1] for k in keys)
        psi = 0.0
        for k in keys:
            na, nb = rows[k]
            p_a = (na + s) / (na_tot + s * k_)
            p_b = (nb + s) / (nb_tot + s * k_)
            contrib = (p_a - p_b) * math.log(p_a / p_b)
            psi += contrib
            r = got[k]
            assert (r["n_a"], r["n_b"]) == (na, nb), k
            assert r["p_a"] == pytest.approx(p_a, abs=1e-6), k
            assert r["p_b"] == pytest.approx(p_b, abs=1e-6), k
            assert r["contrib"] == pytest.approx(contrib, abs=1e-6), k
            if k[1] is not None:
                assert r["lo_edge"] == pytest.approx(
                    lo + k[1] * width, abs=1e-6), k
        for k in keys:
            assert got[k]["psi"] == pytest.approx(psi, abs=2e-6), feat
    assert set(got) == set(rows)


def test_ks_spearman_mwu_match_bruteforce_random_samples(spark):
    """Randomized differentials for the three rank statistics against
    independent restatements: KS vs a direct sup over both empirical
    CDFs, Spearman vs numpy corrcoef of midranks, and Mann-Whitney U
    vs O(n^2) PAIR COUNTING (wins + half-ties) — a different formula
    from the operator's rank-sum construction, so a tie-handling bug
    in either cannot cancel out. Integer-valued samples force heavy
    ties everywhere."""
    import math
    import random

    import numpy as np
    import pytest

    from atiesh_spark.operators.profile import (
        ks_statistic,
        mann_whitney_u,
        spearman_corr,
    )

    rng = random.Random(1947)
    xs = [rng.randint(0, 12) for _ in range(80)]
    ys = [x + rng.randint(-3, 3) for x in xs]  # correlated, with ties
    bs = [rng.randint(2, 15) for _ in range(60)]

    # --- KS ---------------------------------------------------------
    values = sorted(set(xs) | set(bs))
    want_d = max(
        abs(sum(v <= t for v in xs) / len(xs)
            - sum(v <= t for v in bs) / len(bs))
        for t in values
    )
    a_df = spark.createDataFrame([(float(v),) for v in xs], "v double")
    b_df = spark.createDataFrame([(float(v),) for v in bs], "v double")
    r = ks_statistic(a_df, b_df, "v").collect()[0]
    assert (r["n_a"], r["n_b"]) == (80, 60)
    assert r["ks_d"] == pytest.approx(want_d, abs=1e-4)

    # --- Spearman ---------------------------------------------------
    def midranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            r_ = (i + j + 1) / 2.0  # 1-based average rank
            for t in order[i:j]:
                ranks[t] = r_
            i = j
        return ranks

    rho_want = float(np.corrcoef(midranks(xs), midranks(ys))[0, 1])
    xy = spark.createDataFrame(list(zip(map(float, xs), map(float, ys))),
                               "x double, y double")
    rr = spearman_corr(xy, "x", "y").collect()[0]
    assert rr["n"] == 80
    assert rr["rho"] == pytest.approx(rho_want, abs=1e-4)

    # --- Mann-Whitney U ---------------------------------------------
    u_want = sum(
        (b < a) + 0.5 * (a == b) for a in xs for b in bs
    )
    n_a, n_b = len(xs), len(bs)
    n = n_a + n_b
    pooled = xs + bs
    tie_sum = sum(
        g ** 3 - g
        for g in (pooled.count(v) for v in set(pooled))
    )
    sigma2 = n_a * n_b / 12.0 * ((n + 1) - tie_sum / (n * (n - 1)))
    z_want = (u_want - n_a * n_b / 2.0) / math.sqrt(sigma2)
    p_want = math.erfc(abs(z_want) / math.sqrt(2.0))
    df = spark.createDataFrame(
        [(i, "A", float(v)) for i, v in enumerate(xs)]
        + [(1000 + i, "B", float(v)) for i, v in enumerate(bs)],
        "id long, g string, v double",
    )
    m = mann_whitney_u(df, "v", "g", "A").collect()[0]
    assert (m["n_a"], m["n_b"]) == (n_a, n_b)
    assert m["u"] == u_want  # exact multiple of 0.5
    assert m["z"] == pytest.approx(z_want, abs=1e-4)
    assert m["p_value"] == pytest.approx(p_want, abs=2e-4)


def test_chi2_independence_textbook_2x2(spark):
    import pytest

    from atiesh_spark.operators.profile import chi2_independence

    rows = (
        [("x", "p")] * 10 + [("x", "q")] * 20
        + [("y", "p")] * 20 + [("y", "q")] * 10
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi2_independence(df, "a", "b").collect()[0]
    # n*(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)) = 60*300^2/30^4 = 6.6667
    assert r["chi2"] == 6.6667 and r["dof"] == 1
    assert r["cramers_v"] == round((6.666666666666667 / 60) ** 0.5, 4)
    # perfectly independent table: chi2 ~ 0
    ind = spark.createDataFrame(
        [("x", "p")] * 6 + [("x", "q")] * 6 + [("y", "p")] * 3 + [("y", "q")] * 3,
        "a string, b string",
    )
    assert abs(chi2_independence(ind, "a", "b").collect()[0]["chi2"]) < 1e-6
    # single-category margin: dof 0, V undefined (NULL)
    single = spark.createDataFrame([("x", "p"), ("x", "q")], "a string, b string")
    r3 = chi2_independence(single, "a", "b").collect()[0]
    assert r3["dof"] == 0 and r3["cramers_v"] is None
    with pytest.raises(ValueError):
        chi2_independence(df.filter("a = 'zzz'"), "a", "b")


def test_spearman_corr_ranks_and_ties(spark):
    import pytest

    from atiesh_spark.operators.profile import spearman_corr

    # perfect monotone (nonlinear): rho exactly 1 — rank invariance
    mono = spark.createDataFrame(
        [(1.0, 10.0), (2.0, 100.0), (3.0, 101.0), (4.0, 5000.0)],
        "x double, y double",
    )
    assert spearman_corr(mono, "x", "y").collect()[0]["rho"] == 1.0
    # hand-computed tied-rank case
    tied = spark.createDataFrame(
        [(1.0, 4.0), (2.0, 3.0), (2.0, 2.0), (3.0, 1.0)],
        "x double, y double",
    )
    assert spearman_corr(tied, "x", "y").collect()[0]["rho"] == -0.9487
    # NULLs excluded
    with_null = spark.createDataFrame(
        [(1.0, 1.0), (None, 2.0), (2.0, None), (3.0, 3.0)],
        "x double, y double",
    )
    assert spearman_corr(with_null, "x", "y").collect()[0]["n"] == 2
    with pytest.raises(ValueError):
        spearman_corr(mono.filter("x > 99"), "x", "y")


class TestBootstrapCI:
    def test_interval_brackets_mean_and_is_deterministic(self, spark):
        from atiesh_spark.operators.profile import bootstrap_ci

        df = spark.createDataFrame(
            [(i, 10 + i % 7) for i in range(200)], "id bigint, v bigint"
        )
        a = tuple(bootstrap_ci(df, "id", "v").collect()[0])
        b = tuple(bootstrap_ci(df.repartition(9), "id", "v").collect()[0])
        assert a == b  # integer-exact replica sums: partition-stable
        n, mean, lo, hi, reps = a
        assert n == 200 and reps == 40
        assert lo <= mean <= hi
        assert lo < hi  # non-degenerate interval on varied data

    def test_constant_metric_collapses_interval(self, spark):
        from atiesh_spark.operators.profile import bootstrap_ci

        df = spark.createDataFrame(
            [(i, 5) for i in range(50)], "id bigint, v bigint"
        )
        r = bootstrap_ci(df, "id", "v").collect()[0]
        # every replica mean of a constant column is that constant
        assert (r["mean"], r["ci_lo"], r["ci_hi"]) == (5.0, 5.0, 5.0)

    def test_replicas_validation(self, spark):
        import pytest as _pt

        from atiesh_spark.operators.profile import bootstrap_ci

        df = spark.createDataFrame([(1, 1)], "id bigint, v bigint")
        with _pt.raises(ValueError, match="replicas"):
            bootstrap_ci(df, "id", "v", replicas=5)

    def test_plan_is_one_aggregate(self, spark):
        from atiesh_spark.operators.profile import bootstrap_ci

        df = spark.createDataFrame(
            [(i, i) for i in range(10)], "id bigint, v bigint"
        )
        plan = (
            bootstrap_ci(df, "id", "v")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan
        # global aggregate: exactly one exchange (partial -> final)
        assert plan.count("Exchange") <= 1


class TestMannWhitneyU:
    def test_complete_separation(self, spark):
        from atiesh_spark.operators.profile import mann_whitney_u

        rows = [(i, "A", 100 + i) for i in range(50)] + [
            (i + 50, "B", i) for i in range(50)
        ]
        df = spark.createDataFrame(rows, "id bigint, g string, v bigint")
        r = mann_whitney_u(df, "v", "g", "A").collect()[0]
        assert (r["n_a"], r["n_b"], r["u"]) == (50, 50, 2500.0)
        # no ties: sigma^2 = 2500 * 101 / 12, z = 1250 / sqrt(.)
        assert r["z"] == 8.6173
        assert r["p_value"] == 0.0

    def test_identical_distributions(self, spark):
        from atiesh_spark.operators.profile import mann_whitney_u

        rows = [(i, "A", i % 10) for i in range(50)] + [
            (i + 50, "B", i % 10) for i in range(50)
        ]
        df = spark.createDataFrame(rows, "id bigint, g string, v bigint")
        r = mann_whitney_u(df, "v", "g", "A").collect()[0]
        assert r["u"] == 1250.0  # exactly n_a * n_b / 2
        assert r["z"] == 0.0 and r["p_value"] == 1.0

    def test_midrank_ties_hand_computed(self, spark):
        from atiesh_spark.operators.profile import mann_whitney_u

        # A = [1, 2], B = [2, 3]: pairs (1<2), (1<3), (2=2 -> 0.5),
        # (2<3) -> U_A counts B-below-A: 0 + 0 + 0.5 + 0 = 0.5
        df = spark.createDataFrame(
            [(1, "A", 1), (2, "A", 2), (3, "B", 2), (4, "B", 3)],
            "id bigint, g string, v bigint",
        )
        r = mann_whitney_u(df, "v", "g", "A").collect()[0]
        assert r["u"] == 0.5

    def test_partition_stable(self, spark):
        from atiesh_spark.operators.profile import mann_whitney_u

        rows = [(i, "A" if i % 3 else "B", (i * 7) % 23)
                for i in range(120)]
        df = spark.createDataFrame(rows, "id bigint, g string, v bigint")
        a = tuple(mann_whitney_u(df, "v", "g", "A").collect()[0])
        b = tuple(mann_whitney_u(df.repartition(11), "v", "g", "A")
                  .collect()[0])
        assert a == b
