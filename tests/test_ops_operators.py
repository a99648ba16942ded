"""Edge-case tests for the round-3b operator batch: SCD2, z-order,
weighted sampling, per-group caps, standardization, MAD outliers, and
window-overlap detection. (The value parity vs DuckDB is covered by
test_oracle_parity.py; these pin the semantic corners an oracle diff
can miss.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from atiesh_spark.operators.corpus import window_overlap_pairs
from atiesh_spark.operators.curation import cap_per_group
from atiesh_spark.operators.diffing import scd2_intervals
from atiesh_spark.operators.layout import zorder_key, zorder_layout_report
from atiesh_spark.operators.profile import group_standardize
from atiesh_spark.operators.sampling import weighted_sample
from atiesh_spark.operators.timeseries import mad_outliers


# ---------------------------------------------------------------- scd2

def test_scd2_collapses_runs_and_marks_current(spark):
    rows = [
        ("u1", 1, "a"), ("u1", 2, "a"), ("u1", 3, "b"), ("u1", 4, "a"),
        ("u2", 1, "x"),
    ]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = scd2_intervals(df, ["k"], "t", ["v"]).collect()
    by_key = sorted((r["k"], r["valid_from"], r["v"], r["valid_to"], r["is_current"]) for r in out)
    assert by_key == [
        ("u1", 1, "a", 3, False),
        ("u1", 3, "b", 4, False),
        ("u1", 4, "a", None, True),
        ("u2", 1, "x", None, True),
    ]


def test_scd2_null_tracked_values_open_and_close_intervals(spark):
    rows = [("u1", 1, None), ("u1", 2, None), ("u1", 3, "a"), ("u1", 4, None)]
    df = spark.createDataFrame(rows, "k string, t int, v string")
    out = sorted(
        (r["valid_from"], r["v"], r["valid_to"]) for r in
        scd2_intervals(df, ["k"], "t", ["v"]).collect()
    )
    # NULL run is ONE interval (null-safe lag), and NULL-after-value reopens
    assert out == [(1, None, 3), (3, "a", 4), (4, None, None)]


def test_scd2_rejects_reserved_and_empty_args(spark):
    df = spark.createDataFrame([("a", 1, True)], ["k", "t", "is_current"])
    with pytest.raises(ValueError):
        scd2_intervals(df, [], "t", ["k"])
    with pytest.raises(ValueError):
        scd2_intervals(df, ["k"], "t", ["is_current"])


# -------------------------------------------------------------- zorder

def test_zorder_key_interleaves_known_bits(spark):
    df = spark.createDataFrame([(3, 0), (0, 3), (1, 2)], ["x", "y"])
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", zorder_key(["x", "y"], bits=2)).collect()
    }
    # x bits at even positions, y bits at odd: (3,0)->0b0101, (0,3)->0b1010,
    # (1,2)->x bit0@0 + y bit1@3 = 0b1001
    assert got == {(3, 0): 5, (0, 3): 10, (1, 2): 9}


def test_zorder_buckets_bound_every_dimension(spark):
    pts = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(pts, ["px", "py"])
    rep = zorder_layout_report(df, ["px", "py"], bits=4, bucket_bits=4).collect()
    assert sum(r["n_rows"] for r in rep) == 256
    for r in rep:
        # 16 buckets over a 16x16 grid: each bucket is a 4x4 tile, so BOTH
        # dims span < 4 — the multi-dim pruning property a 1-D sort lacks.
        assert r["max_px"] - r["min_px"] <= 3
        assert r["max_py"] - r["min_py"] <= 3


def test_zorder_key_validates_width():
    with pytest.raises(ValueError):
        zorder_key(["a", "b"], bits=32)
    with pytest.raises(ValueError):
        zorder_key([], bits=4)


# ----------------------------------------------------------- weighted sample

def test_weighted_sample_nested_and_deterministic(spark):
    df = spark.createDataFrame(
        [(i, float(i % 7 + 1)) for i in range(100)], ["id", "w"]
    )
    k5 = [r["id"] for r in weighted_sample(df, "id", "w", k=5).collect()]
    k20 = [r["id"] for r in weighted_sample(df, "id", "w", k=20).collect()]
    assert k20[:5] == k5  # nested prefix property
    again = [r["id"] for r in weighted_sample(df, "id", "w", k=20).collect()]
    assert again == k20


def test_weighted_sample_excludes_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, -1.0), (3, None), (4, 2.0)], "id int, w double"
    )
    got = [r["id"] for r in weighted_sample(df, "id", "w", k=10).collect()]
    assert got == [4]


def test_weighted_sample_prefers_heavy_rows(spark):
    # one row carries ~1000x the weight of each of 200 light rows: it must
    # land in a k=20 sample with overwhelming probability under E-S keys
    rows = [(0, 10_000.0)] + [(i, 10.0) for i in range(1, 201)]
    df = spark.createDataFrame(rows, ["id", "w"])
    got = {r["id"] for r in weighted_sample(df, "id", "w", k=20).collect()}
    assert 0 in got


# ----------------------------------------------------------------- cap

def test_cap_per_group_matches_single_window(spark):
    from pyspark.sql.window import Window

    from atiesh_spark.functions.hashing import md5_long

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(90)], ["id", "src"]
    )
    two_phase = {
        (r["id"], r["src"])
        for r in cap_per_group(df, "src", "id", cap=7, shards=4).collect()
    }
    w = Window.partitionBy("src").orderBy(
        md5_long(F.col("id").cast("string"), 15), "id"
    )
    single = {
        (r["id"], r["src"])
        for r in df.withColumn("rk", F.row_number().over(w))
        .filter("rk <= 7").drop("rk").collect()
    }
    assert two_phase == single
    counts = cap_per_group(df, "src", "id", cap=7).groupBy("src").count().collect()
    assert all(r["count"] == 7 for r in counts)


def test_cap_per_group_keeps_small_groups_whole(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], ["id", "src"])
    assert cap_per_group(df, "src", "id", cap=10).count() == 3
    with pytest.raises(ValueError):
        cap_per_group(df, "src", "id", cap=0)


# ------------------------------------------------------- standardization

def test_group_standardize_values_and_constant_group(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", 5.0)], ["g", "v"]
    )
    got = {
        (r["g"], r["v"]): r["zscore"]
        for r in group_standardize(df, ["g"], "v").collect()
    }
    # group a: mean 2, stddev_pop 1 -> -1/+1; group b constant -> NULL
    assert got == {("a", 1.0): -1.0, ("a", 3.0): 1.0, ("b", 5.0): None}


# ------------------------------------------------------------- mad outliers

def test_mad_outliers_flags_spike_not_mean_dragged(spark):
    vals = [10.0, 11.0, 12.0, 10.5, 11.5, 9.5, 10.0, 1000.0]
    df = spark.createDataFrame([("g", v) for v in vals], ["g", "v"])
    out = {r["v"]: r["is_outlier"] for r in mad_outliers(df, "g", "v").collect()}
    assert out[1000.0] is True
    assert all(not flag for v, flag in out.items() if v != 1000.0)


def test_mad_outliers_constant_group_and_nulls(spark):
    df = spark.createDataFrame(
        [("g", 5.0), ("g", 5.0), ("g", None)], "g string, v double"
    )
    out = mad_outliers(df, "g", "v").collect()
    assert all(r["is_outlier"] is False for r in out)
    assert all(r["robust_z"] is None for r in out)


# ------------------------------------------------------------ window overlap

def test_window_overlap_detects_copied_span_any_alignment(spark):
    copied = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, "XXXX " + copied + " YYYYYYYYYYYY"),
        (2, "z" * 13 + copied + "w" * 40),  # misaligned by a non-stride shift
        (3, "completely different text with no overlap whatsoever here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r["id_1"], r["id_2"])
        for r in window_overlap_pairs(
            df, "doc_id", "text", width=32, stride=8
        ).collect()
    }
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_window_overlap_drops_boilerplate_windows(spark):
    # the same 40-char footer in EVERY doc must not produce n^2 pairs
    footer = "standard footer text shared by all docs!"
    rows = [(i, f"unique body number {i} " * 3 + footer) for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = window_overlap_pairs(
        df, "doc_id", "text", width=32, stride=8, max_doc_freq=5
    ).count()
    assert got == 0


def test_group_standardize_keeps_null_group_rows(spark):
    df = spark.createDataFrame(
        [(None, 1.0), (None, 3.0), ("b", 2.0)], "g string, v double"
    )
    got = {
        (r["g"], r["v"]): r["zscore"]
        for r in group_standardize(df, ["g"], "v").collect()
    }
    # NULL is a group (window semantics), never silently dropped
    assert got == {(None, 1.0): -1.0, (None, 3.0): 1.0, ("b", 2.0): None}


def test_mad_outliers_keeps_null_group_rows(spark):
    vals = [10.0, 11.0, 12.0, 10.5, 11.5, 9.5, 10.0, 1000.0]
    df = spark.createDataFrame([(None, v) for v in vals], "g string, v double")
    out = {r["v"]: r["is_outlier"] for r in mad_outliers(df, "g", "v").collect()}
    assert len(out) == len(set(vals))
    assert out[1000.0] is True


def test_pca_fit_rejects_ragged_vectors(spark):
    from atiesh_spark.operators.similarity import pca_fit

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0])], ["vec_id", "embedding"]
    )
    with pytest.raises(ValueError, match="ragged"):
        pca_fit(df, "embedding", k=1)


def test_weighted_sample_excludes_null_keys(spark):
    df = spark.createDataFrame(
        [(None, 5.0), (2, 1.0)], "id int, w double"
    )
    got = [r["id"] for r in weighted_sample(df, "id", "w", k=10).collect()]
    assert got == [2]


def test_cdf_normalize_ranks_ties_and_nulls(spark):
    from atiesh_spark.operators.profile import cdf_normalize

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 5.0), ("a", None), ("b", 9.0)],
        "g string, v double",
    )
    got = {
        (r["g"], r["v"]): r["pct_rank"]
        for r in cdf_normalize(df, ["g"], "v").collect()
    }
    # percent_rank: (rank - 1) / (n - 1); ties share; NULL stays NULL;
    # single-row group ranks 0
    assert got == {
        ("a", 1.0): 0.0,
        ("a", 2.0): 0.3333,
        ("a", 5.0): 1.0,
        ("a", None): None,
        ("b", 9.0): 0.0,
    }


# ------------------------------------------------------------- triangles

def test_triangle_stats_known_graph(spark):
    from atiesh_spark.operators.graph import triangle_stats

    # triangle {1,2,3} + pendant 4 + a square {5,6,7,8} (no triangles)
    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (5, 6), (6, 7), (7, 8), (5, 8)]
    df = spark.createDataFrame(edges, ["id_1", "id_2"])
    got = {r["node"]: r for r in triangle_stats(df).collect()}
    assert got[1]["n_triangles"] == 1 and got[1]["clustering"] == 1.0
    assert got[2]["n_triangles"] == 1
    # node 3: degree 3, one triangle -> cc = 2*1/(3*2)
    assert got[3]["degree"] == 3 and got[3]["clustering"] == 0.3333
    assert got[4]["n_triangles"] == 0 and got[4]["clustering"] == 0.0
    for n in (5, 6, 7, 8):
        assert got[n]["n_triangles"] == 0


def test_triangle_stats_matches_bruteforce_random_graph(spark):
    """Random-graph differential: per-node triangle counts and
    clustering coefficients vs an O(n^3) brute force. The known-graph
    test pins the formula on enumerable shapes; this pins the join
    pipeline on ~30-node graphs dense enough to have hundreds of
    wedge candidates."""
    import random
    from itertools import combinations

    from atiesh_spark.operators.graph import triangle_stats

    rng = random.Random(101)
    n = 30
    edges = sorted({(a, b) for a, b in
                    (sorted(rng.sample(range(n), 2)) for _ in range(140))})
    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri = {i: 0 for i in range(n)}
    for a, b, c in combinations(range(n), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1

    df = spark.createDataFrame(edges, ["id_1", "id_2"])
    got = {r["node"]: r for r in triangle_stats(df).collect()}
    for i in range(n):
        d = len(adj[i])
        if d == 0:
            assert i not in got  # isolated nodes don't appear in edges
            continue
        assert got[i]["degree"] == d
        assert got[i]["n_triangles"] == tri[i], f"node {i}"
        want_cc = round(2 * tri[i] / (d * (d - 1)), 4) if d > 1 else 0.0
        assert got[i]["clustering"] == pytest.approx(want_cc, abs=1e-4)


def test_pagerank_matches_numpy_power_iteration(spark):
    """Random-graph differential: the distributed join/groupBy rounds
    must reproduce a dense numpy power iteration of the same update
    (uniform start, r' = (1-d)/N + d * sum_in r/deg) to within the
    output rounding."""
    import random

    import numpy as np

    from atiesh_spark.operators.graph import pagerank

    rng = random.Random(85)
    n = 25
    edges = sorted({(a, b) for a, b in
                    (sorted(rng.sample(range(n), 2)) for _ in range(60))})
    nodes = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(nodes)}
    m = len(nodes)
    A = np.zeros((m, m))
    for a, b in edges:
        A[idx[a], idx[b]] = A[idx[b], idx[a]] = 1.0
    deg = A.sum(axis=1)
    d, iters = 0.85, 5
    r = np.full(m, 1.0 / m)
    for _ in range(iters):
        r = (1 - d) / m + d * (A.T @ (r / deg))

    df = spark.createDataFrame(edges, ["id_1", "id_2"])
    got = {row["node"]: row for row in
           pagerank(df, damping=d, iterations=iters).collect()}
    assert set(got) == set(nodes)
    for v in nodes:
        assert got[v]["degree"] == int(deg[idx[v]])
        assert got[v]["pagerank"] == pytest.approx(r[idx[v]], abs=2e-6), v


def test_triangle_stats_dedupes_and_canonicalizes_input(spark):
    from atiesh_spark.operators.graph import triangle_stats

    # duplicate edges and a self-loop must not inflate counts
    edges = [(1, 2), (1, 2), (1, 1), (1, 3), (2, 3)]
    df = spark.createDataFrame(edges, ["id_1", "id_2"])
    got = {r["node"]: r for r in triangle_stats(df).collect()}
    assert all(got[n]["n_triangles"] == 1 for n in (1, 2, 3))
    assert got[1]["degree"] == 2


def test_project_bipartite_counts_and_caps_hubs(spark):
    from atiesh_spark.operators.graph import project_bipartite

    rows = (
        [("p1", s) for s in (1, 2, 3)]       # p1 shared by 1,2,3
        + [("p2", s) for s in (1, 2)]        # p2 shared by 1,2
        + [("hub", s) for s in range(1, 9)]  # hub touches everyone
        + [("p1", 1)]                        # duplicate relation row
    )
    df = spark.createDataFrame(rows, ["part", "supp"])
    # uncapped: hub creates all 28 pairs
    full = {
        (r["id_1"], r["id_2"]): r["n_shared"]
        for r in project_bipartite(df, "part", "supp", max_left_degree=None).collect()
    }
    assert len(full) == 28 and full[(1, 2)] == 3
    # capped at 4: hub dropped entirely; only p1/p2 pairs remain
    capped = {
        (r["id_1"], r["id_2"]): r["n_shared"]
        for r in project_bipartite(df, "part", "supp", max_left_degree=4).collect()
    }
    assert capped == {(1, 2): 2, (1, 3): 1, (2, 3): 1}


def test_project_bipartite_feeds_triangle_stats(spark):
    from atiesh_spark.operators.graph import project_bipartite, triangle_stats

    rows = [("p", s) for s in (1, 2, 3)] + [("q", 4)]
    df = spark.createDataFrame(rows, ["part", "supp"])
    edges = project_bipartite(df, "part", "supp")
    got = {r["node"]: r["n_triangles"] for r in triangle_stats(edges).collect()}
    # supplier 4 shares no part with anyone: no edges, so it is absent
    # from the edge-derived graph entirely (isolated nodes live in the
    # entity table, not the pair table)
    assert got == {1: 1, 2: 1, 3: 1}


# ---------------------------------------------- round-4 advice guards

def test_pca_fit_rejects_null_elements_in_full_length_vectors(spark):
    """NULL elements keep the per-index row count intact while F.sum
    skips them — without the non-NULL count guard they would silently
    act as zeros in the covariance moments."""
    from atiesh_spark.operators.similarity import pca_fit

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, None])], "vec_id int, embedding array<double>"
    )
    with pytest.raises(ValueError, match="NULL"):
        pca_fit(df, "embedding", k=1)


def test_triangle_stats_shuffle_join_mode_matches_broadcast(spark):
    from atiesh_spark.operators.graph import triangle_stats

    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (5, 6), (6, 7), (7, 8), (5, 8)]
    df = spark.createDataFrame(edges, ["id_1", "id_2"])

    def canon(res):
        return sorted(
            (r["node"], r["degree"], r["n_triangles"], r["clustering"])
            for r in res.collect()
        )

    bcast = triangle_stats(df)
    shuffle = triangle_stats(df, broadcast_degrees=False)
    assert canon(bcast) == canon(shuffle)
    plan = shuffle._jdf.queryExecution().optimizedPlan().toString().lower()
    assert "broadcast" not in plan


def test_q87_oracle_deterministic_under_tied_timestamps(spark):
    """Round-3 advice: the oracle's lead window must tiebreak on
    event_id like the engine does, or two change points at an identical
    ts make the oracle's valid_to nondeterministic. Plants exactly that
    tie and requires engine == oracle."""
    import duckdb
    import pandas as pd

    from atiesh_spark.operators.diffing import scd2_intervals
    from atiesh_spark.plans import QUERIES

    rows = [
        # user 7: two change points at the SAME ts (event_id breaks the tie)
        (7, "e1", "login", pd.Timestamp("2024-01-01 00:00:00")),
        (7, "e2", "click", pd.Timestamp("2024-01-01 00:05:00")),
        (7, "e3", "buy", pd.Timestamp("2024-01-01 00:05:00")),
        (7, "e4", "logout", pd.Timestamp("2024-01-01 00:09:00")),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "event_id", "event_type", "ts"])
    engine = scd2_intervals(
        spark.createDataFrame(pdf),
        keys=["user_id"],
        order_col="ts",
        tracked_cols=["event_type"],
        tiebreak_cols=["event_id"],
    )
    e_rows = sorted(
        (r["user_id"], r["event_type"], r["valid_from"].isoformat(),
         r["valid_to"].isoformat() if r["valid_to"] else None, r["is_current"])
        for r in engine.collect()
    )
    con = duckdb.connect()
    con.register("events", pdf)
    o_rows = sorted(
        (u, et, vf.isoformat(), vt.isoformat() if vt else None, cur)
        for u, et, vf, vt, cur in con.sql(
            QUERIES["q87_scd2_intervals"].oracle
        ).fetchall()
    )
    assert e_rows == o_rows
    # the tie itself: click's interval must close at the SAME tied ts
    tied = [r for r in e_rows if r[1] == "click"]
    assert tied and tied[0][3] == "2024-01-01T00:05:00"


def test_pagerank_cycle_is_uniform_and_conserves_mass(spark):
    """On a vertex-transitive graph (a cycle) PageRank is exactly
    uniform at every iteration; total mass is 1 regardless."""
    from atiesh_spark.operators.graph import pagerank

    n = 6
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n - 1)] + [(0, n - 1)],
        "id_1 int, id_2 int",
    )
    rows = pagerank(edges, iterations=3).collect()
    assert len(rows) == n
    for r in rows:
        assert r["pagerank"] == pytest.approx(1.0 / n, abs=1e-6)
        assert r["degree"] == 2
    assert sum(r["pagerank"] for r in rows) == pytest.approx(1.0, abs=1e-5)


def test_pagerank_hub_outranks_pendant(spark):
    """A star's hub must outrank its leaves, and a python reference of
    the same recurrence must agree to rounding."""
    from atiesh_spark.operators.graph import pagerank

    leaves = list(range(1, 6))
    edges = spark.createDataFrame(
        [(0, l) for l in leaves], "id_1 int, id_2 int"
    )
    got = {r["node"]: r["pagerank"] for r in pagerank(edges, iterations=4).collect()}
    # python reference, same synchronous recurrence
    nodes = [0] + leaves
    deg = {0: 5, **{l: 1 for l in leaves}}
    adj = {0: leaves, **{l: [0] for l in leaves}}
    r = {v: 1 / 6 for v in nodes}
    for _ in range(4):
        r = {
            v: 0.15 / 6 + 0.85 * sum(r[u] / deg[u] for u in adj[v])
            for v in nodes
        }
    assert got[0] > got[1]
    for v in nodes:
        assert got[v] == pytest.approx(round(r[v], 6), abs=1e-6)


def test_pagerank_validation(spark):
    from atiesh_spark.operators.graph import pagerank

    edges = spark.createDataFrame([(1, 2)], "id_1 int, id_2 int")
    with pytest.raises(ValueError):
        pagerank(edges, damping=1.0)
    with pytest.raises(ValueError):
        pagerank(edges, iterations=0)


def test_pagerank_canonicalizes_reversed_edges(spark):
    """An edge supplied as (dst, src) must count, not silently drop
    (least/greatest canonicalization): reversed-and-duplicated input
    gives the same ranks as the canonical form."""
    from atiesh_spark.operators.graph import pagerank

    canon = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "id_1 long, id_2 long"
    )
    messy = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 1), (1, 3), (4, 3), (3, 3)],
        "id_1 long, id_2 long",
    )  # reversed, duplicated across orientations, plus a self-loop
    a = sorted(map(tuple, pagerank(canon, iterations=3).collect()))
    b = sorted(map(tuple, pagerank(messy, iterations=3).collect()))
    assert a == b


# ------------------------------------------------------------- drift

def test_drift_report_known_categorical_psi(spark):
    import math

    from atiesh_spark.operators.profile import drift_report

    a = spark.createDataFrame([("a",)] * 3 + [("b",)], "lang string")
    b = spark.createDataFrame([("a",)] + [("b",)] * 3, "lang string")
    rows = {
        r["category"]: r
        for r in drift_report(a, b, categorical_cols=["lang"]).collect()
    }
    # s=0.5, K=2, Na=Nb=4: p_a(a)=3.5/5, p_b(a)=1.5/5 and mirrored for b
    want = (0.7 - 0.3) * math.log(0.7 / 0.3)
    assert rows["a"]["p_a"] == pytest.approx(0.7)
    assert rows["a"]["contrib"] == pytest.approx(want, abs=1e-6)
    assert rows["b"]["contrib"] == pytest.approx(want, abs=1e-6)
    assert rows["a"]["psi"] == pytest.approx(2 * want, abs=1e-5)


def test_drift_report_identical_snapshots_zero_psi(spark):
    from atiesh_spark.operators.profile import drift_report

    df = spark.createDataFrame(
        [(float(i), "x" if i % 2 else "y") for i in range(50)],
        "v double, c string",
    )
    rows = drift_report(
        df, df, numeric_cols=["v"], categorical_cols=["c"], num_bins=5
    ).collect()
    assert all(abs(r["psi"]) < 1e-6 for r in rows)
    assert all(r["n_a"] == r["n_b"] for r in rows)


def test_drift_report_numeric_grid_and_clamping(spark):
    from atiesh_spark.operators.profile import drift_report

    a = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
    # B has mass far outside A's [0, 9] domain on both sides
    b = spark.createDataFrame(
        [(-100.0,), (-5.0,), (4.5,), (50.0,)], "v double"
    )
    rows = drift_report(a, b, numeric_cols=["v"], num_bins=4).collect()
    assert len(rows) == 4  # full grid emitted, empty bins included
    by_bin = {r["bin_idx"]: r for r in rows}
    assert by_bin[0]["n_b"] == 2  # clamped below
    assert by_bin[3]["n_b"] == 1  # clamped above
    assert sum(r["n_b"] for r in rows) == 4
    # psi equals the sum of the emitted contribs
    assert rows[0]["psi"] == pytest.approx(
        sum(r["contrib"] for r in rows), abs=1e-4
    )


def test_drift_report_new_category_counted(spark):
    from atiesh_spark.operators.profile import drift_report

    a = spark.createDataFrame([("en",)], "lang string")
    b = spark.createDataFrame([("en",), ("zh",)], "lang string")
    rows = {
        r["category"]: r
        for r in drift_report(a, b, categorical_cols=["lang"]).collect()
    }
    assert rows["zh"]["n_a"] == 0 and rows["zh"]["n_b"] == 1
    assert rows["zh"]["contrib"] != 0.0


def test_drift_report_validates_args(spark):
    from atiesh_spark.operators.profile import drift_report

    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError, match="feature"):
        drift_report(df, df)
    with pytest.raises(ValueError, match="smoothing"):
        drift_report(df, df, numeric_cols=["v"], smoothing=0.0)
    with pytest.raises(ValueError, match="num_bins"):
        drift_report(df, df, numeric_cols=["v"], num_bins=0)


def test_drift_report_raises_on_all_null_reference(spark):
    # With an empty/all-NULL snapshot A the bounds are NULL and the
    # whole numeric report would be silently meaningless; the operator
    # must fail loudly when the plan executes instead.
    import pytest as _pt

    from atiesh_spark.operators.profile import drift_report

    a = spark.createDataFrame([(None,), (None,)], "v double")
    b = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    with _pt.raises(Exception, match="non-NULL rows in reference"):
        drift_report(a, b, numeric_cols=["v"]).collect()


def test_dataset_card_known_values(spark):
    from atiesh_spark.operators.profile import dataset_card

    df = spark.createDataFrame(
        [
            (1, "en", "same text"),
            (2, "en", "same text"),       # exact dup pair within en
            (3, "en", "unique one"),
            (4, "fr", "same text"),       # dup crosses groups: counts in fr too
            (5, "fr", "two words here"),
        ],
        "doc_id long, lang string, text string",
    )
    rows = {r["lang"]: r for r in dataset_card(df, "lang", "text", "doc_id").collect()}
    en, fr = rows["en"], rows["fr"]
    assert en["n_docs"] == 3 and abs(en["doc_share"] - 0.6) < 1e-9
    assert en["n_exact_dup_docs"] == 2  # both copies flagged
    assert fr["n_exact_dup_docs"] == 1  # cross-group copy flagged
    assert en["total_chars"] == 9 + 9 + 10
    assert abs(fr["mean_words"] - 2.5) < 1e-9
    assert en["p50_chars"] == 9.0
