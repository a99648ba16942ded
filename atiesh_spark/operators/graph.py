"""Graph analytics over pair tables: exact triangle counting and local
clustering coefficients.

The near-dup operators (SimHash pairs, LSH pairs, window overlap)
produce undirected edge tables; triangle density is the classic signal
separating genuine duplicate CLUSTERS (near-cliques: template families,
mirror sites) from chains of borderline pairs (near-zero closure). The
same statistic drives community detection and spam-farm detection on
link graphs.

Scale design: the naive wedge join (edges joined on the shared
endpoint) explodes on hubs — a degree-d node contributes d^2 wedges.
Triangle counting here uses DEGREE-ORDERED ORIENTATION (the standard
distributed remedy): each undirected edge points from its lower-
(degree, id) endpoint to the higher one, making the oriented
out-degree O(sqrt(m)) regardless of hub size, so the wedge join is
bounded by m^1.5 total work — the best known bound for exact listing.
Every triangle is counted exactly once (its vertices form a total
order under (degree, id); the wedge is anchored at the smallest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_stats(
    edges: DataFrame,
    src: str = "id_1",
    dst: str = "id_2",
    round_to: int = 4,
    broadcast_degrees: bool = True,
) -> DataFrame:
    """Per-node triangle statistics over an undirected simple graph:
    (node, degree, n_triangles, clustering) — ``clustering`` is the
    local coefficient 2T / (d * (d - 1)) (0.0 for degree < 2).

    ``edges`` must hold each undirected edge ONCE with ``src < dst``
    (the canonical form every pair operator here emits). Rows violating
    that (self-loops, reversed duplicates) are filtered/deduplicated
    defensively up front — one narrow distinct over (a, b) — because a
    duplicate edge would silently double-count every statistic.

    Plan shape: one groupBy for degrees (broadcast back — the degree
    table is node-sized), a codegen orientation flip, then the bounded
    wedge join + closure join on oriented edges. Per-node counts come
    from exploding each triangle's three vertices — exactly 3 rows per
    triangle, map-side combined.

    ``broadcast_degrees`` (default True) hints the degree-table joins
    as broadcasts; on a graph whose NODE count itself exceeds the
    broadcast/driver budget, pass False to degrade to shuffle joins
    instead of OOMing — the same escape hatch as
    ``corpus.line_dedup(broadcast_common=False)``.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") < F.col("b")
    ).distinct()
    deg = (
        e.select(F.col("a").alias("n"))
        .union(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    # orient: lower (degree, id) -> higher; ties broken by id so the
    # order is total and every triangle is anchored exactly once
    da = deg.select(F.col("n").alias("a"), F.col("degree").alias("__da"))
    db = deg.select(F.col("n").alias("b"), F.col("degree").alias("__db"))
    if broadcast_degrees:
        da, db = F.broadcast(da), F.broadcast(db)
    keyed = e.join(da, "a").join(db, "b")
    a_first = (F.col("__da") < F.col("__db")) | (
        (F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))
    )
    oriented = keyed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    # wedge (u -> v, v -> w) closed by oriented edge (u -> w)
    o1 = oriented.select(F.col("u"), F.col("v"))
    o2 = oriented.select(F.col("u").alias("v"), F.col("v").alias("w"))
    o3 = oriented.select(F.col("u"), F.col("v").alias("w"))
    triangles = (
        o1.join(o2, "v")
        .join(o3, ["u", "w"], "left_semi")
        .select("u", "v", "w")
    )
    per_node = (
        triangles.select(F.explode(F.array("u", "v", "w")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    cc = F.when(
        F.col("degree") >= 2,
        F.round(
            2.0 * F.coalesce(F.col("n_triangles"), F.lit(0))
            / (F.col("degree") * (F.col("degree") - 1)),
            round_to,
        ),
    ).otherwise(F.lit(0.0))
    return (
        deg.join(per_node, "n", "left")
        .select(
            F.col("n").alias("node"),
            F.col("degree"),
            F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
            cc.alias("clustering"),
        )
    )


def project_bipartite(
    df: DataFrame,
    left_col: str,
    right_col: str,
    max_left_degree: int | None = 1000,
    min_shared: int = 1,
) -> DataFrame:
    """Project a bipartite relation onto its RIGHT side: edges between
    right-nodes sharing >= ``min_shared`` left-nodes, canonical
    ``id_1 < id_2`` with ``n_shared`` — the co-occurrence graph builder
    (suppliers sharing parts, docs sharing rare windows, users sharing
    sessions) whose output feeds :func:`triangle_stats` and
    ``dedup.connected_components``.

    The scale hazard is the self-join's quadratic fan-out on hub
    left-nodes: a left-node shared by d right-nodes emits d^2 pairs, so
    one viral item can dominate the whole job. ``max_left_degree``
    DROPS left-nodes above the cap before pairing (default 1000 ->
    <= 1e6 pairs per left-node): the same heavy-tail cut every
    co-occurrence pipeline applies, because a left-node shared by
    everyone carries no signal about any particular pair — identical
    in spirit to ``corpus.line_dedup``'s boilerplate cap and
    ``window_overlap_pairs``' max_doc_freq. Pass ``None`` to disable
    (exact projection; only safe when left degrees are bounded by
    construction).

    Plan shape: one distinct over (left, right), a degree groupBy
    broadcast back as the cap filter, then the keyed self-join +
    pair-count groupBy. Nothing quadratic survives past the capped
    join input.
    """
    if min_shared <= 0:
        raise ValueError("min_shared must be > 0")
    if max_left_degree is not None and max_left_degree < 2:
        raise ValueError("max_left_degree must be >= 2 (or None)")
    rel = df.select(
        F.col(left_col).alias("__l"), F.col(right_col).alias("__r")
    ).distinct()
    if max_left_degree is not None:
        deg = (
            rel.groupBy("__l")
            .agg(F.count(F.lit(1)).alias("__d"))
            .filter(F.col("__d") <= max_left_degree)
            .select("__l")
        )
        rel = rel.join(F.broadcast(deg), "__l", "left_semi")
    a = rel.select("__l", F.col("__r").alias("id_1"))
    b = rel.select("__l", F.col("__r").alias("id_2"))
    return (
        a.join(b, "__l")
        .filter(F.col("id_1") < F.col("id_2"))
        .groupBy("id_1", "id_2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 5,
    src: str = "id_1",
    dst: str = "id_2",
    round_to: int = 6,
) -> DataFrame:
    """PageRank on an undirected simple graph: (node, degree, pagerank)
    after ``iterations`` synchronous power-iteration rounds from the
    uniform start, r' = (1-d)/N + d * sum_in r(u)/deg(u).

    The influence/centrality score for link graphs, citation networks
    and co-occurrence graphs (feeds source weighting and spam-farm
    demotion in crawl curation). Undirected: each edge contributes in
    both directions, so every node with an edge has in-flow and the
    dangling-mass term vanishes (isolated nodes don't exist in an edge
    list by construction).

    Scale shape: edges symmetrize and localCheckpoint ONCE with their
    degree dim; each round is one keyed join + one map-side-combined
    groupBy on the node-sized rank frame, checkpointed to truncate the
    per-round lineage (the CC/BPE discipline). Driver traffic per
    round: nothing — the loop is a fixed count, no convergence poll.
    A fixed iteration count is the batch-pipeline convention (rank
    ordering stabilizes long before values; 5-10 rounds is standard).
    """
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if iterations <= 0:
        raise ValueError("iterations must be positive")
    # canonicalize instead of assuming src<dst: an edge supplied as
    # (b, a) still counts once (self-loops dropped) — unlike
    # triangle_stats, which REQUIRES pre-canonicalized input
    e = edges.select(
        F.least(F.col(src), F.col(dst)).alias("a"),
        F.greatest(F.col(src), F.col(dst)).alias("b"),
    ).filter(F.col("a") < F.col("b")).distinct()
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    graph = (
        sym.join(deg.withColumnRenamed("node", "a"), "a")
        .select("a", "b", "degree")
        .localCheckpoint()
    )
    n_nodes = deg.agg(F.count(F.lit(1)).alias("__n"))
    ranks = deg.crossJoin(F.broadcast(n_nodes)).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("r")
    ).localCheckpoint()
    for _ in range(iterations):
        inflow = (
            graph.join(ranks.withColumnRenamed("node", "a"), "a")
            .groupBy(F.col("b").alias("node"))
            .agg(F.sum(F.col("r") / F.col("degree")).alias("__in"))
        )
        ranks = (
            deg.select("node")
            .join(inflow, "node", "left")
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("__n")
                    + damping * F.coalesce(F.col("__in"), F.lit(0.0))
                ).alias("r"),
            )
            .localCheckpoint()
        )
    return deg.join(ranks, "node").select(
        "node", "degree", F.round(F.col("r"), round_to).alias("pagerank")
    )
