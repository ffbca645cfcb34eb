"""Graph primitives over undirected edge lists (SURVEY.md §2B
analytics family; siblings of the dedup family's connected components
and the fixed-point PageRank query): triangle counting and label-
propagation community detection.

The naive three-way self-join touches every wedge twice and every
triangle six times; the standard distributed formulation (node-
iterator++ / the MapReduce algorithm of Suri & Vassilvitskii 2011)
ORIENTS each undirected edge from its lower-(degree, id) endpoint to
the higher one, which (a) counts each triangle exactly once and (b)
bounds the per-node out-degree by O(sqrt(m)), so the wedge join — the
quadratic step — generates at most m^{3/2} candidates instead of
sum(deg^2). That orientation is why this shape survives power-law
graphs at scale: hub nodes get huge IN-degree but tiny out-degree,
and wedges only multiply across OUT-edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def triangle_count(edges: DataFrame, u_col: str = "u", v_col: str = "v") -> DataFrame:
    """Count triangles in the undirected simple graph given as a
    deduplicated edge list (one row per edge, ``u != v``; either
    endpoint order accepted).

    Returns one row: ``(n_nodes, n_edges, n_triangles)``.

    Shape: one degree aggregation, two broadcast-or-hash joins to
    rank endpoints, one wedge self-join keyed on the shared middle
    node (out-degree-bounded fan-out — see module docstring), and one
    semi join probing each wedge for its closing edge. Every join is
    an equi join; nothing driver-side.
    """
    canon = (
        edges.select(
            F.least(F.col(u_col), F.col(v_col)).alias("u"),
            F.greatest(F.col(u_col), F.col(v_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        # canon feeds FIVE consumers (degrees, both wedge sides, the
        # closing-edge probe, the edge count): materialize it once so
        # the upstream edge-building pipeline isn't re-executed per
        # consumer — the same lineage-truncation discipline the
        # iterative graph operators (CC, PageRank) use
        .localCheckpoint()
    )

    deg = (
        canon.select(F.col("u").alias("node"))
        .unionAll(canon.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(
        F.col("node").alias("u"),
        F.col("deg").alias("du"),
    )
    dv = deg.select(
        F.col("node").alias("v"),
        F.col("deg").alias("dv"),
    )
    ranked = canon.join(du, "u").join(dv, "v")
    # orient low-(degree, id) -> high-(degree, id)
    lo_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    ).localCheckpoint()  # both wedge sides read it
    e1 = oriented.select(F.col("a"), F.col("b").alias("x"))
    e2 = oriented.select(F.col("a"), F.col("b").alias("y"))
    wedges = e1.join(e2, "a").filter(F.col("x") < F.col("y"))
    # a wedge (a; x, y) closes iff {x, y} is an edge — probe the
    # CANONICAL list (orientation of the closing edge is irrelevant)
    closing = canon.select(
        F.col("u").alias("x"), F.col("v").alias("y")
    )
    tri = wedges.join(closing, ["x", "y"], "left_semi")
    counts = canon.agg(
        F.count(F.lit(1)).alias("n_edges"),
    ).crossJoin(deg.agg(F.count(F.lit(1)).alias("n_nodes"))).crossJoin(
        tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return counts.select("n_nodes", "n_edges", "n_triangles")


def label_propagation(
    edges: DataFrame,
    iterations: int = 4,
    u_col: str = "u",
    v_col: str = "v",
    weight_col: str | None = None,
) -> DataFrame:
    """Community detection by SYNCHRONOUS weighted label propagation
    (Raghavan et al. 2007, made deterministic): every node starts with
    its own id as label; each iteration every node simultaneously
    adopts the label carrying the largest total incident edge weight
    among its neighbors' CURRENT labels, ties broken by the smallest
    label. A fixed iteration count plus the synchronous update and the
    total-order tiebreak make the result a pure function of the edge
    list — no RNG, no visit-order dependence — so an oracle can replay
    the exact schedule.

    Returns ``(node, label)`` — one row per node; nodes sharing a
    label after the final iteration are one community.

    Shape per iteration: one equi join of the (symmetrized) edge list
    against the current label assignment on the neighbor endpoint, one
    (node, label) weight aggregation, one per-node arg-max window.
    Label state is one row per node and the join is always
    neighbor-keyed — the same per-round cost profile as the dedup
    family's ``connected_components_star``, so the operator scales to
    any graph whose edge list shuffles; ``localCheckpoint`` truncates
    the otherwise-exponential iteration lineage.
    """
    w_expr = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    half = edges.select(
        F.col(u_col).alias("src"),
        F.col(v_col).alias("dst"),
        w_expr.alias("w"),
    ).filter(F.col("src") != F.col("dst"))
    sym = half.unionAll(
        half.select(
            F.col("dst").alias("src"),
            F.col("src").alias("dst"),
            F.col("w"),
        )
    )
    # one row per directed (src, dst): parallel edges collapse to a
    # summed weight so each neighbor votes once per iteration
    adj = (
        sym.groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    labels = (
        adj.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    pick = Window.partitionBy("node").orderBy(
        F.col("vote").desc(), F.col("label")
    )
    for _ in range(iterations):
        votes = (
            adj.join(
                labels.select(
                    F.col("node").alias("dst"), F.col("label")
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("node"), "label")
            .agg(F.sum("w").alias("vote"))
        )
        labels = (
            votes.withColumn("rk", F.row_number().over(pick))
            .filter(F.col("rk") == 1)
            .select("node", "label")
            .localCheckpoint(eager=True)
        )
    return labels


# Frontier/reached sets up to this many rows are broadcast inside
# bfs_layers' per-round joins (~10-20 MB of longs at the limit — well
# inside executor broadcast budgets); larger sets fall back to the
# shuffle join.
_BFS_BCAST_ROWS = 1_000_000


def bfs_layers(
    edges: DataFrame,
    source,
    max_hops: int = 4,
    u_col: str = "u",
    v_col: str = "v",
    edges_distinct: bool = False,
    n_nodes: int | None = None,
) -> DataFrame:
    """Bounded-horizon breadth-first search over an undirected edge
    list: the exact hop distance from ``source`` for every node within
    ``max_hops``, as one ``(node, dist)`` row per reached node.

    Shape: FRONTIER-based — round i joins only the nodes first reached
    at distance i-1 against the adjacency list (never the full
    distance table), then anti-joins the already-reached set, so total
    work is O(sum of frontier degrees) across rounds — the standard
    distributed BFS. Each round is one equi join + one anti join;
    ``localCheckpoint`` truncates the per-round lineage. A bounded
    ``max_hops`` keeps the round count fixed and plan-compile-time
    known (full-graph BFS = raise max_hops past the diameter).

    ``edges_distinct=True`` skips the adjacency-wide dedup shuffle
    (the single largest exchange in this operator). Duplicate edges
    are never a CORRECTNESS hazard — each round's neighbor set is
    deduplicated anyway — only a work multiplier on the per-round
    join, so set this whenever the input's duplication factor is
    small (e.g. the co-order pair build: ~1.2x), not only when the
    input is provably distinct.

    ``n_nodes``: the size of the node universe, if the caller already
    knows it (or can count it off an already-materialized frame for
    less than a BFS round costs). When given, each round's frontier
    is counted (cheap: the frontiers are cached), the loop exits as
    soon as every node is reached or a frontier comes back empty (on
    small-diameter graphs that skips whole no-op rounds that would
    otherwise still join the full adjacency), and — because the
    frontier/reached sizes are then KNOWN driver-side — rounds whose
    probe sets are under ``_BFS_BCAST_ROWS`` use explicit broadcast
    joins, so the (large) adjacency never shuffles: each round is a
    map-side hash join over the cached adjacency plus one node-sized
    dedup exchange. Oversized frontiers fall back to the shuffle
    join automatically — the broadcast is a bounded optimization,
    never a scale assumption.

    Round-scheduling costs (r13; same playbook as the star-CC
    finisher work): the seed is a LITERAL one-row frame (the source
    is at distance 0 by definition — no job spent scanning the
    adjacency for it; an absent/isolated source still reports itself
    at dist 0), and every per-round checkpoint is LAZY
    (``localCheckpoint(eager=False)``): the RDD is still cached on
    first computation — so each frontier's two consumers (the next
    round's join and the result union) share one materialization and
    the per-round lineage stays truncated — but nothing schedules a
    separate job per round. With a bounded ``max_hops`` the whole
    search collapses into the single job of whatever action consumes
    the result: measured 8 jobs -> 1 on the co-order BFS query, the
    dominant cost at bench scale where per-job fixed overhead, not
    data, bounds iterative operators.
    """
    half = edges.select(
        F.col(u_col).alias("src"), F.col(v_col).alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    # double in ONE pass (explode of the two orientations) — a
    # unionAll of half with its own reversal would execute the
    # upstream edge-building plan twice
    doubled = half.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(
                    F.col("dst").alias("src"),
                    F.col("src").alias("dst"),
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    if not edges_distinct:
        doubled = doubled.distinct()
    adj = doubled.localCheckpoint(eager=False)
    # literal seed, cast to the edge-endpoint type
    node_type = adj.schema["src"].dataType
    reached = adj.sparkSession.range(1).select(
        F.lit(source).cast(node_type).alias("node"),
        F.lit(0).alias("dist"),
    )
    frontier = reached
    n_front: int | None = 1  # the literal seed; None = size unknown
    n_reached = 1
    for hop in range(1, max_hops + 1):
        probe = frontier.select(F.col("node").alias("src"))
        if n_front is not None and n_front <= _BFS_BCAST_ROWS:
            probe = F.broadcast(probe)
        neighbors = (
            adj.join(probe, "src")
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        seen = reached.select("node")
        if n_nodes is not None and n_reached <= _BFS_BCAST_ROWS:
            seen = F.broadcast(seen)
        frontier = (
            neighbors.join(seen, "node", "left_anti")
            .select("node", F.lit(hop).alias("dist"))
            .localCheckpoint(eager=False)
        )
        # reached is a union of checkpoints — its lineage is already
        # shallow; checkpointing it again would add nothing
        reached = reached.unionAll(frontier)
        if n_nodes is not None and hop < max_hops:
            n_front = frontier.count()
            n_reached += n_front
            if n_front == 0 or n_reached >= n_nodes:
                break
        else:
            n_front = None
    return reached


def kcore(
    edges: DataFrame,
    *,
    k: int,
    rounds: int,
    u_col: str = "u",
    v_col: str = "v",
) -> DataFrame:
    """k-core decomposition by bounded iterative peeling (Seidman
    1983; the distributed formulation of Montresor et al. 2013): each
    round drops every node whose degree in the CURRENT induced
    subgraph is below ``k``, until the fixpoint — the unique maximal
    subgraph where every node keeps >= k neighbors. Returns one
    ``(node, deg)`` row per survivor, ``deg`` its degree inside the
    core.

    Bounded-horizon discipline (same contract as :func:`bfs_layers`):
    exactly ``rounds`` peel passes, so the plan depth is compile-time
    known — peeling past the fixpoint is a no-op, and an UNconverged
    run is self-evident in the output (some ``deg < k`` survives), so
    callers assert convergence on the result, not on trust. A
    converged-early run exits the loop as soon as an eager checkpoint
    reports the edge count unchanged.

    Shape: per round, one map-side-combinable degree aggregation and
    two semi joins of the edge list against the (node-sized) keep
    set — work shrinks monotonically with the peeled graph, and
    ``localCheckpoint`` truncates the per-round lineage. The k-core is
    order-confluent (any peel schedule reaches the same fixpoint), so
    whole-round peeling loses nothing vs sequential removal.
    """
    half = edges.select(
        F.col(u_col).alias("src"), F.col(v_col).alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    adj = (
        half.unionAll(
            half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_prev = adj.count()
    for _ in range(rounds):
        keep = (
            adj.groupBy("src")
            .agg(F.count(F.lit(1)).alias("dg"))
            .filter(F.col("dg") >= k)
            .select("src")
        )
        adj = (
            adj.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
        n = adj.count()
        if n == n_prev:
            break
        n_prev = n
    return adj.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 4,
    scale: int = 10**12,
    damping_pct: int = 85,
    seed_node=None,
) -> DataFrame:
    """Weighted PageRank over a directed edge list ``(src, dst, cnt)``
    in FIXED-POINT integer arithmetic — the event_type_pagerank
    discipline factored into an operator: ranks scaled by ``scale``,
    every step a bigint multiply + truncating ``div``, so the result
    is bit-identical across engines and partitionings (no float
    summation order). Nodes = all endpoints; dangling mass
    evaporates (renormalizes toward the base term) identically in
    both engines.

    Returns ``(node, r)`` with ``r`` the scaled rank after ``iters``
    synchronous rounds.

    Shape: edges and the node set are persisted once
    (localCheckpoint — they are re-read every round); each round is
    one join of the rank vector onto edges keyed on src + one
    map-side-combinable aggregate on dst. On a schema-bounded graph
    the rank vector broadcasts; on a big graph the same loop runs as
    shuffle joins on src. Overflow bound: r * cnt must stay under
    2^63 — rank mass totals ~``scale``, so max edge weight up to
    ~2^63/``scale`` is safe; heavier graphs pre-normalize weights.
    """
    e = (
        edges.select("src", "dst", "cnt")
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.sum("cnt").alias("tot"))
    ew = e.join(deg, "src").localCheckpoint(eager=True)
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    base_pct = 100 - damping_pct
    if seed_node is None:
        # uniform teleport: base mass scale/n at every node
        base = F.expr(f"({base_pct} * ({scale} div n)) div 100")
        rank = nodes.crossJoin(F.broadcast(nn)).select(
            "node", F.expr(f"{scale} div n").alias("r")
        )
    else:
        # PERSONALIZED teleport (random walk with restart): the whole
        # base mass concentrates on the seed, so ranks measure
        # proximity to it rather than global centrality
        seed = F.lit(seed_node)
        base = F.when(
            F.col("node") == seed, F.lit((base_pct * scale) // 100)
        ).otherwise(F.lit(0))
        rank = nodes.select(
            "node",
            F.when(F.col("node") == seed, F.lit(scale))
            .otherwise(F.lit(0))
            .alias("r"),
        )
    for _ in range(iters):
        contrib = (
            ew.join(rank.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr("(r * cnt) div tot").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranked = (
            nodes.crossJoin(F.broadcast(nn))
            .join(
                contrib.withColumnRenamed("dst", "node"), "node", "left"
            )
            .select(
                "node",
                (
                    base
                    + F.expr(
                        f"({damping_pct} * coalesce(s, 0)) div 100"
                    )
                ).cast("long").alias("r"),
            )
        )
        rank = ranked
    return rank


def sssp_bounded(
    edges: DataFrame,
    source,
    rounds: int = 4,
    u_col: str = "u",
    v_col: str = "v",
    w_col: str = "w",
    directed: bool = False,
) -> DataFrame:
    """Bounded-round single-source shortest paths over a weighted
    edge list (non-negative integer weights): ``rounds``
    synchronous min-plus relaxations — Bellman–Ford restricted to
    paths of <= ``rounds`` edges — returning one ``(node, dist)`` row
    per reached node with the exact minimum path weight.

    Delta-frontier discipline: each round relaxes ONLY the nodes
    whose distance improved in the previous round (an unchanged
    node's offers were already folded in an earlier round, so the
    result is identical to full Bellman–Ford at every round — that
    equivalence is what the unrolled full-relaxation oracle checks).
    Total work is O(sum of improved-frontier degrees), the weighted
    analogue of :func:`bfs_layers`' frontier join; one eager
    checkpoint per round truncates lineage exactly like the other
    fixed-round graph operators.

    ``directed=True`` treats the input as an already-directed
    adjacency (per-node out-edges — e.g. a kNN graph, where
    neighborhoods are asymmetric) and skips the doubling.
    """
    half = edges.select(
        F.col(u_col).alias("src"),
        F.col(v_col).alias("dst"),
        F.col(w_col).cast("long").alias("w"),
    ).filter(F.col("src") != F.col("dst"))
    if directed:
        adj = half.localCheckpoint(eager=True)
    else:
        # one-pass doubling (see bfs_layers): a unionAll of half with
        # its reversal would run the upstream edge build twice
        adj = (
            half.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("src"), F.col("dst"), F.col("w")
                        ),
                        F.struct(
                            F.col("dst").alias("src"),
                            F.col("src").alias("dst"),
                            F.col("w"),
                        ),
                    )
                ).alias("e")
            )
            .select("e.src", "e.dst", "e.w")
            .localCheckpoint(eager=True)
        )
    dist = (
        adj.select(F.col("src").alias("node"))
        .filter(F.col("node") == F.lit(source))
        .distinct()
        .select("node", F.lit(0).cast("long").alias("dist"))
        .localCheckpoint(eager=True)
    )
    frontier = dist
    for _ in range(rounds):
        # raw (un-aggregated) offers union the settled distances, then
        # ONE min-agg computes the new distance AND the old distance
        # side by side — merged/frontier fall out of a single shuffle
        # and a single checkpoint per round instead of three
        offers = adj.join(
            frontier.select(
                F.col("node").alias("src"),
                F.col("dist").alias("fd"),
            ),
            "src",
        ).select(
            F.col("dst").alias("node"),
            (F.col("fd") + F.col("w")).alias("dist"),
            F.lit(0).alias("is_old"),
        )
        merged = (
            dist.select("node", "dist", F.lit(1).alias("is_old"))
            .unionByName(offers)
            .groupBy("node")
            .agg(
                F.min("dist").alias("dist"),
                F.min(
                    F.when(F.col("is_old") == 1, F.col("dist"))
                ).alias("old_dist"),
            )
            .localCheckpoint(eager=True)
        )
        frontier = merged.filter(
            F.col("old_dist").isNull()
            | (F.col("dist") < F.col("old_dist"))
        ).select("node", "dist")
        dist = merged.select("node", "dist")
    return dist
