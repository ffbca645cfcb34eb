"""Triangle counting over an undirected edge list (SURVEY.md §2B
analytics family; the third graph primitive next to the dedup
family's connected components and the fixed-point PageRank query).

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

from pyspark.sql import DataFrame
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
