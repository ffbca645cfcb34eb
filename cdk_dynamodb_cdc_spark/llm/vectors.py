"""Similarity search over the `embeddings` table (SURVEY.md §2C).

Two paths:

* :func:`cosine_topk` — exact brute force: broadcast the (small) query
  set against the corpus, cosine via JVM higher-order functions
  (zip_with + aggregate in double), per-query top-k window. The
  correctness baseline. Scale shape: candidates never shuffle — the
  only shuffle is the final per-query top-k (k rows per partition
  survive the partial sort), so 100 TB of vectors stream map-side.

* :func:`ann_cosine_topk` — approximate: sign-random-projection LSH
  (fixed seeded hyperplanes -> n-bit bucket), multiprobe at Hamming
  distance <= 2, exact cosine only within probed buckets. Trades
  recall for touching ~ (probes/2^bits) of the corpus per query; the
  recall floor is pinned both by a pytest against the brute-force path
  and by the `embedding_ann_topk` recall-contract oracle.

* :func:`ivf_cosine_topk` — approximate: IVF-flat with a deterministic
  sampled-centroid coarse quantizer (the nlist lowest vec_ids — no
  k-means iterations, so the cell assignment is reproducible across
  engines and runs). Every vector lands in the cell of its
  max-cosine centroid; each query probes its nprobe nearest cells and
  scans only those (~nprobe/nlist of the corpus). Same scale shape as
  the LSH path: centroids and probe lists broadcast, the corpus
  streams map-side, only per-query top-k shuffles.

Cost shape shared by both: vector norms are computed ONCE per row in
the row's own projection (below the join), so each candidate pair costs
a single dot-product fold — the naive cosine(a, b) form re-folds both
norms per pair, tripling the dominant per-pair work.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ANN_PLANES = 6
ANN_MULTIPROBE_HAMMING = 2  # _probe_masks enumerates up to distance 2
_PLANE_SEED = 42
IVF_NLIST = 32
IVF_NPROBE = 6


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _normed(emb: DataFrame) -> DataFrame:
    """(vec_id, v, nrm): the double-cast vector and its L2 norm, each
    computed once per row map-side."""
    v = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id", v.alias("v"), F.sqrt(_dot(v, v)).alias("nrm")
    )


def cosine_topk(
    emb: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (qid, rk, neighbor_id) — integers only, so the oracle
    comparison is immune to float formatting; the ranking itself fully
    exercises the cosine values.
    """
    base = _normed(emb)
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    cand = base.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    cos = _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    scored = (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("qid"))
        .select("qid", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "rk", "neighbor_id")
    )


def _hyperplanes(dim: int, n_planes: int = ANN_PLANES) -> list[list[float]]:
    rng = np.random.default_rng(_PLANE_SEED)
    return rng.standard_normal((n_planes, dim)).tolist()


def _bucket_expr(vec, planes: list[list[float]]):
    """Sign-LSH bucket id: bit p set iff dot(vec, plane_p) >= 0."""
    bits = []
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(
            F.when(_dot(vec, lit_plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def _probe_masks(n_planes: int, max_hamming: int) -> list[int]:
    """XOR masks reaching every bucket within Hamming distance
    min(max_hamming, 2); distances > 2 would probe most of a small
    bucket space anyway — raise n_planes instead. Distinct by
    construction, which is what lets the probe join skip dedup."""
    masks = [0]
    if max_hamming >= 1:
        masks += [1 << i for i in range(n_planes)]
    if max_hamming >= 2:
        masks += [
            (1 << i) | (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    return masks


def ann_cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    *,
    dim: int,
    n_planes: int = ANN_PLANES,
    max_hamming: int = ANN_MULTIPROBE_HAMMING,
) -> DataFrame:
    """Approximate top-k cosine neighbors via sign-LSH buckets.

    Candidates = corpus rows whose bucket is within Hamming
    `max_hamming` of the query's bucket; exact cosine + top-k within
    candidates. Output schema matches :func:`cosine_topk`.

    `dim` is the (declared) vector dimensionality — a parameter, not a
    peek at the data: deriving it with `.first()` would run a Spark job
    at plan-construction time.

    No dedup is needed on the candidate pairs: each corpus row has
    exactly one bucket and the probe masks are distinct, so a
    (qid, neighbor) pair matches at most one probe row.
    """
    planes = _hyperplanes(dim, n_planes)
    base = _normed(emb)
    bucket = _bucket_expr(F.col("v"), planes)

    corpus = base.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
        bucket.alias("bucket"),
    )
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        bucket.alias("qbucket"),
    )
    # Multiprobe expansion in pure Column arithmetic (no Python UDF).
    # The narrow exchange pins the 6-plane bucket fold to one
    # evaluation before the 22 XOR references (CollapseProject would
    # otherwise inline it per mask); the query set is broadcast-sized
    # by contract, so the shuffle is negligible.
    q = q.repartition(F.col("qid"))
    masks = _probe_masks(n_planes, max_hamming)
    probes = q.select(
        "qid",
        "qv",
        "qn",
        F.explode(
            F.array(*[F.col("qbucket").bitwiseXOR(F.lit(m)) for m in masks])
        ).alias("bucket"),
    )
    cos = _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    scored = (
        corpus.join(F.broadcast(probes), "bucket")
        .filter(F.col("neighbor_id") != F.col("qid"))
        .select("qid", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "rk", "neighbor_id")
    )


def ivf_cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    *,
    nlist: int = IVF_NLIST,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """Approximate top-k cosine neighbors via IVF-flat.

    Coarse quantizer: the `nlist` lowest-vec_id vectors act as
    centroids (a deterministic sample — real deployments would train
    k-means offline and broadcast the codebook the same way; sampled
    centroids keep the operator reproducible across engines with zero
    training iterations). Assignment and probing both use max-cosine
    against the broadcast centroid set: `nlist` dot folds per corpus
    row map-side, then each query scans only its `nprobe` nearest
    cells. Output schema matches :func:`cosine_topk`.

    Scale: centroids (nlist rows) and the query probe list
    (len(query_ids) * nprobe rows) broadcast; the corpus never
    shuffles — cell assignment is a map-side column, candidate
    matching is a broadcast join, and only the per-query top-k
    (k rows per partition after the partial sort) crosses the wire.
    """
    base = _normed(emb)
    cents = (
        base.orderBy("vec_id")
        .limit(nlist)
        .select(
            F.col("vec_id").alias("cent_id"),
            F.col("v").alias("cv_cent"),
            F.col("nrm").alias("cn_cent"),
        )
    )
    sim_to_cent = _dot(F.col("v"), F.col("cv_cent")) / (
        F.col("nrm") * F.col("cn_cent")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("cent_sim").desc(), F.col("cent_id")
    )
    scored_cells = (
        base.crossJoin(F.broadcast(cents))
        .select(
            "vec_id", "v", "nrm", "cent_id", sim_to_cent.alias("cent_sim")
        )
        .withColumn("cell_rk", F.row_number().over(w_assign))
    )
    corpus = scored_cells.filter(F.col("cell_rk") == 1).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
        F.col("cent_id").alias("cell"),
    )
    probes = (
        scored_cells.filter(
            F.col("vec_id").isin(query_ids) & (F.col("cell_rk") <= nprobe)
        )
        .select(
            F.col("vec_id").alias("qid"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            F.col("cent_id").alias("cell"),
        )
    )
    cos = _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    scored = (
        corpus.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("qid"))
        .select("qid", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "rk", "neighbor_id")
    )
