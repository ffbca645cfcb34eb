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
  recall floor is pinned by a pytest against the brute-force path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ANN_PLANES = 6
ANN_MULTIPROBE_HAMMING = 2  # _probe_buckets enumerates up to distance 2
_PLANE_SEED = 42


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cosine(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def cosine_topk(
    emb: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (qid, rk, neighbor_id) — integers only, so the oracle
    comparison is immune to float formatting; the ranking itself fully
    exercises the cosine values.
    """
    v = F.col("embedding").cast("array<double>")
    q = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("qid"), v.alias("qv")
    )
    cand = emb.select(F.col("vec_id").alias("neighbor_id"), v.alias("cv"))
    scored = (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("qid"))
        .select("qid", "neighbor_id", _cosine(F.col("qv"), F.col("cv")).alias("cos"))
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


def _probe_buckets(bucket: int, n_planes: int, max_hamming: int) -> list[int]:
    """All bucket ids within Hamming distance min(max_hamming, 2)
    (multiprobe); distances > 2 would probe most of a small bucket
    space anyway — raise n_planes instead."""
    probes = [bucket]
    if max_hamming >= 1:
        probes += [bucket ^ (1 << i) for i in range(n_planes)]
    if max_hamming >= 2:
        probes += [
            bucket ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    return probes


def ann_cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = ANN_PLANES,
    max_hamming: int = ANN_MULTIPROBE_HAMMING,
) -> DataFrame:
    """Approximate top-k cosine neighbors via sign-LSH buckets.

    Candidates = corpus rows whose bucket is within Hamming
    `max_hamming` of the query's bucket; exact cosine + top-k within
    candidates. Output schema matches :func:`cosine_topk`.
    """
    dim = len(emb.select("embedding").first()[0])
    planes = _hyperplanes(dim, n_planes)
    v = F.col("embedding").cast("array<double>")

    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        v.alias("cv"),
        _bucket_expr(v, planes).alias("bucket"),
    )
    q = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("qid"),
        v.alias("qv"),
        _bucket_expr(v, planes).alias("qbucket"),
    )
    probe_fn = F.udf(
        lambda b: _probe_buckets(b, n_planes, max_hamming), "array<int>"
    )
    probes = q.select(
        "qid", "qv", F.explode(probe_fn(F.col("qbucket"))).alias("bucket")
    )
    scored = (
        corpus.join(F.broadcast(probes), "bucket")
        .filter(F.col("neighbor_id") != F.col("qid"))
        .select("qid", "neighbor_id", _cosine(F.col("qv"), F.col("cv")).alias("cos"))
        .distinct()
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "rk", "neighbor_id")
    )
