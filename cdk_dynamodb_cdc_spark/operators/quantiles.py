"""Exact distributed order statistics WITHOUT a global sort
(SURVEY.md §2B: sort/limit/aggregate family, the scale path).

``percentile_approx`` trades accuracy for one pass; an exact
percentile via ORDER BY is a full-data global sort — the single most
expensive shuffle shape there is at 100 TB. The two-pass histogram
refinement below gets the EXACT answer in two scan-shaped passes plus
one bucket-local sort:

1. one aggregation for (min, max, count) — 3 scalars to the driver;
2. one map-side-combinable histogram over ``n_buckets`` equi-width
   buckets — <= n_buckets rows to the driver, which locates each
   requested rank's bucket and in-bucket offset by cumulating counts;
3. one filtered pass that sorts ONLY the needed buckets (expected
   n / n_buckets rows each, a per-partition window after a shuffle of
   that slice) and picks the offset row.

Driver state is 3 scalars + the bucket histogram — bounded by
``n_buckets`` whatever the data size (the same bounded-collect
discipline as the k-means/PQ codebook samples). The bucketing floats
never affect correctness: they only ROUTE rows; the returned value is
an actual element selected by exact integer rank arithmetic, which is
what the DuckDB ``quantile_disc`` oracle pins.

The reference has no aggregation surface at all (its analytics stop at
forwarding events, `dynamo-stream-handler.ts:168-177`); this is the
§2B sort-family operator re-expressed for cluster scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles_two_pass(
    df: DataFrame,
    value_col: str,
    qs: tuple[float, ...],
    *,
    n_buckets: int = 1024,
) -> DataFrame:
    """Exact discrete quantiles of ``value_col`` — the element at rank
    ``ceil(q * n)`` (1-indexed), the SQL ``PERCENTILE_DISC`` / DuckDB
    ``quantile_disc`` lower-discrete convention — as one ``(q, value)``
    row per requested quantile, ``q`` stringified to keep the output
    engine-portable.

    NULLs are excluded (SQL aggregate convention). Ties and bucket
    edges are safe by construction: equal values land in the same
    bucket, and within a bucket ``row_number`` over equal values picks
    an arbitrary row of the SAME value.
    """
    stats = df.select(
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("hi"),
        F.count(value_col).alias("n"),
    ).collect()[0]
    lo, hi, n = stats["lo"], stats["hi"], stats["n"]
    spark = df.sparkSession
    if n == 0:
        return spark.createDataFrame([], "q string, value double")
    width = (float(hi) - float(lo)) / n_buckets or 1.0
    bucket = F.least(
        F.greatest(
            F.floor((F.col(value_col) - F.lit(float(lo))) / F.lit(width)),
            F.lit(0),
        ),
        F.lit(n_buckets - 1),
    ).cast("int")
    counted = (
        df.filter(F.col(value_col).isNotNull())
        .select(bucket.alias("__b"))
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    hist = {r["__b"]: r["c"] for r in counted}
    # driver-side rank -> (bucket, offset) resolution over the
    # <= n_buckets histogram
    targets = []  # (q_label, bucket, in_bucket_rank)
    for q in qs:
        rank = max(1, math.ceil(q * n))  # 1-indexed global rank
        cum = 0
        for b in range(n_buckets):
            c = hist.get(b, 0)
            if cum + c >= rank:
                targets.append((f"{q:g}", b, rank - cum))
                break
            cum += c
    tdf = F.broadcast(
        spark.createDataFrame(
            targets, "q string, __b int, __rank long"
        )
    )
    w = Window.partitionBy("__b").orderBy(value_col)
    needed = sorted({b for _, b, _ in targets})
    picked = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(value_col), bucket.alias("__b"))
        .filter(F.col("__b").isin(needed))
        .withColumn("__rn", F.row_number().over(w))
        .join(tdf, ["__b"])
        .filter(F.col("__rn") == F.col("__rank"))
        .select("q", F.col(value_col).alias("value"))
    )
    return picked


def exact_weighted_quantiles_two_pass(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    qs: tuple[tuple[str, int, int], ...],
    *,
    n_buckets: int = 1024,
) -> DataFrame:
    """Exact WEIGHTED quantiles, same two-pass refinement as
    :func:`exact_quantiles_two_pass` with the histogram summing
    integer weights instead of counting rows: the answer for
    ``q = num/den`` is the smallest value whose cumulative weight
    reaches ``ceil(q * W)``, W the total weight — the discrete
    weighted-quantile convention, engines replay it with a cumulative
    window. ``qs`` entries are ``(label, num, den)`` RATIONALS so the
    target rank is the exact integer ``(num*W + den - 1) // den`` —
    a float ``ceil(q * W)`` flips at representation boundaries
    (0.99 has no finite binary form), precisely the class of
    large-scale last-ulp divergence the sf0.1 robustness sweeps exist
    to catch. Weights must be non-negative integers (cast upstream);
    zero-weight rows can never be picked (the cumulative sum does not
    advance through them, and a bucket of only zero-weight rows is
    never targeted).
    """
    stats = df.select(
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("hi"),
        F.sum(weight_col).alias("tw"),
    ).collect()[0]
    lo, hi, tw = stats["lo"], stats["hi"], stats["tw"]
    spark = df.sparkSession
    if not tw:
        return spark.createDataFrame([], "q string, value double")
    width = (float(hi) - float(lo)) / n_buckets or 1.0
    bucket = F.least(
        F.greatest(
            F.floor((F.col(value_col) - F.lit(float(lo))) / F.lit(width)),
            F.lit(0),
        ),
        F.lit(n_buckets - 1),
    ).cast("int")
    counted = (
        df.filter(F.col(value_col).isNotNull())
        .select(bucket.alias("__b"), F.col(weight_col).alias("__w"))
        .groupBy("__b")
        .agg(F.sum("__w").alias("c"))
        .collect()
    )
    hist = {r["__b"]: r["c"] for r in counted}
    targets = []  # (label, bucket, residual in-bucket weight rank)
    for label, num, den in qs:
        rank = max(1, (num * int(tw) + den - 1) // den)
        cum = 0
        for b in range(n_buckets):
            c = hist.get(b, 0)
            if cum + c >= rank:
                targets.append((label, b, rank - cum))
                break
            cum += c
    tdf = F.broadcast(
        spark.createDataFrame(targets, "q string, __b int, __rank long")
    )
    w = Window.partitionBy("__b").orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    needed = sorted({b for _, b, _ in targets})
    slice_df = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(value_col), bucket.alias("__b"), F.col(weight_col).alias("__w"))
        .filter(F.col("__b").isin(needed))
        .withColumn("__cw", F.sum("__w").over(w))
    )
    # smallest value whose cumulative weight reaches the residual rank:
    # min over qualifying rows (equal values share the crossing value,
    # so the pick is deterministic whatever the tie order)
    return (
        slice_df.join(tdf, ["__b"])
        .filter(F.col("__cw") >= F.col("__rank"))
        .groupBy("q")
        .agg(F.min(value_col).alias("value"))
    )
