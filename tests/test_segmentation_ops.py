"""Round-10 segmentation/robust-location operators: the exact
boundary and tie conventions their oracles assume.

- winsorized_mean_by_priority and rfm_customer_segments both define
  quantile boundaries as PERCENTILE_DISC lower-discrete values (the
  element at 1-indexed rank ceil(q*n)) computed from a value
  histogram, and RFM scores place boundary ties in the LOWER bucket
  (score = 1 + #(boundaries < value)).
- nation_revenue_hhi and gini_gain_feature_ranking emit exactly
  rational floor-scaled ppm; the HHI of a single-customer market must
  be exactly 1e6 ppm and a two-equal-customer market 5e5 ppm.
"""

import math

import pytest
from pyspark.sql import functions as F

from cdk_dynamodb_cdc_spark import queries as Q


@pytest.fixture(scope="module")
def spark():
    from cdk_dynamodb_cdc_spark import get_spark

    s = get_spark("test-seg", master="local[4]", shuffle_partitions=4)
    yield s


def test_percentile_disc_rank_convention():
    # rank ceil(k*n/5) as used by both oracle and plan sides
    for n in (1, 4, 5, 7, 100, 101):
        for k in (1, 2, 3, 4):
            assert (k * n + 4) // 5 == math.ceil(k * n / 5)


def test_rfm_score_ties_go_low(spark):
    # 5 customers with m = 10,20,30,40,50: boundaries are exactly
    # 10,20,30,40 (rank ceil(k*5/5)=k), so the value EQUAL to a
    # boundary sits in the lower bucket and scores are 1..5.
    df = spark.createDataFrame(
        [(i, (i + 1) * 10) for i in range(5)], "id long, m long"
    )
    hist = df.groupBy(F.col("m").alias("v")).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("c")
    )
    cum = Q._bucketed_cumsum(
        hist, value_col="v", weight_col="c", out_col="cm",
        inclusive=True,
    )
    ranks = [(k * 5 + 4) // 5 for k in (1, 2, 3, 4)]
    b = cum.agg(*[
        F.min(F.when(F.col("cm") >= rk, F.col("v"))).alias(f"b{i}")
        for i, rk in enumerate(ranks)
    ]).collect()[0]
    assert [b["b0"], b["b1"], b["b2"], b["b3"]] == [10, 20, 30, 40]
    scores = sorted(
        1 + sum(v > b[f"b{i}"] for i in range(4))
        for v in (10, 20, 30, 40, 50)
    )
    assert scores == [1, 2, 3, 4, 5]


def test_hhi_degenerate_markets(spark):
    # one customer -> share 1 -> exactly 1e6 ppm; two equal
    # customers -> 2*(1/2)^2 -> exactly 5e5 ppm
    rows = [(1, 0, 100), (2, 1, 250), (3, 1, 250)]
    df = spark.createDataFrame(
        rows, "c_custkey long, c_nationkey long, cents long"
    )
    d38 = "decimal(38,0)"
    agg = df.groupBy("c_nationkey").agg(
        F.sum(F.col("cents").cast(d38)).cast(d38).alias("t"),
        F.sum(F.col("cents").cast(d38) * F.col("cents").cast(d38))
        .cast(d38).alias("sq"),
    )
    t2 = F.col("t") * F.col("t")
    num = (F.lit(1000000).cast(d38) * F.col("sq")).cast(d38)
    out = {
        r["c_nationkey"]: r["hhi"]
        for r in agg.select(
            "c_nationkey",
            ((num - F.pmod(num, t2)) / t2).cast(d38).cast("long")
            .alias("hhi"),
        ).collect()
    }
    assert out[0] == 1_000_000
    assert out[1] == 500_000


def test_gini_gain_perfect_split_reaches_parent_impurity():
    # a feature that perfectly separates the label has child
    # impurity 0, so gain == parent impurity; with P == Q the
    # parent Gini is exactly 0.5 -> 500000 ppm
    N, P = 100, 50
    parent_ppm = (
        1_000_000 * (N * N - P * P - (N - P) * (N - P))
    ) // (N * N)
    assert parent_ppm == 500_000
    # two pure values: n_v=50,p_v=50 and n_v=50,p_v=0
    child = sum(
        (1_000_000 * (n_v * n_v - p_v * p_v - (n_v - p_v) ** 2))
        // (N * n_v)
        for n_v, p_v in ((50, 50), (50, 0))
    )
    assert child == 0


def test_signed_pmod_floor_identity(spark):
    # brand_discount_elasticity's slope can be NEGATIVE; the
    # exactly-divisible pmod identity must floor (round toward
    # -inf) identically to the oracle's ((n % d) + d) % d form —
    # a bare signed integer division would truncate instead.
    rows = [(-7, 2, -4), (7, 2, 3), (-6, 3, -2), (-1, 5, -1)]
    df = spark.createDataFrame(rows, "num long, den long, want long")
    d38 = "decimal(38,0)"
    got = df.select(
        "want",
        (
            (F.col("num").cast(d38)
             - F.pmod(F.col("num").cast(d38), F.col("den").cast(d38)))
            / F.col("den").cast(d38)
        ).cast(d38).cast("long").alias("got"),
    ).collect()
    for r in got:
        assert r["got"] == r["want"]
    import duckdb

    con = duckdb.connect()
    for num, den, want in rows:
        (o,) = con.sql(
            f"SELECT ({num} - (({num} % {den}) + {den}) % {den})"
            f" // {den}"
        ).fetchone()
        assert int(o) == want


def test_winsorized_contract_vs_bruteforce(spark):
    # brute-force reference for the winsorized-mean contract on an
    # adversarial value multiset (heavy ties at both tails, a
    # singleton group, and a group smaller than 20 where p5's rank
    # clamps to 1): boundaries at rank ceil(q*n), values clamped,
    # floored-cents mean.
    import math

    groups = {
        "A": [5] * 30 + [7] * 40 + [9] * 25 + [1000] * 5,
        "B": [2, 3, 5, 8, 13, 21, 34],
        "C": [42],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "prio string, cents long")

    def brute(vs):
        vs = sorted(vs)
        n = len(vs)
        lo = vs[max(1, math.ceil(0.05 * n)) - 1]
        hi = vs[max(1, math.ceil(0.95 * n)) - 1]
        clamped = [min(max(v, lo), hi) for v in vs]
        return lo, hi, sum(clamped) // n

    from pyspark.sql import Window

    h = df.groupBy("prio", F.col("cents").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w_cum = Window.partitionBy("prio").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy("prio")
    cum = h.withColumn("cm", F.sum("c").over(w_cum)).withColumn(
        "n", F.sum("c").over(w_all)
    )
    thr = cum.groupBy("prio").agg(
        F.max("n").alias("n"),
        F.min(
            F.when(F.col("cm") >= F.expr("(n + 19) div 20"), F.col("v"))
        ).alias("lo"),
        F.min(
            F.when(
                F.col("cm") >= F.expr("(19 * n + 19) div 20"), F.col("v")
            )
        ).alias("hi"),
    ).collect()
    got = {r["prio"]: (r["lo"], r["hi"]) for r in thr}
    for g, vs in groups.items():
        lo, hi, _ = brute(vs)
        assert got[g] == (lo, hi), (g, got[g], (lo, hi))
