"""Property checks for the round-10 analytics operators.

The DuckDB oracles pin cross-engine value equality; these tests pin
the MATHEMATICAL contracts the oracles can't see — range invariants
and degenerate-input behavior — so a future edit that keeps both
engines wrong in the same way still fails CI.
"""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qmod():
    from cdk_dynamodb_cdc_spark import queries

    return queries


def test_gk_lambda_is_a_valid_pre_measure(spark, qmod):
    r = qmod.QUERIES["gk_lambda_type_dow"](spark, SF).collect()[0]
    # lambda is a proportional-reduction-in-error: 0 <= lambda <= 1,
    # and the row-max sum can never undershoot the modal marginal.
    for c in ("lambda_type_given_dow_ppm", "lambda_dow_given_type_ppm"):
        assert 0 <= r[c] <= 1_000_000
    assert r["sum_row_max"] >= r["max_type"]
    assert r["sum_col_max"] >= r["max_dow"]
    assert r["sum_row_max"] <= r["n_total"]


def test_kendall_tau_bounds_and_pair_accounting(spark, qmod):
    r = qmod.QUERIES["kendall_tau_qty_price"](spark, SF).collect()[0]
    assert -1.0 <= r["tau_b"] <= 1.0
    n0 = r["n_rows"] * (r["n_rows"] - 1) // 2
    # concordant + discordant pairs can never exceed the pairs that
    # are untied in x (ties in x are excluded from both counts)
    assert r["nc"] + r["nd"] <= n0 - r["tied_x"]
    assert r["nc"] >= 0 and r["nd"] >= 0


def test_brier_calibration_bins_are_coherent(spark, qmod):
    rows = qmod.QUERIES["quality_brier_calibration"](spark, SF).collect()
    assert 1 <= len(rows) <= 10
    for r in rows:
        assert 0 <= r["mean_conf_ppm"] <= 1_000_000
        assert 0 <= r["pos_ppm"] <= 1_000_000
        # reliability gap is |mean_conf - pos_rate| (floored), so it
        # can exceed neither bound nor the Brier scale
        assert 0 <= r["gap_ppm"] <= 1_000_000
        assert 0 <= r["brier_x1e6"] <= 1_000_000
        # the bin's Brier is at least the squared reliability gap
        # (bias-variance: brier = gap^2 + within-bin variance), up to
        # the two floor roundings
        assert r["brier_x1e6"] + 2 >= (r["gap_ppm"] ** 2) // 1_000_000


def test_tvd_drift_bounds_and_self_distance(spark, qmod):
    from pyspark.sql import functions as F

    rows = qmod.QUERIES["token_tvd_drift"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["tvd_ppm"] <= 1_000_000
        assert r["vocab"] >= 1
    # self-distance sanity: running the same fold with BOTH cohorts
    # equal to the full corpus must give TVD 0 — rebuild the fold on a
    # duplicated-half corpus (every doc in both halves via doc_id*2
    # and doc_id*2+1 sharing text)
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("lang", "text", (F.col("doc_id") * 2).alias("doc_id"))
    )
    dup = docs.unionByName(
        docs.select("lang", "text", (F.col("doc_id") + 1).alias("doc_id"))
    )
    dup.createOrReplaceTempView("_tvd_dup")
    out = spark.sql(
        """
        WITH tok AS (
          SELECT lang, doc_id % 2 AS h,
                 explode(split(text, ' ')) AS t
          FROM _tvd_dup
        ), counts AS (
          SELECT lang, t,
                 SUM(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS na,
                 SUM(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS nb
          FROM tok GROUP BY lang, t
        ), tots AS (
          SELECT lang, SUM(na) AS ta, SUM(nb) AS tb FROM counts
          GROUP BY lang
        )
        SELECT c.lang,
               SUM(abs(CAST(c.na AS DECIMAL(38,0)) * t.tb
                       - CAST(c.nb AS DECIMAL(38,0)) * t.ta)) AS s
        FROM counts c JOIN tots t USING (lang) GROUP BY c.lang
        """
    ).collect()
    assert all(r["s"] == 0 for r in out)


def test_mann_kendall_agrees_with_theil_sen_direction(spark, qmod):
    mk = qmod.QUERIES["mann_kendall_revenue_trend"](spark, SF).collect()[0]
    assert mk["var_x18"] > 0
    assert mk["n_days"] >= 2
    # S is bounded by the number of day pairs
    n0 = mk["n_days"] * (mk["n_days"] - 1) // 2
    assert abs(mk["s_stat"]) <= n0
    # sign(z) must match sign(S) (continuity correction shrinks |S|
    # by 1 but never flips it past zero)
    if mk["s_stat"] > 1:
        assert mk["z"] > 0
    elif mk["s_stat"] < -1:
        assert mk["z"] < 0


def test_burstiness_bounds_and_regular_user(spark, qmod):
    rows = qmod.QUERIES["user_interarrival_burstiness"](spark, SF).collect()
    assert rows
    for r in rows:
        # B = (sigma - mu)/(sigma + mu) with sigma, mu >= 0
        assert -1.0 <= r["burstiness"] <= 1.0
        assert r["n_gaps"] >= 2
        assert r["mean_gap_s"] >= 0
    # a perfectly regular synthetic actor must land at B = -1
    # (sigma = 0): verify via the same fold on a constructed frame
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        [(1, i, i * 3_600_000_000) for i in range(10)],
        "user_id long, event_id long, ts_us long",
    )
    w = __import__("pyspark.sql.window", fromlist=["Window"]).Window
    gaps = (
        ev.withColumn(
            "lag_us",
            F.lag("ts_us").over(
                w.partitionBy("user_id").orderBy("ts_us", "event_id")
            ),
        )
        .select(
            "user_id",
            F.expr("CAST((ts_us - lag_us) div 1000000 AS BIGINT)")
            .alias("gap_s"),
        )
        .filter(F.col("gap_s").isNotNull())
    )
    m = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("gap_s").alias("s1"),
        F.sum((F.col("gap_s") * F.col("gap_s")).cast("decimal(31,0)"))
        .alias("s2"),
    ).collect()[0]
    var_num = m["n"] * int(m["s2"]) - m["s1"] * m["s1"]
    assert var_num == 0  # sigma = 0 -> B = (0 - mu)/(0 + mu) = -1
