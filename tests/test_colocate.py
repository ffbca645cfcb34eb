"""Bucketed co-located joins (shuffle elimination) and salted skew
joins (result parity with the plain join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdk_dynamodb_cdc_spark.operators import colocate
from cdk_dynamodb_cdc_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    od = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    colocate.write_bucketed(
        od, "orders_b", str(tmp_path / "orders_b"), keys=["o_orderkey"], num_buckets=8
    )
    colocate.write_bucketed(
        li, "lineitem_b", str(tmp_path / "li_b"), keys=["l_orderkey"], num_buckets=8
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = colocate.read_bucketed(spark, "orders_b")
        b = colocate.read_bucketed(spark, "lineitem_b")
        joined = a.join(b, a["o_orderkey"] == b["l_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: the scan's bucket partitioning feeds the join —
        # no hash-repartition exchange on either side
        assert "Exchange hashpartitioning" not in plan, plan
        # results identical to the plain (shuffled) join
        expected = od.join(li, od["o_orderkey"] == li["l_orderkey"]).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_salted_join_matches_plain_join(spark):
    od = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    cu = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_mktsegment")
    plain = od.join(cu, od["o_custkey"] == cu["c_custkey"]).select(
        "o_orderkey", "c_mktsegment"
    )
    salted = colocate.salted_join(
        od, cu, skewed_key="o_custkey", other_key="c_custkey", n_salt=4
    ).select("o_orderkey", "c_mktsegment")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_left_join_preserves_unmatched(spark):
    od = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    # shift keys so some orders have no customer
    cu = load_table(spark, SF_DIR, "customer").select(
        (F.col("c_custkey") + 10_000_000).alias("c_custkey")
    )
    plain = od.join(cu, od["o_custkey"] == cu["c_custkey"], "left")
    salted = colocate.salted_join(
        od, cu, skewed_key="o_custkey", other_key="c_custkey",
        n_salt=4, how="left",
    )
    assert salted.count() == plain.count()


def test_key_skew_profile_orders(spark):
    od = load_table(spark, SF_DIR, "orders")
    prof = colocate.key_skew_profile(od, "o_custkey", top=5).collect()
    assert len(prof) == 5
    assert prof[0].n_rows >= prof[-1].n_rows
    assert 0 < prof[0].share < 1
