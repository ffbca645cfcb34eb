"""Data-quality expectations (operators/expect.py): report counts and
row-level enforcement on hand data covering every rule kind."""

from __future__ import annotations

import pytest

from cdk_dynamodb_cdc_spark.operators.expect import check, enforce


@pytest.fixture()
def data(spark):
    rows = [
        # id, op,        size,  ref_key
        (1, "INSERT", 100, 10),
        (2, "MODIFY", 200, 10),
        (2, "REMOVE", 300, 20),      # duplicate id
        (3, None, 400, 20),          # null op
        (4, "UPSERT", 500, 30),      # op outside set
        (5, "INSERT", 999999, 40),   # size out of range, orphan ref
    ]
    df = spark.createDataFrame(
        rows, "id long, op string, size long, ref_key long"
    )
    ref = spark.createDataFrame(
        [(10,), (20,), (30,)], "k long"
    )
    rules = [
        {"rule": "not_null", "col": "op"},
        {"rule": "in_set", "col": "op",
         "values": ["INSERT", "MODIFY", "REMOVE"]},
        {"rule": "between", "col": "size", "lo": 0, "hi": 1000},
        {"rule": "unique", "cols": ["id"]},
        {"rule": "foreign_key", "cols": ["ref_key"],
         "ref": ref, "ref_cols": ["k"]},
    ]
    return df, rules


def test_check_counts_every_rule(spark, data):
    df, rules = data
    rep = {
        r["rule"]: (r["violations"], r["rows_checked"])
        for r in check(df, rules).collect()
    }
    assert rep == {
        "not_null(op)": (1, 6),
        # NULL passes in_set? isin(NULL) yields NULL -> ~NULL is NULL ->
        # when(NULL,1).otherwise(0) = 0: null op does NOT double-count
        "in_set(op)": (1, 6),
        "between(size)": (1, 6),
        "unique(id)": (2, 6),       # both rows of the duplicated id
        "foreign_key(ref_key)": (1, 6),
    }


def test_enforce_splits_and_annotates(spark, data):
    df, rules = data
    good, bad = enforce(df, rules)
    assert sorted(r["id"] for r in good.collect()) == [1]
    viol = {
        (r["id"], r["op"]): set(r["_violations"])
        for r in bad.collect()
    }
    assert viol[(2, "MODIFY")] == {"unique(id)"}
    assert viol[(2, "REMOVE")] == {"unique(id)"}
    assert viol[(3, None)] == {"not_null(op)"}
    assert viol[(4, "UPSERT")] == {"in_set(op)"}
    assert viol[(5, "INSERT")] == {
        "between(size)",
        "foreign_key(ref_key)",
    }
    # no rows lost or invented
    assert good.count() + bad.count() == df.count()


def test_matches_rule_and_clean_table(spark):
    df = spark.createDataFrame(
        [("e1",), ("e2",), ("x3",)], "event_id string"
    )
    rules = [{"rule": "matches", "col": "event_id", "pattern": "^e"}]
    rep = check(df, rules).collect()[0]
    assert rep["violations"] == 1
    good, bad = enforce(df, rules)
    assert good.count() == 2 and bad.count() == 1

    clean = spark.createDataFrame([("e9",)], "event_id string")
    rep2 = check(clean, rules).collect()[0]
    assert rep2["violations"] == 0
    g2, b2 = enforce(clean, rules)
    assert g2.count() == 1 and b2.count() == 0


def test_unknown_rule_raises(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="unknown"):
        check(df, [{"rule": "positive", "col": "id"}])
    with pytest.raises(ValueError, match="unknown"):
        enforce(df, [{"rule": "positive", "col": "id"}])
