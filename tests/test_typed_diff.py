"""Typed-lane diff tests: parity with the dynamic lane on the golden
fixtures, wire-schema generation, and the no-Python plan guarantee."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdk_dynamodb_cdc_spark.operators import typed_diff
from cdk_dynamodb_cdc_spark.operators.pipeline import cdc_change_events
from cdk_dynamodb_cdc_spark.schemas import CDC_RECORD_SCHEMA

ITEM_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("n", T.DoubleType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField(
            "addr",
            T.StructType(
                [
                    T.StructField("city", T.StringType()),
                    T.StructField("zip", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "ss", T.ArrayType(T.StringType()), metadata={"dynamo_type": "SS"}
        ),
        T.StructField(
            "ns", T.ArrayType(T.LongType()), metadata={"dynamo_type": "NS"}
        ),
    ]
)


def _m(obj):
    return json.dumps(obj)


_BASE = {
    "name": {"S": "alice"},
    "n": {"N": "1.5"},
    "ok": {"BOOL": True},
    "tags": {"L": [{"S": "x"}, {"S": "y"}]},
    "addr": {"M": {"city": {"S": "nyc"}, "zip": {"S": "10001"}}},
    "ss": {"SS": ["b", "a"]},
    "ns": {"NS": ["10", "2"]},
}


def _records(spark, rows):
    return spark.createDataFrame(rows, CDC_RECORD_SCHEMA)


def _one_typed(spark, old, new, op="MODIFY"):
    rec = [("e1", 1, None, op, "PK#1", "SK", old, new, 512)]
    return typed_diff.cdc_change_events_typed(
        _records(spark, rec), ITEM_SCHEMA
    ).collect()


def test_scalar_change_paths_and_subtrees(spark):
    new = dict(_BASE, n={"N": "2.5"})
    [r] = _one_typed(spark, _m(_BASE), _m(new))
    assert r.attributes_changed == ["n"]
    assert json.loads(r.before) == {"n": 1.5}
    assert json.loads(r.after) == {"n": 2.5}


def test_nested_change_records_parent_then_child(spark):
    new = dict(_BASE, addr={"M": {"city": {"S": "sf"}, "zip": {"S": "10001"}}})
    [r] = _one_typed(spark, _m(_BASE), _m(new))
    assert r.attributes_changed == ["addr", "addr.city"]
    assert json.loads(r.before) == {"addr": {"city": "nyc"}}
    assert json.loads(r.after) == {"addr": {"city": "sf"}}


def test_array_changes_are_atomic(spark):
    new = dict(_BASE, tags={"L": [{"S": "x"}, {"S": "z"}]})
    [r] = _one_typed(spark, _m(_BASE), _m(new))
    assert r.attributes_changed == ["tags"]
    assert json.loads(r.after)["tags"] == ["x", "z"]


def test_set_reorder_is_noop(spark):
    new = dict(_BASE, ss={"SS": ["a", "b"]})  # same set, different order
    assert _one_typed(spark, _m(_BASE), _m(new)) == []


def test_add_remove_classification(spark):
    old = {k: v for k, v in _BASE.items() if k != "ok"}
    new = dict(_BASE)
    del new["name"]
    [r] = _one_typed(spark, _m(old), _m(new))
    # ok added, name removed; added paths precede removed paths
    assert r.attributes_changed == ["ok", "name"]
    assert json.loads(r.before) == {"name": "alice"}
    assert json.loads(r.after) == {"ok": True}


def test_insert_marks_all_fields_added(spark):
    [r] = _one_typed(spark, None, _m(_BASE), op="INSERT")
    assert set(r.attributes_changed) == {
        "name", "n", "ok", "tags", "addr", "ss", "ns"
    }
    assert json.loads(r.after)["ns"] == [2, 10]  # NS canonicalized sorted


def test_parity_with_dynamic_lane_on_shared_fixtures(spark):
    """Both lanes must agree on paths and no-op suppression for records
    expressible in the typed schema."""
    rows = [
        ("p1", 1, None, "MODIFY", "PK", "SK", _m(_BASE), _m(dict(_BASE, n={"N": "9"})), 512),
        ("p2", 2, None, "MODIFY", "PK", "SK", _m(_BASE), _m(_BASE), 512),  # no-op
        ("p3", 3, None, "REMOVE", "PK", "SK", _m(_BASE), None, 512),
        ("p4", 4, None, "MODIFY", "PK", "SK", _m(_BASE),
         _m(dict(_BASE, addr={"M": {"city": {"S": "la"}, "zip": {"S": "90001"}}})), 512),
    ]
    recs = _records(spark, rows)
    typed = {
        r.event_id: r
        for r in typed_diff.cdc_change_events_typed(recs, ITEM_SCHEMA).collect()
    }
    dynamic = {r.event_id: r for r in cdc_change_events(recs).collect()}
    assert set(typed) == set(dynamic) == {"p1", "p3", "p4"}
    for eid in typed:
        assert typed[eid].attributes_changed == dynamic[eid].attributes_changed
        assert json.loads(typed[eid].before or "{}") == json.loads(
            dynamic[eid].before or "{}"
        )
        assert json.loads(typed[eid].after or "{}") == json.loads(
            dynamic[eid].after or "{}"
        )


def test_typed_plan_has_no_python_exchange(spark):
    rec = _records(
        spark, [("e", 1, None, "MODIFY", "P", "S", _m(_BASE), _m(_BASE), 512)]
    )
    plan = typed_diff.cdc_change_events_typed(
        rec, ITEM_SCHEMA
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "mapInPandas" not in plan


def test_wire_schema_rejects_unsupported(spark):
    bad = T.StructType([T.StructField("m", T.MapType(T.StringType(), T.StringType()))])
    try:
        typed_diff.wire_schema_for(bad)
        raise AssertionError("expected TypeError")
    except TypeError:
        pass
