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
        T.StructField(
            "bs", T.ArrayType(T.BinaryType()), metadata={"dynamo_type": "BS"}
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
    # base64 of b"beta", b"alpha" — unordered on the wire like SS/NS
    "bs": {"BS": ["YmV0YQ==", "YWxwaGE="]},
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


def test_binary_set_reorder_is_noop_and_change_detected(spark):
    reordered = dict(_BASE, bs={"BS": ["YWxwaGE=", "YmV0YQ=="]})
    assert _one_typed(spark, _m(_BASE), _m(reordered)) == []
    changed = dict(_BASE, bs={"BS": ["YWxwaGE=", "Z2FtbWE="]})  # alpha, gamma
    [r] = _one_typed(spark, _m(_BASE), _m(changed))
    assert r.attributes_changed == ["bs"]
    # typed lane decodes to binary; to_json re-encodes base64 in the
    # dynamic lane's canonical (base64-text-sorted) order
    assert json.loads(r.after)["bs"] == ["YWxwaGE=", "Z2FtbWE="]


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
        "name", "n", "ok", "tags", "addr", "ss", "ns", "bs"
    }
    assert json.loads(r.after)["ns"] == [2, 10]  # NS canonicalized sorted
    assert json.loads(r.after)["bs"] == ["YWxwaGE=", "YmV0YQ=="]  # BS sorted


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


def test_randomized_parity_with_dynamic_lane(spark):
    """200 random (old, new) image pairs over the typed schema: both
    lanes must emit identical paths, subtrees, and no-op decisions."""
    import random

    rng = random.Random(1234)

    def rand_image():
        img = {}
        if rng.random() < 0.9:
            img["name"] = {"S": rng.choice(["a", "b", "c", "dd"])}
        if rng.random() < 0.9:
            img["n"] = {"N": str(rng.choice([1, 2.5, -3, 1e6]))}
        if rng.random() < 0.7:
            img["ok"] = {"BOOL": rng.random() < 0.5}
        if rng.random() < 0.7:
            img["tags"] = {"L": [{"S": w} for w in
                                 rng.sample(["x", "y", "z", "w"], rng.randint(0, 3))]}
        if rng.random() < 0.8:
            img["addr"] = {"M": {
                "city": {"S": rng.choice(["nyc", "sf", "la"])},
                "zip": {"S": rng.choice(["1", "2"])},
            }}
        if rng.random() < 0.5:
            img["bs"] = {"BS": rng.sample(
                ["YWxwaGE=", "YmV0YQ==", "Z2FtbWE=", "ZGVsdGE="],
                rng.randint(1, 3))}
        return img

    # type-consistent mutations only: a type flip (e.g. tags: L -> S)
    # is outside the declared schema's domain — the typed lane reads a
    # mistyped field as absent by design, so lanes diverge there
    mutants = {
        "name": {"S": "mut"},
        "n": {"N": "777"},
        "ok": {"BOOL": False},
        "tags": {"L": [{"S": "mut"}]},
        "addr": {"M": {"city": {"S": "mut"}, "zip": {"S": "9"}}},
        "bs": {"BS": ["bXV0YXRlZA=="]},
    }

    def mutate(img):
        new = json.loads(json.dumps(img))
        if new and rng.random() < 0.8:
            k = rng.choice(list(new))
            if rng.random() < 0.4:
                del new[k]
            else:
                new[k] = mutants[k]
        if rng.random() < 0.3:
            new.update(rand_image())
        return new

    rows = []
    for i in range(200):
        old = rand_image()
        new = mutate(old) if rng.random() < 0.8 else old
        rows.append((f"r{i}", i, None, "MODIFY", "PK", "SK",
                     json.dumps(old), json.dumps(new), 64))
    recs = spark.createDataFrame(rows, CDC_RECORD_SCHEMA)

    typed = {
        r.event_id: r
        for r in typed_diff.cdc_change_events_typed(recs, ITEM_SCHEMA).collect()
    }
    dynamic = {r.event_id: r for r in cdc_change_events(recs).collect()}
    assert set(typed) == set(dynamic)  # identical no-op suppression
    for eid, t in typed.items():
        d = dynamic[eid]
        # sets, not lists: the dynamic lane orders paths by the image's
        # JSON key-insertion order, the typed lane by schema order —
        # the exact-order contract (when they coincide) is pinned by
        # the fixture tests above
        assert set(t.attributes_changed) == set(d.attributes_changed), eid
        assert json.loads(t.before or "{}") == json.loads(d.before or "{}"), eid
        assert json.loads(t.after or "{}") == json.loads(d.after or "{}"), eid


def test_ivm_deltas_identical_across_lanes(spark):
    """aggregate_deltas is lane-agnostic: summed per-group deltas over
    typed-lane change events must equal the dynamic lane's — so the
    IVM consumer can ride the zero-Python typed plan at scale."""
    import decimal

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from cdk_dynamodb_cdc_spark.operators.ivm import aggregate_deltas
    from cdk_dynamodb_cdc_spark.operators.pipeline import cdc_change_events
    from cdk_dynamodb_cdc_spark.operators.typed_diff import (
        cdc_change_events_typed,
    )

    def img(g, v):
        return '{"grp":{"S":"%s"},"val":{"N":"%s"}}' % (g, v)

    rows = [
        ("e1", 1, None, "INSERT", "A", "S", None, img("x", "10.00"), 64),
        ("e2", 2, None, "MODIFY", "A", "S", img("x", "10.00"),
         img("y", "10.00"), 64),  # group flip
        ("e3", 1, None, "INSERT", "B", "S", None, img("x", "3.50"), 64),
        ("e4", 2, None, "MODIFY", "B", "S", img("x", "3.50"),
         img("x", "4.25"), 64),   # value change
        ("e5", 3, None, "REMOVE", "B", "S", img("x", "4.25"), None, 64),
    ]
    records = spark.createDataFrame(
        rows,
        "event_id string, seq long, ts timestamp, operation string, "
        "pk string, sk string, old_image string, new_image string, "
        "size_bytes long",
    )
    schema = T.StructType(
        [
            T.StructField("grp", T.StringType()),
            T.StructField("val", T.DoubleType()),
        ]
    )

    def totals(events):
        return {
            r.group_key: (r.n_items, decimal.Decimal(r.total_value))
            for r in aggregate_deltas(
                events, group_field="grp", value_field="val"
            )
            .groupBy("group_key")
            .agg(
                F.sum("d_items").alias("n_items"),
                F.sum("d_value").alias("total_value"),
            )
            .collect()
        }

    dyn = totals(cdc_change_events(records))
    typ = totals(cdc_change_events_typed(records, schema))
    assert dyn == typ == {
        "x": (0, decimal.Decimal("0.00")),
        "y": (1, decimal.Decimal("10.00")),
    }


def test_infer_item_schema_nested_sets_and_drift(spark):
    """infer_item_schema derives the typed lane's StructType from the
    stream itself: nested M structs recurse, L lists infer element
    types, SS/NS tag the set metadata the typed lane canonicalizes on,
    and a re-typed field resolves to its LATEST wire type."""
    import datetime

    from pyspark.sql import types as T

    from cdk_dynamodb_cdc_spark.operators.monitor import infer_item_schema

    def rec(ts_s, new_image):
        return (
            str(ts_s),
            1,
            datetime.datetime(2024, 1, 1, 0, 0, ts_s),
            "INSERT",
            "PK#1",
            "SK",
            None,
            new_image,
            64,
        )

    rows = [
        rec(1, '{"name":{"S":"a"},"score":{"N":"1.5"},'
               '"tags":{"SS":["x","y"]},"nums":{"NS":["2","1"]},'
               '"meta":{"M":{"depth":{"N":"3"},"flag":{"BOOL":true}}},'
               '"hops":{"L":[{"N":"1"},{"N":"2"}]}}'),
        # drift: "score" re-typed N -> S in a later record
        rec(2, '{"name":{"S":"b"},"score":{"S":"high"}}'),
    ]
    records = spark.createDataFrame(
        rows,
        "event_id string, seq long, ts timestamp, operation string, "
        "pk string, sk string, old_image string, new_image string, "
        "size_bytes long",
    )
    schema = infer_item_schema(records)
    by_name = {f.name: f for f in schema.fields}
    assert sorted(by_name) == ["hops", "meta", "name", "nums", "score", "tags"]
    assert isinstance(by_name["name"].dataType, T.StringType)
    # drift policy: latest occurrence wins -> score is now a string
    assert isinstance(by_name["score"].dataType, T.StringType)
    assert by_name["tags"].metadata == {"dynamo_type": "SS"}
    assert isinstance(by_name["tags"].dataType.elementType, T.StringType)
    assert by_name["nums"].metadata == {"dynamo_type": "NS"}
    assert isinstance(by_name["nums"].dataType.elementType, T.DecimalType)
    meta_t = by_name["meta"].dataType
    assert isinstance(meta_t, T.StructType)
    assert [f.name for f in meta_t.fields] == ["depth", "flag"]
    assert isinstance(meta_t["flag"].dataType, T.BooleanType)
    hops_t = by_name["hops"].dataType
    assert isinstance(hops_t, T.ArrayType)
    assert isinstance(hops_t.elementType, T.DecimalType)


def test_autotyped_lane_matches_dynamic_paths(spark):
    """Full composition: drift profile -> inferred schema -> typed
    pipeline must report the same changed-path SETS as the dynamic
    lane on nested records (the lane-parity contract, now reachable
    with no hand-declared schema)."""
    import datetime

    from cdk_dynamodb_cdc_spark.operators.monitor import infer_item_schema
    from cdk_dynamodb_cdc_spark.operators.pipeline import cdc_change_events
    from cdk_dynamodb_cdc_spark.operators.typed_diff import (
        cdc_change_events_typed,
    )

    old = ('{"a":{"N":"1"},"m":{"M":{"x":{"S":"p"},"y":{"N":"7"}}},'
           '"gone":{"S":"bye"}}')
    new = ('{"a":{"N":"2"},"m":{"M":{"x":{"S":"q"},"y":{"N":"7"}}},'
           '"fresh":{"BOOL":true}}')
    records = spark.createDataFrame(
        [
            ("e1", 1, datetime.datetime(2024, 1, 1), "MODIFY",
             "PK#1", "SK", old, new, 64),
            ("e2", 2, datetime.datetime(2024, 1, 1, 0, 1), "MODIFY",
             "PK#1", "SK", new, new, 64),  # no-op: must be dropped
        ],
        "event_id string, seq long, ts timestamp, operation string, "
        "pk string, sk string, old_image string, new_image string, "
        "size_bytes long",
    )
    schema = infer_item_schema(records)
    dyn = {
        r["event_id"]: sorted(r["attributes_changed"])
        for r in cdc_change_events(records).collect()
    }
    typ = {
        r["event_id"]: sorted(r["attributes_changed"])
        for r in cdc_change_events_typed(records, schema).collect()
    }
    assert dyn == typ == {
        "e1": ["a", "fresh", "gone", "m", "m.x"],
    }
