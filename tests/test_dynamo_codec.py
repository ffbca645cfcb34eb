"""Unit tests for the AttributeValue codec (no JVM needed)."""

from cdk_dynamodb_cdc_spark.functions.dynamo import (
    dumps_canonical,
    unmarshall,
    unmarshall_json,
    unmarshall_value,
)


def test_scalars():
    assert unmarshall_value({"S": "hi"}) == "hi"
    assert unmarshall_value({"N": "1.5"}) == 1.5
    assert unmarshall_value({"N": "7"}) == 7
    assert isinstance(unmarshall_value({"N": "7"}), int)
    assert unmarshall_value({"N": "123456789012345678901"}) == 123456789012345678901
    assert unmarshall_value({"BOOL": True}) is True
    assert unmarshall_value({"NULL": True}) is None
    assert unmarshall_value({"B": "aGVsbG8="}) == "aGVsbG8="


def test_nested():
    av = {"M": {"a": {"L": [{"N": "1"}, {"S": "x"}, {"M": {"b": {"BOOL": False}}}]}}}
    assert unmarshall_value(av) == {"a": [1, "x", {"b": False}]}


def test_sets_canonicalized():
    assert unmarshall_value({"SS": ["b", "a"]}) == ["a", "b"]
    assert unmarshall_value({"NS": ["10", "2"]}) == [2, 10]
    assert unmarshall_value({"BS": ["Zm9v", "YmFy"]}) == ["YmFy", "Zm9v"]


def test_item_and_json_roundtrip():
    item = {"pk": {"S": "USER#1"}, "n": {"N": "2"}}
    assert unmarshall(item) == {"pk": "USER#1", "n": 2}
    assert unmarshall(None) is None
    assert unmarshall_json('{"pk":{"S":"a"},"b":{"BOOL":true}}') == '{"b":true,"pk":"a"}'
    assert unmarshall_json(None) is None


def test_canonical_dumps_stable():
    assert dumps_canonical({"b": 1, "a": [2, 1]}) == '{"a":[2,1],"b":1}'
    # byte-identical to json.dumps for the non-Decimal domain
    import json

    obj = {"s": "héllo\n", "n": -1.5, "l": [None, True, {"k": 0}], "i": 10**20}
    assert dumps_canonical(obj) == json.dumps(
        obj, sort_keys=True, separators=(",", ":")
    )


def test_decimal_fidelity():
    """SURVEY §1.2: N is an arbitrary-precision decimal string; the
    dynamic lane must not round it through float64."""
    from decimal import Decimal

    v = unmarshall_value({"N": "1.234567890123456789012345"})
    assert isinstance(v, Decimal)
    assert v == Decimal("1.234567890123456789012345")
    # canonical text: exact digits, normalized trailing zeros, no quotes
    assert dumps_canonical({"x": v}) == '{"x":1.234567890123456789012345}'
    assert dumps_canonical({"x": unmarshall_value({"N": "1.50"})}) == '{"x":1.5}'
    assert (
        unmarshall_json('{"v":{"N":"0.10000000000000000000000001"}}')
        == '{"v":0.10000000000000000000000001}'
    )
    # NS ordering is exact, not float-keyed
    ns = unmarshall_value({"NS": ["0.30000000000000000000000002",
                                  "0.30000000000000000000000001"]})
    assert [str(x) for x in ns] == [
        "0.30000000000000000000000001", "0.30000000000000000000000002"
    ]
