"""Golden CDC fixtures (FIXTURES.md §1-2; SURVEY.md §5).

The reference ships zero tests, so this module IS the golden corpus: a
hand-written set of marshalled stream records covering every branch of the
reference runtime — INSERT / MODIFY / REMOVE, nested-map change (dot-path
recursion), array change (atomic compare), set canonicalization, no-op
MODIFY (must be dropped), attribute add/remove, claim-check threshold
straddles, malformed records (null guards), and every AttributeValue tag.
"""

from __future__ import annotations

import datetime
import json

from pyspark.sql import DataFrame, SparkSession

from cdk_dynamodb_cdc_spark.schemas import CDC_RECORD_SCHEMA

_TS0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)


def _m(obj: dict) -> str:
    return json.dumps(obj)


def fixture_rows() -> list[tuple]:
    """(event_id, seq, ts, operation, pk, sk, old_image, new_image, size_bytes)."""

    def ts(i: int) -> datetime.datetime:
        return _TS0 + datetime.timedelta(minutes=i)

    base = {
        "name": {"S": "alice"},
        "n": {"N": "1.5"},
        "big": {"N": "123456789012345678901"},
        "ok": {"BOOL": True},
        "nil": {"NULL": True},
        "tags": {"L": [{"S": "x"}, {"N": "2"}]},
        "addr": {"M": {"city": {"S": "nyc"}, "zip": {"S": "10001"}}},
        "ss": {"SS": ["b", "a"]},
        "ns": {"NS": ["10", "2"]},
        "blob": {"B": "aGVsbG8="},
    }
    scalar_mod = dict(base, n={"N": "2.5"})
    nested_mod = dict(base, addr={"M": {"city": {"S": "sf"}, "zip": {"S": "10001"}}})
    array_mod = dict(base, tags={"L": [{"S": "x"}, {"N": "3"}]})
    attr_added = dict(base, extra={"S": "new-attr"})
    attr_removed = {k: v for k, v in base.items() if k != "ok"}
    set_reordered = dict(base, ss={"SS": ["a", "b"]})  # same set, new order: no-op

    return [
        ("ev-insert", 1, ts(0), "INSERT", "USER#1", "PROFILE", None, _m(base), 512),
        ("ev-scalar", 2, ts(1), "MODIFY", "USER#1", "PROFILE", _m(base), _m(scalar_mod), 512),
        ("ev-nested", 3, ts(2), "MODIFY", "USER#1", "PROFILE", _m(base), _m(nested_mod), 512),
        ("ev-array", 4, ts(3), "MODIFY", "USER#1", "PROFILE", _m(base), _m(array_mod), 512),
        ("ev-noop", 5, ts(4), "MODIFY", "USER#1", "PROFILE", _m(base), _m(base), 512),
        ("ev-set-reorder", 6, ts(5), "MODIFY", "USER#1", "PROFILE", _m(base), _m(set_reordered), 512),
        ("ev-add", 7, ts(6), "MODIFY", "USER#2", "PROFILE", _m(base), _m(attr_added), 512),
        ("ev-remove-attr", 8, ts(7), "MODIFY", "USER#2", "PROFILE", _m(base), _m(attr_removed), 512),
        ("ev-remove", 9, ts(8), "REMOVE", "USER#2", "PROFILE", _m(base), None, 512),
        ("ev-big", 10, ts(9), "MODIFY", "ORDER#1", "DETAIL", _m(base), _m(scalar_mod), 64 * 1024),
        ("ev-zero-size", 11, ts(10), "MODIFY", "ORDER#1", "DETAIL", _m(base), _m(scalar_mod), 0),
        (None, 12, ts(11), "MODIFY", "USER#3", "PROFILE", _m(base), _m(scalar_mod), 512),
        ("ev-no-op-name", 13, ts(12), None, "USER#3", "PROFILE", _m(base), _m(scalar_mod), 512),
        ("ev-malformed", 14, ts(13), "MODIFY", "USER#3", "PROFILE", "{not json", _m(scalar_mod), 512),
        ("ev-order-ins", 15, ts(14), "INSERT", "ORDER#42", "2024-01-01", None,
         _m({"total": {"N": "99.95"}, "lines": {"L": [{"M": {"qty": {"N": "1"}}}]}}), 256),
    ]


def cdc_fixture_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(fixture_rows(), schema=CDC_RECORD_SCHEMA)
