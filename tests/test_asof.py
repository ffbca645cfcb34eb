"""Unit tests for the as-of join operator, incl. the matched-row
integrity property (all carried fields from the SAME right row)."""

from __future__ import annotations

import datetime

UTC = datetime.timezone.utc


def _ts(minute):
    return datetime.datetime(2024, 1, 1, 12, minute, tzinfo=UTC)


def _frames(spark, left_rows, right_rows):
    left = spark.createDataFrame(
        left_rows, "k long, t timestamp, lbl string"
    )
    right = spark.createDataFrame(
        right_rows, "rk long, rt timestamp, v double, v2 string"
    )
    return left, right


def _join(left, right, **kw):
    from cdk_dynamodb_cdc_spark.operators.asof import asof_join

    return asof_join(
        left, right,
        left_on="t", right_on="rt", left_by="k", right_by="rk",
        value_cols=["v", "v2"], **kw,
    )


def test_matches_most_recent_prior_row(spark):
    left, right = _frames(
        spark,
        [(1, _ts(10), "a"), (1, _ts(30), "b"), (2, _ts(10), "c")],
        [(1, _ts(5), 1.0, "x"), (1, _ts(20), 2.0, "y")],
    )
    got = {r.lbl: (r.v, r.v2) for r in _join(left, right).collect()}
    assert got == {"a": (1.0, "x"), "b": (2.0, "y"), "c": (None, None)}


def test_carried_fields_come_from_same_matched_row(spark):
    """A NULL in the matched row must NOT fall back to an older row's
    value for that column (pandas merge_asof / DuckDB ASOF semantics)."""
    left, right = _frames(
        spark,
        [(1, _ts(30), "a")],
        [(1, _ts(5), 1.0, "old"), (1, _ts(20), None, "new")],
    )
    [r] = _join(left, right).collect()
    assert r.v is None and r.v2 == "new"


def test_equal_timestamps_match(spark):
    left, right = _frames(
        spark, [(1, _ts(20), "a")], [(1, _ts(20), 5.0, "x")]
    )
    [r] = _join(left, right).collect()
    assert r.v == 5.0


def test_tolerance_uses_matched_row_timestamp(spark):
    left, right = _frames(
        spark,
        [(1, _ts(30), "a"), (1, _ts(59), "b")],
        [(1, _ts(25), 1.0, "x")],
    )
    got = {r.lbl: r.v for r in _join(left, right, tolerance="10 MINUTE").collect()}
    # 'a' is 5 min after the match (within); 'b' is 34 min after (out)
    assert got == {"a": 1.0, "b": None}


def test_forward_direction_matches_next_row(spark):
    left, right = _frames(
        spark,
        [(1, _ts(10), "a"), (1, _ts(30), "b"), (2, _ts(10), "c")],
        [(1, _ts(5), 1.0, "x"), (1, _ts(20), 2.0, "y")],
    )
    got = {r.lbl: r.v for r in _join(left, right, direction="forward").collect()}
    # a (t=10) -> next right at 20; b (t=30) -> none after; c -> no key
    assert got == {"a": 2.0, "b": None, "c": None}


def test_forward_equal_timestamp_matches_and_tolerance(spark):
    left, right = _frames(
        spark,
        [(1, _ts(20), "eq"), (1, _ts(2), "far")],
        [(1, _ts(20), 7.0, "x")],
    )
    got = {r.lbl: r.v for r in _join(
        left, right, direction="forward", tolerance="10 MINUTE").collect()}
    # eq matches the right row AT its own timestamp; far is 18 min
    # before the only right row — outside tolerance
    assert got == {"eq": 7.0, "far": None}
