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


# ---------------------------------------------------------------------------
# temporal_join: SCD2 point-in-interval enrichment
# ---------------------------------------------------------------------------
def _temporal(spark, fact_rows, dim_rows):
    from cdk_dynamodb_cdc_spark.operators.asof import temporal_join

    facts = spark.createDataFrame(fact_rows, "k long, t timestamp, lbl string")
    dim = spark.createDataFrame(
        dim_rows, "k long, valid_from timestamp, valid_to timestamp, v string"
    )
    out = temporal_join(
        facts, dim, fact_time="t", keys=("k",), value_cols=("v",)
    )
    return {(r.k, r.lbl): r.v for r in out.collect()}


def test_temporal_bounds_inclusive_lower_exclusive_upper(spark):
    got = _temporal(
        spark,
        [(1, _ts(10), "at_open"), (1, _ts(15), "inside"),
         (1, _ts(20), "at_close"), (1, _ts(25), "in_next")],
        [(1, _ts(10), _ts(20), "v1"), (1, _ts(20), None, "v2")],
    )
    assert got == {
        (1, "at_open"): "v1",
        (1, "inside"): "v1",
        (1, "at_close"): "v2",   # half-open: t == valid_to rolls forward
        (1, "in_next"): "v2",
    }


def test_temporal_holes_and_before_first_are_null(spark):
    # version closed at :20, next opens at :30 — the hole nulls out
    got = _temporal(
        spark,
        [(1, _ts(5), "before"), (1, _ts(25), "hole"), (1, _ts(35), "after")],
        [(1, _ts(10), _ts(20), "v1"), (1, _ts(30), None, "v2")],
    )
    assert got == {
        (1, "before"): None,
        (1, "hole"): None,       # NOT the stale v1
        (1, "after"): "v2",
    }


def test_temporal_zero_width_tombstone(spark):
    # tombstone closes the last version at its own open instant: a
    # zero-width interval matches nothing, even a probe AT the instant
    got = _temporal(
        spark,
        [(1, _ts(15), "live"), (1, _ts(20), "at_tomb"), (1, _ts(30), "dead")],
        [(1, _ts(10), _ts(20), "v1"), (1, _ts(20), _ts(20), "v_tomb")],
    )
    assert got == {
        (1, "live"): "v1",
        (1, "at_tomb"): None,
        (1, "dead"): None,
    }


def test_temporal_same_instant_reopen_wins(spark):
    # a zero-width version and a surviving version open at the same
    # instant: the probe at that instant gets the survivor
    got = _temporal(
        spark,
        [(1, _ts(20), "probe")],
        [(1, _ts(20), _ts(20), "ghost"), (1, _ts(20), None, "keeper")],
    )
    assert got == {(1, "probe"): "keeper"}


def test_temporal_keys_do_not_cross(spark):
    got = _temporal(
        spark,
        [(1, _ts(15), "k1"), (2, _ts(15), "k2")],
        [(1, _ts(10), None, "only_k1")],
    )
    assert got == {(1, "k1"): "only_k1", (2, "k2"): None}
