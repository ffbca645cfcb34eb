"""_bucketed_cumsum (queries.py) — the two-level partitioned
replacement for an unpartitioned cumulative window over a distinct-
value frame. The contract: bit-identical positions to the flat
window for ANY value distribution, inclusive and exclusive frames,
including negative values (`div` truncates toward zero, which is
monotone non-decreasing in the dividend for a fixed positive divisor,
so bucket assignment preserves value order — the invariant the
two-level rewrite needs; it does NOT floor toward -inf, so nothing
here may rely on floor behavior at negative bucket boundaries) and
single-bucket / one-row degenerate shapes."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cdk_dynamodb_cdc_spark.queries import _bucketed_cumsum


def _flat(df, inclusive):
    end = 0 if inclusive else -1
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, end)
    return df.withColumn(
        "p_flat",
        F.coalesce(
            F.sum("c").over(w), F.lit(0).cast("decimal(38,0)")
        ),
    )


CASES = [
    # (values, weights)
    ([1, 2, 3], [1, 1, 1]),
    ([0, 16777215, 16777216, 16777217, 33554432], [5, 1, 7, 2, 3]),
    ([-40000000, -1, 0, 1, 99999999999], [2, 3, 1, 4, 9]),
    ([42], [7]),
    (list(range(0, 2_000_000_000, 137_000_003)), None),
    # mass-style weights (the Lorenz spend-cumulative usage): weights
    # are value*count products in the 1e8-1e13 range, not row counts
    (
        [1013_70, 499978_59, 123456_78, 16777216_00, 2_000_000_01],
        [123_456_789, 9_876_543_210, 42, 7_000_000_000_123, 1],
    ),
]


@pytest.mark.parametrize("inclusive", [True, False])
@pytest.mark.parametrize("values,weights", CASES)
def test_matches_flat_window(spark, values, weights, inclusive):
    weights = weights or [1 + (i % 5) for i in range(len(values))]
    df = spark.createDataFrame(
        [(v, w) for v, w in zip(values, weights)], "v long, c long"
    ).withColumn("c", F.col("c").cast("decimal(38,0)"))
    got = _bucketed_cumsum(
        df, value_col="v", weight_col="c", out_col="p",
        inclusive=inclusive,
    )
    both = got.join(_flat(df, inclusive), ["v", "c"])
    rows = both.select("v", "p", "p_flat").collect()
    assert len(rows) == len(values)
    for r in rows:
        assert r["p"] == r["p_flat"], (r["v"], r["p"], r["p_flat"])


def test_temp_columns_dropped(spark):
    df = spark.createDataFrame(
        [(1, 1)], "v long, c long"
    ).withColumn("c", F.col("c").cast("decimal(38,0)"))
    out = _bucketed_cumsum(
        df, value_col="v", weight_col="c", out_col="p",
        inclusive=False,
    )
    assert set(out.columns) == {"v", "c", "p"}


def test_value_window_is_bucket_partitioned(spark):
    """The only unpartitioned window may be the bucket histogram —
    the value-level cumulative must carry a partition spec."""
    df = spark.createDataFrame(
        [(i, 1) for i in range(100)], "v long, c long"
    ).withColumn("c", F.col("c").cast("decimal(38,0)"))
    plan = _bucketed_cumsum(
        df, value_col="v", weight_col="c", out_col="p",
        inclusive=False,
    )._jdf.queryExecution().executedPlan().toString()
    # windowspecdefinition(partition..., order ASC, frame): the
    # value-level window must carry __b as a PARTITION column (bare
    # `__b#N,` before the ordered v), the bucket-offset window orders
    # by __b with no partition (`__b#N ASC` first arg)
    import re

    win_lines = [
        ln for ln in plan.splitlines() if "windowspecdefinition" in ln
    ]
    assert len(win_lines) == 2, win_lines
    partitioned = [
        ln
        for ln in win_lines
        if re.search(r"windowspecdefinition\(__b#\d+L?, v#", ln)
    ]
    unpartitioned = [
        ln
        for ln in win_lines
        if re.search(r"windowspecdefinition\(__b#\d+L? ASC", ln)
    ]
    assert len(partitioned) == 1, win_lines
    assert len(unpartitioned) == 1, win_lines
