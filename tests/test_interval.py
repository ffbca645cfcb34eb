"""Grid-bucketed interval-lookup join (operators/interval.py):
exactness vs the naive BETWEEN join on constructed cases — boundary
values, intervals spanning many cells, overlapping intervals (fan-out
preserved, no duplicate pairs), and the left lane's null padding."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdk_dynamodb_cdc_spark.operators.interval import grid_interval_join


def _frames(spark):
    facts = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0, 10, 25, 49, 50, 99, 250, 999])],
        "fact_id long, v double",
    )
    ivals = spark.createDataFrame(
        [
            ("narrow", 10, 10),      # single point
            ("lowband", 0, 49),      # boundary-closed both ends
            ("overlap", 25, 120),    # overlaps lowband and spans cells
            ("wide", 0, 500),        # spans many grid cells
        ],
        "name string, lo long, hi long",
    )
    return facts, ivals


def _naive(facts, ivals, how):
    cond = (facts["v"] >= ivals["lo"]) & (facts["v"] <= ivals["hi"])
    joined = facts.join(ivals, cond, "left" if how == "left" else "inner")
    return sorted(
        (r.fact_id, r.name) for r in joined.select("fact_id", "name").collect()
    )


@pytest.mark.parametrize("cell", [7.0, 50.0, 1000.0])
@pytest.mark.parametrize("how", ["inner", "left"])
def test_grid_join_equals_between_join(spark, cell, how):
    facts, ivals = _frames(spark)
    got = sorted(
        (r.fact_id, r.name)
        for r in grid_interval_join(
            facts, ivals, value_col="v", cell=cell, how=how
        )
        .select("fact_id", "name")
        .collect()
    )
    assert got == _naive(facts, ivals, how)
    # no duplicate (fact, interval) pairs at any cell width
    assert len(got) == len(set(got))


def test_grid_join_left_pads_unmatched(spark):
    facts, ivals = _frames(spark)
    out = grid_interval_join(
        facts, ivals, value_col="v", cell=50.0, how="left"
    )
    unmatched = [r.fact_id for r in out.collect() if r.name is None]
    assert unmatched == [7]  # v=999 is beyond every band

    with pytest.raises(ValueError, match="how"):
        grid_interval_join(facts, ivals, value_col="v", cell=50.0, how="anti")
