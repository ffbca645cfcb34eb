"""The round-9 driver-gate bisect probes must be EXACT decompositions
of the two queries they instrument — if a probe drifted from the
original pipeline, a green probe could no longer exonerate the stage
it claims to cover.

Round 10 demoted the probes out of the query registry (the bug they
bisected is root-caused and canary-guarded in
tools/check_correctness.py); they live in ``queries.PROBES`` now and
THIS suite is what keeps them honest."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qmod():
    from cdk_dynamodb_cdc_spark import queries

    return queries


def test_km_risk_table_matches_original_km_rows(spark, qmod):
    km = {
        r["duration_min"]: r
        for r in qmod.QUERIES["session_kaplan_meier"](spark, SF).collect()
    }
    probe = qmod.PROBES["probe_km_risk_table"](spark, SF).collect()
    assert len(probe) == len(km)
    for r in probe:
        o = km[r["duration_min"]]
        assert r["n_deaths"] == o["n_deaths"]
        assert r["n_censored"] == o["n_censored"]
        assert r["n_at_risk"] == o["n_at_risk"]


def test_km_unrolled3_is_the_original_head(spark, qmod):
    km = sorted(
        qmod.QUERIES["session_kaplan_meier"](spark, SF).collect(),
        key=lambda r: r["duration_min"],
    )[:3]
    probe = sorted(
        qmod.PROBES["probe_km_unrolled3"](spark, SF).collect(),
        key=lambda r: r["rn"],
    )
    assert [(r["duration_min"], r["surv_scaled"]) for r in probe] == [
        (r["duration_min"], r["surv_scaled"]) for r in km
    ]


def test_km_first_step_equals_first_factor(spark, qmod):
    # S(t_1) = factor_1 by definition (S starts at 1.0 = 1e12)
    factors = {
        r["rn"]: r["factor_scaled"]
        for r in qmod.PROBES["probe_km_step_factors"](spark, SF).collect()
    }
    head = sorted(
        qmod.QUERIES["session_kaplan_meier"](spark, SF).collect(),
        key=lambda r: r["duration_min"],
    )[0]
    assert head["surv_scaled"] == factors[1]


def test_hw_unrolled3_is_the_original_head(spark, qmod):
    hw = sorted(
        qmod.QUERIES["holt_winters_revenue"](spark, SF).collect(),
        key=lambda r: r["day"],
    )[:3]
    probe = sorted(
        qmod.PROBES["probe_hw_unrolled3"](spark, SF).collect(),
        key=lambda r: r["rn"],
    )
    assert [
        (r["day"], r["fit_cents"], r["level_cents"], r["trend_cents"],
         r["seasonal_cents"])
        for r in probe
    ] == [
        (r["day"], r["fit_cents"], r["level_cents"], r["trend_cents"],
         r["seasonal_cents"])
        for r in hw
    ]


def test_hw_init_state_feeds_the_first_step(spark, qmod):
    # replay step rn=8 from the probe-exposed init state and compare
    # with the original fold's first emitted row
    init = qmod.PROBES["probe_hw_init_state"](spark, SF).collect()[0]
    inputs = {
        r["rn"]: r
        for r in qmod.PROBES["probe_hw_daily_inputs"](spark, SF).collect()
    }
    y8 = inputs[8]["rev_cents"]
    lv0, tr0, s1 = init["level0_cents"], 0, init["seas1_cents"]

    def fd(n, d):
        return (n - (((n % d) + d) % d)) // d

    fit = lv0 + tr0 + s1
    lv1 = fd((y8 - s1) + 4 * (lv0 + tr0), 5)
    tr1 = fd((lv1 - lv0) + 9 * tr0, 10)
    sn = fd((y8 - lv1) + 4 * s1, 5)
    head = sorted(
        qmod.QUERIES["holt_winters_revenue"](spark, SF).collect(),
        key=lambda r: r["day"],
    )[0]
    assert (head["fit_cents"], head["level_cents"],
            head["trend_cents"], head["seasonal_cents"]) == (
        fit, lv1, tr1, sn
    )
