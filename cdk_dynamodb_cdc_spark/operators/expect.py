"""Declarative data-quality expectations (data contracts at ingest).

The CDC pipeline quarantines records that fail to PARSE
(`operators/pipeline.py`); this module generalizes that to records
that parse fine but violate the table's CONTRACT — the
Great-Expectations/dbt-tests shape, expressed as Spark-native plans:

* :func:`check`   — evaluate all rules, return one violation-count row
  per rule. Row-level rules fold into a SINGLE aggregation pass over
  one scan (a 100 TB audit costs one map-side-combined agg); set-level
  rules (uniqueness, referential integrity) each add the one shuffle
  they provably need.
* :func:`enforce` — split the input into (passing, violating) rows,
  the violating side annotated with the list of failed rule names —
  the data-contract analogue of the pipeline's parse quarantine, and
  composable with it in foreachBatch.

Rules are plain dicts (JSON-able — contracts live in config, not
code):

    {"rule": "not_null",  "col": "pk"}
    {"rule": "in_set",    "col": "operation",
     "values": ["INSERT", "MODIFY", "REMOVE"]}
    {"rule": "between",   "col": "size_bytes", "lo": 0, "hi": 400000}
    {"rule": "matches",   "col": "event_id", "pattern": "^e"}
    {"rule": "unique",    "cols": ["event_id"]}
    {"rule": "foreign_key", "cols": ["l_orderkey"],
     "ref": <DataFrame>, "ref_cols": ["o_orderkey"]}

``unique`` and ``foreign_key`` are set-level: they appear in
:func:`check` reports, and in :func:`enforce` they mark every row of a
duplicated key group / every orphan row as violating.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_ROW_RULES = ("not_null", "in_set", "between", "matches")


def _rule_name(rule: dict) -> str:
    cols = rule.get("col") or ",".join(rule.get("cols", []))
    return f"{rule['rule']}({cols})"


def _row_pass_expr(rule: dict) -> Column:
    """Boolean Column: does a row satisfy this row-level rule?"""
    kind = rule["rule"]
    c = F.col(rule["col"])
    if kind == "not_null":
        return c.isNotNull()
    if kind == "in_set":
        return c.isin(rule["values"])
    if kind == "between":
        # NULL passes `between` (use not_null to also require presence)
        return c.isNull() | ((c >= rule["lo"]) & (c <= rule["hi"]))
    if kind == "matches":
        return c.isNull() | c.rlike(rule["pattern"])
    raise ValueError(f"unknown row rule: {kind}")


def check(df: DataFrame, rules: list[dict]) -> DataFrame:
    """One row per rule: ``(rule, violations, rows_checked)``.

    All row-level rules evaluate in ONE aggregation over one scan;
    each ``unique`` adds one keyed agg, each ``foreign_key`` one
    (broadcast-eligible) anti-join aggregate.
    """
    row_rules = [r for r in rules if r["rule"] in _ROW_RULES]
    set_rules = [r for r in rules if r["rule"] not in _ROW_RULES]

    reports: list[DataFrame] = []
    if row_rules:
        aggs = [
            F.sum(
                F.when(~_row_pass_expr(r), 1).otherwise(0)
            ).alias(f"v{i}")
            for i, r in enumerate(row_rules)
        ]
        wide = df.agg(*aggs, F.count(F.lit(1)).alias("n"))
        stacked = wide.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(_rule_name(r)).alias("rule"),
                            F.col(f"v{i}")
                            .cast("bigint")
                            .alias("violations"),
                        )
                        for i, r in enumerate(row_rules)
                    ]
                )
            ).alias("s"),
            F.col("n").cast("bigint").alias("rows_checked"),
        )
        reports.append(
            stacked.select("s.rule", "s.violations", "rows_checked")
        )

    # Set-rule reports union FIRST and join the row count ONCE — each
    # additional set rule adds only its own agg/anti-join, never
    # another full-table count scan.
    set_reports: list[DataFrame] = []
    for r in set_rules:
        if r["rule"] == "unique":
            set_reports.append(
                df.groupBy(*r["cols"])
                .agg(F.count(F.lit(1)).alias("cnt"))
                .filter(F.col("cnt") > 1)
                .agg(
                    F.coalesce(F.sum("cnt"), F.lit(0))
                    .cast("bigint")
                    .alias("violations")
                )
                .select(F.lit(_rule_name(r)).alias("rule"), "violations")
            )
        elif r["rule"] == "foreign_key":
            ref = (
                r["ref"]
                .select(
                    *[
                        F.col(rc).alias(c)
                        for c, rc in zip(r["cols"], r["ref_cols"])
                    ]
                )
                .distinct()
            )
            set_reports.append(
                df.join(ref, on=r["cols"], how="left_anti")
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("violations")
                )
                .select(F.lit(_rule_name(r)).alias("rule"), "violations")
            )
        else:
            raise ValueError(f"unknown set rule: {r['rule']}")

    if set_reports:
        unioned = set_reports[0]
        for rep in set_reports[1:]:
            unioned = unioned.unionByName(rep)
        n = df.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        reports.append(
            unioned.crossJoin(F.broadcast(n)).select(
                "rule", "violations", F.col("n").alias("rows_checked")
            )
        )

    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out


def enforce(
    df: DataFrame, rules: list[dict]
) -> tuple[DataFrame, DataFrame]:
    """Split into (passing, violating); violating rows carry
    ``_violations: array<string>`` naming every failed rule. Set-level
    rules mark whole duplicate groups / all orphan rows."""
    flags: list[Column] = []
    fk_cols: list[str] = []
    work = df
    for i, r in enumerate(rules):
        name = F.lit(_rule_name(r))
        if r["rule"] in _ROW_RULES:
            flags.append(F.when(~_row_pass_expr(r), name))
        elif r["rule"] == "unique":
            cnt = F.count(F.lit(1)).over(
                Window.partitionBy(*r["cols"])
            )
            flags.append(F.when(cnt > 1, name))
        elif r["rule"] == "foreign_key":
            hit = f"_fk_hit_{i}"
            ref = (
                r["ref"]
                .select(
                    *[
                        F.col(rc).alias(c)
                        for c, rc in zip(r["cols"], r["ref_cols"])
                    ]
                )
                .distinct()
                .withColumn(hit, F.lit(1))
            )
            work = work.join(ref, on=r["cols"], how="left")
            fk_cols.append(hit)
            flags.append(F.when(F.col(hit).isNull(), name))
        else:
            raise ValueError(f"unknown rule: {r['rule']}")

    annotated = work.withColumn(
        "_violations",
        F.filter(F.array(*flags), lambda x: x.isNotNull()),
    ).drop(*fk_cols)
    good = annotated.filter(F.size("_violations") == 0).drop(
        "_violations"
    )
    bad = annotated.filter(F.size("_violations") > 0)
    return good, bad
