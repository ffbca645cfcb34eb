"""Keyless interval-lookup join via grid bucketing (SURVEY.md §2B,
the theta-join family).

A pure interval containment join — ``fact.value BETWEEN dim.lo AND
dim.hi`` with NO equi key — gives Catalyst nothing to hash on: the
plan degenerates to broadcast-nested-loop, O(facts x intervals)
comparisons. The standard scale fix (the technique range-join hints
automate in commercial engines) is to MANUFACTURE an equi key: chop
the number line into fixed-width grid cells, explode each interval to
the cells it overlaps (the interval table is the small side — band
tables, IP-to-geo ranges, SLA tiers), give each fact the single cell
containing its value, and hash-join on the cell id before applying
the precise BETWEEN. Every fact lands in exactly one cell and each
interval covers that cell at most once, so no pair is produced — or
checked — twice, and the per-fact work drops from O(intervals) to
O(intervals overlapping its cell).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    *,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    cell: float,
    how: str = "inner",
) -> DataFrame:
    """Join each fact row to every interval row whose CLOSED range
    ``[lo, hi]`` contains ``value_col``.

    ``cell`` is the grid width: pick it near the median interval
    width, so typical intervals explode to O(1) cells while a fact
    still meets few candidate intervals. Exactness never depends on
    the choice — only the candidate count does.

    ``how="left"`` keeps facts matching no interval (interval columns
    null) — one extra anti-ish pass expressed as a left join on the
    already-bucketed candidates.

    Scale shape: the interval side explodes by its cell span and is
    broadcast (band/range tables are dimension-sized); facts compute
    one ``floor(value / cell)`` map-side and hash-join — no shuffle of
    the fact stream, no nested loop. Intervals and facts must be on
    the same numeric scale; NULL values or bounds never match.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left: {how!r}")
    cells = intervals.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(cell)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(cell)).cast("long"),
            )
        ).alias("__grid_cell"),
    )
    probed = facts.withColumn(
        "__grid_cell",
        F.floor(F.col(value_col) / F.lit(cell)).cast("long"),
    )
    hit = (F.col(value_col) >= F.col(lo_col)) & (
        F.col(value_col) <= F.col(hi_col)
    )
    if how == "inner":
        return (
            probed.join(F.broadcast(cells), ["__grid_cell"])
            .filter(hit)
            .drop("__grid_cell")
        )
    matched = probed.join(
        F.broadcast(cells),
        (probed["__grid_cell"] == cells["__grid_cell"]) & hit,
        "left",
    )
    return matched.drop(cells["__grid_cell"]).drop("__grid_cell")
