"""As-of join — nearest prior version (SURVEY.md §2B).

Natural for CDC ("state at time T") but absent from both the reference
and Spark built-ins. Implemented with the union-merge trick: tag both
sides, union, and take ``last(value, ignoreNulls)`` over a per-key window
ordered by (time, side). ONE shuffle on the join key, no row blowup —
unlike the naive range-join + argmax which multiplies rows before
re-aggregating. At 100 TB this is the difference between a linear pass
and a quadratic blow-up on hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    value_cols: list[str],
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row within the same
    key group: the most recent with ``right_on <= left_on`` when
    ``direction="backward"`` (the default, pandas merge_asof / DuckDB
    ASOF JOIN semantics), or the earliest with ``right_on >= left_on``
    when ``direction="forward"``.

    ``value_cols`` are the right-side columns to carry. A right row AT
    the left timestamp matches in both directions (side-tag ordering
    puts the right row inside the window frame at equal timestamps).
    Either way: ONE shuffle on the key, no row blowup.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    overlap = set(left.columns) & set(value_cols)
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {sorted(overlap)}")
    tagged_left = left.select(
        F.col(left_by).alias("__key"),
        F.col(left_on).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__v_{c}") for c in value_cols],
    )
    tagged_right = right.select(
        F.col(right_by).alias("__key"),
        F.col(right_on).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns],
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    if direction == "backward":
        # right (side 0) sorts before left at equal t; LAST over the
        # preceding frame = most recent right row at-or-before
        w = (
            Window.partitionBy("__key")
            .orderBy(F.col("__t").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        # right sorts after left at equal t (descending side puts left
        # tag 1 first); FIRST over the following frame = earliest right
        # row at-or-after
        w = (
            Window.partitionBy("__key")
            .orderBy(F.col("__t").asc(), F.col("__side").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
    merged = tagged_left.unionByName(tagged_right)
    # Fill ONE struct per right row (timestamp + all value columns) so
    # every carried field comes from the SAME matched right row —
    # per-column last(ignorenulls) would stitch a NULL field in the
    # matched row together with an older row's value, which pandas
    # merge_asof / DuckDB ASOF JOIN never do.
    right_payload = F.when(
        F.col("__side") == 0,
        F.struct(
            F.col("__t").alias("__rt"),
            *[F.col(f"__v_{c}").alias(c) for c in value_cols],
        ),
    )
    fill = (
        F.last(right_payload, ignorenulls=True)
        if direction == "backward"
        else F.first(right_payload, ignorenulls=True)
    )
    filled = merged.select("*", fill.over(w).alias("__m"))
    out = filled.filter(F.col("__side") == 1)
    if tolerance is not None:
        if direction == "backward":
            within = F.col("__m.__rt") >= F.col("__t") - F.expr(f"INTERVAL {tolerance}")
        else:
            within = F.col("__m.__rt") <= F.col("__t") + F.expr(f"INTERVAL {tolerance}")
        out = out.select(
            *left.columns,
            *[F.when(within, F.col(f"__m.{c}")).alias(c) for c in value_cols],
        )
    else:
        out = out.select(
            *left.columns, *[F.col(f"__m.{c}").alias(c) for c in value_cols]
        )
    return out
