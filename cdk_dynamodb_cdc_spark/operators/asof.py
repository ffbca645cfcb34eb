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


def temporal_join(
    facts: DataFrame,
    dim: DataFrame,
    *,
    fact_time: str,
    keys: tuple[str, ...],
    value_cols: tuple[str, ...],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Enrich each fact row with the dimension VERSION valid at the
    fact's timestamp — the SCD2 / ``FOR SYSTEM_TIME AS OF fact.ts``
    temporal join: match where ``valid_from <= t < valid_to`` (NULL
    ``valid_to`` = still open), NULL enrichment where no version covers
    ``t``. The natural consumer of :func:`~cdk_dynamodb_cdc_spark.
    operators.compaction.scd2_history`'s output (the reference replays
    its CDC stream into DynamoDB, which keeps only current state —
    point-in-time enrichment is unanswerable there;
    `dynamo-stream-handler.ts:105-131` overwrites in place).

    Unlike :func:`asof_join` (nearest prior EVENT), the dimension here
    carries explicit validity intervals, so deletions leave holes: a
    fact whose timestamp lands after a version's ``valid_to`` but
    before the next ``valid_from`` must get NULL, not the stale
    version. The union-merge trick still applies — ONE shuffle on the
    key, no row blowup, unlike the naive key-equi + range-predicate
    join that fans every fact out over its key's whole version history
    before filtering — but the carried payload includes ``valid_to``,
    checked after the merge.

    Well-posedness at timestamp collisions: versions opened at the
    same instant (a later version closing an earlier one at zero
    width, e.g. a tombstone at the final event's own timestamp) sort
    by ``valid_to`` ascending NULLS LAST, so the merge carries the
    version that actually survives the instant; the zero-width ones
    are then excluded by the half-open upper bound.
    """
    overlap = set(facts.columns) & set(value_cols)
    if overlap:
        raise ValueError(f"value_cols collide with fact columns: {sorted(overlap)}")
    dim_types = dict(dim.dtypes)
    tagged_facts = facts.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        F.col(fact_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(dim_types[valid_to]).alias("__vto"),
        *[F.col(c) for c in facts.columns],
        *[
            F.lit(None).cast(dim_types[c]).alias(f"__v_{c}")
            for c in value_cols
        ],
    )
    fact_types = dict(facts.dtypes)
    tagged_dim = dim.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        F.col(valid_from).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(valid_to).alias("__vto"),
        *[F.lit(None).cast(fact_types[c]).alias(c) for c in facts.columns],
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    # dim rows (side 0) sort before facts at equal t — a fact AT
    # valid_from matches that version (inclusive lower bound); among
    # dim rows opened at the same instant, the widest interval (open =
    # NULLS LAST) sorts last and wins the merge
    w = (
        Window.partitionBy(*[f"__k_{k}" for k in keys])
        .orderBy(
            F.col("__t").asc(),
            F.col("__side").asc(),
            F.col("__vto").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    payload = F.when(
        F.col("__side") == 0,
        F.struct(
            F.col("__vto").alias("__pvto"),
            *[F.col(f"__v_{c}").alias(c) for c in value_cols],
        ),
    )
    filled = tagged_facts.unionByName(tagged_dim).select(
        "*", F.last(payload, ignorenulls=True).over(w).alias("__m")
    )
    # half-open upper bound: the carried version only counts while the
    # fact's timestamp is strictly below its valid_to (holes between a
    # closed version and the next opening — CDC REMOVEs — null out here)
    live = F.col("__m").isNotNull() & (
        F.col("__m.__pvto").isNull() | (F.col("__t") < F.col("__m.__pvto"))
    )
    return filled.filter(F.col("__side") == 1).select(
        *facts.columns,
        *[F.when(live, F.col(f"__m.{c}")).alias(c) for c in value_cols],
    )
