"""Stream-health monitoring for CDC consumers.

The reference trusts shard order absolutely (one Lambda per shard,
sequential records — `dynamo-stream-handler.ts:19-26`); a distributed
consumer should VERIFY that assumption instead, because a mis-keyed
producer or a resharded topic silently breaks the per-key `seq`
contract every downstream operator (reconstruction, squash, snapshot)
relies on. This module is the verification: per-key order auditing
over the arrival sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def seq_inversion_stats(
    records: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("pk", "sk"),
    seq_col: str = "seq",
    arrival_col: str = "arrival",
) -> DataFrame:
    """Per-key out-of-order arrival report: for each key, how many
    records arrived with a `seq_col` below the running maximum seen so
    far in `arrival_col` order — i.e. late deliveries that a
    seq-trusting consumer would mis-order.

    Returns one row per key WITH inversions: (key_cols..., n_records,
    n_inversions, max_lateness) where max_lateness is the largest
    (running_max - seq) gap observed. Keys in order contribute nothing,
    so the output size is bounded by the actual disorder, not the
    stream.

    Shape: one shuffle on the key columns, one ordered window pass —
    the same partitioning every per-key CDC operator already uses, so
    at scale this audit co-schedules with reconstruction for free.
    """
    # seq_col tie-breaks equal arrival stamps so the running max is
    # deterministic under any partitioning.
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(arrival_col, seq_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run_max = F.max(seq_col).over(w)
    flagged = records.select(
        *key_cols,
        F.col(seq_col).alias("_seq"),
        run_max.alias("_run_max"),
    )
    inv = F.col("_run_max").isNotNull() & (F.col("_seq") < F.col("_run_max"))
    return (
        flagged.groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.sum(inv.cast("long")).alias("n_inversions"),
            F.max(
                F.when(inv, F.col("_run_max") - F.col("_seq"))
            ).alias("max_lateness"),
        )
        .filter(F.col("n_inversions") > 0)
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Data-profiling audit: one row per requested column with
    ``(column, n_rows, n_nulls, n_distinct)`` — the completeness /
    cardinality summary a pipeline health check runs before trusting
    a new corpus drop (schema drift shows up here first: a column
    whose null fraction or cardinality jumps between drops).

    Shape: each column is cast to string (injective for the scalar
    types this profiles — shortest-repr doubles, µs timestamps,
    integers) and melted to ``(column, value)`` rows, then ONE
    aggregation keyed by column name computes count / null-count /
    distinct-count. Spark plans the distinct aggregate two-phase
    (partial distinct per task, then merge), so no column's full
    value set ever gathers on one node; the melt multiplies rows by
    len(cols) but never widens them beyond two fields. The plan is
    identical at any corpus size — the profile output is always
    exactly ``len(cols)`` rows.
    """
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("kv")
    ).select("kv.column", "kv.value")
    return melted.groupBy("column").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").isNull().cast("long")).alias("n_nulls"),
        F.count_distinct("value").alias("n_distinct"),
    )


def field_drift_stats(
    records: DataFrame,
    *,
    image_col: str = "new_image",
    ts_col: str = "ts",
) -> DataFrame:
    """Schema-drift profile of a CDC stream: one row per (attribute,
    wire type) pair seen in the marshalled images — how many records
    carry it and the first/last time it appeared (epoch µs). The lane
    that catches a producer adding, dropping, or re-typing an item
    attribute mid-stream, which a typed consumer (operators/
    typed_diff.py) must know before its generated schema goes stale.

    Parsing is generic (no schema assumed): each image is read as
    ``map<attr, map<wiretype, value>>`` — the DynamoDB AttributeValue
    wire shape — and exploded to (attr, wiretype) pairs. Per-pair
    aggregation is map-side combinable; output is attribute-schema
    sized, not stream sized. Per-row scan-speed otherwise.
    """
    # epoch µs for TIMESTAMP or TIMESTAMP_NTZ input (unix_micros
    # rejects NTZ; timestampdiff from the NTZ epoch handles both)
    ts_us = F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        F.col(ts_col).cast("timestamp_ntz"),
    )
    parsed = records.filter(F.col(image_col).isNotNull()).select(
        ts_us.alias("ts_us"),
        F.explode(
            F.from_json(
                F.col(image_col), "map<string, map<string, string>>"
            )
        ).alias("field", "av"),
    )
    return parsed.select(
        "ts_us", "field", F.map_keys("av")[0].alias("wire_type")
    ).groupBy("field", "wire_type").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.min("ts_us").alias("first_seen_us"),
        F.max("ts_us").alias("last_seen_us"),
    )
