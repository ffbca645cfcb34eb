"""Continuous aggregate (hypertable-style rollup).

Timeseries stores (TimescaleDB hypertables, Druid rollup segments)
maintain pre-aggregated time buckets and answer coarse queries from
fine buckets instead of raw rows. The Spark-native equivalent: a
materializable fine-bucket aggregate plus a re-aggregation that
composes correctly (sums of sums, counts of counts, min/max of
min/max), so a day query reads 24 hourly rows per key rather than the
raw events.

Scale: the fine rollup is ONE shuffle over (bucket, key) with map-side
partial aggregation; every coarser query is then a shuffle over the
(much smaller) rollup. Decimal sums keep re-aggregation exact, so
rollup-answered queries hash-match raw-answered ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def continuous_aggregate(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    bucket: str = "1 hour",
    key_cols: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Fine-grained rollup: (bucket_start, keys) -> count / decimal sum
    / min / max of the value column."""
    keys = key_cols or []
    dec = F.col(value_col).cast("decimal(18,4)")
    return (
        events.groupBy(
            F.window(ts_col, bucket).start.alias("bucket_start"), *keys
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec).alias("sum_value"),
            F.min(dec).alias("min_value"),
            F.max(dec).alias("max_value"),
        )
    )


def reaggregate(
    rollup: DataFrame,
    *,
    bucket: str = "1 day",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Answer a coarser-bucket query FROM the rollup: counts add, sums
    add, min/max compose — equivalent to aggregating the raw rows."""
    keys = key_cols or []
    return (
        rollup.groupBy(
            F.window("bucket_start", bucket).start.alias("bucket_start"), *keys
        )
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )
