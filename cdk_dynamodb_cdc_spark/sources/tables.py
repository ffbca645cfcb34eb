"""Test-corpus table loader (TESTDATA.md).

One entry point — :func:`load_table` / :func:`register_tables` — that all
queries, tests, and the bench share, so schema normalization lives in one
place:

* ``events.ts`` is stored as parquet ``TIMESTAMP(NANOS)``, which Spark's
  reader rejects; with ``spark.sql.legacy.parquet.nanosAsLong`` the
  column arrives as a long of epoch-nanos and is converted here to
  ``TimestampType`` via integer-µs truncation — lossless for this corpus
  (all values are µs-precision) and bit-identical to DuckDB's default
  nanos->micros read of the same files, which the oracle comparison
  relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# columns stored as TIMESTAMP(NANOS) that arrive as epoch-nano longs
_NANO_TS_COLS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _NANO_TS_COLS.get(name, []):
        if dict(df.dtypes).get(c) == "bigint":
            # Integer division: epoch-nanos (~1.7e18) exceed double's 2^53
            # exact range, so `/ 1000` through double truncates ~1.6% of
            # values 1 µs low. `div` stays in long arithmetic.
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def register_tables(spark: SparkSession, sf_dir: str,
                    names: list[str] | None = None) -> None:
    """Register corpus tables as temp views for the SQL surface."""
    for name in names or TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
