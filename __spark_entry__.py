"""Driver contract for the spark-graft builder (PySpark target).

``entry``      — flagship query smoke check at sf0.001.
``queries``    — one callable per implemented operator (SURVEY.md §2).
``oracle_sql`` — DuckDB-equivalent SQL per query for the correctness gate.

Implementation lives in ``cdk_dynamodb_cdc_spark/queries.py``; this module
is a thin adapter so the engine package stays importable on its own.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdk_dynamodb_cdc_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize a CDC stream from the events table, run the
    full change-event pipeline (unmarshall -> diff -> no-op filter ->
    projection), aggregate change stats per operation (SURVEY.md §7.3)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return QUERIES["cdc_change_stats"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator from SURVEY.md §2."""

    def with_conf(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # events.ts is parquet TIMESTAMP(NANOS); see sources/tables.py.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            return fn(spark, sf_dir)

        return wrapped

    return {name: with_conf(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, same column names/aliases."""
    return dict(ORACLES)
