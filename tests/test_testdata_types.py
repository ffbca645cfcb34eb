"""Round-start guard over the driver-regenerated corpus (TESTDATA.md).

The testdata parquet is REGENERATED every round and its physical types
have changed before: round 3's bench died because `events.ts` flipped
from TIMESTAMP(NANOS) to TIMESTAMP_NTZ and `unix_micros` raised on it.
These tests pin the exact physical and Spark-level types every query
assumes, so a future regen flips a fast pytest red instead of the
full-registry bench.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from cdk_dynamodb_cdc_spark.sources.tables import TABLE_NAMES, load_table

SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d) or os.path.exists(d)
]

# timestamp-typed columns and the parquet physical type the queries
# (via sources/tables.py + queries._epoch_us) are written against
EXPECTED_TS = {
    "events": {"ts": "timestamp[us]"},
    "orders": {"o_orderdate": "timestamp[us]"},
    "lineitem": {"l_shipdate": "timestamp[us]"},
}


def _one_file(path: str) -> str:
    if os.path.isdir(path):
        import glob

        return sorted(glob.glob(f"{path}/*.parquet"))[0]
    return path


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_parquet_physical_timestamp_types(sf_dir):
    for table, cols in EXPECTED_TS.items():
        schema = pq.read_schema(_one_file(f"{sf_dir}/{table}.parquet"))
        for col, expected in cols.items():
            actual = str(schema.field(col).type)
            assert actual == expected, (
                f"{sf_dir}/{table}.parquet column {col} is {actual}, "
                f"queries assume {expected} — testdata regen changed the "
                f"physical type; re-validate _epoch_us/load_table handling "
                f"BEFORE running the bench"
            )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_all_tables_load_with_expected_ts_dtypes(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for table in TABLE_NAMES:
        dtypes = dict(load_table(spark, sf_dir, table).dtypes)
        for col in EXPECTED_TS.get(table, {}):
            assert dtypes[col] == "timestamp_ntz", (
                f"{table}.{col} loads as {dtypes[col]}, queries are "
                f"written for timestamp_ntz"
            )
