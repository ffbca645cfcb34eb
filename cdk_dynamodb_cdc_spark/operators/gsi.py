"""GSI analogue: alternate access paths as physical layout (SURVEY §1.1).

The reference declares GSIs named `{gsi}pk`/`{gsi}sk` with full
projection (`/root/reference/lib/constructs/dynamo.ts:75-83`). In a
Spark-resident table an index is not a separate structure — it is a
partitioning + intra-partition order (or a re-partitioned persisted
copy), which is exactly what makes per-key scans and merge-style
access cheap on the alternate key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gsi_projection(
    df: DataFrame, gsi_pk: str, gsi_sk: str, *, num_partitions: int | None = None
) -> DataFrame:
    """Re-cluster rows by an alternate (pk, sk): hash-partition on the
    GSI partition key, sort within partitions by (pk, sk) so per-key
    range scans are sequential — the query-side shape of
    ProjectionType.ALL."""
    parts = (
        df.repartition(num_partitions, F.col(gsi_pk))
        if num_partitions
        else df.repartition(F.col(gsi_pk))
    )
    return parts.sortWithinPartitions(gsi_pk, gsi_sk)


def write_gsi_copy(
    df: DataFrame, path: str, gsi_pk: str, gsi_sk: str, *, buckets: int = 64
) -> None:
    """Materialized GSI: a parquet copy laid out for the alternate key
    (directory-partitioned by a bucket of the GSI pk, sorted within
    files), so readers prune to one bucket per key lookup."""
    (
        df.withColumn("__bucket", F.pmod(F.hash(F.col(gsi_pk)), F.lit(buckets)))
        .repartition(F.col("__bucket"))
        .sortWithinPartitions(gsi_pk, gsi_sk)
        .write.mode("overwrite")
        .partitionBy("__bucket")
        .parquet(path)
    )
