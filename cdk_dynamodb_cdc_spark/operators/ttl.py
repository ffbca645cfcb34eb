"""TTL expiry -> synthetic REMOVE records (reference A13).

The reference's table declares `timeToLiveAttribute: "ttl"`
(`/root/reference/lib/constructs/dynamo.ts:63`): DynamoDB deletes items
whose epoch-seconds `ttl` attribute has passed and emits REMOVE records
into the stream. In a Spark-resident snapshot there is no managed
deletion, so this operator synthesizes those records: given an item
snapshot, emit one REMOVE per expired item, shaped exactly like a
stream REMOVE (old image only) so the standard pipeline consumes them
unchanged.

Declarative scan-filter-project — the `ttl < cutoff` predicate is a
plain Column comparison Catalyst pushes toward the scan; at 100 TB the
expiry pass reads only (keys, image, ttl) and shuffles nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TTL_ATTRIBUTE = "ttl"  # dynamo.ts:63


def expire_ttl(
    items: DataFrame,
    cutoff,
    *,
    ttl_attr: str = TTL_ATTRIBUTE,
    image_col: str = "image",
) -> DataFrame:
    """Items whose `ttl_attr` (epoch seconds, marshalled `N` inside the
    item image) is strictly before `cutoff` -> synthetic REMOVE CDC
    records (CDC_RECORD_SCHEMA).

    `items` needs (pk, sk, `image_col` marshalled-JSON). `cutoff` is a
    timestamp Column or literal; like DynamoDB, items with no ttl
    attribute never expire.
    """
    cutoff_col: Column = cutoff if isinstance(cutoff, Column) else F.lit(cutoff)
    cutoff_ts = cutoff_col.cast("timestamp")
    ttl_s = F.get_json_object(F.col(image_col), f"$.{ttl_attr}.N").cast("long")
    expired = items.filter(
        ttl_s.isNotNull() & (F.timestamp_seconds(ttl_s) < cutoff_ts)
    )
    return expired.select(
        F.concat(F.lit("ttl-"), F.col("pk"), F.lit("#"), F.col("sk"))
        .alias("event_id"),
        F.lit(None).cast("long").alias("seq"),
        cutoff_ts.alias("ts"),
        F.lit("REMOVE").alias("operation"),
        F.col("pk"),
        F.col("sk"),
        F.col(image_col).alias("old_image"),
        F.lit(None).cast("string").alias("new_image"),
        F.octet_length(F.col(image_col)).cast("long").alias("size_bytes"),
    )
