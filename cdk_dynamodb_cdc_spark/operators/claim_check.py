"""Size-based claim check (reference A10, ``dynamo-stream-handler.ts:130-166``).

Large payloads are offloaded to a blob side-store keyed by ``event_id``
and the main row carries only a pointer (``images_url``) — the Spark
analogue of the reference's S3 put + 24 h presigned URL. The side-store
here is a JSON dataset under ``base_path`` (any Hadoop-compatible URI:
``s3a://``, ``hdfs://``, ``file://``), rows keyed by ``event_id``. The
streaming path writes ``dt=<d>/batch_id=<n>/`` partitions with dynamic
partition overwrite, so a replayed micro-batch overwrites its own
partitions — exactly-once across checkpoint retries, same recipe as the
main sink (streaming/stream.py).

Retention (reference A13: 24 h S3 lifecycle, ``dynamo.ts:111-116``) is
:func:`vacuum_side_store` — a partition-drop by write date.

The presigned-GET half of the reference's contract
(``dynamo-stream-handler.ts:154-165``) is :func:`presign_claim_urls` /
:func:`validate_claim_url`: an expiring keyed-hash capability appended
to the pointer, so possession of an event grants time-limited — not
permanent — access to the offloaded images.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdk_dynamodb_cdc_spark.schemas import CLAIM_CHECK_THRESHOLD


def side_store_writes(
    records: DataFrame, threshold: int = CLAIM_CHECK_THRESHOLD
) -> DataFrame:
    """Rows whose images must be offloaded, projected to the side-store
    schema ``(event_id, old_image, new_image, dt)``.

    Mirrors the reference's ``{oldImage, newImage}`` S3 object body
    (:140-148); ``dt`` partitions the store so retention is a cheap
    partition drop instead of a per-object scan.
    """
    big = records.filter(
        F.col("size_bytes").isNull()
        | (F.col("size_bytes") == 0)
        | (F.col("size_bytes") >= threshold)
    )
    return big.select(
        "event_id",
        "old_image",
        "new_image",
        F.to_date(F.coalesce(F.col("ts"), F.current_timestamp())).alias("dt"),
    )


def write_side_store(records: DataFrame, base_path: str,
                     threshold: int = CLAIM_CHECK_THRESHOLD,
                     batch_id: int | None = None) -> None:
    """Write offloaded images to the side store, partitioned by date.

    With a ``batch_id`` (the streaming path), rows land under
    ``dt=<d>/batch_id=<n>/`` via DYNAMIC partition overwrite — a
    checkpoint replay of the same micro-batch overwrites its own
    partitions instead of appending duplicates, matching the main
    sink's exactly-once recipe (streaming/stream.py). `dt` stays the
    LEADING partition key so :func:`vacuum_side_store`'s top-level
    date-partition drop is unchanged. Without a batch_id (one-shot
    batch use) the write is a plain append.
    """
    out = side_store_writes(records, threshold)
    if batch_id is None:
        out.write.mode("append").partitionBy("dt").parquet(base_path)
        return
    spark = records.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            out.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("dt", "batch_id")
            .parquet(base_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def _keyed_hash(msg, secret: str):
    """HMAC-shaped keyed hash in pure Column arithmetic:
    sha2(key || sha2(key || msg)) — the nested construction (not a bare
    sha2(msg || key)) so length-extension over the outer hash is closed
    off. JVM-side sha2, no UDF."""
    inner = F.sha2(F.concat(F.lit(secret), F.lit("|"), msg), 256)
    return F.sha2(F.concat(F.lit(secret), F.lit("|"), inner), 256)


def presign_claim_urls(
    events: DataFrame,
    secret: str,
    *,
    ttl_hours: int = 24,
    now=None,
) -> DataFrame:
    """A10 presign analogue (``dynamo-stream-handler.ts:154-165``): turn
    each ``images_url`` pointer into an EXPIRING SIGNED CAPABILITY —
    ``<url>?expires=<epoch>&sig=<keyed-hash>`` — instead of a bare path
    any reader could fabricate.

    The reference hands consumers a 24 h presigned S3 GET; the engine's
    side store is a plain object path, so the access contract rides in
    the event itself: a consumer presents the URL, and the storage
    front (or :func:`validate_claim_url` in a reader job) recomputes
    the keyed hash over (path, expiry) and rejects tampered or expired
    tokens. TTL defaults to the reference's 24 h presign/lifecycle
    window, which also matches :func:`vacuum_side_store` — a token
    never outlives the object it points to.

    ``now`` accepts a Column for deterministic tests; small-payload
    rows (null ``images_url``) stay null. Pure Column arithmetic —
    signing a 100 TB day of events is scan-speed.
    """
    now_col = now if now is not None else F.current_timestamp()
    expires = (F.unix_timestamp(now_col) + F.lit(ttl_hours * 3600)).cast(
        "string"
    )
    msg = F.concat_ws("|", F.col("images_url"), expires)
    signed = F.when(
        F.col("images_url").isNotNull(),
        F.concat(
            F.col("images_url"),
            F.lit("?expires="),
            expires,
            F.lit("&sig="),
            _keyed_hash(msg, secret),
        ),
    )
    return events.withColumn("images_url", signed)


def validate_claim_url(url, secret: str, *, at=None):
    """Boolean Column: the signed capability from
    :func:`presign_claim_urls` is intact (signature matches path+expiry
    under ``secret``) and unexpired at ``at`` (Column; defaults to
    current_timestamp). Tampering with the path, the expiry, or the
    signature flips it false."""
    path = F.regexp_extract(url, r"^(.*)\?expires=", 1)
    expires = F.regexp_extract(url, r"[?&]expires=(\d+)", 1)
    sig = F.regexp_extract(url, r"[?&]sig=([0-9a-f]{64})", 1)
    at_col = at if at is not None else F.current_timestamp()
    msg = F.concat_ws("|", path, expires)
    return (
        (path != F.lit(""))
        & (sig == _keyed_hash(msg, secret))
        & (expires.cast("long") > F.unix_timestamp(at_col))
    )


def vacuum_side_store(spark, base_path: str, retain_days: int = 1) -> list[str]:
    """Drop side-store date partitions older than ``retain_days``.

    The engine analogue of the reference's 24 h lifecycle expiry
    (``dynamo.ts:111-116``): retention as metadata-only partition removal —
    no data scan, so it stays O(partitions) at any table size.
    Returns the removed partition paths.
    """
    import datetime

    from py4j.java_gateway import java_import

    # UTC, not driver-local: partitions are dated from UTC timestamps
    # (to_date under the session's UTC timezone), so a local-date cutoff
    # could be a day off and delete a partition still inside the window.
    cutoff = (
        datetime.datetime.now(datetime.timezone.utc).date()
        - datetime.timedelta(days=retain_days)
    ).isoformat()
    jvm = spark.sparkContext._jvm
    java_import(jvm, "org.apache.hadoop.fs.Path")
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.Path(base_path)
    fs = root.getFileSystem(conf)
    removed = []
    if not fs.exists(root):
        return removed
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if name.startswith("dt=") and name[3:] < cutoff:
            fs.delete(status.getPath(), True)
            removed.append(str(status.getPath()))
    return removed
