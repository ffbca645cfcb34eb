"""Join co-location utilities: bucketed (pre-shuffled) tables and
manual skew salting (SURVEY.md §2B "Partitioning & shuffle").

Two complementary tools for the 100 TB join problem:

* :func:`write_bucketed` / :func:`read_bucketed` — persist a table
  hash-bucketed (and sorted) by its join key. Two tables bucketed the
  same way join with ZERO exchange: Spark's scan reports the bucket
  partitioning, the sort-merge join consumes it directly, and at
  100 TB the single biggest cost of a fact-fact join (re-shuffling
  both sides) disappears from every subsequent query. This is the
  batch analogue of the reference's GSI (dynamo.ts:75-83): a stored
  alternate physical layout paid for once at write time.

* :func:`salted_join` — explicit salt-and-replicate for joins whose
  key distribution is too skewed even for AQE's skew-join splitting
  (AQE splits oversized SHUFFLE partitions, but a single monster key
  still lands in one task; salting splits the key itself). The
  skewed side gets a deterministic salt in [0, n); the other side is
  replicated n times; the join runs on (key, salt) and the result
  equals the plain join exactly (verified by pytest).

Neither helper is used implicitly: AQE handles moderate skew and
broadcast handles small sides for free, so reach for these only when
a profile shows the shuffle or a straggler task dominating.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    *,
    keys: list[str],
    num_buckets: int,
    sort: bool = True,
) -> None:
    """Persist `df` as an external parquet table hash-bucketed by
    `keys` (optionally sorted within buckets, which lets the
    sort-merge join skip its sort as well). `num_buckets` must match
    between tables that will join; pick it so a bucket of the LARGER
    table fits an executor core's working memory at target scale."""
    writer = df.write.mode("overwrite").option("path", path).bucketBy(
        num_buckets, *keys
    )
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table; the scan carries the bucket partitioning
    into the plan, which is what eliminates the join exchange."""
    return spark.table(table)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    *,
    skewed_key: str,
    other_key: str,
    n_salt: int,
    how: str = "inner",
) -> DataFrame:
    """Equi join where `skewed[skewed_key]` has pathological hot keys.

    The skewed side is salted DETERMINISTICALLY — salt = xxhash64 of
    the whole row pmod n_salt — so a hot key's rows spread across
    n_salt shuffle partitions instead of one straggler task. The other
    side is replicated n_salt times (explode of a literal range; cost
    = n_salt copies of the SMALL side, which is the side you must
    choose `other` to be). Join condition becomes (key, salt); the
    extra column never escapes.

    Deterministic salting (not rand()) keeps retried tasks and
    re-executed stages producing identical partitioning — a
    nondeterministic salt can double-count rows when a stage retries
    after a fetch failure.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salt))
    left = skewed.withColumn("__salt", salt.cast("int"))
    right = other.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salt)])),
    )
    cond = (left[skewed_key] == right[other_key]) & (
        left["__salt"] == right["__salt"]
    )
    out = left.join(right, cond, how)
    return out.drop("__salt")


def key_skew_profile(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts plus each key's share of the
    table — the number you look at before deciding between broadcast,
    AQE, and :func:`salted_join`. One aggregation, map-side partial."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("share", F.col("n_rows") / F.lit(float(total)))
        .orderBy(F.col("n_rows").desc(), F.col(key))
        .limit(top)
    )
