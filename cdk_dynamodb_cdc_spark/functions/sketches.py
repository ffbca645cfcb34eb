"""Count-min sketch as a relational plan (Cormode & Muthukrishnan
2005): the engine's mergeable frequency sketch for heavy-hitter
queries over unbounded key domains.

The sketch IS a (depth x width) count table — ``cms_cells`` builds it
with one map-side-combined aggregation (each input row contributes
``depth`` cell increments), and ``cms_estimate`` reads it back with a
broadcast join (the sketch is depth*width rows — KBs — regardless of
corpus size). Point estimates are ``min`` over the key's ``depth``
cells; the CMS theorem guarantees ``estimate >= exact`` always (each
cell upper-bounds every key hashing into it) and bounds the
overestimate by ``e*N/width`` with probability ``1 - e^-depth``.

Hashes are the engine's md5-based ``token_hash60`` (llm/text.py), so a
DuckDB oracle reproduces the cells — and therefore the estimates —
bit-exactly; the registered query's contract column is the
no-underestimate theorem, which is deterministic (not probabilistic)
and must hold for every key.

Scale shape: building is one shuffle of depth*width partial counts
(map-side combined — executors emit at most d*w rows each, not one per
input row); estimation never touches the raw stream again. This is
the sketch to keep per micro-batch and merge across time: cells from
two batches merge by cell-wise ADDITION, which is exactly a groupBy
sum over the union — the merge the streaming rollup lane already
performs for its other mergeable aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdk_dynamodb_cdc_spark.llm.text import token_hash60

CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_SALT = "cms"


def _bucket(key: Column, seed: int, width: int, salt: str) -> Column:
    return (
        token_hash60(F.concat(F.lit(f"{salt}-{seed}:"), key.cast("string")))
        % width
    )


def cms_cells(
    df: DataFrame,
    key_col: str,
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    salt: str = CMS_SALT,
) -> DataFrame:
    """Build the sketch: ``(seed, bucket, c)`` — depth*width rows."""
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).cast("int").alias("seed"),
                        _bucket(F.col(key_col), s, width, salt)
                        .cast("int")
                        .alias("bucket"),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("p")
    )
    return pairs.groupBy(
        F.col("p.seed").alias("seed"), F.col("p.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("c"))


def cms_estimate(
    cells: DataFrame,
    probes: DataFrame,
    key_col: str,
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    salt: str = CMS_SALT,
) -> DataFrame:
    """Point-estimate each probe key: min over its depth cells.

    EVERY ``probes`` row passes through exactly once with an ``est_n``
    column appended (duplicate probe rows are preserved via an internal
    per-row id); the sketch side is broadcast (depth*width rows). The
    sketch is stored sparsely — cells no input key hashed into are
    absent — so the join is a LEFT join with absent counts coalesced to
    0: a probe key the build stream never saw estimates 0 (the true CMS
    estimate for an empty cell), and a key with a mix of empty and
    non-empty cells takes its min over all ``depth`` cells, empty ones
    included. Internal columns are ``__cms_``-prefixed so probe frames
    that already carry ``seed``/``bucket``/``p`` columns join cleanly.
    """
    cells_k = F.broadcast(
        cells.select(
            F.col("seed").alias("__cms_seed"),
            F.col("bucket").alias("__cms_bucket"),
            F.col("c").alias("__cms_c"),
        )
    )
    probed = probes.withColumn(
        "__cms_rid", F.monotonically_increasing_id()
    ).select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).cast("int").alias("seed"),
                        _bucket(F.col(key_col), s, width, salt)
                        .cast("int")
                        .alias("bucket"),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("__cms_p"),
    ).select(
        "*",
        F.col("__cms_p.seed").alias("__cms_seed"),
        F.col("__cms_p.bucket").alias("__cms_bucket"),
    )
    out_cols = [c for c in probes.columns]
    return (
        probed.join(cells_k, ["__cms_seed", "__cms_bucket"], "left")
        .groupBy("__cms_rid", *out_cols)
        .agg(F.min(F.coalesce(F.col("__cms_c"), F.lit(0))).alias("est_n"))
        .drop("__cms_rid")
    )
