"""Extend the corpus to sf10 for the orders/lineitem AND the
documents/embeddings families.

Round-12 verdict item 3 built orders/lineitem at 100x sf0.1 (the ~9
queries whose sf1/sf0.1 ratio exceeded 2.8x scan those facts); round
13 extends the same decade to the text/vector tail (substring_dup_
stats 6.28x, token_counts_bpeish 5.83x, winnow_fingerprint_overlap
4.81x at sf1/sf0.1 had no second-decade reading).

Replication follows tools/make_sf1.py exactly, at 100 replicas:

* `orders`/`lineitem`: deterministic order-key remapping (o_orderkey
  + rep * stride): per-order line structure, date/price/flag
  distributions, and the orders<->lineitem join cardinality are
  preserved exactly; per-customer/part/supplier fact density rises
  100x — the intended scale axis.
* `documents`: disjoint doc_id spaces AND a per-replica BIJECTIVE
  token mutation (every word suffixed `_<rep>`; replica 0 unchanged).
  A token bijection maps each document's shingle set bijectively, so
  every within-replica Jaccard — and the whole near-dup pair/cluster
  structure — is preserved EXACTLY, while cross-replica Jaccard is 0:
  the corpus grows 100x in documents at the SAME dup density (how a
  real crawl grows). Naive replication would add exact cross-replica
  duplicates and quadratically inflate pair counts — a different
  workload.
* `embeddings`: disjoint vec_id spaces, a per-replica CYCLIC SHIFT of
  the components (shift = rep % dim), and a SIGN FLIP for rep >= dim
  (dim = 64 < 100 replicas, so the shift alone would repeat; negating
  both sides of any within-replica pair preserves dot products and
  norms exactly, while cross-replica cosines flip sign — no replica
  pair is a near-duplicate).
* `events` (round 14): replicated 100x with BOTH user_id and event_id
  remapped per replica (tools/make_sf1.py's scheme) — each replica is
  a disjoint population of users whose per-user event chains (the
  thing sessionization, transition matrices, retention, and the
  window queries key on) are byte-identical to the original, so the
  workload scales in USERS, not per-key depth — the way a real
  stream grows. Timestamps are untouched: global-time shapes
  (peak concurrency, sliding distinct users) see 100x density per
  instant, which IS their production scale axis.
* every other table: symlinked to its sf0.1 file (dimension tables
  scale sub-linearly in TPC-H anyway).

Round 14 also builds the DOMAIN-SCALED DBSCAN decade corpora
(`/root/repo/sf1_dbscan`, `/root/repo/sf10_dbscan`): embeddings
replicated 10x/100x with component 1 offset by +2.0 * rep. The 2-d
projection embedding_dbscan_2d clusters on spans x,y in [-400, 400]
at eps = 30, so each replica lands in its own plane cell with a
>= 1200-unit gap — point count grows 10x/100x while LOCAL DENSITY
stays constant (the axis a real 100x deployment grows, per the r13
exclusion note: same-domain replication multiplies density and the
true answer itself, which no plan keeps linear). Within-replica
geometry is exact, so the true clustering is N shifted copies of the
sf0.1 answer. All other tables symlink to sf0.1.

Usage: python tools/make_sf10.py   (idempotent; ~2 GB, gitignored)
Then:  SPARK_GRAFT_SF_DIR=/root/repo/sf10 SPARK_DRIVER_MEMORY=48g \
       SPARK_GRAFT_BENCH_QUERIES=<family list> python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cdk_dynamodb_cdc_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/sf10"
REPLICAS = 100
LINK_TABLES = [
    "region", "nation", "customer", "supplier", "part",
]


def main() -> int:
    spark = get_spark("make_sf10")
    os.makedirs(DST, exist_ok=True)

    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    strides = {
        "o_orderkey": orders.agg(F.max("o_orderkey")).first()[0] + 1,
        "doc_id": docs.agg(F.max("doc_id")).first()[0] + 1,
        "vec_id": emb.agg(F.max("vec_id")).first()[0] + 1,
        "event_id": ev.agg(F.max("event_id")).first()[0] + 1,
        "user_id": ev.agg(F.max("user_id")).first()[0] + 1,
    }
    strides["l_orderkey"] = strides["o_orderkey"]  # shared key domain
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))

    replicate = {
        "orders": ["o_orderkey"],
        "lineitem": ["l_orderkey"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
        "events": ["event_id", "user_id"],
    }
    for table, keys in replicate.items():
        dst = f"{DST}/{table}.parquet"
        if os.path.isdir(dst) and os.path.exists(f"{dst}/_SUCCESS"):
            print(f"exists, skipping: {dst}")
            continue
        src_df = spark.read.parquet(f"{SRC}/{table}.parquet")
        out = src_df.crossJoin(F.broadcast(reps))
        for key in keys:
            out = out.withColumn(
                key, F.col(key) + F.col("rep") * F.lit(strides[key])
            )
        if table == "documents":
            # bijective per-replica token mutation (module docstring)
            out = out.withColumn(
                "text",
                F.when(F.col("rep") == 0, F.col("text")).otherwise(
                    F.array_join(
                        F.transform(
                            F.split("text", " "),
                            lambda w: F.concat(
                                w, F.lit("_"), F.col("rep").cast("string")
                            ),
                        ),
                        " ",
                    )
                ),
            ).withColumn("n_chars", F.length("text"))
        elif table == "embeddings":
            # per-replica cyclic shift + sign flip past one full cycle
            # (module docstring): norms and within-replica dot
            # products exact; no cross-replica near-duplicates.
            out = out.withColumn(
                "embedding",
                F.expr(
                    "transform("
                    "  concat(slice(embedding, int(rep % 64) + 1, "
                    "               size(embedding) - int(rep % 64)), "
                    "         slice(embedding, 1, int(rep % 64))), "
                    "  v -> CASE WHEN rep >= 64 THEN -v ELSE v END)"
                ),
            )
        # Even file layout (see make_sf1.py): real tables have many row
        # groups; 128 output files keep every scan stage balanced.
        out = out.drop("rep").repartition(128)
        if os.path.islink(dst):  # replaced a previously symlinked table
            os.unlink(dst)
        out.write.mode("overwrite").parquet(dst)
        print(f"wrote {dst} (strides={[strides[k] for k in keys]})")

    for table in LINK_TABLES:
        link = f"{DST}/{table}.parquet"
        if os.path.islink(link) or os.path.exists(link):
            continue
        os.symlink(f"{SRC}/{table}.parquet", link)
        print(f"linked {link}")

    # Domain-scaled DBSCAN decade corpora (module docstring): point
    # count x10/x100 at CONSTANT local density — component 1 offset
    # puts each replica in its own 2-d cell, far beyond eps.
    all_tables = replicate.keys() | set(LINK_TABLES)
    for n_reps, dbdst in ((10, "/root/repo/sf1_dbscan"),
                          (100, "/root/repo/sf10_dbscan")):
        os.makedirs(dbdst, exist_ok=True)
        dst = f"{dbdst}/embeddings.parquet"
        if not (os.path.isdir(dst) and os.path.exists(f"{dst}/_SUCCESS")):
            r = spark.range(n_reps).select(F.col("id").alias("rep"))
            out = (
                emb.crossJoin(F.broadcast(r))
                .withColumn(
                    "vec_id",
                    F.col("vec_id")
                    + F.col("rep") * F.lit(strides["vec_id"]),
                )
                .withColumn(
                    "embedding",
                    F.expr(
                        "transform(embedding, (v, i) -> CASE WHEN i = 0"
                        " THEN CAST(v + 2.0d * rep AS FLOAT)"
                        " ELSE v END)"
                    ),
                )
                .drop("rep")
                .repartition(32 if n_reps == 10 else 128)
            )
            out.write.mode("overwrite").parquet(dst)
            print(f"wrote {dst} ({n_reps} replicas, +2.0/rep on dim 1)")
        for table in all_tables - {"embeddings"}:
            link = f"{dbdst}/{table}.parquet"
            if not (os.path.islink(link) or os.path.exists(link)):
                os.symlink(f"{SRC}/{table}.parquet", link)
    return 0


if __name__ == "__main__":
    sys.exit(main())
