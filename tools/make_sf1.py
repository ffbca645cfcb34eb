"""Extend the driver corpus to sf1 for the lineitem family.

The driver generates parquet at sf{0.001,0.01,0.1} only; the 2x-at-scale
claim deserves one measurement where scan cost dominates JVM startup, so
this tool builds /root/repo/sf1 (gitignored — only the BENCH_SF1 artifact
is committed):

* `orders` and `lineitem`: the sf0.1 tables replicated 10x with
  deterministic order-key remapping (o_orderkey + rep * stride, stride =
  max(o_orderkey) + 1) — per-order line structure, date/price/flag
  distributions, and orders<->lineitem join cardinality are preserved
  exactly; per-customer/part/supplier fact density rises 10x, which is
  the intended scale-up axis.
* `events`: replicated 10x with BOTH user_id and event_id remapped per
  replica — each replica is a disjoint population of users whose
  per-user event chains (the thing the CDC synthesis, sessionization,
  and window queries key on) are byte-identical to the original, so the
  workload scales in users, not in per-key depth — the way a real
  stream grows.
* `documents`: replicated 10x with disjoint doc_id spaces AND a
  per-replica BIJECTIVE token mutation (every word gets a `_<rep>`
  suffix; replica 0 is unchanged). A bijection on tokens maps each
  document's shingle set bijectively, so every within-replica Jaccard
  similarity — and therefore the entire near-dup pair/cluster
  structure — is preserved EXACTLY, while cross-replica Jaccard is 0.
  The corpus grows 10x in documents with the same dup density, which
  is how a real crawl grows; naive replication would instead add
  exact cross-replica duplicates and quadratically inflate pair
  counts, measuring a different workload.
* `embeddings`: replicated 10x with disjoint vec_id spaces and a
  per-replica CYCLIC SHIFT of the vector components. A fixed
  permutation applied to both sides of any within-replica pair
  preserves dot products and norms exactly (cosine structure intact);
  across replicas the shifted vectors decorrelate, so ANN/near-dup
  workloads scale in corpus size, not in duplicate count.
* every other table: symlinked to the sf0.1 file unchanged (dimension
  tables scale sub-linearly in TPC-H anyway).

Usage: python tools/make_sf1.py  (idempotent; ~40 MB of parquet)
Then:  SPARK_GRAFT_SF_DIR=/root/repo/sf1 \
       SPARK_GRAFT_BENCH_QUERIES=<lineitem-family list> python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cdk_dynamodb_cdc_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/sf1"
REPLICAS = 10
COPY_TABLES = [
    "region", "nation", "customer", "supplier", "part",
]


def main() -> int:
    spark = get_spark("make_sf1")
    os.makedirs(DST, exist_ok=True)

    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    strides = {
        "o_orderkey": orders.agg(F.max("o_orderkey")).first()[0] + 1,
        "event_id": ev.agg(F.max("event_id")).first()[0] + 1,
        "user_id": ev.agg(F.max("user_id")).first()[0] + 1,
        "doc_id": docs.agg(F.max("doc_id")).first()[0] + 1,
        "vec_id": emb.agg(F.max("vec_id")).first()[0] + 1,
    }
    strides["l_orderkey"] = strides["o_orderkey"]  # shared key domain
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))

    replicate = {
        "orders": ["o_orderkey"],
        "lineitem": ["l_orderkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    for table, keys in replicate.items():
        src_df = spark.read.parquet(f"{SRC}/{table}.parquet")
        out = src_df.crossJoin(F.broadcast(reps))
        for key in keys:
            out = out.withColumn(
                key, F.col(key) + F.col("rep") * F.lit(strides[key])
            )
        if table == "documents":
            # bijective per-replica token mutation: within-replica
            # shingle-set Jaccard is EXACTLY preserved, cross-replica
            # Jaccard is 0 (see module docstring). Replica 0 unchanged.
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
            # per-replica cyclic shift: within-replica dot products and
            # norms exactly preserved; replicas mutually decorrelated.
            out = out.withColumn(
                "embedding",
                F.expr(
                    "concat(slice(embedding, int(rep) + 1, "
                    "             size(embedding) - int(rep)), "
                    "       slice(embedding, 1, int(rep)))"
                ),
            )
        # Even, machine-wide file layout: without this the output
        # inherits the source's 1-3 uneven input splits and every
        # sf1 scan runs 12 tasks with one straggler holding the
        # whole stage — measured ~30% inflation on scan-bound
        # queries. Real tables have thousands of row groups; this
        # makes the synthetic one behave like them.
        out = out.drop("rep").repartition(32)
        dst = f"{DST}/{table}.parquet"
        if os.path.islink(dst):  # replaced a previously symlinked table
            os.unlink(dst)
        out.write.mode("overwrite").parquet(dst)
        print(f"wrote {dst} (strides={[strides[k] for k in keys]})")

    for table in COPY_TABLES:
        link = f"{DST}/{table}.parquet"
        if os.path.islink(link) or os.path.exists(link):
            continue
        os.symlink(f"{SRC}/{table}.parquet", link)
        print(f"linked {link}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
