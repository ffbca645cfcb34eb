"""Extend the corpus to sf10 for the orders/lineitem family.

Round-12 verdict item 3: the ~9 queries whose sf1/sf0.1 time ratio
exceeded 2.8x all scan orders and/or lineitem (part is a dimension),
so the second decade of scale evidence only needs those two facts at
100x sf0.1. Same deterministic order-key remapping as tools/
make_sf1.py (o_orderkey + rep * stride): per-order line structure,
date/price/flag distributions, and the orders<->lineitem join
cardinality are preserved exactly; per-customer/part/supplier fact
density rises 100x — the intended scale axis. Every other table is
symlinked to its sf0.1 file; only the orders/lineitem-family queries
are meaningful against this corpus.

Usage: python tools/make_sf10.py   (idempotent; ~1.7 GB, gitignored)
Then:  SPARK_GRAFT_SF_DIR=/root/repo/sf10 \
       SPARK_GRAFT_BENCH_QUERIES=<orders/lineitem tail> python bench.py
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
REPLICATE = {"orders": ["o_orderkey"], "lineitem": ["l_orderkey"]}
LINK_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "events", "documents", "embeddings",
]


def main() -> int:
    spark = get_spark("make_sf10")
    os.makedirs(DST, exist_ok=True)

    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    stride = orders.agg(F.max("o_orderkey")).first()[0] + 1
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    for table, keys in REPLICATE.items():
        dst = f"{DST}/{table}.parquet"
        if os.path.isdir(dst) and os.path.exists(f"{dst}/_SUCCESS"):
            print(f"exists, skipping: {dst}")
            continue
        src_df = spark.read.parquet(f"{SRC}/{table}.parquet")
        out = src_df.crossJoin(F.broadcast(reps))
        for key in keys:
            out = out.withColumn(
                key, F.col(key) + F.col("rep") * F.lit(stride)
            )
        # Even file layout (see make_sf1.py): real tables have many row
        # groups; 128 output files keep every scan stage balanced.
        out = out.drop("rep").repartition(128)
        out.write.mode("overwrite").parquet(dst)
        print(f"wrote {dst} (stride={stride})")

    for table in LINK_TABLES:
        link = f"{DST}/{table}.parquet"
        if os.path.islink(link) or os.path.exists(link):
            continue
        os.symlink(f"{SRC}/{table}.parquet", link)
        print(f"linked {link}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
