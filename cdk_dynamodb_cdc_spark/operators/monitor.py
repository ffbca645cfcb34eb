"""Stream-health monitoring for CDC consumers.

The reference trusts shard order absolutely (one Lambda per shard,
sequential records — `dynamo-stream-handler.ts:19-26`); a distributed
consumer should VERIFY that assumption instead, because a mis-keyed
producer or a resharded topic silently breaks the per-key `seq`
contract every downstream operator (reconstruction, squash, snapshot)
relies on. This module is the verification: per-key order auditing
over the arrival sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def seq_inversion_stats(
    records: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("pk", "sk"),
    seq_col: str = "seq",
    arrival_col: str = "arrival",
) -> DataFrame:
    """Per-key out-of-order arrival report: for each key, how many
    records arrived with a `seq_col` below the running maximum seen so
    far in `arrival_col` order — i.e. late deliveries that a
    seq-trusting consumer would mis-order.

    Returns one row per key WITH inversions: (key_cols..., n_records,
    n_inversions, max_lateness) where max_lateness is the largest
    (running_max - seq) gap observed. Keys in order contribute nothing,
    so the output size is bounded by the actual disorder, not the
    stream.

    Shape: one shuffle on the key columns, one ordered window pass —
    the same partitioning every per-key CDC operator already uses, so
    at scale this audit co-schedules with reconstruction for free.
    """
    # seq_col tie-breaks equal arrival stamps so the running max is
    # deterministic under any partitioning.
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(arrival_col, seq_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run_max = F.max(seq_col).over(w)
    flagged = records.select(
        *key_cols,
        F.col(seq_col).alias("_seq"),
        run_max.alias("_run_max"),
    )
    inv = F.col("_run_max").isNotNull() & (F.col("_seq") < F.col("_run_max"))
    return (
        flagged.groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.sum(inv.cast("long")).alias("n_inversions"),
            F.max(
                F.when(inv, F.col("_run_max") - F.col("_seq"))
            ).alias("max_lateness"),
        )
        .filter(F.col("n_inversions") > 0)
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Data-profiling audit: one row per requested column with
    ``(column, n_rows, n_nulls, n_distinct)`` — the completeness /
    cardinality summary a pipeline health check runs before trusting
    a new corpus drop (schema drift shows up here first: a column
    whose null fraction or cardinality jumps between drops).

    Shape: each column is cast to string (injective for the scalar
    types this profiles — shortest-repr doubles, µs timestamps,
    integers) and melted to ``(column, value)`` rows, then ONE
    aggregation keyed by column name computes count / null-count /
    distinct-count. Spark plans the distinct aggregate two-phase
    (partial distinct per task, then merge), so no column's full
    value set ever gathers on one node; the melt multiplies rows by
    len(cols) but never widens them beyond two fields. The plan is
    identical at any corpus size — the profile output is always
    exactly ``len(cols)`` rows.
    """
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("kv")
    ).select("kv.column", "kv.value")
    return melted.groupBy("column").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").isNull().cast("long")).alias("n_nulls"),
        F.count_distinct("value").alias("n_distinct"),
    )


def field_drift_stats(
    records: DataFrame,
    *,
    image_col: str = "new_image",
    ts_col: str = "ts",
) -> DataFrame:
    """Schema-drift profile of a CDC stream: one row per (attribute,
    wire type) pair seen in the marshalled images — how many records
    carry it and the first/last time it appeared (epoch µs). The lane
    that catches a producer adding, dropping, or re-typing an item
    attribute mid-stream, which a typed consumer (operators/
    typed_diff.py) must know before its generated schema goes stale.

    Parsing is generic (no schema assumed): each image is read as
    ``map<attr, map<wiretype, value>>`` — the DynamoDB AttributeValue
    wire shape — and exploded to (attr, wiretype) pairs. Per-pair
    aggregation is map-side combinable; output is attribute-schema
    sized, not stream sized. Per-row scan-speed otherwise.
    """
    # epoch µs for TIMESTAMP or TIMESTAMP_NTZ input (unix_micros
    # rejects NTZ; timestampdiff from the NTZ epoch handles both)
    ts_us = F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        F.col(ts_col).cast("timestamp_ntz"),
    )
    parsed = records.filter(F.col(image_col).isNotNull()).select(
        ts_us.alias("ts_us"),
        F.explode(
            F.from_json(
                F.col(image_col), "map<string, map<string, string>>"
            )
        ).alias("field", "av"),
    )
    return parsed.select(
        "ts_us", "field", F.map_keys("av")[0].alias("wire_type")
    ).groupBy("field", "wire_type").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.min("ts_us").alias("first_seen_us"),
        F.max("ts_us").alias("last_seen_us"),
    )


def infer_item_schema(
    records: DataFrame,
    *,
    image_cols: tuple[str, ...] = ("new_image", "old_image"),
    ts_col: str = "ts",
    number_type=None,
):
    """The missing link between the drift profile and the typed lane:
    derive the ``StructType`` that ``operators/typed_diff.py`` needs
    from the stream itself — ``field_drift_stats``'s (field, wire
    type) profile becomes a declared schema, so the scale lane runs
    without hand-written schemas and re-derives itself after drift.

    Wire-type mapping mirrors the dynamic lane's value semantics
    (functions/dynamo.py): S -> string, N -> decimal(38,18) by
    default (numeric-exact comparison, like the dynamic lane's
    Decimal — pass ``number_type`` to override), BOOL -> boolean,
    B -> binary, SS/NS/BS -> sorted arrays tagged with the
    ``dynamo_type`` metadata the typed lane canonicalizes on, M ->
    nested struct (recursively profiled), L -> array of the
    elements' inferred type. Fields sort by name, so the schema —
    and therefore the typed lane's generated plan — is deterministic
    for a given stream content.

    DRIFT POLICY: a field observed under several wire types resolves
    to the type of its LATEST occurrence (max last-seen timestamp,
    ties by count then tag) — "the schema now". Records predating the
    flip parse to null for that field, which the typed lane documents
    as reading absent; route mixed-era replays through the dynamic
    lane instead.

    Cost: one profiling aggregation per nesting LEVEL that contains
    an M or L field (top level reuses ``field_drift_stats``), each
    map-side combinable and attribute-schema-sized in output; the
    driver holds only the schema itself. Run it per corpus drop, not
    per query.
    """
    from pyspark.sql import types as T

    num = number_type or T.DecimalType(38, 18)
    ts_us = F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        F.col(ts_col).cast("timestamp_ntz"),
    )
    frames = [
        records.select(ts_us.alias("ts"), F.col(c).alias("img"))
        for c in image_cols
    ]
    frame = frames[0]
    for f in frames[1:]:
        frame = frame.unionByName(f)

    def winners(profile_rows):
        """field -> winning wire type (latest occurrence wins)."""
        best: dict = {}
        for r in profile_rows:
            key = (r["last_seen_us"], r["n_records"], r["wire_type"])
            if r["field"] not in best or key > best[r["field"]][0]:
                best[r["field"]] = (key, r["wire_type"])
        return {f: wt for f, (_, wt) in best.items()}

    def leaf_type(wt: str, field: str):
        if wt == "S":
            return T.StringType(), {}
        if wt == "N":
            return num, {}
        if wt == "BOOL":
            return T.BooleanType(), {}
        if wt == "B":
            return T.BinaryType(), {}
        if wt == "SS":
            return T.ArrayType(T.StringType()), {"dynamo_type": "SS"}
        if wt == "NS":
            return T.ArrayType(num), {"dynamo_type": "NS"}
        if wt == "BS":
            return T.ArrayType(T.BinaryType()), {"dynamo_type": "BS"}
        raise ValueError(
            f"cannot infer a typed-lane type for field {field!r} "
            f"with wire type {wt!r}"
        )

    def node_frame(obj_frame, field: str, wt: str):
        """(ts, img)-frame of the wire values under ``field``/``wt``
        inside a frame of marshalled OBJECT json texts."""
        return (
            obj_frame.filter(F.col("img").isNotNull())
            .select(
                "ts",
                F.explode(
                    F.from_json(F.col("img"), "map<string, string>")
                ).alias("field", "av"),
            )
            .filter(F.col("field") == field)
            .select(
                "ts",
                F.from_json(F.col("av"), "map<string, string>")[
                    wt
                ].alias("img"),
            )
        )

    def infer_struct(obj_frame, prof=None) -> T.StructType:
        if prof is None:
            prof = (
                obj_frame.filter(F.col("img").isNotNull())
                .select(
                    "ts",
                    F.explode(
                        F.from_json(
                            F.col("img"),
                            "map<string, map<string, string>>",
                        )
                    ).alias("field", "av"),
                )
                .select(
                    "ts", "field", F.map_keys("av")[0].alias("wire_type")
                )
                .groupBy("field", "wire_type")
                .agg(
                    F.count(F.lit(1)).alias("n_records"),
                    F.max("ts").alias("last_seen_us"),
                )
                .collect()
            )
        fields = []
        for name, wt in sorted(winners(prof).items()):
            if wt == "M":
                dt: T.DataType = infer_struct(node_frame(obj_frame, name, wt))
                meta: dict = {}
            elif wt == "L":
                elems = (
                    node_frame(obj_frame, name, wt)
                    .filter(F.col("img").isNotNull())
                    .select(
                        "ts",
                        F.explode(
                            F.from_json(F.col("img"), "array<string>")
                        ).alias("img"),
                    )
                )
                dt, meta = T.ArrayType(infer_av(elems)), {}
            else:
                dt, meta = leaf_type(wt, name)
            fields.append(T.StructField(name, dt, True, metadata=meta))
        if not fields:
            raise ValueError("no attributes observed: cannot infer a schema")
        return T.StructType(fields)

    def infer_av(av_frame) -> T.DataType:
        """Element type of a list: profile the AttributeValue nodes."""
        prof = (
            av_frame.select(
                "ts",
                F.map_keys(
                    F.from_json(F.col("img"), "map<string, string>")
                )[0].alias("wire_type"),
            )
            .groupBy("wire_type")
            .agg(
                F.count(F.lit(1)).alias("n_records"),
                F.max("ts").alias("last_seen_us"),
            )
            .withColumn("field", F.lit("<list element>"))
            .collect()
        )
        wt = winners(prof).get("<list element>")
        if wt is None:
            return T.StringType()  # only empty lists observed
        if wt == "M":
            elems = av_frame.select(
                "ts",
                F.from_json(F.col("img"), "map<string, string>")[
                    "M"
                ].alias("img"),
            )
            return infer_struct(elems)
        if wt == "L":
            inner = av_frame.select(
                "ts",
                F.explode(
                    F.from_json(
                        F.from_json(F.col("img"), "map<string, string>")[
                            "L"
                        ],
                        "array<string>",
                    )
                ).alias("img"),
            )
            return T.ArrayType(infer_av(inner))
        dt, _meta = leaf_type(wt, "<list element>")
        return dt

    # top level: the literal field_drift_stats composition — profile
    # every image column and fold the per-column profiles together
    profs = [
        field_drift_stats(records, image_col=c, ts_col=ts_col)
        for c in image_cols
    ]
    prof_all = profs[0]
    for p in profs[1:]:
        prof_all = prof_all.unionByName(p)
    top = (
        prof_all.groupBy("field", "wire_type")
        .agg(
            F.sum("n_records").alias("n_records"),
            F.max("last_seen_us").alias("last_seen_us"),
        )
        .collect()
    )
    return infer_struct(frame, prof=top)
