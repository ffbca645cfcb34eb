"""CDC log consumption: point-in-time snapshots and change squashing.

The reference emits one change event per stream record
(`/root/reference/lib/lambda/dynamo-stream-handler.ts:89-177`) and
leaves replay to consumers. These are the two classic consumer
operators over such a log:

* ``snapshot_at`` — materialize the table state as of an event time
  (time travel): the latest non-REMOVE image per item key among
  records with ``ts <= at_ts``. One aggregation keyed by the item key
  using ``max_by`` — map-side partial aggregation keeps only the
  current winner per key per task, so the full version history is
  never held or sorted anywhere, and 100 TB of log compacts in a
  single shuffle of one row per (task, key).

* ``squash_change_events`` — compact a window of per-record changes
  into ONE net change per key (what log-compacted topics / Debezium
  tombstone semantics do): diff the window's first old image against
  its last new image with the same typed diff the per-record path
  uses (operators/typed_diff.py), re-applying the reference's no-op
  rule (`dynamo-stream-handler.ts:126-128`) at the squashed level —
  a key whose fields return to their starting values emits nothing.
  Net operation:

    - last record REMOVE, first old image present  -> REMOVE
    - last record REMOVE, first old image absent   -> suppressed
      (created and deleted inside the window: invisible at both ends)
    - first old image absent (key born in window)  -> INSERT
    - otherwise                                    -> MODIFY, dropped
      when the net diff is empty

Both are pure Column-expression plans: no Python, no window sort —
``min_by``/``max_by`` aggregation instead of ``row_number`` so the
log's per-key history streams through partial aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdk_dynamodb_cdc_spark.operators.typed_diff import (
    struct_diff_exprs,
    unmarshall_typed,
)

KEY_COLS = ("pk", "sk")


def snapshot_at(
    records: DataFrame,
    at_ts: str | None = None,
    *,
    key_cols: tuple[str, ...] = KEY_COLS,
) -> DataFrame:
    """Table state as of ``at_ts`` (inclusive; None = latest).

    Returns one row per live item key: the marshalled current image,
    the winning ``seq``/``ts``, and ``n_versions`` (how many log
    records produced this state). Keys whose winning record is a
    REMOVE are dead at ``at_ts`` and are dropped.
    """
    src = records
    if at_ts is not None:
        src = src.filter(F.col("ts") <= F.lit(at_ts))
    winner = F.struct("operation", "new_image", "ts")
    snap = src.groupBy(*key_cols).agg(
        F.max_by(winner, "seq").alias("w"),
        F.max("seq").alias("seq"),
        F.count(F.lit(1)).alias("n_versions"),
    )
    return snap.filter(F.col("w.operation") != "REMOVE").select(
        *key_cols,
        F.col("w.new_image").alias("image"),
        "seq",
        F.col("w.ts").alias("ts"),
        "n_versions",
    )


def squash_change_events(
    records: DataFrame,
    schema: T.StructType,
    *,
    key_cols: tuple[str, ...] = KEY_COLS,
) -> DataFrame:
    """One net change event per item key for the given log window.

    Output columns mirror the per-record pipeline's event shape:
    ``(*key_cols, operation, attributes_changed, before, after,
    n_squashed)`` where before/after are the net-changed subtrees as
    JSON (typed lane conventions, operators/typed_diff.py) and
    ``n_squashed`` counts the records compacted into the row.
    """
    first = F.struct("old_image")
    last = F.struct("operation", "new_image")
    g = records.groupBy(*key_cols).agg(
        F.min_by(first, "seq").alias("f"),
        F.max_by(last, "seq").alias("l"),
        F.count(F.lit(1)).alias("n_squashed"),
    )
    parsed = g.select(
        "*",
        unmarshall_typed(F.col("f.old_image"), schema).alias("__old_t"),
        F.when(
            F.col("l.operation") != "REMOVE",
            unmarshall_typed(F.col("l.new_image"), schema),
        ).alias("__new_t"),
    )
    paths, before, after = struct_diff_exprs(
        F.col("__old_t"), F.col("__new_t"), schema
    )
    born = F.col("f.old_image").isNull()
    dead = F.col("l.operation") == F.lit("REMOVE")
    operation = (
        F.when(dead, F.lit("REMOVE"))
        .when(born, F.lit("INSERT"))
        .otherwise(F.lit("MODIFY"))
    )
    out = parsed.select(
        *key_cols,
        operation.alias("operation"),
        paths.alias("attributes_changed"),
        F.to_json(before).alias("before"),
        F.to_json(after).alias("after"),
        "n_squashed",
    )
    # tombstone suppression + the reference's no-op rule at net level
    return out.filter(
        ~(
            ((F.col("operation") == "REMOVE") & born)
            | (
                (F.col("operation") == "MODIFY")
                & (F.size("attributes_changed") == 0)
            )
        )
    )


def scd2_history(
    records: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("pk", "sk"),
) -> DataFrame:
    """Build a slowly-changing-dimension Type 2 table from the change
    log: one row per item VERSION with its validity interval —
    (key_cols..., image, valid_from, valid_to, is_current).

    Each non-REMOVE record opens a version valid from its ``ts`` until
    the next change to the same key (`lead` over the per-key sequence);
    a REMOVE closes the previous version and contributes no row of its
    own, so deleted keys simply have no current version. The
    still-open version has valid_to NULL and is_current TRUE — the
    standard warehouse temporal-table contract, queryable with
    ``valid_from <= T AND (valid_to IS NULL OR T < valid_to)`` for any
    point-in-time T (a per-interval generalization of
    :func:`snapshot_at`'s single-cutoff answer).

    Shape: one shuffle on the item key, one lead window over each
    key's own versions — per-key state is the version count of that
    key, never the table; 100 TB of history builds in a single
    exchange. Ordering uses (ts, seq) so same-timestamp records keep
    log order.
    """
    w = Window.partitionBy(*key_cols).orderBy("ts", "seq")
    return (
        records.select(
            *key_cols,
            "operation",
            "ts",
            "seq",
            F.col("new_image").alias("image"),
        )
        .withColumn("valid_to", F.lead("ts").over(w))
        .filter(F.col("operation") != "REMOVE")
        .select(
            *key_cols,
            "image",
            F.col("ts").alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def snapshot_diff(
    records: DataFrame,
    from_ts: str,
    to_ts: str,
    *,
    key_cols: tuple[str, ...] = KEY_COLS,
) -> DataFrame:
    """Reconcile two points in time of the same change log: which item
    keys were ADDED, REMOVED, CHANGED, or UNCHANGED between ``from_ts``
    and ``to_ts`` (both inclusive cutoffs).

    This is the anti-entropy / table-reconciliation primitive CDC
    consumers use to validate a replica against the log (the reference
    has no audit path at all — every divergence is silent,
    `dynamo-stream-handler.ts:168-177` fires and forgets): replay the
    log to both cutoffs with ``snapshot_at`` and full-outer-join the
    states on the item key.

    Classification per key:

    * ``ADDED``     — absent at ``from_ts``, live at ``to_ts``
    * ``REMOVED``   — live at ``from_ts``, absent/dead at ``to_ts``
    * ``CHANGED``   — live at both with a different image
    * ``UNCHANGED`` — live at both with the identical image

    Keys absent at both cutoffs (born and deleted inside the window,
    or born after ``to_ts``) emit nothing — invisible at both ends,
    the same suppression rule ``squash_change_events`` applies.

    Shape: the two snapshots share one key-partitioned aggregation
    shape each, and the full outer join runs on the same key — at
    cluster scale the whole reconciliation is two passes over the log
    plus one co-partitioned join, never a per-version sort. The image
    comparison is a string equality on the marshalled image (cheap,
    exact); callers needing attribute-level detail feed the CHANGED
    slice to the diff operator afterwards.
    """
    a = snapshot_at(records, from_ts, key_cols=key_cols).select(
        *key_cols,
        F.col("image").alias("image_from"),
        F.col("n_versions").alias("n_versions_from"),
    )
    b = snapshot_at(records, to_ts, key_cols=key_cols).select(
        *key_cols,
        F.col("image").alias("image_to"),
        F.col("n_versions").alias("n_versions_to"),
    )
    joined = a.join(b, on=list(key_cols), how="full_outer")
    kind = (
        F.when(F.col("image_from").isNull(), F.lit("ADDED"))
        .when(F.col("image_to").isNull(), F.lit("REMOVED"))
        .when(F.col("image_from") == F.col("image_to"), F.lit("UNCHANGED"))
        .otherwise(F.lit("CHANGED"))
    )
    return joined.select(
        *key_cols,
        kind.alias("change_kind"),
        "image_from",
        "image_to",
        # versions the log replayed inside the window for this key
        (
            F.coalesce("n_versions_to", F.lit(0))
            - F.coalesce("n_versions_from", F.lit(0))
        ).cast("long").alias("n_new_versions"),
    )


def merge_changes(
    base: DataFrame,
    records: DataFrame,
    *,
    key_cols: tuple[str, ...] = KEY_COLS,
) -> DataFrame:
    """Batch MERGE: apply a change-log window onto a materialized
    snapshot (the ``MERGE INTO`` shape — matched keys update, new keys
    insert, REMOVE winners delete).

    ``base`` is a ``snapshot_at`` materialization; ``records`` is the
    slice of the log AFTER the snapshot's cutoff. The algebra this
    implements (and the registered oracle pins as a theorem):

        merge(snapshot_at(T1), log(T1, T2]) == snapshot_at(T2)

    i.e. maintaining a materialized snapshot incrementally from log
    windows is exactly equivalent to replaying the whole log — so a
    100-TB log never needs full replay: each maintenance cycle touches
    only the window's keys.

    One documented deviation: for a key DELETED before T1 and
    re-inserted inside the window, ``n_versions`` restarts at the
    re-insert (the tombstoned history left the store with the key),
    while a full replay would count the pre-tombstone records too.
    Image/seq/ts — the live state — agree in every case.

    Shape: ONE max_by aggregation over the window (one winner per
    touched key — map-side partial, like ``snapshot_at``) plus one
    full outer join against the base, co-partitioned on the item key.
    Untouched base keys pass through without rewriting; at cluster
    scale with a key-bucketed base store this is the foreachBatch
    upsert `streaming/stream.py:maintain_snapshot_stream` runs per
    micro-batch, expressed as a pure batch operator.
    """
    winner = F.struct("operation", "new_image", "ts")
    delta = records.groupBy(*key_cols).agg(
        F.max_by(winner, "seq").alias("w"),
        F.max("seq").alias("dseq"),
        F.count(F.lit(1)).alias("dn"),
    )
    b = base.select(
        *key_cols,
        F.col("image").alias("b_image"),
        F.col("seq").alias("b_seq"),
        F.col("ts").alias("b_ts"),
        F.col("n_versions").alias("b_n"),
    )
    joined = b.join(delta, on=list(key_cols), how="full_outer")
    alive = F.col("w").isNull() | (F.col("w.operation") != "REMOVE")
    return joined.filter(alive).select(
        *key_cols,
        F.coalesce(F.col("w.new_image"), F.col("b_image")).alias("image"),
        F.coalesce(F.col("dseq"), F.col("b_seq")).alias("seq"),
        F.coalesce(F.col("w.ts"), F.col("b_ts")).alias("ts"),
        (
            F.coalesce(F.col("b_n"), F.lit(0))
            + F.coalesce(F.col("dn"), F.lit(0))
        ).alias("n_versions"),
    )
