"""The CDC change-event pipeline (reference operators A3-A11, SURVEY.md §2A).

Batch-first: :func:`cdc_change_events` is a pure ``DataFrame -> DataFrame``
transform, so the identical code runs under ``spark.read`` (oracle-testable)
and inside a Structured Streaming micro-batch (``streaming/stream.py``).

Stage map to the reference (``/root/reference/lib/lambda/dynamo-stream-handler.ts``):

  null-guards (:92-97)          -> declarative ``filter`` (A4)
  unmarshall (:101-110)         -> Arrow-vectorized pandas UDF, fused with
  compareJSON (:29-87,112-116)  -> the diff into ONE Python exchange (A5+A6)
  per-record try/catch (:20-26) -> error column + quarantine split (A3)
  event construction (:118-125) -> ``select`` (A8)
  no-op MODIFY drop (:126-128)  -> ``filter`` on array size (A7)
  conditional images (:134-138) -> ``when``/``otherwise`` (A9)
  claim check (:139-166)        -> size split + side write (A10, claim_check.py)

Scale notes: the only Python in the plan is one fused pandas UDF over the
two image columns (unavoidable for dynamic schemas — the diff is defined
over arbitrary nested JSON). Everything before it (pk filters, null
guards, column pruning) is Catalyst-visible and pushes into the source
scan, so at 100 TB filtered records never reach Python. The UDF is
embarrassingly parallel and partition-local: no shuffle anywhere in this
pipeline — output partitioning == source partitioning.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdk_dynamodb_cdc_spark.functions.diff import compare_images
from cdk_dynamodb_cdc_spark.functions.dynamo import dumps_canonical, unmarshall
from cdk_dynamodb_cdc_spark.schemas import CLAIM_CHECK_THRESHOLD

_DIFF_COLS = "attributes_changed array<string>, before string, after string, " \
    "u_pk string, u_sk string, u_new_image string, u_old_image string, error string"


def pk_filter(df: DataFrame, pk_filters: list[str] | None) -> DataFrame:
    """Source-level pk predicate (A2, ``dynamo.ts:157-191``).

    Exact value, or a single trailing-``*`` prefix pattern. Expressed as a
    plain Column predicate so Catalyst pushes it into the parquet scan
    (StringStartsWith / EqualTo reach ``PushedFilters``).
    """
    if not pk_filters:
        return df
    conds: list[Column] = []
    for f in pk_filters:
        stars = f.count("*")
        if stars == 0:
            conds.append(F.col("pk") == F.lit(f))
        elif stars == 1 and f.endswith("*"):
            conds.append(F.col("pk").startswith(f[:-1]))
        else:
            raise ValueError(
                f"pk filter {f!r}: only exact match or single trailing '*' "
                "prefix supported (mirrors dynamo.ts:168-176)"
            )
    pred = conds[0]
    for c in conds[1:]:
        pred = pred | c
    return df.filter(pred)


def null_guards(df: DataFrame) -> DataFrame:
    """Drop records missing operation / event_id / payload (A4, :92-97).

    Deliberate deviation: the reference only bails when the
    ``record.dynamodb`` envelope itself is missing (:96-97) and would
    still publish an event with empty before/after for an image-less
    record. This engine's record schema has no envelope column, so
    "both images null" stands in for "no payload" and such records are
    dropped — stricter than the reference, by design (an event with no
    images, no diff, and no keys carries no information downstream).
    """
    has_payload = F.col("new_image").isNotNull() | F.col("old_image").isNotNull()
    return df.filter(
        F.col("operation").isNotNull() & F.col("event_id").isNotNull() & has_payload
    )


def _diff_record(new_raw, old_raw, keys_raw, pk, sk) -> tuple:
    """unmarshall + diff + key extraction for one record; errors isolate."""
    try:
        new_img = unmarshall(json.loads(new_raw)) if new_raw is not None else None
        old_img = unmarshall(json.loads(old_raw)) if old_raw is not None else None
        if keys_raw is not None:
            keys = unmarshall(json.loads(keys_raw)) or {}
            pk, sk = keys.get("pk"), keys.get("sk")
        changed, before, after = compare_images(new_img, old_img)
        return (
            changed,
            dumps_canonical(before),
            dumps_canonical(after),
            pk,
            sk,
            dumps_canonical(new_img) if new_img is not None else None,
            dumps_canonical(old_img) if old_img is not None else None,
            None,
        )
    except Exception as exc:  # row-level fault isolation (A3, :20-26)
        return (None, None, None, None, None, None, None, f"{type(exc).__name__}: {exc}")


def _col_or_none(pdf: pd.DataFrame, name: str) -> list:
    if name in pdf.columns:
        return [None if pd.isna(v) else v for v in pdf[name]]
    return [None] * len(pdf)


def _diff_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [
        "attributes_changed", "before", "after",
        "u_pk", "u_sk", "u_new_image", "u_old_image", "error",
    ]
    for pdf in batches:
        rows = zip(
            _col_or_none(pdf, "new_image"),
            _col_or_none(pdf, "old_image"),
            _col_or_none(pdf, "keys_json"),
            _col_or_none(pdf, "pk"),
            _col_or_none(pdf, "sk"),
        )
        out = pd.DataFrame(
            [_diff_record(*r) for r in rows], columns=cols, index=pdf.index
        )
        yield pd.concat([pdf, out], axis=1)


def cdc_change_events(
    records: DataFrame,
    *,
    pk_filters: list[str] | None = None,
    claim_check_base: str | None = None,
    claim_check_threshold: int = CLAIM_CHECK_THRESHOLD,
    keep_errors: bool = False,
) -> DataFrame:
    """Full record->event transform. Input: CDC_RECORD_SCHEMA (+ optional
    ``keys_json``). Output: CHANGE_EVENT_SCHEMA (+ ``error`` when
    ``keep_errors``); no-op MODIFYs dropped; large payloads carry an
    ``images_url`` pointer instead of inlined images (side write is the
    caller's job via :mod:`claim_check` — this stage only computes columns).
    """
    src = null_guards(pk_filter(records, pk_filters))

    in_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in src.schema)
    diffed = src.mapInPandas(_diff_batches, schema=f"{in_schema}, {_DIFF_COLS}")

    ok = diffed.filter(F.col("error").isNull()) if not keep_errors else diffed

    # A7: drop MODIFYs whose diff is empty (:126-128); error rows (null
    # diff) pass through so the quarantine split sees them.
    noop = (F.col("operation") == "MODIFY") & (F.size("attributes_changed") == 0)
    ok = ok.filter(F.col("error").isNotNull() | ~F.coalesce(noop, F.lit(False)))

    # Reference: `if (size && size < SIZE_THRESHOLD)` (:134) — a missing or
    # zero SizeBytes is falsy in JS and takes the claim-check branch.
    small = (
        F.col("size_bytes").isNotNull()
        & (F.col("size_bytes") != 0)
        & (F.col("size_bytes") < F.lit(claim_check_threshold))
    )
    images_url = (
        F.when(
            ~small,
            F.concat(F.lit(claim_check_base or "claim-check://images/"),
                     F.col("event_id"), F.lit(".json")),
        )
    )
    out_cols = [
        F.col("event_id"),
        F.col("seq"),
        F.col("ts"),
        F.col("operation"),
        F.col("u_pk").alias("pk"),
        F.col("u_sk").alias("sk"),
        F.col("attributes_changed"),
        F.col("before"),
        F.col("after"),
        # A9 (:134-138): new image inlined when small; old image only for
        # small REMOVEs; neither when claim-checked.
        F.when(small, F.col("u_new_image")).alias("new_image"),
        F.when(small & (F.col("operation") == "REMOVE"), F.col("u_old_image"))
        .alias("old_image"),
        images_url.alias("images_url"),
    ]
    if keep_errors:
        out_cols.append(F.col("error"))
    return ok.select(*out_cols)


def quarantine(records: DataFrame, **kwargs) -> DataFrame:
    """The dead-letter side of A3: rows whose processing raised."""
    ev = cdc_change_events(records, keep_errors=True, **kwargs)
    return ev.filter(F.col("error").isNotNull())


def publish(events: DataFrame, event_source: str) -> DataFrame:
    """A11 (:168-177): wrap each change event in the published envelope.

    ``detail`` is the JSON document a downstream consumer receives; routing
    is then a plain filter on ``source`` / ``detail_type`` (A12).
    """
    detail = F.to_json(
        F.struct(
            F.col("after"),
            F.col("attributes_changed").alias("attributesChanged"),
            F.col("before"),
            F.col("images_url").alias("imagesUrl"),
            F.col("new_image").alias("newImage"),
            F.col("old_image").alias("oldImage"),
            F.col("operation"),
            F.col("pk"),
            F.col("sk"),
        )
    )
    return events.select(
        F.lit(event_source).alias("source"),
        F.lit("dynamo.item.changed").alias("detail_type"),
        detail.alias("detail"),
    )


def route(published: DataFrame, source: str, detail_type: str) -> DataFrame:
    """A12 (cdk-dynamodb-cdc-stack.ts:32-38): pattern-match subscription."""
    return published.filter(
        (F.col("source") == source) & (F.col("detail_type") == detail_type)
    )
