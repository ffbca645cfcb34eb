"""`CdcPipeline` — the engine's user-facing builder (SURVEY.md §3.3).

The reference packages its pipeline as a CDK construct whose props
configure filters / claim check / sinks, with `functionPath`
(`/root/reference/lib/constructs/dynamo.ts:31,100,128`) as the hook to
swap in a custom handler. This builder is the Spark analogue: declare
the source shape once, get the batch lane (oracle-testable) and the
streaming lane (production) from the SAME configuration, and inject a
custom `DataFrame -> DataFrame` transform between diff and publish —
the `functionPath` equivalent.

    pipe = CdcPipeline(
        pk_filters=["USER#*"],
        item_schema=my_struct_type,        # optional: typed (no-Python) lane
                                           # (or "infer": drift-profile
                                           # schema inference, then typed)
        reconstruct_missing_old=True,      # NEW_IMAGE-only sources
        transform=lambda df: df.filter(...),
        event_source="myapp",
    )
    events = pipe.events(records_df)               # batch
    query  = pipe.run_stream(stream_df, sink_path=..., checkpoint_path=...)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from cdk_dynamodb_cdc_spark.operators.pipeline import (
    cdc_change_events,
    publish,
    quarantine,
)
from cdk_dynamodb_cdc_spark.operators.reconstruct import (
    reconstruct_old_images,
    reconstruct_old_images_stream,
)
from cdk_dynamodb_cdc_spark.operators.typed_diff import cdc_change_events_typed
from cdk_dynamodb_cdc_spark.schemas import CLAIM_CHECK_THRESHOLD


class CdcPipeline:
    """Configured CDC pipeline, runnable in batch or streaming."""

    def __init__(
        self,
        *,
        pk_filters: list[str] | None = None,
        item_schema: T.StructType | str | None = None,
        reconstruct_missing_old: bool = False,
        transform: Callable[[DataFrame], DataFrame] | None = None,
        event_source: str = "cdk_dynamodb_cdc_spark",
        claim_check_base: str | None = None,
        claim_check_threshold: int = CLAIM_CHECK_THRESHOLD,
        presign_secret: str | None = None,
        presign_ttl_hours: int = 24,
    ) -> None:
        self.pk_filters = pk_filters
        self.item_schema = item_schema
        self.reconstruct_missing_old = reconstruct_missing_old
        self.transform = transform
        self.event_source = event_source
        self.claim_check_base = claim_check_base
        self.claim_check_threshold = claim_check_threshold
        self.presign_secret = presign_secret
        self.presign_ttl_hours = presign_ttl_hours

    def _finish(self, events: DataFrame) -> DataFrame:
        """Post-pipeline stages shared by both lanes: presign the
        claim-check pointers (when a secret is configured), then the
        user transform — the reference's `functionPath` hook."""
        if self.presign_secret is not None:
            from cdk_dynamodb_cdc_spark.operators.claim_check import (
                presign_claim_urls,
            )

            events = presign_claim_urls(
                events, self.presign_secret, ttl_hours=self.presign_ttl_hours
            )
        return self.transform(events) if self.transform else events

    # -- batch lane -------------------------------------------------------

    def events(self, records: DataFrame) -> DataFrame:
        """records (CDC_RECORD_SCHEMA) -> change events.

        Typed lane when `item_schema` is declared (pure JVM), dynamic
        lane otherwise; optional old-image reconstruction first; the
        custom transform last."""
        if self.reconstruct_missing_old:
            records = reconstruct_old_images(records)
        schema = self.item_schema
        if schema == "infer":
            # drift-profile schema inference (operators/monitor.py):
            # one profiling pass over THIS batch, then the zero-Python
            # typed lane — the auto-typed composition
            # cdc_change_stats_autotyped pins against the dynamic lane.
            # Inference is per-call; cache the result (pipe.item_schema
            # = inferred) when processing many batches of one stream.
            from cdk_dynamodb_cdc_spark.operators.monitor import (
                infer_item_schema,
            )

            schema = infer_item_schema(records)
        if schema is not None:
            from cdk_dynamodb_cdc_spark.operators.pipeline import pk_filter

            out = cdc_change_events_typed(
                pk_filter(records, self.pk_filters),
                schema,
                claim_check_base=self.claim_check_base,
                claim_check_threshold=self.claim_check_threshold,
            )
        else:
            out = cdc_change_events(
                records,
                pk_filters=self.pk_filters,
                claim_check_base=self.claim_check_base,
                claim_check_threshold=self.claim_check_threshold,
            )
        return self._finish(out)

    def quarantine(self, records: DataFrame) -> DataFrame:
        """Rows that failed per-record processing (A3 dead letters)."""
        return quarantine(records, pk_filters=self.pk_filters)

    def published(self, records: DataFrame) -> DataFrame:
        """Change events wrapped in the publish envelope (A11)."""
        return publish(self.events(records), self.event_source)

    # -- streaming lane ---------------------------------------------------

    def run_stream(
        self,
        records: DataFrame,
        *,
        sink_path: str,
        checkpoint_path: str,
        side_store_path: str | None = None,
        available_now: bool = True,
        sink_writer=None,
    ):
        """Start the checkpointed streaming pipeline (A1/A11); returns
        the StreamingQuery. Old-image reconstruction, when enabled,
        runs with per-key state instead of a batch window; presign and
        the custom transform run per micro-batch exactly as in the
        batch lane, and `sink_writer` swaps the parquet sink for a
        custom (e.g. transactional) writer. (The streaming lane always
        runs the dynamic-lane record transform — same output schema
        and semantics as the typed lane, which remains a batch-side
        throughput optimization.)"""
        from cdk_dynamodb_cdc_spark.streaming.stream import run_cdc_stream

        if self.reconstruct_missing_old:
            records = reconstruct_old_images_stream(records)
        needs_finish = (
            self.presign_secret is not None or self.transform is not None
        )
        return run_cdc_stream(
            records,
            sink_path=sink_path,
            checkpoint_path=checkpoint_path,
            side_store_path=side_store_path or self.claim_check_base,
            pk_filters=self.pk_filters,
            claim_check_threshold=self.claim_check_threshold,
            available_now=available_now,
            sink_writer=sink_writer,
            transform=self._finish if needs_finish else None,
        )
