"""Seekable CDC shard source — the Kinesis/DynamoDB-Streams-shaped
adapter for A1 (reference subscribes to a managed shard stream at
`/root/reference/lib/constructs/dynamo.ts:153-155,193`).

The engine's file lane replays a directory listing; a managed stream
is SEEKABLE: consumers hold per-shard sequence positions, resume from
them exactly, and `LATEST` starts at the live tip without touching the
backlog. This module implements those semantics as a Spark 4 Python
Data Source (``pyspark.sql.datasource``) over an append-only shard
log on any shared filesystem:

* layout: ``<path>/shard-<id>.jsonl`` — one JSON record per line,
  appended in ``seq`` order per shard (the writer is
  :func:`append_cdc_records`). Per-shard order is the same contract
  shard order gives the reference; cross-shard interleave is
  unordered, exactly like Kinesis.
* offsets: ``{shard_name: byte_position}`` — JSON-serializable,
  checkpointed by Structured Streaming. ``read(start)`` seeks each
  shard to its position and parses ONLY the new bytes, so a poll
  costs O(new data), never O(backlog).
* ``latest``: the initial offset is each shard's current SIZE — one
  ``stat`` per shard, zero reads. The file lane's checkpoint-
  initialization pass approximates this; here it is native.
* recovery: ``readBetweenOffsets(start, end)`` re-reads exactly the
  byte range ``[start, end)`` per shard — deterministic replay of a
  prefetched-but-uncommitted batch after a crash, the property
  exactly-once sinks build on.

The rows match ``CDC_RECORD_SCHEMA`` exactly, so the stream composes
with the same pipeline (`cdc_change_events`) and sinks as the file
lane. A real Kinesis adapter swaps the filesystem calls for
GetShardIterator/GetRecords; the offset model, recovery contract, and
Spark surface stay identical.

Trigger note: Python data sources don't implement
``Trigger.AvailableNow``'s end-offset protocol; Spark logs a warning
and falls back to single-batch execution (fine for drain-and-stop
jobs and the pytests). Use a processing-time trigger for continuous
tailing.
"""

from __future__ import annotations

import datetime
import glob
import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,  # noqa: F401  (re-export for type checks)
    SimpleDataSourceStreamReader,
)

SOURCE_NAME = "cdc_shards"
SHARD_GLOB = "shard-*.jsonl"

# Mirrors schemas.CDC_RECORD_SCHEMA (kept as a DDL string here because
# the DataSource.schema() hook wants one and the worker process must
# not need the whole package imported).
SCHEMA_DDL = (
    "event_id string, seq long, ts timestamp, operation string, "
    "pk string, sk string, old_image string, new_image string, "
    "size_bytes long"
)
_FIELDS = (
    "event_id",
    "seq",
    "ts",
    "operation",
    "pk",
    "sk",
    "old_image",
    "new_image",
    "size_bytes",
)


def append_cdc_records(path: str, shard: str, records: list[dict]) -> None:
    """Append records (dicts with CDC_RECORD_SCHEMA keys; ``ts`` as an
    ISO string or datetime) to ``<path>/shard-<shard>.jsonl``. Append-
    only and line-atomic — the reader consumes only complete lines."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, f"shard-{shard}.jsonl"), "a") as fh:
        for rec in records:
            out = dict(rec)
            ts = out.get("ts")
            if isinstance(ts, datetime.datetime):
                out["ts"] = ts.isoformat()
            fh.write(json.dumps(out) + "\n")


def _parse_lines(chunk: bytes) -> tuple[list[tuple], int]:
    """Parse the complete lines of ``chunk``; returns (rows, consumed
    bytes). A trailing partial line (a writer mid-append) is left for
    the next poll."""
    consumed = chunk.rfind(b"\n") + 1
    rows = []
    for line in chunk[:consumed].splitlines():
        if not line.strip():
            continue
        rec = json.loads(line)
        ts = rec.get("ts")
        if isinstance(ts, str):
            rec["ts"] = datetime.datetime.fromisoformat(ts)
        rows.append(tuple(rec.get(f) for f in _FIELDS))
    return rows, consumed


class CdcShardsStreamReader(SimpleDataSourceStreamReader):
    """Per-shard byte-offset reader. All methods run on the driver-side
    Python worker; the filesystem only needs to be visible from there
    (shared FS / fuse mount — or swap in an object-store client)."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.starting_position = options.get(
            "starting_position", "trim_horizon"
        )
        if self.starting_position not in ("trim_horizon", "latest"):
            raise ValueError(
                "starting_position must be 'trim_horizon' or 'latest', "
                f"got {self.starting_position!r}"
            )

    def _shards(self) -> list[str]:
        return sorted(
            glob.glob(os.path.join(self.path, SHARD_GLOB))
        )

    def initialOffset(self) -> dict:
        if self.starting_position == "trim_horizon":
            return {os.path.basename(f): 0 for f in self._shards()}
        # latest: one stat per shard, zero data reads — the backlog is
        # never listed, opened, or parsed.
        return {
            os.path.basename(f): os.path.getsize(f)
            for f in self._shards()
        }

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        end = dict(start)
        rows: list[tuple] = []
        for f in self._shards():
            name = os.path.basename(f)
            pos = int(start.get(name, 0))  # new shards start at 0
            size = os.path.getsize(f)
            if size <= pos:
                end.setdefault(name, pos)
                continue
            with open(f, "rb") as fh:
                fh.seek(pos)
                chunk = fh.read(size - pos)
            parsed, consumed = _parse_lines(chunk)
            rows.extend(parsed)
            end[name] = pos + consumed
        return iter(rows), end

    def readBetweenOffsets(
        self, start: dict, end: dict
    ) -> Iterator[tuple]:
        rows: list[tuple] = []
        for name, stop in end.items():
            pos = int(start.get(name, 0))
            stop = int(stop)
            if stop <= pos:
                continue
            f = os.path.join(self.path, name)
            with open(f, "rb") as fh:
                fh.seek(pos)
                chunk = fh.read(stop - pos)
            parsed, _ = _parse_lines(chunk)
            rows.extend(parsed)
        return iter(rows)

    def commit(self, end: dict) -> None:
        # Retention is a separate concern (the A13 vacuum operator);
        # committed offsets never delete data here, like Kinesis.
        pass


class CdcShardsDataSource(DataSource):
    """``spark.readStream.format("cdc_shards")`` entry point."""

    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self) -> str:
        return SCHEMA_DDL

    def simpleStreamReader(self, schema) -> CdcShardsStreamReader:
        return CdcShardsStreamReader(self.options)

    def reader(self, schema) -> "CdcShardsBatchReader":
        return CdcShardsBatchReader(self.options)


def read_cdc_shards_stream(
    spark,
    path: str,
    *,
    starting_position: str = "trim_horizon",
):
    """Register the source (idempotent) and open the stream. The
    result has CDC_RECORD_SCHEMA and feeds the same pipeline/sinks as
    the file lane."""
    spark.dataSource.register(CdcShardsDataSource)
    return (
        spark.readStream.format(SOURCE_NAME)
        .option("path", path)
        .option("starting_position", starting_position)
        .load()
    )


# ---------------------------------------------------------------------------
# Batch lane: read the whole shard log as a DataFrame (one input
# partition per shard, so the scan parallelizes across executors and
# preserves per-shard order within each partition) — the backfill /
# audit complement of the streaming reader, through the same format.
# ---------------------------------------------------------------------------
from pyspark.sql.datasource import (  # noqa: E402
    DataSourceReader,
    InputPartition,
)


class _ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class CdcShardsBatchReader(DataSourceReader):
    """One Arrow-friendly partition per shard file. Executors parse
    their shard independently; rows within a partition keep shard
    (seq) order, matching the per-key ordering contract."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def partitions(self):
        return [
            _ShardPartition(f)
            for f in sorted(
                glob.glob(os.path.join(self.path, SHARD_GLOB))
            )
        ]

    def read(self, partition: _ShardPartition):
        with open(partition.path, "rb") as fh:
            chunk = fh.read()
        rows, _ = _parse_lines(chunk)
        return iter(rows)


def read_cdc_shards(spark, path: str):
    """Batch-read the whole shard log as a DataFrame (one scan
    partition per shard)."""
    spark.dataSource.register(CdcShardsDataSource)
    return spark.read.format(SOURCE_NAME).option("path", path).load()
