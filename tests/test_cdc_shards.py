"""Seekable shard source (sources/cdc_shards.py): offset semantics as
pure-Python unit tests, plus end-to-end Structured Streaming reads
with trim_horizon/latest, incremental polls, and checkpoint restart."""

from __future__ import annotations

import datetime
import os

import pytest

from cdk_dynamodb_cdc_spark.sources.cdc_shards import (
    CdcShardsStreamReader,
    append_cdc_records,
    read_cdc_shards_stream,
)


def _rec(seq: int, pk: str = "item#1", op: str = "INSERT") -> dict:
    return {
        "event_id": f"e{seq}",
        "seq": seq,
        "ts": datetime.datetime(2024, 1, 1, 0, 0, seq % 60),
        "operation": op,
        "pk": pk,
        "sk": "v0",
        "old_image": None,
        "new_image": '{"a":{"S":"x"}}',
        "size_bytes": 20,
    }


# --- unit: offset arithmetic, no Spark ---------------------------------


def test_trim_horizon_reads_backlog_then_only_new(tmp_path):
    path = str(tmp_path)
    append_cdc_records(path, "0000", [_rec(1), _rec(2)])
    append_cdc_records(path, "0001", [_rec(10)])
    r = CdcShardsStreamReader(
        {"path": path, "starting_position": "trim_horizon"}
    )
    start = r.initialOffset()
    assert start == {"shard-0000.jsonl": 0, "shard-0001.jsonl": 0}

    rows, end = r.read(start)
    assert sorted(t[1] for t in rows) == [1, 2, 10]

    # nothing new -> empty poll, offsets stable
    rows2, end2 = r.read(end)
    assert list(rows2) == [] and end2 == end

    # append -> only the new record arrives
    append_cdc_records(path, "0000", [_rec(3)])
    rows3, end3 = r.read(end)
    assert [t[1] for t in rows3] == [3]
    assert end3["shard-0000.jsonl"] > end["shard-0000.jsonl"]


def test_latest_stats_not_reads_the_backlog(tmp_path):
    path = str(tmp_path)
    append_cdc_records(path, "0000", [_rec(1), _rec(2)])
    r = CdcShardsStreamReader(
        {"path": path, "starting_position": "latest"}
    )
    start = r.initialOffset()
    # offset == current size: the backlog is skipped without parsing
    assert start["shard-0000.jsonl"] == os.path.getsize(
        os.path.join(path, "shard-0000.jsonl")
    )
    rows, end = r.read(start)
    assert list(rows) == []
    append_cdc_records(path, "0000", [_rec(3)])
    rows2, _ = r.read(end)
    assert [t[1] for t in rows2] == [3]


def test_new_shard_appearing_mid_stream_starts_at_zero(tmp_path):
    path = str(tmp_path)
    append_cdc_records(path, "0000", [_rec(1)])
    r = CdcShardsStreamReader(
        {"path": path, "starting_position": "trim_horizon"}
    )
    _, end = r.read(r.initialOffset())
    append_cdc_records(path, "0001", [_rec(20), _rec(21)])
    rows, end2 = r.read(end)
    assert sorted(t[1] for t in rows) == [20, 21]
    assert end2["shard-0001.jsonl"] > 0


def test_read_between_offsets_replays_exactly(tmp_path):
    path = str(tmp_path)
    append_cdc_records(path, "0000", [_rec(1), _rec(2)])
    r = CdcShardsStreamReader(
        {"path": path, "starting_position": "trim_horizon"}
    )
    start = r.initialOffset()
    rows, end = r.read(start)
    replay = list(r.readBetweenOffsets(start, end))
    assert sorted(replay) == sorted(rows)
    # replay of the empty range is empty
    assert list(r.readBetweenOffsets(end, end)) == []


def test_partial_trailing_line_is_left_for_next_poll(tmp_path):
    path = str(tmp_path)
    append_cdc_records(path, "0000", [_rec(1)])
    f = os.path.join(path, "shard-0000.jsonl")
    with open(f, "a") as fh:
        fh.write('{"event_id": "e2", "seq": 2')  # no newline: mid-append
    r = CdcShardsStreamReader(
        {"path": path, "starting_position": "trim_horizon"}
    )
    rows, end = r.read(r.initialOffset())
    assert [t[1] for t in rows] == [1]
    with open(f, "a") as fh:
        fh.write(', "ts": "2024-01-01T00:00:02", "operation": "INSERT",'
                 ' "pk": "item#1", "sk": "v0", "old_image": null,'
                 ' "new_image": "{}", "size_bytes": 5}\n')
    rows2, _ = r.read(end)
    assert [t[1] for t in rows2] == [2]


def test_invalid_starting_position_rejected(tmp_path):
    with pytest.raises(ValueError, match="starting_position"):
        CdcShardsStreamReader(
            {"path": str(tmp_path), "starting_position": "oldest"}
        )


# --- end-to-end: Structured Streaming over the custom source -----------


def test_streaming_trim_horizon_then_incremental_then_restart(
    spark, tmp_path
):
    path = str(tmp_path / "shards")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    append_cdc_records(path, "0000", [_rec(1), _rec(2)])
    append_cdc_records(path, "0001", [_rec(10)])

    def run_once() -> None:
        q = (
            read_cdc_shards_stream(
                spark, path, starting_position="trim_horizon"
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got = {r["seq"] for r in spark.read.parquet(out).collect()}
    assert got == {1, 2, 10}

    # restart with no new data: offsets hold, nothing re-emitted
    run_once()
    assert spark.read.parquet(out).count() == 3

    # append across shards (one brand-new), restart: only new rows
    append_cdc_records(path, "0000", [_rec(3)])
    append_cdc_records(path, "0002", [_rec(30)])
    run_once()
    got = sorted(
        r["seq"] for r in spark.read.parquet(out).collect()
    )
    assert got == [1, 2, 3, 10, 30]


def test_streaming_latest_skips_backlog(spark, tmp_path):
    path = str(tmp_path / "shards")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    append_cdc_records(path, "0000", [_rec(1), _rec(2)])

    q = (
        read_cdc_shards_stream(spark, path, starting_position="latest")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    append_cdc_records(path, "0000", [_rec(3)])
    q2 = (
        read_cdc_shards_stream(spark, path, starting_position="latest")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert [
        r["seq"] for r in spark.read.parquet(out).collect()
    ] == [3]


def test_shard_stream_composes_with_snapshot_maintenance(
    spark, tmp_path
):
    """Drop-in compose: the seekable shard source feeds
    maintain_snapshot_stream unchanged (same CDC_RECORD_SCHEMA), and
    the resulting store reflects upserts and deletes."""
    import json as _json

    from cdk_dynamodb_cdc_spark.streaming import (
        maintain_snapshot_stream,
        read_snapshot_store,
    )

    def img(v):
        return _json.dumps({"v": {"N": str(v)}})

    path = str(tmp_path / "shards")
    append_cdc_records(
        path,
        "0000",
        [
            dict(_rec(1, pk="A"), new_image=img(1)),
            dict(_rec(2, pk="B"), new_image=img(2)),
            dict(_rec(3, pk="A", op="MODIFY"),
                 old_image=img(1), new_image=img(10)),
            dict(_rec(4, pk="B", op="REMOVE"),
                 old_image=img(2), new_image=None),
        ],
    )
    records = read_cdc_shards_stream(
        spark, path, starting_position="trim_horizon"
    )
    q = maintain_snapshot_stream(
        records,
        state_path=str(tmp_path / "state"),
        checkpoint_path=str(tmp_path / "ckpt"),
        buckets=4,
    )
    q.awaitTermination(120)
    live = {
        r["pk"]: r["image"]
        for r in read_snapshot_store(
            spark, str(tmp_path / "state")
        ).collect()
    }
    assert live == {"A": img(10)}  # B deleted, A at its latest image


def test_batch_read_parallelizes_per_shard(spark, tmp_path):
    from cdk_dynamodb_cdc_spark.sources.cdc_shards import read_cdc_shards

    path = str(tmp_path / "shards")
    append_cdc_records(path, "0000", [_rec(1), _rec(2)])
    append_cdc_records(path, "0001", [_rec(10)])
    append_cdc_records(path, "0002", [_rec(20)])
    df = read_cdc_shards(spark, path)
    assert df.rdd.getNumPartitions() == 3  # one per shard
    assert sorted(r["seq"] for r in df.collect()) == [1, 2, 10, 20]
    # composes with the batch pipeline
    from cdk_dynamodb_cdc_spark.operators.pipeline import cdc_change_events

    events = cdc_change_events(df)
    assert events.count() == 4
