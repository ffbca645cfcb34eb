"""Old-image reconstruction tests: batch lag-lane and streaming
per-key state carrying images across micro-batches."""

from __future__ import annotations

import datetime
import json

from cdk_dynamodb_cdc_spark.operators.reconstruct import (
    reconstruct_old_images,
    reconstruct_old_images_stream,
)
from cdk_dynamodb_cdc_spark.schemas import CDC_RECORD_SCHEMA

UTC = datetime.timezone.utc
_T0 = datetime.datetime(2024, 1, 1, tzinfo=UTC)


def _img(v):
    return json.dumps({"v": {"N": str(v)}})


def _rec(eid, seq, pk, new, old=None):
    return (eid, seq, _T0 + datetime.timedelta(minutes=seq), "MODIFY",
            pk, "SK", old, new, 64)


def test_batch_reconstruction_fills_previous_version(spark):
    rows = [
        _rec("a1", 1, "A", _img(1)),
        _rec("a2", 2, "A", _img(2)),
        _rec("a3", 3, "A", _img(3)),
        _rec("b1", 1, "B", _img(9)),
    ]
    df = spark.createDataFrame(rows, CDC_RECORD_SCHEMA)
    got = {r.event_id: r.old_image for r in reconstruct_old_images(df).collect()}
    assert got == {"a1": None, "a2": _img(1), "a3": _img(2), "b1": None}


def test_batch_reconstruction_preserves_provided_old_images(spark):
    rows = [
        _rec("a1", 1, "A", _img(1)),
        _rec("a2", 2, "A", _img(2), old=_img(42)),  # source-provided wins
    ]
    df = spark.createDataFrame(rows, CDC_RECORD_SCHEMA)
    got = {r.event_id: r.old_image for r in reconstruct_old_images(df).collect()}
    assert got["a2"] == _img(42)


def test_stream_reconstruction_carries_state_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()

    def write_batch(name, rows, mtime):
        import os
        p = src / name
        with open(p, "w") as fh:
            for (eid, seq, ts, op, pk, sk, old, new, size) in rows:
                fh.write(json.dumps({
                    "event_id": eid, "seq": seq,
                    "ts": ts.strftime("%Y-%m-%dT%H:%M:%S.%f%z"),
                    "operation": op, "pk": pk, "sk": sk,
                    "old_image": old, "new_image": new, "size_bytes": size,
                }) + "\n")
        os.utime(p, (mtime, mtime))

    import time
    now = time.time()
    write_batch("b0.json", [_rec("a1", 1, "A", _img(1)),
                            _rec("a2", 2, "A", _img(2))], now - 60)
    write_batch("b1.json", [_rec("a3", 3, "A", _img(3)),
                            _rec("b1", 1, "B", _img(9))], now)

    stream = (
        spark.readStream.schema(CDC_RECORD_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = reconstruct_old_images_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("recon_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive
    got = {
        r.event_id: r.old_image
        for r in spark.sql("SELECT event_id, old_image FROM recon_out").collect()
    }
    # a3 arrives in the SECOND micro-batch: its old image must come
    # from state written by the first batch
    assert got == {"a1": None, "a2": _img(1), "a3": _img(2), "b1": None}
