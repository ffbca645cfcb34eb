"""Long-run streaming soak (round-12 verdict item 6).

The short exactly-once pytests pin each streaming lane over a handful
of micro-batches; this soak composes the three production sinks —
maintain_snapshot_stream, maintain_aggregate_stream, and the
txlog_sink_writer ACID lane with its change-feed consumer — over 100+
micro-batches of one synthetic CDC stream, with three checkpoint
restart cycles (phase boundaries) plus one genuine mid-stream kill
(query.stop() during processing), and asserts the final state of every
store equals an independent batch replay of the same records.
"""

from __future__ import annotations

import datetime
import decimal
import json
import os
import random
import time


def _n_commits(ckpt: str) -> int:
    """Committed micro-batch count in a streaming checkpoint (0 when
    the query has not created the commits dir yet)."""
    d = os.path.join(ckpt, "commits")
    if not os.path.isdir(d):
        return 0
    return len([f for f in os.listdir(d) if not f.startswith(".")])

from cdk_dynamodb_cdc_spark.operators.ivm import (
    maintain_aggregate_stream,
    read_aggregate_store,
)
from cdk_dynamodb_cdc_spark.storage import TxTable, txlog_sink_writer
from cdk_dynamodb_cdc_spark.storage.txlog import read_txlog_feed
from cdk_dynamodb_cdc_spark.streaming import (
    read_cdc_stream,
    run_cdc_stream,
)
from cdk_dynamodb_cdc_spark.streaming.stream import (
    maintain_snapshot_stream,
    read_snapshot_store,
)

UTC = datetime.timezone.utc
N_FILES = 100
RECORDS_PER_FILE = 3
N_KEYS = 20
GROUPS = ["a", "b", "c"]
# Phase boundaries: each boundary is a full stop + restart of every
# stream from its checkpoint (3 restart cycles across 4 phases).
PHASES = [(0, 30), (30, 60), (60, 85), (85, 100)]


def _img(group: str, value: str) -> str:
    return json.dumps(
        {"event_type": {"S": group}, "value": {"N": value}}
    )


def _generate(src_dir) -> dict:
    """Write N_FILES JSON-lines CDC files; return the Python-side
    replay: per-key live image and the expected per-group totals.

    old_image always equals the key's previous new_image (consistent
    chain), every MODIFY changes the value (no no-op drops), REMOVE
    clears the key so a later INSERT restarts it.
    """
    rng = random.Random(12)
    t0 = datetime.datetime(2024, 3, 1, tzinfo=UTC)
    live: dict[str, tuple[str, str]] = {}  # pk -> (group, value)
    seq = 0
    n_records = 0
    for f in range(N_FILES):
        lines = []
        for _ in range(RECORDS_PER_FILE):
            seq += 1
            n_records += 1
            pk = f"U#{rng.randrange(N_KEYS)}"
            ts = t0 + datetime.timedelta(minutes=seq)
            if pk not in live:
                group = rng.choice(GROUPS)
                value = f"{rng.randrange(1, 500)}.{rng.randrange(100):02d}"
                rec = {
                    "operation": "INSERT",
                    "old_image": None,
                    "new_image": _img(group, value),
                }
                live[pk] = (group, value)
            elif rng.random() < 0.15:
                group, value = live.pop(pk)
                rec = {
                    "operation": "REMOVE",
                    "old_image": _img(group, value),
                    "new_image": None,
                }
            else:
                old_group, old_value = live[pk]
                # occasional cross-group move; value always changes
                group = (
                    rng.choice(GROUPS)
                    if rng.random() < 0.2
                    else old_group
                )
                value = f"{rng.randrange(1, 500)}.{rng.randrange(100):02d}"
                if value == old_value:
                    value = f"{int(value.split('.')[0]) + 1}.00"
                rec = {
                    "operation": "MODIFY",
                    "old_image": _img(old_group, old_value),
                    "new_image": _img(group, value),
                }
                live[pk] = (group, value)
            rec.update(
                event_id=f"ev-{seq}",
                seq=seq,
                ts=ts.strftime("%Y-%m-%dT%H:%M:%S.%f%z"),
                pk=pk,
                sk="S",
                size_bytes=64,
            )
            lines.append(json.dumps(rec))
        with open(src_dir / f"batch{f:03d}.json", "w") as fh:
            fh.write("\n".join(lines) + "\n")
    totals: dict[str, list] = {}
    for group, value in live.values():
        cur = totals.setdefault(group, [0, decimal.Decimal(0)])
        cur[0] += 1
        cur[1] += decimal.Decimal(value)
    return {
        "live": live,
        "totals": {g: (n, t) for g, (n, t) in totals.items()},
        "n_records": n_records,
    }


def _await(q):
    q.awaitTermination(300)
    assert not q.isActive


# Forked snapshot runner for the hard-kill cycle (r14 verdict item 6):
# runs maintain_snapshot_stream in its OWN Python driver + JVM so the
# parent can SIGKILL the whole process group mid-batch — checkpoint
# recovery is then exercised against a genuinely torn process (no
# cooperative stop(), no JVM shutdown hooks), which is the failure a
# 1000-executor deployment actually has.
_FORKED_SNAPSHOT_RUNNER = """
import sys
sys.path.insert(0, {repo!r})
from cdk_dynamodb_cdc_spark.session import get_spark
from cdk_dynamodb_cdc_spark.streaming import read_cdc_stream
from cdk_dynamodb_cdc_spark.streaming.stream import maintain_snapshot_stream

staged, snap_state, snap_ckpt, parts = sys.argv[1:5]
spark = get_spark(
    "soak_kill_child", master="local[4]",
    shuffle_partitions=int(parts),
    extra_conf={{"spark.driver.memory": "4g"}},
)
q = maintain_snapshot_stream(
    read_cdc_stream(
        spark, staged, starting_position="trim_horizon",
        max_files_per_trigger=1,
    ),
    state_path=snap_state,
    checkpoint_path=snap_ckpt,
    buckets=4,
)
q.awaitTermination(600)
"""


def _hard_kill_snapshot_cycle(
    spark, staged: str, snap_state: str, snap_ckpt: str
) -> None:
    """Start the snapshot stream in a forked driver, wait for it to
    commit at least one NEW micro-batch, then SIGKILL its entire
    process group (Python driver + JVM, no shutdown hooks run)."""
    import signal
    import subprocess
    import sys

    pre_kill = _n_commits(snap_ckpt)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    parts = spark.conf.get("spark.sql.shuffle.partitions")
    proc = subprocess.Popen(
        [
            sys.executable, "-c",
            _FORKED_SNAPSHOT_RUNNER.format(repo=repo),
            staged, snap_state, snap_ckpt, str(parts),
        ],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        start_new_session=True,  # own pgroup: killpg reaps the JVM too
    )
    try:
        deadline = time.time() + 240
        while _n_commits(snap_ckpt) <= pre_kill:
            assert proc.poll() is None, (
                "forked snapshot runner exited before committing "
                f"a new batch (rc={proc.returncode})"
            )
            assert time.time() < deadline, (
                "no micro-batch committed within 240s before hard kill"
            )
            time.sleep(0.1)
    finally:
        # SIGKILL the process GROUP: unblockable, tears the driver and
        # its JVM mid-whatever-they-were-doing
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.wait(30)
    assert _n_commits(snap_ckpt) > pre_kill


def run_scenario(spark, tmp_path, *, kill: bool = True) -> dict:
    """The composed soak scenario, callable outside pytest (tools/
    run_stream_determinism.py replays it under different shuffle-
    partition configs and pins final-store hash equality — r12
    verdict item 6). Returns the store paths plus the Python-side
    expected replay."""
    import pathlib

    tmp_path = pathlib.Path(tmp_path)
    src = tmp_path / "src"
    src.mkdir()
    expect = _generate(src)

    snap_state = str(tmp_path / "snap_state")
    snap_ckpt = str(tmp_path / "snap_ckpt")
    agg_state = str(tmp_path / "agg_state")
    agg_ckpt = str(tmp_path / "agg_ckpt")
    tx_path = str(tmp_path / "txlog")
    tx_ckpt = str(tmp_path / "tx_ckpt")
    feed_out = str(tmp_path / "feed_out")
    feed_ckpt = str(tmp_path / "feed_ckpt")
    staged = tmp_path / "staged"
    staged.mkdir()

    all_files = sorted(os.listdir(src))

    def stage(hi: int) -> None:
        """Expose the first `hi` source files to the streams."""
        for name in all_files[:hi]:
            dst = staged / name
            if not dst.exists():
                os.link(src / name, dst)

    def run_snapshot():
        q = maintain_snapshot_stream(
            read_cdc_stream(
                spark, str(staged), starting_position="trim_horizon",
                max_files_per_trigger=1,
            ),
            state_path=snap_state,
            checkpoint_path=snap_ckpt,
            buckets=4,
        )
        _await(q)

    def run_aggregate():
        q = maintain_aggregate_stream(
            read_cdc_stream(
                spark, str(staged), starting_position="trim_horizon",
                max_files_per_trigger=10,
            ),
            state_path=agg_state,
            checkpoint_path=agg_ckpt,
            group_field="event_type",
            value_field="value",
            buckets=4,
        )
        _await(q)

    def run_txlog():
        q = run_cdc_stream(
            read_cdc_stream(
                spark, str(staged), starting_position="trim_horizon",
                max_files_per_trigger=20,
            ),
            sink_path=tx_path,
            checkpoint_path=tx_ckpt,
            sink_writer=txlog_sink_writer(
                spark, tx_path, app_id="soak"
            ),
        )
        _await(q)

    def run_feed_consumer():
        q = (
            read_txlog_feed(spark, tx_path)
            .writeStream.format("parquet")
            .option("path", feed_out)
            .option("checkpointLocation", feed_ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await(q)

    killed = not kill
    for phase, (_, hi) in enumerate(PHASES):
        stage(hi)
        if phase == 1 and not killed:
            # Genuine kill (r14: upgraded from a cooperative q.stop()
            # to a SIGKILL of a forked driver's process group): the
            # stream runs in its own JVM, commits at least one NEW
            # micro-batch of this phase's data (the r12 no-op-kill
            # guard), then the whole process is torn down with no
            # shutdown hooks; the next run must recover from the
            # checkpoint with no duplicate or lost application
            # (however many of this phase's batches the kill
            # interrupted, including a possibly half-written one).
            _hard_kill_snapshot_cycle(
                spark, str(staged), snap_state, snap_ckpt
            )
            killed = True
        run_snapshot()
        run_aggregate()
        run_txlog()
        run_feed_consumer()

    return {
        "expect": expect,
        "snap_state": snap_state,
        "agg_state": agg_state,
        "tx_path": tx_path,
        "feed_out": feed_out,
        "snap_commits": _n_commits(snap_ckpt),
        "agg_commits": _n_commits(agg_ckpt),
        "tx_commits": _n_commits(tx_ckpt),
    }


def test_soak_composed_streams_match_batch_replay(spark, tmp_path):
    run = run_scenario(spark, tmp_path, kill=True)
    expect = run["expect"]
    snap_state, agg_state = run["snap_state"], run["agg_state"]
    tx_path, feed_out = run["tx_path"], run["feed_out"]

    # ---- micro-batch volume: >= 100 snapshot batches alone ---------
    n_batches = (
        run["snap_commits"] + run["agg_commits"] + run["tx_commits"]
    )
    assert run["snap_commits"] >= N_FILES  # 1 file per trigger
    assert n_batches >= N_FILES + N_FILES // 10 + N_FILES // 20

    # ---- snapshot store == batch replay winners --------------------
    got_live = {
        r.pk: r.image
        for r in read_snapshot_store(spark, snap_state).collect()
    }
    want_live = {
        pk: _img(group, value)
        for pk, (group, value) in expect["live"].items()
    }
    assert {
        pk: json.loads(img) for pk, img in got_live.items()
    } == {pk: json.loads(img) for pk, img in want_live.items()}

    # ---- aggregate store == live-group totals ----------------------
    got_totals = {
        r.group_key: (r.n_items, decimal.Decimal(r.total_value))
        for r in read_aggregate_store(spark, agg_state).collect()
        if r.n_items
    }
    assert got_totals == expect["totals"]

    # ---- txlog: every record published exactly once ----------------
    tx_rows = TxTable(spark, tx_path).snapshot().collect()
    assert len(tx_rows) == expect["n_records"]
    ids = [r.event_id for r in tx_rows]
    assert len(ids) == len(set(ids))

    # ---- feed consumer saw exactly the txlog's rows ----------------
    feed_ids = [
        r.event_id
        for r in spark.read.parquet(feed_out)
        .select("event_id")
        .collect()
    ]
    assert sorted(feed_ids) == sorted(ids)
