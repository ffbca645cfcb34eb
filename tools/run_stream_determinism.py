"""Streaming-lane determinism certification (round-12 verdict item 6).

Batch determinism is certified across physical-plan configs
(tools/run_determinism.py); this tool extends the same claim to the
STREAMING lane: the composed soak scenario (tests/test_streaming_soak
.py:run_scenario — snapshot store, aggregate store, ACID txlog sink,
change-feed consumer, three restart cycles over 100 micro-batches)
replayed under different spark.sql.shuffle.partitions configs, each
in a FRESH JVM, must leave bit-identical final stores: the stores are
keyed MERGE targets (seq-guarded upserts / idempotent txn commits),
so no shuffle layout may leak into their contents.

Two modes:

  one config  : python tools/run_stream_determinism.py run \
                    <out.json> <shuffle_partitions>
  all configs : python tools/run_stream_determinism.py sweep <out.json>

The sweep composes per-config store hashes (the order-insensitive
table hash the correctness gate uses) into one artifact listing any
store whose hash moved across configs.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# Baseline first: the engine's own default (32 + AQE as get_spark
# pins it), then the stress configs.
SHUFFLE_CONFIGS = [32, 4, 1]


def run_one(out: str, shuffle_partitions: int) -> int:
    from cdk_dynamodb_cdc_spark.session import engine_env, get_spark
    from cdk_dynamodb_cdc_spark.storage import TxTable
    from cdk_dynamodb_cdc_spark.operators.ivm import read_aggregate_store
    from cdk_dynamodb_cdc_spark.streaming.stream import read_snapshot_store
    from tools.check_correctness import table_hash
    from test_streaming_soak import run_scenario

    spark = get_spark(
        f"stream_det_sp{shuffle_partitions}",
        shuffle_partitions=shuffle_partitions,
    )
    work = tempfile.mkdtemp(prefix=f"stream_det_sp{shuffle_partitions}_")
    run = run_scenario(spark, work, kill=False)

    def hash_df(df) -> str:
        cols = [c.lower() for c in df.columns]
        return table_hash(cols, [tuple(r) for r in df.collect()])

    report = {
        "snapshot_store": hash_df(
            read_snapshot_store(spark, run["snap_state"]).select(
                "pk", "image"
            )
        ),
        "aggregate_store": hash_df(
            read_aggregate_store(spark, run["agg_state"]).select(
                "group_key", "n_items", "total_value"
            )
        ),
        "txlog_snapshot": hash_df(
            TxTable(spark, run["tx_path"]).snapshot()
        ),
        "feed_consumer": hash_df(
            spark.read.parquet(run["feed_out"])
        ),
        "n_micro_batches": run["snap_commits"]
        + run["agg_commits"]
        + run["tx_commits"],
    }
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=REPO,
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception as exc:  # pragma: no cover
        print(f"WARN: git provenance capture failed: {exc}", flush=True)
        commit = None
    report["__env__"] = engine_env(spark) | {
        "shuffle_partitions": str(shuffle_partitions),
        "commit": commit,
    }
    with open(out, "w") as fh:
        json.dump(report, fh, indent=2)
    print(f"wrote {out}")
    return 0


def sweep(out: str) -> int:
    tmp = os.environ.get("STREAM_DET_TMP", "/tmp/stream_det_parts")
    os.makedirs(tmp, exist_ok=True)
    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO,
        capture_output=True, text=True, timeout=10,
    ).stdout.strip()
    parts: dict[str, dict] = {}
    for sp in SHUFFLE_CONFIGS:
        label = f"sp{sp}"
        part = f"{tmp}/{label}.json"
        if os.path.exists(part):
            try:
                cached = json.load(open(part)).get("__env__", {}).get(
                    "commit"
                )
            except Exception:
                cached = None
            if cached != head:
                print(f"== {label}: cached part from "
                      f"{(cached or 'unknown')[:12]} != HEAD; "
                      "regenerating ==", flush=True)
                os.remove(part)
        if not os.path.exists(part):
            print(f"== config {label} ==", flush=True)
            rc = subprocess.call(
                [sys.executable, __file__, "run", part, str(sp)],
                cwd=REPO,
                stdout=open(f"{tmp}/{label}.log", "w"),
                stderr=subprocess.STDOUT,
            )
            print(f"== config {label}: rc={rc} ==", flush=True)
            if rc != 0 or not os.path.exists(part):
                raise SystemExit(
                    f"config {label} failed (rc={rc}) — see "
                    f"{tmp}/{label}.log"
                )
        parts[label] = json.load(open(part))
    stores = [
        "snapshot_store", "aggregate_store", "txlog_snapshot",
        "feed_consumer",
    ]
    base = parts[f"sp{SHUFFLE_CONFIGS[0]}"]
    unstable = {}
    for s in stores:
        hashes = {lbl: p[s] for lbl, p in parts.items()}
        if len(set(hashes.values())) != 1:
            unstable[s] = hashes
    artifact = {
        "note": (
            "streaming determinism sweep: the composed soak scenario "
            "(snapshot store, aggregate store, ACID txlog sink, "
            "change-feed consumer; 100+ micro-batches, 3 restart "
            "cycles) replayed end-to-end under shuffle-partition "
            f"configs {SHUFFLE_CONFIGS}, each in a fresh JVM; a store "
            "is stable iff its order-insensitive table hash is "
            "identical across all configs."
        ),
        "configs": [f"sp{sp}" for sp in SHUFFLE_CONFIGS],
        "n_stores": len(stores),
        "n_stable": len(stores) - len(unstable),
        "unstable": unstable,
        "baseline_hashes": {s: base[s] for s in stores},
        "n_micro_batches_per_config": {
            lbl: p["n_micro_batches"] for lbl, p in parts.items()
        },
        "__env__": base.get("__env__"),
    }
    with open(out, "w") as fh:
        json.dump(artifact, fh, indent=2)
    print(f"wrote {out}: {artifact['n_stable']}/{len(stores)} stable",
          flush=True)
    return 0 if not unstable else 1


def main() -> int:
    mode = sys.argv[1]
    if mode == "run":
        return run_one(sys.argv[2], int(sys.argv[3]))
    if mode == "sweep":
        return sweep(sys.argv[2])
    raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    sys.exit(main())
