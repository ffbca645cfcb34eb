"""Partitioning/determinism certification (round-12 verdict item 2).

The registry's bit-stability story rests on fold-order arguments
(decimal aggregation, unique tiebreakers, exact integer arithmetic);
this tool certifies it empirically: every registered query's RESULT
HASH (same order-insensitive hash as tools/check_correctness.py) must
be identical under radically different physical plans —
spark.sql.shuffle.partitions in {1, 7, 200} with AQE off, against the
engine's default config (32 partitions, AQE on).

Two modes:

  one config  : python tools/run_determinism.py run <sf_dir> <out.json> \
                    <shuffle_partitions> <aqe on|off> [names...]
  all configs : python tools/run_determinism.py sweep <sf_dir> <out.json>

`sweep` runs each config in a fresh JVM (subprocess) so no session
state leaks between configs, then composes the per-config hashes into
one artifact listing any query whose hash moved.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

CONFIGS = [
    # (label, shuffle_partitions, aqe) — first entry is the baseline
    # the engine actually runs with; the rest are the stress matrix.
    ("sp32_aqe", 32, True),
    ("sp1_noaqe", 1, False),
    ("sp7_noaqe", 7, False),
    ("sp200_noaqe", 200, False),
]


def run_one(sf_dir: str, out: str, shuffle_partitions: int, aqe: bool,
            names: list[str]) -> int:
    import __spark_entry__ as entrymod
    from cdk_dynamodb_cdc_spark.session import engine_env, get_spark
    from tools.check_correctness import table_hash

    spark = get_spark(
        f"determinism_sp{shuffle_partitions}",
        shuffle_partitions=shuffle_partitions,
    )
    spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.enabled", str(aqe).lower()
    )
    qs = entrymod.queries()
    todo = names or list(qs)
    report: dict = {}
    for i, name in enumerate(todo):
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            cols = [c.lower() for c in df.columns]
            rows = [tuple(r) for r in df.collect()]
            report[name] = {
                "hash": table_hash(cols, rows),
                "rows": len(rows),
            }
            print(f"[{i + 1}/{len(todo)}] {name}: "
                  f"{report[name]['hash']} ({time.time() - t0:.1f}s)",
                  flush=True)
        except Exception as exc:
            report[name] = {"hash": None, "err": f"{type(exc).__name__}: "
                            f"{exc}"[:300]}
            print(f"[{i + 1}/{len(todo)}] {name}: ERR {exc}", flush=True)
    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=repo_dir,
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception as exc:  # pragma: no cover
        print(f"WARN: git provenance capture failed: {exc}", flush=True)
        commit = None
    report["__env__"] = engine_env(spark) | {
        "shuffle_partitions": str(shuffle_partitions),
        "aqe": str(aqe).lower(),
        "sf_dir": sf_dir,
        "commit": commit,
    }
    with open(out, "w") as fh:
        json.dump(report, fh, indent=2)
    print(f"wrote {out}")
    return 0


def sweep(sf_dir: str, out: str) -> int:
    tmp = os.environ.get("DETERMINISM_TMP", "/tmp/determinism_parts")
    os.makedirs(tmp, exist_ok=True)
    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=repo_dir,
        capture_output=True, text=True, timeout=10,
    ).stdout.strip()
    parts: dict[str, dict] = {}
    for label, sp, aqe in CONFIGS:
        part = f"{tmp}/{label}.json"
        # ADVICE r12: a cached part from a different commit must be
        # regenerated, never mixed in — a composed artifact that
        # claims "one commit, four physical plans" has to mean it.
        if os.path.exists(part):
            try:
                cached_commit = (json.load(open(part))
                                 .get("__env__", {}).get("commit"))
            except Exception:
                cached_commit = None
            if cached_commit != head:
                print(f"== config {label}: cached part is from "
                      f"{(cached_commit or 'unknown')[:12]} != HEAD "
                      f"{head[:12]}; regenerating ==", flush=True)
                os.remove(part)
        if not os.path.exists(part):
            print(f"== config {label} ==", flush=True)
            rc = subprocess.call(
                [sys.executable, __file__, "run", sf_dir, part,
                 str(sp), "on" if aqe else "off"],
                cwd=repo_dir,
                stdout=open(f"{tmp}/{label}.log", "w"),
                stderr=subprocess.STDOUT,
            )
            print(f"== config {label}: rc={rc} ==", flush=True)
            if rc != 0 or not os.path.exists(part):
                raise SystemExit(
                    f"config {label} failed (rc={rc}, part "
                    f"{'present' if os.path.exists(part) else 'missing'}) "
                    f"— see {tmp}/{label}.log"
                )
        parts[label] = json.load(open(part))
    base_label = CONFIGS[0][0]
    base = parts[base_label]
    names = [n for n in base if not n.startswith("__")]
    unstable = {}
    errs = {}
    for n in names:
        hashes = {
            label: parts[label].get(n, {}).get("hash")
            for label, _, _ in CONFIGS
        }
        if any(
            parts[label].get(n, {}).get("err") for label, _, _ in CONFIGS
        ):
            errs[n] = {
                label: parts[label].get(n, {}).get("err")
                for label, _, _ in CONFIGS
                if parts[label].get(n, {}).get("err")
            }
        elif len(set(hashes.values())) != 1:
            unstable[n] = hashes
    artifact = {
        "note": (
            f"determinism sweep at {sf_dir}: every registered query's "
            "order-insensitive result hash compared across physical-"
            "plan configs (baseline 32 shuffle partitions + AQE, then "
            "1/7/200 partitions with AQE off, each in a fresh JVM). "
            "A query is stable iff all four hashes agree."
        ),
        "sf_dir": sf_dir,
        "configs": [
            {"label": label, "shuffle_partitions": sp, "aqe": aqe}
            for label, sp, aqe in CONFIGS
        ],
        "n_queries": len(names),
        "n_stable": len(names) - len(unstable) - len(errs),
        "unstable": unstable,
        "errors": errs,
        "baseline_hashes": {
            n: base[n]["hash"] for n in names
        },
        "__env__": base.get("__env__"),
    }
    with open(out, "w") as fh:
        json.dump(artifact, fh, indent=2)
    print(f"wrote {out}: {artifact['n_stable']}/{len(names)} stable, "
          f"{len(unstable)} unstable, {len(errs)} errored", flush=True)
    return 0 if not unstable and not errs else 1


def main() -> int:
    mode = sys.argv[1]
    if mode == "run":
        sf_dir, out = sys.argv[2], sys.argv[3]
        sp = int(sys.argv[4])
        aqe = sys.argv[5] == "on"
        return run_one(sf_dir, out, sp, aqe, sys.argv[6:])
    if mode == "sweep":
        return sweep(sys.argv[2], sys.argv[3])
    raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    sys.exit(main())
