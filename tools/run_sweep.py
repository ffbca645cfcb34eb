"""Chunked full-registry correctness sweep at an arbitrary SF dir.

Same machinery as tools/run_sf1_full.py (fresh JVM + DuckDB per chunk,
cached chunk artifacts, composed driver-shaped JSON) but with no
oracle exclusions — used for the sf0.1 robustness sweep, where every
ground-truth oracle (including the 12.5M-pair all-pairs joins and the
staged curation closure) is expected to run to completion.

Usage: python tools/run_sweep.py <sf_dir> <out.json> <tmp_dir> [chunk_size]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    out = sys.argv[2]
    tmp = sys.argv[3]
    chunk_size = int(sys.argv[4]) if len(sys.argv) > 4 else 28
    names = list(entrymod.queries())
    os.makedirs(tmp, exist_ok=True)
    chunks = [
        names[i:i + chunk_size] for i in range(0, len(names), chunk_size)
    ]
    merged: dict[str, dict] = {}
    env_fp = None
    failed_chunks = []
    for i, chunk in enumerate(chunks):
        part = f"{tmp}/chunk_{i:02d}.json"
        if os.path.exists(part):
            print(f"[chunk {i}] cached: {part}", flush=True)
        else:
            env = dict(os.environ)
            env["CHECK_CORRECTNESS_JSON"] = part
            print(f"[chunk {i}] {len(chunk)} queries: "
                  f"{chunk[0]}..{chunk[-1]}", flush=True)
            try:
                rc = subprocess.call(
                    [sys.executable, "tools/check_correctness.py",
                     sf_dir, *chunk],
                    env=env, cwd="/root/repo",
                    stdout=open(f"{tmp}/chunk_{i:02d}.log", "w"),
                    stderr=subprocess.STDOUT,
                    timeout=7200,
                )
            except subprocess.TimeoutExpired:
                rc = "timeout"
            print(f"[chunk {i}] rc={rc}", flush=True)
        if not os.path.exists(part):
            failed_chunks.append(i)
            continue
        d = json.load(open(part))
        env_fp = d.pop("__env__", env_fp)
        merged.update({k: v for k, v in d.items() if not k.startswith("__")})
    n_pass = sum(
        1 for v in merged.values()
        if (v.get("hash_match") or v.get("oracle_rows") is None)
        and v.get("rows_match") and not v.get("err")
    )
    artifact = {
        "note": os.environ.get("SWEEP_NOTE") or (
            f"full-registry correctness sweep at {sf_dir} over the "
            f"current {len(names)}-query registry: every registered "
            "query re-verified against its DuckDB oracle with NO "
            "exclusions — including the all-pairs dedup ground truths "
            "and the staged curation closure."
        ),
        "sf_dir": sf_dir,
        "n_queries": len(merged),
        "n_pass": n_pass,
        "failed_chunks": failed_chunks,
        "__env__": env_fp,
        "queries": dict(sorted(merged.items())),
    }
    with open(out, "w") as fh:
        json.dump(artifact, fh, indent=2)
    print(f"wrote {out}: {n_pass}/{len(merged)} pass, "
          f"{len(failed_chunks)} failed chunks", flush=True)
    return 0 if n_pass == len(merged) and not failed_chunks else 1


if __name__ == "__main__":
    sys.exit(main())
