"""Full-registry correctness at sf1 (/root/repo/sf1, tools/make_sf1.py).

Runs every registered query through tools/check_correctness.py against
the sf1 corpus in CHUNKS (fresh JVM + fresh DuckDB per chunk, so one
heavy plan can't poison the rest), then composes the chunk artifacts
into one driver-shaped JSON with the exclusion policy recorded.

Exclusions: the brute-force near-dup/ANN ground-truth oracles are
all-pairs BY DESIGN; at sf1 (50k documents / 20k vectors) that is
~1.25e9 pairs of list intersections — beyond a single DuckDB process
by orders of magnitude. Those queries still run their SPARK side at
sf1 (rows-only row, reason recorded); their oracle parity stands at
sf0.1, where the robustness sweep ran the 12.5M-pair oracles to
completion (ROBUSTNESS_SF01 artifacts).

Usage: python tools/run_sf1_full.py [out.json] [chunk_size]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402

# Genuinely all-pairs ground-truth oracles, intractable at sf1 (the
# sf0.1 brute force measures ~15 min in one DuckDB process; sf1 is
# ~100x that). Spark sides still run (rows-only row, reason
# recorded); full-oracle parity stands at sf0.1, and round 11 adds
# sf1-grade HASH evidence for the same production lanes via the
# fixed-probe contract queries (near_dup_*_probe,
# incremental_near_dup_probe), whose restricted probe-x-corpus
# oracles DO run at sf1.
#
# Round-11 closures (no longer excluded): the CTE-replay class —
# part_coorder_bfs_layers, part_coorder_sssp, embedding_dbscan_2d,
# semantic_dedup_keep, near_dup_embedding_pairs,
# semantic_decontam_flags, mmr_diverse_retrieval — now hash-verified
# at sf1 after the MATERIALIZED round/closure CTE fix (the r10
# spills were 2^rounds re-evaluations of the pair join, not genuine
# oracle cost).
ORACLE_SKIP_SF1 = [
    "near_dup_minhash_pairs",
    "near_dup_simhash_pairs",
    "near_dup_ngram_jaccard",
    "near_dup_containment_pairs",
    "incremental_near_dup_pairs",
    # full-corpus compositions whose oracles embed the same all-pairs
    # shingle join (one evaluation after MATERIALIZED, but still
    # corpus x corpus): the composition is hash-verified at sf0.1 and
    # its pair input is probe-verified at sf1
    "dedup_clusters",
    "curate_corpus_dispositions",
]

SF1 = "/root/repo/sf1"
TMP = "/tmp/sf1_full"


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/CORRECTNESS_SF1_r10.json"
    chunk_size = int(sys.argv[2]) if len(sys.argv) > 2 else 28
    names = list(entrymod.queries())
    os.makedirs(TMP, exist_ok=True)
    chunks = [
        names[i:i + chunk_size] for i in range(0, len(names), chunk_size)
    ]
    merged: dict[str, dict] = {}
    env_fp = None
    failed_chunks = []
    for i, chunk in enumerate(chunks):
        part = f"{TMP}/chunk_{i:02d}.json"
        if os.path.exists(part):
            print(f"[chunk {i}] cached: {part}", flush=True)
        else:
            env = dict(os.environ)
            env["CHECK_CORRECTNESS_JSON"] = part
            env["CHECK_CORRECTNESS_ORACLE_SKIP"] = ",".join(ORACLE_SKIP_SF1)
            print(f"[chunk {i}] {len(chunk)} queries: "
                  f"{chunk[0]}..{chunk[-1]}", flush=True)
            try:
                rc = subprocess.call(
                    [sys.executable, "tools/check_correctness.py",
                     SF1, *chunk],
                    env=env, cwd="/root/repo",
                    stdout=open(f"{TMP}/chunk_{i:02d}.log", "w"),
                    stderr=subprocess.STDOUT,
                    timeout=3600,
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
    # Three disjoint buckets (ADVICE r10: skip rows must not count as
    # passes): hash-verified, rows-only (query has no oracle at any
    # SF), and oracle-skipped (capacity exclusion — no comparison ran).
    n_skipped = sum(
        1 for v in merged.values() if v.get("oracle_skipped")
    )
    n_rows_only = sum(
        1 for v in merged.values()
        if not v.get("oracle_skipped") and v.get("oracle_rows") is None
        and v.get("rows_match") and not v.get("err")
    )
    n_pass = sum(
        1 for v in merged.values()
        if v.get("hash_match") and v.get("rows_match")
        and not v.get("err")
    )
    artifact = {
        "note": (
            "round-10 FULL-registry correctness at sf1 (10x the sf0.1 "
            "robustness sweep, 100x the driver gate): every registered "
            "query ran its Spark plan on the sf1 corpus; all but the "
            "documented oracle-capacity exclusions were hash-compared "
            "against their DuckDB oracle at sf1. Excluded ORACLES (Spark "
            "side still ran; rows-only) fall in two classes: (1) the "
            "brute-force near-dup/ANN ground truths, all-pairs by design "
            "(~1.25e9 list-op pairs at 50k docs); (2) ground truths whose "
            "DuckDB evaluation balloons at sf1 even though the Spark plan "
            "is bounded — the unrolled greedy MMR selection (85 GB RSS, "
            "killed) and the co-order-graph round-replay CTEs (58-68 GB "
            "disk spill, ENOSPC). Oracle parity for every excluded query "
            "stands at sf0.1 in the ROBUSTNESS_SF01 artifacts."
        ),
        "sf_dir": SF1,
        "oracle_excluded": ORACLE_SKIP_SF1,
        "n_queries": len(merged),
        "n_pass": n_pass,
        "n_rows_only": n_rows_only,
        "n_oracle_skipped": n_skipped,
        "failed_chunks": failed_chunks,
        "__env__": env_fp,
        "queries": dict(sorted(merged.items())),
    }
    with open(out, "w") as fh:
        json.dump(artifact, fh, indent=2)
    print(f"wrote {out}: {n_pass} hash-pass + {n_rows_only} rows-only "
          f"+ {n_skipped} oracle-skipped of {len(merged)}, "
          f"{len(failed_chunks)} failed chunks", flush=True)
    ok = n_pass + n_rows_only + n_skipped == len(merged)
    return 0 if ok and not failed_chunks else 1


if __name__ == "__main__":
    sys.exit(main())
