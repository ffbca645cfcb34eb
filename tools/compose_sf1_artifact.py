"""Compose BENCH_SF1_r{N}.json from tools/run_sf1_study.sh output.

Reads the six bench JSONs in /tmp/sf1_study (lineitem, events, and
documents/embeddings families, each at sf1 and sf0.1), computes total
and per-query sf1/sf0.1 ratios, and writes the committed artifact. Tolerates a
leading non-JSON warning line in the files (conda shell banner).

Usage: python tools/compose_sf1_artifact.py <out.json> "<note>"
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        text = fh.read()
    return json.loads(text[text.index("{"):])


def ratios(sf1: dict, sf01: dict) -> dict:
    per_q = {
        k: round(sf1["queries"][k] / sf01["queries"][k], 2)
        for k in sf1["queries"]
        if sf01["queries"].get(k)
    }
    return {
        "sf1": sf1,
        "sf01_same_subset": sf01,
        "per_query_ratio_sf1_over_sf01": dict(
            sorted(per_q.items(), key=lambda kv: -kv[1])
        ),
        "total_ratio": round(sf1["value"] / sf01["value"], 2),
        "max_query_ratio": max(per_q.values()),
    }


def main() -> int:
    out_path = sys.argv[1]
    note = sys.argv[2] if len(sys.argv) > 2 else ""
    li = ratios(
        load("/tmp/sf1_study/LI_sf1.json"),
        load("/tmp/sf1_study/LI_sf0.1.json"),
    )
    ev = ratios(
        load("/tmp/sf1_study/EV_sf1.json"),
        load("/tmp/sf1_study/EV_sf0.1.json"),
    )
    doc = ratios(
        load("/tmp/sf1_study/DOC_sf1.json"),
        load("/tmp/sf1_study/DOC_sf0.1.json"),
    )
    artifact = {
        "note": note,
        **li,
        "cdc_events_family": ev,
        "documents_embeddings_family": doc,
    }
    for fam in (li, ev, doc):
        assert "errors" not in fam["sf1"], fam["sf1"].get("errors")
        assert "errors" not in fam["sf01_same_subset"]
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(
        f"wrote {out_path}: lineitem {li['total_ratio']}x "
        f"(max {li['max_query_ratio']}x), events {ev['total_ratio']}x "
        f"(max {ev['max_query_ratio']}x), docs/emb {doc['total_ratio']}x "
        f"(max {doc['max_query_ratio']}x)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
