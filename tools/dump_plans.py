"""Dump `.explain("formatted")` for named registry queries to files.

Usage:
    python tools/dump_plans.py OUT_DIR SUFFIX name [name ...]

Writes OUT_DIR/<name>_<SUFFIX>.txt per query. Plans are built against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) — the same corpus
the bench times — so PushedFilters/statistics reflect the benched
inputs. Queries whose builder executes eager sub-jobs (k-means/BPE
collect loops, txlog table staging) run those during construction;
the dumped plan is the plan of the RETURNED frame, which is what the
bench's noop write executes.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from cdk_dynamodb_cdc_spark.session import get_spark  # noqa: E402


def main() -> int:
    out_dir, suffix, *names = sys.argv[1:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump_plans")
    registry = entrymod.queries()
    for name in names:
        df = registry[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
