"""Headline benchmark: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
compact JSON line the driver can parse:

    {"metric": "total_query_wall_sec", "value": N, "unit": "sec",
     "sf": 0.1, "times_cs": [cs, ...], "slowest": {...}, ...}

The driver keeps only the last ~2000 bytes of stdout, so per-query
times travel as a centisecond array in queries() registry order (zip
with list(__spark_entry__.queries()) at the same commit to recover
names); the FULL named map is written to $SPARK_GRAFT_BENCH_FULL
(default /tmp/bench_full.json) and committed per round as
BENCH_LOCAL_r{N}.json.

Each query is materialized with a `noop` sink write so the timing
covers full plan execution, not just plan construction. Warm-up: one
tiny action to absorb JVM/session startup.

Per-query time is the BEST OF 2 runs: the first run of a plan pays
driver-side costs that are constant regardless of data volume (Catalyst
analysis, whole-stage codegen compilation, JIT warm-up of the generated
classes) plus occasional multi-second G1 pauses measured on the test
VM; the second run measures steady-state engine execution, which is the
quantity that scales with data. Both runs execute the complete plan on
the full corpus — nothing is cached between them (no .cache()/persist
anywhere in the engine).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from cdk_dynamodb_cdc_spark.session import engine_env, get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0  # directory name carries no scale factor

    spark = get_spark("bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up

    def calibration() -> dict:
        """Fixed-work probes decomposing host throughput from plan
        changes (r12/r13 bench drift was uniform across unrelated
        queries — the VM suffers intermittent host-level contention):
        a single-thread CPython spin, and 20 no-op Spark jobs
        measuring scheduler round-trip cost. Identical code each
        round, so drift in THESE numbers is the machine, not the
        engine."""
        t0 = time.perf_counter()
        x = 0
        for i in range(10_000_000):
            x += i
        spin = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(20):
            spark.range(1).count()
        sched = time.perf_counter() - t0
        return {
            "spin_1t_sec": round(spin, 3),
            "sched_20jobs_sec": round(sched, 3),
        }

    cal_pre = calibration()

    def steal_jiffies() -> int | None:
        """Cumulative hypervisor-steal jiffies across all CPUs
        (/proc/stat cpu line, field 9; USER_HZ=100 so jiffies/100 =
        stolen cpu-seconds). The r14 round proved the spin probes
        bracket a run but cannot see MID-run steal bursts (one burst
        inflated iterative many-stage queries 10-22x while both
        bracketing spins read quiet); sampling the counter at each
        query boundary attributes the burst to the queries it hit."""
        try:
            with open("/proc/stat") as fh:
                return int(fh.readline().split()[8])
        except (OSError, IndexError, ValueError):
            return None

    runs_per_query = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    # Optional subset (comma-separated names) for scale studies — e.g.
    # the lineitem-family run at sf1, where doc/embedding queries would
    # just re-measure sf0.1-sized tables.
    only = {
        q
        for q in os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "").split(",")
        if q
    }
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    steal_per_query: dict[str, int] = {}
    steal_start = steal_jiffies()
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        best = float("inf")
        s0 = steal_jiffies()
        try:
            for _ in range(runs_per_query):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                # Force full execution of every operator in the plan; a
                # bare count() could prune computed columns, so write the
                # materialized result to the noop sink instead.
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
        except Exception as exc:  # one broken query must not zero the run
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            continue
        timings[name] = round(best, 3)
        s1 = steal_jiffies()
        if s0 is not None and s1 is not None:
            # steal during THIS query's full measurement window (all
            # runs_per_query executions, so ~2x the best-of wall)
            steal_per_query[name] = s1 - s0

    total = round(sum(timings.values()), 3)
    steal_end = steal_jiffies()
    steal_total = (
        steal_end - steal_start
        if steal_start is not None and steal_end is not None
        else None
    )
    cal_post = calibration()
    # Calibration-normalized total (r14, verdict item 3): the r12/r13
    # rounds proved the driver window can sit on a host contended up
    # to 2.4x on a fixed single-thread spin, so raw wall-clock alone
    # can read as an engine regression when it's machine state. The
    # fixed-work spin is proportional to CPU-time dilution, so
    # raw * (QUIET_SPIN / measured_spin) estimates the quiet-window
    # total. The factor is clipped at 1.0 — normalization may only
    # CORRECT a contended window, never flatter a fast one — and both
    # raw and normalized travel in the driver tail so a future reader
    # compares like with like.
    QUIET_SPIN = 0.306  # BENCH_LOCAL_r13 quiet-window probe (secs)
    spin_mean = (cal_pre["spin_1t_sec"] + cal_post["spin_1t_sec"]) / 2
    cal_factor = min(1.0, QUIET_SPIN / spin_mean) if spin_mean > 0 else 1.0
    total_norm = round(total * cal_factor, 3)
    # FULL named per-query map + env fingerprint -> sidecar file (the
    # committed BENCH_LOCAL artifacts are produced from this).
    full = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_timed": len(timings),
        "queries_registered": len(entrymod.queries()),
        "runs_per_query": runs_per_query,
        "sf": sf,
        "env": engine_env(spark),
        "calibration": {"pre": cal_pre, "post": cal_post},
        "quiet_spin_baseline_sec": QUIET_SPIN,
        "cal_factor": round(cal_factor, 4),
        "value_cal_norm": total_norm,
        # hypervisor steal attributed per query window (jiffies across
        # all CPUs, USER_HZ=100: /100 = stolen cpu-seconds). A query
        # whose time looks regressed but whose steal entry is hot was
        # hit by the host, not by a plan change.
        "steal_total_jiffies": steal_total,
        "steal_jiffies": steal_per_query,
    }
    if errors:
        full["errors"] = errors
        full["value_incomparable_due_to_errors"] = True
    full_path = os.environ.get(
        "SPARK_GRAFT_BENCH_FULL", "/tmp/bench_full.json"
    )
    try:
        with open(full_path, "w") as fh:
            json.dump(full, fh, indent=2)
    except OSError:
        full_path = None
    # The driver records only the LAST ~2000 bytes of stdout and
    # json-parses them; a 269-entry named map is ~10 KB, so the r10
    # artifact's tail was front-truncated and unparseable. Emit ONE
    # compact line instead: per-query times as centiseconds in
    # queries() registry order (names are recoverable by zipping with
    # list(queries()) at the same commit), plus the named slowest-5.
    # null placeholders keep positional alignment with the registry even
    # when a query errored or a SPARK_GRAFT_BENCH_QUERIES subset ran —
    # otherwise zip(list(queries()), times_cs) silently misnames every
    # entry after the first gap.
    times_cs = [
        int(round(timings[name] * 100)) if name in timings else None
        for name in entrymod.queries()
    ]
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:5]
    )
    out = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        # host-contention correction: raw * min(1, quiet_spin/spin);
        # cal_spin = [pre, post] fixed-work probe seconds (quiet
        # baseline 0.306 s) — see bench.py for the full derivation
        "value_cal_norm": total_norm,
        "cal_spin": [
            cal_pre["spin_1t_sec"],
            cal_post["spin_1t_sec"],
        ],
        # total hypervisor steal during the timed section (jiffies,
        # all CPUs, /100 = cpu-sec); per-query map in full_json
        "steal_total_jiffies": steal_total,
        "sf": sf,
        "queries_timed": len(timings),
        "queries_registered": len(entrymod.queries()),
        "runs_per_query": runs_per_query,
        # zip with list(queries()) at this commit; null = untimed
        "query_order": "registry; null=untimed",
        "times_cs": times_cs,
        "slowest": slowest,
        "full_json": full_path,
    }
    if errors:
        out["value_incomparable_due_to_errors"] = True
        out["n_errors"] = len(errors)
    line = json.dumps(out, separators=(",", ":"))
    if len(line) > 1900:  # drop detail until the driver's tail fits
        out.pop("slowest", None)
        line = json.dumps(out, separators=(",", ":"))
    if len(line) > 1900:
        out.pop("times_cs", None)
        line = json.dumps(out, separators=(",", ":"))
    print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
