"""Snapshot + squash operator semantics (operators/compaction.py) on a
hand-built change log covering every net-operation branch."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdk_dynamodb_cdc_spark.operators.compaction import (
    snapshot_at,
    squash_change_events,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

REC_SCHEMA = (
    "event_id string, seq long, ts string, operation string, "
    "pk string, sk string, old_image string, new_image string, "
    "size_bytes long"
)


def _img(t, v):
    return '{"event_type":{"S":"%s"},"value":{"N":"%s"}}' % (t, v)


def _log(spark):
    rows = [
        # key A: pre-existing, two MODIFYs; type returns to start, value
        # does not -> net MODIFY touching only value
        ("e2", 2, "2024-01-02 00:00:00", "MODIFY", "A", "S", _img("c", "1.0"), _img("v", "2.0")),
        ("e3", 3, "2024-01-03 00:00:00", "MODIFY", "A", "S", _img("v", "2.0"), _img("c", "3.0")),
        # key B: pre-existing, MODIFYs return every field to the start
        # -> net no-op, suppressed
        ("e5", 2, "2024-01-02 00:00:00", "MODIFY", "B", "S", _img("c", "1.0"), _img("x", "9.0")),
        ("e6", 3, "2024-01-03 00:00:00", "MODIFY", "B", "S", _img("x", "9.0"), _img("c", "1.0")),
        # key C: born and deleted inside the window -> suppressed
        ("e7", 1, "2024-01-01 00:00:00", "INSERT", "C", "S", None, _img("c", "1.0")),
        ("e8", 2, "2024-01-02 00:00:00", "REMOVE", "C", "S", _img("c", "1.0"), None),
        # key D: pre-existing, deleted -> net REMOVE
        ("e9", 2, "2024-01-02 00:00:00", "MODIFY", "D", "S", _img("c", "5.0"), _img("c", "6.0")),
        ("ea", 3, "2024-01-03 00:00:00", "REMOVE", "D", "S", _img("c", "6.0"), None),
        # key E: born in window, lives (even mutates) -> net INSERT
        ("eb", 1, "2024-01-05 00:00:00", "INSERT", "E", "S", None, _img("n", "7.0")),
        ("ec", 2, "2024-01-06 00:00:00", "MODIFY", "E", "S", _img("n", "7.0"), _img("n", "8.0")),
    ]
    return spark.createDataFrame(
        [(eid, seq, ts, op, pk, sk, o, n, 512)
         for eid, seq, ts, op, pk, sk, o, n in rows],
        REC_SCHEMA,
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_squash_net_operations_and_noop_suppression(spark):
    out = {
        r.pk: (r.operation, sorted(r.attributes_changed), r.n_squashed)
        for r in squash_change_events(_log(spark), SCHEMA).collect()
    }
    assert out["A"] == ("MODIFY", ["value"], 2)   # type returned, value didn't
    assert "B" not in out                          # net no-op suppressed
    assert "C" not in out                          # tombstone suppressed
    assert out["D"] == ("REMOVE", ["event_type", "value"], 2)
    assert out["E"] == ("INSERT", ["event_type", "value"], 2)


def test_squash_before_after_hold_net_subtrees(spark):
    rows = {r.pk: r for r in squash_change_events(_log(spark), SCHEMA).collect()}
    assert rows["A"].before == '{"value":1.0}'
    assert rows["A"].after == '{"value":3.0}'
    assert rows["E"].before == "{}"


def test_snapshot_at_cutoff_and_latest(spark):
    log = _log(spark)
    # at Jan 2 EOD: A at v/2.0, B at x/9.0, C dead, D at c/6.0, E not born
    mid = {
        r.pk: (r.n_versions, r.image)
        for r in snapshot_at(log, "2024-01-02 23:59:59").collect()
    }
    assert set(mid) == {"A", "B", "D"}
    assert mid["A"][0] == 1 and '"2.0"' in mid["A"][1]
    # latest: B live at c/1.0, C and D dead, E live at n/8.0
    last = {r.pk: r.image for r in snapshot_at(log).collect()}
    assert set(last) == {"A", "B", "E"}
    assert '"3.0"' in last["A"] and '"1.0"' in last["B"] and '"8.0"' in last["E"]


def test_scd2_history_intervals_and_remove_closes_version(spark):
    """A REMOVE closes the previous version (its ts becomes that
    version's valid_to) and contributes no row; a key deleted last has
    no current version; re-insert after delete opens a fresh one."""
    import datetime

    from cdk_dynamodb_cdc_spark.operators.compaction import scd2_history

    UTC = datetime.timezone.utc

    def t(h):
        return datetime.datetime(2024, 1, 1, h, tzinfo=UTC)

    rows = [
        # key A: insert, modify, delete, re-insert
        ("e1", 1, t(0), "INSERT", "A", "S", None, '{"v": 1}', 64),
        ("e2", 2, t(1), "MODIFY", "A", "S", '{"v": 1}', '{"v": 2}', 64),
        ("e3", 3, t(2), "REMOVE", "A", "S", '{"v": 2}', None, 64),
        ("e4", 4, t(3), "INSERT", "A", "S", None, '{"v": 3}', 64),
        # key B: insert then delete -> no current version at all
        ("e5", 1, t(0), "INSERT", "B", "S", None, '{"v": 9}', 64),
        ("e6", 2, t(1), "REMOVE", "B", "S", '{"v": 9}', None, 64),
    ]
    records = spark.createDataFrame(
        rows,
        "event_id string, seq long, ts timestamp, operation string, "
        "pk string, sk string, old_image string, new_image string, "
        "size_bytes long",
    )
    hist = {
        (r.pk, r.image): (r.valid_from.hour,
                          r.valid_to.hour if r.valid_to else None,
                          r.is_current)
        for r in scd2_history(records).collect()
    }
    assert hist == {
        ("A", '{"v": 1}'): (0, 1, False),
        ("A", '{"v": 2}'): (1, 2, False),   # closed by the REMOVE
        ("A", '{"v": 3}'): (3, None, True),  # re-insert is current
        ("B", '{"v": 9}'): (0, 1, False),   # deleted key: nothing current
    }


def test_scd2_history_matches_python_reference_on_randomized_lifecycles(
    spark,
):
    """Randomized (seeded) lifecycles — inserts, modifies, deletes,
    re-inserts — must yield exactly the intervals a straightforward
    per-key Python fold produces."""
    import datetime
    import random

    from cdk_dynamodb_cdc_spark.operators.compaction import scd2_history

    rng = random.Random(77)
    UTC = datetime.timezone.utc
    t0 = datetime.datetime(2024, 1, 1, tzinfo=UTC)

    rows, eid = [], 0
    for k in range(30):
        pk, alive = f"K#{k}", False
        for _ in range(rng.randint(1, 7)):
            eid += 1
            ts = t0 + datetime.timedelta(minutes=eid)
            if not alive:
                rows.append((f"e{eid}", eid, ts, "INSERT", pk, "S",
                             None, '{"v": %d}' % eid, 64))
                alive = True
            elif rng.random() < 0.3:
                rows.append((f"e{eid}", eid, ts, "REMOVE", pk, "S",
                             '{"v": 0}', None, 64))
                alive = False
            else:
                rows.append((f"e{eid}", eid, ts, "MODIFY", pk, "S",
                             '{"v": 0}', '{"v": %d}' % eid, 64))

    # python reference: per key in (ts, seq) order, each non-REMOVE
    # opens a version closed by the next record's ts
    expected = set()
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r[4], []).append(r)
    for pk, recs in by_key.items():
        recs.sort(key=lambda r: (r[2], r[1]))
        for i, r in enumerate(recs):
            if r[3] == "REMOVE":
                continue
            nxt = recs[i + 1][2] if i + 1 < len(recs) else None
            expected.add((pk, r[7], r[2], nxt, nxt is None))

    records = spark.createDataFrame(
        rows,
        "event_id string, seq long, ts timestamp, operation string, "
        "pk string, sk string, old_image string, new_image string, "
        "size_bytes long",
    )
    got = {
        (r.pk, r.image, r.valid_from.replace(tzinfo=UTC),
         r.valid_to.replace(tzinfo=UTC) if r.valid_to else None,
         r.is_current)
        for r in scd2_history(records).collect()
    }
    assert got == expected and expected


def test_snapshot_diff_classifies_every_reconciliation_branch(spark):
    from cdk_dynamodb_cdc_spark.operators.compaction import snapshot_diff

    # Reuse _log and extend it so every class appears between T1 and T2:
    #   A: alive both, mutated in window      -> CHANGED
    #   B: alive both, image returns to start -> compares equal at the
    #      cutoffs chosen below only if its winning images match; with
    #      T1 before e5 and T2 after e6 the images are _img(c,1.0) both
    #      times -> UNCHANGED
    #   C: born and deleted inside the window -> absent both, suppressed
    #   D: pre-existing, deleted in window    -> REMOVED
    #   E: born in window, lives              -> ADDED
    base = _log(spark)
    pre = spark.createDataFrame(
        [
            ("e1", 1, "2023-12-30 00:00:00", "INSERT", "A", "S", None, _img("c", "1.0"), 512),
            ("e4", 1, "2023-12-30 00:00:00", "INSERT", "B", "S", None, _img("c", "1.0"), 512),
            ("e0", 1, "2023-12-30 00:00:00", "INSERT", "D", "S", None, _img("c", "5.0"), 512),
        ],
        REC_SCHEMA,
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    log = base.unionByName(pre)

    out = snapshot_diff(log, "2023-12-31 00:00:00", "2024-01-10 00:00:00")
    kinds = {r["pk"]: r["change_kind"] for r in out.collect()}
    assert kinds == {
        "A": "CHANGED",
        "B": "UNCHANGED",
        "D": "REMOVED",
        "E": "ADDED",
    }
    versions = {r["pk"]: r["n_new_versions"] for r in out.collect()}
    # A replayed e2+e3 in the window; B replayed e5+e6; E is 2 versions
    # deep at T2 with nothing at T1; D loses its single T1 version.
    assert versions == {"A": 2, "B": 2, "E": 2, "D": -1}


def test_snapshot_diff_identical_cutoffs_all_unchanged(spark):
    from cdk_dynamodb_cdc_spark.operators.compaction import snapshot_diff

    out = snapshot_diff(_log(spark), "2024-01-04 00:00:00", "2024-01-04 00:00:00")
    rows = out.collect()
    assert rows and all(r["change_kind"] == "UNCHANGED" for r in rows)
    assert all(r["n_new_versions"] == 0 for r in rows)


def test_merge_changes_equals_full_replay(spark):
    from cdk_dynamodb_cdc_spark.operators.compaction import (
        merge_changes,
        snapshot_at,
    )

    log = _log(spark)
    cut = "2024-01-02 12:00:00"
    base = snapshot_at(log, cut)
    window = log.filter(F.col("ts") > F.lit(cut))
    merged = merge_changes(base, window)
    replay = snapshot_at(log)
    cols = ["pk", "sk", "image", "seq", "ts", "n_versions"]
    assert sorted(map(tuple, merged.select(*cols).collect())) == sorted(
        map(tuple, replay.select(*cols).collect())
    )


def test_merge_changes_resurrection_restarts_version_count(spark):
    from cdk_dynamodb_cdc_spark.operators.compaction import (
        merge_changes,
        snapshot_at,
    )

    rows = [
        ("r1", 1, "2024-01-01 00:00:00", "INSERT", "R", "S", None, _img("a", "1.0"), 512),
        ("r2", 2, "2024-01-02 00:00:00", "REMOVE", "R", "S", _img("a", "1.0"), None, 512),
        ("r3", 3, "2024-01-05 00:00:00", "INSERT", "R", "S", None, _img("b", "2.0"), 512),
    ]
    log = spark.createDataFrame(rows, REC_SCHEMA).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    cut = "2024-01-03 00:00:00"
    merged = merge_changes(
        snapshot_at(log, cut), log.filter(F.col("ts") > F.lit(cut))
    )
    [row] = merged.collect()
    # Live state agrees with full replay; n_versions restarts at the
    # re-insert (documented deviation — the tombstone emptied the key).
    assert row["image"] == _img("b", "2.0") and row["seq"] == 3
    assert row["n_versions"] == 1
    assert snapshot_at(log).collect()[0]["n_versions"] == 3
