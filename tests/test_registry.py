"""Registry-consistency checks over the query/oracle catalog.

Pure-metadata tests (no Spark session): these catch registration
mistakes — a query without an oracle silently downgrades the driver's
correctness gate to a rows-only check, and a LIMIT without ORDER BY
makes the cross-engine value-hash compare nondeterministic.
"""

from __future__ import annotations

import re

from cdk_dynamodb_cdc_spark.queries import ORACLES, QUERIES

# Queries intentionally registered without an oracle (none today —
# approximate operators carry contract oracles instead; see
# approx_distinct_custkeys / embedding_ann_topk).
NO_ORACLE_ALLOWED: set[str] = set()


def test_every_query_has_an_oracle():
    missing = set(QUERIES) - set(ORACLES) - NO_ORACLE_ALLOWED
    assert not missing, f"queries without oracle_sql entries: {sorted(missing)}"


def test_no_orphan_oracles():
    orphans = set(ORACLES) - set(QUERIES)
    assert not orphans, f"oracles without query functions: {sorted(orphans)}"


def test_query_names_are_stable_identifiers():
    bad = [n for n in QUERIES if not re.fullmatch(r"[a-z][a-z0-9_]*", n)]
    assert not bad, f"non-identifier query names: {bad}"


def test_oracle_limit_always_ordered():
    # LIMIT without ORDER BY returns an engine-dependent row subset,
    # which can never hash-match across Spark and DuckDB.
    unordered = [
        name
        for name, sql in ORACLES.items()
        if re.search(r"\bLIMIT\b", sql, re.I)
        and not re.search(r"\bORDER\s+BY\b", sql, re.I)
    ]
    assert not unordered, f"oracles with LIMIT but no ORDER BY: {unordered}"


def test_oracle_tables_are_registered_views():
    # The driver pre-registers exactly these views; an oracle touching
    # anything else errors at gate time, not review time.
    known = {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    }
    for name, sql in ORACLES.items():
        # -- line comments may sit between a CTE's comma and its name;
        # strip them so the CTE regex sees contiguous SQL
        sql = re.sub(r"--[^\n]*", "", sql)
        # EXTRACT(unit FROM col) is the one FROM that names a column
        scannable = re.sub(
            r"EXTRACT\s*\(\s*\w+\s+FROM\s+\w+\s*\)", "", sql, flags=re.I
        )
        tables = set(
            m.group(2).lower()
            for m in re.finditer(r"\b(FROM|JOIN)\s+([A-Za-z_][A-Za-z0-9_]*)", scannable)
        ) - {"lateral"}  # JOIN LATERAL (subquery) — not a table name
        # names bound by a WITH clause in the same statement are fine
        # (WITH RECURSIVE, column-list CTEs like `reach(node, lbl) AS`,
        # and `AS MATERIALIZED` included)
        ctes = set(
            m.group(1).lower()
            for m in re.finditer(
                r"(?:WITH(?:\s+RECURSIVE)?|,)\s*([A-Za-z_][A-Za-z0-9_]*)"
                r"\s*(?:\([^)]*\))?\s+AS\s*(?:MATERIALIZED\s*)?\(",
                sql,
            )
        )
        # subquery aliases appear as "FROM (" and are skipped by the regex
        unknown = tables - known - ctes
        assert not unknown, f"{name}: oracle references unknown tables {sorted(unknown)}"
