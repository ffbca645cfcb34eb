"""Corpus-cleaning signals for training-data pipelines (SURVEY.md §2C).

Two families, both standard pretraining-curation filters:

* Within-document repetition (the Gopher "repetition" heuristics —
  Rae et al., "Scaling Language Models: ... Gopher", 2021, §A1.1):
  the fraction of a document's n-gram positions occupied by n-grams
  that occur more than once in that document. High values flag
  degenerate/boilerplate-heavy text. Pure per-row Column expressions:
  zero Python, zero shuffle, scan-speed at 100 TB.

* Cross-document boilerplate (the C4 line-dedup rule — Raffel et al.,
  JMLR 2020, §2.2 — lifted from lines to word k-grams, since the test
  corpus has no newlines; k=4 keeps the rule selective while flagging
  a meaningful corpus slice at test scale): a k-gram appearing in >= min_docs distinct
  documents is boilerplate; each document reports what fraction of its
  distinct k-grams are boilerplate. Shape: one document-frequency
  aggregation keyed by the 60-bit gram hash (map-side partial agg),
  one join back to postings, one per-doc count — grams travel as
  16-byte hashed rows, never as strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdk_dynamodb_cdc_spark.llm.dedup import word_shingles
from cdk_dynamodb_cdc_spark.llm.text import token_hash60

REPETITION_GRAM_WORDS = 2
BOILERPLATE_GRAM_WORDS = 4
BOILERPLATE_MIN_DOCS = 3


def duplicated_gram_fraction(text: Column, k: int = REPETITION_GRAM_WORDS) -> Column:
    """Fraction of word k-gram positions whose k-gram occurs more than
    once within the document (0.0 for docs with no k-grams).

    Row-local O(g log g): sort the gram array once, then a position's
    gram occurs exactly once iff it differs from both sorted
    neighbors — so duplicated positions = g - singletons, counted with
    one indexed filter pass. (The naive per-gram membership count is
    O(g^2) per row; harmless on hundred-token test docs but 10^10
    comparisons for a single 100k-token document, which would make one
    long row stall an executor core at corpus scale.) Still zero
    shuffle, zero Python; parallelism is per-row.
    """
    grams = word_shingles(text, k, distinct=False)
    n = F.size(grams)
    # Sort 64-bit gram hashes, not gram strings: equality of grams <=>
    # equality of hashes (2^-64 collision odds), and long comparisons
    # make the sort cheap. xxhash64 needs no cross-engine twin — the
    # hashes never leave the expression. Singletons are then counted
    # with ONE run-length aggregate pass that references the sorted
    # array exactly once: a neighbor-lookup formulation
    # (element_at(s, i±1) inside a lambda) re-inlines the whole
    # sort+hash subtree per element — measured ~10x the entire rest of
    # the query.
    s = F.array_sort(F.transform(grams, lambda g: F.xxhash64(g)))
    init = F.struct(
        F.lit(None).cast("long").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("singles"),
    )

    def merge(acc, x):
        new_run = ~x.eqNullSafe(acc["prev"])
        return F.struct(
            x.alias("prev"),
            F.when(new_run, F.lit(1)).otherwise(acc["run"] + 1).alias("run"),
            (
                acc["singles"]
                + F.when(new_run & (acc["run"] == 1), 1).otherwise(0)
            ).alias("singles"),
        )

    singletons = F.aggregate(
        s,
        init,
        merge,
        lambda acc: acc["singles"]
        + F.when(acc["run"] == 1, 1).otherwise(0),
    )
    return F.when(
        n > 0, (n - singletons).cast("double") / n
    ).otherwise(F.lit(0.0))


def duck_duplicated_gram_fraction(text_expr: str, k: int = REPETITION_GRAM_WORDS) -> str:
    """DuckDB SQL twin of :func:`duplicated_gram_fraction`."""
    ws = f"string_split({text_expr}, ' ')"
    parts = " || ' ' || ".join(f"ws[i+{j}]" for j in range(k))
    grams = (
        f"(SELECT list_transform(range(1, len(ws) - {k - 1} + 1), i -> {parts}) "
        f"FROM (SELECT {ws} AS ws) __w)"
    )
    return (
        f"(SELECT CASE WHEN len(gs) > 0 THEN "
        f"len(list_filter(gs, g -> len(list_filter(gs, h -> h = g)) > 1))"
        f"::DOUBLE / len(gs) ELSE 0.0 END FROM (SELECT {grams} AS gs) __g)"
    )


def boilerplate_gram_stats(
    docs: DataFrame,
    k: int = BOILERPLATE_GRAM_WORDS,
    min_docs: int = BOILERPLATE_MIN_DOCS,
) -> DataFrame:
    """Per-document boilerplate exposure: of the document's distinct
    word k-grams, how many appear in >= ``min_docs`` distinct documents
    corpus-wide. Returns (doc_id, n_grams, n_boilerplate,
    boilerplate_frac); the fraction is int/int so it is bit-identical
    across engines.

    Documents with fewer than k tokens have no k-grams and report
    (0, 0, 0.0) rather than disappearing — a curation pipeline must
    not silently drop rows it could not score.
    """
    # Materialize the hashed-gram table once: `posts` feeds BOTH the
    # document-frequency aggregation and the join back, and Spark
    # re-evaluates an unmaterialized subplan per consuming branch —
    # the same measured-3x re-evaluation ngram_jaccard_pairs documents
    # (llm/dedup.py). ~8 bytes per gram occurrence, no text.
    grams = docs.select(
        "doc_id",
        F.transform(word_shingles(F.col("text"), k), token_hash60).alias("gs"),
    ).localCheckpoint(eager=True)
    posts = grams.select("doc_id", F.explode("gs").alias("g"))
    # df counts distinct docs per gram; postings are distinct-per-doc
    # already (word_shingles dedups), so a plain count equals the
    # distinct-doc count without a count_distinct expand.
    boiler = (
        posts.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("g", F.lit(1).alias("is_boiler"))
    )
    per_doc = (
        posts.join(boiler, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("is_boiler"), F.lit(0))).alias("n_boilerplate"),
        )
    )
    all_docs = docs.select("doc_id")
    return (
        all_docs.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("int").alias("n_grams"),
            F.coalesce(F.col("n_boilerplate"), F.lit(0))
            .cast("int")
            .alias("n_boilerplate"),
            F.when(
                F.coalesce(F.col("n_grams"), F.lit(0)) > 0,
                F.coalesce(F.col("n_boilerplate"), F.lit(0)).cast("double")
                / F.col("n_grams"),
            )
            .otherwise(F.lit(0.0))
            .alias("boilerplate_frac"),
        )
    )


# --- PII scrubbing ---------------------------------------------------------

# Patterns kept to the Java-regex/RE2 common dialect (no lookaround, no
# backrefs) so the Spark plan and a DuckDB oracle match byte-for-byte.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}
PII_TOKENS = {"email": "[EMAIL]", "phone": "[PHONE]", "ipv4": "[IP]"}


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact PII-shaped spans (emails, NANP-style phone numbers,
    IPv4 addresses) from `text_col`, the standard pre-training scrub.

    Adds `n_email`/`n_phone`/`n_ipv4` (match counts on the ORIGINAL
    text) and replaces `text_col` with the redacted form, each span
    collapsed to its category token. Counts before replacement so a
    pattern can never eat another's span first ([EMAIL] etc. contain
    no digits, so sequential replacement is order-independent on the
    redacted text anyway).

    Pure per-row Column regex — zero shuffle, scan-speed; at 100 TB
    this is a mapper fused into whatever scan feeds it. Real pipelines
    extend PII_PATTERNS (SSNs, IBANs, street addresses) without
    touching the shape.
    """
    out = df
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)),
        )
    scrubbed = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        scrubbed = F.regexp_replace(scrubbed, pat, PII_TOKENS[name])
    return out.withColumn(text_col, scrubbed)
