"""Trained text classification on DataFrames: multinomial Naive
Bayes, the classical fast document classifier (fastText-before-
fastText) — model TRAINING and INFERENCE each as a handful of
aggregations, no ML library, no Python in the plan.

Training is two grouped counts (per-(label, token) and per-label),
both map-side combinable and vocabulary-sized — the model is a pair
of DataFrames a pipeline persists like any other table. Inference
scores each document against every label with add-one smoothing:

    score(d, l) = ln P(l) + sum_{t in d} ln((c_{l,t} + 1) / (N_l + V))

and predicts the argmax label.

Determinism discipline (same as llm/quality_lm.py): the per-(doc,
label) sum folds over the document's distinct per-label token counts
in INTEGER (count, token-multiplicity) order, so both engines add
identical values in identical order; cross-engine variance is last-ulp
libm ``ln`` noise, far below any real inter-label score gap. The
argmax orders by (score desc, label asc) so even an exact tie is
deterministic.

Scale: token explosion is per-row; the count join is gram-keyed
(vocabulary-sized right side, broadcastable on real corpora); scoring
shuffles once per (doc, label) aggregation with labels a small
constant. Nothing is quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def train_nb(
    docs: DataFrame,
    *,
    label_col: str = "lang",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, int]:
    """Multinomial-NB model from labeled documents.

    Returns ``(token_counts, label_stats, vocab_size)``:
    ``token_counts`` is ``(label, w, c)``; ``label_stats`` is
    ``(label, n_tokens, n_docs)`` (the smoothing denominator inputs
    and the prior numerator); ``vocab_size`` counts distinct tokens
    across the corpus.
    """
    toks = docs.select(
        F.col(label_col).alias("label"),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    )
    token_counts = toks.groupBy("label", "w").agg(
        F.count(F.lit(1)).alias("c")
    )
    label_stats = token_counts.groupBy("label").agg(
        F.sum("c").alias("n_tokens")
    ).join(
        docs.groupBy(F.col(label_col).alias("label")).agg(
            F.count(F.lit(1)).alias("n_docs")
        ),
        "label",
    )
    vocab_size = token_counts.select("w").distinct().count()
    return token_counts, label_stats, vocab_size


def predict_nb(
    docs: DataFrame,
    token_counts: DataFrame,
    label_stats: DataFrame,
    vocab_size: int,
    *,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(key, predicted_label)`` for every document: the
    highest-scoring label under the trained model (ties broken by
    label order, see module docstring).

    Every (document token, label) pair contributes a smoothed term —
    tokens a label never saw contribute ``ln(1 / (N_l + V))``, which
    the plan realizes as a left join against the label's counts with a
    coalesce-to-zero, crossed with the small label table.
    """
    labels = label_stats.select("label", "n_tokens", "n_docs")
    total_docs = docs.count()

    doc_toks = (
        docs.select(
            F.col(key_col).alias("key"),
            F.explode(F.split(F.col(text_col), " ")).alias("w"),
        )
        .groupBy("key", "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # every (doc-token, label) pair, with the label's count for that
    # token (0 when unseen)
    per_label = (
        doc_toks.crossJoin(F.broadcast(labels))
        .join(token_counts, ["label", "w"], "left")
        .withColumn("c", F.coalesce("c", F.lit(0)))
    )
    term = F.col("n").cast("double") * F.log(
        (F.col("c") + 1).cast("double")
        / (F.col("n_tokens") + F.lit(vocab_size)).cast("double")
    )
    scored = (
        per_label.select(
            "key", "label", "c", "n", term.alias("term"), "n_docs"
        )
        .groupBy("key", "label")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("c", "n", "term"))),
                F.lit(0.0),
                lambda acc, x: acc + x["term"],
            ).alias("loglik"),
            F.first("n_docs").alias("n_docs"),
        )
        .withColumn(
            "score",
            F.col("loglik")
            + F.log(
                F.col("n_docs").cast("double") / F.lit(float(total_docs))
            ),
        )
    )
    w = Window.partitionBy("key").orderBy(
        F.col("score").desc(), F.col("label").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("key", F.col("label").alias("predicted_label"))
    )
