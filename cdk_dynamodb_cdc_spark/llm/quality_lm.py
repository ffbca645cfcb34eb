"""Statistical language-model quality filtering (the CCNet/Gopher
"perplexity filter" stage): train an n-gram LM on the corpus itself,
score every document by its per-token log-likelihood, drop the tail.

Production pipelines run a pretrained KenLM; this module builds the
same decision from first principles as two DataFrame aggregations —
no external model artifact, same plan shape as a broadcast-scored
KenLM pass:

* :func:`train_bigram_lm` — corpus unigram + bigram counts (one
  map-side-combined aggregation each; output is vocabulary-sized, the
  only shuffles in the stage).
* :func:`doc_logprob_scores` — per-document average bigram
  log-likelihood under add-one smoothing, via a gram-keyed join of
  each document's bigrams against the count tables.

Determinism discipline (so scores hash-compare against a DuckDB twin):
the per-document sum folds over the document's DISTINCT (bigram-count,
unigram-count) integer pairs in (c2, c1) integer order — both engines
fold the same values in the same order, so the only cross-engine
variance is last-ulp libm ``ln`` noise, ~1e-13 relative after a
hundred-term sum. Scores are therefore compared through DECISIONS
(keep/drop at a threshold, rankings with id tiebreaks), never raw
floats; two documents' scores essentially never sit within 1e-13 of
each other unless their texts are identical, in which case both
engines compute identical sums and the id breaks the tie.

Scale shape: counts are vocabulary-sized (bounded by distinct grams,
not corpus size) and map-side combinable; scoring is one explode +
two gram-keyed joins (the unigram side is vocabulary-sized and
broadcastable on real corpora) + one per-doc aggregation. Nothing is
quadratic; no Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# non-printable separator: cannot appear inside whitespace-split tokens
_SEP = "\x01"


def train_bigram_lm(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """Corpus counts for an add-one-smoothed bigram LM.

    Returns ``(unigrams, bigrams, vocab_size)``: ``unigrams`` is
    ``(w, c1)``, ``bigrams`` is ``(w1w2 key, c2)``, ``vocab_size`` the
    distinct-unigram count (the smoothing denominator constant).
    """
    toks = docs.select(F.split(F.col(text_col), " ").alias("ws"))
    uni = (
        toks.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    bg = toks.select(
        F.explode(
            F.expr(
                f"transform(slice(ws, 1, size(ws) - 1), "
                f"(w, i) -> concat(w, '{_SEP}', ws[i + 1]))"
            )
        ).alias("bg")
    )
    bgc = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    vocab_size = uni.count()
    return uni, bgc, vocab_size


def doc_logprob_scores(
    docs: DataFrame,
    *,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document average bigram log-likelihood under the corpus's
    own add-one-smoothed bigram LM.

    Output: ``(key, n_bigrams, avg_logprob)`` for every document with
    at least one bigram. ``avg_logprob`` is
    ``sum(ln((c2+1)/(c1+V))) / n_bigrams`` over the document's
    bigrams, folded in deterministic integer (c2, c1) order (see
    module docstring). Low scores = improbable token sequences = the
    gibberish/boilerplate tail a perplexity filter removes.
    """
    uni, bgc, v = train_bigram_lm(docs, text_col)

    toks = docs.select(
        F.col(key_col).alias("key"),
        F.split(F.col(text_col), " ").alias("ws"),
    )
    pairs = toks.select(
        "key",
        F.explode(
            F.expr(
                f"transform(slice(ws, 1, size(ws) - 1), "
                f"(w, i) -> struct(w as w1, concat(w, '{_SEP}', "
                f"ws[i + 1]) as bg))"
            )
        ).alias("p"),
    ).select("key", F.col("p.w1").alias("w1"), F.col("p.bg").alias("bg"))

    scored = (
        pairs.join(bgc, "bg")  # every doc bigram exists in the corpus LM
        .join(uni, pairs.w1 == uni.w)
        .groupBy("key", "c2", "c1")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    term: Column = F.col("n").cast("double") * F.log(
        (F.col("c2") + 1).cast("double") / (F.col("c1") + F.lit(v)).cast("double")
    )
    per_doc = (
        scored.select("key", "c2", "c1", term.alias("term"), "n")
        .groupBy("key")
        .agg(
            # deterministic fold: sort the (c2, c1, term) triples by
            # their INTEGER keys, then sum sequentially — both engines
            # add the same values in the same order
            F.aggregate(
                F.sort_array(
                    F.collect_list(F.struct("c2", "c1", "term"))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["term"],
            ).alias("logprob"),
            F.sum("n").alias("n_bigrams"),
        )
    )
    return per_doc.select(
        F.col("key"),
        F.col("n_bigrams"),
        (F.col("logprob") / F.col("n_bigrams")).alias("avg_logprob"),
    )


def perplexity_filter(
    docs: DataFrame,
    *,
    key_col: str = "doc_id",
    text_col: str = "text",
    min_avg_logprob: float = -9.0,
) -> DataFrame:
    """Keep/drop decision per document: ``(key, n_bigrams, kept)``,
    ``kept`` = average bigram log-likelihood at or above the floor.
    The threshold is in ln units (KenLM pipelines threshold perplexity
    = exp(-avg_logprob); ``min_avg_logprob = -9`` is perplexity
    ~8100)."""
    return doc_logprob_scores(
        docs, key_col=key_col, text_col=text_col
    ).select(
        "key",
        "n_bigrams",
        (F.col("avg_logprob") >= F.lit(min_avg_logprob)).alias("kept"),
    )


def kn_bigram_scores(
    docs: DataFrame,
    *,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document INTERPOLATED KNESER-NEY bigram probability scores
    — the smoothing real LM filters (KenLM) actually use, as exact
    integer arithmetic end to end (unlike the add-one lane's
    float-fold, nothing here depends on libm).

    With discount d = 3/4, the KN probability of bigram (v, w) is

        p(w|v) = max(c(vw) - d, 0) / c(v.)
               + (d * N1+(v.) / c(v.)) * N1+(.w) / B

    where c(v.) = bigram tokens starting with v, N1+(v.) = distinct
    continuations of v, N1+(.w) = distinct left contexts of w, and
    B = total distinct bigram types (so p_cont(w) = N1+(.w)/B).
    Clearing denominators (all corpus bigrams have c >= 1):

        p = ((4*c2 - 3) * B + 3 * Nv * Nw) / (4 * c1v * B)

    an exact rational; each token's probability is floored to PPB
    (scale 10^9) in DECIMAL(38,0) — numerators reach ~1e20, past
    int64 — and summed per document as exact BIGINTs. Output:
    ``(key, n_bigrams, sum_prob_ppb, mean_prob_ppb)``.

    Scale shape: the model is four vocabulary-sized aggregates
    (bigram counts; per-left-context totals + continuation fan-out;
    per-right-word context fan-out; one 1-row type total, broadcast).
    Scoring is one explode + gram-keyed joins (model sides
    vocabulary-sized, broadcastable on real corpora) + one per-doc
    aggregation. Nothing quadratic, no Python, no floats.
    """
    toks = docs.select(
        F.col(key_col).alias("key"),
        F.split(F.col(text_col), " ").alias("ws"),
    )
    pairs = toks.select(
        "key",
        F.explode(
            F.expr(
                "transform(slice(ws, 1, size(ws) - 1), "
                "(w, i) -> struct(w as v, ws[i + 1] as w))"
            )
        ).alias("p"),
    ).select("key", F.col("p.v").alias("v"), F.col("p.w").alias("w"))

    bgc = pairs.groupBy("v", "w").agg(F.count(F.lit(1)).alias("c2"))
    left = bgc.groupBy("v").agg(
        F.sum("c2").alias("c1v"), F.count(F.lit(1)).alias("nv")
    )
    right = bgc.groupBy("w").agg(F.count(F.lit(1)).alias("nw"))
    btot = bgc.agg(F.count(F.lit(1)).alias("b"))

    scored = (
        pairs.join(bgc, ["v", "w"])  # every doc bigram is in the model
        .join(left, "v")
        .join(right, "w")
        .crossJoin(F.broadcast(btot))
    )
    num = (
        (4 * F.col("c2") - 3).cast("decimal(38,0)") * F.col("b")
        + (3 * F.col("nv")).cast("decimal(38,0)") * F.col("nw")
    ) * F.lit(10**9).cast("decimal(19,0)")
    den = (4 * F.col("c1v")).cast("decimal(38,0)") * F.col("b")
    ppb = ((num - F.pmod(num, den)) / den).cast("long")
    return (
        scored.select("key", ppb.alias("ppb"))
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("ppb").alias("sum_prob_ppb"),
        )
        .select(
            "key",
            "n_bigrams",
            "sum_prob_ppb",
            F.expr("sum_prob_ppb div n_bigrams").alias(
                "mean_prob_ppb"
            ),
        )
    )
