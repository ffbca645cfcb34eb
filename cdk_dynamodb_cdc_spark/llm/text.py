"""Text-analysis operators over the `documents` table (SURVEY.md §2C).

Everything here is pure Column expressions — JVM-side, whole-stage
codegen, zero Python in the hot path, no shuffle (all per-row). At
100 TB these run at parquet-scan speed with the `text` column as the
only wide read.

Cross-engine determinism: wherever a hash feeds an oracle comparison,
the hash is the first 15 hex chars of md5 parsed as a 60-bit integer —
identical in Spark (`conv(substring(md5(x),1,15),16,10)`) and DuckDB
(`('0x' || substr(md5(x),1,15))::BIGINT`), unlike xxhash64/murmur which
exist in only one engine. 60 bits keeps the value inside a signed
64-bit long in both.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SIMHASH_BITS = 60
FINGERPRINT_GRAM_CHARS = 8

# Tiny function-word lists for the lang-id heuristic. Deliberately small:
# the operator demonstrates n-gram/stopword language scoring machinery;
# real deployments would swap in fastText-style wordlists.
LANG_WORDLISTS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "una"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit"],
    "fr": ["le", "les", "et", "des", "une", "dans", "pour"],
}
EN_STOPWORDS = LANG_WORDLISTS["en"]


def tokens(text: Column) -> Column:
    """Whitespace tokenizer: array<string> of words."""
    return F.split(text, " ")


def token_hash60(s: Column) -> Column:
    """Deterministic 60-bit hash of a string, identical in DuckDB.

    DuckDB twin: ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def duck_token_hash60(sql_expr: str) -> str:
    """The DuckDB SQL string computing exactly :func:`token_hash60`."""
    return f"('0x' || substr(md5({sql_expr}), 1, 15))::BIGINT"


def simhash60(toks: Column) -> Column:
    """60-bit SimHash over a token array (with multiplicity).

    Bit i of the output is 1 iff more than half the tokens have bit i
    set in their 60-bit hash (ties -> 0; the majority test ``2*ones >
    n`` is equivalent to ``sum(+/-1 per token) > 0``). Near-duplicate
    documents land within small Hamming distance; see
    dedup.simhash_near_dup_pairs.

    Shape: ONE ``aggregate`` fold over the token-hash array keeps 60
    running bit-sums in an ``array<long>`` — each token hash enters the
    60 sign tests as a lambda VARIABLE, so the md5 subtree is evaluated
    once per token instead of being re-inlined into 60 per-bit filters
    (the naive per-bit ``size(filter(...))`` variant measured ~16x
    slower at sf0.1), and the whole thing is per-row: no shuffle, no
    UDF (an explode + 60-conditional-SUM groupBy variant costs a
    full-corpus shuffle and 60 separate aggregate buffers).
    """
    hashes = F.transform(toks, token_hash60)
    init = F.array_repeat(F.lit(0).cast("long"), SIMHASH_BITS)

    def merge(acc: Column, h: Column) -> Column:
        contribs = F.array(
            *[
                F.when(
                    F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                )
                .otherwise(F.lit(-1))
                .cast("long")
                for i in range(SIMHASH_BITS)
            ]
        )
        return F.zip_with(acc, contribs, lambda x, y: x + y)

    sums = F.aggregate(hashes, init, merge)
    # Assemble the signature from the 60 sums WITHOUT referencing the
    # fold expression 60 times (CollapseProject would re-inline it):
    # zip the sums against their bit positions and sum 2^i weights.
    # pow(2.0, i) is exact for i <= 59 (powers of two in a double).
    weights = F.zip_with(
        sums,
        F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)),
        lambda s, i: F.when(s > 0, F.pow(F.lit(2.0), i).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )
    return F.aggregate(weights, F.lit(0).cast("long"), lambda a, b: a + b)


def duck_simhash60(text_expr: str) -> str:
    """DuckDB SQL computing exactly :func:`simhash60` of
    ``string_split(text_expr, ' ')`` — generated, since 60 bit-sums
    cannot be written by hand sanely."""
    hs = (
        f"list_transform(string_split({text_expr}, ' '), "
        f"w -> ('0x' || substr(md5(w), 1, 15))::BIGINT)"
    )
    terms = [
        f"(CASE WHEN 2 * len(list_filter(hs, h -> (h >> {i}) & 1 = 1)) > len(hs) "
        f"THEN {1 << i}::BIGINT ELSE 0 END)"
        for i in range(SIMHASH_BITS)
    ]
    return f"(SELECT {' + '.join(terms)} FROM (SELECT {hs} AS hs) __sh)"


def doc_fingerprint(text: Column, k: int = FINGERPRINT_GRAM_CHARS) -> Column:
    """Rolling-hash document fingerprint: min 60-bit hash over all
    character k-grams. Equal fingerprints cluster documents sharing
    their minimal k-gram — the single-fingerprint special case of
    winnowing. Per-row, JVM-side."""
    positions = F.sequence(F.lit(1), F.greatest(F.length(text) - (k - 1), F.lit(1)))
    grams = F.transform(positions, lambda i: text.substr(i, F.lit(k)))
    return F.array_min(F.transform(grams, token_hash60))


def duck_doc_fingerprint(text_expr: str, k: int = FINGERPRINT_GRAM_CHARS) -> str:
    """DuckDB SQL twin of :func:`doc_fingerprint`."""
    return (
        f"list_min(list_transform(range(1, greatest(len({text_expr}) - {k - 1}, 1) + 1), "
        f"i -> ('0x' || substr(md5(substr({text_expr}, i, {k})), 1, 15))::BIGINT))"
    )


def _hits(toks: Column, words: list[str]) -> Column:
    return F.size(F.filter(toks, lambda w: w.isin(words)))


def text_quality(text: Column) -> dict[str, Column]:
    """Quality-scoring signals for corpus filtering.

    Returns named Column expressions: token count, char count, mean
    token length, stopword ratio, and a composite quality score. All
    ratios divide integers that are bit-identical across engines, so
    the doubles are too (IEEE division is exact given equal operands).
    """
    toks = tokens(text)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    # single-space separated: token chars = total - (n_tokens - 1)
    mean_token_len = (n_chars - n_tokens + 1).cast("double") / n_tokens
    stop_ratio = _hits(toks, EN_STOPWORDS).cast("double") / n_tokens
    # Favor longer docs (saturating at 80 tokens) with healthy stopword
    # density — the shape of Gopher/C4-style quality rules.
    length_score = F.least(n_tokens, F.lit(80)).cast("double") / F.lit(80.0)
    score = length_score * 0.7 + stop_ratio * 0.3
    return {
        "n_tokens": n_tokens,
        "n_chars_calc": n_chars,
        "mean_token_len": mean_token_len,
        "stopword_ratio": stop_ratio,
        "quality_score": score,
    }


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of function-word hits per language
    (deterministic tie-break by fixed language precedence, zero hits ->
    'und'). Pure Column expressions; the DuckDB twin lives in
    queries.py so the heuristic is oracle-verified."""
    toks = tokens(text)
    hits = {lang: _hits(toks, ws) for lang, ws in LANG_WORDLISTS.items()}
    en, es, de, fr = hits["en"], hits["es"], hits["de"], hits["fr"]
    best = F.greatest(en, es, de, fr)
    return (
        F.when(best == 0, F.lit("und"))
        .when(en == best, F.lit("en"))
        .when(es == best, F.lit("es"))
        .when(de == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )


def duck_lang_id(text_expr: str) -> str:
    """DuckDB SQL twin of :func:`lang_id` (same precedence order)."""
    def hits(words: list[str]) -> str:
        lst = ", ".join(f"'{w}'" for w in words)
        return (
            f"len(list_filter(string_split({text_expr}, ' '), w -> w IN ({lst})))"
        )

    en, es, de, fr = (hits(LANG_WORDLISTS[b]) for b in ("en", "es", "de", "fr"))
    return (
        f"(SELECT CASE WHEN best = 0 THEN 'und' "
        f"WHEN h_en = best THEN 'en' WHEN h_es = best THEN 'es' "
        f"WHEN h_de = best THEN 'de' ELSE 'fr' END "
        f"FROM (SELECT {en} AS h_en, {es} AS h_es, {de} AS h_de, {fr} AS h_fr, "
        f"greatest({en}, {es}, {de}, {fr}) AS best) __l)"
    )


def vocab_top_terms(docs: DataFrame, per_lang: int = 5) -> DataFrame:
    """Corpus vocabulary statistics: the `per_lang` most frequent
    whitespace terms per language — the frequency table tokenizer
    training and stop-word induction start from.

    Shape: explode -> (lang, term) count with map-side partial agg, one
    shuffle on (lang, term); the rank<=N window compiles to a
    window-group-limit (partial per-partition top-N before the lang
    shuffle), so no language's full vocabulary ever sorts globally.
    Ties break on the term string — integer counts + lexicographic
    order keep the result engine-exact.
    """
    from pyspark.sql import Window

    counts = (
        docs.select(
            "lang", F.explode(F.split(F.col("text"), " ")).alias("term")
        )
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("term"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= per_lang)
        .select("lang", "rk", "term", "n")
    )


def tfidf_top_terms(docs: DataFrame, per_doc: int = 3) -> DataFrame:
    """Per-document keyword extraction: the `per_doc` terms with the
    highest tf/df score (term frequency over corpus document
    frequency — the linear-idf TF-IDF variant).

    Why tf/df and not tf*ln(N/df): for a FIXED corpus the two rank
    identically up to idf's monotone transform's tail behavior, and
    tf/df is one IEEE-correctly-rounded division — bit-identical on
    every engine — where ln() carries last-ulp variance across libm
    implementations that could flip a rank at a near-tie. Equal real
    ratios (1/2 vs 2/4) round to the SAME double, and remaining ties
    break on the term string, so the output is fully deterministic.

    Shape: one (doc_id, term) partial-agg shuffle for tf, one (term)
    shuffle for df, a join on term (vocabulary-sized — shuffle join;
    at web scale vocabulary >> memory, so no broadcast), and a
    window-group-limit rank per doc. Stop-word-ish high-df terms sink
    because df divides.
    """
    from pyspark.sql import Window

    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tf = words.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("n_tf")
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    score = F.col("n_tf").cast("double") / F.col("df")
    w = Window.partitionBy("doc_id").orderBy(score.desc(), F.col("term"))
    return (
        tf.join(df, "term")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= per_doc)
        .select("doc_id", "rk", "term", "n_tf", "df")
    )


def build_inverted_index(docs: DataFrame) -> DataFrame:
    """Posting-list construction: one row per distinct (term, doc_id)
    with the within-document term frequency — the inverted index a
    corpus-scale text-search layer is built from.

    Shape: explode -> one (doc_id, term) partial-agg shuffle. The
    output is naturally term-partitionable (write bucketed by term for
    shuffle-free query serving); postings per term are bounded by
    document frequency, never by corpus size, so the index build is
    one map-side-combined aggregation over the corpus — the same plan
    at 500 docs and at 100 TB.
    """
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    return words.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )


def search_conjunctive(
    index: DataFrame, terms: list[str], top_k: int = 20
) -> DataFrame:
    """Conjunctive (AND) search over a posting-list index: documents
    containing EVERY query term, ranked by total query-term frequency.

    Shape: the query-term filter prunes the index to len(terms)
    posting lists BEFORE any shuffle (predicate pushdown on `term` —
    on a term-bucketed index this is a bucket-pruned read of exactly
    len(terms) buckets); the AND is a doc-keyed count==len(terms)
    aggregation over those postings, and the ranking is a sort-limit
    that compiles to TakeOrderedAndProject (distributed partial
    top-k, no global sort). Integer score + doc_id tiebreak keeps the
    result engine-exact.
    """
    n_terms = len(terms)
    hits = index.filter(F.col("term").isin(terms))
    matched = hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms_matched"),
        F.sum("tf").cast("long").alias("score"),
    )
    return (
        matched.filter(F.col("n_terms_matched") == n_terms)
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(top_k)
    )


def sparse_cosine_topk(
    docs: DataFrame,
    *,
    max_df: int = 50,
    top_k: int = 20,
) -> DataFrame:
    """All-pairs sparse cosine similarity over term-frequency vectors,
    served from the inverted index — the classic bag-of-words twin of
    the embedding-cosine lane (`llm/vectors.py`), and the similarity
    the AllPairs/PPJoin literature (Bayardo et al. 2007) prices by
    posting-list length, not by corpus size.

    Semantics: cosine over the PRUNED term space — terms with
    document frequency > ``max_df`` are dropped from vectors AND
    norms before any pair forms. That is the operator's contract, not
    an approximation of something else: high-df (stopword-ish) terms
    are exactly the ones whose posting lists explode the self-join
    quadratically while contributing near-constant mass to every
    pair. With the cap, pair candidates per term are <= max_df^2 and
    the whole join is sum-of-squared-df bounded — corpus growth adds
    terms (Heaps' law), not posting length, so the plan survives
    100 TB.

    Exactness: tf and norms are integers; the score is
    ``cos^2 x 10^12 = (dot^2 * 10^12) div (norm_a * norm_b)`` in
    DECIMAL(38,0) integer division — monotone in cosine for
    non-negative tf, bit-identical in any engine. Ties break on the
    pair ids. Output: (doc_a, doc_b, dot, cos2_ppt), overall top-k by
    score via TakeOrderedAndProject (distributed partial top-k).
    """
    postings = build_inverted_index(docs)
    df = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    kept = (
        postings.join(df.filter(F.col("df") <= max_df), "term")
        .select("term", "doc_id", "tf")
        # read by the norm aggregate AND both self-join sides
        .localCheckpoint(eager=True)
    )
    norms = kept.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("norm2")
    )
    a = kept.select(
        "term", F.col("doc_id").alias("doc_a"), F.col("tf").alias("tf_a")
    )
    b = kept.select(
        "term", F.col("doc_id").alias("doc_b"), F.col("tf").alias("tf_b")
    )
    dots = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("tf_a") * F.col("tf_b")).cast("long").alias("dot"))
    )
    scored = (
        dots.join(
            norms.select(
                F.col("doc_id").alias("doc_a"),
                F.col("norm2").alias("na"),
            ),
            "doc_a",
        )
        .join(
            norms.select(
                F.col("doc_id").alias("doc_b"),
                F.col("norm2").alias("nb"),
            ),
            "doc_b",
        )
        .withColumn(
            "cos2_ppt",
            F.expr(
                "CAST((CAST(dot AS DECIMAL(38,0)) * dot * 1000000000000)"
                " DIV (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)"
            ),
        )
    )
    return (
        scored.orderBy(
            F.col("cos2_ppt").desc(), "doc_a", "doc_b"
        )
        .limit(top_k)
        .select("doc_a", "doc_b", "dot", "cos2_ppt")
    )


def _eq_lit(term: str):
    # a ONE-argument lambda per term: a two-arg lambda (even via a
    # default) would make F.filter bind the second parameter to the
    # array index
    return lambda x: x == F.lit(term)


def bm25_topk(
    docs: DataFrame, terms: list[str], top_k: int = 20
) -> DataFrame:
    """Disjunctive (OR) BM25 ranking over the corpus, FIXED-POINT
    exact so both engines rank identical integers.

    BM25 with k1 = 6/5 and b = 3/4 is a rational function of integer
    corpus statistics (tf, df, dl, N = doc count, L = total tokens):

        idf_lin = (2N - 2df + 1) / (2df + 1)        (rational Robertson
                                                     idf, sans the log —
                                                     same monotone order,
                                                     no libm variance)
        tf'     = 44 * tf * L / (20*tf*L + 6*L + 18*dl*N)
                                                     (k1/b substituted and
                                                     cleared to integers)

    Each per-term score is scaled by 10^6 and floored with integer
    division in DECIMAL(38,0) (numerator magnitude ~ N * tf * L stays
    far inside 38 digits at any realistic corpus), so the per-document
    score is an exact BIGINT sum — bit-stable in any aggregation order,
    in both engines. Output: (doc_id, n_terms_matched, score_fp).

    Shape — NO corpus-sized shuffle anywhere: per-document tf/dl are
    higher-order array expressions (size/filter over the token array,
    never an explode), the corpus statistics (N, L, per-term df) are
    ONE map-side-combined aggregate collapsing to a single broadcast
    row, scoring is pure Column arithmetic over the hit-filtered scan,
    and the ranking compiles to TakeOrderedAndProject (distributed
    partial top-k). The corpus is read twice (stats pass + scoring
    pass), both passes scan-speed; against a term-bucketed inverted
    index the scoring pass becomes a bucket-pruned read instead.
    """
    toks = F.filter(
        F.split(F.col("text"), " "), lambda x: x != F.lit("")
    )
    per_doc = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("dl"),
        *[
            F.size(
                F.filter(toks, _eq_lit(t))
            ).cast("long").alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    # every factor is cast to DECIMAL(38,0) BEFORE multiplying: the
    # numerator reaches ~1e20 at sf0.1 and would overflow a raw int64
    # product; in decimal the chain is exact to 38 digits
    def term_score(i: int):
        num = (
            f"cast(1000000 as decimal(38,0))"
            f" * (2*n_docs - 2*df_{i} + 1) * 44 * tf_{i} * total_len"
        )
        den = (
            f"cast(2*df_{i} + 1 as decimal(38,0))"
            f" * (cast(20 as decimal(38,0))*tf_{i}*total_len"
            f"    + cast(6 as decimal(38,0))*total_len"
            f"    + cast(18 as decimal(38,0))*dl*n_docs)"
        )
        return F.when(
            F.col(f"tf_{i}") > 0, F.expr(f"({num}) div ({den})")
        ).otherwise(F.lit(0)).cast("long")

    any_hit = F.greatest(
        *[F.col(f"tf_{i}") for i in range(len(terms))]
    ) > 0 if len(terms) > 1 else F.col("tf_0") > 0
    matched = sum(
        (F.col(f"tf_{i}") > 0).cast("long") for i in range(len(terms))
    )
    score = sum(term_score(i) for i in range(len(terms)))
    ranked = (
        per_doc.filter(any_hit)
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            matched.alias("n_terms_matched"),
            score.alias("score_fp"),
        )
    )
    return ranked.orderBy(
        F.col("score_fp").desc(), F.col("doc_id")
    ).limit(top_k)


def rrf_fuse(
    rankings: list[DataFrame],
    key_col: str = "doc_id",
    rank_col: str = "rk",
    k: int = 60,
    scale: int = 1_000_000_000,
    top_k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N ranked lists,
    FIXED-POINT exact: each list contributes ``scale div (k + rank)``
    — an exact integer — so the fused score is a BIGINT sum, bit-stable
    in both engines with no float reciprocal in sight.

    Input: DataFrames each carrying ``(key_col, rank_col)`` with ranks
    starting at 1. Output: ``(key, rank_1..rank_N, rrf_fp)`` top-k by
    fused score (absent-from-a-list contributes 0 and reports rank 0).

    Shape: the lists are top-k-bounded by construction (each produced
    by a TakeOrderedAndProject retrieval lane), so the outer joins and
    the final sort all run on k-sized inputs — fusion cost is
    independent of corpus size.
    """
    fused = None
    rank_cols = []
    for i, r in enumerate(rankings):
        contrib = r.select(
            F.col(key_col).alias("key"),
            F.col(rank_col).cast("int").alias(f"rank_{i + 1}"),
            F.expr(
                f"cast({scale} as bigint) div ({k} + {rank_col})"
            ).alias(f"c_{i}"),
        )
        fused = (
            contrib
            if fused is None
            else fused.join(contrib, "key", "full_outer")
        )
        rank_cols.append(f"rank_{i + 1}")
    score = None
    for i in range(len(rankings)):
        c = F.coalesce(F.col(f"c_{i}"), F.lit(0).cast("long"))
        score = c if score is None else score + c
    return (
        fused.select(
            "key",
            *[
                F.coalesce(F.col(rc), F.lit(0)).alias(rc)
                for rc in rank_cols
            ],
            score.alias("rrf_fp"),
        )
        .orderBy(F.col("rrf_fp").desc(), F.col("key"))
        .limit(top_k)
    )


def commonness_score(docs: DataFrame) -> DataFrame:
    """Unigram-LM quality proxy: each document's mean corpus frequency
    per token — high scores flag boilerplate-heavy documents built from
    the corpus's most common words, low scores flag rare-vocabulary
    (often noisy or non-prose) documents. This is the determinism-safe
    stand-in for log-perplexity scoring: every aggregate is an exact
    BIGINT (token counts, per-doc frequency sums), and the score is
    derived with exactly two IEEE double operations at the end, so the
    result is bit-identical across engines — a float log-prob sum would
    depend on summation order and libm.

    Shape: one explode -> (term) count shuffle builds the LM, one join
    back on term (AQE-sized; the vocabulary follows Heaps' law so the
    LM side stays far smaller than the corpus), one per-doc sum. The
    1-row total-token count is broadcast.
    """
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    lm = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = lm.agg(F.sum("cnt").alias("total"))
    per_doc = (
        toks.join(lm, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("cnt").alias("sum_freq"),
        )
    )
    return per_doc.crossJoin(F.broadcast(total)).select(
        "doc_id",
        "n_tokens",
        "sum_freq",
        (
            F.col("sum_freq").cast("double")
            / (
                F.col("n_tokens").cast("double")
                * F.col("total").cast("double")
            )
        ).alias("commonness"),
    )


def pmi_collocations(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 5,
    discount: int = 5,
    threshold_num: int = 1,
    threshold_den: int = 1,
) -> DataFrame:
    """Collocation / phrase mining (word2phrase, Mikolov et al. 2013
    §4): adjacent token pairs whose co-occurrence beats independence —
    ``score(a,b) = (n_ab - discount) * N / (n_a * n_b) > threshold`` —
    are phrase candidates ("new york", "byte pair"). The discount
    suppresses rare accidental pairs; the threshold is the PMI-style
    independence margin. Returns ``(a, b, n_ab, n_a, n_b)`` for every
    passing pair.

    Determinism: the score compare never materializes a float — with
    ``threshold = threshold_num / threshold_den`` the test is the
    integer cross-multiplication ``(n_ab - discount) * N *
    threshold_den > threshold_num * n_a * n_b``, evaluated in
    DECIMAL(38,0) (counts cast to DECIMAL(19,0) first, so the triple
    product stays exact up to 1e38 — comfortably above 100-TB token
    counts squared). No log, no libm, no rounding: the selected set
    hashes bit-identically in any engine.

    Shape: two map-side-combinable aggregations (bigrams over a
    per-document adjacent-pair explode, unigrams over the token
    explode), then the bigram table joins the vocabulary-sized unigram
    table twice (on each side of the pair) — vocabulary-keyed
    shuffles, Heaps'-law small relative to the corpus; the 1-row
    total-token count is broadcast. Pairs touching the empty token
    (doubled separators) are dropped, not bridged, on both engines.
    """
    toks = F.split(F.col(text_col), " ")
    pairs = docs.select(
        F.explode(
            F.filter(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(0))),
                    lambda i: F.struct(
                        F.element_at(toks, i).alias("a"),
                        F.element_at(toks, i + 1).alias("b"),
                    ),
                ),
                lambda p: (p["a"] != "") & (p["b"] != ""),
            )
        ).alias("p")
    )
    bigrams = pairs.groupBy("p.a", "p.b").agg(
        F.count(F.lit(1)).alias("n_ab")
    )
    uni = (
        docs.select(F.explode(toks).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    total = uni.agg(F.sum("n_w").cast("decimal(19,0)").alias("n_total"))
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    return (
        bigrams.join(uni.withColumnRenamed("w", "a"), "a")
        .withColumnRenamed("n_w", "n_a")
        .join(uni.withColumnRenamed("w", "b"), "b")
        .withColumnRenamed("n_w", "n_b")
        .crossJoin(F.broadcast(total))
        .filter(
            (F.col("n_ab") >= min_count)
            & (
                (d19("n_ab") - discount)
                * F.col("n_total")
                * F.lit(threshold_den).cast("decimal(19,0)")
                > F.lit(threshold_num).cast("decimal(19,0)")
                * d19("n_a")
                * d19("n_b")
            )
        )
        .select("a", "b", "n_ab", "n_a", "n_b")
    )


def bpe_merge_candidates(
    docs: Column | "DataFrame",  # noqa: F821 - DataFrame at runtime
    *,
    text_col: str = "text",
    top_n: int = 20,
):
    """The first iteration of byte-pair-encoding tokenizer training:
    corpus-weighted adjacent character-pair frequencies, ranked. BPE
    training repeatedly merges the most frequent adjacent symbol pair;
    this operator computes that ranking for the initial character
    alphabet — the step that decides the first merge rule — as two
    bounded aggregations.

    Output: ``(pair, n_occurrences)``, the ``top_n`` most frequent
    2-character adjacencies (count desc, pair asc — a total order, so
    the cut is deterministic). Counts weight each word by its corpus
    frequency, exactly as BPE training does.

    Scale: the first aggregation reduces the corpus to its vocabulary
    (map-side combinable, vocabulary-sized); the pair explosion runs
    over VOCABULARY rows, not corpus rows — the standard trick that
    makes BPE training corpus-size-independent after one pass. The
    full training loop is this operator iterated with a re-symbolized
    vocabulary; each iteration is the same two-aggregation plan.
    """
    from pyspark.sql import functions as F

    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.length("w") >= 2)
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "n",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "pair")
        .limit(top_n)
    )


BPE_SEP = "\x1f"  # unit separator: never occurs in tokenized text


def _bpe_train_local(
    words: list[tuple[str, int, str]], n_merges: int
) -> tuple[list[tuple[str, str]], list[tuple[str, int, str]]]:
    """Driver-side finish of the BPE merge loop for sub-threshold
    vocabularies — bit-identical to the distributed lane: the same
    separator-string representation, the same left-to-right
    non-overlapping ``str.replace`` (== Column ``replace``), and the
    same (count desc, left asc, right asc) tie-break (Python tuple
    comparison on str == Spark binary UTF8 ordering, both code-point
    order). Pair counts are maintained INCREMENTALLY: only words
    containing the just-merged pair are re-counted, so an iteration
    costs O(changed words), not O(vocabulary) — the classic fast-BPE
    bookkeeping, and what keeps the 65k-row threshold cheap."""
    from collections import Counter

    s2 = BPE_SEP + BPE_SEP

    def pairs_of(s: str) -> list[tuple[str, str]]:
        syms = [x for x in s.split(s2) if x]
        return [(syms[i], syms[i + 1]) for i in range(len(syms) - 1)]

    pc: Counter = Counter()
    for _w, n, s in words:
        for p in pairs_of(s):
            pc[p] += n
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc = +pc  # drop pairs whose count fell to zero after merges
        if not pc:
            break  # every word is a single symbol: nothing to merge
        pa, pb = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((pa, pb))
        old = BPE_SEP + pa + s2 + pb + BPE_SEP
        new = BPE_SEP + pa + pb + BPE_SEP
        for idx, (w, n, s) in enumerate(words):
            if old in s:
                for p in pairs_of(s):
                    pc[p] -= n
                s = s.replace(old, new)
                for p in pairs_of(s):
                    pc[p] += n
                words[idx] = (w, n, s)
    return merges, words


def bpe_train(
    docs,  # DataFrame
    *,
    text_col: str = "text",
    n_merges: int = 32,
    local_finish_threshold: int = 65536,
):
    """The FULL byte-pair-encoding training loop (Sennrich et al.
    2016): iterate ``bpe_merge_candidates``'s most-frequent-pair
    decision ``n_merges`` times, re-symbolizing the vocabulary between
    iterations. Returns ``(merges, vocab_tokens)`` — the ordered merge
    rules ``[(a, b), ...]`` and a DataFrame ``(w, n, syms)`` mapping
    every corpus word to its trained symbol sequence, ready to join
    back onto the corpus for tokenization.

    Representation: each word is a separator-joined symbol string
    (``··a··b··c··`` with ``\\x1f`` separators, doubled BETWEEN
    symbols and at the edges), so applying merge ``(a, b)`` is one
    ``replace('·a··b·' -> '·ab·')`` — left-to-right non-overlapping
    string replacement, which is exactly BPE's greedy merge semantics
    (in ``aaa`` the pair ``(a,a)`` merges once, yielding ``aa, a``),
    and reproduces bit-identically in any engine with the same
    replace semantics (the DuckDB oracle replays the identical loop
    as a recursive CTE). Ties in the best-pair choice break by
    (count desc, left asc, right asc) — a total order, so the merge
    SEQUENCE is deterministic.

    Scale: ONE corpus pass builds the word-count vocabulary; every
    iteration after that is vocabulary-sized (Heaps' law: ~1e7 rows
    at 100 TB, trivially partitioned) — a pair-count aggregation
    (map-side combined), a 1-row driver collect of the winning pair
    (the only driver state: n_merges pairs), and one Column
    ``replace``. localCheckpoint truncates the growing replace
    lineage every few iterations so iteration cost stays O(vocab x
    small-constant), never O(vocab x merges-so-far); materializing
    every iteration would instead pay one extra job per merge.

    When the vocabulary fits under ``local_finish_threshold`` rows,
    the merge loop runs driver-side instead (``_bpe_train_local``,
    bit-identical semantics): the distributed loop costs ~1 job +
    1 collect per merge regardless of data size, so a sub-65k-row
    vocabulary pays n_merges scheduler round-trips to iterate a
    frame that fits in L2 — the same threshold-gated local finisher
    the k-means lane uses. At 100 TB the vocabulary (~1e7) exceeds
    the threshold and the distributed lane runs unchanged.
    """
    from pyspark.sql import functions as F

    s2 = BPE_SEP + BPE_SEP
    vocab = (
        docs.select(
            F.explode(F.split(F.col(text_col), " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "s",
            F.concat(
                F.lit(s2),
                F.regexp_replace(F.col("w"), "(.)", "$1" + s2),
            ),
        )
        # the vocabulary is Heaps'-law small relative to the corpus;
        # folding it onto fewer partitions keeps the per-iteration
        # jobs from being dominated by empty-task scheduling (coalesce
        # = no shuffle; floor of 8 keeps real parallelism when the
        # vocabulary IS large)
        .coalesce(max(docs.sparkSession.sparkContext.defaultParallelism // 4, 8))
        .localCheckpoint()
    )
    if local_finish_threshold and vocab.count() <= local_finish_threshold:
        merges, rows = _bpe_train_local(
            [(r["w"], r["n"], r["s"]) for r in vocab.select("w", "n", "s").collect()],
            n_merges,
        )
        vocab_tokens = docs.sparkSession.createDataFrame(
            [(w, n, [x for x in s.split(s2) if x]) for w, n, s in rows],
            schema="w string, n bigint, syms array<string>",
        )
        return merges, vocab_tokens
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        syms = F.split(F.btrim(F.col("s"), F.lit(BPE_SEP)), s2)
        pairs = vocab.filter(F.size(syms) >= 2).select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(syms) - 1),
                    lambda i: F.struct(
                        F.element_at(syms, i).alias("pa"),
                        F.element_at(syms, i + 1).alias("pb"),
                    ),
                )
            ).alias("p"),
            "n",
        )
        best = (
            pairs.groupBy("p.pa", "p.pb")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "pa", "pb")
            .limit(1)
            .collect()
        )
        if not best:
            break  # every word is a single symbol: nothing to merge
        pa, pb = best[0]["pa"], best[0]["pb"]
        merges.append((pa, pb))
        vocab = vocab.withColumn(
            "s",
            F.replace(
                F.col("s"),
                F.lit(BPE_SEP + pa + s2 + pb + BPE_SEP),
                F.lit(BPE_SEP + pa + pb + BPE_SEP),
            ),
        )
        if len(merges) % 4 == 0:
            vocab = vocab.localCheckpoint()
    vocab_tokens = vocab.select(
        "w",
        "n",
        F.split(F.btrim(F.col("s"), F.lit(BPE_SEP)), s2).alias("syms"),
    )
    return merges, vocab_tokens


def bpe_token_stats(
    docs,  # DataFrame
    *,
    text_col: str = "text",
    group_col: str = "lang",
    n_merges: int = 32,
):
    """Train BPE on the corpus, tokenize the corpus with the trained
    merges, and report integer token counts per ``group_col``:
    ``(group, n_words, n_chars, n_tokens)``. Tokenization is a join
    of corpus word occurrences onto the trained vocabulary (words
    tokenize once, however often they occur — the vocabulary side is
    Heaps'-law small and AQE broadcasts it)."""
    from pyspark.sql import functions as F

    _, vocab_tokens = bpe_train(
        docs, text_col=text_col, n_merges=n_merges
    )
    words = docs.select(
        F.col(group_col),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    ).filter(F.col("w") != "")
    return (
        words.join(vocab_tokens, "w")
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("w")).alias("n_chars"),
            F.sum(F.size("syms")).alias("n_tokens"),
        )
    )


HASH_EMBED_DIM = 64


def hashed_doc_vectors(
    docs,  # DataFrame
    *,
    key_col: str = "doc_id",
    text_col: str = "text",
    dim: int = HASH_EMBED_DIM,
):
    """Feature-hashed bag-of-words document vectors (the HashingTF /
    "hashing trick" embedding, with the sign trick that makes
    collisions unbiased): token t contributes ±1 to dimension
    ``hash(t) % dim``, sign from the next hash bit. No model, no
    vocabulary table — documents embed in one scan, and the output
    plugs straight into the vector family (cosine top-k, LSH, IVF,
    PQ), giving the engine an embed -> search path with zero external
    dependencies.

    Output: ``(key, vec array<long>)`` — INTEGER vectors (signed token
    counts), so downstream cosine ranking is exact arithmetic on
    identical integers in any engine.

    Scale: explode + one (key, dim) aggregation + one per-key
    assembly; map-side combinable, output is corpus-sized rows of
    ``dim`` longs.
    """
    if dim & (dim - 1) != 0:
        raise ValueError(f"dim must be a power of two: {dim}")
    shift = dim.bit_length() - 1
    toks = docs.select(
        F.col(key_col).alias("key"),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    )
    h = token_hash60(F.col("w"))
    # sign from a hash bit ABOVE the dim bits, via exact integer shift
    # (float division would lose bits past 2^53 on a 60-bit hash)
    per_dim = (
        toks.select(
            "key",
            (h % dim).cast("int").alias("d"),
            F.when(F.shiftright(h, shift) % 2 == 0, F.lit(1))
            .otherwise(F.lit(-1))
            .alias("sgn"),
        )
        .groupBy("key", "d")
        .agg(F.sum("sgn").alias("val"))
    )
    as_map = per_dim.groupBy("key").agg(
        F.map_from_entries(
            F.collect_list(F.struct("d", "val"))
        ).alias("mv")
    )
    return as_map.select(
        "key",
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.coalesce(
                F.element_at("mv", i.cast("int")),
                F.lit(0).cast("long"),
            ),
        ).alias("vec"),
    )


WINNOW_GRAM_CHARS = 8
WINNOW_WINDOW = 4


def winnow_fingerprints(
    docs: "DataFrame",
    *,
    key_col: str = "doc_id",
    text_col: str = "text",
    k: int = WINNOW_GRAM_CHARS,
    w: int = WINNOW_WINDOW,
) -> "DataFrame":
    """Winnowed fingerprint rows (Schleimer et al., the MOSS
    algorithm): hash every character k-gram, slide a window of ``w``
    positions, keep each window's MINIMUM hash, dedupe. Returns
    ``(key, fp)`` — one row per distinct fingerprint per document.
    The guarantee that makes this the production span-detector: any
    shared substring of at least ``w + k - 1`` characters yields at
    least one SHARED fingerprint, while only ~2/(w+1) of the gram
    hashes are stored — :func:`doc_fingerprint` is the
    single-fingerprint special case, and the exact rolling-window
    profile (llm/dedup.py:substring_dup_stats) is the
    store-everything end of the same trade-off.

    Shape (r13): entirely MAP-SIDE — zero shuffles. The gram hashes
    materialize once into an array column (one md5 per gram; a
    formulation that re-references the hash EXPRESSION per window
    start re-inlines the md5 transform into every window, going
    quadratic in document length — measured 18x slower at sf0.1),
    then the sliding minimum is the classic sparse-table doubling
    over the array: ceil(log2 w) + 1 zip_with(least) passes against
    shifted slices of the same column, each pass O(grams). The
    previous formulation posexploded every gram and ran a
    (key)-partitioned ROWS window + a global (key, fp) distinct —
    two full-corpus shuffles of one row PER CHARACTER (223M rows at
    sf10), whose local sort/spill went 24x at the sf1 -> sf10 decade;
    the array form keeps each document inside its scan task (the
    per-doc dedup is array_distinct), so the operator's only exchange
    is whatever its consumer does with the (key, fp) rows.
    """
    text = F.col(text_col)
    positions = F.sequence(
        F.lit(1), F.greatest(F.length(text) - (k - 1), F.lit(1))
    )
    hashed = docs.select(
        F.col(key_col).alias("key"),
        F.transform(
            positions,
            lambda i: token_hash60(text.substr(i, F.lit(k))),
        ).alias("h"),
    )
    # sliding min over w consecutive entries (clamped at the array
    # end — out-of-range lookups/pads are NULL and least() ignores
    # nulls, so tail minima cover the available suffix, exactly the
    # truncated-window semantics the short-document branch needs).
    # Small w: one transform with w O(1) get() lookups per position
    # (measured free next to the md5 floor). Large w: sparse-table
    # doubling, ceil(log2 w) + 1 zip_with passes.
    if w < 1:
        raise ValueError(f"winnow window w must be >= 1, got {w}")
    h = F.col("h")
    if w == 1:
        # degenerate window: every gram hash is its own minimum
        # (F.least requires >= 2 columns, so the lookup loop below
        # can't express the identity case)
        m = h
    elif w <= 8:
        m = F.transform(
            F.sequence(F.lit(0), F.size(h) - 1),
            lambda i: F.least(*[F.get(h, i + j) for j in range(w)]),
        )
    else:

        def shifted_min(col, shift):
            return F.zip_with(
                col,
                F.slice(
                    col, shift + 1,
                    F.greatest(F.size(col) - shift, F.lit(0)),
                ),
                lambda a, b: F.least(a, b),
            )

        m = h
        span = 1
        while span * 2 <= w:
            m = shifted_min(m, span)
            span *= 2
        if span < w:
            m = shifted_min(m, w - span)
    # full windows only: starts 1..n-w+1; a doc with fewer than w
    # grams keeps its single truncated window (start 1)
    fps = F.array_distinct(
        F.slice(
            m, 1, F.greatest(F.size("h") - (w - 1), F.lit(1))
        )
    )
    # a NULL text hashes to a single NULL gram (substr over NULL is
    # NULL) — such a document has no substrings, so it owns zero
    # fingerprints; dropping the NULL fp here (map-side, free) keeps
    # every consumer's inner-join/window semantics aligned with the
    # DuckDB twin, whose JOIN USING (fp) never sees NULL rows
    return hashed.select("key", F.explode(fps).alias("fp")).filter(
        F.col("fp").isNotNull()
    )


def duck_winnow_fingerprints(
    text_expr: str,
    k: int = WINNOW_GRAM_CHARS,
    w: int = WINNOW_WINDOW,
) -> str:
    """DuckDB SQL twin of :func:`winnow_fingerprints`."""
    hashes = (
        f"list_transform(range(1, greatest(len({text_expr}) - {k - 1}, 1) + 1), "
        f"i -> ('0x' || substr(md5(substr({text_expr}, i, {k})), 1, 15))::BIGINT)"
    )
    return (
        f"(SELECT list_distinct(list_transform("
        f"range(1, greatest(len(hs) - {w - 1}, 1) + 1), "
        f"s -> list_min(hs[s:s+{w - 1}]))) "
        f"FROM (SELECT {hashes} AS hs) __wf)"
    )
