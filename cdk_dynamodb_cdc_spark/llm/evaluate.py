"""Model-evaluation operators: exact ranking AUC and confusion-matrix
metrics, both in overflow-safe 64-bit integer arithmetic so the
driver's bit-exact hash compare works without any float discipline.

Reference scope note: the reference construct (cdk-dynamodb-cdc,
dynamo-stream-handler.ts) has no evaluation surface; these belong to
the north-star LLM-pipeline extension (SURVEY.md §2C) — every data
curation model (quality gate, language classifier, dedup threshold)
needs an eval harness that itself runs at corpus scale.

Scale shape: both operators reduce the corpus in ONE pass to a
statistic-sized frame (distinct score values for AUC, k×k cells for a
confusion matrix) and run every window/join on THAT — never on rows.
A 100-TB corpus with a bounded integer score has thousands of
distinct values; the confusion matrix of a k-class labeler is k²
cells regardless of corpus size. All ppm columns are `(1e6·num) div
den` in long arithmetic (truncating like DuckDB's `//` for the
non-negative ratios emitted here), exact while 1e6·num fits 64 bits —
the same bound every ppm statistic in this engine carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000


def _ppm_expr(num: str, den: str) -> F.Column:
    """`(1e6·num) div den` as exact long arithmetic; NULL when the
    denominator is 0 (mirrored with an explicit CASE in oracle SQL so
    both engines agree on the undefined cells)."""
    return F.expr(
        f"CASE WHEN ({den}) = 0 THEN NULL"
        f" ELSE (CAST({PPM} AS BIGINT) * ({num})) DIV ({den}) END"
    )


def auc_exact(
    scored: DataFrame, score_col: str = "score", label_col: str = "pos"
) -> DataFrame:
    """Exact tie-corrected ROC-AUC of an integer score against a 0/1
    label via the Mann-Whitney rank-sum identity:

        AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺ · n⁻)

    with R⁺ the sum of mid-ranks of the positives. Ties are handled
    exactly by grouping on the score VALUE first: a tied group whose
    ``cnt`` rows start after ``before`` smaller rows has mid-rank
    (2·before + cnt + 1)/2, so 2·R⁺ stays integer and the whole AUC is
    the exact rational auc_num/auc_den plus its truncated ppm.

    The corpus-sized input collapses to one row per DISTINCT score in
    a single map-side-combinable aggregation; the ordering window runs
    over that values-sized frame (documented bound — never over rows),
    and the final fold is a 1-row aggregate. Returns one row:
    n_pos, n_neg, auc_num (= 2R⁺ − n⁺(n⁺+1)), auc_den (= 2n⁺n⁻),
    auc_ppm.
    """
    byv = scored.groupBy(F.col(score_col).alias("s")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(label_col).cast("long")).alias("pos_cnt"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    cum = byv.withColumn(
        "before", F.coalesce(F.sum("cnt").over(w), F.lit(0))
    )
    return (
        cum.agg(
            F.sum("pos_cnt").alias("n_pos"),
            F.sum(F.col("cnt") - F.col("pos_cnt")).alias("n_neg"),
            F.sum(
                F.col("pos_cnt")
                * (F.lit(2) * F.col("before") + F.col("cnt") + F.lit(1))
            ).alias("r2"),
        )
        .select(
            F.col("n_pos").cast("long").alias("n_pos"),
            F.col("n_neg").cast("long").alias("n_neg"),
            (F.col("r2") - F.col("n_pos") * (F.col("n_pos") + 1))
            .cast("long")
            .alias("auc_num"),
            (F.lit(2) * F.col("n_pos") * F.col("n_neg"))
            .cast("long")
            .alias("auc_den"),
        )
        .withColumn("auc_ppm", _ppm_expr("auc_num", "auc_den"))
    )


def confusion_metrics(
    conf: DataFrame,
    actual_col: str = "actual",
    predicted_col: str = "predicted",
    n_col: str = "n",
) -> DataFrame:
    """Per-class precision/recall/F1 plus overall accuracy and Cohen's
    kappa from an already-aggregated confusion matrix (one row per
    (actual, predicted) cell with its count).

    All metrics are exact integer rationals reported in truncated ppm;
    kappa — which can be negative — is instead reported as the exact
    pair kappa_num = N·trace − Σ_c row_c·col_c and kappa_den = N² −
    Σ_c row_c·col_c, sidestepping engine-specific negative integer
    division. Every join here is over the class set (k rows) and the
    k²-cell matrix — constant-sized regardless of the corpus the
    matrix was counted from; the overall row is broadcast onto the
    per-class rows.
    """
    n = F.col(n_col).cast("long")
    # the matrix is k² cells however big the corpus was, but its
    # lineage is a corpus scan — checkpoint once so the three
    # marginalizations below don't re-run it (plan-audit finding)
    conf = conf.localCheckpoint(eager=True)
    rows = conf.groupBy(F.col(actual_col).alias("cls")).agg(
        F.sum(n).alias("row_n")
    )
    cols = conf.groupBy(F.col(predicted_col).alias("cls")).agg(
        F.sum(n).alias("col_n")
    )
    tps = (
        conf.filter(F.col(actual_col) == F.col(predicted_col))
        .groupBy(F.col(actual_col).alias("cls"))
        .agg(F.sum(n).alias("tp"))
    )
    per_class = (
        rows.join(cols, "cls", "full_outer")
        .join(tps, "cls", "left")
        .select(
            "cls",
            F.coalesce(F.col("row_n"), F.lit(0)).alias("row_n"),
            F.coalesce(F.col("col_n"), F.lit(0)).alias("col_n"),
            F.coalesce(F.col("tp"), F.lit(0)).alias("tp"),
        )
        .localCheckpoint(eager=True)  # k rows; feeds totals AND output
    )
    totals = (
        per_class.agg(
            F.sum("row_n").alias("n_total"),
            F.sum("tp").alias("trace"),
            F.sum(F.col("row_n") * F.col("col_n")).alias("pe_num"),
        )
        .select(
            F.col("n_total").cast("long").alias("n_total"),
            F.col("trace").cast("long").alias("trace"),
            (F.col("n_total") * F.col("trace") - F.col("pe_num"))
            .cast("long")
            .alias("kappa_num"),
            (F.col("n_total") * F.col("n_total") - F.col("pe_num"))
            .cast("long")
            .alias("kappa_den"),
        )
        .withColumn("accuracy_ppm", _ppm_expr("trace", "n_total"))
    )
    return (
        per_class.select(
            "cls",
            F.col("tp").cast("long").alias("tp"),
            (F.col("col_n") - F.col("tp")).cast("long").alias("fp"),
            (F.col("row_n") - F.col("tp")).cast("long").alias("fn"),
        )
        .withColumn("precision_ppm", _ppm_expr("tp", "tp + fp"))
        .withColumn("recall_ppm", _ppm_expr("tp", "tp + fn"))
        .withColumn(
            "f1_ppm", _ppm_expr("2 * tp", "2 * tp + fp + fn")
        )
        .crossJoin(F.broadcast(totals))
    )
