"""Exact ranking-evaluation metrics over scored, labeled rows.

The missing last mile of the link-prediction / classifier-filter /
retrieval operators: once a model scores a table, the pipeline should
grade it WITHOUT collecting scores to the driver (sklearn on a 10^10-row
score table is not a plan).

ROC AUC here uses the pair-counting identity

    AUC = [ #(pos, neg) pairs with s_pos > s_neg
            + 0.5 * #(pos, neg) pairs with s_pos = s_neg ] / (P * N)

computed from per-DISTINCT-SCORE positive/negative counts and one
running sum — never from the O(P*N) pair join and never from a
full-table sort.  Scores are rounded to ``decimals`` first (ties at
engine float noise become real ties), which also BOUNDS the distinct-
score table: at 6 decimals in [0, 1] that is <= 10^6 + 1 rows no matter
how many input rows there are, so the one ordered window in the rollup
runs over a provably small frame — the aggregate does the 10^12-row
work, the window grades the summary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def auc_score(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    decimals: int = 6,
) -> DataFrame:
    """-> one row (n_pos, n_neg, auc): exact ROC AUC of ``score_col``
    against binary ``label_col`` (1 = positive), ties counted half per
    the Mann-Whitney U convention.  AUC rounded to ``decimals``.

    Scale: one hash aggregate on the rounded score (map-side partials
    absorb hot scores), then a window over the distinct-score summary
    (bounded by 10^decimals + 1 rows — see module docstring), then one
    scalar aggregate.
    """
    s = F.round(F.col(score_col).cast("double"), decimals)
    pos = F.col(label_col).cast("int")
    per_score = scored.groupBy(s.alias("_s")).agg(
        F.sum(pos).alias("np"),
        F.sum(1 - pos).alias("nn"),
    )
    w = Window.orderBy(F.col("_s").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    won = per_score.select(
        "np",
        "nn",
        (F.col("np") * F.coalesce(F.sum("nn").over(w), F.lit(0))).alias("_won"),
        (F.col("np") * F.col("nn")).alias("_tie"),
    )
    return won.agg(
        F.sum("np").alias("n_pos"),
        F.sum("nn").alias("n_neg"),
        F.round(
            (F.sum("_won") + 0.5 * F.sum("_tie"))
            / (F.sum("np") * F.sum("nn")),
            decimals,
        ).alias("auc"),
    )


def precision_recall_at_k(
    run: DataFrame,
    truth: DataFrame,
    query_col: str,
    id_col: str,
    score_col: str,
    k: int,
    decimals: int = 6,
) -> DataFrame:
    """Per-query precision@k / recall@k of a ranked ``run`` against a
    ``truth`` relevance set (query_col, id_col).  Rank = row_number by
    (score desc, id asc) WITHIN each query — a per-query window over
    the run's rows for that query (runs are top-k-ish result lists;
    if a query somehow carries the whole corpus, cut it first).

    One window keyed on the query + one left-semi-style join against
    truth + one per-query aggregate; the truth row count per query
    rides the same aggregate via a second join.
    """
    w = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    topk = run.withColumn("_rnk", F.row_number().over(w)).filter(
        F.col("_rnk") <= k
    )
    hits = topk.join(truth.select(query_col, id_col).distinct(),
                     [query_col, id_col], "left_semi")
    n_hits = hits.groupBy(query_col).agg(F.count("*").alias("n_hits"))
    n_rel = (
        truth.select(query_col, id_col)
        .distinct()
        .groupBy(query_col)
        .agg(F.count("*").alias("n_rel"))
    )
    return (
        n_rel.join(n_hits, query_col, "left")
        .select(
            query_col,
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            "n_rel",
            F.round(F.coalesce("n_hits", F.lit(0)) / F.lit(float(k)), decimals)
            .alias("precision_at_k"),
            F.round(
                F.coalesce("n_hits", F.lit(0)) / F.col("n_rel").cast("double"),
                decimals,
            ).alias("recall_at_k"),
        )
    )


def ndcg_at_k(
    run: DataFrame,
    truth: DataFrame,
    query_col: str,
    id_col: str,
    score_col: str,
    k: int,
    gain_col: str | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Per-query nDCG@k (Jarvelin & Kekalainen, TOIS'02) of a ranked
    ``run`` against ``truth`` (query_col, id_col[, gain_col]) — binary
    gains when ``gain_col`` is None.

    DCG uses the standard gain/log2(rank+1) form; the ideal DCG ranks
    the truth set by gain desc (ties by id) — both windows run over
    bounded lists (top-k runs; per-query truth sets), the same contract
    as precision_recall_at_k.  Queries with an empty truth set are
    absent from the output (nDCG undefined).
    """
    g = F.col(gain_col) if gain_col else F.lit(1.0)
    w_run = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    topk = run.withColumn("_rnk", F.row_number().over(w_run)).filter(
        F.col("_rnk") <= k
    )
    rel = truth.select(
        query_col, id_col, g.cast("double").alias("_gain")
    ).distinct()
    dcg = (
        topk.join(rel, [query_col, id_col])
        .groupBy(query_col)
        .agg(
            F.sum(F.col("_gain") / F.log2(F.col("_rnk") + 1.0)).alias("_dcg")
        )
    )
    w_ideal = Window.partitionBy(query_col).orderBy(
        F.col("_gain").desc(), F.col(id_col).asc()
    )
    idcg = (
        rel.withColumn("_rnk", F.row_number().over(w_ideal))
        .filter(F.col("_rnk") <= k)
        .groupBy(query_col)
        .agg(F.sum(F.col("_gain") / F.log2(F.col("_rnk") + 1.0)).alias("_idcg"))
    )
    return (
        idcg.join(dcg, query_col, "left")
        .select(
            query_col,
            F.round(F.coalesce("_dcg", F.lit(0.0)), decimals).alias("dcg"),
            F.round("_idcg", decimals).alias("idcg"),
            F.round(
                F.coalesce("_dcg", F.lit(0.0)) / F.col("_idcg"), decimals
            ).alias("ndcg"),
        )
    )


def mrr_hits(
    scored: DataFrame,
    query_col: str,
    cand_col: str,
    score_col: str,
    label_col: str,
    ks: tuple[int, ...] = (1, 3, 10),
    decimals: int = 6,
) -> DataFrame:
    """Per-query reciprocal rank and Hits@k — the KG-embedding
    link-prediction protocol (Bordes et al. 2013): rank candidates by
    score (desc, ties by candidate id for determinism), find the best
    rank holding a positive label, emit rr = 1/rank and hit_k
    indicators.  Queries with no positive candidate are dropped (the
    filtered-setting convention); average rr over queries for MRR.

    -> (query, first_rank, rr, hit_1, hit_3, hit_10, ...).

    Scale shape: ONE per-query window (fine-grained partition key — a
    query's candidate list is bounded by the protocol, not the corpus)
    and one per-query aggregate.  No global sort.
    """
    w = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), F.col(cand_col).asc()
    )
    ranked = scored.withColumn("_rank", F.row_number().over(w))
    best = (
        ranked.filter(F.col(label_col) == 1)
        .groupBy(F.col(query_col).alias("query"))
        .agg(F.min("_rank").alias("first_rank"))
    )
    out = best.select(
        "query",
        "first_rank",
        F.round(F.lit(1.0) / F.col("first_rank"), decimals).alias("rr"),
        *[
            (F.col("first_rank") <= k).cast("int").alias(f"hit_{k}")
            for k in ks
        ],
    )
    return out


def calibration_bins(
    preds: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
    decimals: int = 6,
) -> DataFrame:
    """Reliability diagram + expected-calibration-error contributions
    (Guo et al. 2017): scores bucketed into ``n_bins`` equal-width
    bins; per bin the mean confidence, the empirical positive rate,
    and the |acc - conf| * n/N ECE contribution (sum the column for
    ECE).

    Determinism: scores are rounded to 9dp DECIMAL before the bin
    sums, so the means replay cross-engine; score 1.0 lands in the
    top bin (clamped), matching the published binning.

    -> (bin, n, avg_conf, frac_pos, contrib).

    Scale shape: ONE hash aggregate on the bin key (<= n_bins groups,
    map-side partials) + a 1-row total broadcast.
    """
    s = F.col(score_col).cast("double")
    b = F.least(F.floor(s * n_bins).cast("int"), F.lit(n_bins - 1))
    sd = F.round(s, 9).cast("decimal(28,9)")
    per = (
        preds.select(
            b.alias("bin"),
            sd.alias("_s"),
            F.col(label_col).cast("int").alias("_y"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum("_s").alias("_ss"),
            F.sum("_y").alias("_sy"),
        )
    )
    tot = per.groupBy().agg(F.sum("n").alias("_nn"))
    conf = F.col("_ss").cast("double") / F.col("n")
    acc = F.col("_sy").cast("double") / F.col("n")
    return per.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n",
        F.round(conf, decimals).alias("avg_conf"),
        F.round(acc, decimals).alias("frac_pos"),
        F.round(
            F.abs(acc - conf) * F.col("n") / F.col("_nn"), decimals
        ).alias("contrib"),
    )


def regression_metrics(
    preds: DataFrame,
    pred_col: str = "pred",
    actual_col: str = "actual",
    decimals: int = 6,
) -> DataFrame:
    """Scalar regression eval: RMSE, MAE, mean bias, and R² in one
    pass.  Errors are rounded to 9dp DECIMAL before summing (order-
    exact aggregates, replayable); R² uses the two-pass-free identity
    1 - SSE/SST with SST from the same aggregate via sum/sumsq.

    -> one row (n, rmse, mae, bias, r2); r2 is NULL when the actuals
    have zero variance (no fake 0 — the degree_assortativity rule).

    Scale shape: ONE scalar aggregate over the predictions; every
    term has map-side partials.
    """
    pr = F.col(pred_col).cast("double")
    ac = F.col(actual_col).cast("double")
    d9 = lambda c: F.round(c, 9).cast("decimal(38,9)")  # noqa: E731
    agg = preds.agg(
        F.count("*").alias("n"),
        F.sum(d9((pr - ac) * (pr - ac))).alias("_sse"),
        F.sum(d9(F.abs(pr - ac))).alias("_sae"),
        F.sum(d9(pr - ac)).alias("_sbias"),
        F.sum(d9(ac)).alias("_sa"),
        F.sum(d9(ac * ac)).alias("_saa"),
    )
    n = F.col("n")
    sse = F.col("_sse").cast("double")
    sst = F.col("_saa").cast("double") - (
        F.col("_sa").cast("double") * F.col("_sa").cast("double") / n
    )
    return agg.select(
        "n",
        F.round(F.sqrt(sse / n), decimals).alias("rmse"),
        F.round(F.col("_sae").cast("double") / n, decimals).alias("mae"),
        F.round(F.col("_sbias").cast("double") / n, decimals).alias("bias"),
        F.when(sst > 0, F.round(F.lit(1.0) - sse / sst, decimals)).alias("r2"),
    )


def cohen_kappa(
    df: DataFrame, a_col: str, b_col: str, decimals: int = 6
) -> DataFrame:
    """Cohen's kappa inter-annotator agreement over two label columns:
    observed agreement corrected for the chance agreement implied by
    each rater's marginal label distribution — the label-quality gate
    before training on human (or LLM-judge) annotations.

    -> one row (n, po, pe, kappa); kappa NULL when pe = 1 (both
    raters constant — agreement is undefined, not 1.0).

    Determinism: po/pe are exact integer-count ratios; kappa rounds.

    Scale shape: ONE (a, b) pair aggregate (bounded by |labels|^2)
    does the corpus work; marginals and the scalar fold run on that
    summary.
    """
    pairs = df.groupBy(
        F.col(a_col).alias("la"), F.col(b_col).alias("lb")
    ).agg(F.count("*").alias("n"))
    tot = pairs.agg(
        F.sum("n").alias("n"),
        F.sum(F.when(F.col("la") == F.col("lb"), F.col("n")).otherwise(0)).alias(
            "agree"
        ),
    )
    ma = pairs.groupBy(F.col("la").alias("lbl")).agg(F.sum("n").alias("na"))
    mb = pairs.groupBy(F.col("lb").alias("lbl")).agg(F.sum("n").alias("nb"))
    pe_tbl = (
        ma.join(mb, "lbl", "full")
        .select(
            (
                F.coalesce("na", F.lit(0)) * F.coalesce("nb", F.lit(0))
            ).alias("_prod")
        )
        .agg(F.sum("_prod").alias("_pp"))
    )
    out = tot.crossJoin(F.broadcast(pe_tbl))
    po = F.col("agree") / F.col("n")
    pe = F.col("_pp") / (F.col("n") * F.col("n"))
    return out.select(
        "n",
        F.round(po, decimals).alias("po"),
        F.round(pe, decimals).alias("pe"),
        F.when(pe < 1.0, F.round((po - pe) / (1.0 - pe), decimals)).alias(
            "kappa"
        ),
    )


def confusion_metrics(
    df: DataFrame, label_col: str, pred_col: str, decimals: int = 6
) -> DataFrame:
    """Per-class confusion metrics for a multi-class classifier:
    one row per class appearing in labels or predictions, with
    tp / fp / fn, support, precision, recall and F1 — the slice-level
    quality report behind a single accuracy number.

    Undefined ratios are NULL, never a fake 0 or 1: precision with no
    positive predictions, recall with no support, F1 when either is
    NULL or both are 0.

    Scale shape: ONE (label, pred) aggregate (bounded |classes|^2)
    does the corpus work; the per-class rollups run on that matrix.
    """
    m = df.groupBy(
        F.col(label_col).alias("lbl"), F.col(pred_col).alias("prd")
    ).agg(F.count("*").alias("n"))
    diag = m.filter(F.col("lbl") == F.col("prd")).select(
        F.col("lbl").alias("cls"), F.col("n").alias("tp")
    )
    rows = m.groupBy(F.col("lbl").alias("cls")).agg(
        F.sum("n").alias("support")
    )
    cols = m.groupBy(F.col("prd").alias("cls")).agg(
        F.sum("n").alias("predicted")
    )
    j = (
        rows.join(cols, "cls", "full")
        .join(diag, "cls", "left")
        .select(
            "cls",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            (F.coalesce("predicted", F.lit(0)) - F.coalesce("tp", F.lit(0))).alias(
                "fp"
            ),
            (F.coalesce("support", F.lit(0)) - F.coalesce("tp", F.lit(0))).alias(
                "fn"
            ),
            F.coalesce("support", F.lit(0)).alias("support"),
        )
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp"))
    )
    rec = F.when(F.col("support") > 0, F.col("tp") / F.col("support"))
    f1 = F.when(
        prec.isNotNull() & rec.isNotNull() & (prec + rec > 0),
        2 * prec * rec / (prec + rec),
    )
    return j.select(
        "cls",
        "tp",
        "fp",
        "fn",
        "support",
        F.round(prec, decimals).alias("precision"),
        F.round(rec, decimals).alias("recall"),
        F.round(f1, decimals).alias("f1"),
    )


def conformal_threshold(
    cal: DataFrame,
    test: DataFrame,
    score_col: str = "score",
    covered_col: str = "covered",
    alpha: float = 0.1,
    decimals: int = 4,
) -> DataFrame:
    """Split conformal prediction calibration (Vovk; Angelopoulos &
    Bates 2021 tutorial form): the threshold is the
    ceil((n+1)(1-alpha))-th smallest calibration nonconformity score;
    the readout checks empirical coverage on the test side
    (fraction with score <= q_hat — guaranteed >= 1 - alpha in
    expectation under exchangeability).

    Scores are rounded to ``decimals`` and the order statistic is
    taken over the ROUNDED-score summary (the eval_auc bounded-
    summary trick): the corpus pays one aggregate per side; the
    cumulative walk runs over <= 10^decimals+1 distinct-score rows —
    no global sort of raw scores.

    -> one row (n_cal, k, q_hat, n_test, n_covered, coverage).
    """
    s = F.round(F.col(score_col).cast("double"), decimals)
    summary = cal.groupBy(s.alias("sc")).agg(F.count("*").alias("n"))
    n_cal = cal.count()
    if n_cal == 0:
        raise ValueError(
            "conformal_threshold: calibration set is empty — no order "
            "statistic exists (need at least one calibration score)"
        )
    import math

    k = min(int(math.ceil((n_cal + 1) * (1 - alpha))), n_cal)
    w = Window.orderBy("sc").rowsBetween(Window.unboundedPreceding, 0)
    cum = summary.withColumn("_c", F.sum("n").over(w))
    q_hat = (
        cum.filter(F.col("_c") >= k)
        .orderBy("sc")
        .limit(1)
        .collect()[0]
        .sc
    )
    t = test.select(s.alias("sc"))
    agg = t.agg(
        F.count("*").alias("n_test"),
        F.sum((F.col("sc") <= q_hat).cast("bigint")).alias("n_covered"),
    )
    return agg.select(
        F.lit(n_cal).alias("n_cal"),
        F.lit(k).alias("k"),
        F.lit(float(q_hat)).alias("q_hat"),
        "n_test",
        "n_covered",
        F.round(F.col("n_covered") / F.col("n_test"), 6).alias("coverage"),
    )


# Poisson(1) CDF thresholds scaled to 10^6 (e^-1 cumulative sums,
# rounded once here so both engines compare the identical integers)
_POISSON_CUM = [367879, 735759, 919699, 981012, 996340, 999406,
                999917, 999990, 999999]


def poisson_bootstrap_ci(
    df: DataFrame,
    id_col: str,
    value_col: str,
    n_replicates: int = 50,
    alpha: float = 0.05,
    seed: int = 42,
    decimals: int = 6,
) -> DataFrame:
    """Distributed bootstrap confidence interval for a mean via the
    Poisson bootstrap (Chamandy et al., Google 2012 — the streaming/
    sharded bootstrap: resample-with-replacement weights become iid
    Poisson(1) draws, so no replicate ever materializes):
    weight(row, b) = inverse-CDF of u32(md5(id#b#seed)), a pure
    function of the row — deterministic, partition-invariant,
    SQL-replayable via the baked integer thresholds.

    -> one row (n, mean, ci_lo, ci_hi, n_replicates) with the
    percentile interval at level alpha over the replicate means.

    Scale shape: ONE pass with a constant xB fan-out collapsed
    immediately by the per-replicate partial aggregate (DECIMAL
    sums); the quantile runs over the B-row replicate summary.
    """
    b = F.explode(
        F.sequence(F.lit(0), F.lit(n_replicates - 1))
    ).alias("_b")
    fan = df.select(
        F.col(id_col).cast("string").alias("_id"),
        F.round(F.col(value_col).cast("double"), 9)
        .cast("decimal(28,9)")
        .alias("_v"),
    ).select("_id", "_v", b)
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.encode(
                        F.concat_ws(
                            "#", "_id", F.col("_b").cast("string"),
                            F.lit(str(seed)),
                        ),
                        "UTF-8",
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 1_000_000
    )
    w = F.lit(len(_POISSON_CUM))
    for k in range(len(_POISSON_CUM) - 1, -1, -1):
        w = F.when(u < _POISSON_CUM[k], F.lit(k)).otherwise(w)
    per = (
        fan.select("_b", w.alias("_w"), "_v")
        .groupBy("_b")
        .agg(
            F.sum(F.col("_w")).alias("_n"),
            F.sum(F.col("_v") * F.col("_w")).alias("_s"),
        )
        .filter(F.col("_n") > 0)
        .select(
            (F.col("_s").cast("double") / F.col("_n")).alias("_mean")
        )
    )
    qs = per.agg(
        F.percentile(
            "_mean", F.lit([alpha / 2, 1 - alpha / 2])
        ).alias("_q"),
        F.count("*").alias("_nb"),
    )
    base = df.agg(
        F.count("*").alias("n"),
        (
            F.sum(
                F.round(F.col(value_col).cast("double"), 9).cast(
                    "decimal(28,9)"
                )
            ).cast("double")
            / F.count("*")
        ).alias("_m"),
    )
    return base.crossJoin(F.broadcast(qs)).select(
        "n",
        F.round("_m", decimals).alias("mean"),
        F.round(F.element_at("_q", 1), decimals).alias("ci_lo"),
        F.round(F.element_at("_q", 2), decimals).alias("ci_hi"),
        F.col("_nb").alias("n_replicates"),
    )


def map_at_k(
    runs: DataFrame,
    truth: DataFrame,
    query_col: str,
    id_col: str,
    score_col: str = "score",
    k: int = 10,
    decimals: int = 6,
) -> DataFrame:
    """Mean-average-precision family: per-query AP@k over a ranked
    run (rank by score desc, ties to smaller id) against a relevant
    set — AP = mean over relevant RETRIEVED positions of
    precision@that-position, divided by min(n_rel, k) (the standard
    truncated-AP normalizer); the corpus 'MAP' is the average of the
    per-query rows.

    -> (query, n_rel, n_retrieved_rel, ap).

    Scale shape: the rank window runs over the bounded top-k run
    lists only (the eval-family contract); truth joins by
    (query, id); everything else is per-query aggregation.
    """
    w = Window.partitionBy(query_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    ranked = (
        runs.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
    )
    rel = truth.select(
        F.col(query_col), F.col(id_col), F.lit(1).alias("_rel")
    )
    j = ranked.join(rel, [query_col, id_col], "left").select(
        query_col, "_r", F.coalesce("_rel", F.lit(0)).alias("_rel")
    )
    wcum = (
        Window.partitionBy(query_col)
        .orderBy("_r")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prec_at = F.sum("_rel").over(wcum) / F.col("_r")
    contrib = F.when(F.col("_rel") == 1, prec_at).otherwise(F.lit(0.0))
    per = j.select(query_col, "_rel", contrib.alias("_c")).groupBy(
        query_col
    ).agg(
        F.sum("_rel").alias("n_retrieved_rel"),
        F.sum("_c").alias("_sc"),
    )
    nrel = truth.groupBy(query_col).agg(F.count("*").alias("n_rel"))
    out = per.join(nrel, query_col, "right").select(
        F.col(query_col).alias("query"),
        "n_rel",
        F.coalesce("n_retrieved_rel", F.lit(0)).alias("n_retrieved_rel"),
        F.when(
            F.least(F.col("n_rel"), F.lit(k)) > 0,
            F.round(
                F.coalesce("_sc", F.lit(0.0))
                / F.least(F.col("n_rel"), F.lit(k)),
                decimals,
            ),
        ).alias("ap"),
    )
    return out


def fairness_metrics(
    df: DataFrame,
    group_col: str,
    label_col: str,
    pred_col: str,
    reference_group: str,
    decimals: int = 6,
) -> DataFrame:
    """Group-fairness audit of a binary classifier: per group the
    selection rate (P(pred=1)), TPR and FPR, plus the disparate-
    impact ratio (selection rate / reference group's — the EEOC
    four-fifths rule reads < 0.8 as adverse impact) and the
    equal-opportunity gap (TPR - reference TPR).

    Undefined rates are NULL (no positives/negatives in a group),
    never fabricated.

    -> (grp, n, sel_rate, tpr, fpr, di_ratio, eo_gap).

    Scale shape: ONE (group, label, pred) aggregate (bounded
    2x2x|groups| cells) + a 1-row reference broadcast.
    """
    y = F.col(label_col).cast("int")
    p = F.col(pred_col).cast("int")
    per = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").alias("n"),
        F.sum(p).alias("_np"),
        F.sum((y == 1).cast("int")).alias("_pos"),
        F.sum(((y == 1) & (p == 1)).cast("int")).alias("_tp"),
        F.sum(((y == 0) & (p == 1)).cast("int")).alias("_fp"),
    )
    sel = F.col("_np") / F.col("n")
    tpr = F.when(F.col("_pos") > 0, F.col("_tp") / F.col("_pos"))
    fpr = F.when(
        F.col("n") - F.col("_pos") > 0,
        F.col("_fp") / (F.col("n") - F.col("_pos")),
    )
    base = per.withColumn("_sel", sel).withColumn("_tpr", tpr)
    ref = base.filter(F.col("grp") == reference_group).select(
        F.col("_sel").alias("_rsel"), F.col("_tpr").alias("_rtpr")
    )
    j = base.crossJoin(F.broadcast(ref))
    return j.select(
        "grp",
        "n",
        F.round("_sel", decimals).alias("sel_rate"),
        F.round("_tpr", decimals).alias("tpr"),
        F.round(fpr, decimals).alias("fpr"),
        F.when(
            F.col("_rsel") > 0, F.round(F.col("_sel") / F.col("_rsel"), decimals)
        ).alias("di_ratio"),
        F.round(F.col("_tpr") - F.col("_rtpr"), decimals).alias("eo_gap"),
    )


def ips_policy_value(
    logs: DataFrame,
    arm_col: str,
    reward_col: str,
    prob_col: str,
    target_arm_col: str,
    clip: float | None = 10.0,
    decimals: int = 6,
) -> DataFrame:
    """Off-policy evaluation by inverse-propensity scoring (the
    logged-bandit replay estimator): V(π) ≈ mean over logged rounds
    of reward · 1[π(x) = a] / p(a|x), optionally CLIPPED at ``clip``
    (the standard variance/bias trade, stated), plus the
    self-normalized (SNIPS) variant — the pre-deploy check for any
    ranking/recommendation policy change.

    -> one row (n, n_matched, ips, snips, avg_logged_reward).

    Determinism: weights and weighted rewards round to 9dp DECIMAL
    before summing.

    Scale shape: ONE scalar aggregate over the log.
    """
    w_raw = (
        F.when(
            F.col(target_arm_col) == F.col(arm_col),
            F.lit(1.0) / F.col(prob_col).cast("double"),
        ).otherwise(F.lit(0.0))
    )
    w = F.least(w_raw, F.lit(float(clip))) if clip is not None else w_raw
    d9 = lambda c: F.round(c, 9).cast("decimal(38,9)")  # noqa: E731
    r = F.col(reward_col).cast("double")
    agg = logs.agg(
        F.count("*").alias("n"),
        F.sum((F.col(target_arm_col) == F.col(arm_col)).cast("bigint")).alias(
            "n_matched"
        ),
        F.sum(d9(w * r)).alias("_swr"),
        F.sum(d9(w)).alias("_sw"),
        F.sum(d9(r)).alias("_sr"),
    )
    return agg.select(
        "n",
        "n_matched",
        F.round(F.col("_swr").cast("double") / F.col("n"), decimals).alias(
            "ips"
        ),
        F.when(
            F.col("_sw").cast("double") > 0,
            F.round(
                F.col("_swr").cast("double") / F.col("_sw").cast("double"),
                decimals,
            ),
        ).alias("snips"),
        F.round(F.col("_sr").cast("double") / F.col("n"), decimals).alias(
            "avg_logged_reward"
        ),
    )


def rouge_n(
    pairs: DataFrame,
    id_col: str,
    cand_col: str,
    ref_col: str,
    n: int = 1,
    decimals: int = 6,
) -> DataFrame:
    """ROUGE-N over (candidate, reference) text pairs (Lin 2004 —
    the summarization/compression overlap metric): clipped n-gram
    matches / reference n-gram count (recall), plus precision and
    F1.  Counts use the standard CLIPPED multiset intersection
    (a candidate gram credits at most its reference multiplicity).

    -> (id, n_ref_grams, n_cand_grams, n_match, rouge_recall,
       rouge_precision, rouge_f1); NULL metrics when a side has no
    grams.

    Scale shape: gram construction is per-row array codegen; the
    clipped intersection is one (id, gram) count join over the two
    exploded sides — per-pair state bounded by the texts themselves.
    """

    def grams(col):
        toks = F.filter(
            F.split(
                F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")), " "
            ),
            lambda t: t != "",
        )
        if n == 1:
            return toks
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    base = pairs.select(
        F.col(id_col).alias("id"),
        grams(F.col(cand_col)).alias("_c"),
        grams(F.col(ref_col)).alias("_r"),
    )
    cg = base.select("id", F.explode("_c").alias("g")).groupBy(
        "id", "g"
    ).agg(F.count("*").alias("nc"))
    rg = base.select("id", F.explode("_r").alias("g")).groupBy(
        "id", "g"
    ).agg(F.count("*").alias("nr"))
    match = (
        cg.join(rg, ["id", "g"])
        .groupBy("id")
        .agg(F.sum(F.least("nc", "nr")).alias("n_match"))
    )
    sizes = base.select(
        "id", F.size("_c").alias("n_cand_grams"), F.size("_r").alias("n_ref_grams")
    )
    j = sizes.join(match, "id", "left").select(
        "id",
        "n_ref_grams",
        "n_cand_grams",
        F.coalesce("n_match", F.lit(0)).alias("n_match"),
    )
    rec = F.when(
        F.col("n_ref_grams") > 0, F.col("n_match") / F.col("n_ref_grams")
    )
    prec = F.when(
        F.col("n_cand_grams") > 0, F.col("n_match") / F.col("n_cand_grams")
    )
    f1 = F.when(
        rec.isNotNull() & prec.isNotNull() & (rec + prec > 0),
        2 * rec * prec / (rec + prec),
    )
    return j.select(
        "id",
        "n_ref_grams",
        "n_cand_grams",
        "n_match",
        F.round(rec, decimals).alias("rouge_recall"),
        F.round(prec, decimals).alias("rouge_precision"),
        F.round(f1, decimals).alias("rouge_f1"),
    )
