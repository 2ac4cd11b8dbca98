"""Column profiling — the data-quality summary a pipeline runs before
trusting a new 100 TB drop.

The reference's only input diagnostics are an edge-count estimate and
file-set listing (graphalytics.py provenance: helper.py:21-35,
graphalytics_importer.py:29-41); a Spark-native engine profiles every
column in two shuffles regardless of column count.

Shape: UNPIVOT (explode one row per (column, value) pair — map-only,
xN columns but no shuffle) -> groupBy(column, value) count (partial
aggregation absorbs Zipf-hot values map-side) -> groupBy(column)
roll-up.  This avoids both the multi-count-distinct Expand plan (which
multiplies the SCAN by the column count through one wide shuffle) and
N separate per-column jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, columns: list[str] | None = None, decimals: int = 6
) -> DataFrame:
    """-> one row per profiled column: (column, n_rows, n_null,
    null_frac, n_distinct, min_value, max_value, top_value, top_count).

    Values are compared/reported AS STRINGS (profiling view, not typed
    stats): min/max/top are over the string form, so pick columns whose
    string order is meaningful or treat those fields as fingerprints.
    Ties on top_count break toward the LARGER value string (arg_max on
    (count, value)) so the result is deterministic.
    """
    cols = columns or df.columns
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.column", "p.value")
    counted = pairs.groupBy("column", "value").agg(F.count("*").alias("cnt"))
    nn = F.col("value").isNotNull()
    return counted.groupBy("column").agg(
        F.sum("cnt").alias("n_rows"),
        F.sum(F.when(~nn, F.col("cnt")).otherwise(F.lit(0))).alias("n_null"),
        F.round(
            F.sum(F.when(~nn, F.col("cnt")).otherwise(F.lit(0)))
            / F.sum("cnt"),
            decimals,
        ).alias("null_frac"),
        F.count(F.when(nn, F.lit(1))).alias("n_distinct"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.max_by("value", F.when(nn, F.struct(F.col("cnt"), F.col("value")))).alias(
            "top_value"
        ),
        F.max(F.when(nn, F.col("cnt"))).alias("top_count"),
    )


def column_match(
    a: DataFrame,
    b: DataFrame,
    a_cols: list[str],
    b_cols: list[str],
    decimals: int = 6,
) -> DataFrame:
    """Instance-based schema matching: Jaccard similarity of the
    distinct value sets of every (a-column, b-column) pair — the
    value-overlap half of classic schema matchers (COMA / Similarity
    Flooding instance baselines; Rahm & Bernstein VLDB J. 2001).
    The integration step a KG builder runs before mapping a scraped
    web table onto an existing ontology's attributes.

    Values compare as trimmed lowercase strings; NULLs drop.
    -> (a_col, b_col, n_a, n_b, n_common, jaccard).

    Scale shape: each side is ONE unpivot (explode of a literal
    column-name array -> (col, value)) + distinct; the overlap is a
    single (value)-keyed equi-join keyed on values, then a
    (a_col, b_col) aggregate.  Column counts ride on the same distinct
    tables.  Cost is data-linear; nothing is per-column-pair scanned.
    """

    def _unpivot(df: DataFrame, cols: list[str], side: str) -> DataFrame:
        pairs = F.array(
            *[
                F.struct(
                    F.lit(c).alias("col"),
                    F.trim(F.lower(F.col(c).cast("string"))).alias("val"),
                )
                for c in cols
            ]
        )
        return (
            df.select(F.explode(pairs).alias("p"))
            .select(F.col("p.col").alias(f"{side}_col"), F.col("p.val").alias("val"))
            .filter(F.col("val").isNotNull())
            .distinct()
        )

    ua, ub = _unpivot(a, a_cols, "a"), _unpivot(b, b_cols, "b")
    na = ua.groupBy("a_col").agg(F.count("*").alias("n_a"))
    nb = ub.groupBy("b_col").agg(F.count("*").alias("n_b"))
    common = (
        ua.join(ub, "val")
        .groupBy("a_col", "b_col")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(na, "a_col")
        .join(nb, "b_col")
        .select(
            "a_col",
            "b_col",
            "n_a",
            "n_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                decimals,
            ).alias("jaccard"),
        )
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
    decimals: int = 6,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    snapshot of a numeric column (the standard production drift
    monitor; PSI > 0.2 = investigate, > 0.25 = act).  Equal-width bins
    over the CALLER-pinned [lo, hi] (fixed cutpoints are the point —
    re-deriving bins from the drifted data hides the drift);
    out-of-range values clamp into the edge bins.

    Fractions use (n + 0.5) / (N + 0.5 * bins) additive smoothing so
    empty bins contribute finitely (the standard PSI zero-cell fix),
    deterministically.

    -> (bin, n_ref, n_cur, p_ref, p_cur, contrib); PSI =
    sum(contrib).

    Scale shape: each snapshot pays ONE bin-keyed aggregate
    (<= n_bins groups, map-side partials); the bin join is
    broadcast-trivial.
    """
    width = (hi - lo) / n_bins

    def binned(df, out):
        v = F.col(value_col).cast("double")
        b = F.least(
            F.greatest(
                F.floor((v - F.lit(lo)) / F.lit(width)).cast("int"), F.lit(0)
            ),
            F.lit(n_bins - 1),
        )
        return df.select(b.alias("bin")).groupBy("bin").agg(
            F.count("*").alias(out)
        )
    spark = ref.sparkSession
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    r = binned(ref, "n_ref")
    c = binned(cur, "n_cur")
    j = (
        bins.join(r, "bin", "left")
        .join(c, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    tot = j.groupBy().agg(
        F.sum("n_ref").alias("_tr"), F.sum("n_cur").alias("_tc")
    )
    out = j.crossJoin(F.broadcast(tot))
    p = (F.col("n_ref") + 0.5) / (F.col("_tr") + 0.5 * n_bins)
    q = (F.col("n_cur") + 0.5) / (F.col("_tc") + 0.5 * n_bins)
    return out.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round(p, decimals).alias("p_ref"),
        F.round(q, decimals).alias("p_cur"),
        F.round((p - q) * F.log(p / q), decimals).alias("contrib"),
    )


def json_schema_profile(
    df: DataFrame, json_col: str, decimals: int = 6
) -> DataFrame:
    """Schema inference over a semi-structured JSON column (the
    event-properties / API-payload profiling step before a schema is
    frozen): per key, presence across rows and the value-type census
    (number / boolean / null / string from the serialized form),
    with the majority type as the inferred column type (ties break to
    the lexicographically smaller type name).

    -> (key, n_present, presence, n_number, n_bool, n_null, n_string,
       inferred_type).

    Scale shape: one parse + explode of the key-value map (fan-out =
    keys per row, payload-bounded) into ONE key-keyed partial
    aggregate; the denominator is a 1-row broadcast count.
    """
    m = F.from_json(F.col(json_col), "map<string,string>")
    kv = df.select(F.explode(m).alias("key", "v"))
    is_null = F.col("v").isNull()
    # null-safe predicates: rlike(NULL) is NULL, and summing NULL
    # casts collapses an all-null key's count to NULL instead of 0
    is_bool = F.coalesce(F.col("v").isin("true", "false"), F.lit(False))
    is_num = F.coalesce(
        F.col("v").rlike(r"^-?[0-9]+(\.[0-9]+)?$"), F.lit(False)
    )
    per = kv.groupBy("key").agg(
        F.count("*").alias("n_present"),
        F.sum(is_num.cast("bigint")).alias("n_number"),
        F.sum((is_bool & ~is_null).cast("bigint")).alias("n_bool"),
        F.sum(is_null.cast("bigint")).alias("n_null"),
        F.sum(
            (~is_null & ~is_bool & ~is_num).cast("bigint")
        ).alias("n_string"),
    )
    tot = df.select(F.count("*").alias("_n")).withColumn("_j", F.lit(1))
    per = per.withColumn("_j", F.lit(1)).join(F.broadcast(tot), "_j").drop("_j")
    counts = F.array(
        F.struct(F.col("n_bool").alias("n"), F.lit("boolean").alias("t")),
        F.struct(F.col("n_null").alias("n"), F.lit("null").alias("t")),
        F.struct(F.col("n_number").alias("n"), F.lit("number").alias("t")),
        F.struct(F.col("n_string").alias("n"), F.lit("string").alias("t")),
    )
    # majority type: max count, ties to the MIN type name (a reversed
    # array_sort would reverse the tie order too — pick explicitly)
    maxn = F.array_max(F.transform(counts, lambda s: s.getField("n")))
    winner = F.array_min(
        F.transform(
            F.filter(counts, lambda s: s.getField("n") == maxn),
            lambda s: s.getField("t"),
        )
    )
    return per.select(
        "key",
        "n_present",
        F.round(F.col("n_present") / F.col("_n"), decimals).alias("presence"),
        "n_number",
        "n_bool",
        "n_null",
        "n_string",
        winner.alias("inferred_type"),
    )


def table_checks(
    df: DataFrame,
    unique_cols: list[str] | None = None,
    not_null_cols: list[str] | None = None,
    accepted_values: dict[str, list[str]] | None = None,
    fk: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """dbt-style declarative table tests in one report: uniqueness,
    not-null, accepted-values and foreign-key coverage, each a row
    (check, column, n_violations, passed) — the CI gate a curated
    table ships behind.

    ``fk`` entries are (column, dim_df, dim_col).

    Scale shape: each uniqueness check is one key-keyed count
    aggregate; not-null / accepted-values are single-pass conditional
    counts sharing one scan; FK checks are anti-join counts against
    (broadcast-able) dimension projections.  Report size = number of
    declared checks.
    """
    spark = df.sparkSession
    rows = []

    def row(check, col, n):
        return spark.createDataFrame(
            [(check, col, int(n), int(n) == 0)],
            "check string, column string, n_violations long, passed boolean",
        )

    for c in unique_cols or []:
        dup = (
            df.groupBy(c)
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > 1)
            .agg(F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).alias("v"))
            .collect()[0]
            .v
        )
        rows.append(row("unique", c, dup))
    if not_null_cols:
        agg = df.agg(
            *[
                F.sum(F.col(c).isNull().cast("bigint")).alias(c)
                for c in not_null_cols
            ]
        ).collect()[0]
        for c in not_null_cols:
            rows.append(row("not_null", c, agg[c]))
    for c, vals in (accepted_values or {}).items():
        # dbt semantics: accepted_values ignores NULLs — not_null is
        # the separate, orthogonal check (a nullable column should not
        # double-fail here)
        n = df.filter(~F.col(c).isin(vals)).count()
        rows.append(row("accepted_values", c, n))
    for c, dim, dim_col in fk or []:
        n = (
            df.select(F.col(c).alias("_k"))
            .filter(F.col("_k").isNotNull())
            .join(
                F.broadcast(dim.select(F.col(dim_col).alias("_k")).distinct()),
                "_k",
                "left_anti",
            )
            .count()
        )
        rows.append(row("foreign_key", c, n))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def concentration_curve(
    df: DataFrame,
    key_col: str,
    value_col: str,
    fracs: tuple[float, ...] = (0.5, 0.8, 0.9),
    decimals: int = 6,
) -> DataFrame:
    """Pareto / concentration analysis of a value column over keys
    (revenue per customer, traffic per domain, tokens per source):
    for each target fraction, how many of the highest-value keys it
    takes to cover that share of the total — the 80/20 readout that
    decides crawl budgets and dedup priorities.

    Exactness without a global per-key sort: per-key values (exact
    DECIMAL sums, rounded to 2) collapse to a (value, n_keys) summary
    table; the cumulative walk runs over DISTINCT values descending —
    bounded by value granularity, not key count (the eval_auc
    bounded-summary argument).  Keys are counted at value
    granularity: within the marginal value's tie group the minimal
    covering count uses as many of its keys as needed (exact
    fractional attribution of the tie group, deterministic).

    -> one row per frac (frac, n_keys, key_share, value_share).
    """
    amt = F.round(
        F.sum(F.round(F.col(value_col), 9).cast("decimal(28,9)")).cast(
            "double"
        ),
        2,
    )
    per = df.groupBy(F.col(key_col).alias("k")).agg(amt.alias("v"))
    summ = per.groupBy("v").agg(F.count("*").alias("nk"))
    w = Window.orderBy(F.desc("v")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = summ.select(
        "v",
        "nk",
        F.sum(F.col("v") * F.col("nk")).over(w).alias("cv"),
        F.sum("nk").over(w).alias("ck"),
    )
    tot = per.agg(
        F.sum(F.round(F.col("v"), 9).cast("decimal(28,9)")).cast("double").alias("tv"),
        F.count("*").alias("tk"),
    )
    out = None
    for f in fracs:
        # first summary row whose cumulative value covers f * total;
        # keys needed = keys before the tie group + ceil of the
        # remainder at the marginal value
        c = cum.crossJoin(F.broadcast(tot)).filter(
            F.col("cv") >= F.col("tv") * F.lit(f)
        )
        row = (
            c.orderBy(F.desc("v"))
            .limit(1)
            .select(
                F.lit(f).alias("frac"),
                (
                    F.col("ck")
                    - F.col("nk")
                    + F.ceil(
                        (
                            F.col("tv") * F.lit(f)
                            - (F.col("cv") - F.col("v") * F.col("nk"))
                        )
                        / F.col("v")
                    )
                ).cast("bigint").alias("n_keys"),
                F.col("tk").alias("_tk"),
                F.col("tv").alias("_tv"),
                F.col("v").alias("_v"),
                F.col("cv").alias("_cv"),
                F.col("nk").alias("_nk"),
                F.col("ck").alias("_ck"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.select(
        "frac",
        "n_keys",
        F.round(F.col("n_keys") / F.col("_tk"), decimals).alias("key_share"),
        F.round(
            F.least(
                (
                    F.col("_cv")
                    - F.col("_v") * F.col("_nk")
                    + (F.col("n_keys") - (F.col("_ck") - F.col("_nk")))
                    * F.col("_v")
                )
                / F.col("_tv"),
                F.lit(1.0),
            ),
            decimals,
        ).alias("value_share"),
    )


def grouped_ols(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Closed-form simple linear regression per group (the grouped
    trend-line / elasticity readout): slope = cov(x,y)/var(x),
    intercept = ybar - slope*xbar, r = cov/(sx*sy) — all from ONE
    aggregate of 9dp-DECIMAL moment sums (n, Σx, Σy, Σxx, Σyy, Σxy),
    so the fit is order-exact and SQL-replayable; no ML library, no
    iterations.

    -> (group, n, slope, intercept, r2); slope/r2 NULL when var(x)
    (resp. var(y)) is 0 — undefined, not fabricated.

    Scale shape: one group-keyed aggregate with map-side partials;
    the algebra runs on the per-group summary row.
    """
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    d9 = lambda c: F.round(c, 9).cast("decimal(38,9)")  # noqa: E731
    agg = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").alias("n"),
        F.sum(d9(x)).alias("_sx"),
        F.sum(d9(y)).alias("_sy"),
        F.sum(d9(x * x)).alias("_sxx"),
        F.sum(d9(y * y)).alias("_syy"),
        F.sum(d9(x * y)).alias("_sxy"),
    )
    n = F.col("n")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    sxy = F.col("_sxy").cast("double")
    varx = sxx - sx * sx / n
    vary = syy - sy * sy / n
    cov = sxy - sx * sy / n
    slope = F.when(varx > 0, cov / varx)
    intercept = F.when(varx > 0, (sy - (cov / varx) * sx) / n)
    r2 = F.when((varx > 0) & (vary > 0), (cov * cov) / (varx * vary))
    return agg.select(
        "grp",
        "n",
        F.round(slope, decimals).alias("slope"),
        F.round(intercept, decimals).alias("intercept"),
        F.round(r2, decimals).alias("r2"),
    )


def join_cardinality_audit(
    a: DataFrame,
    b: DataFrame,
    a_key: str,
    b_key: str,
    decimals: int = 6,
) -> DataFrame:
    """Optimizer-statistics validation for an equi-join: the textbook
    estimate |A||B| / max(ndv_a, ndv_b) (uniform-key assumption —
    what a cost model uses before AQE sees runtime stats) vs the
    ACTUAL join cardinality, plus the error ratio.  Large ratios
    flag skew the cost model will mis-plan — the audit behind a
    'should this join be salted?' decision.

    -> one row (n_a, n_b, ndv_a, ndv_b, est, actual, ratio).

    Scale shape: two count+distinct aggregates (one scan each) and
    the actual count via the join itself — the measurement IS the
    join, run once.
    """
    sa = a.select(F.col(a_key).alias("_k"))
    sb = b.select(F.col(b_key).alias("_k"))
    stats_a = sa.agg(
        F.count("*").alias("n_a"), F.countDistinct("_k").alias("ndv_a")
    )
    stats_b = sb.agg(
        F.count("*").alias("n_b"), F.countDistinct("_k").alias("ndv_b")
    )
    actual = sa.join(sb, "_k").count()
    j = stats_a.crossJoin(stats_b)
    est = (
        F.col("n_a")
        * F.col("n_b")
        / F.greatest(F.col("ndv_a"), F.col("ndv_b"))
    )
    return j.select(
        "n_a",
        "n_b",
        "ndv_a",
        "ndv_b",
        F.round(est, decimals).alias("est"),
        F.lit(actual).alias("actual"),
        F.when(est > 0, F.round(F.lit(actual) / est, decimals)).alias(
            "ratio"
        ),
    )


def information_gain(
    df: DataFrame,
    label_col: str,
    feature_cols: list[str],
    decimals: int = 6,
) -> DataFrame:
    """Information gain of categorical features against a label
    (the classic filter-method feature ranking): IG(f) = H(label) -
    Σ_v p(v) H(label | f = v), entropies in bits.

    Every entropy term computes from exact integer counts; the
    p·log2(p) fold orders by value then label (deterministic), and
    results round — the char_entropy discipline applied to feature
    selection.

    -> (feature, n_values, h_label, h_cond, info_gain).

    Scale shape: one (feature, value, label) aggregate per feature
    via a single unpivot scan (the profiling shape: explode a
    literal array, never one job per column); all entropy algebra
    runs on the bounded (value, label) census.
    """
    pairs = df.select(
        F.col(label_col).cast("string").alias("_y"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("f"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in feature_cols
                ]
            )
        ).alias("_p"),
    ).select("_y", F.col("_p.f").alias("f"), F.col("_p.v").alias("v"))
    cell = pairs.groupBy("f", "v", "_y").agg(F.count("*").alias("n"))
    per_v = cell.groupBy("f", "v").agg(F.sum("n").alias("nv"))
    ent_v = (
        cell.join(per_v, ["f", "v"])
        .groupBy("f", "v", "nv")
        .agg(
            F.round(
                -F.sum(
                    (F.col("n") / F.col("nv"))
                    * F.log2(F.col("n") / F.col("nv"))
                ),
                9,
            ).alias("hv")
        )
    )
    tot = pairs.groupBy("f").agg(F.count("*").alias("nt"))
    lab = pairs.groupBy("f", "_y").agg(F.count("*").alias("n"))
    h_label = (
        lab.join(tot, "f")
        .groupBy("f", "nt")
        .agg(
            F.round(
                -F.sum(
                    (F.col("n") / F.col("nt"))
                    * F.log2(F.col("n") / F.col("nt"))
                ),
                9,
            ).alias("hl")
        )
    )
    cond = (
        ent_v.join(tot.select("f", "nt"), "f")
        .groupBy("f")
        .agg(
            F.round(
                F.sum((F.col("nv") / F.col("nt")) * F.col("hv")), 9
            ).alias("hc"),
            F.count("*").alias("n_values"),
        )
    )
    return (
        h_label.join(cond, "f")
        .select(
            F.col("f").alias("feature"),
            "n_values",
            F.round("hl", decimals).alias("h_label"),
            F.round("hc", decimals).alias("h_cond"),
            F.round(F.col("hl") - F.col("hc"), decimals).alias("info_gain"),
        )
    )


def functional_dependencies(
    df: DataFrame,
    candidate_pairs: list[tuple[str, str]],
    decimals: int = 6,
) -> DataFrame:
    """Functional-dependency audit (the TANE-style check restricted
    to declared candidates): for each (determinant, dependent) pair,
    how many determinant values map to MORE than one dependent value
    — 0 violations means A -> B holds exactly; the violation rate
    says how close a dirty column is to being derivable.

    -> (determinant, dependent, n_keys, n_violating_keys,
       violation_rate, holds).

    Scale shape: one (det, dep) distinct + det-keyed count per pair,
    all pairs riding ONE unpivot scan (the profiling shape — never a
    job per pair).
    """
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("fd"),
                        F.col(a).cast("string").alias("av"),
                        F.lit(b).alias("dep"),
                        F.col(b).cast("string").alias("bv"),
                    )
                    for a, b in candidate_pairs
                ]
            )
        ).alias("p")
    ).select("p.fd", "p.av", "p.dep", "p.bv")
    dd = pairs.distinct()
    per_key = dd.groupBy("fd", "dep", "av").agg(
        F.count("*").alias("_ndep")
    )
    return (
        per_key.groupBy("fd", "dep")
        .agg(
            F.count("*").alias("n_keys"),
            F.sum((F.col("_ndep") > 1).cast("bigint")).alias(
                "n_violating_keys"
            ),
        )
        .select(
            F.col("fd").alias("determinant"),
            F.col("dep").alias("dependent"),
            "n_keys",
            "n_violating_keys",
            F.round(
                F.col("n_violating_keys") / F.col("n_keys"), decimals
            ).alias("violation_rate"),
            (F.col("n_violating_keys") == 0).alias("holds"),
        )
    )


def woe_iv(
    df: DataFrame,
    feature_col: str,
    label_col: str,
    smoothing: float = 0.5,
    decimals: int = 6,
) -> DataFrame:
    """Weight-of-evidence encoding + information value per category
    (the credit-scoring standard; Siddiqi's IV bands: < 0.02 useless,
    > 0.3 strong): WoE(v) = ln(p(v|good) / p(v|bad)) with additive
    ``smoothing`` on the cell counts (the zero-cell fix,
    deterministic); iv_contrib sums to the feature's IV.

    ``label_col`` must be 0/1 (1 = 'bad'/event).

    -> (value, n, n_good, n_bad, woe, iv_contrib).

    Scale shape: ONE (value, label-split) aggregate with map-side
    partials + a 1-row totals broadcast; all ratio algebra on the
    bounded category table.
    """
    y = F.col(label_col).cast("int")
    per = df.groupBy(F.col(feature_col).alias("value")).agg(
        F.count("*").alias("n"),
        F.sum((y == 0).cast("bigint")).alias("n_good"),
        F.sum((y == 1).cast("bigint")).alias("n_bad"),
    )
    tot = per.groupBy().agg(
        F.sum("n_good").alias("_tg"), F.sum("n_bad").alias("_tb"),
        F.count("*").alias("_nc"),
    )
    j = per.crossJoin(F.broadcast(tot))
    pg = (F.col("n_good") + smoothing) / (
        F.col("_tg") + smoothing * F.col("_nc")
    )
    pb = (F.col("n_bad") + smoothing) / (
        F.col("_tb") + smoothing * F.col("_nc")
    )
    woe = F.log(pg / pb)
    return j.select(
        "value",
        "n",
        "n_good",
        "n_bad",
        F.round(woe, decimals).alias("woe"),
        F.round((pg - pb) * woe, decimals).alias("iv_contrib"),
    )


def correlation_matrix(
    df: DataFrame,
    numeric_cols: list[str],
    decimals: int = 6,
) -> DataFrame:
    """Pairwise Pearson correlations over declared numeric columns in
    ONE pass: every pair's moment sums (9dp DECIMAL — order-exact)
    ride a single wide aggregate, then the r algebra runs on the
    1-row summary — the EDA correlation matrix without |cols| scans
    or a VectorAssembler detour.

    -> (col_a, col_b, n, r) for a < b lexicographically; NULL r when
    either column is constant.
    """
    cols = sorted(numeric_cols)
    d9 = lambda c: F.round(c, 9).cast("decimal(38,9)")  # noqa: E731
    aggs = [F.count("*").alias("_n")]
    for c in cols:
        x = F.col(c).cast("double")
        aggs.append(F.sum(d9(x)).alias(f"_s_{c}"))
        aggs.append(F.sum(d9(x * x)).alias(f"_q_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            xa = F.col(a).cast("double")
            xb = F.col(b).cast("double")
            aggs.append(F.sum(d9(xa * xb)).alias(f"_p_{a}_{b}"))
    summ = df.agg(*aggs)
    rows = None
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            n = F.col("_n")
            sa = F.col(f"_s_{a}").cast("double")
            sb = F.col(f"_s_{b}").cast("double")
            qa = F.col(f"_q_{a}").cast("double")
            qb = F.col(f"_q_{b}").cast("double")
            pab = F.col(f"_p_{a}_{b}").cast("double")
            va = qa - sa * sa / n
            vb = qb - sb * sb / n
            cov = pab - sa * sb / n
            r = F.when(
                (va > 0) & (vb > 0), cov / F.sqrt(va * vb)
            )
            row = summ.select(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                n.alias("n"),
                F.round(r, decimals).alias("r"),
            )
            rows = row if rows is None else rows.unionByName(row)
    return rows


def gini_coefficient(
    df: DataFrame,
    key_col: str,
    value_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Exact Gini coefficient of per-key value totals (the inequality
    number beside concentration_curve's quantile view): G =
    Σ (2i - n - 1) x_(i) / (n Σx) over ascending-sorted per-key
    totals — computed WITHOUT a per-key global sort by walking the
    DISTINCT-value summary (value, count) ascending: a tie group of
    m keys at value v occupying ranks r+1..r+m contributes
    v · (m·(2r + m) - m·n ... expanded below) exactly.

    -> one row (n_keys, total, gini).

    Scale shape: one key-keyed DECIMAL aggregate -> |keys| rows ->
    one (value) rollup; the ordered walk runs over DISTINCT values
    only (the eval_auc bounded-summary argument).
    """
    amt = F.round(
        F.sum(F.round(F.col(value_col), 9).cast("decimal(28,9)")).cast(
            "double"
        ),
        2,
    )
    per = df.groupBy(F.col(key_col).alias("k")).agg(amt.alias("v"))
    summ = per.groupBy("v").agg(F.count("*").alias("m"))
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    walk = summ.select(
        "v",
        "m",
        F.coalesce(F.sum("m").over(w), F.lit(0)).alias("_r"),
    )
    tot = per.agg(
        F.count("*").alias("_n"),
        F.sum(F.round(F.col("v"), 9).cast("decimal(28,9)")).alias("_t"),
    )
    j = walk.crossJoin(F.broadcast(tot))
    # sum over the tie group of (2i - n - 1) for i = r+1..r+m:
    #   m*(2r + m) - m*n  (integer arithmetic, exact)
    group_term = F.round(
        F.col("v")
        * (
            F.col("m") * (2 * F.col("_r") + F.col("m"))
            - F.col("m") * F.col("_n")
        ),
        9,
    ).cast("decimal(38,9)")
    agg = j.agg(
        F.sum(group_term).alias("_num"),
        F.max("_n").alias("n_keys"),
        F.max("_t").alias("_t"),
    )
    return agg.select(
        "n_keys",
        F.round(F.col("_t").cast("double"), 2).alias("total"),
        F.when(
            F.col("_t").cast("double") > 0,
            F.round(
                F.col("_num").cast("double")
                / (F.col("n_keys") * F.col("_t").cast("double")),
                decimals,
            ),
        ).alias("gini"),
    )
