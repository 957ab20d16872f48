"""ML-readiness advisor — the reference's recommendation engine
(src/core/ml_advisor.py:93-317) as aggregate-driven rule rows.

The reference walks a pandas frame and emits prose recommendations; here
every trigger condition is computed from ONE aggregate pass (plus two
tiny cardinality/top-class aggregates) and emitted as a structured row
(category, column, metric, strategy) — the machine-readable core of the
reference's sentences, exactly thresholded:

* missing tiers      — >50% drop / 10–50% impute   (ml_advisor.py:102-125)
* class imbalance    — >80% severe / >70% moderate (ml_advisor.py:134-162)
* date features      — any datetime column          (ml_advisor.py:168-172)
* high correlation   — |pearson| > 0.8 pairs        (ml_advisor.py:185-205)
* encoding tiers     — 2 / 3–10 / 11–50 / >50 uniques (ml_advisor.py:222-251)
* wide range         — range > 1000 or cv > 1       (ml_advisor.py:253-283)
* low variance       — stddev < 0.01                (ml_advisor.py:285-317)

The driver-side assembly mirrors metrics.column_findings: aggregates are
collected (a handful of scalars), the rule walk is pure Python, and the
result is a small createDataFrame — report-scale output from
corpus-scale scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ADVICE_SCHEMA = T.StructType(
    [
        T.StructField("category", T.StringType(), False),
        T.StructField("column", T.StringType(), True),
        T.StructField("metric", T.DoubleType(), True),
        T.StructField("strategy", T.StringType(), False),
    ]
)


def ml_recommendations(
    spark: SparkSession,
    df: DataFrame,
    numeric_cols: list[str],
    categorical_cols: list[str],
    datetime_cols: list[str],
) -> DataFrame:
    """→ (category, column, metric, strategy) advisor rows."""
    n_rows_expr = F.count(F.lit(1)).alias("_n")
    aggs = [n_rows_expr]
    all_cols = list(dict.fromkeys(numeric_cols + categorical_cols + datetime_cols))
    for c in all_cols:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"null_{c}"))
    for c in numeric_cols:
        x = F.col(c).cast("double")
        aggs += [
            F.min(x).alias(f"min_{c}"),
            F.max(x).alias(f"max_{c}"),
            F.stddev_samp(x).alias(f"std_{c}"),
            F.avg(x).alias(f"mean_{c}"),
        ]
    for i, a in enumerate(numeric_cols):
        for b in numeric_cols[i + 1 :]:
            aggs.append(
                F.corr(F.col(a).cast("double"), F.col(b).cast("double")).alias(
                    f"corr_{a}_{b}"
                )
            )
    for c in categorical_cols:
        aggs.append(F.count_distinct(F.col(c)).alias(f"card_{c}"))
    s = df.agg(*aggs).first()
    n = s["_n"] or 0

    # top-class share: ONE stacked job for every imbalance-eligible
    # categorical column (card in (1, 20) — single-class columns are not
    # "imbalanced", ml_advisor.py _check_data_balance only reports when
    # len(value_counts) > 1), instead of one serial groupBy().first()
    # scan per column. The stack is codegen, the groupBy is map-side
    # combinable per (column, value), and only ≤ C aggregate rows reach
    # the driver.
    top_share: dict[str, float] = {}
    cat_small = [
        c for c in categorical_cols
        if s[f"card_{c}"] and 1 < s[f"card_{c}"] < 20
    ]
    if cat_small and n:
        stack_args = ", ".join(f"'{c}', cast(`{c}` as string)" for c in cat_small)
        tops = (
            df.select(
                F.expr(f"stack({len(cat_small)}, {stack_args}) AS (_col, _val)")
            )
            .where(F.col("_val").isNotNull())
            .groupBy("_col", "_val")
            .agg(F.count(F.lit(1)).alias("_cnt"))
            .groupBy("_col")
            .agg(F.max("_cnt").alias("_top"))
            .collect()
        )
        for r in tops:
            top_share[r["_col"]] = 100.0 * r["_top"] / n

    rows: list[tuple] = []
    # missing tiers (dtype-aware impute strategy, ml_advisor.py:106-125)
    for c in all_cols:
        if not n:
            break
        pct = 100.0 * (s[f"null_{c}"] or 0) / n
        if pct > 50.0:
            rows.append(("missing_high", c, round(pct, 4), "drop"))
        elif pct > 10.0:
            strat = "impute_mean_median" if c in numeric_cols else "impute_mode_unknown"
            rows.append(("missing_impute", c, round(pct, 4), strat))
    # class imbalance (ml_advisor.py:147-162)
    for c, share in sorted(top_share.items()):
        if share > 80.0:
            rows.append(("class_imbalance", c, round(share, 4), "severe_resample"))
        elif share > 70.0:
            rows.append(("class_imbalance", c, round(share, 4), "moderate_class_weights"))
    # date features (ml_advisor.py:168-172)
    for c in datetime_cols:
        rows.append(("date_features", c, None, "extract_year_month_dow"))
    # high correlation (ml_advisor.py:185-205)
    for i, a in enumerate(numeric_cols):
        for b in numeric_cols[i + 1 :]:
            r = s[f"corr_{a}_{b}"]
            if r is not None and abs(r) > 0.8:
                rows.append(("high_correlation", f"{a}&{b}", round(abs(r), 4), "drop_one"))
    # encoding tiers (ml_advisor.py:229-251)
    for c in categorical_cols:
        card = s[f"card_{c}"] or 0
        if card == 2:
            strat = "label"
        elif 3 <= card <= 10:
            strat = "one_hot"
        elif 11 <= card <= 50:
            strat = "target_or_embedding"
        elif card > 50:
            strat = "hash_or_frequency"
        else:
            continue
        rows.append(("encoding", c, float(card), strat))
    # normalization (ml_advisor.py:261-277: range>1000 or cv>1, std>0)
    for c in numeric_cols:
        std, mean = s[f"std_{c}"], s[f"mean_{c}"]
        mn, mx = s[f"min_{c}"], s[f"max_{c}"]
        if std is None or mn is None or std <= 0:
            continue
        cv = abs(std / mean) if mean else float("inf")
        if (mx - mn) > 1000.0 or cv > 1.0:
            rows.append(("wide_range", c, round(mx - mn, 4), "standard_or_minmax_scale"))
    # low variance (ml_advisor.py:305-315)
    for c in numeric_cols:
        std = s[f"std_{c}"]
        if std is not None and std < 0.01:
            rows.append(("low_variance", c, round(std, 4), "remove"))

    return spark.createDataFrame(rows, ADVICE_SCHEMA)
