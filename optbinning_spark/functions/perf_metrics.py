"""Classification / regression performance metrics as single-pass
Spark aggregations (reference: optbinning/scorecard/metrics/
classification.py:15-115, regression.py:17-169).

Each report is ONE hash aggregation over the scored DataFrame — a
single shuffle-free reduce (partial + final agg) that scales to any
row count; the handful of derived ratios are computed as column
expressions over the 1-row aggregate, keeping the whole computation
JVM-side and oracle-checkable in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPS = 1e-12


def classification_report(df: DataFrame, y_col: str, pred_col: str) -> DataFrame:
    """Confusion counts + derived rates for a binary prediction
    column (reference classification.py:15-115). Returns a 1-row
    DataFrame: tp/fp/fn/tn, accuracy, tpr, tnr, balanced_accuracy."""
    y = F.col(y_col)
    p = F.col(pred_col)
    agg = df.agg(
        F.sum(F.when((p == 1) & (y == 1), 1).otherwise(0)).alias("tp"),
        F.sum(F.when((p == 1) & (y == 0), 1).otherwise(0)).alias("fp"),
        F.sum(F.when((p == 0) & (y == 1), 1).otherwise(0)).alias("fn"),
        F.sum(F.when((p == 0) & (y == 0), 1).otherwise(0)).alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c).cast("double") for c in ("tp", "fp", "fn", "tn"))
    tpr = tp / (tp + fn)
    tnr = tn / (tn + fp)
    return agg.select(
        "tp", "fp", "fn", "tn",
        ((tp + tn) / (tp + tn + fp + fn)).alias("accuracy"),
        tpr.alias("tpr"),
        tnr.alias("tnr"),
        ((tpr + tnr) / 2.0).alias("balanced_accuracy"),
    )


def regression_report(df: DataFrame, y_col: str, pred_col: str) -> DataFrame:
    """Regression error metrics for a prediction column (reference
    regression.py:17-169): MAE, MSE, RMSE, median AE, MAPE, SMAPE,
    R². One aggregation; exact median via F.percentile."""
    y = F.col(y_col)
    p = F.col(pred_col)
    err = p - y
    agg = df.agg(
        F.count("*").alias("n"),
        F.avg(F.abs(err)).alias("mae"),
        F.avg(err * err).alias("mse"),
        F.percentile(F.abs(err), F.lit(0.5)).alias("median_ae"),
        F.avg(F.abs(err) / F.greatest(F.abs(y), F.lit(_EPS))).alias("mape"),
        F.avg(
            F.lit(2.0) * F.abs(err)
            / F.greatest(F.abs(y) + F.abs(p), F.lit(_EPS))
        ).alias("smape"),
        F.sum(err * err).alias("sse"),
        F.sum(y * y).alias("syy"),
        F.sum(y).alias("sy"),
    )
    sst = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    return agg.select(
        "n", "mae", "mse",
        F.sqrt(F.col("mse")).alias("rmse"),
        "median_ae", "mape", "smape",
        (F.lit(1.0) - F.col("sse") / sst).alias("r2"),
    )
