"""Outlier detection operators (P5-P7).

Reference: optbinning/binning/outlier.py — RangeDetector (ETI/HDI
interval +- k*IQR), ModifiedZScoreDetector (median/MAD), and
YQuantileDetector (per-x-quantile-bin detection on y).

Spark design: fit = one or two exact ``percentile`` aggregations
(driver receives a handful of scalars); support/transform = a pure
predicate column. The per-bin Y detector is ONE grouped aggregation
with percentile aggregates per bin — no per-group subqueries.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class RangeDetector:
    """Interval-based detector: [q_lo - k*IQR, q_hi + k*IQR]
    (reference outlier.py:69-127). ETI = equal-tailed percentile
    interval (one percentile agg); HDI = narrowest window containing
    ceil(interval_length * n) sorted values, found with a global-order
    lead() window (HDI inherently needs order statistics)."""

    def __init__(self, interval_length: float = 0.5, k: float = 1.5,
                 method: str = "ETI"):
        if not 0 < interval_length < 1:
            raise ValueError("interval_length must be in (0, 1)")
        if method not in ("ETI", "HDI"):
            raise ValueError('method must be "ETI" or "HDI"')
        self.interval_length = interval_length
        self.k = k
        self.method = method
        self._fitted = False

    def fit(self, df: DataFrame, col: str):
        if self.method == "ETI":
            a = (1.0 - self.interval_length) / 2.0
            r = df.agg(
                F.percentile(col, F.lit(a)).alias("lo"),
                F.percentile(col, F.lit(1.0 - a)).alias("hi"),
            ).first()
            lo, hi = float(r["lo"]), float(r["hi"])
        else:
            from pyspark.sql import Window as W

            import math

            vals = df.select(F.col(col).alias("v")).filter(
                F.col("v").isNotNull()
            )
            n = vals.count()
            n_included = int(math.ceil(self.interval_length * n))
            w = W.orderBy("v")
            paired = vals.withColumn("u", F.lead("v", n_included).over(w))
            r = (
                paired.filter(F.col("u").isNotNull())
                .agg(
                    F.min_by(
                        F.struct("v", "u"), F.col("u") - F.col("v")
                    ).alias("b")
                )
                .first()["b"]
            )
            lo, hi = float(r["v"]), float(r["u"])
        iqr = hi - lo
        self.lb_ = lo - self.k * iqr
        self.ub_ = hi + self.k * iqr
        self._fitted = True
        return self

    def outlier_predicate(self, col: Column) -> Column:
        self._check()
        return (col < self.lb_) | (col > self.ub_)

    def filter_outliers(self, df: DataFrame, col: str) -> DataFrame:
        return df.filter(~self.outlier_predicate(F.col(col)))

    def _check(self):
        if not self._fitted:
            raise RuntimeError("detector not fitted")


class ModifiedZScoreDetector:
    """0.6745 * |x - median| / MAD > threshold
    (reference outlier.py:130-162)."""

    def __init__(self, threshold: float = 3.5):
        self.threshold = threshold
        self._fitted = False

    def fit(self, df: DataFrame, col: str):
        med = df.agg(F.percentile(col, F.lit(0.5))).first()[0]
        mad = df.agg(
            F.percentile(F.abs(F.col(col) - F.lit(med)), F.lit(0.5))
        ).first()[0]
        self.median_ = float(med)
        self.mad_ = float(mad)
        self._fitted = True
        return self

    def outlier_predicate(self, col: Column) -> Column:
        if not self._fitted:
            raise RuntimeError("detector not fitted")
        if self.mad_ == 0:
            return F.lit(False)
        z = F.lit(0.6745) * F.abs(col - F.lit(self.median_)) / F.lit(self.mad_)
        return z > self.threshold

    def filter_outliers(self, df: DataFrame, col: str) -> DataFrame:
        return df.filter(~self.outlier_predicate(F.col(col)))


class YQuantileDetector:
    """Per-x-quantile-bin outlier detection on y (reference
    outlier.py:165-227): bin x into n_bins quantile buckets, run an
    inner detector on y within each bin.

    One percentile agg for the x-edges + ONE grouped aggregation
    computing every bin's y-quantiles simultaneously; the outlier
    predicate is then a CASE over bins — the grouped statistics come
    back as a broadcastable handful of rows.
    """

    def __init__(self, n_bins: int = 5, method: str = "zscore",
                 interval_length: float = 0.5, k: float = 1.5,
                 threshold: float = 3.5):
        self.n_bins = n_bins
        self.method = method
        self.interval_length = interval_length
        self.k = k
        self.threshold = threshold
        self._fitted = False

    def fit(self, df: DataFrame, x_col: str, y_col: str):
        # exact interpolated percentiles for the x-edges (matches
        # np.quantile's linear interpolation, reference outlier.py:205)
        probs = list(np.linspace(0, 1, self.n_bins + 1)[1:-1])
        row = df.agg(
            F.percentile(x_col, F.array(*[F.lit(p) for p in probs])).alias("q")
        ).first()
        edges = sorted(set(float(v) for v in row["q"]))
        self.x_edges_ = edges
        from .preprocessing import numeric_bin_expr

        b = numeric_bin_expr(F.col(x_col), edges)
        if self.method == "range":
            a = (1.0 - self.interval_length) / 2.0
            rows = (
                df.groupBy(b.alias("bin"))
                .agg(
                    F.percentile(y_col, F.lit(a)).alias("lo"),
                    F.percentile(y_col, F.lit(1.0 - a)).alias("hi"),
                )
                .collect()
            )
            self.bounds_ = {}
            for r in rows:
                iqr = r["hi"] - r["lo"]
                self.bounds_[int(r["bin"])] = (
                    r["lo"] - self.k * iqr,
                    r["hi"] + self.k * iqr,
                )
        elif self.method == "zscore":
            med_rows = (
                df.groupBy(b.alias("bin"))
                .agg(F.percentile(y_col, F.lit(0.5)).alias("med"))
                .collect()
            )
            meds = {int(r["bin"]): r["med"] for r in med_rows}
            med_e = F.lit(None).cast("double")
            for bin_id, m in meds.items():
                med_e = F.when(b == bin_id, F.lit(m)).otherwise(med_e)
            mad_rows = (
                df.groupBy(b.alias("bin"))
                .agg(
                    F.percentile(F.abs(F.col(y_col) - med_e), F.lit(0.5)).alias("mad")
                )
                .collect()
            )
            self.stats_ = {
                int(r["bin"]): (meds[int(r["bin"])], r["mad"]) for r in mad_rows
            }
        else:
            raise ValueError(f"unknown method {self.method}")
        self._fitted = True
        return self

    def outlier_predicate(self, x_col: Column, y_col: Column) -> Column:
        if not self._fitted:
            raise RuntimeError("detector not fitted")
        from .preprocessing import numeric_bin_expr

        b = numeric_bin_expr(x_col, self.x_edges_)
        pred = F.lit(False)
        if self.method == "range":
            for bin_id, (lb, ub) in self.bounds_.items():
                pred = F.when(
                    b == bin_id, (y_col < lb) | (y_col > ub)
                ).otherwise(pred)
        else:
            for bin_id, (med, mad) in self.stats_.items():
                if mad and mad > 0:
                    z = F.lit(0.6745) * F.abs(y_col - F.lit(med)) / F.lit(mad)
                    pred = F.when(b == bin_id, z > self.threshold).otherwise(pred)
        return pred

    def filter_outliers(self, df: DataFrame, x_col: str, y_col: str) -> DataFrame:
        return df.filter(~self.outlier_predicate(F.col(x_col), F.col(y_col)))
