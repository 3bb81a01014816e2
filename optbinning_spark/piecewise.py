"""OptimalPWBinning — piecewise-polynomial binning (O11, F6).

Reference: optbinning/binning/piecewise/ — an inner OptimalBinning
proposes bins; ropwr (cvxpy) fits a continuous piecewise polynomial of
the target over x; transform evaluates the polynomial (clipped).

Spark-native replacement: the piecewise least-squares fit with
continuity constraints is an EXACT small KKT linear system whose
coefficients are per-bin sufficient statistics
(sum w, swx, swx2, swy, swxy, + degree-2 moments) — ONE grouped
aggregation. No convex solver needed for the L2 objective the
reference defaults to; monotonicity/robust objectives are documented
as not supported in this version.

Transform (F6) is arithmetic on columns: coef0[bin] + coef1[bin]*x,
clipped to [lb, ub] — map-only, SQL-expressible.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .binning import ContinuousOptimalBinning, OptimalBinning
from .operators.preprocessing import numeric_bin_expr

_EPS = 1e-15


class OptimalPWBinning:
    def __init__(
        self,
        name: str = "",
        objective: str = "binary",  # "binary" | "continuous"
        degree: int = 1,
        continuity: bool = True,
        prebinning_method: str = "quantile",
        max_n_prebins: int = 20,
        monotonic_trend: str | None = "auto",
        lb: float | None = None,
        ub: float | None = None,
    ):
        if degree not in (0, 1):
            raise ValueError("degree must be 0 or 1 in this version")
        self.name = name
        self.objective = objective
        self.degree = degree
        self.continuity = continuity
        self.prebinning_method = prebinning_method
        self.max_n_prebins = max_n_prebins
        self.monotonic_trend = monotonic_trend
        self.lb = lb
        self.ub = ub
        self._fitted = False

    def fit(self, df: DataFrame, x: str, y: str):
        self.name = self.name or x
        # stage 1: inner optimal binning proposes the knots
        if self.objective == "binary":
            inner = OptimalBinning(
                prebinning_method=self.prebinning_method,
                max_n_prebins=self.max_n_prebins,
                monotonic_trend=self.monotonic_trend,
            )
        else:
            inner = ContinuousOptimalBinning(
                prebinning_method=self.prebinning_method,
                max_n_prebins=self.max_n_prebins,
                monotonic_trend=self.monotonic_trend,
            )
        inner.fit(df, x, y)
        self.splits_ = np.asarray(inner.splits, dtype=float)
        self.inner_ = inner

        # stage 2: ONE aggregation for the LS sufficient statistics
        xc = F.col(x).cast("double")
        yc = F.col(y).cast("double")
        clean = df.filter(
            xc.isNotNull() & ~F.isnan(xc) & yc.isNotNull() & ~F.isnan(yc)
        )
        b = numeric_bin_expr(xc, self.splits_)
        rows = (
            clean.groupBy(b.alias("bin"))
            .agg(
                F.count("*").alias("n"),
                F.sum(xc).alias("sx"),
                F.sum(xc * xc).alias("sxx"),
                F.sum(yc).alias("sy"),
                F.sum(xc * yc).alias("sxy"),
            )
            .collect()
        )
        k = len(self.splits_) + 1
        n = np.zeros(k)
        sx = np.zeros(k)
        sxx = np.zeros(k)
        sy = np.zeros(k)
        sxy = np.zeros(k)
        for r in rows:
            i = int(r["bin"])
            n[i], sx[i], sxx[i] = r["n"], r["sx"], r["sxx"]
            sy[i], sxy[i] = r["sy"], r["sxy"]
        self._solve_ls(n, sx, sxx, sy, sxy)
        if self.lb is None:
            self.lb = 0.0 if self.objective == "binary" else None
        if self.ub is None:
            self.ub = 1.0 if self.objective == "binary" else None
        self._fitted = True
        return self

    def _solve_ls(self, n, sx, sxx, sy, sxy):
        """Exact KKT solve of the continuity-constrained piecewise LS.

        Parameters theta = (a_0, c_0, ..., a_{k-1}, c_{k-1}) with bin
        model y ~ a_b + c_b x (c_b = 0 for degree 0). Objective is the
        sum of per-bin quadratic forms built from sufficient stats;
        constraints a_b + c_b s = a_{b+1} + c_{b+1} s at each knot."""
        k = len(n)
        d = 2  # params per bin (intercept, slope)
        H = np.zeros((d * k, d * k))
        f = np.zeros(d * k)
        for b in range(k):
            if n[b] <= 0:
                # tie degenerate bins to zero slope / neighbor mean
                H[d * b, d * b] = 1.0
                H[d * b + 1, d * b + 1] = 1.0
                continue
            H[d * b, d * b] = n[b]
            H[d * b, d * b + 1] = sx[b]
            H[d * b + 1, d * b] = sx[b]
            H[d * b + 1, d * b + 1] = sxx[b] if self.degree == 1 else 1.0
            f[d * b] = sy[b]
            f[d * b + 1] = sxy[b] if self.degree == 1 else 0.0
        if self.degree == 0:
            # force slopes to 0 via constraints
            A = np.zeros((k + (k - 1 if self.continuity else 0), d * k))
            for b in range(k):
                A[b, d * b + 1] = 1.0
            row = k
        else:
            A = np.zeros(((k - 1 if self.continuity else 0), d * k))
            row = 0
        if self.continuity:
            for j, s in enumerate(self.splits_):
                A[row + j, d * j] = 1.0
                A[row + j, d * j + 1] = s
                A[row + j, d * (j + 1)] = -1.0
                A[row + j, d * (j + 1) + 1] = -s
        m = A.shape[0]
        KKT = np.zeros((d * k + m, d * k + m))
        KKT[: d * k, : d * k] = H
        if m:
            KKT[: d * k, d * k :] = A.T
            KKT[d * k :, : d * k] = A
        rhs = np.concatenate([f, np.zeros(m)])
        # ridge jitter for singular degenerate systems
        sol = np.linalg.lstsq(KKT, rhs, rcond=None)[0]
        theta = sol[: d * k]
        self.coef0_ = theta[0::2]
        self.coef1_ = theta[1::2] if self.degree == 1 else np.zeros(k)

    # ------------------------------------------------------------------
    def transform_expr(self, col, metric: str = "mean"):
        self._check()
        splits = list(self.splits_)
        expr = None
        for i in range(len(splits) + 1):
            val = F.lit(float(self.coef0_[i])) + F.lit(float(self.coef1_[i])) * col
            if i < len(splits):
                cond = col < float(splits[i])
                expr = F.when(cond, val) if expr is None else expr.when(cond, val)
            else:
                expr = expr.otherwise(val) if expr is not None else val
        if self.lb is not None:
            expr = F.greatest(expr, F.lit(float(self.lb)))
        if self.ub is not None:
            expr = F.least(expr, F.lit(float(self.ub)))
        if metric in ("mean", "event_rate"):
            return expr
        if metric == "woe":
            # clip away from {0,1} then log-odds vs base rate
            p = F.greatest(F.least(expr, F.lit(1 - 1e-6)), F.lit(1e-6))
            return F.log((1 - p) / p)
        raise ValueError(f"unknown metric {metric}")

    def transform(self, df, x, metric="mean", out_col=None):
        return df.withColumn(
            out_col or f"{x}_pw", self.transform_expr(F.col(x).cast("double"), metric)
        )

    def _check(self):
        if not self._fitted:
            raise RuntimeError("OptimalPWBinning is not fitted")
