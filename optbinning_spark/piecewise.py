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


def _active_set_qp(H, f, Aeq, G, h, max_iter=200):
    """Minimize 0.5 x'Hx - f'x s.t. Aeq x = 0, G x <= h, by a primal
    active-set method (tiny dense systems; <= ~40 constraints here).
    Standard textbook algorithm — add the most-violated inequality,
    drop constraints with negative multipliers, repeat."""
    n = H.shape[0]
    active: list[int] = []

    def solve_with(act):
        rows = [Aeq] if Aeq is not None and len(Aeq) else []
        rhs_c = [np.zeros(len(Aeq))] if Aeq is not None and len(Aeq) else []
        if act:
            rows.append(G[act])
            rhs_c.append(h[act])  # active inequalities hold AT the bound
        A = np.vstack(rows) if rows else np.zeros((0, n))
        m = A.shape[0]
        KKT = np.zeros((n + m, n + m))
        KKT[:n, :n] = H
        if m:
            KKT[:n, n:] = A.T
            KKT[n:, :n] = A
        rhs = np.concatenate([f] + rhs_c) if rhs_c else f
        sol = np.linalg.lstsq(KKT, rhs, rcond=None)[0]
        lam = sol[n:]
        n_eq = len(Aeq) if Aeq is not None else 0
        return sol[:n], lam[n_eq:]

    x, lam = solve_with(active)
    for _ in range(max_iter):
        if G is not None and len(G):
            viol = G @ x - h
            worst = int(np.argmax(viol))
            if viol[worst] > 1e-9:
                if worst not in active:
                    active.append(worst)
                    x, lam = solve_with(active)
                    continue
        if active and len(lam) and lam.min() < -1e-9:
            active.pop(int(np.argmin(lam)))
            x, lam = solve_with(active)
            continue
        break
    return x


def _penalized_logistic_1d(xs, n_event, n_total, C=1.0, max_iter=200,
                           tol=1e-12):
    """sklearn-equivalent L2-penalized logistic on a value histogram:
    minimize 0.5*w^2 + C * sum_i [n_i * logloss_i] with the intercept
    unpenalized (sklearn LogisticRegression defaults). Newton on two
    parameters."""
    beta = np.zeros(2)  # (intercept, slope)
    A = np.column_stack([np.ones_like(xs), xs])
    pen = np.diag([0.0, 1.0])
    for _ in range(max_iter):
        z = A @ beta
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -35, 35)))
        g = C * A.T @ (n_event - n_total * p) - pen @ beta
        W = C * n_total * p * (1.0 - p)
        H = A.T @ (A * W[:, None]) + pen
        step = np.linalg.solve(H, g)
        beta = beta + step
        if np.max(np.abs(step)) < tol:
            break
    return beta


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

    def fit(self, df: DataFrame, x: str, y: str, lb=None, ub=None):
        self.name = self.name or x
        if lb is not None:
            self.lb = lb
        if ub is not None:
            self.ub = ub
        # stage 1: inner optimal binning proposes the knots (reference
        # piecewise/base.py:380-401 — the standard binary/continuous
        # OptimalBinning with the same defaults)
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

        if self.objective == "binary":
            self._fit_binary(df, x, y)
        else:
            self._fit_ls_on_target(df, x, y)
        if self.objective == "binary":
            t = inner.binning_table
            self._t_ne = float(np.sum(t.ne_all))
            self._t_ev = float(np.sum(t.ev_all))
            # reference default: NO clipping unless lb/ub passed
        self._fitted = True
        return self

    def _fit_binary(self, df, x, y):
        """Reference binary pipeline (piecewise/binning.py:345-360):
        smooth the target with an L2-penalized single-feature logistic
        regression (sklearn LogisticRegression C=1 semantics, intercept
        unpenalized), then least-squares fit the PREDICTED event rate
        over the bins. Sufficient statistics are the per-distinct-value
        class counts — one aggregation (shared histogram contract)."""
        from .operators.prebinning import value_histogram

        values, stats = value_histogram(
            df, x, y, None, task="classification", classes=[0, 1]
        )
        n0, n1 = stats[:, 0], stats[:, 1]
        w = n0 + n1
        beta = _penalized_logistic_1d(values, n1, w)
        pred = 1.0 / (1.0 + np.exp(-(beta[0] + beta[1] * values)))
        # reference base.py:439-449: monotonic trend from the ACTUAL
        # per-bin event rates over the optimal splits
        idx = (np.digitize(values, self.splits_) if len(self.splits_)
               else np.zeros(len(values), dtype=int))
        k = len(self.splits_) + 1
        rates = np.array([
            n1[idx == b].sum() / max(w[idx == b].sum(), _EPS)
            for b in range(k)
        ])
        mono = self._resolve_monotonic(rates)
        self._fit_ls_points(values, pred, w, monotonic=mono,
                            xmin=float(values.min()), xmax=float(values.max()))

    @staticmethod
    def _resolve_monotonic_auto(bin_means: np.ndarray):
        """Reference base.py:439-450: classify the per-bin means; keep
        peak/valley as QP constraint families, drop only genuinely
        non-monotonic shapes."""
        from .core.metrics import type_of_monotonic_trend

        t = type_of_monotonic_trend(np.asarray(bin_means, dtype=float))
        if t in ("undefined", "no monotonic"):
            return None
        if "peak" in t:
            return "peak"
        if "valley" in t:
            return "valley"
        return t

    def _resolve_monotonic(self, bin_means: np.ndarray):
        if self.monotonic_trend == "auto":
            return self._resolve_monotonic_auto(bin_means)
        return self.monotonic_trend

    def _fit_ls_on_target(self, df, x, y):
        """Continuous objective: LSQ of y over x (one aggregation of
        per-bin moments)."""
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
                F.min(xc).alias("mnx"),
                F.max(xc).alias("mxx"),
            )
            .collect()
        )
        k = len(self.splits_) + 1
        n = np.zeros(k)
        sx = np.zeros(k)
        sxx = np.zeros(k)
        sy = np.zeros(k)
        sxy = np.zeros(k)
        xmin, xmax = np.inf, -np.inf
        for r in rows:
            i = int(r["bin"])
            n[i], sx[i], sxx[i] = r["n"], r["sx"], r["sxx"]
            sy[i], sxy[i] = r["sy"], r["sxy"]
            xmin = min(xmin, r["mnx"])
            xmax = max(xmax, r["mxx"])
        # reference base.py:439-450 (continuous variant): auto trend
        # from the per-bin target means over the optimal splits
        means = sy / np.maximum(n, _EPS)
        mono = self._resolve_monotonic(means)
        self._solve_ls(n, sx, sxx, sy, sxy, monotonic=mono,
                       xmin=float(xmin) if np.isfinite(xmin) else None,
                       xmax=float(xmax) if np.isfinite(xmax) else None)

    def _fit_ls_points(self, xs, ys, ws, monotonic=None, xmin=None, xmax=None):
        """Weighted LSQ sufficient stats from driver-side points."""
        k = len(self.splits_) + 1
        idx = np.digitize(xs, self.splits_) if len(self.splits_) else np.zeros(
            len(xs), dtype=int
        )
        n = np.zeros(k)
        sx = np.zeros(k)
        sxx = np.zeros(k)
        sy = np.zeros(k)
        sxy = np.zeros(k)
        for b in range(k):
            m = idx == b
            wm = ws[m]
            n[b] = wm.sum()
            sx[b] = (wm * xs[m]).sum()
            sxx[b] = (wm * xs[m] * xs[m]).sum()
            sy[b] = (wm * ys[m]).sum()
            sxy[b] = (wm * xs[m] * ys[m]).sum()
        self._solve_ls(n, sx, sxx, sy, sxy, monotonic=monotonic,
                       xmin=xmin, xmax=xmax)

    def _solve_ls(self, n, sx, sxx, sy, sxy, monotonic=None, xmin=None,
                  xmax=None):
        """Exact KKT / active-set QP solve of the
        continuity-constrained piecewise LS, with optional monotonic
        slope-sign constraints and lb/ub bound constraints at the
        piece endpoints (matching ropwr's constraint families for the
        L2 objective).

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
        # inequality constraints: monotone slope signs + lb/ub bounds
        # at the endpoints of each linear piece
        def bound_rows():
            rows_, vals_ = [], []
            if (self.lb is not None or self.ub is not None) and xmin is not None:
                pts = [xmin] + [float(s) for s in self.splits_] + [xmax]
                for b in range(k):
                    for t in (pts[b], pts[b + 1]):
                        if self.ub is not None:
                            row = np.zeros(d * k)
                            row[d * b] = 1.0
                            row[d * b + 1] = t
                            rows_.append(row)
                            vals_.append(float(self.ub))
                        if self.lb is not None:
                            row = np.zeros(d * k)
                            row[d * b] = -1.0
                            row[d * b + 1] = -t
                            rows_.append(row)
                            vals_.append(-float(self.lb))
            return rows_, vals_

        def slope_rows(signs):
            # signs[b] = +1 -> slope_b >= 0; -1 -> slope_b <= 0; 0 free
            rows_, vals_ = [], []
            for b in range(k):
                if signs[b] == 0:
                    continue
                row = np.zeros(d * k)
                row[d * b + 1] = -float(signs[b])  # -sign*c_b <= 0
                rows_.append(row)
                vals_.append(0.0)
            return rows_, vals_

        def solve(G_rows, h_vals):
            if G_rows:
                return _active_set_qp(
                    H, f, A, np.array(G_rows), np.array(h_vals)
                )
            m = A.shape[0]
            KKT = np.zeros((d * k + m, d * k + m))
            KKT[: d * k, : d * k] = H
            if m:
                KKT[: d * k, d * k :] = A.T
                KKT[d * k :, : d * k] = A
            rhs = np.concatenate([f, np.zeros(m)])
            # lstsq tolerates singular degenerate systems
            sol = np.linalg.lstsq(KKT, rhs, rcond=None)[0]
            return sol[: d * k]

        br, bv = bound_rows()
        if monotonic in ("peak", "valley") and self.degree == 1:
            # ropwr's peak/valley families allow ONE trend change
            # point; the change position is not data-sized (k <= ~20),
            # so enumerate it and keep the lowest-objective solution
            # (reference piecewise monotonic_trend="peak"/"valley").
            up = 1 if monotonic == "peak" else -1
            best, best_obj = None, np.inf
            for t in range(k + 1):
                signs = [up] * t + [-up] * (k - t)
                sr, sv = slope_rows(signs)
                theta_t = solve(sr + br, sv + bv)
                obj = 0.5 * theta_t @ H @ theta_t - f @ theta_t
                if obj < best_obj - 1e-12:
                    best, best_obj = theta_t, obj
            theta = best
        else:
            G_rows, h_vals = list(br), list(bv)
            if monotonic in ("ascending", "descending") and self.degree == 1:
                sgn = 1 if monotonic == "ascending" else -1
                sr, sv = slope_rows([sgn] * k)
                G_rows += sr
                h_vals += sv
            theta = solve(G_rows, h_vals)
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
            # reference transform_event_rate_to_woe
            # (transformations.py:19-37): log((1/er - 1) * tE/tNE) with
            # totals incl. special+missing
            p = F.greatest(F.least(expr, F.lit(1 - 1e-12)), F.lit(1e-12))
            ratio = float(self._t_ev) / max(float(self._t_ne), _EPS)
            return F.log((F.lit(1.0) / p - 1.0) * F.lit(ratio))
        raise ValueError(f"unknown metric {metric}")

    def transform(self, df, x, metric="mean", out_col=None):
        return df.withColumn(
            out_col or f"{x}_pw", self.transform_expr(F.col(x).cast("double"), metric)
        )

    def divergences(self, df: DataFrame, x: str, y: str) -> dict:
        """Asymptotic divergences of the piecewise event-rate model
        (reference piecewise/metrics.py:38-90): per-sample
        pi = (1-er)/(1-p), qi = er/p, divergence averaged over clean
        samples. ONE aggregation over the transformed column."""
        self._check()
        xc = F.col(x).cast("double")
        clean = df.filter(xc.isNotNull() & ~F.isnan(xc)
                          & F.col(y).isNotNull())
        er = self.transform_expr(xc, "event_rate")
        er = F.greatest(F.least(er, F.lit(1.0 - 1e-15)), F.lit(1e-15))
        t_ev, t_ne = self._t_ev, self._t_ne
        p = t_ev / max(t_ev + t_ne, _EPS)
        pi = (1.0 - er) / (1.0 - p)
        qi = er / p
        iv_term = (pi - qi) * F.log(pi / qi)
        m = (pi + qi) / 2
        js_term = 0.5 * (
            pi * F.log(pi / m) + qi * F.log(qi / m)
        )
        row = clean.agg(
            F.count("*").alias("n"),
            F.sum(iv_term).alias("iv"),
            F.sum(js_term).alias("js"),
        ).first()
        n = float(row["n"])
        return {
            "iv": float(row["iv"]) / n,
            "js": float(row["js"]) / n,
        }

    def _check(self):
        if not self._fitted:
            raise RuntimeError("OptimalPWBinning is not fitted")
