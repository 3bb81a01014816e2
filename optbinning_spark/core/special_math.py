"""Pure-numpy special functions (no scipy in this environment).

Implements the statistical tests the reference engine needs:
chi-squared survival function (regularized upper incomplete gamma),
Student-t survival function (regularized incomplete beta), and the
normal survival function. Algorithms are the classical series /
continued-fraction expansions (Abramowitz & Stegun 6.5.29, 26.5.8;
Lentz's method), public-domain numerics.

Reference parity targets:
- chi2 contingency test between consecutive bins
  (reference: optbinning/binning/metrics.py:256-304 uses scipy).
- t-test between consecutive bins for continuous targets
  (reference: optbinning/binning/binning_statistics.py:1987-2006).
"""

from __future__ import annotations

import math

import numpy as np

_EPS = 1e-15
_FPMIN = 1e-300
_MAX_ITER = 500


def _gamma_p_series(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x) by series expansion."""
    if x <= 0.0:
        return 0.0
    ap = a
    summ = 1.0 / a
    delta = summ
    for _ in range(_MAX_ITER):
        ap += 1.0
        delta *= x / ap
        summ += delta
        if abs(delta) < abs(summ) * _EPS:
            break
    return summ * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _gamma_q_contfrac(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x) by continued fraction."""
    b = x + 1.0 - a
    c = 1.0 / _FPMIN
    d = 1.0 / b
    h = d
    for i in range(1, _MAX_ITER + 1):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = b + an / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return math.exp(-x + a * math.log(x) - math.lgamma(a)) * h


def gammainc_p(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x)."""
    if x < 0 or a <= 0:
        raise ValueError("bad arguments to gammainc_p")
    if x == 0.0:
        return 0.0
    if x < a + 1.0:
        return _gamma_p_series(a, x)
    return 1.0 - _gamma_q_contfrac(a, x)


def gammainc_q(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x) = 1 - P(a, x)."""
    if x < 0 or a <= 0:
        raise ValueError("bad arguments to gammainc_q")
    if x == 0.0:
        return 1.0
    if x < a + 1.0:
        return 1.0 - _gamma_p_series(a, x)
    return _gamma_q_contfrac(a, x)


def chi2_sf(x: float, df: float) -> float:
    """Survival function of the chi-squared distribution."""
    if x <= 0:
        return 1.0
    return gammainc_q(df / 2.0, x / 2.0)


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta function (Lentz)."""
    qab = a + b
    qap = a + 1.0
    qam = a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < _FPMIN:
        d = _FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, _MAX_ITER + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return h


def betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta function I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log(1.0 - x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def beta_ppf(a: float, b: float, q: float) -> float:
    """Quantile (inverse CDF) of the Beta(a, b) distribution, by
    bisection on the regularized incomplete beta (monotone; 90
    halvings bottom out at double precision)."""
    if q <= 0.0:
        return 0.0
    if q >= 1.0:
        return 1.0
    lo, hi = 0.0, 1.0
    for _ in range(90):
        mid = 0.5 * (lo + hi)
        if betainc(a, b, mid) < q:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def _betacf_vec(a: float, b: float, x: np.ndarray) -> np.ndarray:
    """Vectorized Lentz continued fraction: scalar (a, b), array x.
    Same recurrence as ``_betacf`` per lane; converged lanes freeze, the
    loop stops when every lane has converged."""
    x = np.asarray(x, dtype=float)
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = np.ones_like(x)
    d = 1.0 - qab * x / qap
    d = np.where(np.abs(d) < _FPMIN, _FPMIN, d)
    d = 1.0 / d
    h = d.copy()
    active = np.ones(x.shape, dtype=bool)
    for m in range(1, _MAX_ITER + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d1 = 1.0 + aa * d
        d1 = np.where(np.abs(d1) < _FPMIN, _FPMIN, d1)
        c1 = 1.0 + aa / c
        c1 = np.where(np.abs(c1) < _FPMIN, _FPMIN, c1)
        d1 = 1.0 / d1
        h1 = h * d1 * c1
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d2 = 1.0 + aa * d1
        d2 = np.where(np.abs(d2) < _FPMIN, _FPMIN, d2)
        c2 = 1.0 + aa / c1
        c2 = np.where(np.abs(c2) < _FPMIN, _FPMIN, c2)
        d2 = 1.0 / d2
        delta = d2 * c2
        h2 = h1 * delta
        d = np.where(active, d2, d)
        c = np.where(active, c2, c)
        h = np.where(active, h2, h)
        active &= np.abs(delta - 1.0) >= _EPS
        if not active.any():
            break
    return h


def betainc_vec(a: float, b: float, x: np.ndarray) -> np.ndarray:
    """Vectorized regularized incomplete beta I_x(a, b)."""
    x = np.asarray(x, dtype=float)
    out = np.empty_like(x)
    out[x <= 0.0] = 0.0
    out[x >= 1.0] = 1.0
    mid = (x > 0.0) & (x < 1.0)
    if mid.any():
        xm = x[mid]
        front = np.exp(
            math.lgamma(a + b)
            - math.lgamma(a)
            - math.lgamma(b)
            + a * np.log(xm)
            + b * np.log1p(-xm)
        )
        direct = xm < (a + 1.0) / (a + b + 2.0)
        res = np.empty_like(xm)
        if direct.any():
            res[direct] = front[direct] * _betacf_vec(a, b, xm[direct]) / a
        if (~direct).any():
            res[~direct] = (
                1.0 - front[~direct] * _betacf_vec(b, a, 1.0 - xm[~direct]) / b
            )
        out[mid] = res
    return out


def _norm_ppf_approx(q: np.ndarray) -> np.ndarray:
    """Acklam's rational approximation to the standard-normal quantile
    (~1e-9 relative error) — only used as a Newton starting point."""
    a = (-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00)
    b = (-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01)
    c = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00)
    d = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00)
    q = np.asarray(q, dtype=float)
    out = np.empty_like(q)
    low = q < 0.02425
    high = q > 1.0 - 0.02425
    mid = ~(low | high)
    if mid.any():
        r = q[mid] - 0.5
        s = r * r
        out[mid] = (
            ((((a[0] * s + a[1]) * s + a[2]) * s + a[3]) * s + a[4]) * s + a[5]
        ) * r / (((((b[0] * s + b[1]) * s + b[2]) * s + b[3]) * s + b[4]) * s + 1)
    for sel, sign in ((low, 1.0), (high, -1.0)):
        if sel.any():
            qq = q[sel] if sign > 0 else 1.0 - q[sel]
            r = np.sqrt(-2.0 * np.log(qq))
            out[sel] = sign * (
                ((((c[0] * r + c[1]) * r + c[2]) * r + c[3]) * r + c[4]) * r + c[5]
            ) / ((((d[0] * r + d[1]) * r + d[2]) * r + d[3]) * r + 1)
    return out


def beta_ppf_vec(a: float, b: float, q: np.ndarray) -> np.ndarray:
    """Vectorized Beta(a, b) quantile: safeguarded Newton on the
    regularized incomplete beta (derivative = beta pdf), bisection
    fallback keeps the bracket valid; converged lanes drop out so the
    per-iteration ``betainc_vec`` only covers active lanes. A normal-
    approximation start makes typical convergence 3-6 iterations."""
    q = np.asarray(q, dtype=float)
    lo = np.zeros_like(q)
    hi = np.ones_like(q)
    mu = a / (a + b)
    sigma = math.sqrt(a * b / ((a + b) ** 2 * (a + b + 1.0)))
    x = np.clip(mu + sigma * _norm_ppf_approx(np.clip(q, 1e-300, 1.0)),
                1e-15, 1.0 - 1e-15)
    ln_beta = math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)
    active = (q > 0.0) & (q < 1.0)
    for _ in range(100):
        if not active.any():
            break
        xa = x[active]
        qa = q[active]
        f = betainc_vec(a, b, xa) - qa
        la = np.where(f < 0, xa, lo[active])
        ha = np.where(f < 0, hi[active], xa)
        with np.errstate(divide="ignore", over="ignore", invalid="ignore"):
            pdf = np.exp(
                (a - 1.0) * np.log(xa) + (b - 1.0) * np.log1p(-xa) - ln_beta
            )
            step = np.where(pdf > 0, f / pdf, np.nan)
        xn = xa - step
        bad = ~np.isfinite(xn) | (xn <= la) | (xn >= ha)
        xn = np.where(bad, 0.5 * (la + ha), xn)
        lo[active] = la
        hi[active] = ha
        x[active] = xn
        conv = (np.abs(xn - xa) <= 1e-13 * np.abs(xn)) | (
            (ha - la) <= 4.0 * _EPS * np.abs(xn)
        )
        act = active.copy()
        act[active] = ~conv
        active = act
    return np.where(q <= 0.0, 0.0, np.where(q >= 1.0, 1.0, x))


def t_sf(t: float, df: float) -> float:
    """Survival function of Student's t distribution, P(T > t)."""
    if df <= 0:
        raise ValueError("df must be positive")
    x = df / (df + t * t)
    p = 0.5 * betainc(df / 2.0, 0.5, x)
    return p if t >= 0 else 1.0 - p


def norm_sf(z: float) -> float:
    """Survival function of the standard normal distribution."""
    return 0.5 * math.erfc(z / math.sqrt(2.0))


def chi2_contingency_2xk(counts: np.ndarray) -> tuple[float, float]:
    """Pearson chi-squared test (no continuity correction) on a 2 x k
    contingency table; returns (statistic, p-value).

    Mirrors the reference's consecutive-bin significance test
    (optbinning metrics.py:256-275, scipy chi2_contingency with
    correction=False).
    """
    obs = np.asarray(counts, dtype=float)
    row = obs.sum(axis=1, keepdims=True)
    col = obs.sum(axis=0, keepdims=True)
    total = obs.sum()
    if total <= 0 or np.any(row == 0) or np.any(col == 0):
        return 0.0, 1.0
    expected = row @ col / total
    stat = float(((obs - expected) ** 2 / expected).sum())
    dof = (obs.shape[0] - 1) * (obs.shape[1] - 1)
    return stat, chi2_sf(stat, dof)


def welch_ttest_from_stats(
    mean1: float, std1: float, n1: float, mean2: float, std2: float, n2: float
) -> tuple[float, float]:
    """Two-sided Welch t-test from summary statistics; (stat, p-value).

    Mirrors scipy.stats.ttest_ind_from_stats(equal_var=False) as used by
    the reference's continuous-binning p-value constraint
    (binning_statistics.py:1987-2006).
    """
    if n1 <= 1 or n2 <= 1:
        return 0.0, 1.0
    v1 = std1 * std1 / n1
    v2 = std2 * std2 / n2
    denom = math.sqrt(v1 + v2)
    if denom == 0.0:
        return 0.0, 1.0
    t = (mean1 - mean2) / denom
    df_num = (v1 + v2) ** 2
    df_den = v1 * v1 / (n1 - 1) + v2 * v2 / (n2 - 1)
    df = df_num / df_den if df_den > 0 else n1 + n2 - 2
    p = 2.0 * t_sf(abs(t), df)
    return t, min(p, 1.0)


def fisher_exact_2x2(counts) -> tuple[float, float]:
    """Fisher exact test (two-sided) on a 2x2 table; returns
    (sample odds ratio, p-value). Mirrors scipy.stats.fisher_exact:
    the p-value sums hypergeometric probabilities not exceeding the
    observed one (with scipy's 1+1e-7 tolerance). Counts are rounded
    to integers (the test is only defined for counts)."""
    obs = np.asarray(counts, dtype=float)
    a, b = float(round(obs[0, 0])), float(round(obs[0, 1]))
    c, d = float(round(obs[1, 0])), float(round(obs[1, 1]))
    if min(a, b, c, d) < 0:
        raise ValueError("counts must be non-negative")
    if b * c == 0:
        odds = math.inf if a * d > 0 else math.nan
    else:
        odds = (a * d) / (b * c)
    r1, r2 = a + b, c + d
    c1 = a + c
    n = r1 + r2
    if n == 0 or r1 == 0 or r2 == 0 or c1 == 0 or c1 == n:
        return odds, 1.0

    lg = math.lgamma

    def logp(k: float) -> float:
        # log C(r1,k) + log C(r2,c1-k) - log C(n,c1)
        return (
            lg(r1 + 1) - lg(k + 1) - lg(r1 - k + 1)
            + lg(r2 + 1) - lg(c1 - k + 1) - lg(r2 - (c1 - k) + 1)
            - (lg(n + 1) - lg(c1 + 1) - lg(n - c1 + 1))
        )

    k_lo = max(0.0, c1 - r2)
    k_hi = min(r1, c1)
    p_obs = math.exp(logp(a))
    total = 0.0
    k = k_lo
    while k <= k_hi + 0.5:
        p = math.exp(logp(k))
        if p <= p_obs * (1.0 + 1e-7):
            total += p
        k += 1.0
    return odds, min(total, 1.0)
