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
