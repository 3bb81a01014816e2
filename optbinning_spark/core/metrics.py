"""Driver-side divergence and quality metrics on per-bin statistics.

These operate on the tiny collected bin table (<= ~22 rows), mirroring
the reference's optbinning/binning/metrics.py. The same formulas are
also emitted as Spark SQL column expressions by
``optbinning_spark.operators.binning_table`` so every number is
oracle-checkable.

Reference citations (all into /root/reference/):
- jeffrey (IV): optbinning/binning/metrics.py:107-132
- jensen_shannon: optbinning/binning/metrics.py:135-157
- hellinger / triangular: optbinning/binning/metrics.py:25-38,81-104
- gini: optbinning/binning/metrics.py:41-78
- hhi: optbinning/binning/metrics.py:307-329
- binning quality score: optbinning/binning/metrics.py:332-367
"""

from __future__ import annotations

import numpy as np

_EPS = 1e-15


def _safe_ratio(a: np.ndarray, total: float) -> np.ndarray:
    return np.asarray(a, dtype=float) / max(total, _EPS)


def jeffrey(p: np.ndarray, q: np.ndarray, return_sum: bool = False):
    """Jeffrey divergence (Information Value): sum (p-q) * ln(p/q)."""
    p = np.asarray(p, dtype=float)
    q = np.asarray(q, dtype=float)
    with np.errstate(divide="ignore", invalid="ignore"):
        j = (p - q) * np.log(np.where(q > 0, p / np.maximum(q, _EPS), 1.0))
    j = np.where((p > 0) & (q > 0), j, 0.0)
    return j.sum() if return_sum else j


def jensen_shannon(p: np.ndarray, q: np.ndarray, return_sum: bool = False):
    """Jensen-Shannon divergence with natural log."""
    p = np.asarray(p, dtype=float)
    q = np.asarray(q, dtype=float)
    m = 0.5 * (p + q)

    def _kl_terms(a, b):
        with np.errstate(divide="ignore", invalid="ignore"):
            t = a * np.log(a / np.maximum(b, _EPS))
        return np.where(a > 0, t, 0.0)

    js = 0.5 * (_kl_terms(p, m) + _kl_terms(q, m))
    return js.sum() if return_sum else js


def hellinger(p: np.ndarray, q: np.ndarray, return_sum: bool = False):
    p = np.asarray(p, dtype=float)
    q = np.asarray(q, dtype=float)
    h = 0.5 * (np.sqrt(p) - np.sqrt(q)) ** 2
    return h.sum() if return_sum else h


def triangular(p: np.ndarray, q: np.ndarray, return_sum: bool = False):
    p = np.asarray(p, dtype=float)
    q = np.asarray(q, dtype=float)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (p - q) ** 2 / np.maximum(p + q, _EPS)
    t = np.where(p + q > 0, t, 0.0)
    return t.sum() if return_sum else t


DIVERGENCES = {
    "iv": jeffrey,
    "js": jensen_shannon,
    "hellinger": hellinger,
    "triangular": triangular,
}


def divergence_per_bin(
    n_nonevent: np.ndarray, n_event: np.ndarray, divergence: str = "iv"
) -> np.ndarray:
    """Per-bin divergence contribution given event/nonevent counts."""
    ne = np.asarray(n_nonevent, dtype=float)
    ev = np.asarray(n_event, dtype=float)
    q = _safe_ratio(ne, ne.sum())
    p = _safe_ratio(ev, ev.sum())
    return DIVERGENCES[divergence](p, q, return_sum=False)


def gini(event: np.ndarray, nonevent: np.ndarray) -> float:
    """Accuracy-ratio Gini from the per-bin counts, bins sorted by
    event rate (reference metrics.py:41-78)."""
    ev = np.asarray(event, dtype=float)
    ne = np.asarray(nonevent, dtype=float)
    mask = (ev + ne) > 0
    ev, ne = ev[mask], ne[mask]
    if len(ev) == 0:
        return 0.0
    er = ev / (ev + ne)
    order = np.argsort(er)
    ev, ne = ev[order], ne[order]
    te, tn = ev.sum(), ne.sum()
    if te == 0 or tn == 0:
        return 0.0
    # area under CAP-like curve via pairwise formula
    num = 0.0
    cum_ne = 0.0
    for i in range(len(ev)):
        num += ev[i] * (cum_ne + 0.5 * ne[i])
        cum_ne += ne[i]
    return abs(2.0 * num / (te * tn) - 1.0)


def ks_statistic(event: np.ndarray, nonevent: np.ndarray) -> float:
    """Kolmogorov-Smirnov over ordered bins: max |cum p_ev - cum p_ne|
    (reference binning_statistics.py:558)."""
    ev = np.asarray(event, dtype=float)
    ne = np.asarray(nonevent, dtype=float)
    te, tn = ev.sum(), ne.sum()
    if te == 0 or tn == 0:
        return 0.0
    return float(np.max(np.abs(np.cumsum(ev) / te - np.cumsum(ne) / tn)))


def hhi(s: np.ndarray, normalized: bool = False) -> float:
    """Herfindahl-Hirschman index of the bin share distribution."""
    s = np.asarray(s, dtype=float)
    total = s.sum()
    if total <= 0:
        return 0.0
    share = s / total
    h = float((share**2).sum())
    if normalized:
        n = len(s)
        if n <= 1:
            return 0.0
        return (h - 1.0 / n) / (1.0 - 1.0 / n)
    return h


def binning_quality_score(iv: float, p_values: np.ndarray, hhi_norm: float) -> float:
    """Reference metrics.py:332-367: bell-shaped IV score times
    significance and concentration penalties."""
    # score in [0, 1]; IV ~ 0.3-0.5 is the sweet spot
    c = 0.39573882184806863
    score = iv * np.exp(0.5 * (1.0 - (iv / c) ** 2)) / c if iv > 0 else 0.0
    score = min(score, 1.0)
    pv = np.asarray(p_values, dtype=float)
    penalty = float(np.prod(1.0 - pv)) if pv.size else 1.0
    return float(score * penalty * (1.0 - hhi_norm))


def multiclass_binning_quality_score(
    js: float, n_classes: int, p_values, hhi_norm: float
) -> float:
    """Reference metrics.py:347-350: JS normalized by log(k) through
    the same bell-shaped score."""
    return binning_quality_score(
        js / np.log(n_classes), p_values, hhi_norm)


def continuous_binning_quality_score(
    rwoe: float, p_values, hhi_norm: float
) -> float:
    """Reference metrics.py:353-367: mean-relative total |WoE| ratio
    times significance and concentration penalties."""
    score_1 = max(1.0 - 1.0 / rwoe, 0.0) if rwoe != 0 else 0.0
    pv = np.asarray(p_values, dtype=float)
    score_2 = float(np.prod(1.0 - pv)) if pv.size else 1.0
    return float(score_1 * score_2 * (1.0 - hhi_norm))


def cramer_v_multi(event_matrix: np.ndarray) -> tuple[float, float]:
    """Pearson chi2 over an n_bins x k class-count table and Cramer's V
    (reference metrics.py chi2_cramer_v_multi)."""
    from .special_math import chi2_contingency_2xk

    obs = np.asarray(event_matrix, dtype=float)
    stat, _ = chi2_contingency_2xk(obs)
    total = obs.sum()
    kmin = min(obs.shape) - 1
    if total <= 0 or kmin <= 0:
        return stat, 0.0
    return stat, float(np.sqrt(stat / (total * kmin)))


def psi(expected_share: np.ndarray, actual_share: np.ndarray) -> float:
    """Population Stability Index = Jeffrey divergence between shares
    (reference monitoring.py:582-602)."""
    return float(jeffrey(actual_share, expected_share, return_sum=True))


def cramer_v(n_nonevent: np.ndarray, n_event: np.ndarray) -> tuple[float, float]:
    """Pearson chi2 over the full 2xk bin table and Cramer's V
    (reference metrics.py:280-287)."""
    from .special_math import chi2_contingency_2xk

    obs = np.array([n_nonevent, n_event], dtype=float)
    stat, _ = chi2_contingency_2xk(obs)
    total = obs.sum()
    return stat, float(np.sqrt(stat / total)) if total > 0 else 0.0


def bayesian_probability(
    obs: np.ndarray, n_samples: int = 100
) -> tuple[float, float]:
    """P[rate_A > rate_B] under independent Beta posteriors with the
    bin counts as pseudo-counts (reference metrics.py:296-304). The
    reference integrates over shuffled midpoints; the shuffle does not
    change the mean, so this uses ordered midpoint quadrature —
    deterministic, same value."""
    from .special_math import beta_ppf_vec, betainc_vec

    a_a, a_b, b_a, b_b = np.asarray(obs, dtype=float).ravel()
    if min(a_a, a_b, b_a, b_b) <= 0:
        return 0.5, 0.5
    v = (np.arange(1, n_samples + 1) - 0.5) / n_samples
    p = float(np.mean(betainc_vec(a_a, b_a, beta_ppf_vec(a_b, b_b, v))))
    return p, 1.0 - p


def type_of_monotonic_trend(event_rate: np.ndarray) -> str:
    """Classify the achieved event-rate shape (reference
    binning_statistics.py type_of_monotonic_trend)."""
    er = np.asarray(event_rate, dtype=float)
    if er.size <= 1:
        return "undefined"
    d = np.diff(er)
    if np.all(d >= 0):
        return "ascending"
    if np.all(d <= 0):
        return "descending"
    sign_changes = np.count_nonzero(np.diff(np.sign(d[d != 0])) != 0)
    if sign_changes == 1:
        peak = int(np.argmax(er))
        valley = int(np.argmin(er))
        if 0 < peak < er.size - 1 and np.all(d[:peak] >= 0):
            return "peak"
        if 0 < valley < er.size - 1 and np.all(d[:valley] <= 0):
            return "valley"
    return "no monotonic"
