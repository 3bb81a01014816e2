"""Automatic monotonic-trend decision from prebin event rates.

Faithful reimplementation of the reference's trend classifier
(optbinning/binning/auto_monotonic.py:13-438): shape features of the
prebin event-rate (or mean) profile — linear-regression sense,
extreme-point record shares, extreme-point triangular area ratio,
convex-hull area ratio — fed through the reference's published
decision-rule thresholds (auto_monotonic.py:226-290 for auto,
292-330 for auto_asc_desc). The convex hull is computed with the
standard Andrew monotone-chain algorithm (scipy-free).

The decision maps to one of ascending / descending / peak / valley;
``resolve_trend`` passes explicit user trends through unchanged.
"""

from __future__ import annotations

import numpy as np


def trend_changes(rates: np.ndarray) -> int:
    """Number of sign changes of consecutive differences (reference
    n_peaks_valleys, auto_monotonic.py:16-28)."""
    x = np.asarray(rates, dtype=float)
    if len(x) < 3:
        return 0
    d = np.sign(x[1:] - x[:-1])
    return int(np.count_nonzero(d[1:] != d[:-1]))


def _hull_area(points: np.ndarray) -> float:
    """Area of the 2-D convex hull (Andrew monotone chain + shoelace)."""
    pts = sorted(map(tuple, points))
    if len(pts) < 3:
        return 0.0

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = lower[:-1] + upper[:-1]
    if len(hull) < 3:
        return 0.0
    area = 0.0
    for i in range(len(hull)):
        x1, y1 = hull[i]
        x2, y2 = hull[(i + 1) % len(hull)]
        area += x1 * y2 - x2 * y1
    return abs(area) / 2.0


def _extreme_points_area(x: np.ndarray) -> float:
    """Reference extreme_points_area (auto_monotonic.py:44-86)."""
    n = len(x)
    pos_min = int(np.argmin(x))
    pos_max = int(np.argmax(x))
    if n <= 2:
        return 0.0
    t1 = np.array([[0, pos_min, pos_max],
                   [x[0], x[pos_min], x[pos_max]],
                   [1, 1, 1]])
    t2 = np.array([[pos_min, pos_max, n],
                   [x[pos_min], x[pos_max], x[-1]],
                   [1, 1, 1]])
    sum_area = 0.5 * abs(np.linalg.det(t1)) + 0.5 * abs(np.linalg.det(t2))
    with np.errstate(divide="ignore", invalid="ignore"):
        return float(sum_area / ((x[pos_max] - x[pos_min]) * n))


def _features(rates: np.ndarray, counts: np.ndarray) -> dict:
    """Reference auto_monotonic_data (auto_monotonic.py:89-156) from
    the per-prebin profile and record counts."""
    r = np.asarray(rates, dtype=float)
    n = len(r)
    cnt = (np.ones(n) if counts is None else np.asarray(counts, dtype=float))
    total = cnt.sum()
    pos_min = int(np.argmin(r))
    pos_max = int(np.argmax(r))
    lr_coef = np.polyfit(np.arange(n), r, deg=1)[0] if n > 1 else 0.0

    rect = (r[pos_max] - r[pos_min]) * n
    if n > 2 and rect > 0:
        pts = np.column_stack([np.arange(n, dtype=float), r])
        p_hull = _hull_area(pts) / rect
    else:
        p_hull = 0.0

    return {
        "p_trend_changes": trend_changes(r) / n,
        "lr_sense": int(lr_coef > 0),
        "p_records_min_left": cnt[:pos_min].sum() / total,
        "p_records_min_right": cnt[pos_min + 1:].sum() / total,
        "p_records_max_left": cnt[:pos_max].sum() / total,
        "p_records_max_right": cnt[pos_max + 1:].sum() / total,
        "p_area": _extreme_points_area(r),
        "p_convex_hull": p_hull,
    }


_ASC, _DESC, _PEAK, _VALLEY = "ascending", "descending", "peak", "valley"


def _decide_auto(f: dict) -> str:
    """Reference auto_monotonic_decision thresholds
    (auto_monotonic.py:231-290)."""
    if f["p_area"] <= 0.22145836800336838:
        if f["lr_sense"] == 0:
            if f["p_convex_hull"] <= 0.48331470787525177:
                if f["p_records_min_right"] <= 0.010740397498011589:
                    return _DESC
                if f["p_records_min_right"] <= 0.022145185619592667:
                    return _VALLEY
                return _DESC
            if f["p_records_max_right"] <= 0.6426683664321899:
                return _VALLEY
            return _DESC
        return _ASC
    if f["p_records_min_right"] <= 0.06137961149215698:
        if f["p_convex_hull"] <= 0.23837491869926453:
            return _DESC
        if f["p_records_max_left"] <= 0.10170064494013786:
            if f["p_records_max_left"] <= 0.01817034650593996:
                return _VALLEY
            return _DESC
        return _PEAK
    if f["p_records_min_left"] <= 0.05336669087409973:
        if f["p_records_max_right"] <= 0.0695494469255209:
            return _ASC
        if f["p_records_max_left"] <= 0.14705360680818558:
            return _ASC
        return _PEAK
    if f["p_records_min_left"] <= 0.8308950066566467:
        return _VALLEY
    if f["p_records_max_right"] <= 0.1587613895535469:
        return _VALLEY
    return _PEAK


def _decide_asc_desc(f: dict) -> str:
    """Reference auto_monotonic_asc_desc_decision thresholds
    (auto_monotonic.py:292-330)."""
    if f["lr_sense"] == 0:
        if f["p_area"] <= 0.4890555590391159:
            if f["p_records_max_right"] <= 0.029244758188724518:
                return _ASC
            return _DESC
        if f["p_convex_hull"] <= 0.5553120970726013:
            return _ASC
        return _DESC
    if f["p_records_max_left"] <= 0.03698493912816048:
        return _DESC
    if f["p_records_min_left"] <= 0.7991077601909637:
        if f["p_area"] <= 0.48206718266010284:
            return _ASC
        if f["p_records_max_left"] <= 0.8631451725959778:
            return _ASC
        return _DESC
    if f["p_trend_changes"] <= 0.5277777910232544:
        if f["p_records_min_left"] <= 0.8155287206172943:
            return _DESC
        return _ASC
    return _DESC


def decide_trend(rates: np.ndarray, counts: np.ndarray | None = None,
                 mode: str = "auto") -> str:
    r = np.asarray(rates, dtype=float)
    n = len(r)
    if n <= 2:
        return _ASC if (n < 2 or r[-1] >= r[0]) else _DESC
    f = _features(r, counts)
    if mode == "auto_asc_desc":
        return _decide_asc_desc(f)
    return _decide_auto(f)


def resolve_trend(
    monotonic_trend: str | None, rates: np.ndarray, counts: np.ndarray | None = None
) -> str | None:
    """Map user trend parameter to a concrete solver trend."""
    if monotonic_trend in ("auto", "auto_heuristic"):
        return decide_trend(rates, counts, mode="auto")
    if monotonic_trend == "auto_asc_desc":
        return decide_trend(rates, counts, mode="auto_asc_desc")
    return monotonic_trend
