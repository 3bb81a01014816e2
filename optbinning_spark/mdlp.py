"""Standalone MDLP discretizer (Fayyad & Irani 1993) — the reference's
public ``MDLP`` class (reference optbinning/binning/mdlp.py:34-208)
re-expressed Spark-first.

The reference recurses over raw sorted samples; a 1-feature entropy
split depends only on per-distinct-value class counts, so here the
data-plane is ONE ``groupBy(x)`` aggregation (bounded, quantile-bucket
fallback for high cardinality — see operators/prebinning.value_histogram)
and the recursion runs on the driver over that histogram.

Reference semantics reproduced exactly:

- natural-log entropy (scipy.special.xlogy equivalent), binary target;
- candidate splits are boundary points: midpoints between consecutive
  distinct values whose classes (can) differ, plus the value itself for
  impure tie groups (the reference's midpoint-within-ties candidate —
  it partitions identically to the following junction midpoint and wins
  gain ties because candidates are scanned in ascending order);
- ``np.percentile(candidates, linspace(1, 100, max_candidates))``
  capping (mdlp.py:131-137);
- ``min_samples_leaf`` gating per candidate, strict positive-gain
  improvement with first-wins ties (mdlp.py:141-154);
- the found split is appended BEFORE the MDL termination test — MDL
  only gates deeper recursion (mdlp.py:115-128);
- the class counts ``k``/``k1``/``k2`` in the MDL delta replicate
  ``len(np.bincount(y))`` = highest class label present + 1
  (mdlp.py:180-192).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from .operators.prebinning import value_histogram

__all__ = ["MDLP"]


def _ent(w0: float, w1: float) -> float:
    """Natural-log binary entropy of a (class-0, class-1) weight pair."""
    n = w0 + w1
    if n <= 0:
        return 0.0
    e = 0.0
    for c in (w0, w1):
        if c > 0:
            p = c / n
            e -= p * np.log(p)
    return float(e)


def _k(w0: float, w1: float) -> int:
    """``len(np.bincount(y))`` for binary labels: 2 whenever any class-1
    sample is present (even if class 0 is absent), else 1."""
    return 2 if w1 > 0 else 1


class MDLP:
    """Minimum Description Length Principle discretization.

    Parameters follow the reference (mdlp.py:70-75):
    ``min_samples_split`` — minimum distinct values to consider a node
    splittable; ``min_samples_leaf`` — minimum samples on each side of
    a candidate; ``max_candidates`` — percentile-capped candidate count.

    ``fit(df, x, y)`` takes a Spark DataFrame and column names; the
    target must be binary 0/1.
    """

    def __init__(self, min_samples_split: int = 2, min_samples_leaf: int = 2,
                 max_candidates: int = 32):
        if not isinstance(min_samples_split, (int, np.integer)) \
                or min_samples_split < 2:
            raise ValueError("min_samples_split must be an integer >= 2; "
                             f"got {min_samples_split}.")
        if not isinstance(min_samples_leaf, (int, np.integer)) \
                or min_samples_leaf < 1:
            raise ValueError("min_samples_leaf must be a positive integer "
                             f">= 1; got {min_samples_leaf}.")
        if not isinstance(max_candidates, (int, np.integer)) \
                or max_candidates < 1:
            raise ValueError("max_candidates must be a positive integer "
                             f">= 1; got {max_candidates}.")
        self.min_samples_split = int(min_samples_split)
        self.min_samples_leaf = int(min_samples_leaf)
        self.max_candidates = int(max_candidates)
        self._splits: list[float] = []
        self._is_fitted = False

    # ------------------------------------------------------------------
    def fit(self, df: DataFrame, x: str, y: str) -> "MDLP":
        values, stats = value_histogram(
            df, x, y, None, task="classification", classes=[0, 1],
        )
        self._splits = []
        if len(values) >= 2:
            self._recurse(values, stats[:, 0], stats[:, 1], 0,
                          len(values) - 1)
        self._is_fitted = True
        return self

    def fit_arrays(self, x: np.ndarray, y: np.ndarray) -> "MDLP":
        """Driver-side fit on numpy arrays (the reference's signature),
        for parity testing and small data."""
        x = np.asarray(x, dtype=float)
        y = np.asarray(y)
        values, inv = np.unique(x, return_inverse=True)
        w1 = np.bincount(inv, weights=(y == 1).astype(float),
                         minlength=len(values))
        w0 = np.bincount(inv, weights=(y == 0).astype(float),
                         minlength=len(values))
        self._splits = []
        if len(values) >= 2:
            self._recurse(values, w0, w1, 0, len(values) - 1)
        self._is_fitted = True
        return self

    # ------------------------------------------------------------------
    def _candidates(self, v, w0, w1, lo, hi):
        """Boundary-point candidates over distinct values lo..hi."""
        cand = []
        for i in range(lo, hi):
            impure_i = w0[i] > 0 and w1[i] > 0
            if impure_i:
                # midpoint within a mixed tie group == the value itself
                cand.append(float(v[i]))
            impure_next = w0[i + 1] > 0 and w1[i + 1] > 0
            cls_i = 1 if w1[i] > 0 else 0
            cls_next = 1 if w1[i + 1] > 0 else 0
            if impure_i or impure_next or cls_i != cls_next:
                cand.append(0.5 * (float(v[i]) + float(v[i + 1])))
        # a mixed final tie group also yields an interior midpoint
        if hi >= lo and w0[hi] > 0 and w1[hi] > 0:
            cand.append(float(v[hi]))
        cand = np.unique(np.asarray(cand, dtype=float))
        if len(cand) > self.max_candidates:
            cand = np.percentile(
                cand, np.linspace(1, 100, self.max_candidates))
        return cand

    def _recurse(self, v, w0, w1, lo, hi):
        n0 = float(w0[lo:hi + 1].sum())
        n1 = float(w1[lo:hi + 1].sum())
        n = n0 + n1
        split = self._find_split(v, w0, w1, lo, hi, n0, n1)
        if split is None:
            return
        s, l0, l1 = split
        self._splits.append(s)
        # MDL termination — gates recursion only; the split above stays
        # (reference mdlp.py:115-128, 173-193)
        n_x = hi - lo + 1
        ent_y = _ent(n0, n1)
        ent_l = _ent(l0, l1)
        ent_r = _ent(n0 - l0, n1 - l1)
        nl, nr = l0 + l1, n - (l0 + l1)
        gain = ent_y - (nl * ent_l + nr * ent_r) / n
        k, k1, k2 = _k(n0, n1), _k(l0, l1), _k(n0 - l0, n1 - l1)
        delta = np.log(3.0 ** k - 2.0) - (k * ent_y - k1 * ent_l
                                          - k2 * ent_r)
        splittable = n_x >= self.min_samples_split and k >= 2
        if n > 1 and gain > (np.log(n - 1.0) + delta) / n and splittable:
            j = int(np.searchsorted(v[lo:hi + 1], s, side="right")) + lo
            if j > lo:
                self._recurse(v, w0, w1, lo, j - 1)
            if j <= hi:
                self._recurse(v, w0, w1, j, hi)

    def _find_split(self, v, w0, w1, lo, hi, n0, n1):
        if hi <= lo:
            return None
        cand = self._candidates(v, w0, w1, lo, hi)
        if len(cand) == 0:
            return None
        n = n0 + n1
        ent_y = _ent(n0, n1)
        c0 = np.cumsum(w0[lo:hi + 1])
        c1 = np.cumsum(w1[lo:hi + 1])
        best_gain, best = 0.0, None
        for s in cand:
            j = int(np.searchsorted(v[lo:hi + 1], s, side="right"))
            if j <= 0 or j > hi - lo:
                continue
            l0, l1 = float(c0[j - 1]), float(c1[j - 1])
            nl = l0 + l1
            nr = n - nl
            if nl < self.min_samples_leaf or nr < self.min_samples_leaf:
                continue
            gain = ent_y - (nl * _ent(l0, l1)
                            + nr * _ent(n0 - l0, n1 - l1)) / n
            if gain > best_gain:
                best_gain, best = gain, (float(s), l0, l1)
        return best

    # ------------------------------------------------------------------
    @property
    def splits(self) -> np.ndarray:
        if not self._is_fitted:
            raise RuntimeError(
                "This MDLP instance is not fitted yet. Call 'fit' with "
                "appropriate arguments.")
        return np.sort(np.asarray(self._splits, dtype=float))
