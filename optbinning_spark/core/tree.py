"""Histogram-based CART for pre-binning (split proposal).

The reference uses a single-feature sklearn DecisionTree with
``max_leaf_nodes=max_n_prebins`` and ``min_samples_leaf`` to propose
candidate splits (reference: optbinning/binning/prebinning.py:103-132).
sklearn is not available here, and a distributed engine should not need
it: a depth/leaf-bounded CART on ONE feature depends only on the
grouped sufficient statistics ``(value, sum_w_per_class)`` — exactly
what one Spark ``groupBy`` produces. This module consumes that
histogram on the driver and grows the tree best-first (largest impurity
improvement first), which is sklearn's strategy when ``max_leaf_nodes``
is set, emitting interior thresholds at midpoints between adjacent
distinct values — the same split geometry sklearn produces.

This is the LightGBM/XGBoost histogram-tree idea applied to prebinning:
the data-sized pass is a single aggregation; the tree is driver-side on
<= ~1000 rows.
"""

from __future__ import annotations

import heapq
import itertools

import numpy as np


def _gini_impurity(class_w: np.ndarray) -> float:
    total = class_w.sum()
    if total <= 0:
        return 0.0
    p = class_w / total
    return float(1.0 - (p * p).sum())


def _best_split_classification(values, W):
    """values: sorted distinct values (n,); W: per-value class weights
    (n, k). Returns (gain, split_idx) maximizing weighted Gini decrease;
    split at idx means threshold between values[idx] and values[idx+1]."""
    n = len(values)
    if n < 2:
        return None
    total_w = W.sum(axis=0)
    total = total_w.sum()
    parent_imp = _gini_impurity(total_w)
    left = np.cumsum(W, axis=0)  # left[i] = classes of values[0..i]
    best = None
    for i in range(n - 1):
        lw = left[i]
        rw = total_w - lw
        nl, nr = lw.sum(), rw.sum()
        if nl <= 0 or nr <= 0:
            continue
        child = (nl * _gini_impurity(lw) + nr * _gini_impurity(rw)) / total
        gain = (parent_imp - child) * total
        if best is None or gain > best[0]:
            best = (gain, i)
    return best


def _best_split_regression(values, cnt, s1, s2):
    """Variance-reduction split for a continuous target histogram."""
    n = len(values)
    if n < 2:
        return None
    tc, t1 = cnt.sum(), s1.sum()
    if tc <= 0:
        return None
    cc = np.cumsum(cnt)
    c1 = np.cumsum(s1)
    best = None
    parent_sse = -(t1 * t1) / tc
    for i in range(n - 1):
        nl, nr = cc[i], tc - cc[i]
        if nl <= 0 or nr <= 0:
            continue
        sl, sr = c1[i], t1 - c1[i]
        child_sse = -(sl * sl) / nl - (sr * sr) / nr
        gain = parent_sse - child_sse
        if best is None or gain > best[0]:
            best = (gain, i)
    return best


def cart_splits(
    values: np.ndarray,
    stats: np.ndarray,
    *,
    task: str = "classification",
    max_leaf_nodes: int = 20,
    min_samples_leaf: float = 0.0,
) -> np.ndarray:
    """Grow a best-first single-feature CART on a value histogram and
    return the sorted interior thresholds.

    Parameters
    ----------
    values : sorted distinct feature values, shape (n,)
    stats : classification -> per-value class weight matrix (n, k);
            regression -> columns (count, sum_y, sum_y2), shape (n, 3)
    min_samples_leaf : minimum total weight per leaf (absolute).
    """
    values = np.asarray(values, dtype=float)
    order = np.argsort(values)
    values = values[order]
    stats = np.asarray(stats, dtype=float)[order]
    n = len(values)
    if n < 2 or max_leaf_nodes < 2:
        return np.array([])

    counter = itertools.count()  # tie-break for heap determinism

    def node_weight(lo, hi):
        if task == "classification":
            return stats[lo : hi + 1].sum()
        return stats[lo : hi + 1, 0].sum()

    def find_split(lo, hi):
        v = values[lo : hi + 1]
        if task == "classification":
            res = _best_split_classification(v, stats[lo : hi + 1])
        else:
            s = stats[lo : hi + 1]
            res = _best_split_regression(v, s[:, 0], s[:, 1], s[:, 2])
        if res is None:
            return None
        gain, idx = res
        # honor min_samples_leaf on both children
        while res is not None:
            gain, idx = res
            wl = node_weight(lo, lo + idx)
            wr = node_weight(lo + idx + 1, hi)
            if wl >= min_samples_leaf and wr >= min_samples_leaf:
                return gain, lo + idx
            res = _second_best(lo, hi, idx)
        return None

    def _second_best(lo, hi, skip_idx):
        """Fallback scan honoring min_samples_leaf when argmax violates."""
        v = values[lo : hi + 1]
        m = len(v)
        best = None
        for i in range(m - 1):
            wl = node_weight(lo, lo + i)
            wr = node_weight(lo + i + 1, hi)
            if wl < min_samples_leaf or wr < min_samples_leaf:
                continue
            if task == "classification":
                sub = stats[lo : hi + 1]
                lw = sub[: i + 1].sum(axis=0)
                rw = sub.sum(axis=0) - lw
                tot = lw.sum() + rw.sum()
                child = (
                    lw.sum() * _gini_impurity(lw) + rw.sum() * _gini_impurity(rw)
                ) / tot
                gain = (_gini_impurity(sub.sum(axis=0)) - child) * tot
            else:
                s = stats[lo : hi + 1]
                tc, t1 = s[:, 0].sum(), s[:, 1].sum()
                nl = s[: i + 1, 0].sum()
                sl = s[: i + 1, 1].sum()
                nr, sr = tc - nl, t1 - sl
                if nl <= 0 or nr <= 0:
                    continue
                gain = -(t1 * t1) / tc + (sl * sl) / nl + (sr * sr) / nr
            if best is None or gain > best[0]:
                best = (gain, i)
        return best

    heap = []
    first = find_split(0, n - 1)
    if first is None:
        return np.array([])
    heapq.heappush(heap, (-first[0], next(counter), 0, n - 1, first[1]))
    thresholds = []
    n_leaves = 1
    while heap and n_leaves < max_leaf_nodes:
        neg_gain, _, lo, hi, idx = heapq.heappop(heap)
        if -neg_gain <= 0:
            break
        thresholds.append(0.5 * (values[idx] + values[idx + 1]))
        n_leaves += 1
        for clo, chi in ((lo, idx), (idx + 1, hi)):
            if chi > clo:
                sp = find_split(clo, chi)
                if sp is not None and sp[0] > 0:
                    heapq.heappush(heap, (-sp[0], next(counter), clo, chi, sp[1]))
    return np.sort(np.array(thresholds))


def mdlp_splits(
    values: np.ndarray,
    class_w: np.ndarray,
    *,
    max_candidates: int = 32,
    min_samples_split: float = 2.0,
) -> np.ndarray:
    """Fayyad & Irani MDLP recursive entropy splits on a histogram
    (reference: optbinning/binning/mdlp.py:34-208). Driver-side; input
    is the same grouped (value, class-weight) sufficient statistics."""
    values = np.asarray(values, dtype=float)
    order = np.argsort(values)
    values = values[order]
    W = np.asarray(class_w, dtype=float)[order]

    def entropy(w):
        t = w.sum()
        if t <= 0:
            return 0.0
        p = w / t
        p = p[p > 0]
        return float(-(p * np.log2(p)).sum())

    splits: list[float] = []

    def recurse(lo, hi):
        sub = W[lo : hi + 1]
        total = sub.sum()
        if total < min_samples_split or hi <= lo:
            return
        parent_ent = entropy(sub.sum(axis=0))
        cum = np.cumsum(sub, axis=0)
        tot = sub.sum(axis=0)
        best = None
        m = hi - lo
        cand = range(m) if m <= max_candidates else np.linspace(
            0, m - 1, max_candidates
        ).astype(int)
        for i in cand:
            lw = cum[i]
            rw = tot - lw
            nl, nr = lw.sum(), rw.sum()
            if nl <= 0 or nr <= 0:
                continue
            child = (nl * entropy(lw) + nr * entropy(rw)) / total
            gain = parent_ent - child
            if best is None or gain > best[0]:
                best = (gain, i, entropy(lw), entropy(rw), lw, rw)
        if best is None:
            return
        gain, i, el, er, lw, rw = best
        k = int((tot > 0).sum())
        kl = int((lw > 0).sum())
        kr = int((rw > 0).sum())
        delta = np.log2(3.0**k - 2.0) - (
            k * parent_ent - kl * el - kr * er
        )
        threshold_gain = (np.log2(max(total - 1.0, 1.0)) + delta) / total
        if gain > threshold_gain:
            splits.append(0.5 * (values[lo + i] + values[lo + i + 1]))
            recurse(lo, lo + i)
            recurse(lo + i + 1, hi)

    recurse(0, len(values) - 1)
    return np.sort(np.array(splits))
