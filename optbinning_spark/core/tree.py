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

import numpy as np


def _gini_impurity(class_w: np.ndarray) -> float:
    total = class_w.sum()
    if total <= 0:
        return 0.0
    p = class_w / total
    return float(1.0 - (p * p).sum())


def _best_split_classification(values, W, min_w: float = 0.0):
    """values: sorted distinct values (n,); W: per-value class weights
    (n, k). Returns (gain, split_idx) maximizing weighted Gini decrease
    among splits whose children both weigh >= min_w; split at idx means
    threshold between values[idx] and values[idx+1]. Fully vectorized
    (the per-candidate Python loop was the driver-CART bottleneck on
    4096-bucket histograms); float-op order matches the original loop
    so proposed splits are bit-identical."""
    n = len(values)
    if n < 2:
        return None
    left = np.cumsum(W, axis=0)  # left[i] = classes of values[0..i]
    # totals via .sum (pairwise), not cumsum's sequential tail — keeps
    # float results bit-identical to the original per-candidate loop
    total_w = W.sum(axis=0)
    total = total_w.sum()
    parent_imp = _gini_impurity(total_w)
    lw = left[:-1]
    rw = total_w[None, :] - lw
    nl = lw.sum(axis=1)
    nr = rw.sum(axis=1)
    valid = (nl > 0) & (nr > 0) & (nl >= min_w) & (nr >= min_w)
    if not valid.any():
        return None
    with np.errstate(divide="ignore", invalid="ignore"):
        gl = 1.0 - ((lw / nl[:, None]) ** 2).sum(axis=1)
        gr = 1.0 - ((rw / nr[:, None]) ** 2).sum(axis=1)
    child = (nl * gl + nr * gr) / total
    gain = (parent_imp - child) * total
    gain = np.where(valid, gain, -np.inf)
    i = int(np.argmax(gain))  # first max == the loop's strict-> argmax
    return float(gain[i]), i


def _best_split_regression(values, cnt, s1, s2, min_w: float = 0.0):
    """Variance-reduction split for a continuous target histogram,
    vectorized, children constrained to weight >= min_w."""
    n = len(values)
    if n < 2:
        return None
    cc = np.cumsum(cnt)
    c1 = np.cumsum(s1)
    tc, t1 = cnt.sum(), s1.sum()  # pairwise, matching the original loop
    if tc <= 0:
        return None
    nl = cc[:-1]
    nr = tc - nl
    valid = (nl > 0) & (nr > 0) & (nl >= min_w) & (nr >= min_w)
    if not valid.any():
        return None
    sl = c1[:-1]
    sr = t1 - sl
    parent_sse = -(t1 * t1) / tc
    with np.errstate(divide="ignore", invalid="ignore"):
        child_sse = -(sl * sl) / nl - (sr * sr) / nr
    gain = np.where(valid, parent_sse - child_sse, -np.inf)
    i = int(np.argmax(gain))
    return float(gain[i]), i


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

    def find_split(lo, hi):
        # min_samples_leaf is enforced inside the vectorized argmax:
        # the constrained best equals the old unconstrained-then-
        # fallback scan (if the unconstrained argmax is feasible it IS
        # the constrained argmax)
        v = values[lo : hi + 1]
        if task == "classification":
            res = _best_split_classification(
                v, stats[lo : hi + 1], min_samples_leaf)
        else:
            s = stats[lo : hi + 1]
            res = _best_split_regression(
                v, s[:, 0], s[:, 1], s[:, 2], min_samples_leaf)
        if res is None:
            return None
        gain, idx = res
        return gain, lo + idx

    # heap tie-break is the ABSOLUTE split position, not insertion
    # order: the SQL replays (wide-fit steps CTE / cart_splits oracle)
    # rescan every leaf's candidates per iteration and pick
    # ORDER BY gain DESC, position — when two nodes' best gains tie
    # BITWISE (the gain kernels are expression-parallel to the SQL, so
    # exact ties agree bit-for-bit across engines), insertion order
    # diverged from position order. Positions are unique across alive
    # nodes (nodes partition the index range), so the comparison never
    # falls through to lo/hi.
    heap = []
    first = find_split(0, n - 1)
    if first is None:
        return np.array([])
    heapq.heappush(heap, (-first[0], first[1], 0, n - 1))
    thresholds = []
    n_leaves = 1
    while heap and n_leaves < max_leaf_nodes:
        neg_gain, idx, lo, hi = heapq.heappop(heap)
        if -neg_gain <= 0:
            break
        thresholds.append(0.5 * (values[idx] + values[idx + 1]))
        n_leaves += 1
        for clo, chi in ((lo, idx), (idx + 1, hi)):
            if chi > clo:
                sp = find_split(clo, chi)
                if sp is not None and sp[0] > 0:
                    heapq.heappush(heap, (-sp[0], sp[1], clo, chi))
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
        best_rg = None
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
            # r14 pinned argmax: compare at 9dp so an exact gain tie
            # (mirror-image intervals) keeps the FIRST candidate
            # (lowest index) regardless of ulp noise — the oracle's
            # ORDER BY round(gain, 9) DESC, ci; the selected
            # candidate's RAW gain still feeds the MDL acceptance
            rg = round(gain, 9)
            if best is None or rg > best_rg:
                best = (gain, i, entropy(lw), entropy(rw), lw, rw)
                best_rg = rg
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
