"""Production-grid-size fuzz for the 2-D exact-cover tie-break pin
(r14 verdict ask #6).

The r14 pin (9dp-rounded objective, ties to the first candidate in
DFS order = the lowest partition index in the oracle enumeration) was
fuzz-verified on 3x3 / 3x4 grids (322 / 3,164 partitions). The
production dispatch runs the memoized exact-cover DFS up to
_EXACT_CELL_LIMIT = 36 cells (6x6, 4x9, 2x18 — beyond that the
guillotine DP takes over, which no oracle pins), where the DFS
explores far more states than 3x4 and the 1e-9 band interacts with
larger accumulated sums (winning covers carry 20-30 terms). This tool
closes that scale gap with two checks per random integer-count grid:

1. FULL 36-CELL GRIDS (6x6 / 4x9 / 2x18, the production ceiling):
   the engine winner must be an exact cover of feasible rectangles;
   its DFS-accumulated objective must agree with an independent flat
   math.fsum of the same terms to < 1e-9 (the decomposability bound
   _better_pinned's docstring documents); and no local merge of two
   adjacent winner rectangles into a feasible rectangle may beat the
   winner at 9dp (local pinned-order dominance — exhaustive
   enumeration is impossible at 36 cells).

2. SAMPLED SUB-GRIDS (3x3, 3x4, 2x6, 3x5, 2x8, 4x4; --full adds
   4x5): random contiguous sub-blocks of the same counts, engine
   _exact_cover vs a slow exact enumerator that replicates the
   production oracle's selection exactly — every partition generated
   in the canonical DFS order, flat-fsum objective, winner by
   (round(obj, 9) DESC, partition index ASC). Winner IDENTITY must
   match, including which of several exactly-tied partitions wins.

Usage:
    python tools/fuzz_2d_tiebreak.py [--grids N] [--seed S] [--full]

Exit code 0 = no divergence; any mismatch prints the full grid and
fails loudly. The pytest slice in tests/test_binning_2d_tiebreak.py
runs a 25-grid version of this per CI run; the full sweep is this
tool (referenced from SCALING.md).
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from optbinning_spark.binning_2d import OptimalBinning2D  # noqa: E402


def iter_partitions(nx, ny):
    """Every rectangle partition of the nx x ny grid, in the engine's
    canonical DFS order (top-left corner rule, candidates by (c2, r2)
    ascending) — the same order _rect_enum_masks assigns oracle pids."""
    acc: list = []

    def go(heights):
        h = list(heights)
        r = min(h)
        if r == nx:
            yield tuple(acc)
            return
        c = h.index(r)
        c2 = c
        while c2 < ny and h[c2] == r:
            c2 += 1
            for r2 in range(r + 1, nx + 1):
                nh = list(h)
                for j in range(c, c2):
                    nh[j] = r2
                acc.append((r, r2, c, c2))
                yield from go(tuple(nh))
                acc.pop()

    yield from go(tuple([0] * ny))


def make_rect_value(NE, EV, min_frac):
    """IV rectangle objective with the production feasibility rule
    (both classes present, count share >= min_frac) over prefix sums —
    the same shape q_binning_2d_table's fit uses."""
    nx, ny = NE.shape
    t_ne, t_ev = NE.sum(), EV.sum()
    min_cnt = min_frac * (t_ne + t_ev)
    pne = np.zeros((nx + 1, ny + 1))
    pev = np.zeros((nx + 1, ny + 1))
    pne[1:, 1:] = NE.cumsum(0).cumsum(1)
    pev[1:, 1:] = EV.cumsum(0).cumsum(1)

    def rect_value(r1, r2, c1, c2):
        ne = pne[r2, c2] - pne[r1, c2] - pne[r2, c1] + pne[r1, c1]
        ev = pev[r2, c2] - pev[r1, c2] - pev[r2, c1] + pev[r1, c1]
        if ne <= 0 or ev <= 0 or (ne + ev) < min_cnt:
            return None
        p = ev / t_ev
        q = ne / t_ne
        return (p - q) * np.log(p / q)

    return rect_value


def brute_force_winner(NE, EV, min_frac):
    """The oracle's selection, independently: enumerate ALL partitions
    in canonical order, score each as a flat fsum of its rectangle
    terms, and keep the first partition per the pinned total order
    (round(obj, 9) DESC, index ASC)."""
    rect_value = make_rect_value(NE, EV, min_frac)
    nx, ny = NE.shape
    best_r, best_parts = None, None
    for parts in iter_partitions(nx, ny):
        terms = []
        ok = True
        for rc in parts:
            v = rect_value(*rc)
            if v is None:
                ok = False
                break
            terms.append(float(v))
        if not ok:
            continue
        r = round(math.fsum(terms), 9)
        if best_r is None or r > best_r:
            best_r, best_parts = r, parts
    return best_parts


def engine_winner(NE, EV, min_frac):
    rect_value = make_rect_value(NE, EV, min_frac)
    nx, ny = NE.shape
    val, picks = OptimalBinning2D._exact_cover(None, nx, ny, rect_value)
    return val, picks


def check_full_grid(NE, EV, min_frac, tag):
    """8x8-scale checks: cover validity, feasibility, flat-sum
    objective invariance, local merge dominance."""
    rect_value = make_rect_value(NE, EV, min_frac)
    val, picks = engine_winner(NE, EV, min_frac)
    if picks is None:
        return 0  # no feasible cover — nothing to pin
    nx, ny = NE.shape
    covered = np.zeros((nx, ny), dtype=int)
    terms = []
    for r1, r2, c1, c2 in picks:
        covered[r1:r2, c1:c2] += 1
        v = rect_value(r1, r2, c1, c2)
        assert v is not None, (tag, "winner contains infeasible rect",
                               (r1, r2, c1, c2))
        terms.append(float(v))
    assert (covered == 1).all(), (tag, "winner is not an exact cover")
    flat = math.fsum(terms)
    assert abs(flat - val) < 1e-9, (
        tag, "memoized accumulation drifted >= 1e-9 from the flat sum",
        val, flat, NE.tolist(), EV.tolist())
    # local dominance: merging two winner rects that form a rectangle
    # must not beat the winner at 9dp (a strict improvement would mean
    # the DP missed a better partition)
    rset = list(picks)
    base_r = round(flat, 9)
    for a in range(len(rset)):
        for b in range(a + 1, len(rset)):
            ra, rb = rset[a], rset[b]
            merged = None
            if ra[0] == rb[0] and ra[1] == rb[1] and \
                    (ra[3] == rb[2] or rb[3] == ra[2]):
                merged = (ra[0], ra[1], min(ra[2], rb[2]),
                          max(ra[3], rb[3]))
            elif ra[2] == rb[2] and ra[3] == rb[3] and \
                    (ra[1] == rb[0] or rb[1] == ra[0]):
                merged = (min(ra[0], rb[0]), max(ra[1], rb[1]),
                          ra[2], ra[3])
            if merged is None:
                continue
            vm = rect_value(*merged)
            if vm is None:
                continue
            others = [t for i, t in enumerate(terms) if i not in (a, b)]
            alt = round(math.fsum(others + [float(vm)]), 9)
            assert alt <= base_r, (
                tag, "local merge beats the DP winner",
                (ra, rb, merged), alt, base_r)
    return 1


SUB_SHAPES = [(3, 3), (3, 4), (2, 6), (3, 5), (2, 8), (4, 4)]


FULL_SHAPES = [(6, 6), (6, 6), (4, 9), (2, 18)]


def run(n_grids=120, seed=None, full=False, verbose=True):
    if seed is None:
        seed = zlib.crc32(b"fuzz_2d_tiebreak_36cell")
    rng = np.random.default_rng(seed)
    shapes = SUB_SHAPES + ([(4, 5)] if full else [])
    n_full = n_sub = 0
    for t in range(n_grids):
        nx, ny = FULL_SHAPES[t % len(FULL_SHAPES)]
        # small integers maximize exact-objective tie frequency;
        # zeros exercise infeasible cells
        NE = rng.integers(0, 7, (nx, ny)).astype(float)
        EV = rng.integers(0, 7, (nx, ny)).astype(float)
        if NE.sum() == 0 or EV.sum() == 0:
            continue
        min_frac = (0.0, 0.02, 0.05)[t % 3]
        n_full += check_full_grid(NE, EV, min_frac, f"grid{t}")
        # sampled sub-grid vs the exhaustive oracle-order enumerator
        # (only shapes that fit inside this round's full grid)
        fitting = [s for s in shapes if s[0] <= nx and s[1] <= ny]
        snx, sny = fitting[t % len(fitting)]
        r0 = int(rng.integers(0, nx - snx + 1))
        c0 = int(rng.integers(0, ny - sny + 1))
        sNE = NE[r0:r0 + snx, c0:c0 + sny]
        sEV = EV[r0:r0 + snx, c0:c0 + sny]
        if sNE.sum() == 0 or sEV.sum() == 0:
            continue
        sub_frac = (0.0, 0.1)[t % 2]
        _, picks = engine_winner(sNE, sEV, sub_frac)
        want = brute_force_winner(sNE, sEV, sub_frac)
        if picks is None:
            assert want is None, (t, "engine infeasible, oracle found",
                                  want, sNE.tolist(), sEV.tolist())
            continue
        got = tuple(picks)
        assert got == want, (
            t, (snx, sny), "winner identity diverged",
            got, want, sNE.tolist(), sEV.tolist())
        n_sub += 1
        if verbose and t % 50 == 49:
            print(f"  {t + 1}/{n_grids} grids: {n_full} full checks, "
                  f"{n_sub} sub-grid identity checks green")
    return n_full, n_sub


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grids", type=int, default=120)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--full", action="store_true",
                    help="add 4x5 sub-grids (1.6M partitions each)")
    args = ap.parse_args()
    n_full, n_sub = run(args.grids, args.seed, args.full)
    print(f"OK: {n_full} full-grid checks, {n_sub} sub-grid "
          f"winner-identity checks, 0 divergences")


if __name__ == "__main__":
    main()
