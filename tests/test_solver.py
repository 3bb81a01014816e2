import numpy as np
import pytest

from optbinning_spark.core.metrics import jeffrey
from optbinning_spark.core.solver import solve_binary, solve_continuous, solve_multiclass


def _iv(ne, ev, segments):
    ne = np.asarray(ne, dtype=float)
    ev = np.asarray(ev, dtype=float)
    mne = np.array([ne[s : e + 1].sum() for s, e in segments])
    mev = np.array([ev[s : e + 1].sum() for s, e in segments])
    return jeffrey(mev / ev.sum(), mne / ne.sum(), return_sum=True)


def test_unconstrained_keeps_all_feasible_prebins():
    # finer partitions never decrease Jeffrey divergence
    ne = [50, 40, 30, 20, 10]
    ev = [10, 20, 30, 40, 50]
    sol = solve_binary(np.array(ne), np.array(ev), monotonic_trend=None)
    assert sol.status == "OPTIMAL"
    assert sol.segments == [(0, 0), (1, 1), (2, 2), (3, 3), (4, 4)]
    assert sol.objective == pytest.approx(_iv(ne, ev, sol.segments))


def test_pure_prebins_are_merged():
    # prebin 1 has zero events -> must be merged with a neighbor (B5
    # refinement subsumed by feasibility)
    ne = np.array([50.0, 30.0, 20.0, 10.0])
    ev = np.array([10.0, 0.0, 30.0, 50.0])
    sol = solve_binary(ne, ev, monotonic_trend="ascending")
    assert sol.status == "OPTIMAL"
    assert all(ev[s : e + 1].sum() > 0 for s, e in sol.segments)
    assert all(ne[s : e + 1].sum() > 0 for s, e in sol.segments)


def test_ascending_monotonic_enforced():
    ne = np.array([50.0, 20.0, 40.0, 10.0, 5.0])
    ev = np.array([10.0, 30.0, 20.0, 40.0, 50.0])
    sol = solve_binary(ne, ev, monotonic_trend="ascending")
    rates = [
        ev[s : e + 1].sum() / (ev[s : e + 1].sum() + ne[s : e + 1].sum())
        for s, e in sol.segments
    ]
    assert all(rates[i + 1] >= rates[i] for i in range(len(rates) - 1))


def test_descending_monotonic_enforced():
    ne = np.array([10.0, 30.0, 20.0, 40.0, 50.0])
    ev = np.array([50.0, 20.0, 40.0, 10.0, 5.0])
    sol = solve_binary(ne, ev, monotonic_trend="descending")
    rates = [
        ev[s : e + 1].sum() / (ev[s : e + 1].sum() + ne[s : e + 1].sum())
        for s, e in sol.segments
    ]
    assert all(rates[i + 1] <= rates[i] for i in range(len(rates) - 1))


def test_max_n_bins_respected():
    ne = np.array([50, 40, 30, 20, 10, 5], dtype=float)
    ev = np.array([5, 10, 20, 30, 40, 50], dtype=float)
    sol = solve_binary(ne, ev, monotonic_trend="ascending", max_n_bins=3)
    assert sol.n_bins <= 3


def test_min_bin_size_respected():
    ne = np.array([50, 40, 30, 20, 10], dtype=float)
    ev = np.array([5, 10, 20, 30, 40], dtype=float)
    total = ne.sum() + ev.sum()
    sol = solve_binary(ne, ev, monotonic_trend=None, min_bin_size=0.25)
    for s, e in sol.segments:
        assert ne[s : e + 1].sum() + ev[s : e + 1].sum() >= 0.25 * total


def test_peak_trend():
    # rates rise then fall
    ne = np.array([90, 60, 30, 60, 90], dtype=float)
    ev = np.array([10, 40, 70, 40, 10], dtype=float)
    sol = solve_binary(ne, ev, monotonic_trend="peak")
    rates = [
        ev[s : e + 1].sum() / (ev[s : e + 1].sum() + ne[s : e + 1].sum())
        for s, e in sol.segments
    ]
    k = int(np.argmax(rates))
    assert all(rates[i + 1] >= rates[i] for i in range(k))
    assert all(rates[i + 1] <= rates[i] for i in range(k, len(rates) - 1))
    assert sol.n_bins >= 3


def test_max_pvalue_constraint():
    # two nearly-identical adjacent distributions should be merged when
    # max_pvalue demands significance
    ne = np.array([50, 49, 10], dtype=float)
    ev = np.array([50, 51, 90], dtype=float)
    free = solve_binary(ne, ev, monotonic_trend="ascending")
    constrained = solve_binary(
        ne, ev, monotonic_trend="ascending", max_pvalue=0.05
    )
    assert free.n_bins == 3
    assert constrained.n_bins == 2


def test_auto_asc_desc_picks_better():
    ne = np.array([10, 30, 50], dtype=float)
    ev = np.array([50, 30, 10], dtype=float)
    sol = solve_binary(ne, ev, monotonic_trend="auto_asc_desc")
    assert sol.trend == "descending"


def test_continuous_monotonic_means():
    cnt = np.array([100, 100, 100, 100], dtype=float)
    s1 = np.array([100, 300, 200, 500], dtype=float)
    s2 = s1 * s1 / cnt + cnt  # some variance
    sol = solve_continuous(cnt, s1, s2, monotonic_trend="ascending")
    means = [s1[s : e + 1].sum() / cnt[s : e + 1].sum() for s, e in sol.segments]
    assert all(means[i + 1] >= means[i] for i in range(len(means) - 1))


def test_multiclass_solver():
    M = np.array(
        [[50, 10, 5], [30, 20, 10], [20, 30, 20], [10, 40, 40]], dtype=float
    )
    sol = solve_multiclass(M, min_n_bins=2)
    assert sol.status == "OPTIMAL"
    assert sol.n_bins >= 2
    # segments tile [0..3]
    flat = [i for s, e in sol.segments for i in range(s, e + 1)]
    assert flat == [0, 1, 2, 3]


def _brute_force_shape(ne, ev, shape, lo=1, hi=99):
    """Independent re-implementation of the reference's all-triples
    concave/convex constraint (cp.py:433-457) by full enumeration."""
    n = len(ne)
    t_ev, t_ne = ev.sum(), ne.sum()
    best = (-1e18, None)
    for mask in range(1 << (n - 1)):
        segs, s = [], 0
        for k in range(n - 1):
            if mask >> k & 1:
                segs.append((s, k))
                s = k + 1
        segs.append((s, n - 1))
        if not (lo <= len(segs) <= hi):
            continue
        evs = np.array([ev[a:b + 1].sum() for a, b in segs])
        nes = np.array([ne[a:b + 1].sum() for a, b in segs])
        if (evs <= 0).any() or (nes <= 0).any():
            continue
        er = evs / (evs + nes)
        m = len(segs)
        ok = True
        for a in range(m):
            for b in range(a + 1, m):
                for c in range(b + 1, m):
                    if shape == "concave" and er[a] + er[c] > 2 * er[b] + 1e-12:
                        ok = False
                    if shape == "convex" and er[a] + er[c] < 2 * er[b] - 1e-12:
                        ok = False
        if not ok:
            continue
        p, q = evs / t_ev, nes / t_ne
        iv = ((p - q) * np.log(p / q)).sum()
        if iv > best[0]:
            best = (iv, segs)
    return best


def test_concave_convex_exact_vs_brute_force():
    """The DFS shape enumerator returns the global optimum under the
    reference's ALL-triples curvature constraint — randomized
    cross-check against an independent full enumeration."""
    rng = np.random.RandomState(0)
    for trial in range(12):
        n = rng.randint(3, 10)
        ne = rng.randint(1, 50, n).astype(float)
        ev = rng.randint(1, 50, n).astype(float)
        for shape in ("concave", "convex"):
            sol = solve_binary(ne, ev, monotonic_trend=shape)
            bv, _ = _brute_force_shape(ne, ev, shape)
            assert sol.status == "OPTIMAL"
            assert abs(sol.objective - bv) < 1e-12, (trial, shape)


def test_concave_rejects_convex_profile_merge():
    """A sharply convex (valley) event-rate profile cannot keep its
    shape under a concave constraint: the solver must merge/rearrange
    rather than emit a valley sequence. (This is the case the old
    peak-approximation got wrong.)"""
    ne = np.array([20, 80, 80, 20], dtype=float)
    ev = np.array([80, 20, 20, 80], dtype=float)  # rates .8 .2 .2 .8
    sol = solve_binary(ne, ev, monotonic_trend="concave")
    evs = [ev[s:e + 1].sum() for s, e in sol.segments]
    nes = [ne[s:e + 1].sum() for s, e in sol.segments]
    er = [e_ / (e_ + n_) for e_, n_ in zip(evs, nes)]
    for a in range(len(er)):
        for b in range(a + 1, len(er)):
            for c in range(b + 1, len(er)):
                assert er[a] + er[c] <= 2 * er[b] + 1e-12


def test_dp_property_randomized_hypothesis():
    """Property: for every trend and constraint combo, the DP objective
    equals the exhaustive-enumeration maximum over feasible contiguous
    partitions (hypothesis-driven input generation)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def brute(ne, ev, trend, min_n_bins, max_n_bins, min_bin_size):
        n = len(ne)
        t_ev, t_ne = ev.sum(), ne.sum()
        total = t_ev + t_ne
        best = None
        for mask in range(1 << (n - 1)):
            segs, s = [], 0
            for k in range(n - 1):
                if mask >> k & 1:
                    segs.append((s, k))
                    s = k + 1
            segs.append((s, n - 1))
            if not ((min_n_bins or 1) <= len(segs)
                    <= (max_n_bins or n)):
                continue
            evs = np.array([ev[a:b + 1].sum() for a, b in segs])
            nes = np.array([ne[a:b + 1].sum() for a, b in segs])
            if (evs <= 0).any() or (nes <= 0).any():
                continue
            if min_bin_size is not None and (
                    (evs + nes) < min_bin_size * total).any():
                continue
            er = evs / (evs + nes)
            if trend == "ascending" and not all(
                    er[i + 1] >= er[i] for i in range(len(er) - 1)):
                continue
            if trend == "descending" and not all(
                    er[i + 1] <= er[i] for i in range(len(er) - 1)):
                continue
            p, q = evs / t_ev, nes / t_ne
            iv = ((p - q) * np.log(p / q)).sum()
            if best is None or iv > best:
                best = iv
        return best

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(st.tuples(st.integers(1, 40), st.integers(1, 40)),
                 min_size=2, max_size=7),
        st.sampled_from([None, "ascending", "descending"]),
        st.sampled_from([None, 2]),
        st.sampled_from([None, 3]),
        st.sampled_from([None, 0.1]),
    )
    def check(pairs, trend, min_n_bins, max_n_bins, min_bin_size):
        ne = np.array([p[0] for p in pairs], dtype=float)
        ev = np.array([p[1] for p in pairs], dtype=float)
        sol = solve_binary(
            ne, ev, monotonic_trend=trend, min_n_bins=min_n_bins,
            max_n_bins=max_n_bins, min_bin_size=min_bin_size)
        expect = brute(ne, ev, trend, min_n_bins, max_n_bins, min_bin_size)
        if expect is None:
            assert sol.status == "INFEASIBLE"
        else:
            assert sol.status == "OPTIMAL"
            assert abs(sol.objective - expect) < 1e-12

    check()


def test_shape_enum_node_budget_flat_profile():
    """Flat event rates defeat the concave/convex DFS pruning (the
    tree is the full 2^(n-1) prefix tree, ~4x per +2 prebins); the
    node budget must bound the solve to seconds and return a valid
    (anytime) solution instead of hanging the driver."""
    import time

    import numpy as np

    from optbinning_spark.core.solver import solve_binary

    n = 26
    ne = np.full(n, 100.0)
    ev = np.full(n, 50.0)
    t0 = time.time()
    sol = solve_binary(ne, ev, monotonic_trend="concave")
    assert time.time() - t0 < 20.0
    assert sol.status in ("OPTIMAL", "FEASIBLE")
    # segments form a contiguous partition of [0, n)
    assert sol.segments[0][0] == 0 and sol.segments[-1][1] == n - 1
    for (a, b), (c, d) in zip(sol.segments, sol.segments[1:]):
        assert c == b + 1
    # flat profile: IV is 0 for any partition
    assert abs(sol.objective) < 1e-9


def test_shape_enum_still_exact_below_budget():
    """Real (non-flat) profiles stay on the exact DFS path."""
    import numpy as np

    from optbinning_spark.core.solver import solve_binary

    n = 12
    ev = np.linspace(10, 80, n)
    ne = 100 - ev
    sol = solve_binary(ne, ev, monotonic_trend="concave")
    assert sol.status == "OPTIMAL"
