import math

import numpy as np
import pytest

from optbinning_spark.core.special_math import (
    betainc,
    chi2_contingency_2xk,
    chi2_sf,
    gammainc_p,
    norm_sf,
    t_sf,
    welch_ttest_from_stats,
)


def test_chi2_sf_known_values():
    # scipy.stats.chi2.sf reference values
    assert chi2_sf(3.841458820694124, 1) == pytest.approx(0.05, rel=1e-9)
    assert chi2_sf(5.991464547107979, 2) == pytest.approx(0.05, rel=1e-9)
    assert chi2_sf(0.0, 1) == 1.0
    assert chi2_sf(100.0, 1) < 1e-20


def test_gammainc_complementarity():
    for a in (0.5, 1.0, 2.5, 10.0):
        for x in (0.1, 1.0, 5.0, 20.0):
            assert gammainc_p(a, x) + chi2_sf(2 * x, 2 * a) == pytest.approx(
                1.0, abs=1e-12
            )


def test_norm_sf():
    assert norm_sf(0.0) == pytest.approx(0.5)
    assert norm_sf(1.959963984540054) == pytest.approx(0.025, rel=1e-9)


def test_t_sf_matches_normal_at_high_df():
    assert t_sf(1.96, 10_000_000) == pytest.approx(norm_sf(1.96), rel=1e-4)
    # scipy.stats.t.sf(2.0, 10) = 0.036694
    assert t_sf(2.0, 10) == pytest.approx(0.03669402, rel=1e-5)
    assert t_sf(-2.0, 10) == pytest.approx(1 - 0.03669402, rel=1e-5)


def test_betainc_bounds():
    assert betainc(2.0, 3.0, 0.0) == 0.0
    assert betainc(2.0, 3.0, 1.0) == 1.0
    # I_{0.5}(2,2) = 0.5 by symmetry
    assert betainc(2.0, 2.0, 0.5) == pytest.approx(0.5, rel=1e-12)


def test_chi2_contingency():
    # hand-computed Pearson chi2 without continuity correction:
    # expected = outer(row, col) / total for obs [[10,20],[30,25]]
    obs = np.array([[10.0, 20.0], [30.0, 25.0]])
    row = obs.sum(axis=1, keepdims=True)
    col = obs.sum(axis=0, keepdims=True)
    exp = row @ col / obs.sum()
    want = float(((obs - exp) ** 2 / exp).sum())
    stat, p = chi2_contingency_2xk(obs)
    assert stat == pytest.approx(want, rel=1e-12)
    assert stat == pytest.approx(3.505892255892256, rel=1e-12)
    assert p == pytest.approx(chi2_sf(want, 1), rel=1e-12)
    assert 0.06 < p < 0.062


def test_welch_ttest():
    # hand-computed Welch statistic: t = (m1-m2)/sqrt(v1/n1 + v2/n2)
    t, p = welch_ttest_from_stats(5, 2, 30, 6, 2.5, 40)
    want_t = (5 - 6) / math.sqrt(4 / 30 + 6.25 / 40)
    assert t == pytest.approx(want_t, rel=1e-12)
    # Welch-Satterthwaite df
    v1, v2 = 4 / 30, 6.25 / 40
    df = (v1 + v2) ** 2 / (v1**2 / 29 + v2**2 / 39)
    assert p == pytest.approx(2 * t_sf(abs(want_t), df), rel=1e-12)
    assert 0.06 < p < 0.08


def test_degenerate_tests_return_p1():
    assert chi2_contingency_2xk(np.array([[0.0, 0.0], [0.0, 0.0]]))[1] == 1.0
    assert welch_ttest_from_stats(1, 0, 1, 2, 0, 1)[1] == 1.0


def test_bayesian_probability_matches_monte_carlo():
    import numpy as np
    from optbinning_spark.core.metrics import bayesian_probability

    obs = np.array([[10, 20], [30, 40]])
    p_ab, p_ba = bayesian_probability(obs, 100)
    rng = np.random.RandomState(0)
    pa = rng.beta(10, 30, 200000)
    pb = rng.beta(20, 40, 200000)
    # reference semantics: P[A>B] = P(nonevent-rate A < nonevent-rate B)
    mc = (pa < pb).mean()
    assert abs(p_ab - mc) < 0.01
    assert p_ab + p_ba == 1.0
    # degenerate counts fall back to 1/2
    assert bayesian_probability(np.array([[0, 1], [2, 3]])) == (0.5, 0.5)


def test_cramer_v_and_trend_type():
    import numpy as np
    from optbinning_spark.core.metrics import cramer_v, type_of_monotonic_trend

    ne = np.array([50.0, 40.0, 30.0])
    ev = np.array([10.0, 20.0, 30.0])
    stat, cv = cramer_v(ne, ev)
    assert stat > 0 and 0 < cv < 1
    assert type_of_monotonic_trend([0.1, 0.2, 0.3]) == "ascending"
    assert type_of_monotonic_trend([0.3, 0.2, 0.1]) == "descending"
    assert type_of_monotonic_trend([0.1, 0.4, 0.2]) == "peak"
    assert type_of_monotonic_trend([0.4, 0.1, 0.3]) == "valley"
