import numpy as np
import pytest

from optbinning_spark.core import metrics as M
from optbinning_spark.core.tree import cart_splits, mdlp_splits


def test_cart_finds_obvious_split():
    values = np.arange(10, dtype=float)
    # class flips at value 5
    W = np.array([[10, 0]] * 5 + [[0, 10]] * 5, dtype=float)
    splits = cart_splits(values, W, max_leaf_nodes=2)
    assert len(splits) == 1
    assert splits[0] == pytest.approx(4.5)


def test_cart_max_leaf_nodes():
    rng = np.random.RandomState(0)
    values = np.arange(50, dtype=float)
    W = rng.randint(1, 20, size=(50, 2)).astype(float)
    splits = cart_splits(values, W, max_leaf_nodes=6)
    assert len(splits) <= 5


def test_cart_min_samples_leaf():
    values = np.arange(10, dtype=float)
    W = np.array([[10, 0]] * 9 + [[0, 10]], dtype=float)
    # forcing 30-sample leaves cannot isolate the last value
    splits = cart_splits(values, W, max_leaf_nodes=4, min_samples_leaf=30)
    for s in splits:
        left = W[values <= s].sum()
        right = W[values > s].sum()
        assert left >= 30 and right >= 30


def test_cart_regression():
    values = np.arange(10, dtype=float)
    y = np.where(values < 5, 1.0, 10.0)
    stats = np.column_stack([np.full(10, 4.0), 4 * y, 4 * y * y])
    splits = cart_splits(values, stats, task="regression", max_leaf_nodes=2)
    assert len(splits) == 1
    assert splits[0] == pytest.approx(4.5)


def test_mdlp_accepts_informative_split():
    values = np.arange(20, dtype=float)
    W = np.array([[30, 1]] * 10 + [[1, 30]] * 10, dtype=float)
    splits = mdlp_splits(values, W)
    assert len(splits) >= 1
    assert 9.0 <= splits[0] <= 10.0


def test_mdlp_rejects_noise():
    values = np.arange(4, dtype=float)
    W = np.array([[5, 5]] * 4, dtype=float)
    assert len(mdlp_splits(values, W)) == 0


def test_jeffrey_symmetry_and_positivity():
    p = np.array([0.2, 0.3, 0.5])
    q = np.array([0.4, 0.4, 0.2])
    assert M.jeffrey(p, q, True) == pytest.approx(M.jeffrey(q, p, True))
    assert M.jeffrey(p, q, True) > 0
    assert M.jeffrey(p, p, True) == 0


def test_js_bounded_by_ln2():
    p = np.array([1.0, 0.0])
    q = np.array([0.0, 1.0])
    assert M.jensen_shannon(p, q, True) == pytest.approx(np.log(2))


def test_gini_perfect_separation():
    assert M.gini(np.array([0, 100]), np.array([100, 0])) == pytest.approx(1.0)
    assert M.gini(np.array([50, 50]), np.array([50, 50])) == pytest.approx(0.0)


def test_ks():
    ev = np.array([0.0, 100.0])
    ne = np.array([100.0, 0.0])
    assert M.ks_statistic(ev, ne) == pytest.approx(1.0)


def test_hhi():
    s = np.array([1.0, 1.0, 1.0, 1.0])
    assert M.hhi(s) == pytest.approx(0.25)
    assert M.hhi(s, normalized=True) == pytest.approx(0.0)
    assert M.hhi(np.array([4.0, 0, 0, 0]), normalized=True) == pytest.approx(1.0)


def test_psi_zero_for_identical():
    s = np.array([0.3, 0.4, 0.3])
    assert M.psi(s, s) == 0


# ---------------------------------------------------------------------------
# Public MDLP class (reference mdlp.py:34-208 semantics)

def test_mdlp_separable():
    from optbinning_spark.mdlp import MDLP

    x = np.array([1.0] * 50 + [2.0] * 50)
    y = np.array([0] * 50 + [1] * 50)
    m = MDLP().fit_arrays(x, y)
    assert list(m.splits) == [1.5]


def test_mdlp_leaf_gating():
    from optbinning_spark.mdlp import MDLP

    # each candidate either has a leaf below min_samples_leaf=2 or zero
    # gain -> no splits (mirrors the reference's strict >0 improvement)
    x = np.array([1.0, 2.0, 3.0, 4.0])
    y = np.array([0, 1, 0, 1])
    m = MDLP().fit_arrays(x, y)
    assert len(m.splits) == 0
    with_leaf1 = MDLP(min_samples_leaf=1).fit_arrays(x, y)
    assert len(with_leaf1.splits) >= 1


def test_mdlp_impure_tie_group_uses_value():
    from optbinning_spark.mdlp import MDLP

    # group x=1 is mixed: the within-tie midpoint (the value itself)
    # partitions like the junction midpoint and wins the gain tie, so
    # the recorded split is 1.0 not 1.5
    x = np.array([1.0] * 10 + [2.0] * 10)
    y = np.array([0] * 7 + [1] * 3 + [1] * 10)
    m = MDLP().fit_arrays(x, y)
    assert m.splits[0] == pytest.approx(1.0)


def test_mdlp_split_survives_mdl_termination():
    from optbinning_spark.mdlp import MDLP

    # reference appends the found split BEFORE the MDL test; a weak but
    # positive-gain top split must appear even when MDL stops recursion
    rng = np.random.RandomState(0)
    x = np.linspace(0, 1, 40)
    y = (rng.uniform(size=40) < np.where(x > 0.5, 0.6, 0.4)).astype(int)
    m = MDLP(min_samples_leaf=1).fit_arrays(x, y)
    assert len(m.splits) >= 1


def test_mdlp_unfitted_raises():
    from optbinning_spark.mdlp import MDLP

    with pytest.raises(RuntimeError):
        MDLP().splits
    with pytest.raises(ValueError):
        MDLP(min_samples_split=1)
    with pytest.raises(ValueError):
        MDLP(min_samples_leaf=0)


def test_mdlp_spark_matches_arrays(spark):
    from optbinning_spark.mdlp import MDLP

    rng = np.random.RandomState(7)
    x = np.round(rng.uniform(0, 10, 3000), 1)
    y = (rng.uniform(size=3000) < 1 / (1 + np.exp(-(x - 5)))).astype(int)
    df = spark.createDataFrame(
        [(float(a), int(b)) for a, b in zip(x, y)], "x double, y int")
    ms = MDLP().fit(df, "x", "y")
    ma = MDLP().fit_arrays(x, y)
    assert np.allclose(ms.splits, ma.splits)
    assert len(ms.splits) >= 2
