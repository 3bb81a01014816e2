"""Golden-value parity with the reference's own published test
numbers (reference tests/test_binning.py:164-192 and
tests/test_continuous_binning.py:110-123), computed on the
reference's own datasets. These are the exact splits/IV/Gini/JS the
reference asserts at rel=1e-6; matching them end-to-end exercises
CART pre-binning, pure-prebin refinement, the trend decision, the
optimizer, and the binning-table math at once."""

import numpy as np
import pandas as pd
import pytest

BC_CSV = "/root/reference/tests/data/breast_cancer.csv"
BOSTON_CSV = "/root/reference/tests/data/boston_housing.csv"

GOLDEN_BC_SPLITS = [11.42500019, 12.32999992, 13.09499979,
                    13.70499992, 15.04500008, 16.92500019]
GOLDEN_BC_IV = 5.04392547
GOLDEN_BC_GINI = 0.87541620
GOLDEN_BC_JS = 0.39378376
GOLDEN_BOSTON_SPLITS = [4.6500001, 5.49499989, 6.86500001, 9.7249999,
                        13.0999999, 14.4000001, 17.23999977,
                        19.89999962, 23.31500053]


@pytest.fixture(scope="module")
def breast_cancer(spark):
    return spark.read.csv(BC_CSV, header=True, inferSchema=True)


@pytest.fixture(scope="module")
def boston_xy(spark):
    raw = pd.read_csv(BOSTON_CSV, sep=r"\s+", skiprows=22, header=None)
    data = np.hstack([raw.values[::2, :], raw.values[1::2, :2]])
    pdf = pd.DataFrame({"LSTAT": data[:, 12], "MEDV": raw.values[1::2, 2]})
    return spark.createDataFrame(pdf)


@pytest.fixture(scope="module")
def boston(spark):
    raw = pd.read_csv(BOSTON_CSV, sep=r"\s+", skiprows=22, header=None)
    data = np.hstack([raw.values[::2, :], raw.values[1::2, :2]])
    pdf = pd.DataFrame({"LSTAT": data[:, 12], "MEDV": raw.values[1::2, 2]})
    return spark.createDataFrame(pdf)


def test_binary_golden_default(breast_cancer):
    from optbinning_spark.binning import OptimalBinning

    ob = OptimalBinning(prebinning_method="cart", monotonic_trend="auto")
    ob.fit(breast_cancer, "mean radius", "target")
    assert ob.solution_.status == "OPTIMAL"
    assert list(ob.splits) == pytest.approx(GOLDEN_BC_SPLITS, rel=1e-6)
    assert ob.binning_table.iv == pytest.approx(GOLDEN_BC_IV, rel=1e-6)
    a = ob.binning_table.analysis()
    assert a["gini"] == pytest.approx(GOLDEN_BC_GINI, rel=1e-6)
    assert a["js"] == pytest.approx(GOLDEN_BC_JS, rel=1e-6)
    assert a["quality_score"] == pytest.approx(0.0, abs=1e-6)


def test_continuous_golden_default(boston):
    from optbinning_spark.binning import ContinuousOptimalBinning

    ob = ContinuousOptimalBinning(prebinning_method="cart",
                                  monotonic_trend="auto")
    ob.fit(boston, "LSTAT", "MEDV")
    assert ob.solution_.status == "OPTIMAL"
    assert list(ob.splits) == pytest.approx(GOLDEN_BOSTON_SPLITS, rel=1e-6)


def test_continuous_golden_transform(boston):
    """reference test_continuous_binning.py:271 — first transformed
    values with metric=mean."""
    from optbinning_spark.binning import ContinuousOptimalBinning

    ob = ContinuousOptimalBinning(prebinning_method="cart",
                                  monotonic_trend="auto")
    ob.fit(boston, "LSTAT", "MEDV")
    out = ob.transform(boston.limit(5), "LSTAT", metric="mean").collect()
    got = [r["LSTAT_mean"] for r in out]
    assert got == pytest.approx(
        [30.47142857, 25.56067416, 39.718, 39.718, 30.47142857], rel=1e-6)


def test_binary_golden_woe_metric_values(breast_cancer):
    """WoE transform consistency: every clean-bin WoE in the table is
    reproduced by the transform expression."""
    import pyspark.sql.functions as F

    from optbinning_spark.binning import OptimalBinning

    ob = OptimalBinning(prebinning_method="cart", monotonic_trend="auto")
    ob.fit(breast_cancer, "mean radius", "target")
    out = ob.transform(breast_cancer, "mean radius", metric="woe",
                       out_col="woe")
    got = sorted(r["woe"] for r in out.select("woe").distinct().collect())
    table_woe = sorted(set(np.round(ob.binning_table.woe[:7], 12)))
    assert got == pytest.approx(table_woe, rel=1e-9)


def test_2d_golden_default(breast_cancer):
    """reference tests/test_binning_2d.py:179 — exact rectangle-cover
    optimum via the skyline DP."""
    from optbinning_spark.binning_2d import OptimalBinning2D

    ob = OptimalBinning2D()
    ob.fit(breast_cancer, "mean radius", "worst concavity", "target")
    assert ob.iv == pytest.approx(7.63248244, rel=1e-6)


def test_binning_process_golden_woe_csv(spark, breast_cancer):
    """Full 30-variable BinningProcess WoE transform matches the
    reference's stored golden output
    (reference tests/results/breast_cancer_woe.csv) at rel 1e-6."""
    from optbinning_spark import BinningProcess

    golden = pd.read_csv("/root/reference/tests/results/breast_cancer_woe.csv")
    names = [c for c in breast_cancer.columns if c != "target"]
    bp = BinningProcess(variable_names=names)
    bp.fit(breast_cancer, "target")
    pdf = bp.transform(breast_cancer, metric="woe").toPandas()
    for c in golden.columns:
        assert pdf[c].values == pytest.approx(golden[c].values, rel=1e-6), c


def test_sketch_golden_add_solve(breast_cancer):
    """reference tests/test_binning_sketch.py:124-137 — sketch path
    reproduces the exact-path golden values at rel 1e-2."""
    from optbinning_spark import OptimalBinningSketch

    sk = OptimalBinningSketch(eps=1e-4)
    sk.add(breast_cancer, "mean radius", "target")
    ob = sk.solve()
    assert ob.binning_table.iv == pytest.approx(GOLDEN_BC_IV, rel=1e-2)
    a = ob.binning_table.analysis()
    assert a["gini"] == pytest.approx(GOLDEN_BC_GINI, rel=1e-2)
    assert a["js"] == pytest.approx(GOLDEN_BC_JS, rel=1e-2)


def test_sketch_golden_merge(spark, breast_cancer):
    """reference tests/test_binning_sketch.py:139-161 — merged
    partial sketches reproduce the same golden values."""
    from optbinning_spark import OptimalBinningSketch

    pdf = breast_cancer.toPandas()
    sk1 = OptimalBinningSketch(eps=1e-4)
    sk2 = OptimalBinningSketch(eps=1e-4)
    sk1.add(spark.createDataFrame(pdf.iloc[:200]), "mean radius", "target")
    sk2.add(spark.createDataFrame(pdf.iloc[200:]), "mean radius", "target")
    sk1.merge(sk2)
    ob = sk1.solve()
    assert ob.binning_table.iv == pytest.approx(GOLDEN_BC_IV, rel=1e-2)


CATS = (['Working', 'State servant', 'Working', 'Working', 'Working',
         'State servant', 'Commercial associate', 'State servant',
         'Pensioner', 'Working', 'Working', 'Pensioner', 'Working',
         'Working', 'Working', 'Working', 'Working', 'Working', 'Working',
         'State servant', 'Working', 'Commercial associate', 'Working',
         'Pensioner', 'Working', 'Working', 'Working', 'Working',
         'State servant', 'Working', 'Commercial associate', 'Working',
         'Working', 'Commercial associate', 'State servant', 'Working',
         'Commercial associate', 'Working', 'Pensioner', 'Working',
         'Commercial associate', 'Working', 'Working', 'Pensioner',
         'Working', 'Working', 'Pensioner', 'Working', 'State servant',
         'Working', 'State servant', 'Commercial associate', 'Working',
         'Commercial associate', 'Pensioner', 'Working', 'Pensioner',
         'Working', 'Working', 'Working', 'Commercial associate', 'Working',
         'Pensioner', 'Working', 'Commercial associate',
         'Commercial associate', 'State servant', 'Working',
         'Commercial associate', 'Commercial associate',
         'Commercial associate', 'Working', 'Working', 'Working',
         'Commercial associate', 'Working', 'Commercial associate',
         'Working', 'Working', 'Pensioner', 'Working', 'Pensioner',
         'Working', 'Working', 'Pensioner', 'Working', 'State servant',
         'Working', 'Working', 'Working', 'Working', 'Working',
         'Commercial associate', 'Commercial associate',
         'Commercial associate', 'Working', 'Commercial associate',
         'Working', 'Working', 'Pensioner'])
CATS_Y = [1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
          0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 1, 0,
          0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
          0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0,
          0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0]


def test_categorical_golden_transform(spark):
    """reference tests/test_binning.py:476-541 — categorical WoE
    transform with cat_cutoff, plus unknown-category defaults."""
    from optbinning_spark.binning import OptimalBinning

    df = spark.createDataFrame(
        list(zip(CATS, [int(v) for v in CATS_Y])), ["occ", "y"])
    ob = OptimalBinning(dtype="categorical", cat_cutoff=0.1)
    ob.fit(df, "occ", "y")
    q = spark.createDataFrame(
        [("Pensioner",), ("Working",), ("Commercial associate",),
         ("State servant",)], ["occ"])
    got = [r["occ_woe"]
           for r in ob.transform(q, "occ", metric="woe").collect()]
    assert got == pytest.approx(
        [-0.26662866, 0.30873548, -0.55431074, 0.30873548], rel=1e-6)
    unk = ob.transform(spark.createDataFrame([("new",)], ["occ"]),
                       "occ", metric="woe").collect()
    assert unk[0]["occ_woe"] == 0.0


def test_outlier_golden_defaults(boston_xy):
    """reference tests/test_outlier.py:62-91 — ETI count, HDI count,
    zscore flagged values, y-quantile flagged values on Boston."""
    import pyspark.sql.functions as F

    from optbinning_spark.operators.outlier import (
        ModifiedZScoreDetector,
        RangeDetector,
        YQuantileDetector,
    )

    df = boston_xy
    eti = RangeDetector(method="ETI").fit(df, "LSTAT")
    assert df.filter(eti.outlier_predicate(F.col("LSTAT"))).count() == 7
    hdi = RangeDetector(method="HDI").fit(df, "LSTAT")
    assert df.filter(hdi.outlier_predicate(F.col("LSTAT"))).count() == 31
    z = ModifiedZScoreDetector().fit(df, "LSTAT")
    zx = sorted(
        r["LSTAT"]
        for r in df.filter(z.outlier_predicate(F.col("LSTAT"))).collect()
    )
    assert zx == pytest.approx([36.98, 37.97])
    yq = YQuantileDetector().fit(df, "LSTAT", "MEDV")
    rows = df.filter(
        yq.outlier_predicate(F.col("LSTAT"), F.col("MEDV"))
    ).collect()
    assert sorted(round(r["LSTAT"], 2) for r in rows) == pytest.approx(
        [7.26, 7.44, 7.56, 8.88, 9.53, 9.59, 11.25, 14.79])
    assert sorted(round(r["MEDV"], 2) for r in rows) == pytest.approx(
        [30.7, 31.0, 33.8, 39.8, 43.1, 50.0, 50.0, 50.0])


def test_piecewise_binary_near_golden(breast_cancer):
    """reference tests/test_binning_piecewise.py:193-204 — the full
    pipeline (penalized-logistic smoothing, optimal-split knots,
    constrained piecewise LSQ) tracks the reference's ropwr QP output
    closely; asserted at 10% rel (the solvers differ internally)."""
    from optbinning_spark.piecewise import OptimalPWBinning

    pw = OptimalPWBinning(objective="binary", degree=1)
    pw.fit(breast_cancer, "mean radius", "target", lb=0.001, ub=0.999)
    out = pw.transform(breast_cancer.limit(4), "mean radius",
                       metric="event_rate", out_col="p").collect()
    got = [r["p"] for r in out]
    assert got == pytest.approx(
        [0.03015878, 0.02272502, 0.02526056, 0.97763604], rel=0.1)
    woe = pw.transform(breast_cancer.limit(4), "mean radius",
                       metric="woe", out_col="w").collect()
    got_w = [r["w"] for r in woe]
    assert got_w == pytest.approx(
        [3.99180564, 4.28245092, 4.17407503, -3.2565373], rel=0.1)


def test_continuous_2d_golden(spark):
    """reference tests/test_continuous_binning_2d.py:151-155 — mean
    objective over exact rectangle covers on Boston AGE x INDUS."""
    from optbinning_spark.binning_2d import ContinuousOptimalBinning2D

    raw = pd.read_csv(BOSTON_CSV, sep=r"\s+", skiprows=22, header=None)
    data = np.hstack([raw.values[::2, :], raw.values[1::2, :2]])
    pdf = pd.DataFrame({"AGE": data[:, 6], "INDUS": data[:, 2],
                        "MEDV": raw.values[1::2, 2]})
    df = spark.createDataFrame(pdf)
    ob = ContinuousOptimalBinning2D()
    ob.fit(df, "AGE", "INDUS", "MEDV")
    assert ob.iv == pytest.approx(4.80825509, rel=1e-6)
    assert ob.woe == pytest.approx(171.946019, rel=1e-6)


def _sklearn_like_split(x, y, test_size, seed):
    """Replicates sklearn train_test_split(shuffle) determinism:
    RandomState(seed).permutation, test = first ceil(ts*n)."""
    n = len(x)
    n_test = int(np.ceil(test_size * n))
    perm = np.random.RandomState(seed).permutation(n)
    te, tr = perm[:n_test], perm[n_test:]
    return x[tr], x[te], y[tr], y[te]


def test_scenario_binning_golden(spark, breast_cancer):
    """reference tests/test_binning_scenarios.py:155-171 — shared
    splits and WoE transform across three scenarios."""
    from optbinning_spark.scenario_binning import SBOptimalBinning

    bc = breast_cancer.toPandas()
    x = bc["mean radius"].values
    yv = bc["target"].values
    x1, _, y1, _ = _sklearn_like_split(x, yv, 0.5, 42)
    x3, x4, y3, y4 = _sklearn_like_split(x1, y1, 0.2, 42)
    frames = [
        pd.DataFrame({"x": xs, "y": ys.astype(int), "scen": f"s{i}"})
        for i, (xs, ys) in enumerate([(x1, y1), (x3, y3), (x4, y4)])
    ]
    df = spark.createDataFrame(pd.concat(frames))
    sb = SBOptimalBinning(monotonic_trend="descending")
    sb.fit(df, "x", "y", scenario_col="scen")
    assert list(sb.splits) == pytest.approx(
        [13.09499979, 14.14999962, 15.24499989], rel=1e-6)
    q = spark.createDataFrame(pd.DataFrame({"x": [12.0, 14.0, 15.0, 21.0]}))
    got = [r["x_woe"] for r in sb.transform(q, "x", metric="woe").collect()]
    assert got == pytest.approx(
        [-2.46667422, -0.55591146, 0.24544931, 2.8963411], rel=1e-6)


def test_categorical_user_splits_golden(spark):
    """reference tests/test_binning.py:342-368 — user-defined category
    groups as prebins; exact IV."""
    from optbinning_spark.binning import OptimalBinning

    np.random.seed(0)
    n = 100000
    xs = sum([[i] * n for i in [-1, 2, 3, 4, 7, 8, 9, 10]], [])
    ys = list(np.random.binomial(1, 0.011665, n))
    ys += list(np.zeros(n))
    ys += list(np.random.binomial(1, 0.0133333, n))
    ys += list(np.random.binomial(1, 0.166667, n))
    ys += list(np.zeros(n))
    ys += list(np.random.binomial(1, 0.0246041, n))
    ys += list(np.zeros(n))
    ys += list(np.random.binomial(1, 0.025641, n))
    df = spark.createDataFrame(
        pd.DataFrame({"x": xs, "y": np.array(ys, dtype=int)}))
    ob = OptimalBinning(
        dtype="categorical",
        user_splits=[[2.0, 7.0, 9.0, 3.0, 10.0, 4.0], [8], [-1]])
    ob.fit(df, "x", "y")
    assert ob.binning_table.iv == pytest.approx(0.09345086993827473, rel=1e-6)


def test_user_splits_max_pvalue_golden(breast_cancer):
    """reference tests/test_binning.py:205-215 — user splits filtered
    by the chi2 max_pvalue constraint; exact IV."""
    from optbinning_spark.binning import OptimalBinning

    ob = OptimalBinning(user_splits=[11, 12, 13, 14, 15, 17],
                        max_pvalue=0.05)
    ob.fit(breast_cancer, "mean radius", "target")
    assert list(ob.splits) == pytest.approx([13.0, 15.0, 17.0])
    assert ob.binning_table.iv == pytest.approx(4.819661314733627, rel=1e-9)


def test_continuous_max_pvalue_golden(boston):
    """reference tests/test_continuous_binning.py:209-222 — Welch
    t-test max_pvalue constraint."""
    from optbinning_spark.binning import ContinuousOptimalBinning

    ob = ContinuousOptimalBinning(max_pvalue=0.05)
    ob.fit(boston, "LSTAT", "MEDV")
    assert list(ob.splits) == pytest.approx(
        [4.6500001, 5.49499989, 7.68499994, 9.7249999, 11.67499971,
         14.4000001, 17.239999, 23.315000], rel=1e-6)
