import numpy as np
import pytest
from pyspark.sql import functions as F

from optbinning_spark.binning_2d import OptimalBinning2D
from optbinning_spark.operators.outlier import (
    ModifiedZScoreDetector,
    RangeDetector,
    YQuantileDetector,
)
from optbinning_spark.piecewise import OptimalPWBinning


@pytest.fixture(scope="module")
def outlier_df(spark):
    rng = np.random.RandomState(0)
    rows = [(float(v),) for v in rng.normal(50, 5, 2000)]
    rows += [(500.0,), (-500.0,), (1000.0,)]
    return spark.createDataFrame(rows, "x double")


def test_range_detector(outlier_df):
    det = RangeDetector().fit(outlier_df, "x")
    flagged = {
        r["x"] for r in
        outlier_df.filter(det.outlier_predicate(F.col("x"))).collect()
    }
    # planted extremes must be flagged; a ~1% natural normal tail may
    # also trip Tukey fences
    assert {500.0, -500.0, 1000.0} <= flagged
    assert len(flagged) < 40
    assert det.filter_outliers(outlier_df, "x").count() == 2003 - len(flagged)


def test_zscore_detector(outlier_df):
    det = ModifiedZScoreDetector().fit(outlier_df, "x")
    n_out = outlier_df.filter(det.outlier_predicate(F.col("x"))).count()
    assert n_out >= 3  # at least the planted outliers


def test_yquantile_detector(spark):
    rng = np.random.RandomState(1)
    rows = []
    for i in range(2000):
        x = float(rng.uniform(0, 10))
        y = float(3 * x + rng.normal(0, 0.5))
        rows.append((x, y))
    rows.append((1.0, 100.0))  # y-outlier at low x, normal at global scale
    df = spark.createDataFrame(rows, "x double, y double")
    det = YQuantileDetector(n_bins=5).fit(df, "x", "y")
    out = df.filter(det.outlier_predicate(F.col("x"), F.col("y"))).collect()
    assert any(r["y"] == 100.0 for r in out)
    det2 = YQuantileDetector(n_bins=5, method="zscore").fit(df, "x", "y")
    out2 = df.filter(det2.outlier_predicate(F.col("x"), F.col("y"))).collect()
    assert any(r["y"] == 100.0 for r in out2)


def test_binning_2d(spark):
    rng = np.random.RandomState(2)
    rows = []
    for i in range(4000):
        x = float(rng.uniform(0, 10))
        y = float(rng.uniform(0, 10))
        # event prob high in the (x>5, y>5) quadrant
        p = 0.7 if (x > 5 and y > 5) else 0.2
        rows.append((x, y, int(rng.rand() < p)))
    df = spark.createDataFrame(rows, "x double, y double, t int")
    ob = OptimalBinning2D(max_n_prebins_x=6, max_n_prebins_y=6,
                          min_bin_size=0.05)
    ob.fit(df, "x", "y", "t")
    tab = ob.binning_table()
    assert ob.iv > 0.1
    assert tab["count"].sum() == 4000
    # rectangles tile the grid: counts are a partition
    out = ob.transform(df, "x", "y", metric="indices", out_col="b")
    assert out.filter(F.col("b") == -1).count() == 0
    # the hot quadrant should land in a high-event-rate rectangle
    hot = out.filter((F.col("x") > 6) & (F.col("y") > 6)).select("b").distinct()
    hot_bins = {r["b"] for r in hot.collect()}
    rates = dict(zip(tab["bin"], tab["event_rate"]))
    assert max(rates[b] for b in hot_bins) > 0.5


def test_binning_2d_quantile_exact_vs_approx_gate(spark):
    """The 2-D quantile prebin path is cardinality-gated: exact
    F.percentile below the gate, GK approxQuantile above it. Both
    paths must produce near-identical splits on moderate data (the
    approx path is 1e-4 relative-rank), and the exact path's medians
    must equal numpy's exactly."""
    import numpy as np

    from optbinning_spark.binning_2d import _quantile_axis_splits

    rng = np.random.RandomState(5)
    xs = rng.uniform(0, 100, 3000)
    ys = rng.normal(50, 10, 3000)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(xs, ys)],
        "x double, y double")
    qx, qy = _quantile_axis_splits(df, "x", "y", 2, 2)
    assert qx[0] == pytest.approx(float(np.percentile(xs, 50)), abs=0)
    assert qy[0] == pytest.approx(float(np.percentile(ys, 50)), abs=0)
    # force the approx fallback: gate of 0 distinct values
    ax, ay = _quantile_axis_splits(df, "x", "y", 2, 2,
                                   max_exact_distinct=0)
    assert ax[0] == pytest.approx(qx[0], rel=1e-2)
    assert ay[0] == pytest.approx(qy[0], rel=1e-2)
    # degenerate 1x1 grid: no splits, no jobs needed
    assert _quantile_axis_splits(df, "x", "y", 1, 1) == ([], [])
    # empty input: F.percentile returns NULL — the exact path must
    # degrade to no splits like approxQuantile, not raise TypeError
    empty = df.filter("x > 1e12")
    assert _quantile_axis_splits(empty, "x", "y", 2, 2) == ([], [])


def test_binning_2d_woe_transform(spark):
    rng = np.random.RandomState(3)
    rows = [
        (float(rng.uniform(0, 1)), float(rng.uniform(0, 1)), int(rng.rand() < 0.3))
        for _ in range(1000)
    ]
    df = spark.createDataFrame(rows, "x double, y double, t int")
    ob = OptimalBinning2D(max_n_prebins_x=4, max_n_prebins_y=4)
    ob.fit(df, "x", "y", "t")
    out = ob.transform(df, "x", "y", metric="woe", out_col="w")
    assert out.filter(F.col("w").isNull()).count() == 0


def test_piecewise_continuous(spark):
    rng = np.random.RandomState(4)
    rows = []
    for i in range(3000):
        x = float(rng.uniform(0, 10))
        y = float(2 * x + 1 + rng.normal(0, 0.3))
        rows.append((x, y))
    df = spark.createDataFrame(rows, "x double, y double")
    pw = OptimalPWBinning(objective="continuous", degree=1,
                          prebinning_method="quantile")
    pw.fit(df, "x", "y")
    out = pw.transform(df, "x", out_col="yhat")
    r = out.agg(
        F.avg(F.abs(F.col("yhat") - F.col("y"))).alias("mae")
    ).first()
    assert r["mae"] < 0.5  # near-exact linear recovery
    # continuity at knots: evaluate both sides of each split
    for s in pw.splits_:
        left = pw.coef0_[list(pw.splits_).index(s)] + pw.coef1_[
            list(pw.splits_).index(s)] * s
        right = pw.coef0_[list(pw.splits_).index(s) + 1] + pw.coef1_[
            list(pw.splits_).index(s) + 1] * s
        assert left == pytest.approx(right, abs=1e-6)


def test_piecewise_binary(spark):
    rng = np.random.RandomState(5)
    rows = []
    for i in range(3000):
        x = float(rng.uniform(0, 100))
        y = int(rng.rand() < (0.1 + 0.8 * x / 100))
        rows.append((x, y))
    df = spark.createDataFrame(rows, "x double, y int")
    pw = OptimalPWBinning(objective="binary", degree=1,
                          prebinning_method="quantile",
                          monotonic_trend="ascending")
    pw.fit(df, "x", "y")
    out = pw.transform(df, "x", metric="event_rate", out_col="p")
    r = out.agg(F.min("p"), F.max("p"), F.avg("p")).first()
    assert 0 <= r[0] <= r[1] <= 1
    assert r[2] == pytest.approx(0.5, abs=0.1)
    # woe metric produces finite values
    w = pw.transform(df, "x", metric="woe", out_col="w")
    assert w.filter(F.isnan("w")).count() == 0


def test_piecewise_degree0(spark):
    rng = np.random.RandomState(6)
    rows = [(float(rng.uniform(0, 10)), float(rng.normal(5, 1))) for _ in range(500)]
    df = spark.createDataFrame(rows, "x double, y double")
    pw = OptimalPWBinning(objective="continuous", degree=0, continuity=False,
                          prebinning_method="quantile")
    pw.fit(df, "x", "y")
    assert np.allclose(pw.coef1_, 0.0)


def test_piecewise_divergences_sane(spark):
    import pyspark.sql.functions as F

    from optbinning_spark.piecewise import OptimalPWBinning

    df = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .withColumn("y", (F.col("l_returnflag") == "R").cast("int"))
    )
    pw = OptimalPWBinning(objective="binary", degree=1,
                          prebinning_method="quantile")
    pw.fit(df, "l_extendedprice", "y")
    d = pw.divergences(df, "l_extendedprice", "y")
    assert d["iv"] >= 0.0 and d["js"] >= 0.0
    assert d["js"] <= 1.0


def test_piecewise_peak_trend(spark):
    """Auto trend classifies a peak shape and the QP allows exactly
    one slope-sign change (ropwr monotonic_trend='peak' family)."""
    rng = np.random.RandomState(11)
    rows = []
    for _ in range(4000):
        x = float(rng.uniform(0, 10))
        y = float(-((x - 6.0) ** 2) + 36.0 + rng.normal(0, 0.5))
        rows.append((x, y))
    df = spark.createDataFrame(rows, "x double, y double")
    pw = OptimalPWBinning(objective="continuous", degree=1)
    pw.fit(df, "x", "y")
    signs = np.sign(np.round(pw.coef1_, 10))
    nz = signs[signs != 0]
    # ascending run then descending run, single change point
    changes = int(np.count_nonzero(np.diff(nz) != 0))
    assert changes == 1 and nz[0] > 0 and nz[-1] < 0
    # fit quality: the hat tracks the parabola closely
    out = pw.transform(df, "x", out_col="yhat")
    mae = out.agg(F.avg(F.abs(F.col("yhat") - F.col("y")))).first()[0]
    assert mae < 1.5


def test_piecewise_degree2_spline(spark):
    """Degree-2 spline (C1 continuity, reference continuous_deriv
    default) recovers a smooth quadratic and is C1 at every knot."""
    rng = np.random.RandomState(12)
    rows = []
    for _ in range(4000):
        x = float(rng.uniform(0, 10))
        y = float(0.5 * x * x - 2.0 * x + 3.0 + rng.normal(0, 0.3))
        rows.append((x, y))
    df = spark.createDataFrame(rows, "x double, y double")
    pw = OptimalPWBinning(objective="continuous", degree=2,
                          monotonic_trend=None)
    pw.fit(df, "x", "y")
    out = pw.transform(df, "x", out_col="yhat")
    mae = out.agg(F.avg(F.abs(F.col("yhat") - F.col("y")))).first()[0]
    assert mae < 0.5
    # C0 and C1 continuity at each knot (in the rescaled domain)
    ss = pw._scaled_splits
    for j, s in enumerate(ss):
        cl, cr = pw.coefs_[j], pw.coefs_[j + 1]
        vl = cl[0] + cl[1] * s + cl[2] * s * s
        vr = cr[0] + cr[1] * s + cr[2] * s * s
        assert vl == pytest.approx(vr, abs=1e-6)
        dl = cl[1] + 2 * cl[2] * s
        dr = cr[1] + 2 * cr[2] * s
        assert dl == pytest.approx(dr, abs=1e-5)


def test_piecewise_degree2_monotone_bounds(spark):
    """Degree-2 with ascending trend + bounds: fitted curve respects
    f' >= 0 and lb/ub at the checked points."""
    rng = np.random.RandomState(13)
    rows = []
    for _ in range(3000):
        x = float(rng.uniform(0, 10))
        y = float(1.0 / (1.0 + np.exp(-(x - 5.0))) + rng.normal(0, 0.05))
        rows.append((x, y))
    df = spark.createDataFrame(rows, "x double, y double")
    pw = OptimalPWBinning(objective="continuous", degree=2,
                          monotonic_trend="ascending", lb=0.0, ub=1.0)
    pw.fit(df, "x", "y")
    grid = spark.createDataFrame(
        [(float(v),) for v in np.linspace(0.01, 9.99, 200)], "x double")
    vals = [r["p"] for r in
            pw.transform(grid, "x", out_col="p").orderBy("x").collect()]
    assert min(vals) >= -1e-6 and max(vals) <= 1.0 + 1e-6
    diffs = np.diff(np.array(vals))
    assert diffs.min() > -1e-3  # monotone up to grid noise


def test_piecewise_convex_degree2(spark):
    """monotonic_trend='convex' (reference test_binning_piecewise.py:83
    family): f'' >= 0 within pieces and f' ordered across knots."""
    rng = np.random.RandomState(14)
    rows = []
    for _ in range(3000):
        x = float(rng.uniform(-3, 3))
        y = float(x * x + rng.normal(0, 0.2))
        rows.append((x, y))
    df = spark.createDataFrame(rows, "x double, y double")
    pw = OptimalPWBinning(objective="continuous", degree=2,
                          monotonic_trend="convex")
    pw.fit(df, "x", "y")
    # convexity: quadratic coefficient of every piece is >= 0
    assert (pw.coefs_[:, 2] >= -1e-8).all()
    # and the fit still tracks the parabola
    out = pw.transform(df, "x", out_col="yhat")
    mae = out.agg(F.avg(F.abs(F.col("yhat") - F.col("y")))).first()[0]
    assert mae < 0.5


def test_piecewise_robust_losses(spark):
    """IRLS l1/huber/quantile: outlier-contaminated linear data — the
    robust fits shrug off the outliers that pull the l2 fit."""
    rng = np.random.RandomState(15)
    rows = []
    for i in range(3000):
        x = float(rng.uniform(0, 10))
        y = float(2 * x + 1 + rng.normal(0, 0.2))
        if i % 20 == 0:
            y += 80.0  # gross one-sided outliers
        rows.append((x, y))
    df = spark.createDataFrame(rows, "x double, y double")
    fits = {}
    for loss in ("l2", "l1", "huber"):
        pw = OptimalPWBinning(objective="continuous", degree=1, loss=loss,
                              monotonic_trend="ascending")
        pw.fit(df, "x", "y")
        grid = spark.createDataFrame(
            [(float(v),) for v in np.linspace(0.5, 9.5, 50)], "x double")
        vals = np.array([
            r["p"] for r in
            pw.transform(grid, "x", out_col="p").orderBy("x").collect()
        ])
        truth = 2 * np.linspace(0.5, 9.5, 50) + 1
        fits[loss] = float(np.abs(vals - truth).mean())
    # outliers bias l2 up by ~4 (5% x 80); robust fits stay near truth
    assert fits["l1"] < 1.0 and fits["huber"] < 1.5
    assert fits["l2"] > 2.0
    # quantile tau=0.5 ~ l1
    pw = OptimalPWBinning(objective="continuous", degree=1, loss="quantile",
                          quantile=0.5)
    pw.fit(df, "x", "y")
    assert pw.coefs_.shape[1] == 2


def test_piecewise_special_missing_transform(spark):
    """special_codes routing + metric_special/metric_missing policies
    (reference piecewise/transformations.py:62-137)."""
    rng = np.random.RandomState(16)
    rows = []
    for i in range(2000):
        x = float(rng.uniform(0, 10))
        y = int(rng.rand() < 0.1 + 0.08 * x)
        rows.append((x, y))
    for _ in range(100):
        rows.append((-9.0, 1))        # special, all events
    for _ in range(100):
        rows.append((float("nan"), 0))  # missing, all nonevents
    df = spark.createDataFrame(rows, "x double, y int")
    pw = OptimalPWBinning(objective="binary", degree=1,
                          special_codes=[-9.0])
    pw.fit(df, "x", "y", lb=0.001, ub=0.999)
    out = df.select(
        "x",
        pw.transform_expr(F.col("x"), "event_rate",
                          metric_special="empirical",
                          metric_missing="empirical").alias("er"),
        pw.transform_expr(F.col("x"), "event_rate").alias("er0"),
    )
    sp = out.filter(F.col("x") == -9.0).select("er", "er0").distinct().collect()
    assert len(sp) == 1
    assert sp[0]["er"] == pytest.approx(1.0, abs=1e-9)  # empirical rate
    assert sp[0]["er0"] == 0.0                          # fixed default
    mi = out.filter(F.isnan("x")).select("er").distinct().collect()
    assert mi[0]["er"] == pytest.approx(0.0, abs=1e-9)


def test_status_property_surface(spark):
    """Reference .status surface (binning.py:1178-1187) on every
    solver-backed class."""
    import optbinning_spark as ob

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").selectExpr(
        "l_quantity as x", "l_extendedprice as x2",
        'cast(l_returnflag = "R" as int) as y')
    b = ob.OptimalBinning(name="x").fit(df, "x", "y")
    assert b.status == "OPTIMAL"
    b2 = ob.OptimalBinning2D().fit(df, "x", "x2", "y")
    assert b2.status == "OPTIMAL"
    import pytest as _pt
    with _pt.raises(RuntimeError):
        ob.OptimalBinning(name="q").status


def test_binning_table_2d_view(spark):
    """Reference-style 2-D table object: build/analysis plus the
    legacy callable DataFrame shortcut (binning_statistics_2d.py)."""
    import optbinning_spark as ob

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").selectExpr(
        "l_quantity as x", "l_extendedprice as x2",
        "l_discount as d",
        'cast(l_returnflag = "R" as int) as y')
    b2 = ob.OptimalBinning2D().fit(df, "x", "x2", "y")
    legacy = b2.binning_table()
    built = b2.binning_table.build(show_digits=4, show_bin_xy=True)
    assert len(built) == len(legacy) + 1  # totals row
    assert "bin_xy" in built.columns
    a = b2.binning_table.analysis(print_output=True)
    assert 0 <= a["quality_score"] <= 1
    assert a["n_bins"] == len(legacy)

    c2 = ob.ContinuousOptimalBinning2D().fit(df, "x", "x2", "d")
    ca = c2.binning_table.analysis()
    assert "t_pvalues" in ca
    cb = c2.binning_table.build(add_totals=False)
    assert "count_pct" in cb.columns


def test_pw_binning_table_coefficients(spark):
    """PWBinningTable build: inner knot-bin counts + x-domain c0..cd
    columns; special/missing rows carry the empirical rate in c0
    (reference piecewise/binning_statistics.py:98-171)."""
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").selectExpr(
        "l_extendedprice as x", 'cast(l_returnflag = "R" as int) as y')
    pw = OptimalPWBinning(objective="binary", degree=1).fit(df, "x", "y")
    tbl = pw.binning_table.build(add_totals=False)
    assert {"c0", "c1"} <= set(tbl.columns)
    k = len(pw.splits) + 1
    # x-domain coefficients reproduce the transform at bin midpoints
    splits = list(pw.splits)
    mids = []
    edges = [float(df.agg(F.min("x")).first()[0])] + [float(s) for s in splits] + [
        float(df.agg(F.max("x")).first()[0])]
    for i in range(k):
        mids.append(0.5 * (edges[i] + edges[i + 1]))
    probe = spark.createDataFrame([(float(m),) for m in mids], "x double")
    got = [r["p"] for r in
           pw.transform(probe, "x", metric="event_rate", out_col="p")
           .collect()]
    for i, m in enumerate(mids):
        c0, c1 = float(tbl["c0"][i]), float(tbl["c1"][i])
        raw = c0 + c1 * m
        clipped = min(max(raw, pw.lb if pw.lb is not None else raw),
                      pw.ub if pw.ub is not None else raw)
        assert got[i] == pytest.approx(clipped, rel=1e-6, abs=1e-9)


def test_piecewise_custom_estimator_x6(spark):
    """X6: a custom predict_proba estimator drives the binary PW
    smoothing (reference piecewise/base.py:215-233); with a smoother
    equivalent to the built-in, transforms stay finite and bounded."""
    import numpy as np
    import pyspark.sql.functions as F

    from optbinning_spark.piecewise import OptimalPWBinning

    class LogisticLike:
        """Weighted Newton logistic, sklearn-style surface."""

        def fit(self, X, y, sample_weight=None):
            w = np.ones(len(y)) if sample_weight is None else sample_weight
            A = np.hstack([np.asarray(X, float), np.ones((len(y), 1))])
            beta = np.zeros(A.shape[1])
            for _ in range(50):
                p = 1.0 / (1.0 + np.exp(-(A @ beta)))
                g = A.T @ (w * (y - p))
                H = (A * (w * p * (1 - p))[:, None]).T @ A
                step = np.linalg.solve(H + 1e-9 * np.eye(len(beta)), g)
                beta += step
                if np.max(np.abs(step)) < 1e-10:
                    break
            self._beta = beta
            return self

        def predict_proba(self, X):
            A = np.hstack([np.asarray(X, float), np.ones((len(X), 1))])
            p = 1.0 / (1.0 + np.exp(-(A @ self._beta)))
            return np.column_stack([1 - p, p])

    df = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .withColumn("y", (F.col("l_returnflag") == "R").cast("int"))
    )
    pw = OptimalPWBinning(objective="binary", degree=1,
                          estimator=LogisticLike())
    pw.fit(df, "l_quantity", "y")
    out = pw.transform(df, "l_quantity", out_col="p").select("p").toPandas()
    assert np.isfinite(out["p"]).all()
    assert (out["p"] >= 0).all() and (out["p"] <= 1.0 + 1e-9).all()


def test_piecewise_custom_estimator_no_sample_weight(spark):
    """X6 estimator whose fit() lacks sample_weight: the signature is
    inspected (not a bare except TypeError) and the fit runs on
    weight-expanded rows with weights rescaled so fractional values
    are not truncated to zero."""
    import numpy as np
    import pyspark.sql.functions as F

    from optbinning_spark.piecewise import OptimalPWBinning

    calls = {}

    class NoWeight:
        def fit(self, X, y):
            calls["n_rows"] = len(y)
            X = np.asarray(X, float)
            A = np.hstack([X, np.ones((len(y), 1))])
            beta = np.zeros(A.shape[1])
            for _ in range(50):
                p = 1.0 / (1.0 + np.exp(-(A @ beta)))
                g = A.T @ (np.asarray(y) - p)
                H = (A * (p * (1 - p))[:, None]).T @ A
                step = np.linalg.solve(H + 1e-9 * np.eye(len(beta)), g)
                beta += step
                if np.max(np.abs(step)) < 1e-10:
                    break
            self._beta = beta
            return self

        def predict_proba(self, X):
            A = np.hstack([np.asarray(X, float), np.ones((len(X), 1))])
            p = 1.0 / (1.0 + np.exp(-(A @ self._beta)))
            return np.column_stack([1 - p, p])

    df = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .withColumn("y", (F.col("l_returnflag") == "R").cast("int"))
    )
    pw = OptimalPWBinning(objective="binary", degree=1,
                          estimator=NoWeight())
    pw.fit(df, "l_quantity", "y")
    assert calls["n_rows"] > 0  # expansion path actually ran
    out = pw.transform(df, "l_quantity", out_col="p").select("p").toPandas()
    assert np.isfinite(out["p"]).all()


def test_piecewise_estimator_internal_typeerror_propagates(spark):
    """A TypeError raised INSIDE a user estimator's fit must propagate
    (the old bare `except TypeError` silently retried the
    no-sample_weight fallback)."""
    import pyspark.sql.functions as F
    import pytest

    from optbinning_spark.piecewise import OptimalPWBinning

    class Broken:
        def fit(self, X, y, sample_weight=None):
            raise TypeError("inner estimator bug")

        def predict_proba(self, X):  # pragma: no cover
            raise AssertionError("unreachable")

    df = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .withColumn("y", (F.col("l_returnflag") == "R").cast("int"))
    )
    pw = OptimalPWBinning(objective="binary", degree=1, estimator=Broken())
    with pytest.raises(TypeError, match="inner estimator bug"):
        pw.fit(df, "l_quantity", "y")


def test_plot_methods_cleanly_gated_without_matplotlib(spark):
    """Every plot surface raises a clear ImportError (not an
    AttributeError mid-render) when matplotlib is absent — the
    optional-dependency contract a headless deployment relies on."""
    import importlib.util

    import pytest as _pt

    if importlib.util.find_spec("matplotlib") is not None:
        _pt.skip("matplotlib installed: gating not exercised")
    import numpy as np

    from optbinning_spark import OptimalBinning

    rng = np.random.RandomState(3)
    df = spark.createDataFrame(
        [(float(rng.uniform(0, 10)), int(rng.rand() < 0.3))
         for _ in range(500)], "x double, y int")
    ob = OptimalBinning(prebinning_method="quantile")
    ob.fit(df, "x", "y")
    with _pt.raises(ImportError, match="matplotlib"):
        ob.binning_table.plot()


def test_pack_and_chunk_property(spark):
    """Hypothesis property: for ANY document length profile, packing
    conserves tokens with exact tiling and chunking covers each doc
    exactly once outside overlaps."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from optbinning_spark.pipeline.text import (
        chunk_documents,
        pack_sequences,
    )

    @settings(max_examples=8, deadline=None)
    @given(lens=st.lists(st.integers(min_value=1, max_value=33),
                         min_size=1, max_size=12),
           L=st.integers(min_value=2, max_value=16))
    def run(lens, L):
        rows = [(i, " ".join(f"t{i}_{j}" for j in range(n)))
                for i, n in enumerate(lens)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        packed = pack_sequences(docs, seq_tokens=L).collect()
        assert sum(r["n_tokens"] for r in packed) == sum(lens)
        seqs = {}
        for r in packed:
            seqs.setdefault(r["seq_id"], []).append(r)
        for sid, parts in seqs.items():
            parts.sort(key=lambda r: r["seq_offset"])
            off = 0
            for p in parts:
                assert p["seq_offset"] == off
                off += p["n_tokens"]
            assert off <= L
            if sid != max(seqs):
                assert off == L
        ov = max(0, L // 3)
        if ov < L:
            chunks = chunk_documents(
                docs, chunk_tokens=L, overlap=ov).collect()
            by_doc = {}
            for r in chunks:
                by_doc.setdefault(r["doc_id"], []).append(r)
            for i, text in rows:
                words = text.split(" ")
                cs = sorted(by_doc[i], key=lambda r: r["chunk_id"])
                seen = []
                for k, c in enumerate(cs):
                    toks = c["text"].split(" ")
                    seen.extend(toks[ov:] if k else toks)
                assert seen == words

    run()


def test_robust_fit_nan_inputs_fail_loudly(spark):
    """Round-13 ADVICE: the Arrow toPandas swap in the robust-fit
    subsample paths turned a null label (scorecard) / NaN x
    (piecewise) from a loud TypeError into a silent NaN that poisons
    every coefficient. The finite-guards restore the loud failure."""
    from optbinning_spark.binning_process import BinningProcess
    from optbinning_spark.scorecard import Scorecard

    rows = [(float(i % 10) + 0.01 * i, float(3 * (i % 10)))
            for i in range(400)]
    base = spark.createDataFrame(rows, "x double, y double")
    poisoned = base.unionByName(
        spark.createDataFrame([(5.0, None)], "x double, y double"))
    sc = Scorecard(BinningProcess(["x"], prebinning_method="quantile"),
                   estimator="huber")
    with pytest.raises(ValueError, match="design matrix"):
        sc.fit(poisoned, "y")

    # piecewise: NaN x/y is routed to missing by the clean filter,
    # but +/-Inf passes both the null and isnan gates
    inf_x = base.unionByName(spark.createDataFrame(
        [(float("inf"), 5.0)], "x double, y double"))
    pw = OptimalPWBinning(objective="continuous", degree=1, loss="huber")
    with pytest.raises(ValueError, match="non-finite"):
        pw.fit(inf_x, "x", "y")
