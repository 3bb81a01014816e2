"""P4 bound filter, outlier_detector wiring in fit, F2/F3 transform
special/missing semantics, and M12/M13 perf-metric reports."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from optbinning_spark import OptimalBinning
from optbinning_spark.functions.perf_metrics import (
    classification_report,
    regression_report,
)


@pytest.fixture(scope="module")
def df(spark):
    rows = []
    rng = np.random.RandomState(7)
    for i in range(1000):
        x = float(i % 50)
        y = int(rng.rand() < (0.1 + 0.8 * (x / 50.0)))
        rows.append((i, x, y))
    for i in range(1000, 1050):
        rows.append((i, float("nan"), 1))
    for i in range(1050, 1100):
        rows.append((i, -9.0, 0))
    return spark.createDataFrame(rows, "id long, x double, y int")


def _total_count(ob):
    t = ob.binning_table
    return float(np.sum(t.count))


def test_fix_bounds_drop_clean_rows_only(df):
    base = OptimalBinning(user_splits=[10.0, 25.0], monotonic_trend=None,
                          special_codes=[-9.0])
    base.fit(df, "x", "y")
    bounded = OptimalBinning(user_splits=[10.0, 25.0], monotonic_trend=None,
                             special_codes=[-9.0], fix_lb=5.0, fix_ub=40.0)
    bounded.fit(df, "x", "y")
    # 1000 clean rows; x in {0..4} u {41..49} (14 values x 20 reps = 280)
    # dropped; missing (50) and special (50) rows retained.
    assert _total_count(base) == 1100.0
    assert _total_count(bounded) == 820.0
    kinds = list(bounded.binning_table.kinds)
    counts = bounded.binning_table.count
    assert sum(c for k, c in zip(kinds, counts) if k == "missing") == 50
    assert sum(c for k, c in zip(kinds, counts) if k == "special") == 50


def test_fix_lb_validation():
    with pytest.raises(ValueError):
        OptimalBinning(fix_lb=10.0, fix_ub=1.0)
    with pytest.raises(ValueError):
        OptimalBinning(outlier_detector="nope")


def test_outlier_detector_zscore_drops_extremes(spark):
    rows = [(i, float(i % 20), int(i % 3 == 0)) for i in range(900)]
    rows += [(900 + j, 1e6 + j, 1) for j in range(8)]  # gross outliers
    d = spark.createDataFrame(rows, "id long, x double, y int")
    ob = OptimalBinning(user_splits=[5.0, 10.0, 15.0], monotonic_trend=None,
                        outlier_detector="zscore")
    ob.fit(d, "x", "y")
    assert _total_count(ob) == 900.0  # outliers removed pre-binning


def test_indices_special_missing_empirical(df):
    ob = OptimalBinning(
        user_splits=[10.0, 25.0], monotonic_trend=None,
        special_codes={"neg": [-9.0]},
    )
    ob.fit(df, "x", "y")
    n_clean = sum(1 for k in ob.binning_table.kinds if k == "clean")
    out = ob.transform(df, "x", metric="indices", out_col="idx",
                       metric_special="empirical", metric_missing="empirical")
    special_idx = out.filter(F.col("x") == -9.0).select("idx").distinct().collect()
    missing_idx = out.filter(F.isnan("x")).select("idx").distinct().collect()
    assert [r["idx"] for r in special_idx] == [n_clean]
    assert [r["idx"] for r in missing_idx] == [n_clean + 1]
    # int policy passes through verbatim (reference transformations.py:212-225)
    out0 = ob.transform(df, "x", metric="indices", out_col="idx")
    assert out0.filter(F.isnan("x")).select("idx").distinct().collect()[0]["idx"] == 0


def test_bins_labels_for_special_dict(df):
    ob = OptimalBinning(
        user_splits=[10.0, 25.0], monotonic_trend=None,
        special_codes={"neg": [-9.0]},
    )
    ob.fit(df, "x", "y")
    out = ob.transform(df, "x", metric="bins", out_col="b")
    labels = {r["b"] for r in out.select("b").distinct().collect()}
    assert "neg" in labels and "Missing" in labels


def test_classification_report(spark):
    rows = [(1, 1), (1, 1), (1, 0), (0, 1), (0, 0), (0, 0), (0, 0), (1, 0)]
    d = spark.createDataFrame(rows, "y int, pred int")
    r = classification_report(d, "y", "pred").first()
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (2, 1, 2, 3)
    assert r["accuracy"] == pytest.approx(5 / 8)
    assert r["tpr"] == pytest.approx(0.5)
    assert r["tnr"] == pytest.approx(0.75)
    assert r["balanced_accuracy"] == pytest.approx(0.625)


def test_regression_report_exact(spark):
    y = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    p = y + np.array([0.5, -0.5, 0.0, 1.0, -1.0])
    d = spark.createDataFrame([(float(a), float(b)) for a, b in zip(y, p)],
                              "y double, pred double")
    r = regression_report(d, "y", "pred").first()
    err = p - y
    assert r["mae"] == pytest.approx(np.mean(np.abs(err)))
    assert r["mse"] == pytest.approx(np.mean(err ** 2))
    assert r["median_ae"] == pytest.approx(np.median(np.abs(err)))
    sst = np.sum((y - y.mean()) ** 2)
    assert r["r2"] == pytest.approx(1 - np.sum(err ** 2) / sst)


def test_information_reports(df):
    ob = OptimalBinning(user_splits=[10.0, 25.0], monotonic_trend=None)
    ob.fit(df, "x", "y")
    rep = ob.information(print_level=2)
    assert "OptimalBinning" in rep and "n bins" in rep and "iv" in rep


def test_binning_table_show_digits_and_plot_gate(spark):
    """build(show_digits=...) reformats labels (reference
    binning_statistics.py:498); plot() gates on matplotlib."""
    import optbinning_spark as ob

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").selectExpr(
        "l_extendedprice as x", 'cast(l_returnflag = "R" as int) as y')
    b = ob.OptimalBinning(name="x").fit(df, "x", "y")
    t = b.binning_table
    d2 = t.build(show_digits=2)
    d5 = t.build(show_digits=5)
    assert list(d2["count"]) == list(d5["count"])
    lbl2 = [s for s in d2["bin"] if s.startswith("[") or s.startswith("(")]
    lbl5 = [s for s in d5["bin"] if s.startswith("[") or s.startswith("(")]
    assert lbl2 != lbl5
    # a 5-digit label carries 5 decimals
    assert any("." in s and len(s.split(".")[1].split(",")[0]) == 5
               for s in lbl5)
    try:
        import matplotlib  # noqa: F401
        has_mpl = True
    except ImportError:
        has_mpl = False
    if not has_mpl:
        with pytest.raises(ImportError):
            t.plot(savefig="/tmp/unused.png")


def test_analysis_reports_and_fisher(spark):
    """analysis(print_output=True) prints reference-format reports for
    binary/continuous/multiclass; Fisher test option matches scipy's
    published value on the classic 2x2."""
    import numpy as np
    import optbinning_spark as ob
    from optbinning_spark.core.special_math import fisher_exact_2x2

    odds, p = fisher_exact_2x2(np.array([[8, 2], [1, 5]]))
    assert odds == pytest.approx(20.0)
    assert p == pytest.approx(0.034965034965, rel=1e-9)

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").selectExpr(
        "l_quantity as x", "l_extendedprice as z",
        'cast(l_returnflag = "R" as int) as y')
    b = ob.OptimalBinning(name="x").fit(df, "x", "y")
    a = b.binning_table.analysis(print_output=True, n_samples=20)
    assert 0 <= a["quality_score"] <= 1
    af = b.binning_table.analysis(pvalue_test="fisher", bayes=False)
    assert len(af["chi2_pvalues"]) == len(a["chi2_pvalues"])

    cb = ob.ContinuousOptimalBinning(name="x").fit(df, "x", "z")
    ca = cb.binning_table.analysis(print_output=True)
    assert 0 <= ca["quality_score"] <= 1
    assert len(ca["t_pvalues"]) == ca["n_bins"] - 1

    df3 = df.withColumn(
        "y3", (F.col("z") / 20000).cast("int"))
    mb = ob.MulticlassOptimalBinning(name="x").fit(
        df3.filter(F.col("y3") <= 2), "x", "y3")
    ma = mb.binning_table.analysis(print_output=True)
    assert set(ma["monotonic_trends"]) == {"0", "1", "2"}
    assert 0 <= ma["quality_score"] <= 1
