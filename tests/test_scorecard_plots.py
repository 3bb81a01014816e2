"""Scorecard performance plots (reference scorecard/plots.py:51-229):
the curve DATA is computed by a bounded bucket aggregation (Spark-side)
and verified here against a numpy brute force over the identical
bucketization; rendering itself is matplotlib-gated like every other
plot surface (see test_longtail.py's gating test)."""

import importlib.util

import numpy as np
import pytest
from pyspark.sql import functions as F

from optbinning_spark import BinningProcess
from optbinning_spark.functions.plots import (auc_roc_curve_data,
                                              cap_curve_data,
                                              ks_curve_data, plot_auc_roc,
                                              plot_cap, plot_ks)
from optbinning_spark.scorecard import Scorecard

SF = "/root/testdata/sf0.001"
N_BUCKETS = 256


@pytest.fixture(scope="module")
def scored(spark):
    df = (spark.read.parquet(f"{SF}/lineitem.parquet")
          .withColumn("y", (F.col("l_returnflag") == "R").cast("int")))
    bp = BinningProcess(["l_quantity", "l_extendedprice", "l_discount"],
                        prebinning_method="quantile")
    sc = Scorecard(bp, scaling_method="min_max",
                   scaling_method_params={"min": 0, "max": 100})
    sc.fit(df, "y")
    out = sc.score(df).select("y", "score")
    pdf = out.toPandas()
    return out, pdf["y"].to_numpy().astype(float), \
        pdf["score"].to_numpy().astype(float)


def _np_buckets(y, s, n_buckets):
    lo, hi = float(s.min()), float(s.max())
    width = (hi - lo) / n_buckets
    b = np.minimum(np.floor((s - lo) / width), n_buckets - 1).astype(int)
    ev = np.zeros(n_buckets)
    ne = np.zeros(n_buckets)
    np.add.at(ev, b, y)
    np.add.at(ne, b, 1.0 - y)
    keep = (ev + ne) > 0
    edges = lo + width * (np.arange(n_buckets) + 1)
    return edges[keep], ev[keep], ne[keep]


def _np_auc_tied(ev, ne):
    """Mann-Whitney AUC with midrank ties per bucket (descending)."""
    auc = ce = 0.0
    for e, n in zip(ev[::-1], ne[::-1]):
        auc += n * (ce + e / 2.0)
        ce += e
    return auc / (ev.sum() * ne.sum())


def test_roc_curve_matches_numpy(scored):
    df, y, s = scored
    data = auc_roc_curve_data(df, "y", "score", n_buckets=N_BUCKETS)
    edges, ev, ne = _np_buckets(y, s, N_BUCKETS)
    assert len(data["fpr"]) == len(ev) + 1
    assert data["fpr"][0] == 0.0 and data["tpr"][0] == 0.0
    assert data["fpr"][-1] == pytest.approx(1.0)
    assert data["tpr"][-1] == pytest.approx(1.0)
    exp_tpr = np.concatenate([[0.0], np.cumsum(ev[::-1]) / ev.sum()])
    exp_fpr = np.concatenate([[0.0], np.cumsum(ne[::-1]) / ne.sum()])
    np.testing.assert_allclose(data["tpr"], exp_tpr, atol=1e-12)
    np.testing.assert_allclose(data["fpr"], exp_fpr, atol=1e-12)
    assert data["auc"] == pytest.approx(_np_auc_tied(ev, ne), abs=1e-12)
    # the scorecard separates the classes (weakly — TPC-H returnflag
    # is nearly independent of the price columns; measured ~0.53):
    # this guards the degenerate constant-score case, not model power
    assert data["auc"] > 0.51
    # bucket-tied AUC converges to the exact raw-score AUC: compare
    # with an exact midrank Mann-Whitney over the raw scores
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty(len(s))
    ss = s[order]
    i = 0
    while i < len(ss):
        j = i
        while j + 1 < len(ss) and ss[j + 1] == ss[i]:
            j += 1
        ranks[order[i:j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    n_e = y.sum()
    exact = (ranks[y == 1].sum() - n_e * (n_e + 1) / 2) / (
        n_e * (len(y) - n_e))
    assert data["auc"] == pytest.approx(exact, abs=2e-3)


def test_cap_curve_matches_numpy(scored):
    df, y, s = scored
    data = cap_curve_data(df, "y", "score", n_buckets=N_BUCKETS)
    edges, ev, ne = _np_buckets(y, s, N_BUCKETS)
    assert data["gini"] == pytest.approx(
        2 * _np_auc_tied(ev, ne) - 1, abs=1e-12)
    assert data["event_rate"] == pytest.approx(y.mean(), abs=1e-12)
    exp_pev = np.concatenate([[0.0], np.cumsum(ev[::-1]) / ev.sum()])
    exp_pop = np.concatenate(
        [[0.0], np.cumsum((ev + ne)[::-1]) / (ev + ne).sum()])
    np.testing.assert_allclose(data["p_event"], exp_pev, atol=1e-12)
    np.testing.assert_allclose(data["p_population"], exp_pop, atol=1e-12)
    # CAP dominates the diagonal for a positively-separating model
    mid = len(exp_pop) // 2
    assert data["p_event"][mid] >= data["p_population"][mid]


def test_ks_curve_matches_numpy(scored):
    df, y, s = scored
    data = ks_curve_data(df, "y", "score", n_buckets=N_BUCKETS)
    edges, ev, ne = _np_buckets(y, s, N_BUCKETS)
    pe = np.cumsum(ev) / ev.sum()
    pne = np.cumsum(ne) / ne.sum()
    ks = np.abs(pe - pne)
    np.testing.assert_allclose(data["p_event"], pe, atol=1e-12)
    np.testing.assert_allclose(data["p_nonevent"], pne, atol=1e-12)
    assert data["ks"] == pytest.approx(ks.max(), abs=1e-12)
    assert data["ks_score"] == pytest.approx(edges[ks.argmax()], abs=1e-9)
    assert 0.0 < data["ks"] <= 1.0


def test_degenerate_inputs(scored, spark):
    df, _, _ = scored
    one_class = df.where(F.col("y") == 1)
    with pytest.raises(ValueError, match="both classes"):
        auc_roc_curve_data(one_class, "y", "score")
    with pytest.raises(ValueError, match="empty"):
        ks_curve_data(df.limit(0), "y", "score")
    with pytest.raises(ValueError, match="n_buckets"):
        cap_curve_data(df, "y", "score", n_buckets=1)
    # constant score: single degenerate bucket, AUC = 0.5 by midrank
    const = df.withColumn("score", F.lit(7.0))
    assert auc_roc_curve_data(const, "y", "score")["auc"] == \
        pytest.approx(0.5, abs=1e-12)


def test_plot_render_or_clean_gate(scored, tmp_path):
    """With matplotlib present all three render to files from the
    fitted scorecard's scores; without it each raises the package's
    uniform ImportError AFTER the Spark aggregation succeeded (the
    data path is exercised either way)."""
    df, _, _ = scored
    have_mpl = importlib.util.find_spec("matplotlib") is not None
    for fn in (plot_auc_roc, plot_cap, plot_ks):
        if have_mpl:
            out = str(tmp_path / f"{fn.__name__}.png")
            data = fn(df, "y", "score", savefig=out, n_buckets=64)
            assert isinstance(data, dict)
            import os
            assert os.path.getsize(out) > 0
        else:
            with pytest.raises(ImportError, match="matplotlib"):
                fn(df, "y", "score", n_buckets=64)


def test_null_and_nan_scores_are_excluded(spark):
    """Review finding: least() skips nulls (a null score landed in the
    TOP bucket) and one NaN score made the grid width NaN, collapsing
    every row into one bucket — both silently corrupted AUC/Gini/KS.
    Null/NaN (y, score) rows are now excluded before the grid."""
    from optbinning_spark.functions.plots import auc_roc_curve_data

    clean = [(i % 2, float(i)) for i in range(40)]
    df_clean = spark.createDataFrame(clean, "y int, score double")
    base = auc_roc_curve_data(df_clean, "y", "score", n_buckets=8)

    polluted = clean + [(1, None)] * 10 + [(0, float("nan"))] * 10
    df_poll = spark.createDataFrame(polluted, "y int, score double")
    got = auc_roc_curve_data(df_poll, "y", "score", n_buckets=8)
    assert got == base  # pollution is invisible, not bucketed

    import pytest
    all_bad = spark.createDataFrame(
        [(1, None), (0, float("nan"))], "y int, score double")
    with pytest.raises(ValueError, match="empty input"):
        auc_roc_curve_data(all_bad, "y", "score")
