"""Scorecard performance plots: ROC, CAP and KS curves (reference
optbinning/scorecard/plots.py:51-229 plot_auc_roc / plot_cap /
plot_ks).

Spark-first redesign: the reference sorts the FULL prediction array
driver-side (np.argsort over every row), which cannot work at 100 TB.
Here the curve is computed distributed — ONE bounded groupBy over a
fixed score-bucket grid (n_buckets rows reach the driver, never the
data) — and only the <=n_buckets cumulative points are assembled into
the polyline. The plotted metrics (AUC/Gini/KS) are the EXACT values
of the bucket-tied score function: every score inside a bucket is
treated as tied, AUC uses the Mann-Whitney midrank formula over the
tie groups, and KS is evaluated at bucket edges (KS of a coarsened
predictor is a lower bound that converges as n_buckets grows; at the
default 1024 buckets the gap is < 1e-3 on every fixture we checked).

Rendering is matplotlib-gated like every other plot surface in this
package (binning table / 2-D / piecewise / PSI plots): the curve DATA
helpers (`auc_roc_curve_data`, `cap_curve_data`, `ks_curve_data`)
never touch matplotlib, so the computation is testable in
environments without it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "auc_roc_curve_data",
    "cap_curve_data",
    "ks_curve_data",
    "plot_auc_roc",
    "plot_cap",
    "plot_ks",
]


def _bucket_counts(df: DataFrame, y_col: str, score_col: str,
                   n_buckets: int):
    """Per-score-bucket (event, nonevent) counts in ASCENDING score
    order. Two jobs: a 1-row min/max agg to fix the grid, then the
    bounded groupBy — shuffle width n_buckets regardless of row
    count. Returns (edges, n_event[], n_nonevent[]) as Python lists
    of length <= n_buckets."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2; got {n_buckets}")
    s = F.col(score_col).cast("double")
    y = F.col(y_col).cast("double")
    # Null/NaN rows are EXCLUDED, not silently bucketed: least() skips
    # nulls (a null score would land in the TOP bucket), and one NaN
    # score makes hi=NaN so every row collapses into a single
    # NaN-edged bucket — either silently corrupts AUC/Gini/KS
    df = df.filter(s.isNotNull() & ~F.isnan(s)
                   & y.isNotNull() & ~F.isnan(y))
    row = df.agg(F.min(s).alias("lo"), F.max(s).alias("hi"),
                 F.count("*").alias("n")).first()
    if not row["n"]:
        raise ValueError(
            "cannot plot an empty input: no rows with non-null, "
            f"non-NaN ({y_col}, {score_col})")
    lo, hi = float(row["lo"]), float(row["hi"])
    width = (hi - lo) / n_buckets
    if width <= 0:  # constant score: one degenerate bucket
        bucket = F.lit(0)
    else:
        bucket = F.least(F.floor((s - F.lit(lo)) / F.lit(width)),
                         F.lit(n_buckets - 1)).cast("int")
    rows = (df.groupBy(bucket.alias("__b"))
            .agg(F.sum(y).alias("e"),
                 F.sum(F.lit(1.0) - y).alias("ne"))
            .orderBy("__b")
            .collect())  # bounded: <= n_buckets rows
    ev = [float(r["e"] or 0.0) for r in rows]
    ne = [float(r["ne"] or 0.0) for r in rows]
    edges = [lo + width * (r["__b"] + 1) for r in rows]
    return edges, ev, ne


def auc_roc_curve_data(df: DataFrame, y_col: str, score_col: str,
                       n_buckets: int = 1024) -> dict:
    """ROC polyline + AUC of the bucket-tied score. Descending-score
    sweep (standard ROC direction): each bucket of ties contributes a
    diagonal segment; AUC is the exact trapezoid over those segments
    (equivalently Mann-Whitney with the midrank tie correction).
    Returns {"fpr", "tpr", "auc"} with fpr/tpr of length
    n_used_buckets + 1 starting at (0, 0)."""
    _, ev, ne = _bucket_counts(df, y_col, score_col, n_buckets)
    n_e, n_ne = sum(ev), sum(ne)
    if n_e == 0 or n_ne == 0:
        raise ValueError("AUC needs both classes present "
                         f"(events={n_e}, nonevents={n_ne})")
    fpr, tpr = [0.0], [0.0]
    auc = 0.0
    ce = cne = 0.0
    for e, n in zip(reversed(ev), reversed(ne)):  # descending score
        auc += n * (ce + e / 2.0)  # nonevents below-tie + tie midrank
        ce += e
        cne += n
        tpr.append(ce / n_e)
        fpr.append(cne / n_ne)
    return {"fpr": fpr, "tpr": tpr, "auc": auc / (n_e * n_ne)}


def cap_curve_data(df: DataFrame, y_col: str, score_col: str,
                   n_buckets: int = 1024) -> dict:
    """Cumulative Accuracy Profile (reference plot_cap:139-178):
    population sorted by DESCENDING score, fraction of all events
    captured vs fraction of population examined. Gini = 2*AUC - 1 of
    the same bucket-tied score. Returns {"p_population", "p_event",
    "event_rate", "gini"}."""
    _, ev, ne = _bucket_counts(df, y_col, score_col, n_buckets)
    n_e, n_ne = sum(ev), sum(ne)
    n = n_e + n_ne
    if n_e == 0 or n_ne == 0:
        raise ValueError("CAP needs both classes present "
                         f"(events={n_e}, nonevents={n_ne})")
    p_pop, p_ev = [0.0], [0.0]
    ce = cpop = auc = 0.0
    for e, nn in zip(reversed(ev), reversed(ne)):
        auc += nn * (ce + e / 2.0)
        ce += e
        cpop += e + nn
        p_ev.append(ce / n_e)
        p_pop.append(cpop / n)
    return {"p_population": p_pop, "p_event": p_ev,
            "event_rate": n_e / n, "gini": 2.0 * auc / (n_e * n_ne) - 1.0}


def ks_curve_data(df: DataFrame, y_col: str, score_col: str,
                  n_buckets: int = 1024) -> dict:
    """KS curves (reference plot_ks:182-229): cumulative event and
    nonevent distributions over ASCENDING score, and the maximum gap.
    Returns {"score", "p_event", "p_nonevent", "ks", "ks_score"} —
    ks_score is the bucket edge where the gap peaks."""
    edges, ev, ne = _bucket_counts(df, y_col, score_col, n_buckets)
    n_e, n_ne = sum(ev), sum(ne)
    if n_e == 0 or n_ne == 0:
        raise ValueError("KS needs both classes present "
                         f"(events={n_e}, nonevents={n_ne})")
    p_e, p_ne, xs = [], [], []
    ce = cne = 0.0
    ks, ks_score = 0.0, edges[0]
    for x, e, nn in zip(edges, ev, ne):
        ce += e
        cne += nn
        pe, pne = ce / n_e, cne / n_ne
        xs.append(x)
        p_e.append(pe)
        p_ne.append(pne)
        if abs(pe - pne) > ks:
            ks, ks_score = abs(pe - pne), x
    return {"score": xs, "p_event": p_e, "p_nonevent": p_ne,
            "ks": ks, "ks_score": ks_score}


def _plt():
    try:
        import matplotlib.pyplot as plt
        return plt
    except ImportError as exc:
        raise ImportError(
            "plot_auc_roc/plot_cap/plot_ks require matplotlib, which "
            "is not installed in this environment; use the "
            "*_curve_data helpers for the underlying curves"
        ) from exc


def _finish(plt, title, xlabel, ylabel, savefig, kwargs):
    plt.title(title, fontdict={"fontsize": 14})
    plt.xlabel(xlabel, fontdict={"fontsize": 12})
    plt.ylabel(ylabel, fontdict={"fontsize": 12})
    plt.legend(loc="lower right")
    if savefig is not None:
        plt.savefig(fname=savefig, **kwargs)
        plt.close()


def plot_auc_roc(df: DataFrame, y_col: str, score_col: str,
                 title: str | None = None, xlabel: str | None = None,
                 ylabel: str | None = None, savefig: str | None = None,
                 n_buckets: int = 1024, **kwargs) -> dict:
    """ROC plot (reference plots.py:51-110 plot_auc_roc) over a scored
    Spark DataFrame. ``savefig`` is the output path (None = leave the
    pyplot figure open, matching the package's other plot surfaces).
    Returns the curve-data dict so callers get the AUC without
    re-aggregating."""
    data = auc_roc_curve_data(df, y_col, score_col, n_buckets)
    plt = _plt()
    plt.plot([0, 1], [0, 1], linestyle="--", color="k",
             label="Random Model")
    plt.plot(data["fpr"], data["tpr"], color="g",
             label="Model (AUC: {:.5f})".format(data["auc"]))
    _finish(plt, title or "ROC curve",
            xlabel or "False Positive Rate",
            ylabel or "True Positive Rate", savefig, kwargs)
    return data


def plot_cap(df: DataFrame, y_col: str, score_col: str,
             title: str | None = None, xlabel: str | None = None,
             ylabel: str | None = None, savefig: str | None = None,
             n_buckets: int = 1024, **kwargs) -> dict:
    """CAP plot (reference plots.py:113-178 plot_cap): model curve vs
    the random diagonal and the perfect-model elbow."""
    data = cap_curve_data(df, y_col, score_col, n_buckets)
    plt = _plt()
    plt.plot([0, 1], [0, 1], color="k", linestyle="--",
             label="Random Model")
    plt.plot([0, data["event_rate"], 1], [0, 1, 1], color="grey",
             linestyle="--", label="Perfect Model")
    plt.plot(data["p_population"], data["p_event"], color="g",
             label="Model (Gini: {:.5f})".format(data["gini"]))
    _finish(plt, title or "Cumulative Accuracy Profile (CAP)",
            xlabel or "Fraction of all population",
            ylabel or "Fraction of event population", savefig, kwargs)
    return data


def plot_ks(df: DataFrame, y_col: str, score_col: str,
            title: str | None = None, xlabel: str | None = None,
            ylabel: str | None = None, savefig: str | None = None,
            n_buckets: int = 1024, **kwargs) -> dict:
    """KS plot (reference plots.py:182-229 plot_ks): the two
    cumulative distributions with the max-gap marker."""
    data = ks_curve_data(df, y_col, score_col, n_buckets)
    plt = _plt()
    plt.plot(data["score"], data["p_event"], color="g",
             label="Cumulative events")
    plt.plot(data["score"], data["p_nonevent"], color="b",
             label="Cumulative non-events")
    plt.axvline(data["ks_score"], color="k", linestyle="--",
                label="KS: {:.5f} at {:.5f}".format(
                    data["ks"], data["ks_score"]))
    _finish(plt, title or "Kolmogorov-Smirnov",
            xlabel or "Score", ylabel or "Cumulative probability",
            savefig, kwargs)
    return data
