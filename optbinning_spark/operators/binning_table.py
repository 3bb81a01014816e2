"""BinningTable — the engine's result relation.

Reference: optbinning/binning/binning_statistics.py:589-608 (binary
table build), 1629-1686 (continuous), 225-378 (bin_info merge of
prebin stats per solver solution), metrics rows M1-M8.

The table is a tiny DataFrame (<= ~25 rows); it is built driver-side
from the collected BinStats and exposed both as pandas (for humans)
and as a Spark DataFrame (broadcastable to transforms, and
SQL-checkable against the DuckDB oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..core import metrics as M

_EPS = 1e-15


def format_bin_label(lo: float, hi: float, show_digits: int = 2) -> str:
    def fmt(v):
        if np.isinf(v):
            return "-inf" if v < 0 else "inf"
        return f"{v:.{show_digits}f}"

    return f"[{fmt(lo)}, {fmt(hi)})" if np.isfinite(lo) else f"(-inf, {fmt(hi)})"


def merge_segments(values: np.ndarray, segments) -> np.ndarray:
    """A6 segmented rollup: sum prebin stats over solver segments."""
    return np.array([values[s : e + 1].sum() for s, e in segments])


def merge_segments_min(values, segments):
    out = []
    for s, e in segments:
        v = values[s : e + 1]
        v = v[~np.isnan(v)]
        out.append(v.min() if len(v) else np.nan)
    return np.array(out)


def merge_segments_max(values, segments):
    out = []
    for s, e in segments:
        v = values[s : e + 1]
        v = v[~np.isnan(v)]
        out.append(v.max() if len(v) else np.nan)
    return np.array(out)


def splits_from_segments(prebin_splits: np.ndarray, segments) -> np.ndarray:
    """Optimal splits = prebin split at each segment boundary."""
    return np.array(
        [prebin_splits[s - 1] for s, _ in segments[1:]], dtype=float
    )


class BinningTableBinary:
    def __init__(
        self,
        *,
        splits: np.ndarray,
        n_nonevent: np.ndarray,
        n_event: np.ndarray,
        special_stats: dict[str, dict[str, float]],
        missing_stats: dict[str, float],
        dtype: str = "numerical",
        bin_categories: list[list] | None = None,
        show_digits: int = 2,
    ):
        self.splits = np.asarray(splits, dtype=float)
        self.n_nonevent = np.asarray(n_nonevent, dtype=float)
        self.n_event = np.asarray(n_event, dtype=float)
        self.special_stats = special_stats
        self.missing_stats = missing_stats
        self.dtype = dtype
        self.bin_categories = bin_categories
        self.show_digits = show_digits
        self._build_vectors()

    def _build_vectors(self):
        ne = list(self.n_nonevent)
        ev = list(self.n_event)
        labels = []
        kinds = []
        if self.dtype == "categorical":
            for cats in self.bin_categories or []:
                labels.append(str(list(cats)))
                kinds.append("clean")
        else:
            bounds = np.concatenate([[-np.inf], self.splits, [np.inf]])
            for i in range(len(ne)):
                labels.append(
                    format_bin_label(bounds[i], bounds[i + 1], self.show_digits)
                )
                kinds.append("clean")
        for g, st in self.special_stats.items():
            labels.append(f"Special: {g}" if g != "special" else "Special")
            kinds.append("special")
            ne.append(st.get("n_nonevent", 0.0))
            ev.append(st.get("n_event", 0.0))
        labels.append("Missing")
        kinds.append("missing")
        ne.append(self.missing_stats.get("n_nonevent", 0.0))
        ev.append(self.missing_stats.get("n_event", 0.0))

        self.labels = labels
        self.kinds = kinds
        self.ne_all = np.array(ne, dtype=float)
        self.ev_all = np.array(ev, dtype=float)

        t_ne = self.ne_all.sum()
        t_ev = self.ev_all.sum()
        cnt = self.ne_all + self.ev_all
        total = cnt.sum()
        with np.errstate(divide="ignore", invalid="ignore"):
            er = np.where(cnt > 0, self.ev_all / np.maximum(cnt, _EPS), 0.0)
            p = self.ev_all / max(t_ev, _EPS)
            q = self.ne_all / max(t_ne, _EPS)
            woe = np.where((p > 0) & (q > 0), np.log(np.maximum(q, _EPS) / np.maximum(p, _EPS)), 0.0)
        iv = M.jeffrey(p, q)
        js = M.jensen_shannon(p, q)
        self.count = cnt
        self.count_pct = cnt / max(total, _EPS)
        self.event_rate = er
        self.woe = woe
        self.iv_per_bin = iv
        self.js_per_bin = js
        self.iv = float(iv.sum())
        self.js = float(js.sum())

    def _labels_for(self, show_digits: int | None) -> list[str]:
        """Labels reformatted at a build-time precision (reference
        binning_statistics.py:498 ``build(show_digits=...)``)."""
        if show_digits is None or self.dtype == "categorical":
            return self.labels
        bounds = np.concatenate([[-np.inf], self.splits, [np.inf]])
        n_clean = sum(1 for k in self.kinds if k == "clean")
        clean = [
            format_bin_label(bounds[i], bounds[i + 1], show_digits)
            for i in range(n_clean)
        ]
        return clean + self.labels[n_clean:]

    def build(self, add_totals: bool = True,
              show_digits: int | None = None) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "bin": self._labels_for(show_digits),
                "count": self.count,
                "count_pct": self.count_pct,
                "n_nonevent": self.ne_all,
                "n_event": self.ev_all,
                "event_rate": self.event_rate,
                "woe": self.woe,
                "iv": self.iv_per_bin,
                "js": self.js_per_bin,
            }
        )
        if add_totals:
            totals = pd.DataFrame(
                {
                    "bin": ["Totals"],
                    "count": [self.count.sum()],
                    "count_pct": [1.0],
                    "n_nonevent": [self.ne_all.sum()],
                    "n_event": [self.ev_all.sum()],
                    "event_rate": [self.ev_all.sum() / max(self.count.sum(), _EPS)],
                    "woe": [np.nan],
                    "iv": [self.iv],
                    "js": [self.js],
                }
            )
            df = pd.concat([df, totals], ignore_index=True)
        return df

    def analysis(self, pvalue_test: str = "chi2", n_samples: int = 100,
                 bayes: bool = True, print_output: bool = False) -> dict:
        """Binning-table quality analysis (reference
        binning_statistics.py:879-1010): gini, IV, JS, Hellinger,
        triangular, KS, HHI, Cramer's V, quality score, achieved
        monotonic-trend type, and per-consecutive-bin chi2/Fisher tests
        plus Bayesian P[A>B]/P[B>A] (beta-posterior quadrature, M10).
        ``bayes=False`` skips the (driver-heavy) posterior quadrature —
        used by BinningProcess selection, which only needs the chi2
        p-values for the quality score. ``print_output=True`` prints
        the reference-format report."""
        if pvalue_test not in ("chi2", "fisher"):
            raise ValueError(
                'pvalue_test must be "chi2" or "fisher"')
        clean = np.array([k == "clean" for k in self.kinds])
        ev = self.ev_all[clean]
        ne = self.ne_all[clean]
        from ..core.special_math import chi2_contingency_2xk, fisher_exact_2x2

        tstats = []
        pvals = []
        p_a_b = []
        p_b_a = []
        for i in range(len(ev) - 1):
            obs = np.array([[ne[i], ev[i]], [ne[i + 1], ev[i + 1]]])
            if pvalue_test == "fisher":
                st, pv = fisher_exact_2x2(obs)
            else:
                st, pv = chi2_contingency_2xk(obs)
            tstats.append(st)
            pvals.append(pv)
            if bayes:
                pab, pba = M.bayesian_probability(obs.T, n_samples)
                p_a_b.append(pab)
                p_b_a.append(pba)
        hhi_n = M.hhi(self.count, normalized=True)
        t_ev, t_ne = max(ev.sum(), _EPS), max(ne.sum(), _EPS)
        _, cv = M.cramer_v(ne, ev) if len(ev) >= 2 else (0.0, 0.0)
        er = np.where(ev + ne > 0, ev / np.maximum(ev + ne, _EPS), 0.0)
        result = {
            "iv": self.iv,
            "js": self.js,
            "hellinger": float(
                M.hellinger(ev / t_ev, ne / t_ne, return_sum=True)
            ),
            "triangular": float(
                M.triangular(ev / t_ev, ne / t_ne, return_sum=True)
            ),
            "gini": M.gini(ev, ne),
            "ks": M.ks_statistic(ev, ne),
            "hhi": M.hhi(self.count),
            "hhi_norm": hhi_n,
            "cramer_v": cv,
            "quality_score": M.binning_quality_score(
                self.iv, np.array(pvals), hhi_n
            ),
            "monotonic_trend": M.type_of_monotonic_trend(er),
            "chi2_pvalues": pvals,
            "p_a_gt_b": p_a_b,
            "p_b_gt_a": p_b_a,
            "n_bins": int(clean.sum()),
        }
        if print_output:
            print(_binary_analysis_report(result, tstats, pvals,
                                          p_a_b, p_b_a, pvalue_test))
        return result

    def plot(self, metric: str = "woe", add_special: bool = True,
             add_missing: bool = True, style: str = "bin",
             show_bin_labels: bool = False, savefig: str | None = None):
        """Bin-count bars + WoE/event-rate line (reference
        binning_statistics.py:610-877). Gated on matplotlib, which is
        optional in this environment."""
        if metric not in ("woe", "event_rate"):
            raise ValueError('metric must be "woe" or "event_rate"')
        vals = self.woe if metric == "woe" else self.event_rate
        _plot_bin_table(
            self.labels, self.kinds, self.ne_all, self.ev_all, vals,
            metric, add_special, add_missing, show_bin_labels, savefig,
            stacked=True,
        )

    def to_spark(self, spark):
        return spark.createDataFrame(self.build(add_totals=False))


def _tests_table_string(columns: dict) -> str:
    """Reference dataframe_to_string: 4-space-indented fixed table."""
    df = pd.DataFrame(columns)
    if not len(df):
        return "    None"
    return "\n".join(
        "    " + line for line in df.to_string(index=False).splitlines()
    )


def _binary_analysis_report(a, tstats, pvals, p_a_b, p_b_a, pvalue_test):
    """Reference binning_statistics.py:977-1002 report layout."""
    cols = {
        "Bin A": np.arange(len(pvals)),
        "Bin B": np.arange(len(pvals)) + 1,
        ("odd ratio" if pvalue_test == "fisher" else "t-statistic"): tstats,
        "p-value": pvals,
    }
    if p_a_b:
        cols["P[A > B]"] = p_a_b
        cols["P[B > A]"] = p_b_a
    return (
        "---------------------------------------------\n"
        "OptimalBinning: Binary Binning Table Analysis\n"
        "---------------------------------------------\n"
        "\n"
        "  General metrics"
        "\n\n"
        "    Gini index          {:>15.8f}\n"
        "    IV (Jeffrey)        {:>15.8f}\n"
        "    JS (Jensen-Shannon) {:>15.8f}\n"
        "    Hellinger           {:>15.8f}\n"
        "    Triangular          {:>15.8f}\n"
        "    KS                  {:>15.8f}\n"
        "    HHI                 {:>15.8f}\n"
        "    HHI (normalized)    {:>15.8f}\n"
        "    Cramer's V          {:>15.8f}\n"
        "    Quality score       {:>15.8f}\n"
        "\n"
        "  Monotonic trend       {:>15}\n"
        "\n"
        "  Significance tests\n\n{}\n"
    ).format(
        a["gini"], a["iv"], a["js"], a["hellinger"], a["triangular"],
        a["ks"], a["hhi"], a["hhi_norm"], a["cramer_v"],
        a["quality_score"], a["monotonic_trend"],
        _tests_table_string(cols),
    )


def _plot_bin_table(labels, kinds, bars0, bars1, line, line_name,
                    add_special, add_missing, show_bin_labels, savefig,
                    stacked):
    try:
        import matplotlib.pyplot as plt
    except ImportError as exc:  # matplotlib is optional here
        raise ImportError(
            "plot() requires matplotlib, which is not installed in this "
            "environment; use build() for the tabular result."
        ) from exc
    keep = [
        i for i, k in enumerate(kinds)
        if (k == "clean") or (k == "special" and add_special)
        or (k == "missing" and add_missing)
    ]
    x = np.arange(len(keep))
    fig, ax1 = plt.subplots()
    b0 = np.asarray(bars0, dtype=float)[keep]
    if stacked:
        b1 = np.asarray(bars1, dtype=float)[keep]
        ax1.bar(x, b0, color="tab:blue", label="Non-event")
        ax1.bar(x, b1, bottom=b0, color="tab:red", label="Event")
    else:
        ax1.bar(x, b0, color="tab:blue", label="Count")
    ax1.set_xlabel("Bin")
    ax1.set_ylabel("Bin count")
    ax2 = ax1.twinx()
    ax2.plot(x, np.asarray(line, dtype=float)[keep], marker="o",
             color="black", label=line_name)
    ax2.set_ylabel(line_name)
    if show_bin_labels:
        ax1.set_xticks(x)
        ax1.set_xticklabels([labels[i] for i in keep], rotation=45,
                            ha="right")
    fig.tight_layout()
    if savefig is not None:
        fig.savefig(savefig)
        plt.close(fig)
    else:
        plt.show()


class BinningTableContinuous:
    def __init__(
        self,
        *,
        splits: np.ndarray,
        n_records: np.ndarray,
        sums: np.ndarray,
        ssums: np.ndarray,
        min_y: np.ndarray,
        max_y: np.ndarray,
        n_zeros: np.ndarray,
        special_stats: dict[str, dict[str, float]],
        missing_stats: dict[str, float],
        dtype: str = "numerical",
        bin_categories: list[list] | None = None,
        show_digits: int = 2,
    ):
        self.splits = np.asarray(splits, dtype=float)
        rows = {
            "n_records": list(np.asarray(n_records, dtype=float)),
            "sum": list(np.asarray(sums, dtype=float)),
            "ssum": list(np.asarray(ssums, dtype=float)),
            "min": list(np.asarray(min_y, dtype=float)),
            "max": list(np.asarray(max_y, dtype=float)),
            "zeros": list(np.asarray(n_zeros, dtype=float)),
        }
        labels, kinds = [], []
        if dtype == "categorical":
            for cats in bin_categories or []:
                labels.append(str(list(cats)))
                kinds.append("clean")
        else:
            bounds = np.concatenate([[-np.inf], self.splits, [np.inf]])
            for i in range(len(rows["n_records"])):
                labels.append(format_bin_label(bounds[i], bounds[i + 1], show_digits))
                kinds.append("clean")
        for g, st in special_stats.items():
            labels.append(f"Special: {g}" if g != "special" else "Special")
            kinds.append("special")
            rows["n_records"].append(st.get("n_records", 0.0))
            rows["sum"].append(st.get("sum_y", 0.0))
            rows["ssum"].append(st.get("sum_y2", 0.0))
            rows["min"].append(st.get("min_y", np.nan))
            rows["max"].append(st.get("max_y", np.nan))
            rows["zeros"].append(st.get("n_zeros", 0.0))
        labels.append("Missing")
        kinds.append("missing")
        rows["n_records"].append(missing_stats.get("n_records", 0.0))
        rows["sum"].append(missing_stats.get("sum_y", 0.0))
        rows["ssum"].append(missing_stats.get("sum_y2", 0.0))
        rows["min"].append(missing_stats.get("min_y", np.nan))
        rows["max"].append(missing_stats.get("max_y", np.nan))
        rows["zeros"].append(missing_stats.get("n_zeros", 0.0))

        self.labels, self.kinds = labels, kinds
        self.dtype = dtype
        cnt = np.array(rows["n_records"], dtype=float)
        s1 = np.array(rows["sum"], dtype=float)
        s2 = np.array(rows["ssum"], dtype=float)
        total = cnt.sum()
        mean_total = s1.sum() / max(total, _EPS)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = np.where(cnt > 0, s1 / np.maximum(cnt, _EPS), 0.0)
            var = np.where(
                cnt > 1,
                np.maximum(s2 - s1 * s1 / np.maximum(cnt, _EPS), 0.0)
                / np.maximum(cnt - 1.0, _EPS),
                0.0,
            )
        self.count = cnt
        self.count_pct = cnt / max(total, _EPS)
        self.mean = mean
        self.std = np.sqrt(var)
        self.min_y = np.array(rows["min"], dtype=float)
        self.max_y = np.array(rows["max"], dtype=float)
        self.zeros = np.array(rows["zeros"], dtype=float)
        # continuous-target WoE/IV (reference binning_statistics.py:1629-1686)
        self.woe = np.where(cnt > 0, mean - mean_total, 0.0)
        self.iv_per_bin = np.abs(self.woe) * self.count_pct
        self.iv = float(self.iv_per_bin.sum())
        self.mean_total = mean_total

    def build(self, add_totals: bool = True,
              show_digits: int | None = None) -> pd.DataFrame:
        labels = self.labels
        if show_digits is not None and self.dtype != "categorical":
            bounds = np.concatenate([[-np.inf], self.splits, [np.inf]])
            n_clean = sum(1 for k in self.kinds if k == "clean")
            labels = [
                format_bin_label(bounds[i], bounds[i + 1], show_digits)
                for i in range(n_clean)
            ] + self.labels[n_clean:]
        df = pd.DataFrame(
            {
                "bin": labels,
                "count": self.count,
                "count_pct": self.count_pct,
                "sum": np.where(self.count > 0, self.mean * self.count, 0.0),
                "mean": self.mean,
                "std": self.std,
                "min": self.min_y,
                "max": self.max_y,
                "zeros_count": self.zeros,
                "woe": self.woe,
                "iv": self.iv_per_bin,
            }
        )
        if add_totals:
            totals = pd.DataFrame(
                {
                    "bin": ["Totals"],
                    "count": [self.count.sum()],
                    "count_pct": [1.0],
                    "sum": [float((self.mean * self.count).sum())],
                    "mean": [self.mean_total],
                    "std": [np.nan],
                    "min": [np.nanmin(self.min_y) if len(self.min_y) else np.nan],
                    "max": [np.nanmax(self.max_y) if len(self.max_y) else np.nan],
                    "zeros_count": [self.zeros.sum()],
                    "woe": [np.nan],
                    "iv": [self.iv],
                }
            )
            df = pd.concat([df, totals], ignore_index=True)
        return df

    def analysis(self, print_output: bool = False) -> dict:
        """Continuous binning-table analysis (reference
        binning_statistics.py:1951-2049): Welch t-tests between
        consecutive bins, mean-relative quality score, HHI, achieved
        monotonic trend."""
        from ..core.metrics import (
            continuous_binning_quality_score,
            hhi,
            type_of_monotonic_trend,
        )
        from ..core.special_math import welch_ttest_from_stats

        clean = np.array([k == "clean" for k in self.kinds])
        n = self.count[clean]
        mean = self.mean[clean]
        std = self.std[clean]
        tstats, pvals = [], []
        for i in range(len(n) - 1):
            t, pv = welch_ttest_from_stats(
                mean[i], std[i], n[i], mean[i + 1], std[i + 1], n[i + 1])
            tstats.append(t)
            pvals.append(pv)
        hhi_n = float(hhi(self.count, normalized=True))
        woe_total = float(self.iv_per_bin.sum())
        rwoe = (
            float(np.abs(self.woe[clean]).sum()) / abs(self.mean_total)
            if self.mean_total != 0
            else float(np.abs(self.woe[clean]).sum())
        )
        result = {
            "iv": self.iv,
            "woe_total": woe_total,
            "hhi": float(hhi(self.count)),
            "hhi_norm": hhi_n,
            "quality_score": continuous_binning_quality_score(
                rwoe, pvals, hhi_n),
            "monotonic_trend": type_of_monotonic_trend(mean),
            "t_pvalues": pvals,
            "n_bins": int(clean.sum()),
        }
        if print_output:
            report = (
                "-------------------------------------------------\n"
                "OptimalBinning: Continuous Binning Table Analysis\n"
                "-------------------------------------------------\n"
                "\n"
                "  General metrics"
                "\n\n"
                "    IV                  {:>15.8f}\n"
                "    HHI                 {:>15.8f}\n"
                "    HHI (normalized)    {:>15.8f}\n"
                "    Quality score       {:>15.8f}\n"
                "\n"
                "  Monotonic trend       {:>15}\n"
                "\n"
                "  Significance tests\n\n{}\n"
            ).format(
                result["iv"], result["hhi"], result["hhi_norm"],
                result["quality_score"], result["monotonic_trend"],
                _tests_table_string({
                    "Bin A": np.arange(len(pvals)),
                    "Bin B": np.arange(len(pvals)) + 1,
                    "t-statistic": tstats,
                    "p-value": pvals,
                }),
            )
            print(report)
        return result

    def plot(self, add_special: bool = True, add_missing: bool = True,
             style: str = "bin", show_bin_labels: bool = False,
             savefig: str | None = None):
        """Bin-count bars + bin-mean line (reference
        binning_statistics.py:1700-1808)."""
        _plot_bin_table(
            self.labels, self.kinds, self.count, None, self.mean,
            "mean", add_special, add_missing, show_bin_labels, savefig,
            stacked=False,
        )

    def to_spark(self, spark):
        return spark.createDataFrame(self.build(add_totals=False))
