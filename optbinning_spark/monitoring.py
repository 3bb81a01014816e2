"""Scorecard monitoring: PSI, per-bin significance tests, performance.

Reference: optbinning/scorecard/monitoring.py:225-817. The join-shaped
computation (J6) aligns the actual and expected populations on the
same bins: ONE groupBy(bin) aggregation per population (or a single
pass with a population tag), then driver-side metrics on the tiny
aligned table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .core import metrics as M
from .core.special_math import chi2_contingency_2xk, welch_ttest_from_stats

_EPS = 1e-15


def _psi_level(psi: float) -> str:
    if psi < 0.1:
        return "insignificant"
    if psi < 0.25:
        return "requires investigation"
    return "significant"


class ScorecardMonitoring:
    def __init__(self, scorecard, psi_n_bins: int = 20):
        self.scorecard = scorecard
        self.psi_n_bins = psi_n_bins
        self._fitted = False

    def fit(self, actual: DataFrame, expected: DataFrame, y: str):
        """One tagged union + aggregations; all tables derive from the
        collected per-bin counts."""
        sc = self.scorecard
        self._y = y

        a = sc.score(actual, "__score").withColumn("__pop", F.lit("A"))
        e = sc.score(expected, "__score").withColumn("__pop", F.lit("E"))
        both = a.select("__score", "__pop", F.col(y).alias("__y")).unionByName(
            e.select("__score", "__pop", F.col(y).alias("__y"))
        )
        # score bins from the EXPECTED population quantiles (reference
        # uses expected as the baseline)
        probs = list(np.linspace(0, 1, self.psi_n_bins + 1)[1:-1])
        edges = sorted(
            set(
                e.select("__score").approxQuantile("__score", probs, 1e-4)
            )
        )
        self._score_edges = edges
        from .operators.preprocessing import numeric_bin_expr

        b = numeric_bin_expr(F.col("__score"), edges)
        binary = sc._target_type == "binary"
        aggs = [F.count("*").alias("n")]
        if binary:
            aggs.append(F.sum("__y").alias("n_event"))
        else:
            aggs += [
                F.sum("__y").alias("s1"),
                F.sum(F.col("__y") * F.col("__y")).alias("s2"),
            ]
        rows = both.groupBy(b.alias("bin"), "__pop").agg(*aggs).collect()

        n_bins = len(edges) + 1
        self._counts = {"A": np.zeros(n_bins), "E": np.zeros(n_bins)}
        self._events = {"A": np.zeros(n_bins), "E": np.zeros(n_bins)}
        self._s1 = {"A": np.zeros(n_bins), "E": np.zeros(n_bins)}
        self._s2 = {"A": np.zeros(n_bins), "E": np.zeros(n_bins)}
        for r in rows:
            pop = r["__pop"]
            i = int(r["bin"])
            self._counts[pop][i] = r["n"]
            if binary:
                self._events[pop][i] = r["n_event"] or 0
            else:
                self._s1[pop][i] = r["s1"] or 0.0
                self._s2[pop][i] = r["s2"] or 0.0
        self._binary = binary
        self._fitted = True
        return self

    # ------------------------------------------------------------------
    def psi_table(self) -> pd.DataFrame:
        self._check_fitted()
        ca, ce = self._counts["A"], self._counts["E"]
        pa = ca / max(ca.sum(), _EPS)
        pe = ce / max(ce.sum(), _EPS)
        with np.errstate(divide="ignore", invalid="ignore"):
            contrib = np.where(
                (pa > 0) & (pe > 0), (pa - pe) * np.log(pa / pe), 0.0
            )
        edges = np.concatenate([[-np.inf], self._score_edges, [np.inf]])
        labels = [
            f"[{edges[i]:.2f}, {edges[i+1]:.2f})" for i in range(len(edges) - 1)
        ]
        return pd.DataFrame(
            {
                "bin": labels,
                "count_a": ca,
                "count_e": ce,
                "count_pct_a": pa,
                "count_pct_e": pe,
                "psi": contrib,
            }
        )

    def psi_total(self) -> float:
        return float(self.psi_table()["psi"].sum())

    def psi_report(self) -> dict:
        psi = self.psi_total()
        return {"psi": psi, "level": _psi_level(psi)}

    # ------------------------------------------------------------------
    def tests_table(self) -> pd.DataFrame:
        """Per-bin significance tests actual vs expected: chi2 on event
        counts (binary) or Welch t-test on score moments (continuous)
        (reference monitoring.py:483-637)."""
        self._check_fitted()
        rows = []
        n_bins = len(self._counts["A"])
        for i in range(n_bins):
            ca, ce = self._counts["A"][i], self._counts["E"][i]
            if self._binary:
                ea, ee = self._events["A"][i], self._events["E"][i]
                stat, p = chi2_contingency_2xk(
                    np.array([[ca - ea, ea], [ce - ee, ee]])
                )
            else:
                if ca > 1 and ce > 1:
                    ma = self._s1["A"][i] / max(ca, _EPS)
                    me = self._s1["E"][i] / max(ce, _EPS)
                    va = max(self._s2["A"][i] - ca * ma * ma, 0.0) / (ca - 1)
                    ve = max(self._s2["E"][i] - ce * me * me, 0.0) / (ce - 1)
                    stat, p = welch_ttest_from_stats(
                        ma, np.sqrt(va), ca, me, np.sqrt(ve), ce
                    )
                else:
                    stat, p = 0.0, 1.0
            rows.append({"bin": i, "statistic": stat, "p_value": p})
        return pd.DataFrame(rows)

    # ------------------------------------------------------------------
    def variable_psi_table(self, actual: DataFrame, expected: DataFrame) -> pd.DataFrame:
        """Per-variable PSI over each variable's fitted bins — a single
        tagged-union aggregation for ALL variables (U4)."""
        self._check_fitted()
        sc = self.scorecard
        bp = sc.binning_process
        both = actual.withColumn("__pop", F.lit("A")).unionByName(
            expected.withColumn("__pop", F.lit("E")), allowMissingColumns=True
        )
        structs = []
        for v in sc.selected_:
            b = bp.get_binned_variable(v)
            if bp._dtypes[v] == "numerical":
                from .operators.preprocessing import numeric_bin_expr

                e = numeric_bin_expr(
                    F.col(v).cast("double"), list(b._splits)
                ).cast("string")
            else:
                from .operators.preprocessing import categorical_bin_expr

                e = categorical_bin_expr(F.col(v), b._bin_categories or []).cast(
                    "string"
                )
            structs.append(
                F.struct(F.lit(v).alias("variable"), e.alias("bin"))
            )
        rows = (
            both.select(F.explode(F.array(*structs)).alias("s"), "__pop")
            .groupBy("s.variable", "s.bin", "__pop")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        acc: dict[str, dict[str, dict[str, float]]] = {}
        for r in rows:
            acc.setdefault(r["variable"], {}).setdefault(
                r["bin"] or "null", {"A": 0.0, "E": 0.0}
            )[r["__pop"]] = r["n"]
        out = []
        for v, bins in acc.items():
            ca = np.array([b["A"] for b in bins.values()])
            ce = np.array([b["E"] for b in bins.values()])
            pa = ca / max(ca.sum(), _EPS)
            pe = ce / max(ce.sum(), _EPS)
            psi = float(M.psi(pe + _EPS, pa + _EPS))
            out.append({"variable": v, "psi": psi, "level": _psi_level(psi)})
        return pd.DataFrame(out)

    # ------------------------------------------------------------------
    def performance_report(self, df: DataFrame) -> dict:
        """M12/M13 performance metrics on a scored population, computed
        with Spark aggregations (confusion counts / moments)."""
        self._check_fitted()
        sc = self.scorecard
        y = self._y
        if self._binary:
            scored = sc.predict_proba(df, "__p")
            agg = scored.agg(
                F.sum(F.when((F.col("__p") >= 0.5) & (F.col(y) == 1), 1).otherwise(0)).alias("tp"),
                F.sum(F.when((F.col("__p") >= 0.5) & (F.col(y) == 0), 1).otherwise(0)).alias("fp"),
                F.sum(F.when((F.col("__p") < 0.5) & (F.col(y) == 1), 1).otherwise(0)).alias("fn"),
                F.sum(F.when((F.col("__p") < 0.5) & (F.col(y) == 0), 1).otherwise(0)).alias("tn"),
            ).first()
            tp, fp, fn, tn = agg["tp"], agg["fp"], agg["fn"], agg["tn"]
            tpr = tp / max(tp + fn, 1)
            tnr = tn / max(tn + fp, 1)
            # AUC via MLlib
            from pyspark.ml.evaluation import BinaryClassificationEvaluator
            from pyspark.ml.feature import VectorAssembler  # noqa: F401

            ev = BinaryClassificationEvaluator(
                rawPredictionCol="__p", labelCol=y, metricName="areaUnderROC"
            )
            auc = ev.evaluate(scored.withColumn("__p", F.col("__p").cast("double")))
            return {
                "tp": tp, "fp": fp, "fn": fn, "tn": tn,
                "accuracy": (tp + tn) / max(tp + tn + fp + fn, 1),
                "tpr": tpr, "tnr": tnr,
                "balanced_accuracy": 0.5 * (tpr + tnr),
                "auc": auc, "gini": 2 * auc - 1,
            }
        pred = sc.predict(df, "__pred")
        err = F.col("__pred") - F.col(y)
        agg = pred.agg(
            F.count("*").alias("n"),
            F.avg(F.abs(err)).alias("mae"),
            F.avg(err * err).alias("mse"),
            F.avg(F.col(y)).alias("ybar"),
            F.sum(err * err).alias("sse"),
            F.sum(F.col(y) * F.col(y)).alias("syy"),
            F.sum(F.col(y)).alias("sy"),
            F.percentile(F.abs(err), F.lit(0.5)).alias("medae"),
            F.avg(F.abs(err) / F.greatest(F.abs(F.col(y)), F.lit(_EPS))).alias("mape"),
        ).first()
        sst = agg["syy"] - agg["sy"] ** 2 / agg["n"]
        return {
            "n": agg["n"],
            "mae": agg["mae"],
            "mse": agg["mse"],
            "rmse": float(np.sqrt(agg["mse"])),
            "median_ae": agg["medae"],
            "mape": agg["mape"],
            "r2": 1.0 - agg["sse"] / max(sst, _EPS),
        }

    def _check_fitted(self):
        if not self._fitted:
            raise RuntimeError("ScorecardMonitoring is not fitted")
