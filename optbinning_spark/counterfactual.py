"""Counterfactual explanations for scorecard models (O15).

Reference: optbinning/scorecard/counterfactual/{counterfactual.py,
mip.py:15-361, multi_mip.py, problem_data.py:11-56}. The reference
formulates a weighted / hierarchical multi-objective MIP (CBC) whose
decision variables pick one bin per feature, minimizing

- proximity:  sum_i wrange_i * |points_i(chosen) - points_i(original)|
  with wrange_i = 1 / range(points_i)  (problem_data.py:36-46)
- closeness:  (1/p) * || F^T (x - mu) ||_1 with F the Cholesky factor
  of the inverse covariance of the WoE-transformed training data
  (problem_data.py:52-55, mip.py add_constraint_closeness)

subject to outcome constraints on the linear score
``intercept + sum_i coef_i * woe_i``, a max-changes budget, and
actionable-feature restrictions.

Spark design: the only data-sized computation is ``fit(df)`` — mean
and covariance of the WoE matrix — done as ONE aggregation job
(count + per-column sums + upper-triangle cross products; covariance
assembled on the driver). ``generate`` is pure driver search: the
candidate space is (n_features x <=20 bins), tiny by construction.

Instead of a MIP solver (OR-Tools is not a dependency here), the
search is an exact lazy-A* branch-and-bound: partial assignments are
expanded best-first on the separable objective part; a completed
assignment's true cost adds the (non-separable) closeness term; a
completed node popped with priority == true cost is globally optimal
among the remaining space. Infeasible subtrees are pruned with
suffix min/max score bounds. This yields the same optima as the
reference's weighted MIP for the same objective weights.
"""

from __future__ import annotations

import heapq
import itertools

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPS = 1e-9

OBJECTIVES = ("proximity", "closeness")
DEFAULT_OBJECTIVES = {"proximity": 1.0, "closeness": 0.0}


def _logit(p: float) -> float:
    p = min(max(p, 1e-12), 1 - 1e-12)
    return float(np.log(p / (1.0 - p)))


class Counterfactual:
    """Generate counterfactual bin-assignment explanations for a
    fitted :class:`~optbinning_spark.scorecard.Scorecard`."""

    def __init__(self, scorecard, special_missing: bool = False):
        if not getattr(scorecard, "_fitted", False):
            raise ValueError("scorecard must be fitted")
        self.scorecard = scorecard
        self.special_missing = special_missing
        self._fitted = False
        self._cfs: list[dict] | None = None

    # ------------------------------------------------------------------
    def fit(self, df: DataFrame):
        """One aggregation job: mean vector and covariance matrix of
        the transformed (WoE/mean-encoded) selected variables —
        the reference's ``np.cov`` input (problem_data.py:52-55)."""
        sc = self.scorecard
        self.variables_ = list(sc.selected_)
        woe = sc.binning_process.transform(df)
        p = len(self.variables_)

        aggs = [F.count(F.lit(1)).alias("__n")]
        for i, v in enumerate(self.variables_):
            aggs.append(F.sum(F.col(v)).alias(f"s{i}"))
        for i in range(p):
            for j in range(i, p):
                aggs.append(
                    F.sum(F.col(self.variables_[i]) * F.col(self.variables_[j]))
                    .alias(f"c{i}_{j}")
                )
        row = woe.agg(*aggs).collect()[0].asDict()

        n = float(row["__n"])
        mu = np.array([row[f"s{i}"] / n for i in range(p)])
        cov = np.empty((p, p))
        for i in range(p):
            for j in range(i, p):
                cij = row[f"c{i}_{j}"] / n - mu[i] * mu[j]
                cov[i, j] = cov[j, i] = cij
        cov *= n / max(n - 1.0, 1.0)  # np.cov ddof=1

        # Cholesky of the inverse covariance; ridge for singularity
        ridge = 1e-8 * float(np.trace(cov)) / max(p, 1)
        for _ in range(12):
            try:
                self._F = np.linalg.cholesky(np.linalg.inv(cov + ridge * np.eye(p)))
                break
            except np.linalg.LinAlgError:
                ridge *= 10.0
        else:
            self._F = np.eye(p)
        self._mu = mu
        self._fitted = True
        return self

    # ------------------------------------------------------------------
    def _candidates(self):
        """Per variable: (woe values per candidate bin, labels)."""
        sc = self.scorecard
        vals, labels = [], []
        for v in self.variables_:
            b, t, clean = sc._variable_bin_metric(v)
            lab = list(t.labels[: len(clean)])
            cand = list(map(float, clean))
            if self.special_missing:
                n_clean = len(clean)
                for k, kind in enumerate(t.kinds):
                    if kind != "clean":
                        cand.append(0.0)  # transform default for special/missing
                        lab.append(str(t.labels[k]))
            vals.append(np.asarray(cand))
            labels.append(lab)
        return vals, labels

    def _query_bin(self, v, value):
        """Driver-side bin assignment of a raw query value (mirrors
        transformations.py:255-263 digitize / isin semantics)."""
        sc = self.scorecard
        b = sc.binning_process.get_binned_variable(v)
        dtype = sc.binning_process._dtypes[v]
        if dtype == "categorical":
            for idx, cats in enumerate(b._bin_categories or []):
                if value in cats:
                    return idx
            return None  # unknown / others
        if value is None or (isinstance(value, float) and np.isnan(value)):
            return None
        return int(np.digitize([float(value)], b._splits)[0]) if len(b._splits) else 0

    # ------------------------------------------------------------------
    def generate(
        self,
        query: dict,
        y: float,
        outcome_type: str = "binary",
        n_cf: int = 1,
        method: str = "weighted",
        objectives: dict | None = None,
        max_changes: int | None = None,
        actionable_features: list | None = None,
        hard_constraints: list | None = None,
        soft_constraints: dict | None = None,
        priority_tol: float = 0.1,
        max_nodes: int = 200_000,
    ):
        """``hard_constraints`` may include the pairwise diversity
        constraints of the reference's multi-CF MIP
        (multi_mip.py:99-105): "diversity_features" — two generated
        CFs may not change the identical feature SET — and
        "diversity_values" — a feature changed by two CFs must take
        different bins in each. Enforced sequentially: each accepted
        CF is the exact cost-minimal assignment satisfying the
        constraints against the previously accepted ones.

        ``soft_constraints`` is a dict {name: weight} as in the
        reference (counterfactual.py:336-339): "diff_outcome" adds
        weight * |outcome - y| to the objective (mip.py:326-336,
        obj q_p + q_m), where outcome is the raw score for continuous
        and the EXACT sigmoid of the score for probability — the
        reference linearizes the sigmoid piecewise for MIP
        feasibility; the driver search needs no linearization, so this
        engine is strictly more accurate there. "diversity_features" /
        "diversity_values" REWARD being different from the
        already-accepted CFs, matching the reference's negated
        objectives (multi_mip.py:422-435,448-450: the MIP minimizes
        weight * (-pairwise XOR)); internally this is implemented as
        the equivalent shifted penalty weight * (bound - XOR) per
        accepted pair so every A* cost term stays >= 0."""
        if not self._fitted:
            raise ValueError("call fit(df) before generate")
        sc = self.scorecard
        weights = dict(DEFAULT_OBJECTIVES, **(objectives or {}))
        hard_constraints = list(hard_constraints or [])
        soft_constraints = dict(soft_constraints or {})
        bad = set(soft_constraints) - {
            "diff_outcome", "diversity_features", "diversity_values"}
        if bad:
            raise ValueError(f"unknown soft constraints {sorted(bad)}")
        if any(not isinstance(v, (int, float)) or v <= 0
               for v in soft_constraints.values()):
            raise ValueError("soft constraint values must be positive")
        if outcome_type == "binary" and "diff_outcome" in soft_constraints:
            raise ValueError(
                "diff_outcome is not a valid soft constraint for binary "
                "outcomes (reference counterfactual.py SOFT_CONSTRAINTS)")

        vals, labels = self._candidates()
        p = len(self.variables_)
        coef = np.array([sc.coef_[v] for v in self.variables_])
        intercept = sc.intercept_

        # original assignment + its woe values
        orig_bin = [self._query_bin(v, query.get(v)) for v in self.variables_]
        orig_woe = np.array(
            [vals[i][orig_bin[i]] if orig_bin[i] is not None else 0.0
             for i in range(p)]
        )
        pts = [coef[i] * vals[i] for i in range(p)]
        pts0 = coef * orig_woe
        wrange = np.array(
            [1.0 / max(float(pts[i].max() - pts[i].min()), _EPS) for i in range(p)]
        )

        # outcome bounds on the linear score (logit / prediction)
        lo, hi = -np.inf, np.inf
        if outcome_type == "binary":
            if y not in (0, 1):
                raise ValueError("y must be 0 or 1 for binary outcome")
            lo, hi = (_EPS, np.inf) if y == 1 else (-np.inf, -_EPS)
        elif outcome_type == "probability":
            t = _logit(float(y))
            if "min_outcome" in hard_constraints:
                lo = t
            if "max_outcome" in hard_constraints:
                hi = t
            if ("min_outcome" not in hard_constraints
                    and "max_outcome" not in hard_constraints
                    and "diff_outcome" not in soft_constraints):
                raise ValueError(
                    "probability outcome requires min_outcome/max_outcome "
                    "hard constraints or the diff_outcome soft constraint")
        elif outcome_type == "continuous":
            if "min_outcome" in hard_constraints:
                lo = float(y)
            if "max_outcome" in hard_constraints:
                hi = float(y)
            if ("min_outcome" not in hard_constraints
                    and "max_outcome" not in hard_constraints
                    and "diff_outcome" not in soft_constraints):
                raise ValueError(
                    "continuous outcome requires min_outcome/max_outcome "
                    "hard constraints or the diff_outcome soft constraint")
        else:
            raise ValueError(f"unknown outcome_type {outcome_type}")

        actionable = (
            set(range(p))
            if actionable_features is None
            else {i for i, v in enumerate(self.variables_)
                  if v in set(actionable_features)}
        )
        budget = p if max_changes is None else int(max_changes)

        soft_kw = dict(soft=soft_constraints, y_target=float(y),
                       otype=outcome_type,
                       hard_diversity=[c for c in hard_constraints
                                       if c.startswith("diversity")])
        if method == "weighted":
            sols = self._search(
                vals, coef, intercept, pts, pts0, wrange, orig_bin, lo, hi,
                actionable, budget, weights, n_cf, max_nodes, **soft_kw)
        elif method == "hierarchical":
            # lexicographic: optimize objectives in descending weight;
            # re-search constraining earlier objectives to (1+tol)*best
            order = sorted(weights, key=lambda k: -weights[k])
            caps: dict[str, float] = {}
            sols = []
            for name in order:
                w1 = {k: (1.0 if k == name else 0.0) for k in weights}
                sols = self._search(
                    vals, coef, intercept, pts, pts0, wrange, orig_bin, lo,
                    hi, actionable, budget, w1, n_cf, max_nodes, caps=caps,
                    **soft_kw)
                if not sols:
                    break
                caps[name] = sols[0]["objval"][name] * (1.0 + priority_tol) + _EPS
        else:
            raise ValueError(f"unknown method {method}")

        self._cfs = sols
        self._labels = labels
        self._query = query
        self._outcome_type = outcome_type
        self.status_ = "OPTIMAL" if sols else "INFEASIBLE"
        return self

    # ------------------------------------------------------------------
    def _search(self, vals, coef, intercept, pts, pts0, wrange, orig_bin,
                lo, hi, actionable, budget, weights, n_cf, max_nodes,
                caps=None, soft=None, y_target=0.0, otype="binary",
                hard_diversity=()):
        """Exact lazy-A* branch-and-bound over per-feature bin choices.

        Soft terms (diff_outcome, diversity penalties vs the
        already-accepted CFs) and the closeness term are
        non-separable, so they enter at COMPLETION: a completed node
        is re-inserted with its true cost whenever that exceeds its
        priority, and accepted only when popped with priority == its
        CURRENT true cost (the accepted set can only grow, and every
        added term is >= 0, so costs are monotone and the lazy
        mechanism stays exact — each accepted CF is cost-minimal
        given the previously accepted ones). Hard diversity
        constraints filter at acceptance."""
        soft = soft or {}
        p = len(vals)
        w_prox = weights.get("proximity", 0.0)
        w_close = weights.get("closeness", 0.0)
        w_diff = soft.get("diff_outcome", 0.0)
        w_sdf = soft.get("diversity_features", 0.0)
        w_sdv = soft.get("diversity_values", 0.0)

        def _changed_set(assign):
            return frozenset(
                i for i in range(p)
                if orig_bin[i] is None or assign[i] != orig_bin[i])

        def _soft_extra(assign, score, accepted):
            extra = 0.0
            if w_diff:
                f = score if otype == "continuous" else 1.0 / (
                    1.0 + np.exp(-np.clip(score, -35, 35)))
                extra += w_diff * abs(f - y_target)
            if w_sdf or w_sdv:
                # The reference NEGATES obj_diversity_features /
                # obj_diversity_values (multi_mip.py:448-450): the MIP
                # minimizes weight * (-XOR), i.e. REWARDS difference
                # from the other CFs. An A*-additive term must stay
                # >= 0 for the lazy-completion argument, so we add the
                # equivalent shifted penalty w * (bound - XOR) per
                # accepted pair: the per-pair constant (bound = p for
                # features, 2p for values) is identical for every
                # candidate given the same accepted set, so the argmin
                # matches the reference, and each term is >= 0 so
                # costs stay monotone in |accepted|.
                s_new = _changed_set(assign)
                for acc in accepted:
                    s_old = _changed_set(acc["assignment"])
                    if w_sdf:  # penalize changed-set AGREEMENT
                        extra += w_sdf * (p - len(s_new ^ s_old))
                    if w_sdv:
                        # one-hot bin XOR (multi_mip.py:93-97,429-435;
                        # z encodes the CHANGE, all-zero when the
                        # feature is unchanged): both changed to
                        # different bins -> 2, exactly one changed
                        # -> 1, same pick / neither changed -> 0.
                        xor = 0
                        for i in range(p):
                            c1, c2 = i in s_new, i in s_old
                            if c1 and c2:
                                if assign[i] != acc["assignment"][i]:
                                    xor += 2
                            elif c1 or c2:
                                xor += 1
                        extra += w_sdv * (2 * p - xor)
            return extra

        def _hard_div_ok(assign, accepted):
            s_new = _changed_set(assign)
            for acc in accepted:
                s_old = _changed_set(acc["assignment"])
                if ("diversity_features" in hard_diversity
                        and s_new == s_old):
                    return False
                if "diversity_values" in hard_diversity and any(
                        assign[i] == acc["assignment"][i]
                        for i in s_new & s_old):
                    return False
            return True
        contrib = [coef[i] * vals[i] for i in range(p)]
        # suffix score bounds for feasibility pruning
        suf_min = np.zeros(p + 1)
        suf_max = np.zeros(p + 1)
        for i in range(p - 1, -1, -1):
            ci = contrib[i]
            if i in actionable:
                cmin, cmax = float(ci.min()), float(ci.max())
            else:
                o = orig_bin[i]
                fixed = float(ci[o]) if o is not None else 0.0
                cmin = cmax = fixed
            suf_min[i] = suf_min[i + 1] + cmin
            suf_max[i] = suf_max[i + 1] + cmax
        prox_cost = [w_prox * wrange[i] * np.abs(pts[i] - pts0[i]) for i in range(p)]
        prox_only = [wrange[i] * np.abs(pts[i] - pts0[i]) for i in range(p)]

        counter = itertools.count()
        # entry: (priority, tie, idx, assignment, score_acc, g, changes)
        heap = [(0.0, next(counter), 0, (), intercept, 0.0, 0)]
        accepted: list[dict] = []
        seen_assign: set[tuple] = set()
        nodes = 0
        while heap and len(accepted) < n_cf and nodes < max_nodes:
            prio, _, idx, assign, score, g, changes = heapq.heappop(heap)
            nodes += 1
            if idx == p:
                woe_vec = np.array([vals[i][assign[i]] for i in range(p)])
                close = float(np.abs(self._F.T @ (woe_vec - self._mu)).sum()) / p
                prox = float(sum(prox_only[i][assign[i]] for i in range(p)))
                true_cost = (w_prox * prox + w_close * close
                             + _soft_extra(assign, score, accepted))
                if true_cost > prio + _EPS:
                    # closeness/soft terms made it costlier (the
                    # diversity penalties also grow as CFs are
                    # accepted): re-insert with the current true cost
                    heapq.heappush(
                        heap, (true_cost, next(counter), p, assign, score,
                               true_cost, changes))
                    continue
                if caps and any(
                    {"proximity": prox, "closeness": close}[k] > cap
                    for k, cap in caps.items()
                ):
                    continue
                if assign in seen_assign:
                    continue
                if not _hard_div_ok(assign, accepted):
                    # permanently excluded by an already-accepted CF
                    seen_assign.add(assign)
                    continue
                seen_assign.add(assign)
                accepted.append({
                    "assignment": assign,
                    "score": score,
                    "objval": {"proximity": prox, "closeness": close},
                    "cost": true_cost,
                    "changes": changes,
                })
                continue
            for j in range(len(vals[idx])):
                changed = orig_bin[idx] is None or j != orig_bin[idx]
                if changed and idx not in actionable:
                    continue
                nch = changes + (1 if changed else 0)
                if nch > budget:
                    continue
                s2 = score + contrib[idx][j]
                # feasibility: can the suffix still reach [lo, hi]?
                if s2 + suf_max[idx + 1] < lo or s2 + suf_min[idx + 1] > hi:
                    continue
                g2 = g + (prox_cost[idx][j] if changed else 0.0)
                heapq.heappush(
                    heap, (g2, next(counter), idx + 1, assign + (j,), s2,
                           g2, nch))
        return accepted

    # ------------------------------------------------------------------
    @property
    def status(self) -> str:
        """Search status (reference counterfactual.py status): OPTIMAL
        once candidates were generated."""
        if self._cfs is None:
            raise RuntimeError("Counterfactual is not generated")
        return "OPTIMAL" if len(self._cfs) else "INFEASIBLE"

    def information(self, print_level: int = 1) -> str:
        """Overview of the generated counterfactuals (reference
        counterfactual.py information)."""
        if self._cfs is None:
            raise RuntimeError("Counterfactual is not generated")
        lines = [
            "Counterfactual",
            f"  status          : {self.status}",
            f"  n_cf generated  : {len(self._cfs)}",
        ]
        report = "\n".join(lines)
        print(report)
        return report

    def display(self, show_only_changes: bool = True) -> pd.DataFrame:
        """Counterfactuals as a table: one row per CF, columns =
        variables (bin label of the chosen bin, '-' if unchanged) +
        outcome."""
        if self._cfs is None:
            raise ValueError("call generate first")
        sc = self.scorecard
        rows = []
        for k, cf in enumerate(self._cfs):
            row = {"cf": k}
            orig = [self._query_bin(v, self._query.get(v))
                    for v in self.variables_]
            for i, v in enumerate(self.variables_):
                j = cf["assignment"][i]
                unchanged = orig[i] is not None and j == orig[i]
                if unchanged and show_only_changes:
                    row[v] = "-"
                else:
                    row[v] = str(self._labels[i][j])
            s = cf["score"]
            if self._outcome_type in ("binary", "probability"):
                row["outcome"] = 1.0 / (1.0 + np.exp(-s))
            else:
                row["outcome"] = s
            row["proximity"] = cf["objval"]["proximity"]
            row["closeness"] = cf["objval"]["closeness"]
            row["n_changes"] = cf["changes"]
            rows.append(row)
        return pd.DataFrame(rows)
