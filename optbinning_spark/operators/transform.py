"""Transform expressions: bin -> metric value as pure column exprs.

Reference: optbinning/binning/transformations.py:230-316 (binary woe /
event_rate / indices / bins), 388-452 (continuous mean), plus
special/missing policies and unknown-category defaults
(binning.py:385-396).

Spark design: the fitted bin-value mapping is tiny (<= ~25 entries), so
the transform is a <=25-branch CASE WHEN chain — whole-stage-codegen'd,
map-only, no shuffle, no UDF. Semantically it is a broadcast join
against the binning table; emitting it as an expression keeps the scan
pipeline narrow and lets Catalyst push surrounding filters through.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from .preprocessing import normalize_special_codes


def _value_for(metric, table, kind, group=None):
    """Resolve the output value for special/missing rows: a fixed
    number or 'empirical' (use the bin's own statistic)."""
    idx = None
    for i, (k, lbl) in enumerate(zip(table.kinds, table.labels)):
        if k == kind and (group is None or lbl.endswith(group) or lbl == "Special"):
            idx = i
            break
    if idx is None:
        return 0.0
    if metric == "woe":
        return float(table.woe[idx])
    if metric == "event_rate":
        return float(table.event_rate[idx])
    if metric == "mean":
        return float(table.mean[idx])
    return 0.0


def transform_expr(
    col: Column,
    *,
    dtype: str = "numerical",
    splits=None,
    bin_categories=None,
    table=None,
    metric: str = "woe",
    metric_special=0,
    metric_missing=0,
    special_codes=None,
    show_digits: int = 2,
) -> Column:
    """Build the full transform expression for one variable.

    metric: woe | event_rate | indices | bins | mean
    metric_special / metric_missing: number or "empirical".
    """
    groups = normalize_special_codes(special_codes)

    if metric == "woe":
        clean_vals = [float(v) for v in table.woe[: _n_clean(table)]]
        default = 0.0
    elif metric == "event_rate":
        clean_vals = [float(v) for v in table.event_rate[: _n_clean(table)]]
        default = 0.0
    elif metric == "mean":
        clean_vals = [float(v) for v in table.mean[: _n_clean(table)]]
        default = 0.0
    elif metric == "indices":
        clean_vals = list(range(_n_clean(table)))
        default = -1
    elif metric == "bins":
        clean_vals = list(table.labels[: _n_clean(table)])
        default = "unknown"
    else:
        raise ValueError(f"unknown metric {metric}")

    # special/missing row resolution (reference transformations.py:
    # 152-226): metric='bins' always emits the label (group name for
    # dict special codes, else 'Special'/'Missing'); metric='indices'
    # emits the special/missing bin index unless the policy is a
    # literal int; otherwise a number or the bin's own 'empirical'
    # statistic.
    n_clean = len(clean_vals)
    n_special = max(len(groups), 1)
    special_is_dict = isinstance(special_codes, dict)

    def resolve(policy, kind, group=None, group_idx=0):
        if metric == "bins":
            if kind == "special":
                return group if special_is_dict else "Special"
            return "Missing"
        if metric == "indices":
            if isinstance(policy, int) and policy is not True:
                return policy
            if kind == "special":
                return n_clean + group_idx
            return n_clean + n_special
        if policy == "empirical":
            return _value_for(metric, table, kind, group)
        return policy

    # missing predicate
    if dtype == "categorical":
        is_missing = col.isNull()
    else:
        is_missing = col.isNull() | F.isnan(col)
    expr = F.when(is_missing, F.lit(resolve(metric_missing, "missing")))
    from .preprocessing import _typed_specials

    for gi, (gname, values) in enumerate(groups.items()):
        values = _typed_specials(values, dtype)
        if values:
            expr = expr.when(
                col.isin(values),
                F.lit(resolve(metric_special, "special", gname, gi)),
            )

    if dtype == "categorical":
        for b, cats in enumerate(bin_categories or []):
            expr = expr.when(col.isin(list(cats)), F.lit(clean_vals[b]))
        expr = expr.otherwise(F.lit(default))  # unknown category
    else:
        splits = list(splits if splits is not None else [])
        if not splits:
            expr = expr.otherwise(F.lit(clean_vals[0] if clean_vals else default))
        else:
            for i, s in enumerate(splits):
                expr = expr.when(col < float(s), F.lit(clean_vals[i]))
            expr = expr.otherwise(F.lit(clean_vals[len(splits)]))
    return expr


def _n_clean(table) -> int:
    return int(sum(1 for k in table.kinds if k == "clean"))


def transform_sql_case(
    col_name: str,
    *,
    splits,
    values,
    missing_value=0.0,
    special_values: dict | None = None,
    special_codes=None,
) -> str:
    """Emit the equivalent ANSI-SQL CASE for the DuckDB oracle — the
    transform is SQL-expressible by construction."""
    groups = normalize_special_codes(special_codes)
    parts = [f"WHEN {col_name} IS NULL OR isnan({col_name}) THEN {missing_value}"]
    for g, vals in groups.items():
        sv = (special_values or {}).get(g, 0.0)
        in_list = ", ".join(repr(v) for v in vals)
        parts.append(f"WHEN {col_name} IN ({in_list}) THEN {sv}")
    for i, s in enumerate(splits):
        parts.append(f"WHEN {col_name} < {float(s)!r} THEN {float(values[i])!r}")
    parts.append(f"ELSE {float(values[len(splits)])!r}")
    return "CASE " + " ".join(parts) + " END"
