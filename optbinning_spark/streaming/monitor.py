"""Streaming drift monitoring: windowed PSI against a fitted baseline.

The batch monitor (``optbinning_spark.monitoring``) compares an actual
population against an expected one after the fact; this operator does
the same comparison CONTINUOUSLY, per event-time window, as scores or
feature values stream in — the production-drift alarm a deployed
scorecard needs.

Physical shape: ONE watermarked stateful aggregation. Each event is
bucketized map-side by the baseline's bin edges (CASE expression — no
join, no UDF); per-window bin counts accumulate as ``sum(when(bin ==
i, 1))`` columns (bin count is fixed and small, so columns beat a
second grouping key); PSI folds over those columns in the same select.
Append mode emits each window once its watermark closes. State per
window is one row of n_bins longs — bounded, mergeable, and evicted by
the watermark, so this runs forever at any input rate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.preprocessing import numeric_bin_expr


def streaming_psi_monitor(
    stream: DataFrame,
    value_col: str,
    splits,
    expected_props,
    ts_col: str = "ts",
    window: str = "1 hour",
    delay: str = "10 minutes",
    psi_threshold: float = 0.25,
) -> DataFrame:
    """Per-window PSI of ``value_col`` against the expected per-bin
    proportions (reference semantics: psi = sum (a_i - e_i) *
    ln(a_i / e_i); a zero-count bin contributes 0, matching the
    monitoring table's populated-bin convention).

    - ``splits``: the baseline bin edges (e.g. the expected
      population's score quantiles, ScorecardMonitoring._score_edges).
    - ``expected_props``: expected proportion per bin, length
      len(splits) + 1, summing to 1.
    - emits (window_start, window_end, n_events, psi, drift_level,
      breach) per closed window; drift levels follow the reference
      thresholds (0.1 / 0.25).
    """
    n_bins = len(list(splits)) + 1
    expected_props = [float(p) for p in expected_props]
    if len(expected_props) != n_bins:
        raise ValueError(
            f"expected_props must have {n_bins} entries (len(splits)+1), "
            f"got {len(expected_props)}")

    # drift is measured over OBSERVED values: NULL/NaN rows are dropped
    # from both the bin counts and n_events (a NULL would otherwise be
    # invisible to every bin while still inflating the denominator)
    stream = stream.filter(
        F.col(value_col).isNotNull()
        & ~F.isnan(F.col(value_col).cast("double")))
    b = numeric_bin_expr(F.col(value_col), splits)
    win = F.window(F.col(ts_col), window)
    counts = [
        F.sum(F.when(b == i, 1).otherwise(0)).alias(f"__n{i}")
        for i in range(n_bins)
    ]
    agg = (
        stream.withWatermark(ts_col, delay)
        .groupBy(win.alias("__w"))
        .agg(F.count("*").alias("n_events"), *counts)
    )

    def _term(i: int) -> Column:
        a = F.col(f"__n{i}") / F.col("n_events")
        e = F.lit(expected_props[i])
        return F.when(
            (F.col(f"__n{i}") > 0) & (e > 0), (a - e) * F.log(a / e)
        ).otherwise(F.lit(0.0))

    psi = sum([_term(i) for i in range(1, n_bins)], _term(0))
    out = agg.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        "n_events",
        F.round(psi, 6).alias("psi"),
    )
    return out.select(
        "*",
        F.when(F.col("psi") < 0.1, "insignificant")
        .when(F.col("psi") < 0.25, "requires investigation")
        .otherwise("significant")
        .alias("drift_level"),
        (F.col("psi") >= psi_threshold).alias("breach"),
    )
