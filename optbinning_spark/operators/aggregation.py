"""Per-bin sufficient-statistics aggregations — the engine's hot path.

Reference: per-prebin weighted counts (optbinning/binning/binning.py:
1085-1104 binary; continuous_binning.py:906-938; multiclass_binning.py:
790-846) plus missing/special variants (binning_statistics.py:112-222).

Spark design: ONE ``groupBy(sample_class, bin)`` hash aggregation per
variable — partial aggregation on the map side means the shuffled
state is <= (n_prebins + n_special_groups + 2) rows per variable no
matter how many input rows. This is the reference's add/merge sketch
contract (bsketch.py) expressed as Spark's native partial/final agg.

The multi-variable variant stacks per-variable structs and aggregates
by (variable, sample_class, bin) in a single shuffle — replacing the
reference's per-variable thread fan-out (binning_process.py:1140-1172)
and its one-column-at-a-time disk scan (fit_disk).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .preprocessing import (
    CLEAN,
    MISSING,
    categorical_bin_expr,
    numeric_bin_expr,
    sample_class_expr,
)


class BinStats:
    """Collected per-bin statistics for one variable (driver-side)."""

    __slots__ = ("clean", "missing", "specials", "n_bins")

    def __init__(self, clean, missing, specials, n_bins):
        self.clean = clean  # dict metric -> np.ndarray[n_bins]
        self.missing = missing  # dict metric -> float
        self.specials = specials  # dict group -> dict metric -> float
        self.n_bins = n_bins


def _agg_exprs(y_col: str, w_col: str | None, target_type: str, classes=None):
    w = F.col(w_col) if w_col else F.lit(1.0)
    y = F.col(y_col)
    if target_type == "binary":
        return [
            F.coalesce(F.sum(F.when(y == 0, w)), F.lit(0.0)).alias("n_nonevent"),
            F.coalesce(F.sum(F.when(y == 1, w)), F.lit(0.0)).alias("n_event"),
        ]
    if target_type == "continuous":
        return [
            F.coalesce(F.sum(w), F.lit(0.0)).alias("n_records"),
            F.coalesce(F.sum(w * y), F.lit(0.0)).alias("sum_y"),
            F.coalesce(F.sum(w * y * y), F.lit(0.0)).alias("sum_y2"),
            F.min(y).alias("min_y"),
            F.max(y).alias("max_y"),
            F.coalesce(F.sum(F.when(y == 0, w)), F.lit(0.0)).alias("n_zeros"),
        ]
    if target_type == "multiclass":
        return [
            F.coalesce(F.sum(F.when(y == c, w)), F.lit(0.0)).alias(f"n_event_{i}")
            for i, c in enumerate(classes)
        ]
    raise ValueError(target_type)


def _merge_exprs(metrics: list[str]):
    """Second-stage merge of first-stage partial aggregates: every
    metric is a sum except min_y/max_y (min/max) — the same algebra
    Spark's own partial aggregation uses, exposed so a salted
    two-phase groupBy can re-reduce."""
    out = []
    for m in metrics:
        if m == "min_y":
            out.append(F.min(m).alias(m))
        elif m == "max_y":
            out.append(F.max(m).alias(m))
        else:
            out.append(F.coalesce(F.sum(m), F.lit(0.0)).alias(m))
    return out


def _metric_names(target_type: str, classes=None) -> list[str]:
    if target_type == "binary":
        return ["n_nonevent", "n_event"]
    if target_type == "continuous":
        return ["n_records", "sum_y", "sum_y2", "min_y", "max_y", "n_zeros"]
    return [f"n_event_{i}" for i in range(len(classes))]


def value_stats(
    df: DataFrame,
    col: str,
    y_col: str,
    w_col: str | None,
    *,
    special_codes=None,
    target_type: str = "binary",
    classes=None,
    max_values: int = 50_000,
    guarded: bool = False,
):
    """ONE aggregation over (sample_class, distinct clean value)
    producing per-distinct-value sufficient statistics PLUS the
    special/missing stats — the fused fit path: the same collect feeds
    the CART/MDLP split proposal, the per-prebin statistics (additive
    re-bucketing on the driver), and the special/missing bin rows, so
    a whole numerical fit is a single Spark job.

    Returns (values, metric_dict_of_per_value_arrays, missing,
    specials) or None when the distinct-value cardinality exceeds
    ``max_values`` (caller falls back to the bucketed multi-pass
    path). ``guarded=True`` means the caller already verified the
    cardinality with an HLL probe: the LIMIT backstop is skipped —
    a plain collect is ONE job, while ``limit().collect()`` executes
    in multiple scale-up waves — and the exact rows are used even if
    the estimate was slightly low (the exact path is correct at any
    size; only the probe bounds driver memory).
    """
    from .preprocessing import normalize_special_codes

    c = F.col(col)
    sclass = sample_class_expr(c, "numerical", special_codes)
    v = F.when(sclass == CLEAN, c)
    n_groups = len(normalize_special_codes(special_codes))
    cap = max_values + n_groups + 2
    agg = df.groupBy(sclass.alias("sample_class"), v.alias("__v")).agg(
        *_agg_exprs(y_col, w_col, target_type, classes)
    )
    if guarded:
        rows = agg.collect()
    else:
        rows = agg.limit(cap + 1).collect()
        if len(rows) > cap:
            return None
    metrics = _metric_names(target_type, classes)
    clean_rows = [r for r in rows if r["sample_class"] == CLEAN and r["__v"] is not None]
    clean_rows.sort(key=lambda r: r["__v"])
    values = np.array([r["__v"] for r in clean_rows], dtype=float)
    per_value = {
        m: np.array(
            [
                (
                    r[m]
                    if r[m] is not None
                    else (np.nan if m in ("min_y", "max_y") else 0.0)
                )
                for r in clean_rows
            ],
            dtype=float,
        )
        for m in metrics
    }
    missing = {m: 0.0 for m in metrics}
    specials: dict[str, dict[str, float]] = {}
    for r in rows:
        sc = r["sample_class"]
        if sc == CLEAN:
            continue
        vals = {
            m: (
                r[m]
                if r[m] is not None
                else (np.nan if m in ("min_y", "max_y") else 0.0)
            )
            for m in metrics
        }
        if sc == MISSING:
            missing = vals
        else:
            group = sc.split(":", 1)[1] if ":" in sc else sc
            specials[group] = vals
    return values, per_value, missing, specials


def bucket_value_stats(
    df: DataFrame,
    col: str,
    y_col: str,
    w_col: str | None,
    *,
    edges: list[float],
    special_codes=None,
    target_type: str = "binary",
    classes=None,
):
    """High-cardinality variant of ``value_stats``: ONE aggregation over
    (sample_class, quantile bucket) — same return contract plus the
    per-bucket lower edges, so the caller can snap proposed splits to
    bucket boundaries and the driver re-reduce stays EXACT (a whole
    bucket is always on one side of a snapped split).

    With this, a high-cardinality fit is two jobs total (probe +
    this), the same as the exact-distinct path — no third bin-stats
    scan. The shuffled state is <= (n_buckets + n_specials + 2) groups
    regardless of input rows.
    """
    from pyspark.ml.feature import Bucketizer

    c = F.col(col)
    sclass = sample_class_expr(c, "numerical", special_codes)
    v = F.when(sclass == CLEAN, c)
    E = [-float("inf")] + [float(e) for e in edges] + [float("inf")]
    # NULL (special/missing rows) -> NaN -> the Bucketizer's invalid
    # bucket; their stats are grouped by sample_class regardless
    work = df.withColumn("__cv", F.coalesce(v, F.lit(float("nan"))))
    work = Bucketizer(
        splits=E, inputCol="__cv", outputCol="__bkt", handleInvalid="keep"
    ).transform(work)
    rows = (
        work.groupBy(
            sclass.alias("sample_class"),
            F.when(sclass == CLEAN, F.col("__bkt").cast("int")).alias("__b"),
        )
        .agg(
            F.max(v).alias("__vmax"),
            *_agg_exprs(y_col, w_col, target_type, classes),
        )
        .collect()
    )
    metrics = _metric_names(target_type, classes)
    clean_rows = [
        r for r in rows if r["sample_class"] == CLEAN and r["__vmax"] is not None
    ]
    clean_rows.sort(key=lambda r: r["__b"])
    values = np.array([r["__vmax"] for r in clean_rows], dtype=float)
    lower_edges = np.array([E[r["__b"]] for r in clean_rows], dtype=float)
    per_value = {
        m: np.array(
            [
                (
                    r[m]
                    if r[m] is not None
                    else (np.nan if m in ("min_y", "max_y") else 0.0)
                )
                for r in clean_rows
            ],
            dtype=float,
        )
        for m in metrics
    }
    missing = {m: 0.0 for m in metrics}
    specials: dict[str, dict[str, float]] = {}
    for r in rows:
        sc = r["sample_class"]
        if sc == CLEAN:
            continue
        vals = {
            m: (
                r[m]
                if r[m] is not None
                else (np.nan if m in ("min_y", "max_y") else 0.0)
            )
            for m in metrics
        }
        if sc == MISSING:
            missing = vals
        else:
            group = sc.split(":", 1)[1] if ":" in sc else sc
            specials[group] = vals
    return values, per_value, missing, specials, lower_edges


def weighted_percentile(
    values: np.ndarray, counts: np.ndarray, probs
) -> np.ndarray:
    """np.percentile(expanded_array, p, 'linear') computed from
    (distinct value, count) pairs — exact for integer counts, the
    natural generalization for fractional weights. Lets the quantile
    prebinning method reproduce the reference's EXACT KBinsDiscretizer
    edges from the same single-aggregation histogram the cart path
    uses (reference prebinning.py:95-101)."""
    values = np.asarray(values, dtype=float)
    c = np.cumsum(np.asarray(counts, dtype=float))
    W = c[-1]
    out = []
    for p in np.asarray(probs, dtype=float):
        h = p * (W - 1.0)
        lo, hi = np.floor(h), np.ceil(h)
        vlo = values[min(int(np.searchsorted(c, lo, side="right")),
                         len(values) - 1)]
        vhi = values[min(int(np.searchsorted(c, hi, side="right")),
                         len(values) - 1)]
        out.append(vlo + (h - lo) * (vhi - vlo))
    return np.asarray(out, dtype=float)


def snap_splits_to_edges(
    splits: np.ndarray, values: np.ndarray, lower_edges: np.ndarray
) -> np.ndarray:
    """Snap proposed thresholds (midpoints between per-bucket max
    values) to the bucket lower edge they fall under, so that every
    bucket lies entirely on one side — making the driver re-reduce of
    bucket statistics exact AND consistent with the transform-time
    ``digitize(x, splits)`` on raw values."""
    out = []
    for t in np.asarray(splits, dtype=float):
        j = int(np.searchsorted(values, t))
        if 1 <= j < len(lower_edges) and np.isfinite(lower_edges[j]):
            out.append(float(lower_edges[j]))
    return np.unique(np.asarray(out, dtype=float))


def bin_stats_from_values(
    values: np.ndarray,
    per_value: dict,
    missing: dict,
    specials: dict,
    splits,
    target_type: str = "binary",
) -> BinStats:
    """Driver-side re-bucketing of per-distinct-value statistics into
    per-prebin statistics — exact, because every metric is additive
    (or min/max) over rows sharing a value."""
    splits = np.asarray(splits, dtype=float)
    n_bins = len(splits) + 1 if splits.size else 1
    idx = (
        np.digitize(values, splits, right=False)
        if splits.size
        else np.zeros(len(values), dtype=int)
    )
    clean = {}
    for m, arr in per_value.items():
        if m in ("min_y", "max_y"):
            out = np.full(n_bins, np.nan)
            red = np.fmin if m == "min_y" else np.fmax
            for b in range(n_bins):
                sel = arr[idx == b]
                if sel.size:
                    out[b] = red.reduce(sel)
            clean[m] = out
        else:
            clean[m] = np.bincount(idx, weights=arr, minlength=n_bins)
    return BinStats(clean, missing, specials, n_bins)


def bin_stats(
    df: DataFrame,
    col: str,
    y_col: str,
    w_col: str | None,
    *,
    dtype: str = "numerical",
    splits=None,
    bin_categories: list[list] | None = None,
    special_codes=None,
    target_type: str = "binary",
    classes=None,
) -> BinStats:
    """One-pass grouped aggregation producing the full BinStats."""
    c = F.col(col)
    sclass = sample_class_expr(c, dtype, special_codes)
    if dtype == "categorical":
        bin_e = categorical_bin_expr(c, bin_categories or [])
        n_bins = len(bin_categories or [])
    else:
        bin_e = numeric_bin_expr(c, splits if splits is not None else [])
        n_bins = (len(splits) + 1) if splits is not None and len(splits) else 1
    bin_e = F.when(sclass == CLEAN, bin_e)

    rows = (
        df.groupBy(sclass.alias("sample_class"), bin_e.alias("bin"))
        .agg(*_agg_exprs(y_col, w_col, target_type, classes))
        .collect()
    )
    return assemble_bin_stats(rows, n_bins, target_type, classes)


def assemble_bin_stats(rows, n_bins, target_type, classes=None) -> BinStats:
    metrics = _metric_names(target_type, classes)
    clean = {m: np.zeros(n_bins) for m in metrics}
    if target_type == "continuous":
        clean["min_y"] = np.full(n_bins, np.nan)
        clean["max_y"] = np.full(n_bins, np.nan)
    missing = {m: 0.0 for m in metrics}
    specials: dict[str, dict[str, float]] = {}
    for r in rows:
        sc = r["sample_class"]
        vals = {
            m: (
                r[m]
                if r[m] is not None
                else (np.nan if m in ("min_y", "max_y") else 0.0)
            )
            for m in metrics
        }
        if sc == CLEAN:
            b = r["bin"]
            if b is None:
                # unknown category at fit time: fold into bin 0 guard
                continue
            b = int(b)
            if 0 <= b < n_bins:
                for m in metrics:
                    clean[m][b] = vals[m]
        elif sc == MISSING:
            missing = vals
        else:
            group = sc.split(":", 1)[1] if ":" in sc else sc
            specials[group] = vals
    return BinStats(clean, missing, specials, n_bins)


def categorical_value_stats(
    df: DataFrame,
    col: str,
    y_col: str,
    w_col: str | None,
    *,
    special_codes=None,
    target_type: str = "binary",
    classes=None,
    max_categories: int = 100_000,
    salt_partitions: int | None = None,
):
    """Per-category sufficient statistics in ONE aggregation — this is
    simultaneously the event-rate ordering input (J4), the cat_cutoff
    input (P8), and the prebin statistics (each category is a prebin
    after ordinal ordering). Reference does three passes
    (preprocessing.py:24-42); Spark needs one.

    Returns (rows_by_category, missing_stats, special_stats_by_group,
    tail_stats-or-None).

    High-cardinality safety: the driver only ever collects the top
    ``max_categories`` categories by record count — a distributed
    TakeOrdered over the already-reduced per-category aggregate, NOT a
    global sort — plus one totals row; the truncated tail's aggregate
    statistics are the residual (totals minus collected) and are
    returned separately so callers can fold them into the "others"
    bin. At 100 TB with millions of categories the collect stays
    bounded; hot categories are absorbed by map-side partial agg.

    ``salt_partitions``: power-law skew hardening. With a billion-key
    power-law column Spark's in-memory hash aggregate can overflow and
    fall back to sort-based aggregation, after which a hot category's
    RAW rows all converge on one reducer. Setting ``salt_partitions=S``
    switches to a salted two-phase plan: phase 1 groups by (category,
    spark_partition_id() % S) — a hot key's rows land on up to S
    reducers — and phase 2 re-reduces the <= S partial rows per
    category with the sum/min/max merge algebra. Results are identical
    (integer-weighted sums are exact; float sums match to
    associativity). The reference's dict sketch (bsketch.py:300-336)
    is unbounded and single-machine — this path has no counterpart.
    """
    c = F.col(col)
    sclass = sample_class_expr(c, "categorical", special_codes)
    metrics = _metric_names(target_type, classes)
    keys = [
        sclass.alias("sample_class"),
        F.when(sclass == CLEAN, c).alias("category"),
    ]
    if salt_partitions and salt_partitions > 1:
        grouped = (
            df.groupBy(
                *keys,
                F.pmod(F.spark_partition_id(), F.lit(salt_partitions))
                .alias("__salt"),
            )
            .agg(*_agg_exprs(y_col, w_col, target_type, classes))
            .groupBy("sample_class", "category")
            .agg(*_merge_exprs(metrics))
        )
    else:
        grouped = df.groupBy(*keys).agg(
            *_agg_exprs(y_col, w_col, target_type, classes)
        )

    size_expr = (
        F.col("n_records")
        if target_type == "continuous"
        else sum(
            (F.col(m) for m in metrics if m.startswith("n_")), F.lit(0.0)
        )
    )
    rows = (
        grouped.orderBy(F.desc(size_expr))
        .limit(max_categories + 16)  # non-clean rows ride along
        .collect()
    )
    cats: dict = {}
    missing = {m: 0.0 for m in metrics}
    specials: dict[str, dict[str, float]] = {}
    for r in rows:
        vals = {m: (r[m] if r[m] is not None else 0.0) for m in metrics}
        if r["sample_class"] == CLEAN:
            if r["category"] is not None:
                cats[r["category"]] = vals
        elif r["sample_class"] == MISSING:
            missing = vals
        else:
            g = r["sample_class"].split(":", 1)[1]
            specials[g] = vals

    tail = None
    if len(cats) > max_categories or len(rows) >= max_categories + 16:
        # truncated: recover the tail's aggregate as totals - collected
        additive = [m for m in metrics if m not in ("min_y", "max_y")]
        tot = (
            grouped.filter(F.col("sample_class") == CLEAN)
            .agg(*[F.sum(m).alias(m) for m in additive])
            .collect()[0]
        )
        tail = {
            m: float(tot[m] or 0.0) - sum(v[m] for v in cats.values())
            for m in additive
        }
        if all(abs(v) < 1e-9 for v in tail.values()):
            tail = None
    return cats, missing, specials, tail


def stacked_bin_stats(
    df: DataFrame,
    variables: list[dict],
    y_col: str,
    w_col: str | None,
    *,
    target_type: str = "binary",
    classes=None,
):
    """Multi-variable single-shuffle aggregation.

    ``variables``: list of dicts with keys name, dtype, splits /
    bin_categories, special_codes. Builds one struct per variable,
    explodes, and aggregates by (variable, sample_class, bin): the
    entire BinningProcess fit is ONE wide aggregation whose output is
    <= sum_v (n_bins_v + specials + 2) rows.
    """
    structs = []
    meta = {}
    for v in variables:
        name = v["name"]
        c = F.col(name)
        sclass = sample_class_expr(c, v.get("dtype", "numerical"), v.get("special_codes"))
        if v.get("dtype") == "categorical":
            bin_e = categorical_bin_expr(c, v.get("bin_categories") or [])
            n_bins = len(v.get("bin_categories") or [])
        else:
            splits = v.get("splits")
            splits = splits if splits is not None else []
            bin_e = numeric_bin_expr(c, splits)
            n_bins = len(splits) + 1 if len(splits) else 1
        meta[name] = n_bins
        structs.append(
            F.struct(
                F.lit(name).alias("variable"),
                sclass.alias("sample_class"),
                F.when(sclass == CLEAN, bin_e).alias("bin"),
            )
        )
    exploded = df.select(
        F.explode(F.array(*structs)).alias("v"),
        *( [F.col(y_col)] + ([F.col(w_col)] if w_col else []) ),
    ).select("v.variable", "v.sample_class", "v.bin", *([y_col] + ([w_col] if w_col else [])))
    rows = (
        exploded.groupBy("variable", "sample_class", "bin")
        .agg(*_agg_exprs(y_col, w_col, target_type, classes))
        .collect()
    )
    by_var: dict[str, list] = {v["name"]: [] for v in variables}
    for r in rows:
        by_var[r["variable"]].append(r)
    return {
        name: assemble_bin_stats(rs, meta[name], target_type, classes)
        for name, rs in by_var.items()
    }
