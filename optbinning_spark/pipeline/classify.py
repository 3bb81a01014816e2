"""Model-based quality classification — the fastText-style document
filter of public LLM data pipelines, native on Spark.

Public precedent: CCNet (Wenzek et al. 2020) and the LLaMA /
RedPajama curation stacks gate web documents with a linear
bag-of-n-gram classifier (fastText; Joulin et al. 2016) trained to
recognize a high-quality reference corpus, keeping documents the
model scores "reference-like". This module implements that component
as multinomial Naive Bayes over the SAME hashed unigram+bigram bucket
space as DSIR (``sampling._dsir_features``) — NB over bag-of-n-gram
counts IS a linear model in that feature space (per-bucket
log-likelihood-ratio weights plus a prior bias), so it matches the
fastText shape while keeping every step exactly replayable in ANSI
SQL for the DuckDB oracle (the reason for NB over SGD-trained
weights: training is closed-form counting, not an iteration schedule).

Physical strategy (the 100 TB shape, same as dsir_log_weights):

- **train** = ONE exploded bucket aggregation with per-class sums —
  map-side partials absorb everything, output is bounded at
  ``n_buckets`` rows — plus one tiny prior aggregation. The counts
  are plain sums, so the model is MERGEABLE: train shards/days
  independently and add the count tables (streaming-sketch
  compatible).
- **model** ships back to executors as ONE array literal of
  per-bucket LLR weights (one py4j literal, not n_buckets trips).
- **score** = map-only ordered fold per document (no join, no
  shuffle): features are ``array_sort``-ed so the floating-point sum
  has ONE well-defined order the oracle replays exactly.

No reference counterpart (beyond-scope LLM-pipeline family; the
reference engine is optbinning — see SURVEY.md §2.12).
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import _dsir_features


@dataclass
class NBQualityModel:
    """A trained quality classifier: per-bucket log-likelihood-ratio
    weights (positive = evidence the doc resembles the positive /
    reference class) plus the log prior odds. ``llr[b]`` =
    log((pos_b + s)/(pos_tot + s*B)) - log((neg_b + s)/(neg_tot + s*B))
    with Laplace smoothing ``s`` over ``B = n_buckets`` buckets."""

    n_buckets: int
    smoothing: float
    log_prior_odds: float
    llr: list[float] = field(repr=False)

    def to_dict(self) -> dict:
        return {
            "n_buckets": self.n_buckets,
            "smoothing": self.smoothing,
            "log_prior_odds": self.log_prior_odds,
            "llr": list(self.llr),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "NBQualityModel":
        return cls(
            n_buckets=int(d["n_buckets"]),
            smoothing=float(d["smoothing"]),
            log_prior_odds=float(d["log_prior_odds"]),
            llr=[float(x) for x in d["llr"]],
        )

    def to_json(self) -> str:
        return json.dumps(self.to_dict())

    @classmethod
    def from_json(cls, s: str) -> "NBQualityModel":
        return cls.from_dict(json.loads(s))


def _feats(text_col: str, features_col: str | None,
           n_buckets: int) -> Column:
    if features_col is not None:
        return F.col(features_col)
    return _dsir_features(F.col(text_col), n_buckets)


PRIOR_ROW = -1  # bucket id of the doc-count (prior) row in the stats frame


def nb_sufficient_stats(
    labeled: DataFrame,
    label_col: str,
    text_col: str = "text",
    n_buckets: int = 4096,
    features_col: str | None = None,
) -> DataFrame:
    """The model's COMPLETE sufficient statistics as a tiny mergeable
    frame: per-bucket ``(b, pos, neg)`` feature-occurrence counts plus
    one prior row (``b = -1``: positive / negative DOC counts). All
    plain sums, so sharded or rolling training is

        nb_from_stats(stats_day1.union(stats_day2)...)

    — merge by union, never re-scan history (the streaming-sketch
    contract). Bounded at ``n_buckets + 1`` output rows. Rows with a
    NULL label are unlabeled, not negative: they are excluded from
    both the counts and the prior (without the filter a bucket seen
    only in unlabeled docs would aggregate to NULL counts)."""
    y = F.col(label_col).cast("boolean").cast("int")
    labeled = labeled.filter(y.isNotNull())
    feats = _feats(text_col, features_col, n_buckets)
    counts = (
        labeled.select(y.alias("y"), F.explode(feats).alias("b"))
        .groupBy("b")
        .agg(F.sum("y").alias("pos"),
             F.sum(1 - F.col("y")).alias("neg"))
    )
    prior = labeled.agg(
        F.lit(PRIOR_ROW).cast("long").alias("b"),
        F.coalesce(F.sum(y), F.lit(0)).cast("long").alias("pos"),
        F.coalesce(F.sum(1 - y), F.lit(0)).cast("long").alias("neg"))
    return counts.unionByName(prior)


def nb_from_stats(
    stats: DataFrame,
    n_buckets: int = 4096,
    smoothing: float = 1.0,
) -> NBQualityModel:
    """Build the model from (possibly unioned / multi-shard)
    sufficient statistics — one bounded re-aggregation collapses
    duplicate bucket rows from merged shards, then the closed form."""
    rows = (stats.groupBy("b")
            .agg(F.sum("pos").alias("pos"), F.sum("neg").alias("neg"))
            .collect())
    pos = {int(r["b"]): int(r["pos"]) for r in rows}
    neg = {int(r["b"]): int(r["neg"]) for r in rows}
    n_pos = pos.pop(PRIOR_ROW, 0)
    n_neg = neg.pop(PRIOR_ROW, 0)
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            f"nb_train needs both classes; got {n_pos} positive / "
            f"{n_neg} negative docs")
    p_tot = float(sum(pos.values())) + smoothing * n_buckets
    n_tot = float(sum(neg.values())) + smoothing * n_buckets
    llr = [
        math.log((pos.get(b, 0) + smoothing) / p_tot)
        - math.log((neg.get(b, 0) + smoothing) / n_tot)
        for b in range(n_buckets)
    ]
    return NBQualityModel(
        n_buckets=n_buckets,
        smoothing=smoothing,
        log_prior_odds=math.log(n_pos) - math.log(n_neg),
        llr=llr,
    )


def nb_train(
    labeled: DataFrame,
    label_col: str,
    text_col: str = "text",
    n_buckets: int = 4096,
    smoothing: float = 1.0,
    features_col: str | None = None,
) -> NBQualityModel:
    """Train the classifier on a labeled frame (``label_col`` truthy =
    positive / reference-quality class). One exploded aggregation
    (bounded at ``n_buckets`` output rows, map-side partials carry
    the volume) + one scalar prior aggregation; driver memory is
    O(n_buckets), a parameter, not data-dependent. Composition of
    :func:`nb_sufficient_stats` + :func:`nb_from_stats` — use those
    directly for sharded / rolling training.

    ``features_col`` accepts a pre-materialized frame from
    :func:`optbinning_spark.pipeline.sampling.dsir_features` so one
    text scan can feed DSIR weighting AND classifier training."""
    return nb_from_stats(
        nb_sufficient_stats(labeled, label_col, text_col=text_col,
                            n_buckets=n_buckets,
                            features_col=features_col),
        n_buckets=n_buckets, smoothing=smoothing)


def _log_odds_expr(model: NBQualityModel, feats: Column) -> Column:
    """The scoring fold — ONE definition shared by nb_score and
    nb_filter so the gate can never disagree with the reported
    scores: prior + ordered sum of per-feature LLR weights over the
    bucket-sorted list, weight table as one array literal."""
    from ..operators.fastlit import double_array_lit

    llr_lit = double_array_lit(model.llr)
    return F.lit(model.log_prior_odds) + F.aggregate(
        F.array_sort(feats),
        F.lit(0.0),
        lambda acc, b: acc + F.element_at(llr_lit, b.cast("int") + 1),
    )


def nb_score(
    df: DataFrame,
    model: NBQualityModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    features_col: str | None = None,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Score documents: ``log_odds`` = log P(pos|doc) - log P(neg|doc)
    = prior + sum of per-feature LLR weights. Map-only fold over the
    bucket-sorted feature list (no join, no shuffle; the weight table
    is one array literal) — the identical physical shape to
    ``dsir_log_weights`` scoring. A NULL-text doc has no features and
    scores NULL (no evidence); filter or coalesce per policy."""
    feats = _feats(text_col, features_col, model.n_buckets)
    return df.select(
        F.col(id_col), *[F.col(c) for c in keep],
        _log_odds_expr(model, feats).alias("log_odds"))


def nb_filter(
    df: DataFrame,
    model: NBQualityModel,
    min_log_odds: float = 0.0,
    text_col: str = "text",
    features_col: str | None = None,
) -> DataFrame:
    """The gate itself: keep documents the model scores at least
    ``min_log_odds`` (0.0 = "more likely reference-quality than
    not"). Pure map-side filter on the scoring fold — composes with
    any downstream plan; NULL-text docs are dropped (no evidence)."""
    feats = _feats(text_col, features_col, model.n_buckets)
    return df.filter(
        _log_odds_expr(model, feats) >= F.lit(float(min_log_odds)))
