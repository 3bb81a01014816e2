"""NB quality classifier (pipeline/classify.py): separation on a
signal-bearing corpus, path equivalences, model persistence, and the
degenerate-input guards."""

import math

import pytest
from pyspark.sql import functions as F

from optbinning_spark.pipeline.classify import (
    NBQualityModel,
    nb_filter,
    nb_score,
    nb_train,
)
from optbinning_spark.pipeline.sampling import dsir_features


@pytest.fixture(scope="module")
def corpus(spark):
    """60 'reference-like' docs with a distinctive vocabulary + 60
    'web-noise' docs, plus held-out docs of each style."""
    ref_words = ["theorem", "proof", "lemma", "integral", "matrix"]
    web_words = ["click", "subscribe", "buy", "free", "winner"]
    rows = []
    for i in range(60):
        rows.append((i, " ".join(ref_words[j % 5] for j in range(i % 7 + 3)), 1))
        rows.append((100 + i, " ".join(web_words[(i + j) % 5] for j in range(i % 6 + 3)), 0))
    # held-out (not used in training): one of each style + null/empty
    rows += [(900, "lemma proof matrix theorem", None),
             (901, "buy free click subscribe", None),
             (902, None, None),
             (903, "", None)]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_nb_separates_signal_classes(corpus):
    train = corpus.filter(F.col("label").isNotNull())
    model = nb_train(train, "label", n_buckets=512)
    scored = {r["doc_id"]: r["log_odds"]
              for r in nb_score(corpus, model).collect()}
    # every training doc on the right side of 0, held-out too
    for i in range(60):
        assert scored[i] > 0, (i, scored[i])
        assert scored[100 + i] < 0, (i, scored[100 + i])
    assert scored[900] > 0 and scored[901] < 0
    # no evidence -> NULL score
    assert scored[902] is None
    # empty string still tokenizes to [""] -> one (uninformative) bucket
    assert scored[903] is not None


def test_nb_score_partition_invariant(corpus):
    train = corpus.filter(F.col("label").isNotNull())
    model = nb_train(train, "label", n_buckets=512)
    a = sorted(map(tuple, nb_score(corpus, model).collect()))
    b = sorted(map(tuple,
                   nb_score(corpus.repartition(13), model).collect()))
    assert a == b


def test_nb_features_col_path_matches_text_path(corpus):
    train = corpus.filter(F.col("label").isNotNull())
    feats = dsir_features(train, n_buckets=512, keep=("label",))
    m_text = nb_train(train, "label", n_buckets=512)
    m_feat = nb_train(feats, "label", n_buckets=512,
                      features_col="features")
    assert m_text.llr == m_feat.llr
    assert m_text.log_prior_odds == m_feat.log_prior_odds
    all_feats = dsir_features(corpus, n_buckets=512)
    s_text = sorted(map(tuple, nb_score(corpus, m_text).collect()))
    s_feat = sorted(map(tuple, nb_score(all_feats, m_feat,
                                        features_col="features").collect()))
    assert s_text == s_feat


def test_nb_model_json_roundtrip(corpus):
    train = corpus.filter(F.col("label").isNotNull())
    model = nb_train(train, "label", n_buckets=512)
    back = NBQualityModel.from_json(model.to_json())
    assert back == model
    s1 = sorted(map(tuple, nb_score(corpus, model).collect()))
    s2 = sorted(map(tuple, nb_score(corpus, back).collect()))
    assert s1 == s2


def test_nb_filter_gate(corpus):
    train = corpus.filter(F.col("label").isNotNull())
    model = nb_train(train, "label", n_buckets=512)
    kept = nb_filter(corpus, model, min_log_odds=0.0)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 900 in ids and 901 not in ids
    assert 902 not in ids  # NULL text = no evidence = dropped
    assert all(100 + i not in ids for i in range(60))


def test_nb_train_single_class_raises(corpus):
    pos_only = corpus.filter(F.col("label") == 1)
    with pytest.raises(ValueError, match="both classes"):
        nb_train(pos_only, "label", n_buckets=512)


def test_nb_prior_and_llr_closed_form(spark):
    """Hand-check the closed form on a 3-doc corpus small enough to
    enumerate: buckets/counts computed independently in Python."""
    df = spark.createDataFrame(
        [(0, "aa aa", 1), (1, "aa", 1), (2, "bb", 0)],
        "doc_id long, text string, label int")
    n_buckets = 16
    model = nb_train(df, "label", n_buckets=n_buckets, smoothing=1.0)
    import hashlib

    def bucket(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % n_buckets

    # doc0 feats: aa, aa, "aa aa"; doc1: aa; doc2: bb
    pos_counts = {}
    for f in ["aa", "aa", "aa aa", "aa"]:
        pos_counts[bucket(f)] = pos_counts.get(bucket(f), 0) + 1
    neg_counts = {bucket("bb"): 1}
    pt = sum(pos_counts.values()) + n_buckets
    nt = sum(neg_counts.values()) + n_buckets
    for b in range(n_buckets):
        want = (math.log((pos_counts.get(b, 0) + 1) / pt)
                - math.log((neg_counts.get(b, 0) + 1) / nt))
        assert model.llr[b] == pytest.approx(want, rel=1e-12)
    assert model.log_prior_odds == pytest.approx(math.log(2) - math.log(1))
    scored = {r["doc_id"]: r["log_odds"]
              for r in nb_score(df, model).collect()}
    want0 = model.log_prior_odds + sum(
        model.llr[b] for b in sorted([bucket("aa"), bucket("aa"),
                                      bucket("aa aa")]))
    assert scored[0] == pytest.approx(want0, rel=1e-12)


def test_nb_score_on_structured_stream(spark, tmp_path, corpus):
    """The scoring fold is stateless/map-only, so a trained model
    gates a readStream source unchanged (the 100 TB deploy shape:
    train once on a labeled batch, score the firehose)."""
    train = corpus.filter(F.col("label").isNotNull())
    model = nb_train(train, "label", n_buckets=512)
    src = str(tmp_path / "stream_src")
    corpus.filter(F.col("label").isNotNull()).write.parquet(src)
    stream = spark.readStream.schema(corpus.schema).parquet(src)
    q = (nb_score(stream, model)
         .writeStream.format("memory").queryName("nb_stream")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = {r["doc_id"]: r["log_odds"]
               for r in spark.sql("SELECT * FROM nb_stream").collect()}
    finally:
        q.stop()
    want = {r["doc_id"]: r["log_odds"]
            for r in nb_score(train, model).collect()}
    assert got == want


def test_nb_sharded_training_merges_exactly(corpus):
    """Sharded training: union of per-shard sufficient-stat frames
    rebuilds the model the full-corpus train produces, bit for bit —
    the mergeable-counts contract (train days independently, merge by
    union, never re-scan history)."""
    from optbinning_spark.pipeline.classify import (
        nb_from_stats,
        nb_sufficient_stats,
    )

    train = corpus.filter(F.col("label").isNotNull())
    full = nb_train(train, "label", n_buckets=512)
    half_a = nb_sufficient_stats(train.filter("doc_id % 2 = 0"),
                                 "label", n_buckets=512)
    half_b = nb_sufficient_stats(train.filter("doc_id % 2 = 1"),
                                 "label", n_buckets=512)
    merged = nb_from_stats(half_a.unionByName(half_b), n_buckets=512)
    assert merged == full


def test_nb_train_ignores_unlabeled_rows(corpus):
    """NULL-label docs are unlabeled, not negative: training on the
    mixed frame (labeled + held-out NULL-label docs) equals training
    on the labeled subset — and does not crash on buckets seen only
    in unlabeled docs (the held-out texts introduce such buckets)."""
    full = nb_train(corpus, "label", n_buckets=512)
    only = nb_train(corpus.filter(F.col("label").isNotNull()),
                    "label", n_buckets=512)
    assert full == only
