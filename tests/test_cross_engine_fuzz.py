"""Cross-engine expression fuzz: the per-row text expressions whose
DuckDB replays the oracle gate depends on, evaluated by BOTH engines
over a seeded corpus of adversarial strings (empty, whitespace-only,
unicode letters, CJK, tabs/newlines, regex metacharacters, PII-ish
shapes, chr(30) separators).

The driver's oracle gate only ever sees the ASCII testdata corpus, so
a Java-regex-vs-RE2 or NULL-vs-empty divergence on unusual input
stays latent until a real corpus hits it — this file front-runs that
(it already caught DuckDB's array_to_string([]) = NULL in the BPE
counter, fixed in pipeline/bpe.py)."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from optbinning_spark.pipeline.text import (
    PII_PATTERNS,
    bpe_token_count_expr,
    normalize_text_expr,
    token_count_expr,
)

def _q(pat: str) -> str:
    """SQL string literal (single quotes doubled; DuckDB treats
    backslash literally in standard quoted strings, like the inline
    oracle SQL in __spark_entry__ does)."""
    return "'" + pat.replace("'", "''") + "'"


def _corpus():
    rnd = random.Random(1889)
    pieces = [
        "", " ", "  ", "\t", "\n", "the", "Window", "w00042", "naïve",
        "ÜBER", "日本語", "2.5", "...", "#", "a@b.cd", "x@y.com",
        "10.0.0.1", "+1 555 123 4567", "1.2.3.4.5", "[PII:email]",
        "a-b_c", "(x)", "'s", "don't", "\x1e", "$5", "100%",
    ]
    rows = []
    for i in range(80):
        n = rnd.randint(0, 10)
        sep = rnd.choice(["", " ", "  "])
        rows.append((i, sep.join(rnd.choice(pieces) for _ in range(n))))
    rows += [(80, ""), (81, "   "), (82, "\t\t"), (83, "日本語 データ")]
    return rows


CASES = [
    # (name, spark column builder, duckdb SQL expression over `text`)
    ("ws_token_count",
     lambda c: token_count_expr(c).cast("long"),
     "CAST(len(string_split(text, ' ')) AS BIGINT)"),
    ("pretoken_count",
     lambda c: bpe_token_count_expr(c).cast("long"),
     "CAST(len(regexp_extract_all(text, " + _q(
         r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+")
     + ")) AS BIGINT)"),
    ("normalize",
     lambda c: normalize_text_expr(c),
     "trim(regexp_replace(regexp_replace(lower(text), "
     "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"),
] + [
    (f"pii_{kind}",
     (lambda p: lambda c: F.regexp_count(c, F.lit(p)).cast("long"))(pat),
     "CAST(len(regexp_extract_all(text, " + _q(pat) + ")) AS BIGINT)")
    for kind, pat in sorted(PII_PATTERNS.items())
]


def test_hash_uniform_cross_engine_extreme_keys(spark):
    """hash_uniform is the gate every split/sample/DSIR-subsample
    rides on; its DuckDB replay ('0x'||substr(md5)::BIGINT / 2^32)
    must be BIT-identical for any key — fuzzed over extreme longs
    (0, +-1, int64 min/max, powers of two, randoms) and string keys
    with regex/quote metacharacters."""
    import random

    from optbinning_spark.pipeline.sampling import hash_uniform

    rnd = random.Random(30)
    longs = [0, 1, -1, 2**63 - 1, -2**63, 10**18, -10**18,
             *[rnd.getrandbits(63) * rnd.choice((1, -1))
               for _ in range(40)]]
    rows = [(i, v) for i, v in enumerate(longs)]
    df = spark.createDataFrame(rows, "i long, k long")
    got = {r["i"]: r["u"] for r in df.select(
        "i", hash_uniform(F.col("k"), "split").alias("u")).collect()}
    con = duckdb.connect()
    con.execute("create table t(i bigint, k bigint)")
    con.executemany("insert into t values (?, ?)", rows)
    sql = ("select i, ('0x' || substr(md5('split|' || "
           "CAST(k AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 as u "
           "from t")
    for i, u in con.execute(sql).fetchall():
        assert got[i] == u, (i, longs[i], got[i], u)

    skeys = ["", " ", "a'b", 'a"b', "a\\b", "naïve", "日本", "w%s_",
             "-0.0", "1e308"]
    rows2 = [(i, k) for i, k in enumerate(skeys)]
    df2 = spark.createDataFrame(rows2, "i long, k string")
    got2 = {r["i"]: r["u"] for r in df2.select(
        "i", hash_uniform(F.col("k"), "s2").alias("u")).collect()}
    con.execute("create table t2(i bigint, k varchar)")
    con.executemany("insert into t2 values (?, ?)", rows2)
    sql2 = ("select i, ('0x' || substr(md5('s2|' || k), 1, 8))::BIGINT"
            " / 4294967296.0 as u from t2")
    for i, u in con.execute(sql2).fetchall():
        assert got2[i] == u, (i, skeys[i], got2[i], u)


@pytest.mark.parametrize("name,spark_fn,sql", CASES,
                         ids=[c[0] for c in CASES])
def test_expression_cross_engine(spark, name, spark_fn, sql):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["v"] for r in df.select(
        "doc_id", spark_fn(F.col("text")).alias("v")).collect()}
    con = duckdb.connect()
    con.execute("create table t(doc_id bigint, text varchar)")
    con.executemany("insert into t values (?, ?)", rows)
    for doc_id, v in con.execute(
            f"select doc_id, {sql} as v from t").fetchall():
        assert got[doc_id] == v, (
            name, doc_id, got[doc_id], v, rows[doc_id][1])


def test_semantic_dedup_cross_engine_adversarial_vectors(spark, tmp_path):
    """semantic_dedup's full oracle replayed over an ADVERSARIAL
    embedding table the driver corpus never contains: the zero vector
    (0/0 centroid_sim — Spark NaN vs DuckDB NULL without the guard),
    exact duplicates (cosine exactly 1, centroid_sim ties broken by
    id), negated and scaled copies, one-hot axes and near-tie
    vectors. All three paths must agree: expr, arrow, and the SQL."""
    import random

    import __spark_entry__ as entry_mod
    from optbinning_spark.pipeline.similarity import (
        pinned_centroids,
        semantic_dedup,
    )

    rnd = random.Random(4133)
    dim = 64
    vecs = [
        [0.0] * dim,                                   # zero vector
        [1.0] + [0.0] * (dim - 1),                     # one-hot
        [1.0] + [0.0] * (dim - 1),                     # exact dup
        [-1.0] + [0.0] * (dim - 1),                    # negation
        [2.0] + [0.0] * (dim - 1),                     # scaled copy
        [1e-9] * dim,                                  # tiny norm
        [1.0] * dim,                                   # constant
    ] + [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(40)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pq = str(tmp_path / "embeddings.parquet")
    df.write.mode("overwrite").parquet(pq)
    emb = spark.read.parquet(pq)

    cents = pinned_centroids(8, dim)
    a = sorted(map(tuple, semantic_dedup(
        emb, 0.4, centroids=cents).collect()))
    b = sorted(map(tuple, semantic_dedup(
        emb, 0.4, centroids=cents, method="arrow").collect()))
    assert a == b

    con = duckdb.connect()
    con.execute(
        f"create view embeddings as select * from read_parquet('{pq}/*.parquet')")
    sql = entry_mod._sql_semantic_dedup(n_centroids=8, dim=dim)
    got_sql = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert a == got_sql, (a[:3], got_sql[:3])
    # the zero vector: NULL sim, kept, never paired — on every path
    z = [r for r in a if r[0] == 0][0]
    assert z[2] is None and z[3] is True


def _adversarial_documents(spark, tmp_path, name):
    """documents-schema parquet of adversarial texts: NULL, empty,
    whitespace-only, unicode letters/CJK (outside the BPE base-char
    vocab -> UNK ids), quotes/regex metacharacters, the chr(30) BPE
    separator itself, and long repetitive strings."""
    import random

    rnd = random.Random(7307)
    pieces = [
        "", " ", "the", "naïve", "ÜBER", "日本語", "don't", 'say "hi"',
        "a\\b", "\x1e", "\x1e\x1e", "x" * 300, "ab " * 50, "%s_[]().*+",
        "1e308", "-0.0", "a@b.cd 10.0.0.1",
    ]
    rows = []
    for i in range(60):
        n = rnd.randint(0, 8)
        rows.append((i, " ".join(rnd.choice(pieces) for _ in range(n)),
                     rnd.choice(["es", "en", "fr"]), "fuzz", 0))
    rows += [(60, None, "es", "fuzz", 0), (61, "", "en", "fuzz", 0),
             (62, "\x1e", "es", "fuzz", 0), (63, "日本語 データ", "en", "fuzz", 0)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    d = str(tmp_path / name)
    df.coalesce(1).write.mode("overwrite").parquet(
        d + "/documents.parquet")
    return d


@pytest.mark.parametrize("qname", ["training_sequences",
                                   "nb_quality_score",
                                   "dsir_logweights"])
def test_round8_oracles_cross_engine_adversarial_text(
        spark, tmp_path, qname):
    """The two new round-8 oracle surfaces (BPE id materialization +
    provenance assembly; NB train/score fold) replayed end-to-end over
    adversarial text the driver corpus never contains — same
    full-query-vs-full-oracle comparison the driver gate runs."""
    import __spark_entry__ as entry_mod

    d = _adversarial_documents(spark, tmp_path, f"fuzz_{qname}")
    got = sorted(
        map(tuple, entry_mod.queries()[qname](spark, d).collect()))
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{d}/documents.parquet/*.parquet')")
    want = sorted(tuple(r) for r in
                  con.execute(entry_mod.oracle_sql()[qname]).fetchall())
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g == w, (qname, g, w)


def test_round8_embedding_oracles_adversarial_vectors(spark, tmp_path):
    """kmeans_refined_centroids and cluster_balanced_sample replayed
    end-to-end over adversarial embeddings: the zero vector (all dots
    0 -> first-position argmax must agree across engines), exact
    duplicates, negated/scaled copies, argmax near-ties, and values
    whose *1e6 fixed-point rounding sits near .5 — the surfaces where
    Spark's array_position/round could diverge from DuckDB's
    list_position/round."""
    import random

    import __spark_entry__ as entry_mod

    rnd = random.Random(9241)
    dim = 64
    vecs = [
        [0.0] * dim,
        [1.0] + [0.0] * (dim - 1),
        [1.0] + [0.0] * (dim - 1),
        [-1.0] + [0.0] * (dim - 1),
        [2.0] + [0.0] * (dim - 1),
        [1e-9] * dim,
        [0.0000005] * dim,          # *1e6 lands exactly on 0.5
        [-0.0000015] * dim,         # negative half-tie
        [1.0] * dim,
    ] + [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(40)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    d = str(tmp_path / "fuzz_emb")
    (spark.createDataFrame(rows, "vec_id long, embedding array<double>")
     .coalesce(1).write.mode("overwrite")
     .parquet(d + "/embeddings.parquet"))

    con = duckdb.connect()
    con.execute(
        "create view embeddings as select * from "
        f"read_parquet('{d}/embeddings.parquet/*.parquet')")
    for qname in ("kmeans_refined_centroids", "cluster_balanced_sample"):
        got = sorted(
            map(tuple, entry_mod.queries()[qname](spark, d).collect()))
        want = sorted(
            tuple(r) for r in
            con.execute(entry_mod.oracle_sql()[qname]).fetchall())
        assert got == want, (qname, got[:3], want[:3])


def test_curriculum_oracle_cross_engine_adversarial_text(spark, tmp_path):
    """curriculum_shards' oracle over adversarial text WITHOUT NULLs
    (heavy score ties from empty/whitespace docs stress the
    percentile interpolation and the > cut bucket rule), plus the
    NULL-score guard on a corpus WITH a NULL-text doc."""
    import __spark_entry__ as entry_mod
    from optbinning_spark.pipeline.sampling import curriculum_shards
    from optbinning_spark.pipeline.text import token_count_expr

    d = _adversarial_documents(spark, tmp_path, "fuzz_curriculum")
    docs = spark.read.parquet(d + "/documents.parquet")
    clean_dir = str(tmp_path / "fuzz_curriculum_clean")
    (docs.filter(F.col("text").isNotNull()).coalesce(1)
     .write.mode("overwrite").parquet(clean_dir + "/documents.parquet"))

    got = sorted(map(tuple, entry_mod.queries()["curriculum_shards"](
        spark, clean_dir).collect()))
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{clean_dir}/documents.parquet/*.parquet')")
    want = sorted(tuple(r) for r in con.execute(
        entry_mod.oracle_sql()["curriculum_shards"]).fetchall())
    assert got == want, (got[:3], want[:3])

    # NULL text -> NULL score -> loud refusal, not silent misplacement
    scored = docs.select(
        "doc_id", token_count_expr(F.col("text")).alias("score"))
    with pytest.raises(ValueError, match="NULL"):
        curriculum_shards(scored, "score", n_shards=4)


@pytest.mark.parametrize("qname", ["jaccard_pairs", "minhash_signatures",
                                   "lsh_candidates", "incremental_dedup",
                                   "dedup_clusters"])
def test_shingle_oracles_sub3_word_docs(spark, tmp_path, qname):
    """All five shingle-based oracles over docs SHORTER than the
    3-word shingle window (round-9 ADVICE): the engine's
    shingles_from_words emits one short shingle via its greatest()
    guard, and the SQL shingle builders must mirror it
    (generate_series over greatest(len-2, 1)) — exercised here with
    duplicate 1- and 2-word docs so short shingles actually collide
    into bands/pairs on both engines."""
    import __spark_entry__ as entry_mod

    shorts = ["a", "a b", "b a", "", " ", "x", "x y", "a", "a b",
              "one two three", "one two", "two one", "x", "a b",
              "naïve ÜBER", "日本語", "日本語 データ", "a", "b a"]
    rows = [
        (i, t, ["en", "es"][i % 2], "fuzz", len(t)) for i, t in
        enumerate(shorts + [f"filler words here number {i} pad" for i in
                            range(12)])
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    d = str(tmp_path / f"short_{qname}")
    df.coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")

    got = sorted(map(tuple, entry_mod.queries()[qname](spark, d).collect()))
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{d}/documents.parquet/*.parquet')")
    want = sorted(tuple(r) for r in
                  con.execute(entry_mod.oracle_sql()[qname]).fetchall())
    assert len(got) == len(want), (qname, len(got), len(want))
    for g, w in zip(got, want):
        assert g == w, (qname, g, w)


def test_round12_debut_oracles_adversarial_vectors(spark, tmp_path):
    """pq_topk_pinned and ivf_topk_trained replayed over adversarial
    embeddings: duplicates and negated/scaled copies force ADC and
    cosine ties at the top-k boundary (the nbr_id tiebreak must agree
    across engines), and a zero vector sits in the QUERY set as well
    as the corpus. Round 12 this was a semantics cliff (Spark
    try_divide NULL vs DuckDB list_cosine_similarity -1.0) excluded
    by construction; round 13 pinned both engines to -1.0
    (similarity.rounded_cosine / the coalesced _SQL_COS), so the fuzz
    now exercises it: a zero-norm query ranks the whole corpus at
    cosine -1.0 and the nbr_id tiebreak alone must agree."""
    import random

    import __spark_entry__ as entry_mod

    rnd = random.Random(77_001)
    dim = 64
    well_behaved = [
        [1.0] + [0.0] * (dim - 1),
        [1.0] + [0.0] * (dim - 1),          # exact duplicate
        [-1.0] + [0.0] * (dim - 1),         # negated
        [2.0] + [0.0] * (dim - 1),          # scaled
        [0.0] * dim,                         # zero vector AS A QUERY
    ]
    tail = [
        [1.0] * dim,
        [1e-9] * dim,
        [0.0000005] * dim,                   # rounding half-tie at 6dp
    ] + [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(40)]
    rows = [(i, [float(x) for x in v])
            for i, v in enumerate(well_behaved + tail)]
    d = str(tmp_path / "fuzz_emb12")
    (spark.createDataFrame(rows, "vec_id long, embedding array<double>")
     .coalesce(1).write.mode("overwrite")
     .parquet(d + "/embeddings.parquet"))

    con = duckdb.connect()
    con.execute(
        "create view embeddings as select * from "
        f"read_parquet('{d}/embeddings.parquet/*.parquet')")
    # ivf_topk joined round 13 (debut of the training-replay oracle):
    # hash-ordered seeds here include duplicates and the zero vector,
    # so the seed normalization guard, rounded-argmax ties and the
    # empty-cluster keep-previous rule all replay under stress
    for qname in ("pq_topk_pinned", "ivf_topk_trained", "ivf_topk"):
        got = sorted(
            map(tuple, entry_mod.queries()[qname](spark, d).collect()))
        want = sorted(
            tuple(r) for r in
            con.execute(entry_mod.oracle_sql()[qname]).fetchall())
        assert got == want, (qname, got[:4], want[:4])


def test_gumbel_topk_oracle_adversarial_weights(spark, tmp_path):
    """dsir_gumbel_topk replayed over a documents frame engineered
    for boundary stress: many docs share the same n_chars-derived
    weight (the Gumbel noise must fully decide the order identically
    in both engines) and the corpus is barely larger than k, so the
    selection boundary sits inside a tied-weight group."""
    import __spark_entry__ as entry_mod

    rows = [(i, "t" * (i % 3), "en", "s", (i % 5) * 97 + 7)
            for i in range(60)]
    d = str(tmp_path / "fuzz_docs12")
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
     .coalesce(1).write.mode("overwrite")
     .parquet(d + "/documents.parquet"))
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{d}/documents.parquet/*.parquet')")
    got = sorted(map(tuple, entry_mod.queries()["dsir_gumbel_topk"](
        spark, d).collect()))
    want = sorted(tuple(r) for r in con.execute(
        entry_mod.oracle_sql()["dsir_gumbel_topk"]).fetchall())
    assert len(got) == 50
    assert got == want, (got[:4], want[:4])


@pytest.mark.parametrize("n_corpora", [
    4, pytest.param(20, marks=pytest.mark.full)])
def test_profile_dp_and_guillotine_oracles_random_corpora(
        spark, tmp_path, n_corpora):
    """The r16 2-D DP replays (profile-DP exact cover at 5x5,
    guillotine fallback at 7x7) fuzzed on random synthetic corpora:
    coarse discrete (quantity, price) values make integer cell counts
    collide and produce EXACT objective ties — the documented 9dp
    first-max residual is precisely where engine and oracle could
    drift, and the three pinned sf instances cannot cover it. Each
    corpus is fitted by the engine and replayed by the generated SQL
    over a DuckDB view named lineitem; the sorted rect tables must
    match exactly."""
    import numpy as np

    import __spark_entry__ as E
    from optbinning_spark.binning_2d import OptimalBinning2D

    rng = np.random.default_rng(20260817)
    qvals = [2.0, 8.0, 12.0, 18.0, 22.0, 28.0, 33.0, 38.0, 44.0, 49.0]
    pvals = [5e3, 1.8e4, 2.5e4, 3.5e4, 4.5e4, 5.5e4, 7e4, 9e4]
    checked = 0
    for t in range(n_corpora):
        n = int(rng.integers(2500, 4000))
        rows = [
            (int(i),
             float(rng.choice(qvals)),
             float(rng.choice(pvals)),
             "R" if rng.random() < 0.35 else "N")
            for i in range(n)
        ]
        df = spark.createDataFrame(
            rows, "rid int, l_quantity double, l_extendedprice double, "
                  "l_returnflag string")
        pq = str(tmp_path / f"fuzz2d_{t}.parquet")
        df.write.mode("overwrite").parquet(pq)
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW lineitem AS SELECT * FROM read_parquet("
            + _q(pq + "/*.parquet") + ")")
        ydf = df.withColumn(
            "y", (F.col("l_returnflag") == "R").cast("int"))

        for name, gx, gy, minb, cls_kw in [
            ("profile5", E._P5_X, E._P5_Y, 0.08, {}),
            ("guillotine7", E._GUIL_X, E._GUIL_Y, 0.05, {}),
        ]:
            ob = OptimalBinning2D(
                user_splits_x=gx, user_splits_y=gy,
                min_bin_size=minb, **cls_kw)
            ob.fit(ydf, "l_quantity", "l_extendedprice", "y")
            got = sorted(
                (int(r1), int(r2), int(c1), int(c2),
                 int(ob.count_[i]), int(ob.n_nonevent_[i]),
                 int(ob.n_event_[i]),
                 round(float(ob.woe_[i]) + 0.0, 6) + 0.0,
                 round(float(ob.iv_per_bin_[i]) + 0.0, 6) + 0.0)
                for i, (r1, r2, c1, c2) in enumerate(ob.rects_))
            if name == "profile5":
                sql = E._sql_binning_2d_profile_pinned(5, gx, gy, minb)
            else:
                sql = E.oracle_sql()["binning_2d_guillotine_pinned"]
            want = sorted(map(tuple, con.execute(sql).fetchall()))
            assert got == want, (t, name, got, want)
            checked += 1
        con.close()
    assert checked == 2 * n_corpora
