import pytest
from pyspark.sql import functions as F

from optbinning_spark.pipeline.dedup import (
    exact_dedup_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
)
from optbinning_spark.pipeline.similarity import brute_force_topk, lsh_bucketed_topk
from optbinning_spark.pipeline.text import document_stats, lang_id_expr


@pytest.fixture(scope="module")
def docs(spark):
    base = "the data query runs fast over the big table with many rows"
    near = "the data query runs slow over the big table with many rows"
    other = "completely different words about nothing in particular here now"
    rows = [
        (0, base),
        (1, base),       # exact dup of 0
        (2, near),       # near dup of 0
        (3, other),
        (4, "el la de y palabras en espanol con mas texto aqui"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    g = exact_dedup_groups(docs).collect()
    assert len(g) == 4  # 5 docs, one exact dup pair
    dup = [r for r in g if r["n_docs"] == 2]
    assert len(dup) == 1 and dup[0]["keep_id"] == 0


def test_minhash_identical_docs_same_signature(docs):
    sig = {r["doc_id"]: (r["mh0"], r["mh1"]) for r in
           minhash_signatures(docs, n_hashes=2).collect()}
    assert sig[0] == sig[1]
    assert sig[0] != sig[3]


def test_lsh_candidates_include_exact_dups(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in
             lsh_candidate_pairs(docs, n_hashes=8, band_size=2).collect()}
    assert (0, 1) in pairs
    assert (0, 3) not in pairs


def test_incremental_dedup_matches_batch(docs, spark):
    """The snapshot-refresh decision over (history | new) must equal
    what a from-scratch batch pairing over the union would conclude
    for the new docs: dup iff a batch candidate pair links the new
    doc to history or to a lower-id new doc."""
    from optbinning_spark.pipeline.dedup import (
        incremental_lsh_dedup,
        lsh_bands,
    )

    hist = docs.filter(F.col("doc_id") % 2 == 0)   # 0, 2, 4
    new = docs.filter(F.col("doc_id") % 2 == 1)    # 1, 3
    idx = lsh_bands(
        minhash_signatures(hist, n_hashes=8), n_hashes=8, band_size=2)
    got = {r["id"]: r for r in
           incremental_lsh_dedup(new, idx, n_hashes=8, band_size=2).collect()}
    assert set(got) == {1, 3}
    # doc 1 is an exact dup of history doc 0; doc 3 is unique
    assert got[1]["keep"] is False and got[1]["dup_of"] == 0
    assert got[3]["keep"] is True and got[3]["dup_of"] is None
    # general cross-check vs the batch pair generator over the union
    batch = {(r["id_a"], r["id_b"]) for r in
             lsh_candidate_pairs(docs, n_hashes=8, band_size=2).collect()}
    for nid, r in got.items():
        # qualifying colliders: any lower-id doc (history or new), or
        # a higher-id history doc
        linked = {a for a, b in batch if b == nid} | \
                 {b for a, b in batch if a == nid and b % 2 == 0}
        assert (not r["keep"]) == bool(linked), (nid, linked)


def test_incremental_dedup_empty_history(docs, spark):
    """With an empty index the refresh degrades to within-batch
    dedup: the lowest id of each colliding group survives."""
    from optbinning_spark.pipeline.dedup import (
        incremental_lsh_dedup,
        lsh_bands,
    )

    empty_idx = lsh_bands(
        minhash_signatures(docs.filter(F.lit(False)), n_hashes=8),
        n_hashes=8, band_size=2)
    got = {r["id"]: r for r in
           incremental_lsh_dedup(docs, empty_idx, n_hashes=8,
                                 band_size=2).collect()}
    assert len(got) == 5
    assert got[0]["keep"] is True
    assert got[1]["keep"] is False and got[1]["dup_of"] == 0
    assert got[3]["keep"] is True


def test_jaccard_pairs(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(docs, max_doc_freq=10, min_jaccard=0.1).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.1 <= pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs


def test_text_stats(docs):
    st = {r["doc_id"]: r for r in document_stats(docs).collect()}
    assert st[0]["n_tokens"] == 12
    assert st[0]["type_token_ratio"] < 1.0
    assert st[3]["stopword_ratio"] < st[0]["stopword_ratio"]


def test_lang_id(docs):
    pred = {r["doc_id"]: r["pl"] for r in docs.select(
        "doc_id", lang_id_expr(F.col("text")).alias("pl")).collect()}
    assert pred[0] == "en"
    assert pred[4] == "es"


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_brute_force_topk(vectors):
    q = vectors.filter("vec_id = 0").withColumnRenamed("vec_id", "query_id")
    top = brute_force_topk(vectors, q, k=2).collect()
    assert [r["nbr_id"] for r in top] == [1, 2]
    assert top[0]["cosine"] > 0.99


def test_lsh_topk_self_bucket(vectors):
    q = vectors.withColumnRenamed("vec_id", "query_id")
    res = lsh_bucketed_topk(vectors, q, dim=3, k=2, n_planes=2)
    # approximate: every returned neighbor shares the query's bucket;
    # sanity: no self matches, scores valid
    for r in res.collect():
        assert r["nbr_id"] != r["query_id"]
        assert -1.0001 <= r["cosine"] <= 1.0001


def test_ivf_topk_exhaustive_matches_brute_force(spark):
    """IVF with n_probe == n_centroids is exhaustive — identical to
    the brute-force result, proving the inverted lists partition the
    space without loss."""
    from optbinning_spark.pipeline.similarity import brute_force_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id < 5").withColumnRenamed("vec_id", "query_id")
    exact = brute_force_topk(emb, q, k=3).collect()
    ivf = ivf_topk(emb, q, k=3, n_centroids=4, n_probe=4).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted([(r["query_id"], r["rank"], r["nbr_id"]) for r in ivf]) == \
        sorted([(r["query_id"], r["rank"], r["nbr_id"]) for r in exact])


def test_ivf_topk_probe_subset(spark):
    """n_probe < n_centroids still returns k ranked neighbors per
    query with valid cosine scores (approximate path)."""
    from optbinning_spark.pipeline.similarity import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id < 5").withColumnRenamed("vec_id", "query_id")
    res = ivf_topk(emb, q, k=3, n_centroids=8, n_probe=2).collect()
    by_query = {}
    for r in res:
        assert r["nbr_id"] != r["query_id"]
        assert -1.0001 <= r["cosine"] <= 1.0001
        by_query.setdefault(r["query_id"], []).append(r["rank"])
    assert len(by_query) == 5
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_query.values())


def test_ivf_hash_init_deterministic_and_exhaustive(spark):
    """init="hash" (the cross-engine-replayable trainer, round 13):
    centroids are identical across partitionings (the fixed-point
    Lloyd reduction is order-independent by construction), unit-norm,
    and exhaustive probing over them still equals brute force."""
    import numpy as np

    from optbinning_spark.pipeline.similarity import (
        brute_force_topk,
        ivf_topk,
        train_ivf_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    c1 = train_ivf_centroids(emb, 8, n_iters=2, init="hash")
    c2 = train_ivf_centroids(emb.repartition(13), 8, n_iters=2,
                             init="hash")
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    assert np.allclose(np.linalg.norm(np.asarray(c1), axis=1), 1.0)

    q = emb.filter("vec_id < 5").withColumnRenamed("vec_id", "query_id")
    exact = brute_force_topk(emb, q, k=3).collect()
    ivf = ivf_topk(emb, q, k=3, n_centroids=8, n_probe=8, init="hash",
                   train_iters=2).collect()
    assert sorted((r["query_id"], r["rank"], r["nbr_id"]) for r in ivf) \
        == sorted((r["query_id"], r["rank"], r["nbr_id"]) for r in exact)

    with pytest.raises(ValueError, match="unknown init"):
        train_ivf_centroids(emb, 8, init="nope")


def test_multimodal_plumbing(spark, docs):
    from optbinning_spark.pipeline.multimodal import (
        extract_features,
        synthetic_media_df,
    )

    media = synthetic_media_df(spark, docs)
    out = extract_features(media)
    rows = out.collect()
    assert len(rows) == 5
    assert all(len(r["feat"]) == 32 for r in rows)
    # deterministic: same payload -> same content hash
    by_id = {r["doc_id"]: r["content_sha"] for r in rows}
    assert by_id[0] == by_id[1]


def test_multimodal_unknown_type_raises(spark, docs):
    from optbinning_spark.pipeline.multimodal import (
        extract_features,
        synthetic_media_df,
    )

    media = synthetic_media_df(spark, docs, media_type="video")
    with pytest.raises(Exception):
        extract_features(media).collect()


def test_cosine_pairs_symmetric_threshold(spark):
    import pyspark.sql.functions as F

    from optbinning_spark.pipeline.similarity import cosine_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pairs = cosine_pairs(emb, threshold=0.3)
    pdf = pairs.toPandas()
    assert (pdf["cosine"] >= 0.3).all()
    assert (pdf["id_a"] < pdf["id_b"]).all()
    # spot-check one pair against numpy
    import numpy as np

    if len(pdf):
        r = pdf.iloc[0]
        vecs = {
            row["vec_id"]: np.array(row["embedding"], dtype=float)
            for row in emb.filter(
                F.col("vec_id").isin([int(r["id_a"]), int(r["id_b"])])
            ).collect()
        }
        a, b = vecs[r["id_a"]], vecs[r["id_b"]]
        expect = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(r["cosine"] - expect) < 1e-5


def test_bucketed_cosine_pairs_subset_of_exact(spark):
    """The bucketed scale path returns a subset of the exact pairs
    (same threshold), with identical cosines on the intersection, and
    its plan has no theta self-join on the full table."""
    from optbinning_spark.pipeline.similarity import (
        bucketed_cosine_pairs,
        cosine_pairs,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_pairs(emb, threshold=0.3).collect()
    }
    bucketed = bucketed_cosine_pairs(emb, threshold=0.3, dim=64, n_planes=4)
    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in bucketed.collect()}
    assert set(got) <= set(exact)
    assert len(got) > 0
    for k, v in got.items():
        assert abs(v - exact[k]) < 1e-9
    # scale guard: candidates come from an equi-join on bucket (hash
    # join on the bucket key), not a cross/theta join over all pairs
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_invariants(spark):
    """SemDeDup keep rule: no near-dup edge survives with BOTH
    endpoints kept (the higher-(centroid_sim, id) endpoint of every
    qualifying pair is always dropped), every vector appears exactly
    once, and the candidate join is an equi-join on cluster_id."""
    from optbinning_spark.pipeline.similarity import (
        pinned_centroids,
        semantic_dedup,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = pinned_centroids(8, 64)
    res = semantic_dedup(emb, threshold=0.4, centroids=cents)
    rows = {r["id"]: r for r in res.collect()}
    assert len(rows) == emb.count()
    assert any(not r["keep"] for r in rows.values())  # threshold bites
    # recompute pairwise cosine within clusters driver-side and check
    # the no-kept-edge invariant + the drop direction
    import numpy as np

    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=float)
            for r in emb.collect()}
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ra, rb = rows[a], rows[b]
            if ra["cluster_id"] != rb["cluster_id"]:
                continue
            va, vb = vecs[a], vecs[b]
            cos = round(float(va @ vb / (np.linalg.norm(va)
                                         * np.linalg.norm(vb))), 6)
            if cos >= 0.4:
                # the endpoint later in (centroid_sim, id) order must
                # have been dropped
                hi = rb if (ra["centroid_sim"], a) < (rb["centroid_sim"], b) \
                    else ra
                assert not hi["keep"], (a, b, cos)
    # cluster ids come from the pinned quantizer: bounded range
    assert all(1 <= r["cluster_id"] <= 8 for r in rows.values())
    # scale guard: no cartesian/theta join anywhere in the plan
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_arrow_parity(spark):
    """The Arrow scale path (matmul assignment + per-cluster gram
    matrix) must reproduce the expr path EXACTLY — same cluster ids,
    centroid sims and keep flags — on the fixture corpus at two
    quantizer sizes."""
    from optbinning_spark.pipeline.similarity import (
        pinned_centroids,
        semantic_dedup,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for k in (8, 16):
        cents = pinned_centroids(k, 64)
        a = sorted(map(tuple, semantic_dedup(
            emb, 0.4, centroids=cents).collect()))
        b = sorted(map(tuple, semantic_dedup(
            emb, 0.4, centroids=cents, method="arrow").collect()))
        assert a == b


def test_semantic_dedup_knobs(spark):
    """Degenerate knobs: an unreachable threshold keeps everything;
    max_cluster_size=1 disables pairing (keeps everything); the
    trained-quantizer path (centroids=None) is deterministic."""
    from optbinning_spark.pipeline.similarity import (
        pinned_centroids,
        semantic_dedup,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    cents = pinned_centroids(8, 64)
    hi = semantic_dedup(emb, threshold=1.01, centroids=cents)
    assert hi.filter("keep").count() == n
    capped = semantic_dedup(emb, threshold=0.4, centroids=cents,
                            max_cluster_size=1)
    assert capped.filter("keep").count() == n
    t1 = semantic_dedup(emb, threshold=0.4, n_centroids=4)
    t2 = semantic_dedup(emb, threshold=0.4, n_centroids=4)
    assert sorted(map(tuple, t1.collect())) == sorted(map(tuple, t2.collect()))


def test_hyperplane_signs_wide_embedding_codegen(spark):
    """dim-768 x 8 planes must not blow up codegen: weights are array
    Literals (O(n_planes) expression nodes), not dim x planes inlined
    multiply-adds."""
    import numpy as np
    import pyspark.sql.functions as F

    from optbinning_spark.pipeline.similarity import hyperplane_signs_expr

    rng = np.random.RandomState(7)
    rows = [(i, rng.randn(768).tolist()) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = df.select(
        "vec_id",
        hyperplane_signs_expr(F.col("embedding"), 768, 8).alias("bucket"),
    ).collect()
    assert len(out) == 8
    assert all(len(r["bucket"]) == 8 and set(r["bucket"]) <= {"0", "1"}
               for r in out)


def test_multimodal_resize_and_frame_sample(spark, docs):
    """Resize keeps 1:1 rows with updated dims; frame sampling fans
    out 1:n_frames rows — both map-only Arrow-batched kernels."""
    from optbinning_spark.pipeline.multimodal import (
        resize_images,
        sample_frames,
        synthetic_media_df,
    )

    import pyspark.sql.functions as F

    media = synthetic_media_df(spark, docs)
    n = media.count()
    rs = resize_images(media, target_w=16, target_h=8)
    got = rs.limit(5).collect()
    assert rs.count() == n
    assert all(r["width"] == 16 and r["height"] == 8 for r in got)
    assert all(len(bytes(r["media"])) == 16 * 8 for r in got)

    fr = sample_frames(media, n_frames=4)
    assert fr.count() == n * 4
    one = fr.filter(fr.doc_id == got[0]["doc_id"]).collect()
    assert sorted(r["frame_idx"] for r in one) == [0, 1, 2, 3]
    # deterministic: same call, same bytes
    again = sample_frames(media, n_frames=4).filter(
        F.col("doc_id") == got[0]["doc_id"]).collect()
    assert [bytes(r["frame"]) for r in sorted(one, key=lambda r: r["frame_idx"])] == [
        bytes(r["frame"]) for r in sorted(again, key=lambda r: r["frame_idx"])]


# ---------------------------------------------------------------------------
# ANN recall@k — the number a 100 TB user actually cares about.
# ---------------------------------------------------------------------------

def _recall(approx_rows, exact_rows):
    ex, ap = {}, {}
    for r in exact_rows:
        ex.setdefault(r["query_id"], set()).add(r["nbr_id"])
    for r in approx_rows:
        ap.setdefault(r["query_id"], set()).add(r["nbr_id"])
    hits = sum(len(ap.get(q, set()) & s) for q, s in ex.items())
    total = sum(len(s) for s in ex.values())
    return hits / total


@pytest.fixture(scope="module")
def clustered_corpus(spark):
    """600 vectors in 6 tight clusters with ids SORTED BY CLUSTER —
    the adversarial time-ordered layout where a prefix sample trains
    the quantizer on a temporal slice."""
    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.normal(size=(6, 8))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(600):
        v = centers[i // 100] + 0.05 * rng.normal(size=8)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_recall_on_id_sorted_clusters(clustered_corpus):
    """Recall@5 >= 0.9 at n_probe=2 with sample_size (150) spanning
    less than two clusters' id range: train_ivf_centroids samples in
    xxhash64(id) order, so every cluster is represented.  A prefix
    (orderBy(id).limit) sample would see clusters 0-1 only and
    collapse recall for queries in clusters 2-5."""
    from optbinning_spark.pipeline.similarity import (
        brute_force_topk, ivf_topk, train_ivf_centroids)

    emb = clustered_corpus
    q = emb.filter("vec_id % 97 = 0").withColumnRenamed("vec_id", "query_id")
    exact = brute_force_topk(emb, q, k=5).collect()
    cents = train_ivf_centroids(emb, n_centroids=6, sample_size=150)
    approx = ivf_topk(emb, q, k=5, n_probe=2, centroids=cents).collect()
    assert _recall(approx, exact) >= 0.9


def test_lsh_topk_recall(clustered_corpus):
    """lsh_bucketed_topk recall@5 at a realistic plane count on the
    clustered corpus."""
    from optbinning_spark.pipeline.similarity import (
        brute_force_topk, lsh_bucketed_topk)

    emb = clustered_corpus
    q = emb.filter("vec_id % 97 = 0").withColumnRenamed("vec_id", "query_id")
    exact = brute_force_topk(emb, q, k=5).collect()
    approx = lsh_bucketed_topk(emb, q, dim=8, k=5, n_planes=2).collect()
    assert _recall(approx, exact) >= 0.9


def test_decode_features_stub_fallback():
    """Without codec libraries (this container) — or with them but an
    undecodable payload — decode_features returns the deterministic
    stub vector, keeping the mapInPandas pipeline total."""
    import numpy as np

    from optbinning_spark.pipeline.multimodal import (
        _decode_stub, decode_features)

    payload = b"definitely not a PNG"
    got = decode_features(payload, "image")
    np.testing.assert_array_equal(got, _decode_stub(payload, "image"))
    got_a = decode_features(payload, "audio")
    np.testing.assert_array_equal(got_a, _decode_stub(payload, "audio"))
    with pytest.raises(NotImplementedError):
        decode_features(payload, "video")


def _make_ppm(w, h, value=None):
    """Binary P6 PPM with constant pixel value (or a gradient when
    value is None) — pure bytes, no codec library."""
    import numpy as np

    if value is None:
        px = (np.arange(w * h * 3, dtype=np.uint64) * 7 % 256).astype(
            np.uint8).reshape(h, w, 3)
    else:
        px = np.full((h, w, 3), value, dtype=np.uint8)
    return b"P6\n# test\n%d %d\n255\n" % (w, h) + px.tobytes()


def _make_wav(samples, sample_rate=16000):
    """16-bit mono RIFF WAV from float samples in [-1, 1] — stdlib
    wave writer, no codec library."""
    import wave
    from io import BytesIO

    import numpy as np

    buf = BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        pcm = (np.clip(np.asarray(samples), -1.0, 1.0)
               * 32767.0).astype("<i2")
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def test_decode_features_real_path():
    """A REAL decode runs un-skipped in every environment: with Pillow
    installed the PNG tier decodes; without it the stdlib PPM tier
    parses actual pixel bytes. Constant-color image -> every
    thumbnail feature equals the gray level exactly (both tiers
    preserve constants)."""
    import numpy as np

    from optbinning_spark.pipeline.multimodal import (
        _decode_stub, _pil, decode_features)

    Image = _pil()
    if Image is not None:
        from io import BytesIO

        img = Image.new("RGB", (32, 16), color=(200, 200, 200))
        buf = BytesIO()
        img.save(buf, format="PNG")
        payload = buf.getvalue()
    else:
        payload = _make_ppm(32, 16, value=200)
    feat = decode_features(payload, "image")
    assert feat.shape == (32,)
    np.testing.assert_allclose(feat, np.full(32, 200.0 / 255.0), atol=2e-2)
    # and it is NOT the stub: the real decode saw the actual pixels
    assert not np.allclose(feat, _decode_stub(payload, "image"))


def test_decode_ppm_pixels_exact():
    """The stdlib PPM tier decodes the exact pixel bytes (gradient
    image round-trips through parse -> grayscale mean)."""
    import numpy as np

    from optbinning_spark.pipeline.multimodal import _decode_ppm

    payload = _make_ppm(8, 4)
    gray = _decode_ppm(payload)
    assert gray.shape == (4, 8)
    px = (np.arange(8 * 4 * 3, dtype=np.uint64) * 7 % 256).astype(
        np.uint8).reshape(4, 8, 3)
    want = (px.astype(np.float32) / 255.0).mean(axis=2)
    np.testing.assert_allclose(gray, want, atol=1e-6)
    # non-PPM payloads refuse rather than mis-parse
    assert _decode_ppm(b"not an image") is None
    assert _decode_ppm(b"P6\n2 2\n255\nshort") is None


def test_decode_wav_real_path():
    """The stdlib WAV tier decodes real PCM: a waveform concentrated
    at +0.5 puts all histogram mass in the right bin; a NON-wav
    payload falls through to the stub."""
    import numpy as np

    from optbinning_spark.pipeline.multimodal import (
        _decode_stub, decode_features)

    payload = _make_wav([0.5] * 1000)
    feat = decode_features(payload, "audio")
    assert feat.shape == (32,)
    # 0.5 quantizes to 16383/32768 (just below the 0.5 edge) -> bin 23
    assert feat[23] == 1.0 and feat.sum() == 1.0
    bad = b"definitely not audio"
    np.testing.assert_array_equal(
        decode_features(bad, "audio"), _decode_stub(bad, "audio"))


def test_extract_features_real_decode_end_to_end(spark):
    """mapInPandas end-to-end over REAL decodable payloads (PPM +
    WAV): the distributed pipeline itself exercises the real tier,
    not just the kernel function."""
    import numpy as np

    from optbinning_spark.pipeline.multimodal import extract_features

    rows = [
        (1, _make_ppm(16, 8, value=100), "image", 16, 8, 0),
        (2, _make_wav([-0.25] * 400), "audio", 0, 0, 16000),
        (3, b"undecodable", "image", 0, 0, 0),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, media binary, media_type string, width int, "
        "height int, sample_rate int",
    )
    got = {r["doc_id"]: r for r in extract_features(df).collect()}
    assert len(got) == 3
    np.testing.assert_allclose(
        got[1]["feat"], np.full(32, 100.0 / 255.0), atol=1e-6)
    afeat = np.asarray(got[2]["feat"])
    assert afeat[12] == 1.0  # -0.25 -> bin 12 of 32 over [-1, 1]
    assert len(got[3]["feat"]) == 32  # stub keeps the batch total


def test_resize_images_real_ppm_tier(spark):
    """resize_images' stdlib tier really resamples pixels: a constant
    PPM resizes to constant gray bytes of the target size."""
    from optbinning_spark.pipeline.multimodal import resize_images

    docs = spark.createDataFrame(
        [(1, _make_ppm(16, 8, value=60), "image", 16, 8, 0)],
        "doc_id long, media binary, media_type string, width int, "
        "height int, sample_rate int",
    )
    out = resize_images(docs, target_w=4, target_h=2).collect()[0]
    assert out["width"] == 4 and out["height"] == 2
    assert out["media"] == bytes([60] * 8)


# -- connected components / duplicate clustering --------------------------


def _brute_components(edges, nodes=None):
    """Union-find ground truth: node -> min id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for x in list(parent) + list(nodes or []):
        out[x] = find(x)
    return out


def test_connected_components_random_graph(spark):
    import random

    from optbinning_spark.pipeline.dedup import connected_components

    rng = random.Random(7)
    edges = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(150)
    ]
    edges = [e for e in edges if e[0] != e[1]]
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    want = _brute_components(edges)
    # distributed star-contraction path (driver fast path disabled)
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, driver_threshold=0).collect()
    }
    assert got == want
    # driver union-find fast path (default) must agree exactly
    got_drv = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got_drv == want


def test_connected_components_path_graph(spark):
    """Worst case for plain min-propagation (diameter = n). The
    large-star/small-star alternation must converge inside the
    iteration budget and still find one component."""
    from optbinning_spark.pipeline.dedup import connected_components

    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    rows = connected_components(df, max_iter=10, driver_threshold=0).collect()
    assert len(rows) == n
    assert {r["component"] for r in rows} == {0}


def test_duplicate_clusters_end_to_end(spark):
    """duplicate_clusters == union-find over lsh_candidate_pairs, with
    singletons for unpaired docs and is_canonical = min-id member."""
    from optbinning_spark.pipeline.dedup import (
        duplicate_clusters,
        lsh_candidate_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = [
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(docs).collect()
    ]
    all_ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    want = _brute_components(pairs, nodes=all_ids)
    # jaccard_threshold=None: this test pins the RAW-LSH closure
    # (union-find over the banded candidate pairs); the verified
    # default is covered by test_duplicate_clusters_default_verifies
    got = duplicate_clusters(docs, jaccard_threshold=None).collect()
    assert len(got) == len(all_ids)
    for r in got:
        assert r["cluster_id"] == want[r["doc_id"]]
        assert r["is_canonical"] == (r["cluster_id"] == r["doc_id"])
    # at least one real multi-doc cluster exists in the fixture
    assert any(not r["is_canonical"] for r in got)


def test_lsh_max_bucket_size_guard(spark):
    """Hot-bucket cap: identical docs all share every band bucket; a
    cap below the group size must drop those buckets' pairs while
    leaving small-bucket pairs intact."""
    from optbinning_spark.pipeline.dedup import lsh_candidate_pairs

    rows = [(i, "common boilerplate text repeated everywhere "
                "the same words every time") for i in range(10)]
    rows += [(100, "a unique document about spark partitioning"),
             (101, "a unique document about spark partitioning")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    uncapped = lsh_candidate_pairs(df, max_bucket_size=None).collect()
    capped = lsh_candidate_pairs(df, max_bucket_size=5).collect()
    big = {(a, b) for a, b in ((r["id_a"], r["id_b"]) for r in uncapped)
           if a < 100}
    assert len(big) == 45  # 10 choose 2 — uncapped keeps the hot bucket
    capped_set = {(r["id_a"], r["id_b"]) for r in capped}
    assert (100, 101) in capped_set
    assert not any(a < 100 for a, _ in capped_set)


def test_simhash_banded_pairs_exact(spark):
    """Pigeonhole exactness: with max_hamming = n_bands - 1 the banded
    join must find EXACTLY the brute-force Hamming pairs."""
    from optbinning_spark.pipeline.dedup import simhash, simhash_candidate_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fps = {r["doc_id"]: r["simhash"]
           for r in simhash(docs, n_bits=16).collect()}
    ids = sorted(fps)
    want = {
        (a, b): bin(fps[a] ^ fps[b]).count("1")
        for i, a in enumerate(ids) for b in ids[i + 1:]
        if bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_candidate_pairs(
            docs, n_bits=16, n_bands=4, max_hamming=3).collect()
    }
    assert got == want
    assert want  # fixture has at least one near-dup pair


def test_simhash_banded_pairs_rejects_bad_config(spark):
    import pytest as _pt

    from optbinning_spark.pipeline.dedup import simhash_candidate_pairs

    docs = spark.createDataFrame([(1, "a b")], "doc_id: long, text: string")
    with _pt.raises(ValueError):
        simhash_candidate_pairs(docs, n_bands=4, max_hamming=4)


# -- deterministic sampling / splits --------------------------------------


def test_hash_split_disjoint_exhaustive_deterministic(spark):
    from optbinning_spark.pipeline.sampling import hash_split

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", fr).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", fr).collect()}
    assert a == b  # bit-stable across runs
    n = len(a)
    from collections import Counter

    c = Counter(a.values())
    assert set(c) <= set(fr)
    assert sum(c.values()) == n  # exhaustive
    assert abs(c["train"] / n - 0.8) < 0.06  # 500 docs, ~2 sigma
    # different salt -> different assignment (decorrelated)
    c2 = {r["doc_id"]: r["split"]
          for r in hash_split(docs, "doc_id", fr, salt="other").collect()}
    assert c2 != a


def test_global_shuffle_shards_is_addressed_permutation(spark):
    """(shard, pos) is a dense 0-based addressing of a deterministic
    permutation; concatenating shards 0..n-1 reproduces the global
    (u, id) order; changing the salt re-shuffles."""
    import hashlib

    from optbinning_spark.pipeline.sampling import global_shuffle_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    rows = global_shuffle_shards(docs, "doc_id", n_shards=8).select(
        "doc_id", "shard", "pos").collect()
    assert len(rows) == n
    addr = {(r["shard"], r["pos"]) for r in rows}
    assert len(addr) == n  # unique addresses
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps)))  # dense per shard
    # concatenated order == global (u, id) order recomputed driver-side
    def u(doc_id):
        h = hashlib.md5(f"shuffle|{doc_id}".encode()).hexdigest()
        return int(h[:8], 16) / 2**32

    concat = [r["doc_id"] for r in sorted(rows, key=lambda r: (r["shard"], r["pos"]))]
    expect = [d for _, d in sorted((u(r["doc_id"]), r["doc_id"]) for r in rows)]
    assert concat == expect
    # epoch re-shuffle: a different salt permutes differently
    other = [r["doc_id"] for r in sorted(
        global_shuffle_shards(docs, "doc_id", 8, salt="epoch1").select(
            "doc_id", "shard", "pos").collect(),
        key=lambda r: (r["shard"], r["pos"]))]
    assert other != concat


def test_hash_split_rejects_bad_fractions(spark):
    import pytest as _pt

    from optbinning_spark.pipeline.sampling import hash_split

    docs = spark.createDataFrame([(1, "x")], "doc_id: long, text: string")
    with _pt.raises(ValueError):
        hash_split(docs, "doc_id", {"a": 0.5, "b": 0.4})


def test_stratified_hash_sample(spark):
    from optbinning_spark.pipeline.sampling import stratified_hash_sample

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    langs = {r["lang"]: r["n"] for r in
             docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    major = max(langs, key=langs.get)
    out = stratified_hash_sample(
        docs, "lang", {major: 0.3}, default_fraction=1.0)
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # non-major strata kept whole; major downsampled to ~30%
    for k, v in langs.items():
        if k != major:
            assert got.get(k) == v
    assert 0.1 < got[major] / langs[major] < 0.5
    # deterministic: same rows both times
    ids1 = {r["doc_id"] for r in out.collect()}
    ids2 = {r["doc_id"] for r in stratified_hash_sample(
        docs, "lang", {major: 0.3}, default_fraction=1.0).collect()}
    assert ids1 == ids2


def test_connected_components_empty_and_no_pairs(spark):
    from optbinning_spark.pipeline.dedup import (
        connected_components,
        duplicate_clusters,
    )

    empty = spark.createDataFrame([], "id_a: long, id_b: long")
    assert connected_components(empty).count() == 0
    assert connected_components(empty, driver_threshold=0).count() == 0
    # corpus with no near-dups: every doc is its own canonical cluster
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six seven"),
         (3, "red orange yellow green blue indigo violet")],
        "doc_id: long, text: string")
    rows = duplicate_clusters(docs, jaccard_threshold=None).collect()
    assert len(rows) == 3
    assert all(r["is_canonical"] and r["cluster_id"] == r["doc_id"]
               for r in rows)


def test_embedding_duplicate_clusters(spark):
    """Embedding clusters == union-find over bucketed cosine pairs,
    singletons included."""
    from optbinning_spark.pipeline.similarity import (
        bucketed_cosine_pairs,
        embedding_duplicate_clusters,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pairs = [(r["id_a"], r["id_b"]) for r in
             bucketed_cosine_pairs(emb, 0.4, dim=64, n_planes=4).collect()]
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    want = _brute_components(pairs, nodes=ids)
    got = embedding_duplicate_clusters(emb, 0.4, dim=64, n_planes=4).collect()
    assert len(got) == len(ids)
    for r in got:
        assert r["cluster_id"] == want[r["vec_id"]]


def test_connected_components_property(spark):
    """Hypothesis sweep: for random small graphs the driver union-find
    path must equal the pure-Python ground truth (the distributed path
    is pinned to it by test_connected_components_random_graph)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from optbinning_spark.pipeline.dedup import connected_components

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1, max_size=40))
    def run(edges):
        edges = [e for e in edges if e[0] != e[1]]
        if not edges:
            return
        df = spark.createDataFrame(edges, "id_a: long, id_b: long")
        got = {r["node"]: r["component"]
               for r in connected_components(df).collect()}
        assert got == _brute_components(edges)

    run()


def test_connected_components_chain_rounds(spark):
    """A path graph — the worst case for plain min-label propagation
    (O(diameter) rounds) — closes in O(log^2 n) star rounds: the
    distributed loop is FORCED (driver_threshold=0) on a 2000-node
    chain and its observed round count must stay logarithmic, not
    linear. Also pins correctness: every node labels to component 0."""
    from optbinning_spark.pipeline.dedup import connected_components

    n = 2000
    edges = [(i, i + 1) for i in range(n - 1)]
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    stats = {}
    got = {r["node"]: r["component"]
           for r in connected_components(
               df, driver_threshold=0, stats=stats).collect()}
    assert stats["path"] == "distributed"
    assert stats["edges"] == n - 1
    # log2(2000)^2 ~ 120 is the theoretical bound; star contraction
    # converges far faster in practice — 20 is a tight regression
    # guard that a propagation-style bug (O(n) rounds) cannot pass
    assert 1 <= stats["rounds"] <= 20
    assert len(got) == n
    assert all(c == 0 for c in got.values())


def test_cc_distributed_local_uf_matches_driver(spark):
    """r18 local-union-find closure: the forced-distributed path must
    equal the driver union-find on randomized multigraphs (duplicate
    edges, self-referencing labels, multiple components), and must
    never need the star fallback on a well-formed run."""
    import random

    from optbinning_spark.pipeline.dedup import connected_components

    rng = random.Random(18)
    for _ in range(4):
        n = rng.randint(5, 60)
        edges = [(rng.randint(0, n), rng.randint(0, n))
                 for _ in range(rng.randint(1, 90))]
        edges = [e for e in edges if e[0] != e[1]]
        if not edges:
            continue
        df = spark.createDataFrame(edges, "id_a: long, id_b: long")
        stats = {}
        d = sorted(map(tuple, connected_components(
            df, driver_threshold=0, stats=stats).collect()))
        drv = sorted(map(tuple, connected_components(df).collect()))
        assert d == drv
        assert stats["path"] == "distributed"
        assert "star_fallback" not in stats


def test_cc_star_fallback_on_broken_fast_round(spark, monkeypatch):
    """The decode-validity verification is load-bearing: if the fast
    local-union-find round is sabotaged into a no-op (its 'stable'
    fixed point is then NOT a min-star forest), connected_components
    must detect that, fall back to the proven alternating-star loop,
    and still return the exact components."""
    from optbinning_spark.pipeline import dedup as dedup_mod
    from optbinning_spark.pipeline.dedup import connected_components

    monkeypatch.setattr(
        dedup_mod, "_cc_round_local_uf", lambda e: e.select("src", "dst"))
    edges = [(3, 2), (2, 1), (1, 0), (10, 11)]  # chains: not stars
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    stats = {}
    got = {r["node"]: r["component"]
           for r in connected_components(
               df, driver_threshold=0, stats=stats).collect()}
    assert stats["star_fallback"] is True
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10}


def test_connected_components_driver_stats(spark):
    """The driver fast path reports itself through the same stats
    contract (path/edges/rounds)."""
    from optbinning_spark.pipeline.dedup import connected_components

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a: long, id_b: long")
    stats = {}
    got = {r["node"]: r["component"]
           for r in connected_components(df, stats=stats).collect()}
    assert stats == {"path": "driver", "edges": 3, "rounds": 0}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_duplicate_clusters_jaccard_verify(spark):
    """jaccard_threshold kills false-positive band collisions before
    transitive closure: two docs sharing one rare band but dissimilar
    shingle sets must NOT merge, while true near-dups still do."""
    from optbinning_spark.pipeline.dedup import (
        duplicate_clusters, lsh_candidate_pairs)

    near_a = "the quick brown fox jumps over the lazy dog today"
    near_b = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [(1, near_a), (2, near_b),
         (3, "completely different text about spark engines and scale"),
         (4, "another unrelated document discussing binning tables")],
        "doc_id: long, text: string")
    verified = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(
        docs, n_hashes=8, band_size=2, jaccard_threshold=0.5).collect()}
    # true near-dups merge; everything else stays singleton
    assert verified[1] == verified[2] == 1
    assert verified[3] == 3 and verified[4] == 4
    # and the verify step is strictly a subset filter of the raw pairs
    raw = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(
        docs, n_hashes=8, band_size=2).collect()}
    assert (1, 2) in raw


def test_verify_pairs_jaccard_matches_bruteforce(spark):
    """verify_pairs_jaccard keeps exactly the candidate pairs whose
    shingle-set Jaccard clears the threshold — pinned against a pure
    Python recomputation on the same shingle definition."""
    from optbinning_spark.pipeline.dedup import verify_pairs_jaccard

    texts = {
        1: "a b c d e f g h",
        2: "a b c d e f g x",
        3: "a b c d q r s t",
        4: "z y x w v u t s",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id: long, text: string")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3)], "id_a: long, id_b: long")

    def shingles(t, n=3):
        w = t.split(" ")
        return {" ".join(w[i:i + n]) for i in range(max(len(w) - n + 1, 1))}

    def jac(a, b):
        sa, sb = shingles(texts[a]), shingles(texts[b])
        return len(sa & sb) / len(sa | sb)

    for thr in (0.2, 0.5, 0.8):
        got = {(r["id_a"], r["id_b"]) for r in verify_pairs_jaccard(
            docs, pairs, min_jaccard=thr).collect()}
        want = {(a, b) for a, b in [(1, 2), (1, 3), (1, 4), (2, 3)]
                if jac(a, b) >= thr}
        assert got == want, (thr, got, want)


def test_split_thresholds_fsum_exact():
    """split_thresholds must produce the correctly-rounded prefix sums
    (fsum), not accumulation artifacts: 0.8 + 0.1 must gate on the
    double nearest 0.9, bit-identical to the decimal literal an oracle
    would write."""
    from optbinning_spark.pipeline.sampling import split_thresholds

    thr = split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1})
    assert thr == {"train": 0.8, "val": 0.9}
    assert repr(thr["val"]) == "0.9"  # NOT 0.9000000000000002
    import pytest as _pytest

    with _pytest.raises(ValueError):
        split_thresholds({"a": 0.5, "b": 0.4})


def test_normalize_text_expr(spark):
    from optbinning_spark.pipeline.text import normalize_text_expr

    df = spark.createDataFrame(
        [(1, "Hello,   World! (v2)"), (2, "hello world v2")],
        "doc_id: long, text: string")
    rows = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", normalize_text_expr(F.col("text")).alias("n")).collect()}
    assert rows[1] == "hello world v2"
    assert rows[1] == rows[2]  # case/punct noise collapses to one key


def test_duplicate_ngram_spans_and_merge(spark):
    """Span detection + gaps-and-islands merge, brute-force checked:
    two docs sharing a 4-gram produce position-exact spans; merging
    overlapping hits yields the minimal cut list."""
    from optbinning_spark.pipeline.dedup import (
        duplicate_ngram_spans, merge_word_spans)

    shared = "alpha beta gamma delta"
    docs = spark.createDataFrame(
        [(1, f"x1 {shared} y1 z1"),
         (2, f"p2 q2 {shared} epsilon r2"),
         (3, "all words here are unique ones only")],
        "doc_id: long, text: string")
    spans = duplicate_ngram_spans(docs, n=4, min_count=2)
    got = {(r["doc_id"], r["start_word"], r["end_word"],
            r["n_occurrences"]) for r in spans.collect()}
    # doc1: shared at words 1..5; doc2: at words 2..6 — only the
    # exact shared 4-gram occurs twice corpus-wide
    assert got == {(1, 1, 5, 2), (2, 2, 6, 2)}
    # overlapping + disjoint spans merge per doc
    raw = spark.createDataFrame(
        [(1, 0, 4), (1, 2, 6), (1, 10, 14), (2, 5, 9)],
        "doc_id: long, start_word: long, end_word: long")
    merged = {(r["doc_id"], r["start_word"], r["end_word"])
              for r in merge_word_spans(raw).collect()}
    assert merged == {(1, 0, 6), (1, 10, 14), (2, 5, 9)}


def test_ngram_contamination_flags_eval_overlap(spark):
    """Docs sharing an n-gram with the reference set are flagged with
    the DISTINCT shared count; clean docs report 0."""
    from optbinning_spark.pipeline.dedup import ngram_contamination

    eval_line = "the quick brown fox jumps over"
    docs = spark.createDataFrame(
        [(1, f"prefix {eval_line} suffix words here"),
         (2, "completely unrelated text with different tokens inside"),
         (3, f"{eval_line} {eval_line}")],  # repeated: still distinct grams
        "doc_id: long, text: string")
    ref = spark.createDataFrame(
        [(100, eval_line)], "doc_id: long, text: string")
    got = {r["doc_id"]: (r["n_shared"], r["contaminated"])
           for r in ngram_contamination(docs, ref, n=6).collect()}
    assert got[1] == (1, True)
    assert got[2] == (0, False)
    assert got[3] == (1, True)  # distinct-gram counting, not positions


def test_gopher_flags_rules(spark):
    """Each Gopher gate fires on a targeted violation."""
    from optbinning_spark.pipeline.text import gopher_quality_flags

    long_ok = " ".join(["the", "and", "with"] * 4 + ["wordy"] * 28)
    short = "too short entirely"
    symbols = " ".join(["the", "and"] * 6 + ["####"] * 20)
    no_alpha = " ".join(["the", "and"] * 4 + ["123"] * 30)
    docs = spark.createDataFrame(
        [(1, long_ok), (2, short), (3, symbols), (4, no_alpha)],
        "doc_id: long, text: string")
    got = {r["doc_id"]: r.asDict() for r in gopher_quality_flags(
        docs, min_words=20, min_avg_word_len=0.0,
        min_stopword_hits=2).collect()}
    assert got[1]["keep"]
    assert not got[2]["ok_word_count"] and not got[2]["keep"]
    assert not got[3]["ok_symbol_ratio"] and not got[3]["keep"]
    assert not got[4]["ok_alpha_ratio"] and not got[4]["keep"]


def test_cut_word_spans_end_to_end(spark):
    """detect -> merge -> cut: the duplicated 4-gram is spliced out of
    both docs; span-free docs pass through untouched."""
    from optbinning_spark.pipeline.dedup import (
        cut_word_spans, duplicate_ngram_spans, merge_word_spans)

    shared = "alpha beta gamma delta"
    docs = spark.createDataFrame(
        [(1, f"x1 {shared} y1 z1"),
         (2, f"p2 q2 {shared} epsilon r2"),
         (3, "all words here are unique ones only")],
        "doc_id: long, text: string")
    spans = merge_word_spans(duplicate_ngram_spans(docs, n=4, min_count=2))
    got = {r["doc_id"]: r["text_cut"]
           for r in cut_word_spans(docs, spans).collect()}
    assert got[1] == "x1 y1 z1"
    assert got[2] == "p2 q2 epsilon r2"
    assert got[3] == "all words here are unique ones only"


def test_repetition_flags_rules(spark):
    """Repetition gates, hand-computable fixtures: a degenerate
    repeated-bigram doc fails top2gram; a diverse doc passes all."""
    from optbinning_spark.pipeline.text import repetition_flags

    rep = " ".join(["spam", "ham"] * 15)          # one bigram dominates
    ok = " ".join(f"w{i}" for i in range(30))     # all distinct
    docs = spark.createDataFrame(
        [(1, rep), (2, ok)], "doc_id: long, text: string")
    got = {r["doc_id"]: r.asDict() for r in repetition_flags(docs).collect()}
    # "spam ham" occurs 15 times over 30 words -> coverage 1.0
    assert got[1]["top2gram_fraction"] == 1.0
    assert not got[1]["ok_top2gram"] and not got[1]["keep"]
    assert got[1]["dup_word_fraction"] == pytest.approx(
        1.0 - 2 / 30, abs=1e-6)
    assert got[2]["top2gram_fraction"] == pytest.approx(
        1 * 2 / 30, abs=1e-6)
    assert got[2]["dup_word_fraction"] == 0.0
    assert got[2]["keep"]


def test_hashed_keys_match_exact_string_keys(spark):
    """hash_shingles/hash_ngrams=True must be value-identical to the
    exact string-keyed paths (collisions are ~2^-64): pinned on the
    sf0.001 documents so a hashing regression cannot ship silently."""
    from optbinning_spark.pipeline.dedup import (
        duplicate_ngram_spans, ngram_jaccard_pairs)

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(200)
    a = {(r["id_a"], r["id_b"], r["n_common"], r["jaccard"])
         for r in ngram_jaccard_pairs(docs, hash_shingles=True).collect()}
    b = {(r["id_a"], r["id_b"], r["n_common"], r["jaccard"])
         for r in ngram_jaccard_pairs(docs, hash_shingles=False).collect()}
    assert a == b and len(a) > 0
    sa = {(r["doc_id"], r["start_word"], r["end_word"], r["n_occurrences"])
          for r in duplicate_ngram_spans(
              docs, n=5, hash_ngrams=True).collect()}
    sb = {(r["doc_id"], r["start_word"], r["end_word"], r["n_occurrences"])
          for r in duplicate_ngram_spans(
              docs, n=5, hash_ngrams=False).collect()}
    assert sa == sb and len(sa) > 0


def test_merge_word_spans_property(spark):
    """Hypothesis sweep: merge_word_spans equals the classic driver
    interval-merge on random span sets (per-doc, overlap + adjacency
    semantics: [a,b) and [b,c) merge)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from optbinning_spark.pipeline.dedup import merge_word_spans

    def brute(spans):
        out = {}
        by_doc = {}
        for d, s, e in spans:
            by_doc.setdefault(d, []).append((s, e))
        for d, ivs in by_doc.items():
            ivs.sort()
            merged = [list(ivs[0])]
            for s, e in ivs[1:]:
                if s <= merged[-1][1]:
                    merged[-1][1] = max(merged[-1][1], e)
                else:
                    merged.append([s, e])
            out[d] = {(s, e) for s, e in merged}
        return out

    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 30), st.integers(1, 10)),
        min_size=1, max_size=25))
    def run(raw):
        spans = [(d, s, s + ln) for d, s, ln in raw]
        df = spark.createDataFrame(
            spans, "doc_id: long, start_word: long, end_word: long")
        got = {}
        for r in merge_word_spans(df).collect():
            got.setdefault(r["doc_id"], set()).add(
                (r["start_word"], r["end_word"]))
        assert got == brute(spans)

    run()


def test_mixture_sampling_rates_chain(spark):
    """Mixing rates realize the target token mixture when chained into
    stratified_hash_sample: the binding stratum keeps rate 1.0, and
    expected post-sample token shares equal the targets."""
    import pytest as _pt

    from optbinning_spark.pipeline.sampling import (
        mixture_sampling_rates, stratified_hash_sample)

    docs = spark.createDataFrame(
        [(i, "en" if i < 80 else "fr", "w " * 10) for i in range(100)],
        "doc_id: long, lang: string, text: string")
    rates = {r["stratum"]: r for r in mixture_sampling_rates(
        docs, "lang", {"en": 0.5, "fr": 0.5}).collect()}
    # fr has 20 docs vs en's 80: fr binds at rate 1.0, en keeps 1/4
    assert rates["fr"]["rate"] == 1.0
    assert rates["en"]["rate"] == _pt.approx(0.25, abs=1e-6)
    # expected tokens: en 80*11*0.25 == fr 20*11*1.0 (text is "w "*10
    # -> 11 single-space tokens)
    en_exp = rates["en"]["n_tokens"] * rates["en"]["rate"]
    fr_exp = rates["fr"]["n_tokens"] * rates["fr"]["rate"]
    assert en_exp == _pt.approx(fr_exp, rel=1e-9)
    # chains directly into the deterministic sampler
    keep = {k: float(v["rate"]) for k, v in rates.items()}
    sampled = stratified_hash_sample(docs, "lang", keep)
    got = {r["lang"]: r["cnt"] for r in sampled.groupBy("lang").agg(
        F.count("*").alias("cnt")).collect()}
    assert got["fr"] == 20           # rate 1.0 keeps everything
    assert 10 <= got.get("en", 0) <= 35  # hash-gate around 20 of 80


def test_mixture_sampling_rates_absent_stratum(spark):
    """A stratum named in target_weights but absent from df must
    surface as a zero-token row and drive the achievable budget (so
    every rate) to 0 — not be silently dropped with the remaining
    shares normalized over the full weight sum."""
    from optbinning_spark.pipeline.sampling import mixture_sampling_rates

    docs = spark.createDataFrame(
        [(i, "en", "w " * 10) for i in range(10)],
        "doc_id: long, lang: string, text: string")
    rows = {r["stratum"]: r for r in mixture_sampling_rates(
        docs, "lang", {"en": 0.5, "fr": 0.5}).collect()}
    assert set(rows) == {"en", "fr"}
    assert rows["fr"]["n_docs"] == 0 and rows["fr"]["n_tokens"] == 0
    assert rows["fr"]["rate"] == 0.0
    # the mixture is unrealizable by downsampling alone: B = 0
    assert rows["en"]["rate"] == 0.0
    assert rows["en"]["target_weight"] == 0.5


def test_lsh_bucket_cap_default_on(spark):
    """The too-common-band cap defaults ON (max_bucket_size=1000): a
    degenerate bucket of 1001 identical docs emits ZERO pairs through
    the default path instead of B(B-1)/2 ≈ 500k, while normal pairs
    survive; None is the explicit uncapped opt-out."""
    from optbinning_spark.pipeline.dedup import lsh_candidate_pairs

    rows = [(i, "common boilerplate text repeated everywhere "
                "the same words every time") for i in range(1001)]
    rows += [(2000, "a unique document about spark partitioning"),
             (2001, "a unique document about spark partitioning")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {(r["id_a"], r["id_b"])
           for r in lsh_candidate_pairs(df).collect()}
    assert got == {(2000, 2001)}


def test_connected_components_checkpoint_dir(spark, tmp_path):
    """checkpoint_dir switches per-round lineage truncation from
    localCheckpoint to RELIABLE .checkpoint() (executor-loss-safe on a
    real cluster); the distributed star loop must write checkpoints
    under the dir and produce output identical to the default."""
    import os

    from optbinning_spark.pipeline.dedup import connected_components

    edges = [(i, i + 1) for i in range(0, 300, 1) if (i + 1) % 50 != 0]
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    base = {(r["node"], r["component"])
            for r in connected_components(df, driver_threshold=0).collect()}
    ckpt = str(tmp_path / "cc_ckpt")
    stats: dict = {}
    got = {(r["node"], r["component"])
           for r in connected_components(
               df, driver_threshold=0, checkpoint_dir=ckpt,
               stats=stats).collect()}
    assert got == base
    assert stats["path"] == "distributed" and stats["rounds"] >= 1
    # reliable checkpoints actually landed on disk
    found = [fn for _, _, fns in os.walk(ckpt) for fn in fns]
    assert found, "no checkpoint files written under checkpoint_dir"


def test_ngram_use_window_modes_value_identical(spark):
    """The window df-cap/occurrence-count and the two-phase
    groupBy+join escape hatch must produce IDENTICAL rows (the A/B in
    tools/ab_window_vs_agg.py picked the window as default on
    measured speed; this pins that the flag changes only the physical
    plan, never the result)."""
    from optbinning_spark.pipeline.dedup import (
        duplicate_ngram_spans,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for fn, kw in ((ngram_jaccard_pairs, {}),
                   (duplicate_ngram_spans, {"n": 5})):
        win = sorted(map(tuple, fn(docs, use_window=True, **kw).collect()))
        agg = sorted(map(tuple, fn(docs, use_window=False, **kw).collect()))
        assert win == agg and len(win) > 0


def test_ngram_default_is_window_plan(spark):
    """Pins the A/B-chosen default: duplicate_ngram_spans' default
    plan counts occurrences with a Window (single scan), while
    use_window=False swaps in the aggregate+join shape (no Window
    operator anywhere in that plan)."""
    from optbinning_spark.pipeline.dedup import duplicate_ngram_spans

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dflt = duplicate_ngram_spans(docs, n=5)._jdf.queryExecution() \
        .executedPlan().toString()
    twop = duplicate_ngram_spans(docs, n=5, use_window=False)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Window" in dflt
    assert "Window" not in twop and "Join" in twop


def test_use_window_auto_hot_key_escape(spark):
    """use_window="auto" (the new default) must probe the hottest key
    and fall back to the two-phase shape when the estimate crosses the
    threshold — an adversarial corpus with one extreme-frequency
    n-gram can no longer silently straggler a window partition. On a
    normal corpus the probe must keep the measured-faster window."""
    from optbinning_spark.pipeline import dedup as D

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # adversarial fixture: every doc shares one boilerplate block, so
    # its n-grams are the extreme-frequency keys
    boiler = " ".join(f"w{i % 7}" for i in range(40))
    adv = docs.limit(50).selectExpr(
        "doc_id", f"concat('{boiler} ', text) as text")

    # normal corpus, full probe: window (estimated hottest far below
    # the production threshold)
    plan = D.duplicate_ngram_spans(
        docs, n=5, hot_key_probe_fraction=1.0)._jdf \
        .queryExecution().executedPlan().toString()
    d = D.AUTO_WINDOW_DECISIONS["duplicate_ngram_spans"]
    assert d["use_window"] is True and "Window" in plan

    # adversarial corpus with a tight threshold: auto must escape to
    # the two-phase shape (no Window operator in the plan)
    spans = D.duplicate_ngram_spans(
        adv, n=5, hot_key_threshold=10, hot_key_probe_fraction=1.0)
    d = D.AUTO_WINDOW_DECISIONS["duplicate_ngram_spans"]
    assert d["use_window"] is False and d["estimated_hottest"] >= 10
    plan = spans._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Join" in plan
    # and the escape path's values still match the pinned window shape
    win = sorted(map(tuple, D.duplicate_ngram_spans(
        adv, n=5, use_window=True).collect()))
    assert sorted(map(tuple, spans.collect())) == win and len(win) > 0

    # jaccard side: same escape, value-identical to the window shape
    pairs = D.ngram_jaccard_pairs(
        adv, hot_key_threshold=10, hot_key_probe_fraction=1.0)
    assert D.AUTO_WINDOW_DECISIONS["ngram_jaccard_pairs"][
        "use_window"] is False
    win = sorted(map(tuple, D.ngram_jaccard_pairs(
        adv, use_window=True).collect()))
    assert sorted(map(tuple, pairs.collect())) == win


def test_use_window_auto_streaming_and_memo_ttl(spark, tmp_path):
    """Round-12 ADVICE hardening of the auto probe: (a) a STREAMING
    input short-circuits to the pinned window shape instead of
    raising inside sample()+first(); (b) memo entries expire after
    the TTL so a corpus rewritten mid-session is re-probed."""
    import time as _time

    from optbinning_spark.pipeline import dedup as D

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # (a) streaming: build a file stream over the same schema; the
    # plan must construct (no probe action) and carry the Window shape
    sdir = str(tmp_path / "sdocs")
    docs.limit(20).write.parquet(sdir)
    stream = (spark.readStream.schema(docs.schema).parquet(sdir))
    spans = D.duplicate_ngram_spans(stream, n=5)  # would raise pre-fix
    assert spans.isStreaming
    d = D.AUTO_WINDOW_DECISIONS["duplicate_ngram_spans"]
    assert d["use_window"] is True and d.get("streaming") is True
    pairs = D.ngram_jaccard_pairs(stream)
    assert pairs.isStreaming
    assert D.AUTO_WINDOW_DECISIONS["ngram_jaccard_pairs"].get(
        "streaming") is True

    # (b) TTL: first call probes, second call hits the memo; an aged
    # entry over an UNCHANGED file listing refreshes its stamp
    # WITHOUT re-probing (round 13 — the blind TTL re-probe was the
    # plausible cause of r12's +8-11% on the shingle-path bench
    # queries); an aged entry whose listing changed re-probes
    D._PROBE_DECISION_CACHE.clear()
    D.duplicate_ngram_spans(docs, n=5, hot_key_probe_fraction=1.0)
    assert "cached" not in D.AUTO_WINDOW_DECISIONS["duplicate_ngram_spans"]
    assert len(D._PROBE_DECISION_CACHE) == 1
    D.duplicate_ngram_spans(docs, n=5, hot_key_probe_fraction=1.0)
    assert D.AUTO_WINDOW_DECISIONS["duplicate_ngram_spans"][
        "cached"] is True
    key = next(iter(D._PROBE_DECISION_CACHE))
    dec, stamp, sig = D._PROBE_DECISION_CACHE[key]
    assert sig is not None  # parquet-backed plan carries a listing
    D._PROBE_DECISION_CACHE[key] = (
        dec, stamp - D._PROBE_DECISION_TTL_S - 1, sig)
    D.duplicate_ngram_spans(docs, n=5, hot_key_probe_fraction=1.0)
    d = D.AUTO_WINDOW_DECISIONS["duplicate_ngram_spans"]
    assert d.get("ttl_refreshed") is True and d["cached"] is True
    # stamp refreshed, no re-probe
    assert D._PROBE_DECISION_CACHE[key][1] > _time.monotonic() - 60
    # changed listing: age the entry AND tamper its signature
    D._PROBE_DECISION_CACHE[key] = (
        dec, stamp - D._PROBE_DECISION_TTL_S - 1, "0:bogus")
    D.duplicate_ngram_spans(docs, n=5, hot_key_probe_fraction=1.0)
    d = D.AUTO_WINDOW_DECISIONS["duplicate_ngram_spans"]
    assert "cached" not in d and d["estimated_hottest"] is not None
    # the re-probe re-memoized with a fresh stamp and a real signature
    assert D._PROBE_DECISION_CACHE[key][1] > _time.monotonic() - 60
    assert D._PROBE_DECISION_CACHE[key][2] == sig


def test_dsir_log_weights_brute_force(spark):
    """DSIR importance weights (Xie et al. 2023) against a numpy
    replay on a tiny fixture: hashed unigram+bigram bucket counts,
    Laplace-1 ratios, per-doc summed log-ratio."""
    import hashlib
    import math

    from optbinning_spark.pipeline.sampling import dsir_log_weights

    NB = 64
    rows = [
        (0, "the cat sat"),
        (1, "the dog sat"),
        (2, "unrelated words entirely"),
        (3, "the cat ran"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.filter("doc_id in (0, 3)")  # cat-flavored target

    def feats(text):
        ws = text.split(" ")
        fs = list(ws)
        fs += [" ".join(ws[i:i + 2]) for i in range(len(ws) - 1)]
        return [int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % NB
                for f in fs]

    tc, rc = {}, {}
    for i, t in rows:
        for b in feats(t):
            rc[b] = rc.get(b, 0) + 1
            if i in (0, 3):
                tc[b] = tc.get(b, 0) + 1
    tt = sum(tc.values()) + NB
    rt = sum(rc.values()) + NB
    expect = {}
    for i, t in rows:
        expect[i] = sum(
            math.log((tc.get(b, 0) + 1) / tt)
            - math.log((rc.get(b, 0) + 1) / rt)
            for b in feats(t))
    got = {r["doc_id"]: r["log_weight"] for r in
           dsir_log_weights(docs, target, n_buckets=NB).collect()}
    assert set(got) == set(expect)
    for k in expect:
        assert got[k] == pytest.approx(expect[k], rel=1e-12)
    # target-flavored docs outscore the unrelated one
    assert min(got[0], got[3]) > got[2]
    # the single-pass target_flag form (target = predicate slice of
    # raw, counted with a conditional count in ONE explode) must be
    # byte-identical to the two-frame path
    flagged = {r["doc_id"]: r["log_weight"] for r in dsir_log_weights(
        docs, None, n_buckets=NB,
        target_flag=F.col("doc_id").isin(0, 3)).collect()}
    assert flagged == got


def test_dsir_raw_sample_fraction_and_features(spark):
    """The two 100 TB scan-reduction paths: (a) sampled raw counts —
    deterministic across partitionings (hash gate, not df.sample),
    fraction=1.0 identical to exact, ranking roughly preserved even on
    a 500-doc corpus (the measured rho-vs-fraction curve and its
    concentration model live in tools/ab_dsir_sample.py + SCALING.md);
    (b) precomputed compact feature frames — EXACTLY equal to the
    text path (zero accuracy loss)."""
    from pyspark.sql import functions as F

    from optbinning_spark.pipeline.sampling import (
        dsir_features,
        dsir_log_weights,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet").select(
            "doc_id", "text", "lang")
    target = docs.filter(F.col("lang") == "es")
    NB = 512

    with pytest.raises(ValueError):
        dsir_log_weights(docs, target, n_buckets=NB,
                         raw_sample_fraction=0.0)

    exact = {r["doc_id"]: r["log_weight"] for r in dsir_log_weights(
        docs, target, n_buckets=NB).collect()}
    full = {r["doc_id"]: r["log_weight"] for r in dsir_log_weights(
        docs, target, n_buckets=NB, raw_sample_fraction=1.0).collect()}
    assert full == exact  # fraction=1.0 short-circuits to exact counts

    # (b) the materialized-features path computes the SAME weights
    via_feats = {r["doc_id"]: r["log_weight"] for r in dsir_log_weights(
        dsir_features(docs, n_buckets=NB),
        dsir_features(target, n_buckets=NB),
        n_buckets=NB, features_col="features").collect()}
    assert via_feats == exact

    s1 = {r["doc_id"]: r["log_weight"] for r in dsir_log_weights(
        docs, target, n_buckets=NB, raw_sample_fraction=0.3).collect()}
    s2 = {r["doc_id"]: r["log_weight"] for r in dsir_log_weights(
        docs.repartition(13), target, n_buckets=NB,
        raw_sample_fraction=0.3).collect()}
    assert s1 == s2  # partition-independent (deterministic hash gate)

    # ranking roughly preserved: Spearman rho over the shared ids.
    # 500 docs x ~100 features over 512 buckets is DEEP in the
    # sampling-variance regime (per-bucket mass ~105; the validated
    # model caps rho(0.3) well below 0.99 here) — this asserts the
    # estimator isn't broken, not that it concentrates; concentration
    # is a corpus-size property measured in tools/ab_dsir_sample.py.
    ids = sorted(exact)
    import statistics

    def ranks(d):
        order = sorted(ids, key=lambda i: (d[i], i))
        return {i: r for r, i in enumerate(order)}

    ra, rb = ranks(exact), ranks(s1)
    xs = [ra[i] for i in ids]
    ys = [rb[i] for i in ids]
    rho = statistics.correlation(xs, ys)
    assert rho > 0.75, f"rank corr degraded: {rho}"


def test_dsir_gumbel_sample_deterministic_and_biased(spark):
    """Gumbel-top-k resampling: reproducible across invocations and
    partitionings (hash-derived noise), and enriched toward
    high-weight docs."""
    from optbinning_spark.pipeline.sampling import dsir_gumbel_sample

    rows = [(i, 3.0 if i < 50 else -3.0) for i in range(500)]
    w = spark.createDataFrame(rows, "doc_id long, log_weight double")
    a = sorted(r["doc_id"] for r in dsir_gumbel_sample(w, 40).collect())
    b = sorted(r["doc_id"] for r in
               dsir_gumbel_sample(w.repartition(7), 40).collect())
    assert a == b and len(a) == 40
    # exp(6) ~ 400x relative odds: the 50 hot docs dominate the draw
    assert sum(1 for i in a if i < 50) >= 30


def test_chunk_documents_coverage_and_overlap(spark):
    """Chunking invariants on arbitrary lengths: every word position
    covered exactly once outside overlaps, consecutive chunks share
    exactly `overlap` words (except a shorter tail), no chunk is
    fully contained in its predecessor, reassembly recovers the doc."""
    from optbinning_spark.pipeline.text import chunk_documents

    texts = {i: " ".join(f"t{i}_{j}" for j in range(n))
             for i, n in enumerate([1, 2, 7, 8, 9, 15, 16, 17, 40])}
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    chunk, ov = 8, 3
    rows = chunk_documents(docs, chunk_tokens=chunk, overlap=ov).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r
    for i, text in texts.items():
        words = text.split(" ")
        cs = [by_doc[i][k] for k in sorted(by_doc[i])]
        # n_tokens is honest and chunk_ids are dense from 0
        assert [c["chunk_id"] for c in cs] == list(range(len(cs)))
        seen = []
        for k, c in enumerate(cs):
            toks = c["text"].split(" ")
            assert len(toks) == c["n_tokens"] <= chunk
            start = k * (chunk - ov)
            assert toks == words[start:start + chunk]
            if k > 0:  # adds at least one new token
                assert start + len(toks) > start + ov
            seen.extend(toks[ov:] if k else toks)
        assert seen == words  # full coverage, no gaps/dups


def test_pack_sequences_invariants(spark):
    """Packing invariants per shard: token conservation, every
    sequence except the shard's last exactly full, offsets tile each
    sequence contiguously from 0, doc slices cover each doc in order."""
    from optbinning_spark.pipeline.text import pack_sequences

    import numpy as np

    rng = np.random.RandomState(3)
    rows = []
    for i in range(60):
        n = int(rng.randint(1, 40))
        rows.append((i, "ab" if i % 2 else "cd",
                     " ".join(f"t{i}_{j}" for j in range(n))))
    docs = spark.createDataFrame(rows, "doc_id long, sh string, text string")
    L = 16
    out = pack_sequences(docs, seq_tokens=L, shard_col="sh").collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    tok_by_shard = {}
    for i, sh, t in rows:
        tok_by_shard[sh] = tok_by_shard.get(sh, 0) + len(t.split(" "))
    for sh, rs in by_shard.items():
        assert sum(r["n_tokens"] for r in rs) == tok_by_shard[sh]
        seqs = {}
        for r in rs:
            seqs.setdefault(r["seq_id"], []).append(r)
        last = max(seqs)
        for sid, parts in seqs.items():
            parts.sort(key=lambda r: r["seq_offset"])
            # contiguous tiling from offset 0
            off = 0
            for p in parts:
                assert p["seq_offset"] == off
                off += p["n_tokens"]
            assert off == (L if sid != last else off)
            assert off <= L
        # per-doc slices are in order and cover the doc
        by_doc = {}
        for r in rs:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for i, _, t in rows:
            if i not in by_doc:
                continue
            ps = sorted(by_doc[i], key=lambda r: r["doc_start"])
            pos = 0
            for p in ps:
                assert p["doc_start"] == pos
                pos += p["n_tokens"]
            assert pos == len(t.split(" "))


def test_pack_sequences_single_shard_and_validation(spark):
    from optbinning_spark.pipeline.text import pack_sequences

    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    rows = pack_sequences(docs, seq_tokens=2).collect()
    assert {(r["seq_id"], r["doc_start"], r["n_tokens"]) for r in rows} == \
        {(0, 0, 2), (1, 2, 1)}
    with pytest.raises(ValueError, match="positive"):
        pack_sequences(docs, seq_tokens=0)


def test_duplicate_clusters_default_verifies(spark):
    """The production default exact-verifies candidate pairs
    (jaccard_threshold=0.5): docs sharing ONLY a boilerplate prefix
    must not transitively merge, while real near-dups still do. This
    pins the round-6 default flip — on the organic sf1 corpus the raw
    closure produced a 4,615-doc mega-cluster (9% of the corpus wrongly
    dropped by the keep-list); verified, the largest cluster is the
    10 planted cross-shard dups."""
    from optbinning_spark.pipeline.dedup import duplicate_clusters

    bp = "licensed under the apache license version two point zero see"
    rows = [(i, f"{bp} unique{i} content{i} entirely{i} different{i} "
                f"words{i} here{i} now{i} more{i} filler{i}")
            for i in range(12)]
    rows += [(100, "real duplicate text about spark window aggregation"),
             (101, "real duplicate text about spark window aggregation")]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r["doc_id"]: r["cluster_id"]
           for r in duplicate_clusters(docs).collect()}
    assert got[100] == got[101] == 100          # true dups merge
    for i in range(12):                          # boilerplate does not
        assert got[i] == i


def test_stratified_top_fraction(spark):
    """Per-stratum budget selection: exact ceil(frac*n) rows per
    stratum, the kept rows are the stratum's highest scores, ties
    break deterministically by id, per-stratum dict budgets apply and
    unnamed strata keep everything."""
    from optbinning_spark.pipeline.sampling import stratified_top_fraction

    rows = [(i, "a" if i < 10 else "b", float(i % 7)) for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id long, s string, score double")
    out = stratified_top_fraction(df, "s", "score", 0.4).collect()
    by = {}
    for r in out:
        by.setdefault(r["s"], []).append(r)
    assert len(by["a"]) == 4   # ceil(0.4 * 10)
    assert len(by["b"]) == 6   # ceil(0.4 * 15)
    # kept = the top scores of each stratum (with id tie-break)
    def brute(stratum, frac):
        import math
        members = [(sc, i) for i, s2, sc in rows if s2 == stratum]
        members.sort(key=lambda t: (-t[0], t[1]))
        k = math.ceil(frac * len(members))
        return {i for _, i in members[:k]}
    assert {r["doc_id"] for r in by["a"]} == brute("a", 0.4)
    assert {r["doc_id"] for r in by["b"]} == brute("b", 0.4)
    # dict budgets: only 'a' capped, 'b' keeps everything
    out2 = stratified_top_fraction(df, "s", "score", {"a": 0.2}).collect()
    by2 = {}
    for r in out2:
        by2.setdefault(r["s"], []).append(r)
    assert len(by2["a"]) == 2 and len(by2["b"]) == 15


def test_bm25_topk_brute_force(spark):
    """BM25 scores and ranking pinned against a pure-Python Okapi
    computation (idf floor variant ln(1 + (N-df+.5)/(df+.5)))."""
    import math

    from optbinning_spark.pipeline.similarity import bm25_topk

    corpus = [
        (0, "spark window aggregation engine"),
        (1, "spark spark spark streaming"),
        (2, "cooking recipes for dinner tonight"),
        (3, "window functions in sql engine"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    qs = spark.createDataFrame([(0, "spark engine")],
                               "query_id long, query_text string")
    got = [(r["nbr_id"], r["score"], r["rank"]) for r in
           bm25_topk(docs, qs, k=4).orderBy("rank").collect()]

    N = len(corpus)
    dls = {i: len(t.split(" ")) for i, t in corpus}
    avgdl = sum(dls.values()) / N
    def df(t): return sum(1 for _, x in corpus if t in x.split(" "))
    def score(i):
        s = 0.0
        toks = corpus[i][1].split(" ")
        for t in ("spark", "engine"):
            tf = toks.count(t)
            if not tf:
                continue
            idf = math.log(1 + (N - df(t) + 0.5) / (df(t) + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dls[i] / avgdl))
        return s
    want = sorted(((i, score(i)) for i in range(4) if score(i) > 0),
                  key=lambda t: (-t[1], t[0]))
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gi, gs, gr), (wi, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)
    assert [g[2] for g in got] == list(range(1, len(want) + 1))


def test_round6_ops_null_text_semantics(spark):
    """NULL-text rows: chunking and packing drop them (no tokens),
    DSIR emits a NULL log_weight, BM25 simply never retrieves them —
    none of the four fabricates data from a NULL words array."""
    from optbinning_spark.pipeline.sampling import dsir_log_weights
    from optbinning_spark.pipeline.similarity import bm25_topk
    from optbinning_spark.pipeline.text import (
        chunk_documents,
        pack_sequences,
    )

    docs = spark.createDataFrame([(0, "a b c"), (1, None), (2, "")],
                                 "doc_id long, text string")
    chunks = chunk_documents(docs, chunk_tokens=2, overlap=0).collect()
    assert {r["doc_id"] for r in chunks} == {0, 2}
    packed = pack_sequences(docs, seq_tokens=2).collect()
    assert {r["doc_id"] for r in packed} == {0, 2}
    w = {r["doc_id"]: r["log_weight"]
         for r in dsir_log_weights(docs, docs, n_buckets=16).collect()}
    assert w[1] is None and w[0] is not None
    qs = spark.createDataFrame([(0, "a")],
                               "query_id long, query_text string")
    hits = bm25_topk(docs, qs, k=3).collect()
    assert {r["nbr_id"] for r in hits} == {0}


def test_ngram_lm_perplexity_brute_force(spark):
    """Interpolated Laplace bigram LM pinned against a pure-Python
    recomputation; fluent text scores lower perplexity than OOV junk;
    NULL-text docs drop."""
    import math
    from collections import Counter

    from optbinning_spark.pipeline.text import ngram_lm_perplexity

    lm_rows = [(0, "the cat sat on the mat"), (1, "the dog sat on the rug")]
    lm = spark.createDataFrame(lm_rows, "doc_id long, text string")
    docs = spark.createDataFrame(
        [(0, "the cat sat"), (1, "zebra quantum flux"), (2, None)],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in ngram_lm_perplexity(docs, lm).collect()}
    assert 2 not in got
    assert got[0]["perplexity"] < got[1]["perplexity"]

    toks = [w for _, t in lm_rows for w in t.split(" ")]
    c1 = Counter(toks)
    T, V = len(toks), len(c1)
    bigr = Counter()
    for _, t in lm_rows:
        ws = t.split(" ")
        for i in range(1, len(ws)):
            bigr[(ws[i - 1], ws[i])] += 1

    def p(w, v=None):
        pu = (c1.get(w, 0) + 1.0) / (T + V)
        if v is None:
            return pu
        return (0.9 * (bigr.get((v, w), 0) + 1.0) / (c1.get(v, 0) + V)
                + 0.1 * pu)

    for i, text in ((0, "the cat sat"), (1, "zebra quantum flux")):
        ws = text.split(" ")
        lps = [math.log(p(ws[0]))] + [
            math.log(p(ws[j], ws[j - 1])) for j in range(1, len(ws))]
        ce = -sum(lps) / len(ws)
        assert got[i]["cross_entropy"] == pytest.approx(ce, rel=1e-12)
        assert got[i]["perplexity"] == pytest.approx(math.exp(ce), rel=1e-12)


def test_redact_pii(spark):
    """PII scrubbing: typed placeholders, per-kind counts, clean text
    untouched, digit-bearing vocab tokens (w00042) not false-flagged."""
    from optbinning_spark.pipeline.text import redact_pii

    docs = spark.createDataFrame(
        [(0, "reach jane.doe+x@mail.example.org or +1 555 123 4567 now"),
         (1, "host 10.0.42.7 and 192.168.0.1 up; w00042 is a token"),
         (2, "clean text only")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert got[0]["n_email"] == 1 and got[0]["n_phone"] == 1
    assert "[PII:email]" in got[0]["text"]
    assert "[PII:phone]" in got[0]["text"]
    assert "jane" not in got[0]["text"]
    assert got[1]["n_ipv4"] == 2 and "w00042" in got[1]["text"]
    assert got[2]["text"] == "clean text only"
    assert got[2]["n_email"] == got[2]["n_ipv4"] == got[2]["n_phone"] == 0


def test_jsonl_corpus_roundtrip_and_quarantine(spark, tmp_path):
    """JSONL corpus source/sink: enforced schema (no inference pass),
    malformed lines quarantined under PERMISSIVE, round-trip through
    the compressed sink preserves rows, FAILFAST raises."""
    import pytest as _pt

    from optbinning_spark.sources.corpus import (
        quarantine_split,
        read_jsonl_corpus,
        write_jsonl_corpus,
    )

    raw = tmp_path / "in"
    raw.mkdir()
    lines = [
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s1"}',
        '{"doc_id": 2, "text": "hola mundo", "lang": "es", "source": "s2"}',
        'this is not json at all',
        '{"doc_id": 3, "lang": "fr", "source": "s3"}',  # missing text
    ]
    (raw / "part0.jsonl").write_text("\n".join(lines))
    df = read_jsonl_corpus(spark, str(raw))
    clean, quarantined = quarantine_split(df)
    assert {r["doc_id"] for r in clean.collect()} == {1, 2}
    assert quarantined.count() == 2
    out = tmp_path / "out"
    write_jsonl_corpus(clean, str(out), partitions=2)
    back = read_jsonl_corpus(spark, str(out))
    clean2, q2 = quarantine_split(back)
    assert sorted((r["doc_id"], r["text"]) for r in clean2.collect()) == \
        sorted((r["doc_id"], r["text"]) for r in clean.collect())
    assert q2.count() == 0
    with _pt.raises(Exception):
        read_jsonl_corpus(spark, str(raw), mode="FAILFAST").collect()


def test_jsonl_quarantine_metrics_per_file(spark, tmp_path):
    """Per-input-file quarantine metrics: a corrupt shard is identified
    by file NAME with separate parse-failure vs missing-required-field
    counts, while a clean shard reports zero quarantined rows."""
    from optbinning_spark.sources.corpus import (
        quarantine_metrics,
        read_jsonl_corpus,
    )

    raw = tmp_path / "in"
    raw.mkdir()
    (raw / "good.jsonl").write_text("\n".join([
        '{"doc_id": 1, "text": "alpha", "lang": "en", "source": "a"}',
        '{"doc_id": 2, "text": "beta", "lang": "en", "source": "a"}',
        '{"doc_id": 3, "text": "gamma", "lang": "en", "source": "a"}',
    ]))
    (raw / "bad.jsonl").write_text("\n".join([
        '{"doc_id": 4, "text": "delta", "lang": "en", "source": "b"}',
        "{{{ truncated garbage",
        "not json either",
        '{"doc_id": 5, "lang": "fr", "source": "b"}',   # missing text
        '{"text": "orphan", "lang": "fr", "source": "b"}',  # missing id
    ]))
    m = {r["file"].rsplit("/", 1)[-1].split("?")[0]: r
         for r in quarantine_metrics(
             read_jsonl_corpus(spark, str(raw))).collect()}
    assert set(m) == {"good.jsonl", "bad.jsonl"}
    good, bad = m["good.jsonl"], m["bad.jsonl"]
    assert (good["rows"], good["corrupt_rows"],
            good["missing_field_rows"], good["quarantined_rows"]) == \
        (3, 0, 0, 0)
    assert (bad["rows"], bad["corrupt_rows"],
            bad["missing_field_rows"], bad["quarantined_rows"]) == \
        (5, 2, 2, 4)


@pytest.mark.full
def test_data_pipeline_example_runs():
    """The end-to-end example (VERDICT r7 ask #7) runs at sf0.01 and
    prints the stage-by-stage row/token audit: every curation stage
    present, docs monotone non-increasing, tokens accounted.

    -m full since r16 (suite wall-clock ask): the 125 s cost is fixed
    stage overhead (measured 127 s even at sf0.001), every stage it
    chains is individually oracle-checked and unit-tested, and the
    same import/integration surface stays default-covered by the
    quickstart / streaming_pipeline / corpus_refresh example tests."""
    import re
    import subprocess
    import sys as _sys

    proc = subprocess.run(
        [_sys.executable, "examples/data_pipeline.py",
         "/root/testdata/sf0.01"],
        cwd="/root/repo", capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    stages = ["raw", "pii_redacted", "paragraph_dedup", "quality_gates",
              "nb_quality_filter", "near_dup_dedup", "dsir_selected",
              "train_split"]
    rows = {}
    for s in stages:
        m = re.search(rf"^{s}\s+(\d+)\s+(\d+)", out, re.M)
        assert m, f"audit row missing for stage {s}:\n{out[-2000:]}"
        rows[s] = (int(m.group(1)), int(m.group(2)))
    docs = [rows[s][0] for s in stages]
    toks = [rows[s][1] for s in stages]
    assert docs == sorted(docs, reverse=True)  # stages only remove docs
    assert toks == sorted(toks, reverse=True)
    assert rows["raw"][0] == 500
    assert "bpe tokens packed:" in out
    assert "manifest validated: True" in out


def test_corpus_refresh_example_runs():
    """The snapshot-refresh example runs at sf0.01: three snapshots
    replayed against a persisted band index, per-round classification
    printed, and the final keep count conserved."""
    import re
    import subprocess
    import sys as _sys

    proc = subprocess.run(
        [_sys.executable, "examples/corpus_refresh.py",
         "/root/testdata/sf0.01"],
        cwd="/root/repo", capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    assert "round 0: bootstrap" in out
    for rnd in (1, 2):
        assert re.search(
            rf"^round {rnd}: new=\d+ dup_vs_history=\d+ "
            rf"dup_within_batch=\d+ kept=\d+ index_rows=\d+", out, re.M), \
            out[-2000:]
    m = re.search(r"^REFRESH_OK (\d+) (\d+)", out, re.M)
    assert m, out[-2000:]
    kept, total = int(m.group(1)), int(m.group(2))
    assert 0 < kept <= total == 500
    # the streaming tail (incremental_lsh_dedup_sink) ran and kept a
    # plausible count (same corpus, full-index policy)
    ms = re.search(r"^STREAM_REFRESH_OK (\d+)", out, re.M)
    assert ms, out[-2000:]
    assert 0 < int(ms.group(1)) <= total


def test_organic_generator_deterministic():
    """tools/gen_sf1_organic shards are seed-deterministic: the same
    (shard, seed) yields byte-identical content — the property the
    cached _READY stamp and cross-round slope comparisons rely on."""
    import sys

    import numpy as np

    sys.path.insert(0, "/root/repo/tools")
    from gen_sf1_organic import (
        _documents_shard,
        _viral_docs,
        _vocab,
        _zipf_p,
    )

    vocab = _vocab(1000)
    zp = _zipf_p(1000, 1.2)
    viral = _viral_docs(np.random.RandomState(42), vocab, zp)
    a = _documents_shard(3, 42, 10, 0.1, vocab, zp, viral, n_docs=200)
    viral2 = _viral_docs(np.random.RandomState(42), vocab, zp)
    b = _documents_shard(3, 42, 10, 0.1, vocab, zp, viral2, n_docs=200)
    assert a.equals(b)
    c = _documents_shard(4, 42, 10, 0.1, vocab, zp, viral, n_docs=200)
    assert not a.column("text").equals(c.column("text"))


def test_paragraph_dedup(spark):
    """Paragraph-level dedup: a corpus-shared paragraph survives only
    at its minimum (doc, position); docs reassemble in order;
    keep_first=False removes repeated paragraphs everywhere."""
    from optbinning_spark.pipeline.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [(0, "intro text\n\nSHARED DISCLAIMER\n\nbody zero"),
         (1, "other intro\n\nSHARED DISCLAIMER\n\nbody one"),
         (2, "SHARED DISCLAIMER"),
         (3, "all original content")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    assert got[0]["text"] == "intro text\n\nSHARED DISCLAIMER\n\nbody zero"
    assert got[0]["n_paragraphs"] == 3 and got[0]["n_kept"] == 3
    assert got[1]["text"] == "other intro\n\nbody one"
    assert got[1]["n_kept"] == 2
    assert got[2]["text"] == "" and got[2]["n_kept"] == 0
    assert got[3]["text"] == "all original content"
    strict = {r["doc_id"]: r for r in
              paragraph_dedup(docs, keep_first=False).collect()}
    assert strict[0]["text"] == "intro text\n\nbody zero"
    assert "SHARED" not in strict[0]["text"]


def test_cluster_balanced_sample(spark):
    """Topic mixture is preserved per cluster (each cluster keeps
    ~fraction of its members, not fraction of the global corpus), the
    gate is deterministic, and per-cluster dict budgets apply."""
    from optbinning_spark.pipeline.similarity import (
        cluster_balanced_sample,
        pinned_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = pinned_centroids(8, 64)
    kept = cluster_balanced_sample(emb, 0.5, centroids=cents)
    base = cluster_balanced_sample(emb, 1.0, centroids=cents)
    n_kept = {r["cluster_id"]: r["count"] for r in
              kept.groupBy("cluster_id").count().collect()}
    n_all = {r["cluster_id"]: r["count"] for r in
             base.groupBy("cluster_id").count().collect()}
    assert set(n_kept) == set(n_all)
    for c, n in n_all.items():
        if n >= 50:  # binomial noise bound only meaningful at size
            rate = n_kept[c] / n
            assert 0.35 < rate < 0.65, (c, rate, n)
    # deterministic: same ids on re-run over a repartitioned input
    again = cluster_balanced_sample(emb.repartition(7), 0.5,
                                    centroids=cents)
    assert (sorted(r["vec_id"] for r in kept.collect())
            == sorted(r["vec_id"] for r in again.collect()))
    # dict budgets: silence one cluster entirely; unlisted clusters
    # keep everything (default_fraction=1.0 — a dict targets only the
    # clusters it names)
    some = sorted(n_all)[:2]
    custom = cluster_balanced_sample(
        emb, {some[0]: 0.0, some[1]: 0.5}, centroids=cents)
    got = {r["cluster_id"]: r["count"] for r in
           custom.groupBy("cluster_id").count().collect()}
    assert some[0] not in got
    assert got.get(some[1], 0) < n_all[some[1]]
    for c in n_all:
        if c not in (some[0], some[1]):
            assert got.get(c) == n_all[c], c
    # explicit default_fraction still available for drop-by-default
    strict = cluster_balanced_sample(
        emb, {some[1]: 1.0}, centroids=cents, default_fraction=0.0)
    sgot = {r["cluster_id"] for r in strict.select("cluster_id")
            .distinct().collect()}
    assert sgot == {some[1]}


def test_streaming_pipeline_example_runs():
    """The streaming curation example: 3 JSONL micro-batches through
    PII redaction + Gopher gate + the offline-trained NB model +
    cross-batch exact dedup; the example itself asserts zero spam /
    zero duplicate hashes / zero unredacted emails in the sink."""
    import re
    import subprocess
    import sys as _sys

    proc = subprocess.run(
        [_sys.executable, "examples/streaming_pipeline.py"],
        cwd="/root/repo", capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, proc.stderr[-2000:]
    m = re.search(r"ingested (\d+) docs.*-> (\d+) curated", proc.stdout)
    assert m, proc.stdout[-1000:]
    assert int(m.group(2)) > 0
    assert "spam passing gate: 0" in proc.stdout
    assert "duplicate content hashes: 0" in proc.stdout
    assert "unredacted emails: 0" in proc.stdout


def test_kmeans_refine_matches_numpy_and_improves(spark):
    """One distributed Lloyd iteration == the numpy replication
    (rounded-dot argmax, fixed-point means) exactly; refinement
    raises the spherical k-means objective; an empty cluster keeps
    its previous centroid; integer reduction makes the result
    partition-invariant."""
    import numpy as np

    from optbinning_spark.pipeline.similarity import (
        kmeans_refine,
        pinned_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    X = np.array([r["embedding"] for r in
                  emb.select("embedding").collect()], dtype=float)
    cents = pinned_centroids(4, 64)
    got = kmeans_refine(emb, cents, n_iters=1, spherical=False)

    C = np.array(cents)
    assign = np.argmax(np.round(X @ C.T, 6), axis=1)
    want = []
    for c in range(4):
        m = X[assign == c]
        if len(m) == 0:
            want.append(list(C[c]))
        else:
            q = np.round(m * 1e6).astype(np.int64).sum(axis=0)
            want.append(list(q / (1e6 * len(m))))
    assert got == want

    # spherical refinement raises the mean best-cosine objective
    ref = kmeans_refine(emb, cents, n_iters=2, spherical=True)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    before = np.max(Xn @ np.array(
        [c / np.linalg.norm(c) for c in C]).T, axis=1).mean()
    after = np.max(Xn @ np.array(ref).T, axis=1).mean()
    assert after > before

    # partition invariance (exact, not approximate)
    again = kmeans_refine(emb.repartition(13), cents, n_iters=1,
                          spherical=False)
    assert again == got

    # empty cluster keeps its previous centroid — DETERMINISTIC
    # synthetic case: all vectors sit on +e0, centroid 2 points the
    # opposite way and can never win the argmax
    synth = spark.createDataFrame(
        [(i, [1.0] + [0.0] * 63) for i in range(5)],
        "vec_id long, embedding array<double>")
    cents2 = [[1.0] + [0.0] * 63, [-1.0] + [0.0] * 63]
    out = kmeans_refine(synth, cents2, n_iters=1, spherical=False)
    assert out[0] == [1.0] + [0.0] * 63   # refined onto the data
    assert out[1] == cents2[1]            # empty: previous kept


def test_refined_quantizer_plumbs_and_preserves_exhaustive_probe(spark):
    """refine_iters plumbs through the quantizer consumers: IVF with a
    corpus-refined quantizer still equals brute force at exhaustive
    probe (correct for ANY centroids), the refined quantizer raises
    (or at least never lowers) the corpus-wide assignment objective,
    and semantic_dedup runs end-to-end with refinement on."""
    import numpy as np

    from optbinning_spark.pipeline.similarity import (
        brute_force_topk,
        ivf_topk,
        semantic_dedup,
        train_ivf_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = (emb.filter("vec_id < 3")
               .withColumnRenamed("vec_id", "query_id"))
    got = ivf_topk(emb, queries, k=3, n_centroids=4, n_probe=4,
                   refine_iters=1)
    want = brute_force_topk(emb, queries, k=3)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect()))

    X = np.array([r["embedding"] for r in
                  emb.select("embedding").collect()], dtype=float)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    base = train_ivf_centroids(emb, 4)
    ref = train_ivf_centroids(emb, 4, refine_iters=2)
    obj = lambda C: np.max(Xn @ np.asarray(C).T, axis=1).mean()
    assert obj(ref) >= obj(base) - 1e-9

    out = semantic_dedup(emb, threshold=0.4, n_centroids=4,
                         refine_iters=1)
    assert out.count() == emb.count()


def test_pack_token_count_col_path_equals_bpe_path(spark):
    """pack_sequences(token_count_col=size(ids)) — the sink's
    single-tokenize path — produces the identical packing plan to
    token_counter='bpe' (counts agree by construction: the id array
    has exactly one id per BPE token, UNK included)."""
    from pyspark.sql import functions as F

    from optbinning_spark.pipeline.bpe import bpe_token_ids_col
    from optbinning_spark.pipeline.text import pack_sequences

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    a = pack_sequences(docs, 64, shard_col="lang",
                       token_counter="bpe")
    with_ids = docs.withColumn(
        "__n_tok", F.size(bpe_token_ids_col(F.col("text"))))
    b = pack_sequences(with_ids, 64, shard_col="lang",
                       token_count_col="__n_tok")
    assert sorted(map(tuple, a.collect())) == sorted(
        map(tuple, b.collect()))


def test_quickstart_example_runs():
    """The reference-README-flow walkthrough stays runnable."""
    import subprocess
    import sys as _sys

    proc = subprocess.run(
        [_sys.executable, "examples/quickstart.py"],
        cwd="/root/repo", capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "rows" in proc.stdout or len(proc.stdout) > 0


def test_curriculum_shards_invariants(spark):
    """Difficulty ordering across shards (up to quantile-tie rows),
    dense per-shard positions, determinism under repartition,
    descending flip, and the NULL-score guard."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from optbinning_spark.pipeline.sampling import curriculum_shards
    from optbinning_spark.pipeline.text import token_count_expr

    docs = (spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
            .select("doc_id",
                    token_count_expr(F.col("text")).alias("score")))
    out = curriculum_shards(docs, "score", n_shards=4)
    rows = out.collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    # cross-shard ordering: every score in shard s <= every score in
    # shard s+1 (ties may straddle a cut only via >, so max<=min holds)
    for s in range(3):
        assert (max(r["score"] for r in by_shard[s])
                <= min(r["score"] for r in by_shard[s + 1]))
    # dense positions
    for s, rs in by_shard.items():
        assert sorted(r["pos"] for r in rs) == list(range(len(rs)))
    # determinism
    again = curriculum_shards(docs.repartition(7), "score", n_shards=4)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, rows))
    # descending flips the shard axis, not the membership
    desc = curriculum_shards(docs, "score", n_shards=4, descending=True)
    dmap = {r["doc_id"]: r["shard"] for r in desc.collect()}
    for r in rows:
        assert dmap[r["doc_id"]] == 3 - r["shard"]
    # NULL scores refuse loudly
    with _pytest.raises(ValueError, match="NULL"):
        curriculum_shards(
            docs.withColumn("score", F.when(F.col("doc_id") == 0, None)
                            .otherwise(F.col("score"))),
            "score", n_shards=4)


def test_degenerate_inputs_clear_behavior(spark, docs):
    """Empty corpora/targets are real refresh-pipeline states (a
    filter that matched nothing); every op must either produce the
    empty/identity result or raise a CLEAR error — never a cryptic
    numpy AxisError from deep inside quantizer training."""
    import pytest
    from pyspark.sql import functions as F

    from optbinning_spark.pipeline.dedup import ngram_contamination
    from optbinning_spark.pipeline.sampling import (dsir_gumbel_sample,
                                                    dsir_log_weights)
    from optbinning_spark.pipeline.similarity import (pinned_centroids,
                                                      semantic_dedup,
                                                      train_ivf_centroids)

    empty = docs.filter(F.lit(False))
    # empty reference set -> nothing is contaminated, corpus passes
    out = ngram_contamination(docs, empty)
    assert out.filter(F.col("contaminated")).count() == 0
    # empty target corpus -> smoothing-only weights, one per raw doc
    assert dsir_log_weights(docs, empty).count() == docs.count()
    # k > n -> all n rows, not an error
    w = docs.select("doc_id", F.lit(1.0).alias("log_weight")).limit(3)
    assert dsir_gumbel_sample(w, 50).count() == 3
    # assignment-only semdedup on an empty frame with explicit
    # centroids -> empty result
    eemb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").filter(F.lit(False))
    assert semantic_dedup(
        eemb, 0.4, centroids=pinned_centroids(4, 64)).count() == 0
    # training a quantizer on an empty corpus must raise the clear
    # ValueError, not numpy AxisError
    with pytest.raises(ValueError, match="empty corpus"):
        train_ivf_centroids(eemb, 4)


def test_pq_encode_and_topk(spark):
    """Product quantization: codes are valid 1-based indices, ADC
    top-k is deterministic, IVF-PQ with exhaustive probing equals
    plain PQ exactly, and recall against the exact-dot ranking
    improves monotonically with code bits (m*log2 k) — the Jegou
    et al. 2011 property that holds even on unstructured vectors."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from optbinning_spark.pipeline.similarity import (dot_expr,
                                                      pinned_centroids,
                                                      pinned_pq_codebooks,
                                                      pq_encode, pq_topk,
                                                      train_pq_codebooks)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 5).withColumnRenamed(
        "vec_id", "query_id")
    cb = pinned_pq_codebooks(4, 8, 64)

    codes = pq_encode(emb, cb)
    r = codes.select(F.min(F.array_min("codes")).alias("lo"),
                     F.max(F.array_max("codes")).alias("hi"),
                     F.min(F.size("codes")).alias("m")).first()
    assert r["lo"] >= 1 and r["hi"] <= 8 and r["m"] == 4

    t1 = sorted(map(tuple, pq_topk(emb, qs, cb, k=3).collect()))
    t2 = sorted(map(tuple, pq_topk(emb, qs, cb, k=3).collect()))
    assert t1 == t2  # deterministic
    # IVF-PQ with n_probe == n_centroids is exhaustive -> identical
    t3 = sorted(map(tuple, pq_topk(
        emb, qs, cb, k=3, centroids=pinned_centroids(4, 64),
        n_probe=4).collect()))
    assert t1 == t3

    # exact-dot baseline for recall
    e = emb.select(F.col("vec_id").alias("nbr_id"),
                   F.col("embedding").cast("array<double>").alias("__e"))
    q = qs.select("query_id",
                  F.col("embedding").cast("array<double>").alias("__q"))
    w = Window.partitionBy("query_id").orderBy(F.desc("d"), F.asc("nbr_id"))
    bf = (e.crossJoin(F.broadcast(q)).filter("nbr_id != query_id")
          .select("query_id", "nbr_id",
                  F.round(dot_expr(F.col("__e"), F.col("__q")), 6)
                  .alias("d"))
          .withColumn("r", F.row_number().over(w)).filter("r <= 10"))
    bset = {(x["query_id"], x["nbr_id"]) for x in bf.collect()}

    def recall(m, k):
        t = pq_topk(emb, qs, train_pq_codebooks(emb, m=m, k=k), k=10)
        s = {(x["query_id"], x["nbr_id"]) for x in t.collect()}
        return len(s & bset) / len(bset)

    r_small, r_big = recall(4, 8), recall(16, 16)
    assert r_big > r_small, (r_small, r_big)
    assert r_big >= 0.4, r_big  # 64 code bits on 64-dim corpus


def test_pq_validation_errors(spark):
    import pytest
    from pyspark.sql import functions as F

    from optbinning_spark.pipeline.similarity import (pinned_pq_codebooks,
                                                      train_pq_codebooks)

    with pytest.raises(ValueError, match="not divisible"):
        pinned_pq_codebooks(5, 8, 64)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="empty corpus"):
        train_pq_codebooks(emb.filter(F.lit(False)), m=4)
    with pytest.raises(ValueError, match="not divisible"):
        train_pq_codebooks(emb, m=5)
