"""BPE expression tokenizer: spec properties, three-way engine parity
(Spark expression / Python reference / DuckDB SQL), UDF parity, and
the chunk/pack token_counter="bpe" integration (VERDICT r7 ask #1)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from optbinning_spark.pipeline.bpe import (
    MINI_MERGES,
    SEP,
    bpe_apply_python,
    bpe_token_count_col,
    bpe_token_count_pandas_udf,
    bpe_token_count_sql,
    bpe_tokens_col,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_two_pass_replace_reaches_fixed_point():
    """The expression path applies each merge as TWO non-overlapping
    replaces; the reference loops to a fixed point. Exhaustive check
    on all <=9-symbol sequences over {a, b} x all 4 merge pairs, plus
    multi-char-symbol randoms — two passes must equal the fixed
    point (the property the whole SQL replay rests on)."""
    def two_pass(s, x, y):
        p, r = SEP + x + SEP + y + SEP, SEP + x + y + SEP
        return s.replace(p, r).replace(p, r)

    def fixed(s, x, y):
        p, r = SEP + x + SEP + y + SEP, SEP + x + y + SEP
        while p in s:
            s = s.replace(p, r)
        return s

    for n in range(1, 10):
        for syms in itertools.product("ab", repeat=n):
            s = SEP + SEP.join(syms) + SEP
            for x, y in itertools.product("ab", repeat=2):
                assert two_pass(s, x, y) == fixed(s, x, y), (syms, x, y)
    import random

    rnd = random.Random(8)
    alpha = ["a", "b", "ab", "ba", "aa"]
    for _ in range(3000):
        syms = [rnd.choice(alpha) for _ in range(rnd.randint(1, 12))]
        s = SEP + SEP.join(syms) + SEP
        x, y = rnd.choice(alpha), rnd.choice(alpha)
        assert two_pass(s, x, y) == fixed(s, x, y)


def test_ascii_pretokenizer_matches_spark_regex(spark):
    """The driver-side ASCII pre-tokenizer regex must agree with the
    JVM/RE2 \\p{L} pattern on the corpus (it's the bridge between the
    Python reference and the expression path)."""
    from optbinning_spark.pipeline.bpe import ASCII_PRETOKEN_RE
    from optbinning_spark.pipeline.text import bpe_tokens_expr

    rows = (spark.read.parquet(DOCS).limit(50)
            .select("text", bpe_tokens_expr(F.col("text")).alias("toks"))
            .collect())
    for r in rows:
        assert ASCII_PRETOKEN_RE.findall(r["text"]) == list(r["toks"])


def test_expression_matches_python_reference(spark):
    """Spark expression count == driver reference on every sf0.001
    doc, and the token ARRAYS agree too."""
    rows = (
        spark.read.parquet(DOCS)
        .select("doc_id", "text",
                bpe_token_count_col(F.col("text")).alias("n"),
                bpe_tokens_col(F.col("text")).alias("toks"))
        .collect()
    )
    assert len(rows) == 500
    for r in rows:
        ref = bpe_apply_python(r["text"])
        assert list(r["toks"]) == ref, r["doc_id"]
        assert r["n"] == len(ref)


def test_duckdb_sql_replays_expression(spark):
    """bpe_token_count_sql is the oracle-side replay: byte-identical
    counts on the full sf0.001 corpus."""
    import duckdb

    got = {r["doc_id"]: r["n"] for r in spark.read.parquet(DOCS).select(
        "doc_id", bpe_token_count_col(F.col("text")).alias("n")).collect()}
    sql = (f"select doc_id, {bpe_token_count_sql('text')} as n "
           f"from read_parquet('{DOCS}')")
    for doc_id, n in duckdb.sql(sql).fetchall():
        assert got[doc_id] == n


def test_pandas_udf_matches_expression(spark):
    """The Arrow-batched big-vocab path implements the same spec."""
    udf = bpe_token_count_pandas_udf()
    rows = (
        spark.read.parquet(DOCS)
        .select(bpe_token_count_col(F.col("text")).alias("a"),
                udf("text").alias("b"))
        .collect()
    )
    assert all(r["a"] == r["b"] for r in rows)


def test_token_ids_udf_at_32k_merges(spark):
    """Production-vocabulary scale in-suite: a 32,768-merge list
    (mechanically generated, GPT-2-format round-tripped through
    load_merges_txt) runs through bpe_token_ids_pandas_udf and matches
    the driver-side reference ids exactly. The organic-corpus
    throughput/memo evidence lives in tools/run_production_bpe.py +
    SCALING.md; this pins that the rank-indexed kernel, vocab build,
    and Arrow plumbing all hold at real vocabulary size."""
    import string

    from optbinning_spark.pipeline.bpe import (bpe_apply_python, bpe_vocab,
                                               bpe_token_ids_pandas_udf,
                                               load_merges_txt)

    alph = list(string.ascii_lowercase + string.digits)
    merges = [(a, b) for a in alph for b in alph]
    two = [a + b for a, b in merges]
    merges += [(ab, c) for ab in two for c in alph][: 32768 - len(merges)]
    assert len(merges) == 32768
    # round-trip the GPT-2 text format (space -> Ġ) like a real vocab
    lines = ["#version: test"] + [
        f"{a.replace(' ', chr(0x120))} {b.replace(' ', chr(0x120))}"
        for a, b in merges]
    merges = load_merges_txt(lines)
    assert len(merges) == 32768

    texts = ["the quick brown fox jumps over 12345 lazy dogs",
             "aaa bbb ab abc abcd ab12 zz99 zzz",
             None, "", "mixed CASE stays CASE x0x0x0"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id: long, text: string")
    udf = bpe_token_ids_pandas_udf(merges)
    got = {r["doc_id"]: r["ids"] for r in
           df.select("doc_id", udf(F.col("text")).alias("ids")).collect()}
    vocab = bpe_vocab(merges)
    for i, t in enumerate(texts):
        if t is None:
            assert got[i] is None
        else:
            ref = [vocab.get(s, 0) for s in bpe_apply_python(t, merges)]
            assert list(got[i]) == ref, (i, t)
    # the big list actually merges, including a rank-2 product:
    # ('a','a') then ('aa','a') collapse a 3-char run to ONE symbol
    assert bpe_apply_python("aaa", merges) == ["aaa"]


def test_merges_actually_merge():
    """Sanity: the pinned vocab compresses corpus-flavored text (BPE
    count strictly between char count and nowhere above pre-token
    char total) and multi-char tokens appear."""
    toks = bpe_apply_python("the window order column scan")
    assert " window" in toks and " order" in toks
    assert len(toks) < len("the window order column scan")


def test_chunk_documents_bpe_boundaries_shift(spark):
    """The r7 acceptance test: chunk boundaries under token_counter=
    'bpe' differ from whitespace counting on the same doc, chunk token
    counts are REAL BPE counts, and overlap=0 chunks concatenate back
    to the pre-tokenized text."""
    from optbinning_spark.pipeline.text import chunk_documents

    text = ("the window order column scan value part sort can bat "
            "in on up the window order column scan value part sort")
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")

    ws = chunk_documents(df, chunk_tokens=8, overlap=0).collect()
    bpe = chunk_documents(df, chunk_tokens=8, overlap=0,
                          token_counter="bpe").collect()
    # whitespace: 21 words -> 3 chunks; bpe: fewer tokens than chars
    # but different count than words -> different boundaries
    n_ws = sum(r["n_tokens"] for r in ws)
    n_bpe = sum(r["n_tokens"] for r in bpe)
    assert n_ws == len(text.split(" "))
    assert n_bpe == len(bpe_apply_python(text))
    assert n_bpe != n_ws
    assert [r["text"] for r in ws] != [r["text"] for r in bpe]
    # chunk 0 under bpe ends mid-"word" iff the 8th token boundary
    # does — and reconstruction is exact with zero overlap
    recon = "".join(r["text"] for r in
                    sorted(bpe, key=lambda r: r["chunk_id"]))
    assert recon == "".join(bpe_apply_python(text))
    # overlap honored in bpe mode too
    bpe_ov = chunk_documents(df, chunk_tokens=8, overlap=3,
                             token_counter="bpe").collect()
    toks = bpe_apply_python(text)
    first = sorted(bpe_ov, key=lambda r: r["chunk_id"])[0]
    second = sorted(bpe_ov, key=lambda r: r["chunk_id"])[1]
    assert first["text"] == "".join(toks[:8])
    assert second["text"] == "".join(toks[5:13])


def test_pack_sequences_bpe(spark):
    """Packing in BPE units: per-doc packed token totals equal the
    doc's BPE count, sequences fill exactly, and the layout differs
    from whitespace packing on the same corpus."""
    from optbinning_spark.pipeline.text import pack_sequences

    docs = spark.read.parquet(DOCS).select("doc_id", "text").limit(40)
    packed = pack_sequences(docs, seq_tokens=64,
                            token_counter="bpe").collect()
    counts = {r["doc_id"]: r["n"] for r in docs.select(
        "doc_id", bpe_token_count_col(F.col("text")).alias("n")).collect()}
    per_doc: dict = {}
    per_seq: dict = {}
    for r in packed:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["n_tokens"]
        per_seq[r["seq_id"]] = per_seq.get(r["seq_id"], 0) + r["n_tokens"]
    assert per_doc == {k: v for k, v in counts.items() if v > 0}
    full = [s for s in per_seq if s < max(per_seq)]
    assert all(per_seq[s] == 64 for s in full)
    ws = pack_sequences(docs, seq_tokens=64).collect()
    assert sorted((r["seq_id"], r["doc_id"], r["n_tokens"]) for r in ws) \
        != sorted((r["seq_id"], r["doc_id"], r["n_tokens"]) for r in packed)


def test_trainer_deterministic():
    """train_bpe_merges is RNG-free and dict-order-independent."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from train_bpe_vocab import train_bpe_merges

    texts = ["the cat sat on the mat", "the bat sat", "a cat ran up"]
    a = train_bpe_merges(texts, 10)
    b = train_bpe_merges(list(reversed(texts)), 10)
    # stops early when no pair reaches count 2 — that's part of spec
    assert a == b and 0 < len(a) <= 10


def _train_bpe_rescan(texts, num_merges):
    """Independent full-rescan BPE trainer with the SAME selection
    rule as the incremental trainer (max count, ties to the
    lexicographically smallest pair): recount every pair from scratch
    each round. The parity oracle for
    train_bpe_vocab.train_bpe_merges."""
    import sys
    from collections import Counter

    sys.path.insert(0, "/root/repo/tools")
    from train_bpe_vocab import ASCII_PRETOKEN_RE, _merge_pass

    word_freq = Counter()
    for t in texts:
        if t:
            word_freq.update(ASCII_PRETOKEN_RE.findall(t))
    words = {w: list(w) for w in word_freq}
    merges = []
    while len(merges) < num_merges:
        pc = Counter()
        for w, syms in words.items():
            f = word_freq[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        for w in words:
            words[w] = _merge_pass(words[w], a, b)
    return merges


def test_trainer_incremental_matches_rescan():
    """The incremental heap trainer must be merge-for-merge identical
    to a full-rescan trainer with the same selection rule, on
    randomized corpora engineered to hit count ties (small alphabets,
    repeated words) — the parity evidence the trainer docstring
    cites."""
    import random
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from train_bpe_vocab import train_bpe_merges

    rnd = random.Random(20260815)
    vocab_pool = ["aa", "ab", "ba", "abc", "the", "cat", "cab", "bac",
                  "a", "b", "c", "12", "1", "!?", "it's"]
    for trial in range(20):
        n_words = rnd.randint(3, 40)
        texts = [
            " ".join(rnd.choice(vocab_pool) for _ in range(rnd.randint(1, 12)))
            for _ in range(n_words)
        ]
        k = rnd.randint(1, 60)
        inc = train_bpe_merges(texts, k)
        res = _train_bpe_rescan(texts, k)
        assert inc == res, (trial, k, texts[:3], inc, res)


def test_fast_kernel_matches_sequential_reference():
    """_merge_pretoken_fast (rank-indexed, vocab-size-independent)
    must equal bpe_apply_python (sequential full-list scan) per
    pre-token — on the pinned vocab, on randomized merge lists, and on
    an adversarial hand-built list where a later merge creates a pair
    with an EARLIER rank (which the sequential spec skips; trained
    lists cannot produce this)."""
    import random

    from optbinning_spark.pipeline.bpe import (
        _merge_pretoken_fast,
        _merge_ranks,
    )

    def seq_ref(tok, merges):
        s = SEP + SEP.join(tok) + SEP
        for a, b in merges:
            pat = SEP + a + SEP + b + SEP
            rep = SEP + a + b + SEP
            while pat in s:
                s = s.replace(pat, rep)
        return [x for x in s.split(SEP) if x]

    rnd = random.Random(99)
    # randomized lists over a tiny alphabet maximize pair collisions
    for trial in range(300):
        alpha = "ab" if trial % 2 else "abc"
        merges = []
        symbols = list(alpha)
        for _ in range(rnd.randint(1, 10)):
            a, b = rnd.choice(symbols), rnd.choice(symbols)
            merges.append((a, b))
            symbols.append(a + b)
        ranks = _merge_ranks(merges)
        for _ in range(20):
            tok = "".join(rnd.choice(alpha)
                          for _ in range(rnd.randint(1, 12)))
            assert _merge_pretoken_fast(tok, merges, ranks) == \
                seq_ref(tok, merges), (trial, merges, tok)
    # adversarial: rank 0 = (ab, c) needs "ab" which only rank 1
    # creates — sequential never applies it; duplicated pair at the
    # tail is a no-op
    adv = [("ab", "c"), ("a", "b"), ("a", "b")]
    ranks = _merge_ranks(adv)
    for tok in ("abc", "ababc", "cab", "aabbc"):
        assert _merge_pretoken_fast(tok, adv, ranks) == seq_ref(tok, adv)
    # pinned vocab on corpus pre-tokens: kernel == module oracle
    import duckdb

    texts = [r[0] for r in duckdb.sql(
        f"select text from read_parquet('{DOCS}') limit 60").fetchall()]
    from optbinning_spark.pipeline.bpe import ASCII_PRETOKEN_RE
    ranks = _merge_ranks(MINI_MERGES)
    for t in texts:
        fast = []
        for tok in ASCII_PRETOKEN_RE.findall(t.replace(SEP, "")):
            fast.extend(_merge_pretoken_fast(tok, MINI_MERGES, ranks))
        assert fast == bpe_apply_python(t)


def test_token_ids_udf_matches_expression(spark):
    """bpe_token_ids_pandas_udf (production Arrow path) == the
    expression path bpe_token_ids_col, element-for-element, on the
    pinned vocab over the corpus + NULL handling."""
    from optbinning_spark.pipeline.bpe import (
        bpe_token_ids_col,
        bpe_token_ids_pandas_udf,
    )

    df = spark.read.parquet(DOCS).limit(120).select(
        "doc_id", "text").union(
        spark.createDataFrame([(99999, None)], "doc_id long, text string"))
    udf = bpe_token_ids_pandas_udf()
    rows = df.select(
        bpe_token_ids_col(F.col("text")).alias("expr_ids"),
        udf("text").alias("udf_ids"),
    ).collect()
    assert len(rows) == 121
    for r in rows:
        assert r.expr_ids == r.udf_ids


def test_load_merges_txt(tmp_path):
    """GPT-2 merges.txt round-trip: Ġ-marked pairs load back into the
    module's merge shape, header and count-cap honored."""
    from optbinning_spark.pipeline.bpe import load_merges_txt

    lines = ["#version: 0.2"] + [
        f"{a.replace(' ', 'Ġ')} {b.replace(' ', 'Ġ')}"
        for a, b in MINI_MERGES]
    p = tmp_path / "merges.txt"
    p.write_text("\n".join(lines) + "\n")
    assert load_merges_txt(str(p)) == MINI_MERGES
    assert load_merges_txt(lines, max_merges=5) == MINI_MERGES[:5]
    # loaded merges tokenize identically to the pinned literal
    text = "the window order column scan"
    assert bpe_apply_python(text, load_merges_txt(lines)) == \
        bpe_apply_python(text)
    with pytest.raises(ValueError):
        load_merges_txt(["a b c"])


def test_token_ids_roundtrip(spark):
    """Token ids: stable (rank-derived), length-preserving (OOV maps
    to UNK=0, never dropped), and invertible for in-vocab tokens."""
    from optbinning_spark.pipeline.bpe import (
        bpe_token_ids_col,
        bpe_vocab,
    )

    v = bpe_vocab()
    assert 0 not in v.values()               # 0 reserved for UNK
    assert len(set(v.values())) == len(v)    # ids unique
    inv = {i: s for s, i in v.items()}
    df = spark.createDataFrame(
        [(1, "the window order"), (2, "w00042 café")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in df.select(
        "doc_id",
        bpe_tokens_col(F.col("text")).alias("toks"),
        bpe_token_ids_col(F.col("text")).alias("ids")).collect()}
    for r in rows.values():
        assert len(r["toks"]) == len(r["ids"])
        for tok, i in zip(r["toks"], r["ids"]):
            if i != 0:
                assert inv[i] == tok
    # 'é' is outside the ASCII base vocab -> its symbol maps to UNK
    assert 0 in rows[2]["ids"]
    assert 0 not in rows[1]["ids"]


def test_fuzz_spark_vs_duckdb_unicode(spark):
    """Seeded cross-engine fuzz: 60 random strings mixing ASCII
    words, punctuation runs, accented letters, CJK, digits and odd
    whitespace — Spark (java.util.regex + replace) and DuckDB (RE2 +
    replace) must agree on the BPE count for every one. Guards the
    \\p{L}/\\p{N} class agreement and the separator encoding beyond
    the ASCII corpus the oracle runs on."""
    import random

    import duckdb

    rnd = random.Random(88)
    pieces = ["the", "window", "w00042", "naïve", "café", "über",
              "日本語", "データ", "42", "3.14", "...", "!!", "'s",
              "#tag", "a-b", "x", " ", "  ", "\t"]
    rows = []
    for i in range(60):
        n = rnd.randint(1, 12)
        rows.append((i, "".join(rnd.choice(pieces) for _ in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", bpe_token_count_col(F.col("text")).alias("n")).collect()}
    con = duckdb.connect()
    con.execute("create table t(doc_id bigint, text varchar)")
    con.executemany("insert into t values (?, ?)", rows)
    sql = f"select doc_id, {bpe_token_count_sql('text')} as n from t"
    for doc_id, n in con.execute(sql).fetchall():
        assert got[doc_id] == n, (doc_id, got[doc_id], n,
                                  rows[doc_id][1])


def test_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "ab")], "doc_id long, text string")
    rows = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", bpe_token_count_col(F.col("text")).alias("n")).collect()}
    assert rows[1] is None and rows[2] == 0 and rows[3] >= 1

def test_memo_cap_eviction_preserves_ids(spark, monkeypatch):
    """The per-task memo bound (_MEMO_CAP epoch eviction) must be
    invisible to results: with a cap of 2, a high-entropy corpus
    (every pre-token distinct) still encodes identically to the
    uncapped reference."""
    from optbinning_spark.pipeline import bpe as B

    monkeypatch.setattr(B, "_MEMO_CAP", 2)
    texts = [f"tok{i}a unique{i}b shape{i}c" for i in range(30)]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id: long, text: string")
    udf = B.bpe_token_ids_pandas_udf()
    got = {r["doc_id"]: list(r["ids"]) for r in
           df.select("doc_id", udf(F.col("text")).alias("ids")).collect()}
    vocab = B.bpe_vocab()
    for i, t in enumerate(texts):
        ref = [vocab.get(s, 0) for s in B.bpe_apply_python(t)]
        assert got[i] == ref
