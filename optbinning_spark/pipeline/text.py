"""Text-analysis operators for large-scale training-data pipelines.

All operators are pure Spark column expressions (JVM-side, codegen,
no UDFs) so they run at 100 TB scan speed and are ANSI-SQL
oracle-checkable. Tokenization is whitespace-based to stay
deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "for", "on", "with",
]

# deterministic marker words per language for the heuristic language ID
LANG_MARKERS = {
    "en": ["the", "and", "of", "a"],
    "es": ["el", "la", "de", "y"],
    "fr": ["le", "la", "et", "les"],
    "de": ["der", "die", "und", "das"],
    "zh": ["de5", "shi4", "le5", "zai4"],
}


def tokens_expr(text: Column) -> Column:
    return F.split(text, " ")


def token_count_expr(text: Column) -> Column:
    return F.size(tokens_expr(text))


def distinct_token_count_expr(text: Column) -> Column:
    return F.size(F.array_distinct(tokens_expr(text)))


# GPT-2-style pre-tokenizer approximation: contractions, optional-space
# letter runs, optional-space digit runs, optional-space punctuation
# runs (whitespace itself is not a token). RE2-compatible so the same
# pattern runs verbatim in the DuckDB oracle.
BPE_TOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_tokens_expr(text: Column) -> Column:
    """Subword-ish tokens by the BPE pre-tokenizer regex."""
    return F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), F.lit(0))


def bpe_token_count_expr(text: Column) -> Column:
    return F.size(bpe_tokens_expr(text))


def avg_token_len_expr(text: Column) -> Column:
    toks = tokens_expr(text)
    total = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    ).cast("double")
    return total / F.size(toks)


def stopword_ratio_expr(text: Column, stopwords: list[str] | None = None) -> Column:
    toks = tokens_expr(text)
    sw = stopwords or DEFAULT_STOPWORDS
    n_sw = F.size(F.filter(toks, lambda t: t.isin(sw)))
    return n_sw.cast("double") / F.size(toks)


def type_token_ratio_expr(text: Column) -> Column:
    toks = tokens_expr(text)
    return F.size(F.array_distinct(toks)).cast("double") / F.size(toks)


def quality_score_expr(text: Column, stopwords: list[str] | None = None) -> Column:
    """Composite document-quality heuristic in [0, 1]: length band,
    lexical diversity, and stopword presence — the usual pretraining
    quality-filter features, as one deterministic expression."""
    n = token_count_expr(text).cast("double")
    length_score = F.least(n / F.lit(100.0), F.lit(1.0))
    ttr = type_token_ratio_expr(text)
    sw = stopword_ratio_expr(text, stopwords)
    sw_score = F.least(sw * F.lit(5.0), F.lit(1.0))
    return (length_score + ttr + sw_score) / F.lit(3.0)


def rolling_fingerprint_expr(text: Column, modulus: int = 2**31 - 1) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash of
    the token md5s — cheap content identity robust to formatting of a
    kind crc/md5-of-whole-text is not (token-wise)."""
    toks = tokens_expr(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (
            acc * F.lit(31)
            + F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
        )
        % F.lit(modulus),
    )


def lang_id_expr(text: Column, markers: dict[str, list[str]] | None = None) -> Column:
    """Heuristic language ID: pick the language whose marker-word set
    has the highest hit count in the document (ties broken by language
    code order). Deterministic, SQL-expressible."""
    markers = markers or LANG_MARKERS
    toks = tokens_expr(text)
    scores = [
        (lang, F.size(F.filter(toks, lambda t: t.isin(words))))
        for lang, words in sorted(markers.items())
    ]
    best = None
    best_score = None
    for lang, score in scores:
        if best is None:
            best, best_score = F.lit(lang), score
        else:
            cond = score > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, score).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("unknown"))


def document_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document feature table: the text-analysis operator surface."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count_expr(t).alias("n_tokens"),
        F.length(t).alias("n_chars"),
        F.round(avg_token_len_expr(t), 4).alias("avg_token_len"),
        F.round(stopword_ratio_expr(t), 6).alias("stopword_ratio"),
        F.round(type_token_ratio_expr(t), 6).alias("type_token_ratio"),
        F.round(quality_score_expr(t), 6).alias("quality_score"),
    )


def normalize_text_expr(
    text: Column,
    lowercase: bool = True,
    strip_punct: bool = True,
    collapse_ws: bool = True,
) -> Column:
    """Canonical text normalization for dedup pipelines — the standard
    pre-hashing step (lowercase, punctuation stripped to spaces,
    whitespace collapsed + trimmed) so near-identical docs that differ
    only in case/punctuation hash identically. Pure JVM expressions
    (regexp_replace/lower/trim) — map-only, RE2-compatible patterns,
    replayable in ANSI SQL for the oracle."""
    out = text
    if lowercase:
        out = F.lower(out)
    if strip_punct:
        out = F.regexp_replace(out, r"[^a-z0-9\s]" if lowercase
                               else r"[^A-Za-z0-9\s]", " ")
    if collapse_ws:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return out


# -- Gopher-style document quality gates ----------------------------------

def repetition_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_top2_fraction: float = 0.20,
    max_top3_fraction: float = 0.18,
    max_dup_word_fraction: float = 0.60,
) -> DataFrame:
    """Intra-document repetition gates (the Gopher repetition-removal
    family, word-level): fraction of words covered by the single most
    frequent 2-gram / 3-gram, and the duplicate-word fraction
    (1 - distinct/total). Heavily repetitive docs (boilerplate,
    degenerate generations) fail the ``keep`` conjunction.

    Physical strategy: one scan, ONE tagged explode emitting both
    n-gram sizes (struct(n, gram)), count per (doc, n, gram), max per
    (doc, n) folded to columns with conditional aggregates, joined
    back to the per-doc word stats. Shuffles only on the doc/gram
    keys — no per-doc quadratic expression work, so a 100k-word doc
    costs O(len) not O(len^2)."""
    from .dedup import shingles_from_words

    w = F.split(F.col(text_col), " ")

    # NB: single-arg closures from a factory — pyspark treats a 2-arg
    # transform lambda as (element, index), so `lambda g, n=n` would
    # silently tag grams with their POSITION instead of the size
    def _tagged(n: int):
        return F.transform(
            shingles_from_words(w, n),
            lambda g: F.struct(F.lit(n).alias("n"), g.alias("ng")))

    base = df.select(
        F.col(id_col),
        F.size(w).alias("__nw"),
        F.size(F.array_distinct(w)).alias("__ndw"),
        F.flatten(F.array(_tagged(2), _tagged(3))).alias("__grams"),
    )
    stats = base.select(id_col, "__nw", "__ndw")
    tops = (
        base.select(F.col(id_col), F.explode("__grams").alias("g"))
        .groupBy(id_col, "g.n", "g.ng")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.max(F.when(F.col("n") == 2, F.col("c"))).alias("__t2"),
            F.max(F.when(F.col("n") == 3, F.col("c"))).alias("__t3"),
        )
    )
    j = stats.join(tops, id_col, "left")
    top2 = (F.coalesce("__t2", F.lit(0)) * 2
            / F.greatest(F.col("__nw"), F.lit(1))).cast("double")
    top3 = (F.coalesce("__t3", F.lit(0)) * 3
            / F.greatest(F.col("__nw"), F.lit(1))).cast("double")
    dupw = (1.0 - F.col("__ndw")
            / F.greatest(F.col("__nw"), F.lit(1))).cast("double")
    flags = {
        "ok_top2gram": top2 <= max_top2_fraction,
        "ok_top3gram": top3 <= max_top3_fraction,
        "ok_dup_words": dupw <= max_dup_word_fraction,
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    return j.select(
        id_col,
        F.round(top2, 6).alias("top2gram_fraction"),
        F.round(top3, 6).alias("top3gram_fraction"),
        F.round(dupw, 6).alias("dup_word_fraction"),
        *[v.alias(k) for k, v in flags.items()],
        keep.alias("keep"),
    )

def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_avg_word_len: float = 3.0,
    max_avg_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher-style heuristic quality gates (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", appendix A1.1 rules) as one map-only
    projection: each rule is a named boolean column and ``keep`` is
    their conjunction, so a 100 TB corpus filter is a pure
    whole-stage-codegen scan with per-rule observability (aggregate
    the booleans to see which rule rejects how much).

    Rules: word count in [min_words, max_words]; mean word length in
    [min_avg_word_len, max_avg_word_len]; symbol-to-word ratio
    ('#' or ellipsis) <= max_symbol_word_ratio; fraction of words
    containing an alphabetic character >= min_alpha_word_ratio; at
    least ``min_stopword_hits`` distinct common stopwords present."""
    t = F.col(text_col)
    words = tokens_expr(t)  # single-space tokens, like every text op
    n_words = F.size(words)
    avg_len = avg_token_len_expr(t)
    n_symbols = (
        F.size(F.split(t, "#")) - 1
        + F.size(F.split(t, r"\.\.\.")) - 1
    )
    n_alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    sw_hits = F.size(F.filter(
        F.array(*[F.lit(s) for s in DEFAULT_STOPWORDS]),
        lambda s: F.array_contains(words, s)))
    flags = {
        "ok_word_count": (n_words >= min_words) & (n_words <= max_words),
        "ok_avg_word_len": (avg_len >= min_avg_word_len)
                           & (avg_len <= max_avg_word_len),
        "ok_symbol_ratio": n_symbols
                           <= max_symbol_word_ratio * n_words,
        "ok_alpha_ratio": n_alpha_words
                          >= min_alpha_word_ratio * n_words,
        "ok_stopwords": sw_hits >= min_stopword_hits,
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    return df.select(
        "*",
        *[v.alias(k) for k, v in flags.items()],
        keep.alias("keep"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 512,
    overlap: int = 64,
    token_counter: str = "whitespace",
    merges=None,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap —
    the context-window chunking step between a cleaned corpus and
    sequence packing. Chunk c starts at token offset
    c * (chunk_tokens - overlap) and takes ``chunk_tokens`` tokens
    (the final chunk is shorter); every token position is covered and
    consecutive chunks share ``overlap`` tokens.

    ``token_counter`` picks the tokenization the windows are measured
    in: ``"whitespace"`` (space-split words, chunk text joined by
    ' ') or ``"bpe"`` — REAL subword boundaries under the pinned (or
    passed) BPE ``merges`` (pipeline.bpe; expression-only, still
    map-only/no UDF). BPE tokens carry their GPT-2-style leading
    space, so chunk text is their plain concatenation; a chunk that
    starts mid-word starts at a subword boundary — exactly what a
    trainer's tokenizer would see, and the boundaries SHIFT vs
    whitespace counting (asserted in tests/test_bpe.py). Whitespace
    runs collapse to the single spaces the pre-tokenizer keeps.

    Map-only flatMap via expressions: one sequence of start offsets
    per doc, posexplode of the sliced windows — no shuffle, no UDF,
    output rows ≈ corpus_tokens / (chunk_tokens - overlap) regardless
    of document-length skew (a 1M-token doc becomes ~2k independent
    rows, so downstream per-chunk work re-parallelizes).

    Returns (id_col, chunk_id, text, n_tokens). NULL-text docs are
    dropped (no tokens to chunk — without the filter the NULL words
    array would fabricate one empty chunk with a wrong token count);
    an empty string is one ''-token under the whitespace tokenizer
    (consistent with the module's other text ops) and zero chunks
    under BPE."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    if token_counter not in ("whitespace", "bpe"):
        raise ValueError("token_counter must be 'whitespace' or 'bpe'")
    step = chunk_tokens - overlap
    df = df.filter(F.col(text_col).isNotNull())
    if token_counter == "bpe":
        from .bpe import bpe_tokens_col

        words = bpe_tokens_col(text_col, merges)
        join_sep = ""
    else:
        words = F.split(F.col(text_col), " ")
        join_sep = " "
    n = F.size(words)
    # greatest() guard: sequence(0, negative) would DESCEND in Spark.
    # Drop non-initial starts inside the previous chunk's overlap
    # (s >= n - overlap): they would re-emit already-covered words and
    # contribute zero new tokens.
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(step)),
        lambda s: (s == 0) | (s < n - F.lit(overlap)),
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.array_join(F.slice(words, s + 1, chunk_tokens), join_sep)
            .alias("text"),
            F.least(F.lit(chunk_tokens), n - s).alias("n_tokens"),
        ),
    )
    return (
        df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_id", "c"))
        .select(
            id_col,
            "chunk_id",
            F.col("c.text").alias("text"),
            F.col("c.n_tokens").alias("n_tokens"),
        )
    )


def pack_sequences(
    df: DataFrame,
    seq_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str | None = None,
    token_counter: str = "whitespace",
    merges=None,
    token_count_col: str | None = None,
) -> DataFrame:
    """GPT-style sequence packing (pack-then-chop): lay the corpus
    tokens back-to-back in (shard, doc_id) order and cut at
    ``seq_tokens`` boundaries — documents cross sequence boundaries,
    every sequence except each shard's last is exactly full. Returns
    one row per (document x sequence) intersection:

        (shard?, seq_id, id_col, doc_start, seq_offset, n_tokens)

    i.e. tokens [doc_start, doc_start + n_tokens) of the doc land at
    [seq_offset, ...) of sequence seq_id. A trainer materializes
    sequence seq_id by concatenating its rows ordered by seq_offset.

    Physical strategy: packing needs a running token total, i.e. a
    total order — which on 100 TB must NOT mean one global sort to a
    single reducer. ``shard_col`` scopes the order: the cumulative
    sum runs per shard (one window sort per shard, spillable), packs
    never cross shards, and shards pack in parallel — the standard
    per-shard packing of large training pipelines (shard = file /
    split / date). With shard_col=None the whole input is one shard:
    exact single-stream semantics, single-reducer sort — fine for
    bounded inputs, documented as the non-scale path.

    Everything after the cumsum is INTEGER arithmetic (sequence ids
    and offsets), so the DuckDB oracle replays it exactly. NULL-text
    docs carry no tokens and emit no slice (the __n > 0 filter).

    ``token_counter="bpe"`` measures documents in REAL subword tokens
    under the pinned (or passed) BPE ``merges`` (pipeline.bpe) instead
    of whitespace words — token offsets then index the doc's BPE token
    array, matching what a trainer materializes. Still one expression:
    the cumsum/pack arithmetic is unchanged and stays exactly
    SQL-replayable (the oracle computes the same BPE counts)."""
    from pyspark.sql import Window as W

    if seq_tokens <= 0:
        raise ValueError("seq_tokens must be positive")
    if token_counter not in ("whitespace", "bpe"):
        raise ValueError("token_counter must be 'whitespace' or 'bpe'")
    shard = F.col(shard_col) if shard_col else F.lit(0)
    w = (W.partitionBy(shard).orderBy(F.col(id_col))
         .rowsBetween(W.unboundedPreceding, -1))
    if token_count_col is not None:
        # pre-computed counts (e.g. F.size over a materialized
        # token-id frame) — lets a caller that already tokenized
        # skip the second tokenization pass entirely
        n = F.col(token_count_col).cast("long")
    elif token_counter == "bpe":
        from .bpe import bpe_token_count_col

        n = bpe_token_count_col(text_col, merges).cast("long")
    else:
        n = token_count_expr(F.col(text_col))
    base = df.select(
        *( [F.col(shard_col).alias("shard")] if shard_col else [] ),
        F.col(id_col),
        n.alias("__n"),
        F.coalesce(F.sum(n).over(w), F.lit(0)).alias("__a"),
    )
    L = F.lit(seq_tokens)
    # integer division (div), NOT double '/': past 2^53 cumulative
    # tokens the double quotient loses ulps and misassigns sequence
    # ids — exactly the regime a 100 TB corpus reaches
    s0 = F.expr(f"__a div {seq_tokens}")
    s1 = F.expr(f"(__a + __n - 1) div {seq_tokens}")
    seqs = F.sequence(s0, s1)
    out = base.filter(F.col("__n") > 0).select(
        *( ["shard"] if shard_col else [] ),
        F.col(id_col),
        F.col("__a"), F.col("__n"),
        F.explode(seqs).alias("seq_id"),
    )
    lo = F.greatest(F.col("__a"), F.col("seq_id") * L)
    hi = F.least(F.col("__a") + F.col("__n"),
                 (F.col("seq_id") + 1) * L)
    return out.select(
        *( ["shard"] if shard_col else [] ),
        "seq_id",
        id_col,
        (lo - F.col("__a")).cast("long").alias("doc_start"),
        (lo - F.col("seq_id") * L).cast("long").alias("seq_offset"),
        (hi - lo).cast("long").alias("n_tokens"),
    )


def ngram_lm_perplexity(
    docs: DataFrame,
    lm_corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.9,
    alpha: float = 1.0,
) -> DataFrame:
    """CCNet-style fluency filter: score every doc by the perplexity
    of an interpolated Laplace-smoothed bigram language model trained
    on ``lm_corpus`` (usually a trusted high-quality slice) —
    low-perplexity docs read like the reference corpus, high ones are
    noise. Per token:

        P(w | v) = lam * (c2(v,w) + a) / (c1(v) + a*V)
                 + (1 - lam) * (c1(w) + a) / (T + a*V)

    (first token: unigram only); cross_entropy = -mean(ln P),
    perplexity = exp(cross_entropy).

    Physical strategy: two LM-count aggregations over the reference
    corpus (map-side combinable, output bounded by its distinct uni-/
    bigrams); scoring explodes (pos, prev, w) and LEFT-joins the
    count tables on token keys (equi-joins, AQE-managed — the LM
    tables are data-sized, so no broadcast/literal shipping like the
    bucketed DSIR ratio table). The per-doc sum folds an
    array_sort-ed (pos, logp) list so the floating-point summation
    order is well-defined — the DuckDB oracle folds the identical
    ordering and matches at 1e-5.

    Returns (id_col, n_tokens, cross_entropy, perplexity); NULL-text
    docs are dropped."""
    from pyspark.sql import Window as W  # noqa: F401

    def grams(df2):
        words = F.split(F.col(text_col), " ")
        return df2.filter(F.col(text_col).isNotNull()).select(
            F.col(id_col),
            F.posexplode(words).alias("pos", "w"),
            F.size(words).alias("__n"),
            words.alias("__ws"),
        ).select(
            id_col, "pos", "w", "__n",
            F.when(F.col("pos") > 0,
                   F.element_at(F.col("__ws"), F.col("pos"))).alias("v"),
        )
    # ONE tokenization of the reference corpus feeds BOTH count
    # tables: each token row expands to a tagged unigram row plus
    # (when a previous word exists) a tagged bigram row, and a single
    # map-side-combinable aggregation counts both. Materialized ONCE:
    # the result feeds the T/V stats action and THREE scoring joins
    # (w / prev-word unigram sides, bigram side) — left as lineage,
    # the reference-corpus scan would re-run for each consumer (4
    # scans of lm_corpus instead of this 1; the r16 shape paid 2 —
    # a checkpointed unigram table plus a lineage bigram subtree).
    # The checkpoint holds one row per distinct uni-/bigram — the
    # same bytes the scoring joins shuffle anyway (MEMORY_AND_DISK,
    # spills rather than pins at corpus scale).
    lm_counts = (
        grams(lm_corpus.select(
            F.monotonically_increasing_id().alias(id_col), text_col))
        .select(F.explode(F.array(
            F.struct(F.lit(0).alias("__tag"),
                     F.lit(None).cast("string").alias("v"),
                     F.col("w").alias("w")),
            F.struct(F.lit(1).alias("__tag"),
                     F.col("v").alias("v"),
                     F.col("w").alias("w")),
        )).alias("g"))
        .select("g.__tag", "g.v", "g.w")
        .filter((F.col("__tag") == 0) | F.col("v").isNotNull())
        .groupBy("__tag", "v", "w")
        .agg(F.count("*").alias("c"))
        # LAZY: the mandatory T/V stats action right below
        # materializes the checkpoint AND computes the stats in ONE
        # job (eager=True spent a separate job on materialization —
        # the same probe-fusion the connected-components loop uses)
        .localCheckpoint(eager=False)
    )
    uni = lm_counts.filter(F.col("__tag") == 0).select(
        "w", F.col("c").alias("c1"))
    bi = lm_counts.filter(F.col("__tag") == 1).select(
        "v", "w", F.col("c").alias("c2"))
    stats = uni.agg(F.sum("c1").alias("T"), F.count("*").alias("V")).first()
    T, V = float(stats["T"] or 0), float(stats["V"] or 0)
    g = grams(docs)
    g = (
        g.join(uni.alias("uw"), g["w"] == F.col("uw.w"), "left")
        .select(g[id_col], g["pos"], g["w"], g["v"], g["__n"],
                F.coalesce(F.col("uw.c1"), F.lit(0)).alias("c1w"))
    )
    g = (
        g.join(uni.alias("uv"), g["v"] == F.col("uv.w"), "left")
        .select(g[id_col], g["pos"], g["w"], g["v"], g["__n"], g["c1w"],
                F.coalesce(F.col("uv.c1"), F.lit(0)).alias("c1v"))
    )
    g = (
        g.join(bi.alias("b"),
               (g["v"] == F.col("b.v")) & (g["w"] == F.col("b.w")), "left")
        .select(g[id_col], g["pos"], g["v"], g["__n"], g["c1w"], g["c1v"],
                F.coalesce(F.col("b.c2"), F.lit(0)).alias("c2"))
    )
    p_uni = (F.col("c1w") + alpha) / F.lit(T + alpha * V)
    p_bi = (F.col("c2") + alpha) / (F.col("c1v") + F.lit(alpha * V))
    p = F.when(F.col("v").isNull(), p_uni).otherwise(
        F.lit(lam) * p_bi + F.lit(1.0 - lam) * p_uni)
    per_tok = g.select(id_col, "__n", "pos", F.log(p).alias("lp"))
    folded = (
        per_tok.groupBy(id_col, "__n")
        .agg(F.array_sort(
            F.collect_list(F.struct("pos", "lp"))).alias("lps"))
        .select(
            F.col(id_col),
            F.col("__n").alias("n_tokens"),
            (-F.aggregate(F.col("lps"), F.lit(0.0),
                          lambda acc, x: acc + x["lp"])
             / F.col("__n")).alias("cross_entropy"),
        )
    )
    return folded.select(
        id_col, "n_tokens", "cross_entropy",
        F.exp("cross_entropy").alias("perplexity"))


# PII patterns — RE2-compatible (no lookarounds/backrefs) so the SAME
# pattern strings run verbatim in Spark codegen and the DuckDB oracle
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{1,3}[ -]\d{2,4}[ -]\d{3,4}[ -]\d{3,4}\b",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
    token: str = "[PII:{kind}]",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """PII scrubbing for training corpora: replace email / IPv4 /
    international-phone matches with a typed placeholder and count the
    redactions per kind — the standard pre-release curation step.
    Pure regexp_replace / regexp_count expressions (map-only, JVM
    codegen, no UDF); patterns are RE2-compatible so the DuckDB
    oracle replays them verbatim. Replacement order is the sorted
    pattern-name order (deterministic; a placeholder never matches a
    later pattern — the brackets are outside every character class).

    Returns (id_col, text [redacted], *keep, n_<kind> per pattern);
    ``keep`` carries metadata columns through so the map-only stage
    composes without a join-back (e.g. in a streaming plan)."""
    patterns = patterns if patterns is not None else PII_PATTERNS
    out = F.col(text_col)
    counts = []
    for kind in sorted(patterns):
        pat = patterns[kind]
        counts.append(
            F.regexp_count(F.col(text_col), F.lit(pat))
            .cast("int").alias(f"n_{kind}"))
        out = F.regexp_replace(out, pat, token.format(kind=kind))
    return df.select(F.col(id_col), out.alias("text"),
                     *[F.col(c) for c in keep], *counts)
