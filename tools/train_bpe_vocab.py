"""Train the pinned mini BPE merge list from the sf0.001 documents
corpus and print it as a Python literal for
optbinning_spark/pipeline/bpe_vocab.py.

Standard BPE training (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units", alg. 1): pre-tokenize,
count pre-token frequencies, repeatedly merge the most frequent
adjacent symbol pair (ties broken lexicographically so the result is
fully deterministic — no RNG, no dict-order dependence).

The pre-tokenizer is the ASCII specialization of the module's
GPT-2-style regex (BPE_TOKEN_PATTERN uses \\p{L}/\\p{N}; the corpus is
ASCII so [A-Za-z]/[0-9] matches identically — asserted in
tests/test_bpe.py against Spark's own regexp_extract_all).

Usage: python tools/train_bpe_vocab.py [--num-merges 40] [--src DIR]
"""

from __future__ import annotations

import argparse
import re
from collections import Counter

ASCII_PRETOKEN_RE = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+")


def _merge_pass(syms, a, b):
    """Single greedy left-to-right non-overlapping merge of (a, b) —
    the per-round application both trainer variants share. One pass
    removes every occurrence (a merged symbol a+b can never re-form an
    adjacent (a, b))."""
    out = []
    i = 0
    merged = a + b
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train_bpe_merges(texts, num_merges: int) -> list[tuple[str, str]]:
    """Driver-side BPE trainer: returns merges in rank order.

    Incremental (heap + pair->words index): each round updates pair
    counts only for the word types the applied merge touched, so
    training a production-scale list (32k+ merges over a 100k-type
    vocabulary) is O(affected symbols) per merge, not O(corpus).
    Selection rule: max count, ties broken by the lexicographically
    smallest pair tuple (the heap key (-count, pair) pops exactly that
    order). NB this deliberately replaces the pre-incremental
    trainer's tie-break (Python's max over a (count, pair) key, which
    on count ties preferred the lexicographically LARGEST pair — a
    prefix-tie bias), so merge lists trained before the rewrite may
    differ at tied ranks. Parity with an independent full-rescan
    trainer using the same selection rule is asserted on randomized
    corpora in tests/test_bpe.py::test_trainer_incremental_matches_rescan."""
    import heapq

    word_freq: Counter = Counter()
    for t in texts:
        if t:
            word_freq.update(ASCII_PRETOKEN_RE.findall(t))
    vocab_words = sorted(word_freq)  # deterministic word order
    words = [list(w) for w in vocab_words]
    freqs = [word_freq[w] for w in vocab_words]

    pair_count: dict = {}
    pair_words: dict = {}  # pair -> set of word indices containing it
    for wi, syms in enumerate(words):
        f = freqs[wi]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_count[p] = pair_count.get(p, 0) + f
            pair_words.setdefault(p, set()).add(wi)
    heap = [(-c, p) for p, c in pair_count.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges and heap:
        nc, p = heapq.heappop(heap)
        cur = pair_count.get(p, 0)
        if -nc != cur:
            continue  # stale entry; the current count was re-pushed
        if cur < 2:
            break
        a, b = p
        merges.append(p)
        touched: set = set()
        for wi in sorted(pair_words.get(p, ())):
            syms = words[wi]
            f = freqs[wi]
            # retract this word's pair contributions, re-merge, re-add
            for i in range(len(syms) - 1):
                q = (syms[i], syms[i + 1])
                pair_count[q] -= f
                touched.add(q)
                s = pair_words.get(q)
                if s is not None:
                    s.discard(wi)
            syms = _merge_pass(syms, a, b)
            words[wi] = syms
            for i in range(len(syms) - 1):
                q = (syms[i], syms[i + 1])
                pair_count[q] = pair_count.get(q, 0) + f
                touched.add(q)
                pair_words.setdefault(q, set()).add(wi)
        for q in touched:
            c = pair_count.get(q, 0)
            if c > 0:
                heapq.heappush(heap, (-c, q))
            else:
                pair_count.pop(q, None)
                pair_words.pop(q, None)
    return merges


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-merges", type=int, default=40)
    ap.add_argument("--src",
                    default="/root/testdata/sf0.001/documents.parquet")
    args = ap.parse_args()
    import duckdb

    import os

    pat = (f"{args.src}/*.parquet" if os.path.isdir(args.src)
           else args.src)
    texts = [r[0] for r in duckdb.sql(
        f"select text from read_parquet('{pat}') "
        f"order by doc_id").fetchall()]
    merges = train_bpe_merges(texts, args.num_merges)
    print("MINI_MERGES = [")
    for a, b in merges:
        print(f"    ({a!r}, {b!r}),")
    print("]")


if __name__ == "__main__":
    main()
