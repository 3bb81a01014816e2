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


def train_bpe_merges(texts, num_merges: int) -> list[tuple[str, str]]:
    """Driver-side BPE trainer: returns merges in rank order."""
    word_freq: Counter = Counter()
    for t in texts:
        if t:
            word_freq.update(ASCII_PRETOKEN_RE.findall(t))
    # each word is a tuple of symbols, initially characters
    words = {w: tuple(w) for w in word_freq}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            f = word_freq[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # max count, ties broken by the lexicographically SMALLEST
        # pair tuple — fully deterministic across python versions /
        # dict orders (min over (-count, pair) gives true smallest-pair
        # semantics; the old negated-ordinal key let a longer string
        # beat its own prefix on a count tie)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < 2:
            break
        merges.append((a, b))
        merged = a + b
        new_words = {}
        for w, syms in words.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[w] = tuple(out)
        words = new_words
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
