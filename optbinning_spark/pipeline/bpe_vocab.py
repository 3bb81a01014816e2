"""Pinned mini BPE merge list (40 merges) for the expression-based
tokenizer in :mod:`optbinning_spark.pipeline.bpe`.

Trained ONCE by ``tools/train_bpe_vocab.py`` (standard BPE training —
Sennrich, Haddow & Birch 2016, deterministic tie-breaks, no RNG) on
the sf0.001 documents corpus and committed as a literal so the
tokenizer, its tests, and the DuckDB oracle all replay the identical
vocabulary. Regenerate with:

    python tools/train_bpe_vocab.py --num-merges 40

Merges are in rank order: earlier pairs merge first, exactly like a
GPT-2 ``merges.txt`` (swap in any public merge list of the same shape
— e.g. the first N lines of GPT-2's file with Ġ mapped to ' ').
"""

MINI_MERGES: list[tuple[str, str]] = [
    (' ', 's'),
    ('e', 'r'),
    ('o', 'r'),
    ('i', 'n'),
    ('o', 'w'),
    ('l', 'u'),
    ('a', 'r'),
    ('p', 'ar'),
    (' ', 'a'),
    (' ', 'v'),
    ('a', 's'),
    (' ', 'c'),
    ('m', 'er'),
    ('a', 't'),
    (' ', 'f'),
    (' ', 't'),
    (' ', 'b'),
    ('a', 'n'),
    ('c', 'an'),
    ('lu', 'm'),
    ('lum', 'n'),
    ('o', 'lumn'),
    ('d', 'ow'),
    ('in', 'dow'),
    ('w', 'indow'),
    ('d', 'er'),
    ('or', 'der'),
    ('or', 't'),
    ('par', 't'),
    ('u', 'p'),
    (' s', 'ort'),
    (' ', 'window'),
    (' ', 'order'),
    (' c', 'olumn'),
    (' s', 'can'),
    ('g', 'g'),
    (' ', 'part'),
    ('a', 'lu'),
    ('alu', 'e'),
    ('in', 'e'),
]
