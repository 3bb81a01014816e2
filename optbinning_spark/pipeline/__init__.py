"""Training-data pipeline operators (the LLM-scale companion to the
binning engine): deduplication, similarity search, text analysis,
sampling, and multimodal plumbing. One import surface so a pipeline
reads top-to-bottom:

    from optbinning_spark.pipeline import (
        duplicate_clusters, gopher_quality_flags, hash_split, ...)
"""

from .dedup import (
    connected_components,
    paragraph_dedup,
    cut_word_spans,
    duplicate_clusters,
    duplicate_ngram_spans,
    exact_dedup_groups,
    lsh_candidate_pairs,
    merge_word_spans,
    minhash_signatures,
    ngram_contamination,
    ngram_jaccard_pairs,
    simhash,
    verify_pairs_jaccard,
)
from .multimodal import extract_features, resize_images, sample_frames
from .sampling import (
    dsir_gumbel_sample,
    dsir_log_weights,
    hash_split,
    hash_uniform,
    mixture_sampling_rates,
    stratified_hash_sample,
    stratified_top_fraction,
)
from .similarity import (
    bm25_topk,
    brute_force_topk,
    bucketed_cosine_pairs,
    cosine_pairs,
    embedding_duplicate_clusters,
    ivf_topk,
    lsh_bucketed_topk,
)
from .text import (
    chunk_documents,
    document_stats,
    ngram_lm_perplexity,
    pack_sequences,
    redact_pii,
    gopher_quality_flags,
    repetition_flags,
    lang_id_expr,
    normalize_text_expr,
    quality_score_expr,
)

__all__ = [
    "bm25_topk",
    "brute_force_topk",
    "bucketed_cosine_pairs",
    "connected_components",
    "cosine_pairs",
    "chunk_documents",
    "cut_word_spans",
    "document_stats",
    "dsir_gumbel_sample",
    "dsir_log_weights",
    "duplicate_clusters",
    "duplicate_ngram_spans",
    "embedding_duplicate_clusters",
    "exact_dedup_groups",
    "extract_features",
    "gopher_quality_flags",
    "hash_split",
    "hash_uniform",
    "ivf_topk",
    "lang_id_expr",
    "lsh_bucketed_topk",
    "lsh_candidate_pairs",
    "merge_word_spans",
    "minhash_signatures",
    "mixture_sampling_rates",
    "ngram_contamination",
    "ngram_jaccard_pairs",
    "ngram_lm_perplexity",
    "normalize_text_expr",
    "pack_sequences",
    "paragraph_dedup",
    "quality_score_expr",
    "redact_pii",
    "repetition_flags",
    "resize_images",
    "sample_frames",
    "simhash",
    "stratified_hash_sample",
    "stratified_top_fraction",
    "verify_pairs_jaccard",
]
