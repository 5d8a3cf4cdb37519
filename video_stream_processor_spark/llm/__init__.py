"""LLM-data-pipeline operators (SURVEY §2.10, L1-L5).

The reference has one dedup (``video_processor.py:330`` — ``set()`` on
URLs) and no similarity/text/multimodal surface; everything here is the
north-star generalization exercised over the ``documents`` and
``embeddings`` test tables.

Modules:
* dedup        — L1 exact/canonical dedup, L2 near-dup (n-gram Jaccard
                 with optional PPJoin-style prefix filtering,
                 MinHash+LSH, SimHash), connected-component clustering
* similarity   — L3 cosine top-k (brute force), IVF-style pruned search
                 (naive or Lloyd's-k-means centroids), SRP-LSH pair
                 search, int8 quantization
* text         — L4 token/quality stats, BPE-ish token counts, language
                 ID, rolling-hash fingerprints
* pii          — L4 PII detection counts + redaction (codegen'd regex,
                 Java-regex/RE2-portable patterns)
* multimodal   — L5 binary payload columns + Arrow-batched feature
                 extraction (stub decoder + a real stdlib WAV decoder)
"""

from .dedup import (
    canonical_dedup_groups,
    contamination_overlap,
    exact_dedup_groups,
    minhash_near_dup_pairs,
    minhash_near_dup_pairs_portable,
    near_dup_clusters,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
    streaming_near_dup_flags,
    simhash_near_dup_pairs_portable,
)
from .similarity import (
    cosine_topk,
    cosine_topk_batch,
    embedding_near_dup_pairs,
    ivf_topk,
    ivf_topk_batch,
    kmeans_centroids,
    quantize_embeddings,
    srp_near_dup_pairs,
)
from .pii import PII_PATTERNS, pii_count, pii_count_cols, redact_pii
from .text import (
    doc_fingerprints,
    langid_confusion,
    corpus_report,
    text_quality_by_lang,
    token_counts_by_source,
    unigram_lm_bits,
    unigram_lm_by_lang,
)
from .multimodal import (
    png_header_decoder,
    attach_payload,
    extract_binary_features,
    sample_frames,
    wav_header_decoder,
)

__all__ = [
    "attach_payload",
    "canonical_dedup_groups",
    "cosine_topk",
    "cosine_topk_batch",
    "doc_fingerprints",
    "embedding_near_dup_pairs",
    "contamination_overlap",
    "exact_dedup_groups",
    "extract_binary_features",
    "ivf_topk",
    "ivf_topk_batch",
    "kmeans_centroids",
    "langid_confusion",
    "minhash_near_dup_pairs",
    "minhash_near_dup_pairs_portable",
    "near_dup_clusters",
    "ngram_jaccard_pairs",
    "PII_PATTERNS",
    "pii_count",
    "pii_count_cols",
    "quantize_embeddings",
    "redact_pii",
    "sample_frames",
    "simhash_near_dup_pairs",
    "streaming_near_dup_flags",
    "simhash_near_dup_pairs_portable",
    "srp_near_dup_pairs",
    "corpus_report",
    "text_quality_by_lang",
    "token_counts_by_source",
    "unigram_lm_bits",
    "unigram_lm_by_lang",
    "png_header_decoder",
    "wav_header_decoder",
]
