from change_data_capturer_ms_spark.operators.dedupe import (
    lww_dedupe,
    lww_dedupe_two_phase,
    lww_dedupe_window,
    salted_repartition,
    streaming_dedupe_within_watermark,
)
from change_data_capturer_ms_spark.operators.grouped import (
    weighted_mean_agg,
    zscore_normalize,
)
from change_data_capturer_ms_spark.operators.dedup_docs import (
    dedup_dataset,
    duplicate_clusters,
    duplicate_spans,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_dup_pairs,
    simhash_pairs_banded,
    word_shingles,
)
from change_data_capturer_ms_spark.operators.contamination import (
    contamination_check,
    decontaminate,
)
from change_data_capturer_ms_spark.operators.similarity import (
    brute_force_topk,
    cosine_sim,
    dequantize_embeddings,
    embedding_near_dup_pairs,
    ivf_topk,
    ivf_topk_det,
    lsh_topk,
    normalize_embeddings,
    pq_topk,
    quantize_embeddings_int8,
    semdedup,
)
from change_data_capturer_ms_spark.operators.text import (
    doc_fingerprint,
    gopher_filter,
    gopher_rules,
    lang_id_builtin,
    redact_pii,
    text_profile,
    lang_id_pandas,
    quality_scores,
    repetition_profile,
    tfidf_top_terms,
    token_count_bpe_ish,
    token_count_ws,
    winnow_fingerprints,
)
from change_data_capturer_ms_spark.operators.dedup_index import (
    MinHashLSHIndex,
    band_rows,
    index_delta,
)
from change_data_capturer_ms_spark.operators.embed_index import (
    EmbeddingANNIndex,
    embed_index_delta,
)
from change_data_capturer_ms_spark.operators.packing import (
    pack_bins_greedy,
    pack_concat_chunks,
)
from change_data_capturer_ms_spark.operators.sampling import (
    hash_sample,
    hash_split,
    mix_corpora,
    stratified_sample_exact,
    weighted_hash_sample,
)
from change_data_capturer_ms_spark.operators.graph import (
    component_stats,
    connected_components,
    dedup_keep_canonical,
)
from change_data_capturer_ms_spark.operators.delta import (
    change_deltas,
    content_change_audit,
    scd2_history,
    snapshot_diff,
)
from change_data_capturer_ms_spark.operators.ivm import (
    agg_deltas_from_diff,
    agg_state,
    apply_agg_deltas,
    apply_hll_deltas,
    distinct_counts,
    hll_deltas_from_diff,
    hll_estimates,
    hll_state,
)
from change_data_capturer_ms_spark.operators.reshape import (
    melt,
    pivot_counts,
)
from change_data_capturer_ms_spark.operators.drift import (
    category_freq,
    histogram,
    psi,
    psi_from_counts,
    psi_terms,
)
from change_data_capturer_ms_spark.operators.multimodal import (
    extract_media_features,
    frame_sample,
    synth_media,
)

__all__ = [
    "lww_dedupe", "lww_dedupe_two_phase", "lww_dedupe_window", "salted_repartition",
    "streaming_dedupe_within_watermark", "weighted_mean_agg", "zscore_normalize",
    "dedup_dataset", "duplicate_clusters", "exact_dedup", "minhash_lsh_pairs", "minhash_signatures",
    "duplicate_spans", "ngram_jaccard_pairs", "simhash", "simhash_dup_pairs",
    "simhash_pairs_banded", "word_shingles",
    "brute_force_topk", "cosine_sim", "embedding_near_dup_pairs", "ivf_topk",
    "ivf_topk_det", "lsh_topk", "normalize_embeddings",
    "pq_topk", "quantize_embeddings_int8", "dequantize_embeddings", "semdedup",
    "doc_fingerprint", "gopher_filter", "gopher_rules",
    "lang_id_builtin", "lang_id_pandas", "quality_scores",
    "redact_pii", "repetition_profile", "text_profile", "tfidf_top_terms", "token_count_bpe_ish", "token_count_ws", "winnow_fingerprints",
    "extract_media_features", "frame_sample", "synth_media",
    "hash_sample", "hash_split", "mix_corpora", "stratified_sample_exact",
    "weighted_hash_sample",
    "component_stats", "connected_components", "dedup_keep_canonical",
    "contamination_check", "decontaminate",
    "pack_bins_greedy", "pack_concat_chunks",
    "change_deltas", "content_change_audit", "scd2_history", "snapshot_diff",
    "agg_deltas_from_diff", "agg_state", "apply_agg_deltas",
    "distinct_counts", "hll_state", "hll_deltas_from_diff",
    "apply_hll_deltas", "hll_estimates",
    "histogram", "category_freq", "psi", "psi_terms", "psi_from_counts",
    "melt", "pivot_counts",
]
