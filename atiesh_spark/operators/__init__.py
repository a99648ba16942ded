from atiesh_spark.operators.asof import asof_join, range_join
from atiesh_spark.operators.batching import assemble_batches
from atiesh_spark.operators.compaction import compact_dataset, write_sized_parquet
from atiesh_spark.operators.dedup import (
    char_shingles,
    connected_components,
    exact_dedup,
    incremental_lsh_candidates,
    minhash_band_signatures,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
    word_shingles,
)
from atiesh_spark.operators.classify import nb_predict, nb_train, threshold_sweep
from atiesh_spark.operators.cluster import cluster_report, kmeans_assign, kmeans_fit
from atiesh_spark.operators.enrichment import RefreshingLookup, enrich_with_lookup
from atiesh_spark.operators.profile import drift_report, histogram, profile_table
from atiesh_spark.operators.quality import assert_quality, check_quality
from atiesh_spark.operators.rollup import cascade_rollup, quantile_rollup, sketch_rollup
from atiesh_spark.operators.routing import route_first_accepted
from atiesh_spark.operators.sampling import (
    budgeted_take,
    deterministic_split,
    leakage_safe_split,
    mixture_take,
    pack_documents,
)
from atiesh_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    ivf_ann_topk,
    ivf_pq_encode,
    ivf_pq_fit,
    ivf_pq_topk,
    knn_join,
    lsh_ann_topk,
    pq_adc_topk,
    pq_encode,
    pq_fit,
)
from atiesh_spark.operators.tokenize import (
    apply_bpe,
    apply_bpe_batched,
    bpe_learn,
    unigram_learn,
    unigram_tokenize,
)
from atiesh_spark.operators.skew import salted_aggregate, salted_broadcast_join
from atiesh_spark.operators.web import canonicalize_urls, domain_stats
from atiesh_spark.operators.frequent import heavy_hitters, heavy_hitters_report
from atiesh_spark.operators.textstats import (
    fingerprint,
    language_id,
    pii_counts,
    redact_pii,
    repetition_stats,
    text_stats,
    tf_idf_topk,
    token_counts,
)

__all__ = [
    "asof_join",
    "range_join",
    "cascade_rollup",
    "assemble_batches",
    "compact_dataset",
    "write_sized_parquet",
    "char_shingles",
    "word_shingles",
    "knn_join",
    "mixture_take",
    "pack_documents",
    "pii_counts",
    "redact_pii",
    "connected_components",
    "exact_dedup",
    "incremental_lsh_candidates",
    "minhash_band_signatures",
    "repetition_stats",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_near_pairs",
    "RefreshingLookup",
    "enrich_with_lookup",
    "assert_quality",
    "check_quality",
    "route_first_accepted",
    "budgeted_take",
    "deterministic_split",
    "brute_force_topk",
    "embedding_near_dup_pairs",
    "ivf_ann_topk",
    "lsh_ann_topk",
    "salted_aggregate",
    "salted_broadcast_join",
    "fingerprint",
    "language_id",
    "text_stats",
    "tf_idf_topk",
    "token_counts",
    "nb_train",
    "nb_predict",
    "threshold_sweep",
    "kmeans_fit",
    "kmeans_assign",
    "cluster_report",
    "drift_report",
    "histogram",
    "profile_table",
    "quantile_rollup",
    "sketch_rollup",
    "leakage_safe_split",
    "pq_fit",
    "pq_encode",
    "pq_adc_topk",
    "ivf_pq_fit",
    "ivf_pq_encode",
    "ivf_pq_topk",
    "bpe_learn",
    "apply_bpe",
    "apply_bpe_batched",
    "unigram_learn",
    "unigram_tokenize",
    "canonicalize_urls",
    "domain_stats",
    "heavy_hitters",
    "heavy_hitters_report",
]
