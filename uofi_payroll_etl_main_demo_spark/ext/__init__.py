"""LLM-data-pipeline extension operators (BASELINE.json north star).

Not in the reference's surface — these are the training-data-pipeline
operators a 100 TB corpus engine needs: deduplication (exact and
near-dup), similarity search over embeddings, text analysis, and
multimodal column plumbing.
"""

from uofi_payroll_etl_main_demo_spark.ext.clusters import (  # noqa: F401
    connected_components,
    dedup_survivors,
)
from uofi_payroll_etl_main_demo_spark.ext.dedup import (  # noqa: F401
    exact_dedup,
    minhash_near_dup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
)
from uofi_payroll_etl_main_demo_spark.ext.cdc import (  # noqa: F401
    cdc_chunk_spans,
    cdc_chunks,
)
from uofi_payroll_etl_main_demo_spark.ext.curation import (  # noqa: F401
    gopher_rules,
    quality_classifier,
    repetition_stats,
)
from uofi_payroll_etl_main_demo_spark.ext.ann_index import (  # noqa: F401
    IVFDiskIndex,
    IVFPQDiskIndex,
    PQDiskIndex,
    corpus_fingerprint,
    ensure_ivf_index,
    ensure_ivfpq_index,
    ensure_pq_index,
    ivf_index_add,
    ivf_index_build,
    ivf_index_compact,
    ivf_index_load,
    ivf_index_stats,
    ivfpq_index_add,
    ivfpq_index_build,
    ivfpq_index_compact,
    ivfpq_index_delete,
    ivfpq_index_drift_stats,
    ivfpq_index_load,
    ivfpq_index_retrain,
    ivfpq_index_stats,
    pq_index_add,
    pq_index_build,
    pq_index_compact,
    pq_index_load,
    semantic_dedup_index,
)
from uofi_payroll_etl_main_demo_spark.ext.cdc_index import (  # noqa: F401
    CdcDiskIndex,
    cdc_index_add,
    cdc_index_build,
    cdc_index_compact,
    cdc_index_load,
    ensure_cdc_index,
)
from uofi_payroll_etl_main_demo_spark.ext.dedup_index import (  # noqa: F401
    MinHashDiskIndex,
    ensure_minhash_index,
    minhash_index_add,
    minhash_index_build,
    minhash_index_compact,
    minhash_index_load,
)
from uofi_payroll_etl_main_demo_spark.ext.layout import (  # noqa: F401
    compact_parquet,
    parquet_zone_maps,
    prune_files,
    zorder_key,
    zorder_key_sql,
    zorder_layout,
)
from uofi_payroll_etl_main_demo_spark.ext.ivf import (  # noqa: F401
    IVFIndex,
    build_ivf_index,
    ivf_pq_search,
)
from uofi_payroll_etl_main_demo_spark.ext.pagerank import (  # noqa: F401
    pagerank,
)
from uofi_payroll_etl_main_demo_spark.ext.sketches import (  # noqa: F401
    cms_estimate,
    count_min_sketch,
    heavy_hitters_report,
)
from uofi_payroll_etl_main_demo_spark.ext.similarity import (  # noqa: F401
    auto_planes,
    brute_force_top_k,
    brute_force_top_k_gemm,
    exact_cosine_pairs,
    knn_join,
    knn_join_gemm,
    knn_join_multiprobe,
    lsh_bucket_top_k,
    pq_top_k,
    random_hyperplane_buckets,
    sq_rerank_top_k,
)
from uofi_payroll_etl_main_demo_spark.ext.splits import (  # noqa: F401
    cluster_aware_split,
    cluster_aware_split3,
)
from uofi_payroll_etl_main_demo_spark.ext.textstats import (  # noqa: F401
    boilerplate_stats,
    chunk_documents,
    document_stats,
    dup_ngram_stats,
    language_id,
    winnowed_fingerprints,
)
