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
from uofi_payroll_etl_main_demo_spark.ext.ivf import (  # noqa: F401
    IVFIndex,
    build_ivf_index,
)
from uofi_payroll_etl_main_demo_spark.ext.similarity import (  # noqa: F401
    brute_force_top_k,
    brute_force_top_k_gemm,
    exact_cosine_pairs,
    lsh_bucket_top_k,
    random_hyperplane_buckets,
    sq_rerank_top_k,
)
from uofi_payroll_etl_main_demo_spark.ext.textstats import (  # noqa: F401
    document_stats,
    language_id,
)
