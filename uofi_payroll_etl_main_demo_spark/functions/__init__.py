"""Column-expression builders: cleanse (reference parity), text, vectors."""

from uofi_payroll_etl_main_demo_spark.functions.cleanse import (  # noqa: F401
    clean_column_names,
    coalesce_fill,
    concat_key,
    concat_ws_skipnull,
    ensure_string,
    fiscal_year,
    is_missing,
    normalize_cell,
    normalize_numeric_string,
    null_string_col,
    split_code_name,
    strip_decimal_str,
    to_timestamp_coerce,
)
from uofi_payroll_etl_main_demo_spark.functions.text import (  # noqa: F401
    avg_token_length,
    char_count,
    distinct_token_count,
    fingerprint64,
    predicted_language,
    punct_count,
    quality_score,
    stopword_count,
    stopword_ratio,
    token_count,
    tokenize_bpe_ish,
    tokenize_ws,
    word_shingles,
)
from uofi_payroll_etl_main_demo_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
    normalize_vector,
    scale_vector,
)
