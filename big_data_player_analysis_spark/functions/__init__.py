"""Column-function library: text analysis and vector math, built from
JVM-side pyspark.sql.functions expressions (whole-stage codegen'd; no Python
in the hot path). Constants (patterns, stopword lists, weights) are shared
with the DuckDB oracle SQL generators in the registry so both engines
compute literally the same formula."""

from big_data_player_analysis_spark.functions.text import (  # noqa: F401
    bpe_token_count,
    language_scores,
    md5_fingerprint,
    normalize_text,
    predict_language,
    quality_score,
    stopword_hits,
    ws_token_count,
)
from big_data_player_analysis_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
    to_double_array,
)
