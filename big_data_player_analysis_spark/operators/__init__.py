"""Operator library: the reference's query surface (SURVEY.md §2) plus the
general OLAP operators the reference lacks (§2.4), each as a composable
DataFrame -> DataFrame transform built from Catalyst-optimizable primitives.
"""

from big_data_player_analysis_spark.operators.aggregates import (  # noqa: F401
    count_per_key,
    global_argmax,
    global_mean,
    having_count_distinct,
    smoothed_avg,
    sum_affine,
)
from big_data_player_analysis_spark.operators.joins import (  # noqa: F401
    domain_completion,
    enrich,
    keyed_squared_difference,
    left_join_default,
)
from big_data_player_analysis_spark.operators.setops import (  # noqa: F401
    distinct_pairs,
    key_universe,
    rank_vector_init,
)
from big_data_player_analysis_spark.operators.topk import top_k, top_k_per_group  # noqa: F401
