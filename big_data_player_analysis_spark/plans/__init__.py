"""Multi-operator pipelines: the reference's four exercises re-expressed as
lazy DataFrame compositions, including the iterative heroic-score engine."""

from big_data_player_analysis_spark.plans.heroic import (  # noqa: F401
    HeroicResult,
    edges_with_avgs,
    heroic_score,
    smoothed_avg_completed,
)
from big_data_player_analysis_spark.plans.pipelines import (  # noqa: F401
    challenges_per_challenged,
    challenges_per_challenger,
    distinct_duel_pairs,
    most_challenging_player,
    prolific_challengers,
)
