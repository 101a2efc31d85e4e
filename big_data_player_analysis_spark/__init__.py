"""big_data_player_analysis_spark — a PySpark-native analytics engine.

A brand-new engine providing the query and data-processing capabilities of
the reference repo LavOwl/Big-Data-Player-Analysis (a single-process
MapReduce emulator + player-duel analytics pipelines), re-expressed
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, with
Pandas-UDF/applyInPandas only where built-in operators cannot express the
semantics.

Layout:
  session     SparkSession factory tuned for local[N] testing and cluster scale
  catalog     named-table loading (parquet dirs -> DataFrames / temp views)
  sources/    ingest boundary: tab-text (reference origin format), csv/json
  operators/  the reference's query operators (SURVEY.md §2) + general OLAP
  functions/  scalar/column function library (text analysis, vector math)
  plans/      multi-operator pipelines incl. the iterative heroic-score engine
  streaming/  Structured Streaming variants of the event analytics
"""

from big_data_player_analysis_spark.session import get_spark  # noqa: F401
from big_data_player_analysis_spark.catalog import load_tables, register_views  # noqa: F401

__version__ = "0.1.0"
