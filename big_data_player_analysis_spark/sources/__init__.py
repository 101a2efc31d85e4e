"""Ingest boundary: readers/writers for the reference's text format plus
the standard columnar formats."""

from big_data_player_analysis_spark.sources.text import (  # noqa: F401
    DUELS_SCHEMA,
    read_duels_text,
    write_tab_text,
)
