"""The transitive-closure entries carry TWO oracle forms: the driver's
recursive-CTE SQL (runs at the sf0.01 gate) and a scale-capable iterative
union-find replay (oracle_scale, used by local sweeps above the gate,
where the recursive form's full-reachability materialization blows
DuckDB's disk). These tests pin the two paths EQUAL at the gate — the
equivalence that licenses swapping them at sf >= 0.1 — plus the
union-find's min-label contract on adversarial pair graphs.

No Spark involved: both paths are pure DuckDB/pandas oracle machinery.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from big_data_player_analysis_spark.catalog import TABLES
from big_data_player_analysis_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.01"

CLOSURE_ENTRIES = [
    "dedup_components",
    "llm_near_dedup_survivors",
    "llm_near_dedup_best_quality",
    "llm_corpus_curation",
    "stream_near_dedup_ingest",
    "llm_curation_pipeline",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _norm(df):
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        out = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                out.append(None)
            elif isinstance(v, float):
                out.append(round(v, 6) + 0.0)
            else:
                out.append(v)
        rows.append(tuple(out))
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def test_every_closure_entry_has_scale_oracle():
    specs = all_queries()
    for name in CLOSURE_ENTRIES:
        assert specs[name].oracle_scale is not None, name
        assert specs[name].sql is not None, name


@pytest.mark.parametrize("name", CLOSURE_ENTRIES)
def test_iterative_replay_matches_recursive_cte(con, name):
    spec = all_queries()[name]
    recursive = con.execute(spec.sql).df()
    iterative = spec.oracle_scale(con)
    assert sorted(map(str.lower, recursive.columns)) == sorted(
        map(str.lower, iterative.columns)
    )
    assert _norm(recursive) == _norm(iterative)


def test_union_find_min_label_contract():
    """Chain, star, and merge-order-adversarial graphs: component label
    must be the minimum id of the connected set regardless of pair
    order — the closure SQL's least(a, min(reachable)) fixed point."""
    import pandas as pd

    from big_data_player_analysis_spark.registry.llm_ops import (
        closure_components_df,
    )

    class FakeCon:
        def __init__(self, pairs):
            self._pairs = pairs

        def execute(self, _sql):
            return self

        def df(self):
            import pandas as pd

            return pd.DataFrame(
                {
                    "doc_a": [a for a, _ in self._pairs],
                    "doc_b": [b for _, b in self._pairs],
                }
            )

    # two chains merged last-to-first + a star, deliberately ordered so a
    # naive one-pass labeling would leave stale labels
    pairs = [(5, 6), (3, 4), (4, 5), (2, 3), (9, 8), (8, 7), (7, 2), (20, 30), (10, 30)]
    out = closure_components_df(FakeCon(pairs))
    comp = dict(zip(out["node"], out["component"]))
    assert {comp[n] for n in (2, 3, 4, 5, 6, 7, 8, 9)} == {2}
    assert {comp[n] for n in (10, 20, 30)} == {10}
    assert set(out["node"]) == {2, 3, 4, 5, 6, 7, 8, 9, 10, 20, 30}
    assert isinstance(out, pd.DataFrame)
