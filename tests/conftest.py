from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from big_data_player_analysis_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("bdpa-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_small() -> str:
    return "/root/testdata/sf0.001"


def rows_set(df, ndigits: int = 6):
    """Order-insensitive row multiset with rounded floats."""
    out = []
    for r in df.collect():
        vals = []
        for v in r:
            vals.append(round(v, ndigits) if isinstance(v, float) else v)
        out.append(tuple(vals))
    return sorted(out, key=repr)
