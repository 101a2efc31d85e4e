"""Mechanical enforcement of the rotation policy (round-3 verdict item 4):
any registry entry whose static implementation closure changed since the
committed baseline — or that is new — must sit inside PRIMARY_ORDER (the
driver's 50-row correctness window), so no entry ever ships changed code on
stale driver evidence. The baseline (tools/entry_hashes.json) is updated
only together with a rotation decision: promote, then
``python tools/entry_hashes.py --update``."""

from __future__ import annotations

from big_data_player_analysis_spark.registry import PRIMARY_ORDER
from tools.entry_hashes import current_hashes, diff, load_baseline


def test_baseline_exists_and_covers_registry():
    base = load_baseline()
    cur = current_hashes()
    assert base, "tools/entry_hashes.json missing — run entry_hashes.py --update"
    # a removed entry with a baseline row is stale bookkeeping
    assert not (set(base) - set(cur)), f"stale baseline rows: {set(base) - set(cur)}"


def test_changed_or_new_entries_are_promoted():
    d = diff()
    window = set(PRIMARY_ORDER)
    violations = [n for n in d["changed"] + d["new"] if n not in window]
    assert not violations, (
        f"entries changed without promotion into PRIMARY_ORDER: {violations} "
        "— promote them (displacing green-row overlapping entries per the "
        "policy in registry/__init__.py) and then refresh the baseline with "
        "`python tools/entry_hashes.py --update`"
    )
