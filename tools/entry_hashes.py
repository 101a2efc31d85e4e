"""Rotation-hygiene automation (round-3 verdict item 4).

The driver records correctness rows for the first 50 registry entries only,
so the rotation policy (registry/__init__.py) requires: any entry whose
implementation changed since its last green driver row — or that never had
one — must sit inside PRIMARY_ORDER. Until now that was enforced by
discipline; this tool enforces it mechanically.

Each entry gets a deterministic hash of its STATIC IMPLEMENTATION CLOSURE:
the entry function's source, the sources of every package function/class it
(transitively) references — resolved through module globals, `module.attr`
access, and function-local `from pkg import name` statements — the reprs of
every referenced package-level constant (thresholds, SQL fragments, weight
tables), and the entry's oracle SQL string. Changing any of those changes
the hash; changing an unrelated function in the same module does not.

The committed baseline ``tools/entry_hashes.json`` is updated ONLY together
with a rotation decision (promote the changed entry into PRIMARY_ORDER,
then ``python tools/entry_hashes.py --update``). The paired test
(tests/test_rotation_hygiene.py) goes red whenever a current hash differs
from the baseline for an entry that is NOT in the driver window.

The tracer is static and approximate by design: it cannot see dynamic
dispatch or string-built names. It errs toward sensitivity (hashing whole
function sources), which is the safe direction for a promotion gate.
"""

from __future__ import annotations

import ast
import hashlib
import importlib
import inspect
import json
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PKG = "big_data_player_analysis_spark"
# Registry plumbing (the @query decorator, QuerySpec, the _REGISTRY dict —
# whose repr embeds function addresses) is infrastructure shared by every
# entry, not per-entry implementation; excluding it keeps hashes
# deterministic and scoped to semantics.
EXCLUDE_MODULE = f"{PKG}.registry"
# _COUNT_MEMO and _TRACKED are RUNTIME state (plan-build corpus counts;
# the tracked persist/checkpoint release list): their reprs vary with
# what a session has already executed, which is execution state, not
# implementation — hashing them made closure hashes depend on test order
# (round-9 findings: _COUNT_MEMO via the dispatch counts, _TRACKED via
# any entry referencing tracked_persist once a query had actually run).
# Round-10 adds the remaining two memos of the same class: a full pytest
# session populates _TS_STATS_MEMO/_BPE_MERGES_MEMO before the hygiene
# test runs, which flipped q18's hash (its duels derivation references
# the ts-stats memo) and made the promotion gate flaky by test order.
EXCLUDE_NAMES = {
    "_REGISTRY",
    "PRIMARY_ORDER",
    "EXTENDED_ORDER",
    "_COUNT_MEMO",
    "_TRACKED",
    "_TS_STATS_MEMO",
    "_BPE_MERGES_MEMO",
}
BASELINE = os.path.join(os.path.dirname(__file__), "entry_hashes.json")

_CONST_TYPES = (int, float, str, bool, bytes, tuple, list, dict)


def _stable_repr(obj) -> str:
    if isinstance(obj, (set, frozenset)):
        return "{" + ", ".join(sorted(repr(x) for x in obj)) + "}"
    return repr(obj)


def _in_pkg(obj) -> bool:
    mod = getattr(obj, "__module__", None)
    return isinstance(mod, str) and mod.startswith(PKG)


def _referenced_objects(fn):
    """(name, object) pairs the function's source statically references:
    globals by Name, package-module attributes, and function-local
    `from pkg.x import y` imports."""
    try:
        src = textwrap.dedent(inspect.getsource(fn))
        tree = ast.parse(src)
    except (OSError, SyntaxError):  # builtins / C extensions
        return []
    env = dict(getattr(fn, "__globals__", {}))
    out = []
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module and node.module.startswith(PKG):
            try:
                mod = importlib.import_module(node.module)
            except ImportError:
                continue
            for alias in node.names:
                obj = getattr(mod, alias.name, None)
                if obj is not None:
                    out.append((alias.asname or alias.name, obj))
                    env[alias.asname or alias.name] = obj
        elif isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load):
            if node.id in env:
                out.append((node.id, env[node.id]))
        elif isinstance(node, ast.Attribute) and isinstance(node.value, ast.Name):
            base = env.get(node.value.id)
            if inspect.ismodule(base) and getattr(base, "__name__", "").startswith(PKG):
                obj = getattr(base, node.attr, None)
                if obj is not None:
                    out.append((f"{base.__name__}.{node.attr}", obj))
    return out


def closure_items(fn) -> dict[str, str]:
    """{key: text} for the static implementation closure of ``fn``."""
    items: dict[str, str] = {}
    seen: set[int] = set()
    stack = [(getattr(fn, "__qualname__", repr(fn)), fn)]
    while stack:
        name, obj = stack.pop()
        if id(obj) in seen:
            continue
        seen.add(id(obj))
        if name in EXCLUDE_NAMES:
            continue
        if inspect.isfunction(obj) or inspect.isclass(obj):
            if not _in_pkg(obj) or obj.__module__ == EXCLUDE_MODULE:
                continue
            key = f"{obj.__module__}.{obj.__qualname__}"
            if key in items:
                continue
            try:
                items[key] = textwrap.dedent(inspect.getsource(obj))
            except OSError:
                continue
            target = obj
            if inspect.isclass(obj):
                for _, m in inspect.getmembers(obj, inspect.isfunction):
                    stack.append((m.__qualname__, m))
                continue
            stack.extend(_referenced_objects(target))
        elif inspect.ismodule(obj):
            continue  # attributes are resolved per-access in _referenced_objects
        elif isinstance(obj, _CONST_TYPES) or isinstance(obj, (set, frozenset)):
            items.setdefault(f"const:{name}", _stable_repr(obj))
    return items


def entry_hash(spec) -> str:
    items = closure_items(spec.fn)
    items["oracle_sql"] = spec.sql or "<rows-only>"
    blob = json.dumps(items, sort_keys=True).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def current_hashes() -> dict[str, str]:
    from big_data_player_analysis_spark.registry import all_queries

    return {name: entry_hash(spec) for name, spec in all_queries().items()}


def load_baseline() -> dict[str, str]:
    if not os.path.exists(BASELINE):
        return {}
    with open(BASELINE) as f:
        return json.load(f)


def diff() -> dict[str, list[str]]:
    """{changed: [...], new: [...], removed: [...]} vs the baseline."""
    cur, base = current_hashes(), load_baseline()
    return {
        "changed": sorted(n for n in cur if n in base and cur[n] != base[n]),
        "new": sorted(n for n in cur if n not in base),
        "removed": sorted(n for n in base if n not in cur),
    }


def main() -> int:
    if "--update" in sys.argv:
        with open(BASELINE, "w") as f:
            json.dump(current_hashes(), f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"baseline written: {BASELINE}")
        return 0
    d = diff()
    print(json.dumps(d, indent=1))
    from big_data_player_analysis_spark.registry import PRIMARY_ORDER

    window = set(PRIMARY_ORDER)
    violations = [n for n in d["changed"] + d["new"] if n not in window]
    if violations:
        print(f"NOT PROMOTED after change: {violations}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
