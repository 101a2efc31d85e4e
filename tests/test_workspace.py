"""Workspace scratch-management contract: per-invocation scratch is
reclaimed try/finally, cleanup is LIVENESS-AWARE (a concurrent live
process's scratch and spark-local spill are never touched — a bench run's
blind clean once wiped a running test session's shuffle files mid-suite),
and dead runs' leftovers are reclaimed."""

from __future__ import annotations

import importlib
import os
import shutil

import pytest


@pytest.fixture()
def ws(monkeypatch, tmp_path):
    monkeypatch.setenv("BDPA_WORKSPACE", str(tmp_path / "ws"))
    import big_data_player_analysis_spark.workspace as w

    importlib.reload(w)
    yield w
    monkeypatch.delenv("BDPA_WORKSPACE")
    importlib.reload(w)


def test_scratch_dir_reclaimed_even_on_error(ws):
    kept = None
    with pytest.raises(RuntimeError):
        with ws.scratch_dir("job") as d:
            kept = d
            assert os.path.isdir(d)
            assert f"pid{os.getpid()}" in os.path.basename(d)
            raise RuntimeError("boom")
    assert not os.path.exists(kept)


def test_clean_scratch_is_liveness_aware(ws):
    sr = ws.scratch_root()
    os.makedirs(f"{sr}/job-pid999999-dead")
    os.makedirs(f"{sr}/job-pid{os.getpid()}-live")
    os.makedirs(f"{sr}/untagged-leftover")
    local_root = os.path.dirname(ws.spark_local_dir())
    os.makedirs(f"{local_root}/pid-999998", exist_ok=True)
    mine = ws.spark_local_dir()

    ws.clean_scratch()

    assert not os.path.exists(f"{sr}/job-pid999999-dead")
    assert not os.path.exists(f"{sr}/untagged-leftover")
    assert not os.path.exists(f"{local_root}/pid-999998")
    # a LIVE process's in-flight scratch and spill survive
    assert os.path.exists(f"{sr}/job-pid{os.getpid()}-live")
    assert os.path.exists(mine)
    shutil.rmtree(f"{sr}/job-pid{os.getpid()}-live")


def test_spark_local_dir_is_per_process(ws):
    assert os.path.basename(ws.spark_local_dir()) == f"pid-{ws._owner_tag()}"
    assert ws._owner_tag().startswith(str(os.getpid()))


def test_pid_reuse_does_not_keep_dead_scratch(ws):
    """A recycled pid must not make a DEAD run's scratch look live: the
    tag embeds the owner's /proc start time, and liveness requires the
    start times to match (round-5 ADVICE). Simulated by tagging a dir
    with a LIVE pid (our own) but an impossible start time."""
    sr = ws.scratch_root()
    os.makedirs(f"{sr}/job-pid999999s1-recycled")  # dead pid, start-tagged
    local_root = os.path.dirname(ws.spark_local_dir())
    # live pid (pid 1 is always alive) + wrong start time -> reclaimable
    os.makedirs(f"{local_root}/pid-1s999999999999", exist_ok=True)
    # our own tag with the TRUE start time -> kept
    mine = ws.spark_local_dir()

    ws.clean_scratch()

    assert not os.path.exists(f"{sr}/job-pid999999s1-recycled")
    assert not os.path.exists(f"{local_root}/pid-1s999999999999")
    assert os.path.exists(mine)


def test_clean_scratch_spark_local_false_skips_spill(ws):
    local_root = os.path.dirname(ws.spark_local_dir())
    os.makedirs(f"{local_root}/pid-999997", exist_ok=True)
    ws.clean_scratch(spark_local=False)
    assert os.path.exists(f"{local_root}/pid-999997")
    ws.clean_scratch()
    assert not os.path.exists(f"{local_root}/pid-999997")
