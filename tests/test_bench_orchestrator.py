"""Kill-safety contract of the bench orchestrator (VERDICT r4 #1).

Round 4's driver artifact was empty because bench.py printed its one JSON
line only after the LAST optional stage, and the 12-stage ladder outran the
driver's kill window. The contract under test:

1. the best-so-far combined line prints right after the PRIMARY stage;
2. it is RE-printed after every optional stage that lands — so the last
   parseable line at any kill instant carries everything measured so far;
3. a spent budget skips remaining stages (named in skipped_over_budget)
   instead of running past the window;
4. total failure still prints a value-0 line.

The stage subprocesses are mocked (no TPU, no jax import — bench.py's
module top is import-light by design).
"""

import importlib.util
import io
import json
import os
import sys
from contextlib import redirect_stdout

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(HERE, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod.time, "sleep", lambda s: None)
    return mod


def _json_lines(text):
    out = []
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            out.append(json.loads(line))
    return out


def _fake_stage(name):
    return {"metric": f"{name}_metric" if name != "fused"
            else "ssd300_vgg16_batch1_fps",
            "value": 1.0, "unit": "u", "vs_baseline": 1.0}


def test_line_lands_after_primary_and_every_stage(bench, monkeypatch):
    ran = []

    def fake_run(name, timeout_s=0):
        ran.append(name)
        return _fake_stage(name)

    monkeypatch.setattr(bench, "_run_stage", fake_run)
    monkeypatch.setenv("SSDS_BENCH_BUDGET_S", "999999")
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main()
    lines = _json_lines(buf.getvalue())

    # primary line first, bare
    assert lines[0]["metric"] == "ssd300_vgg16_batch1_fps"
    assert "train" not in lines[0]
    # a re-print per landed optional stage: monotonically richer
    assert len(lines) >= 5
    for prev, cur in zip(lines, lines[1:]):
        assert set(prev).issubset(set(cur) | {"acceptance"})
    last = lines[-1]
    assert last["metric"] == "ssd300_vgg16_batch1_fps"
    for key in ("train", "serve_b32", "serve_b32_int8", "ssd512",
                "train_loader", "acceptance"):
        assert key in last, key
    # every parseable prefix of the run is a valid driver artifact:
    # the line printed right after the first optional stage already
    # carries that stage
    assert "train" in lines[1]


def test_kill_mid_ladder_leaves_best_so_far(bench, monkeypatch):
    """Simulate the driver killing the run after the int8 stage: the last
    COMPLETE stdout line must already carry train + b32 fp/int8."""

    class Killed(BaseException):
        pass

    def fake_run(name, timeout_s=0):
        if name.startswith("acc_") or name in ("fused512", "split512",
                                               "train_loader"):
            raise Killed()
        return _fake_stage(name)

    monkeypatch.setattr(bench, "_run_stage", fake_run)
    monkeypatch.setenv("SSDS_BENCH_BUDGET_S", "999999")
    buf = io.StringIO()
    with redirect_stdout(buf):
        with pytest.raises(Killed):
            bench.main()
    lines = _json_lines(buf.getvalue())
    last = lines[-1]
    for key in ("train", "serve_b32", "serve_b32_int8"):
        assert key in last, key


def test_budget_skips_and_names_stages(bench, monkeypatch):
    def fake_run(name, timeout_s=0):
        return _fake_stage(name)

    monkeypatch.setattr(bench, "_run_stage", fake_run)
    monkeypatch.setenv("SSDS_BENCH_BUDGET_S", "0")
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main()
    lines = _json_lines(buf.getvalue())
    last = lines[-1]
    assert last["metric"] == "ssd300_vgg16_batch1_fps"
    assert last["value"] == 1.0
    skipped = set(last["skipped_over_budget"])
    assert {"train", "serve32", "int8_32"}.issubset(skipped)
    assert "train" not in last  # skipped, not run


def test_all_stages_fail_still_prints_zero_line(bench, monkeypatch):
    monkeypatch.setattr(bench, "_run_stage", lambda n, timeout_s=0: None)
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main()
    lines = _json_lines(buf.getvalue())
    assert len(lines) == 1
    assert lines[0]["value"] == 0


def test_stage_timeout_capped_by_remaining_budget(bench, monkeypatch):
    """A hung optional stage may not eat past the budget: the subprocess
    timeout handed to _run_stage must shrink as budget drains."""
    seen = {}

    def fake_run(name, timeout_s=bench.STAGE_TIMEOUT_S):
        seen[name] = timeout_s
        return _fake_stage(name)

    monkeypatch.setattr(bench, "_run_stage", fake_run)
    monkeypatch.setenv("SSDS_BENCH_BUDGET_S", "200")
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main()
    optional = {k: v for k, v in seen.items() if k != "fused"}
    assert optional, "no optional stage ran"
    assert all(v <= 200 + 31 for v in optional.values()), optional
