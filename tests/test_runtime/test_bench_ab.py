"""bench.py parent logic: the on-chip A/B over the staged kernel flags
(AIM_KERNEL_LN=mxu / AIM_EVAL_SOFTMAX=t, docs/benchmark.md knockout section)
must report the best-measuring config, keep the baseline's retry guarantee,
and honor AIM_BENCH_NO_AB. The child measurement itself is exercised on real
hardware by the driver; here subprocess.run is stubbed."""

import json
import subprocess
import sys
import types

import pytest

sys.path.insert(0, ".")  # repo root (bench.py lives next to tests/)
import bench  # noqa: E402


class _Result(types.SimpleNamespace):
    pass


def _line(value):
    return json.dumps({
        "metric": "aim_vitb16_8f_eval_throughput",
        "value": value,
        "unit": "clips/sec/chip",
        "vs_baseline": round(value / bench.A100_BASELINE_CLIPS_PER_S, 3),
    })


def _stub(values_by_config):
    """subprocess.run stub returning a canned line keyed on the env flags."""
    calls = []

    def run(cmd, env=None, **kw):
        key = (env.get("AIM_KERNEL_LN", ""), env.get("AIM_EVAL_SOFTMAX", ""))
        calls.append(key)
        spec = values_by_config[key]
        if isinstance(spec, Exception):
            raise spec
        if spec is None:
            return _Result(returncode=1, stdout="", stderr="boom")
        return _Result(returncode=0, stdout=_line(spec) + "\n", stderr="")

    return run, calls


def test_best_config_wins(monkeypatch, capsys):
    run, calls = _stub({
        ("", ""): 340.0,
        ("mxu", ""): 365.0,
        ("", "t"): 350.0,
        ("mxu", "t"): 360.0,
    })
    monkeypatch.setattr(subprocess, "run", run)
    monkeypatch.delenv("AIM_BENCH_NO_AB", raising=False)
    assert bench.run_with_watchdog() == 0
    out = capsys.readouterr()
    got = json.loads(out.out.strip().splitlines()[-1])
    assert got["value"] == 365.0
    assert got["vs_baseline"] == pytest.approx(365.0 / 309.0, abs=1e-3)
    assert "best config = ln=mxu" in out.err
    assert len(calls) == 4  # baseline + 3 flips, one attempt each


def test_no_ab_runs_baseline_only(monkeypatch, capsys):
    run, calls = _stub({("", ""): 340.0})
    monkeypatch.setattr(subprocess, "run", run)
    monkeypatch.setenv("AIM_BENCH_NO_AB", "1")
    assert bench.run_with_watchdog() == 0
    assert calls == [("", "")]
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["value"] == 340.0


def test_failing_flip_does_not_lose_baseline(monkeypatch, capsys):
    run, calls = _stub({
        ("", ""): 340.0,
        ("mxu", ""): None,          # child exits nonzero every attempt
        ("", "t"): 330.0,
        ("mxu", "t"): None,
    })
    monkeypatch.setattr(subprocess, "run", run)
    monkeypatch.delenv("AIM_BENCH_NO_AB", raising=False)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.run_with_watchdog() == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["value"] == 340.0  # baseline survives flip failures
    # flips retry at most once after the baseline number exists
    assert calls.count(("mxu", "")) == 2
    assert calls.count(("mxu", "t")) == 2


def test_baseline_failure_returns_nonzero(monkeypatch):
    run, _ = _stub({("", ""): None, ("mxu", ""): None, ("", "t"): None,
                    ("mxu", "t"): None})
    monkeypatch.setattr(subprocess, "run", run)
    monkeypatch.delenv("AIM_BENCH_NO_AB", raising=False)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setenv("AIM_BENCH_DEADLINE_S", "1")
    assert bench.run_with_watchdog() == 1
