"""The bench supervisor must survive a wedged TPU tunnel.

Round-2's official record (`BENCH_r02.json`) was a stack trace because
`jax.devices()` hung inside backend init with no retry. The supervisor
now isolates the measurement in a child process, retries with backoff,
and on final failure prints ONE diagnostic JSON line (parseable by the
driver) instead of a traceback. These tests exercise the supervisor
logic without touching any real backend.
"""

import json

import pytest

from unet_convlstm_tpu import benchmark


def test_parse_child_result_picks_last_valid_json():
    stdout = "\n".join([
        "[noise] compiling...",
        '{"metric": "m", "value": 1.0}',  # missing keys — rejected
        json.dumps({"metric": "m", "value": 2.0, "unit": "u",
                    "vs_baseline": 3.0}),
        "trailing log line",
    ])
    out = benchmark._parse_child_result(stdout)
    assert out == {"metric": "m", "value": 2.0, "unit": "u",
                   "vs_baseline": 3.0}


def test_parse_child_result_none_on_garbage():
    assert benchmark._parse_child_result("Traceback (most recent...)") is None
    assert benchmark._parse_child_result("") is None
    assert benchmark._parse_child_result("{not json") is None


def test_supervisor_retries_then_succeeds(monkeypatch, capsys):
    calls = []

    def fake_child(timeout_s):
        calls.append(timeout_s)
        if len(calls) < 2:
            return None, "timeout after 1s; last: acquiring devices"
        return {"metric": benchmark.METRIC, "value": 10500.0,
                "unit": "frames/sec/chip", "vs_baseline": 2239.0}, "ok"

    monkeypatch.setattr(benchmark, "_run_child", fake_child)
    monkeypatch.setattr(benchmark.time, "sleep", lambda s: None)
    rc = benchmark.main([])
    assert rc == 0
    assert len(calls) == 2
    out = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(out)
    assert parsed["value"] == 10500.0
    assert parsed["vs_baseline"] == 2239.0


def test_supervisor_final_failure_emits_diagnostic_json(monkeypatch, capsys):
    monkeypatch.setattr(benchmark, "_run_child",
                        lambda t: (None, "timeout after 1s"))
    monkeypatch.setattr(benchmark.time, "sleep", lambda s: None)
    rc = benchmark.main([])
    assert rc == 1
    out = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(out)  # MUST be one parseable JSON line
    assert parsed["metric"] == benchmark.METRIC
    assert parsed["value"] == 0.0
    assert "error" in parsed
    assert len(parsed["attempts"]) == benchmark.ATTEMPTS


def test_child_flag_bypasses_supervisor(monkeypatch, capsys):
    monkeypatch.setattr(
        benchmark, "run",
        lambda: {"metric": "m", "value": 1.0, "unit": "u",
                 "vs_baseline": 1.0})
    rc = benchmark.main(["--child"])
    assert rc == 0
    parsed = json.loads(capsys.readouterr().out.strip())
    assert parsed["value"] == 1.0


def test_run_child_reports_nonzero_rc(monkeypatch):
    """A child that dies (rc!=0) is reported with its stderr tail, and a
    real subprocess is exercised end-to-end (no jax involved)."""
    import sys

    def fake_run(cmd, cwd, capture_output, text, timeout):
        class P:
            returncode = 2
            stdout = ""
            stderr = "RuntimeError: TPU backend UNAVAILABLE\n"
        assert cmd[0] == sys.executable
        assert "--child" in cmd
        return P()

    monkeypatch.setattr(benchmark.subprocess, "run", fake_run)
    result, why = benchmark._run_child(5)
    assert result is None
    assert "rc=2" in why and "UNAVAILABLE" in why
