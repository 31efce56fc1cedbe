"""bench.py measurement-protocol unit tests (no TPU needed)."""

import numpy as np
import pytest

import bench


def test_robust_estimates_drops_phase_flip_artifacts():
    # plausible bimodal estimates (seconds/iter) + one near-zero artifact
    # from a phase flip between a pair's two runs + one negative
    est = [0.0065, 0.0082, 0.0079, 0.00052, 0.0068, -0.001, 0.0085]
    valid = bench.robust_estimates(est)
    assert 0.00052 not in valid and -0.001 not in valid
    assert min(valid) == 0.0065
    assert len(valid) == 5


def test_robust_estimates_keeps_clean_windows():
    est = [0.0065, 0.0082, 0.0079, 0.0068, 0.0085]
    assert bench.robust_estimates(est) == sorted(est)


def test_robust_estimates_all_invalid_raises():
    with pytest.raises(RuntimeError):
        bench.robust_estimates([-0.1, 0.0])


def test_pair_env_override(monkeypatch):
    """GPP_BENCH_PAIR selects the differencing pair; default is the
    long (25,125) pair (mid-pair phase flips average out inside one
    125-iteration run; see tools/verify_envelope.py)."""
    import importlib

    monkeypatch.delenv("GPP_BENCH_PAIR", raising=False)
    try:
        assert (importlib.reload(bench).N1, bench.N2) == (25, 125)
        monkeypatch.setenv("GPP_BENCH_PAIR", "5,25")
        assert (importlib.reload(bench).N1, bench.N2) == (5, 25)
        # invalid pairs die loudly at import, before any TPU compile
        for bad in ("25", "25,25", "125,25"):
            monkeypatch.setenv("GPP_BENCH_PAIR", bad)
            with pytest.raises(SystemExit):
                importlib.reload(bench)
    finally:
        monkeypatch.delenv("GPP_BENCH_PAIR", raising=False)
        importlib.reload(bench)


def test_headline_is_final_json_line(monkeypatch):
    """The driver parses the LAST stdout line; it must be the headline."""
    import io
    import json
    import sys

    lines = []
    monkeypatch.setattr(
        "builtins.print",
        lambda *a, **k: lines.append(a[0] if a else ""))
    bench.emit("aux_metric", 1.0, "u", 0.1)
    bench.emit("gpp_resnet50_e2e_throughput_b4", 208.0, "images/sec/chip",
               20.8)
    parsed = json.loads(lines[-1])
    assert parsed["metric"] == "gpp_resnet50_e2e_throughput_b4"
    assert set(parsed) == {"metric", "value", "unit", "vs_baseline"}
