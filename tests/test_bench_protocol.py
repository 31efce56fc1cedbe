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


def test_corroborated_envelope_ignores_single_outlier():
    """A lone fast estimate (mid-pair phase flip under the 2x floor —
    round-4 observed 1.46x median) cannot set the envelope; the fastest
    SUPPORTED estimate wins."""
    # per-iter seconds: cluster at ~6.3 ms plus one uncorroborated 4.3 ms
    est = [0.0043, 0.0063, 0.00635, 0.0064, 0.0068, 0.0070]
    assert bench.corroborated_envelope(est) == 0.0063


def test_corroborated_envelope_keeps_supported_fast_phase():
    """Two clear-path samples within 3% of each other define the
    envelope even when most of the window sat in the slow phase."""
    est = [0.0057, 0.00575, 0.0074, 0.0075, 0.0076]
    assert bench.corroborated_envelope(est) == 0.0057


def test_corroborated_envelope_degenerate_windows():
    # all-isolated estimates: the second-fastest wins (one unsupported
    # outlier never sets the envelope); singleton passes through
    assert bench.corroborated_envelope([0.004, 0.006, 0.009]) == 0.006
    assert bench.corroborated_envelope([0.0071]) == 0.0071


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


def _run_main_with_stubs(monkeypatch, batch):
    """Drive bench.main() with the device surfaces stubbed out; returns
    the emitted metric names in order. Pins the aux/headline line
    structure the driver and BENCH_r0N.json consumers rely on."""
    import json

    import ground_plane_polling_tpu.inference as inference
    import ground_plane_polling_tpu.models as models

    class _FakeModel:
        def init(self, *a, **k):
            return {}

        def apply(self, *a, **k):  # pragma: no cover - int8 aux disabled
            raise AssertionError("apply should not run in the stubbed bench")

    monkeypatch.setattr(models, "build_detector", lambda *a, **k:
                        _FakeModel())
    monkeypatch.setattr(inference, "make_detect_fn",
                        lambda *a, **k: object())
    monkeypatch.setattr(bench, "measure_envelope",
                        lambda *a, **k: (0.005, [0.005, 0.0055, 0.006]))
    monkeypatch.setattr(bench, "_flops_per_call", lambda *a, **k: 1.0e12)
    monkeypatch.setattr(bench, "BATCH", batch)
    # the int8 aux line needs a real calibration pass — out of scope here
    monkeypatch.setattr(bench, "INT8_WINDOW_SECS", 0.0)
    lines = []
    monkeypatch.setattr("builtins.print",
                        lambda *a, **k: lines.append(a[0] if a else ""))
    bench.main()
    return [json.loads(ln)["metric"] for ln in lines]


def test_main_emits_aux_then_b4_headline(monkeypatch):
    """Default run: b1 envelope + median + MFU and b2 aggregate are aux
    lines; the b4 aggregate headline is LAST (driver parses the final
    line). Old b1 metric names survive for BENCH_r01-r03 comparability."""
    metrics = _run_main_with_stubs(monkeypatch, batch=1)
    assert metrics == [
        "gpp_resnet50_e2e_inference",
        "gpp_b1_estimate_spread_median_n3",
        "gpp_resnet50_e2e_mfu",
        "gpp_resnet50_e2e_inference_b2",
        "gpp_b4_estimate_spread_median_n3",
        "gpp_resnet50_e2e_throughput_b4",
    ]


def test_main_batch_override_measures_only_that_batch(monkeypatch):
    """GPP_BENCH_BATCH != 1 measures that batch as the headline and skips
    every aux block (A/B sweeps should not pay extra measurement time)."""
    metrics = _run_main_with_stubs(monkeypatch, batch=8)
    assert metrics == [
        "gpp_b8_estimate_spread_median_n3",
        "gpp_resnet50_e2e_throughput_b8",
    ]


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
