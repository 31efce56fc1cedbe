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
    # all-isolated estimates: the 0.004 outlier is capped out (1.5x the
    # 0.006 median > the 1.35x phase ratio); the fallback never skips
    # PAST the median — returning 0.009 here would report a sub-median
    # "envelope" that reads as a device regression (round-5 review)
    assert bench.corroborated_envelope([0.004, 0.006, 0.009]) == 0.006
    assert bench.corroborated_envelope([0.0071]) == 0.0071
    # when the uncorroborated fallback's second-fastest capped estimate
    # is FASTER than the median, it still wins (one unsupported outlier
    # never sets the envelope)
    assert bench.corroborated_envelope(
        [0.0050, 0.0054, 0.0060, 0.0062, 0.0090]) == 0.0054
    # a mutually-corroborating SLOW-TAIL pair must not set a sub-median
    # envelope either: the 0.009/0.0091 pair corroborates but the median
    # clamp keeps the better mid-window estimate (round-5 review)
    assert bench.corroborated_envelope(
        [0.004, 0.0055, 0.006, 0.009, 0.0091]) == 0.006


def test_corroborated_envelope_rejects_twin_artifacts():
    """TWO independent mid-pair flips can land within 3% of each other
    and corroborate a phantom; the median-relative cap (1.35x, the
    measured bimodal phase ratio) rejects them regardless (round-4
    ADVICE item)."""
    # twin artifacts at ~1.56x the 0.0064 median, mutually within 3%
    est = [0.0040, 0.0041, 0.0063, 0.0064, 0.0065, 0.0068, 0.0070]
    assert bench.corroborated_envelope(est) == 0.0063
    # a REAL clear-path pair inside the 1.35x cap still wins
    est2 = [0.0050, 0.00505, 0.0064, 0.0065, 0.0066]
    assert bench.corroborated_envelope(est2) == 0.0050


def test_phase_evidence_line_content(monkeypatch):
    """The phase-evidence aux line carries the envelope/median gap plus
    the raw rate spread so a reader can tell a device regression from
    relay weather (round-4 VERDICT item 2)."""
    import json

    lines = []
    monkeypatch.setattr("builtins.print",
                        lambda *a, **k: lines.append(a[0] if a else ""))
    bench.emit_phase_evidence("b4", 4, 0.02, [0.02, 0.021, 0.027], 180.0)
    rec = json.loads(lines[-1])
    assert rec["metric"] == "gpp_phase_evidence_b4"
    assert rec["unit"] == "pct_envelope_above_median"
    assert rec["rate_envelope"] == 200.0
    median = 4 / 0.021
    assert rec["rate_median"] == pytest.approx(median, abs=0.01)
    assert rec["value"] == pytest.approx(100 * (200.0 / median - 1),
                                         abs=0.01)
    assert rec["rate_min"] == pytest.approx(4 / 0.027, abs=0.01)
    assert rec["rate_max_raw"] == 200.0
    assert rec["n_estimates"] == 3
    assert rec["pair"] == [bench.N1, bench.N2]
    assert rec["window_secs"] == 180.0


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
        "gpp_phase_evidence_b1",
        "gpp_resnet50_e2e_mfu",
        "gpp_resnet50_e2e_inference_b2",
        "gpp_b4_estimate_spread_median_n3",
        "gpp_phase_evidence_b4",
        "gpp_resnet50_e2e_throughput_b4",
    ]


def test_main_batch_override_measures_only_that_batch(monkeypatch):
    """GPP_BENCH_BATCH != 1 measures that batch as the headline and skips
    every aux block (A/B sweeps should not pay extra measurement time)."""
    metrics = _run_main_with_stubs(monkeypatch, batch=8)
    assert metrics == [
        "gpp_b8_estimate_spread_median_n3",
        "gpp_phase_evidence_b8",
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


def test_floor_retry_keeps_plausible_window(monkeypatch):
    calls = []

    def measure():
        calls.append(1)
        return 0.02, [0.02, 0.021]  # b4 -> 200 img/s aggregate

    per, est = bench.measure_with_floor_retry(
        "b4", 4, 160.0, measure, settle_secs=0.0)
    assert per == 0.02 and len(calls) == 1


def test_floor_retry_remeasures_stalled_window(capsys):
    # first window fully stalled (b4 aggregate 50 img/s < the 160 img/s
    # b1-envelope floor), second healthy; the better window wins and the
    # discarded attempt is recorded as a gpp_window_stall_retry_* line
    seq = [(0.08, [0.08, 0.081]), (0.019, [0.019, 0.02])]

    def measure():
        return seq.pop(0)

    per, est = bench.measure_with_floor_retry(
        "b4", 4, 160.0, measure, settle_secs=0.0)
    assert per == 0.019
    out = capsys.readouterr().out
    assert "gpp_window_stall_retry_b4" in out and "50.0" in out


def test_floor_retry_escalates_through_repeated_stalls(capsys):
    # both early windows stalled (the 2026-08-21 b2 production case:
    # the single 90 s-settle retry re-measured a still-stalled window);
    # the default 2-attempt escalation reaches the healthy third window
    seq = [(0.27, [0.27]), (0.26, [0.26]), (0.02, [0.02, 0.021])]
    per, _ = bench.measure_with_floor_retry(
        "b2", 2, 100.0, lambda: seq.pop(0), settle_secs=0.0, retries=2)
    assert per == 0.02
    assert capsys.readouterr().out.count("gpp_window_stall_retry_b2") == 2


def test_floor_retry_gives_up_after_bounded_attempts(capsys):
    seq = [(0.27, [0.27]), (0.28, [0.28]), (0.26, [0.26])]
    per, _ = bench.measure_with_floor_retry(
        "b2", 2, 100.0, lambda: seq.pop(0), settle_secs=0.0, retries=2)
    assert per == 0.26  # best of the three stalled windows, published
    assert not seq  # exactly retries+1 = 3 windows measured


def test_floor_retry_keeps_first_if_retry_worse(capsys):
    seq = [(0.08, [0.08]), (0.09, [0.09])]
    per, _ = bench.measure_with_floor_retry(
        "b4", 4, 160.0, lambda: seq.pop(0), settle_secs=0.0, retries=1)
    assert per == 0.08
    # the retry line records the DISCARDED window's own rate (4/0.09 =
    # 44.4), not the published best-so-far — the artifact must account
    # for every attempt (round-5 review)
    assert "44.4" in capsys.readouterr().out


def test_floor_retry_skipped_without_floor():
    calls = []

    def measure():
        calls.append(1)
        return 0.5, [0.5]  # absurdly slow, but no b1 floor available

    per, _ = bench.measure_with_floor_retry("b4", 4, None, measure,
                                            settle_secs=0.0)
    assert per == 0.5 and len(calls) == 1


def test_retry_on_dead_relay_signatures(monkeypatch):
    """Transient relay failures (registration AND mid-run RPC drops)
    re-exec; anything else re-raises unchanged."""
    execs = []
    monkeypatch.setattr(bench.os, "execv", lambda *a: execs.append(a))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setenv("GPP_BENCH_EXEC_RETRIES", "2")
    for msg in ("Backend 'axon' is not in the list of known backends",
                "INTERNAL: http://127.0.0.1:8093/remote_compile: read "
                "body: response body closed before all bytes were read"):
        bench._retry_on_dead_relay(RuntimeError(msg))
    assert len(execs) == 2
    with pytest.raises(RuntimeError, match="genuine bug"):
        bench._retry_on_dead_relay(RuntimeError("genuine bug"))
    # exhausted budget re-raises even transient failures
    monkeypatch.setenv("GPP_BENCH_EXEC_RETRIES", "0")
    with pytest.raises(RuntimeError):
        bench._retry_on_dead_relay(RuntimeError("axon relay blip"))
