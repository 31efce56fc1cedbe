"""End-to-end GPP inference benchmark (driver contract).

Measures KITTI-resolution end-to-end inference (ResNet-50 backbone,
bfloat16 compute, decode + NMS + 1k-plane polling + pose) on one TPU chip,
in images/sec, against BASELINE.md's 10 fps reference estimate.

HEADLINE = batch-4 aggregate throughput (`gpp_resnet50_e2e_throughput_b4`).
Chosen for phase-robustness (round-3 VERDICT item 8): the b4 aggregate
reproduced within 2.2% across three clear-relay builder sessions
(203.9 / 207.8 / 208.3 img/s, docs/PERFORMANCE.md sessions I/L/N) while the
batch-1 envelope spanned 149.8-176.8 purely with relay phase. HONEST
spread across ALL recorded captures including degraded-relay windows is
wider: the round-4 driver capture landed at 196.4 (~6% below the
clear-relay band; docs/PERFORMANCE.md "Round 4/5 bench captures"). Every
measurement therefore emits a gpp_phase_evidence_* line (envelope/median
gap, rate min/median/max, window, pair) so a reader can tell a device
regression from relay weather without trusting the builder; and any
batch>1 window whose aggregate rate lands below STALL_FLOOR_FRACTION x
this run's own b1 envelope — outside what a legitimate phase change can
explain, so the relay stalled through the window — is re-measured
(bounded, escalating settle), with a gpp_window_stall_retry_* line per
discarded window (observed 2026-08-21: a fully-stalled 60 s window
'measured' int8+fuse b4 at 51.6 img/s vs its 243-305 documented band;
in-window statistics cannot flag a window that is stalled end to end).
The b1 window itself retries against an absolute sanity floor
(B1_SANITY_FLOOR) since it seeds the others' floors. The b1
single-image envelope + median remain as aux lines for round-over-round
comparability with BENCH_r0{1,2,3}.json (whose headline was the b1
envelope) — NOTE: from r04 the estimator under those names is STRICTER
(corroborated + median-capped min, see below) and reads <= the raw-min
envelope BENCH_r0{1,2,3} used on identical samples.

Timing protocol (important on this remote-relay setup, where
block_until_ready returns before device completion): iterations are CHAINED
— each call's input depends on the previous call's output — and completion
is forced by fetching a scalar of the final output to the host. The fixed
relay round-trip is removed by differencing two run lengths:
  rate = (N2 - N1) / (t(N2) - t(N1))

Batch-1 throughput through the relay is BIMODAL with relay phase (~135 vs
~165 img/s envelope, config-independent; docs/PERFORMANCE.md session G), so
a back-to-back best-of-3 samples whichever phase the relay happens to be
in. Each measurement instead spreads differenced estimates across a time
window (headline: GPP_BENCH_WINDOW_SECS, default 180 s; b1 aux:
GPP_BENCH_B1_WINDOW_SECS, default 300 s — the same window the BENCH_r0{1,2,3}
b1 envelopes were measured over; session M showed a 150 s window can sample
only a degraded band (headline 149.8 vs 175-177 real). Relay phases flip on
minute scales; estimates ~10 s apart) and reports the CORROBORATED
envelope — the fastest estimate supported by a second independent estimate
within 3% and no faster than 1.35x the window median (the measured phase
ratio); see corroborated_envelope. This tracks the device's actual
clear-path throughput rather than the relay's mood, and is immune to the
single- and double-artifact inflation modes raw min suffers.

The differencing pair is LONG — (N1, N2) = (25, 125) — because a relay
phase flip BETWEEN a pair's two runs shrinks t2-t1 and inflates the
estimate; a same-session A/B (tools/verify_envelope.py, docs/PERFORMANCE.md
round 3) measured short (5, 25) pairs inflating the b1 envelope 259 vs 168
img/s and b4 245 vs a dead-tight 203, while long pairs agree with the
median to within the real phase spread. 100 differenced iterations put a
mid-pair flip inside one run where it averages out.

The reference publishes no numbers; its per-image frame-rate print
(run_network.py:108-111) on the Keras/TF-1.9 stack runs a ~5 fps-class
pipeline on a contemporary GPU. vs_baseline is reported against 10 img/s —
a deliberately generous estimate — so vs_baseline = measured / 10.0.

Prints auxiliary JSON lines (b1 envelope + estimate-spread median, MFU,
batch-2 aggregate, batch-4 int8+fuse) followed by the headline JSON line
LAST:
  {"metric", "value", "unit", "vs_baseline"}.
Env overrides: GPP_BENCH_PLANES, GPP_BENCH_BATCH (!= 1 measures only that
batch, as the headline), GPP_BENCH_FUSE, GPP_BENCH_TOPK,
GPP_BENCH_WINDOW_SECS (headline window), GPP_BENCH_B1_WINDOW_SECS (0 skips
the b1 aux lines), GPP_BENCH_AUX_WINDOW_SECS (0 skips the batch-2 line),
GPP_BENCH_REPEATS (minimum estimates per window), GPP_BENCH_PAIR ("N1,N2"
differencing pair, default "25,125").
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_FPS_ESTIMATE = 10.0
# Calibrated bf16 matmul ceiling measured on this chip (docs/PERFORMANCE.md
# "device calibration"): large bf16 matmuls sustain ~184 TFLOP/s.
PEAK_BF16_TFLOPS = 184.0

# KITTI 375x1242 resized to min-side 800 / max-side 1333 => 403x1333;
# padded to multiples of 32 — the data pipeline's actual bucket
# (pad_multiple=32). The previous 128-multiple bucket (512x1408) carried
# 29% more pixels than the image content needs; the tighter bucket is
# 25-30% faster end-to-end at identical resize scale (interleaved
# phase-fair A/B, docs/PERFORMANCE.md round 3).
IMAGE_SHAPE = (416, 1344)
N_PLANES = int(os.environ.get("GPP_BENCH_PLANES", 1024))
BATCH = int(os.environ.get("GPP_BENCH_BATCH", 1))
def parse_pair(env_name="GPP_BENCH_PAIR", default="25,125"):
    """Validated 'N1,N2' differencing-pair env parse (dies loudly before
    any TPU compile). Shared with tools that expose their own pair knob."""
    raw = os.environ.get(env_name, default)
    try:
        n1, n2 = (int(n) for n in raw.split(","))
    except ValueError:
        raise SystemExit(f"{env_name} must be 'N1,N2' (two integers)")
    if not 0 < n1 < n2:
        raise SystemExit(f"{env_name} needs 0 < N1 < N2, got {n1},{n2}")
    return n1, n2


N1, N2 = parse_pair()
MIN_ESTIMATES = int(os.environ.get("GPP_BENCH_REPEATS", 3))
WINDOW_SECS = float(os.environ.get("GPP_BENCH_WINDOW_SECS", 180))
B1_WINDOW_SECS = float(os.environ.get("GPP_BENCH_B1_WINDOW_SECS", 300))
AUX_WINDOW_SECS = float(os.environ.get("GPP_BENCH_AUX_WINDOW_SECS", 60))
FUSE = os.environ.get("GPP_BENCH_FUSE", "0") == "1"
TOP_K = int(os.environ.get("GPP_BENCH_TOPK", 1024))
# int8 PTQ conv trunk (models/quantize.py). INT8=1 makes it the measured
# config (metric names get an _int8 suffix — accuracy differs from bf16,
# so it never silently replaces the headline); INT8_WINDOW_SECS > 0 adds
# an int8 aux line at batch 4 — the regime where int8 wins (+42%
# aggregate; at b1 the pipeline is dispatch-bound and int8 is neutral,
# docs/PERFORMANCE.md round 3 session I) — to a default bf16 run.
# 0 disables the aux line; it only runs on a default BATCH == 1 bench
# (batch-override A/B sweeps should not pay a fresh int8 compile).
INT8 = os.environ.get("GPP_BENCH_INT8", "0") == "1"
INT8_WINDOW_SECS = float(os.environ.get("GPP_BENCH_INT8_WINDOW_SECS", 60))
INT8_AUX_BATCH = 4


def chained_run_fn(run_once, images, scalar_of, iters):
    """Run `iters` dependent calls of run_once(images + carry); returns
    elapsed wall time including one final host fetch that forces the
    whole chain. Generic core shared with tools/profile_batch_knee.py."""
    carry = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run_once(images + carry)
        carry = scalar_of(out) * 0.0  # tiny dependency, keeps shapes fixed
    np.asarray(carry)  # host fetch = real completion of every iteration
    return time.perf_counter() - t0


def chained_run(fn, variables, images, P_inv, planes, iters):
    """Run `iters` dependent inference calls; returns elapsed wall time
    including one final host fetch that forces the whole chain."""
    return chained_run_fn(lambda im: fn(variables, im, P_inv, planes),
                          images, lambda o: o.scores[0, 0], iters)


def measure_envelope_fn(run_once, images, scalar_of,
                        window_secs, min_estimates, pair=None):
    """Differenced per-iter estimates spread across a time window.

    Returns (best_per_iter, valid_estimates): consecutive estimates are
    spaced up to ~10 s apart so the window samples both relay phases; the
    minimum per-iter time is the clear-path envelope. This is THE
    measurement protocol — every harness (bench.py, verify_envelope,
    profile_batch_knee) must go through it so protocol fixes (long pairs,
    artifact floor) apply everywhere at once.
    """
    n1, n2 = pair if pair is not None else (N1, N2)
    chained_run_fn(run_once, images, scalar_of, 2)  # compile + warm
    estimates = []
    t_start = time.perf_counter()
    while True:
        t1 = chained_run_fn(run_once, images, scalar_of, n1)
        t2 = chained_run_fn(run_once, images, scalar_of, n2)
        estimates.append((t2 - t1) / (n2 - n1))
        elapsed = time.perf_counter() - t_start
        if elapsed >= window_secs and len(estimates) >= min_estimates:
            break
        time.sleep(min(10.0, max(0.5, window_secs / 15.0)))
    valid = robust_estimates(estimates)
    return corroborated_envelope(valid), valid


def measure_envelope(fn, variables, images, P_inv, planes,
                     window_secs, min_estimates):
    """measure_envelope_fn specialized to a detect-fn call signature."""
    return measure_envelope_fn(
        lambda im: fn(variables, im, P_inv, planes), images,
        lambda o: o.scores[0, 0], window_secs, min_estimates)


def corroborated_envelope(valid, tol=0.03, cap_ratio=1.35):
    """Fastest per-iter time SUPPORTED by a second independent estimate
    within `tol` (3%) AND no faster than `cap_ratio`x the window median.

    robust_estimates' 2x floor only drops gross differencing artifacts;
    a mid-pair phase flip can still mint a single estimate ~1.3-1.5x the
    window median (observed round 4: a 231.8 img/s b1 "envelope", 1.46x
    the 158.7 median, vs the corroborated 188.8 record at this bucket).
    A real clear-path phase lasts minutes and is sampled several times
    across the 10 s-spaced window, so the true envelope always has a
    neighbour within a few percent; an artifact usually appears once.
    TWO independent mid-pair flips can land within 3% of each other and
    corroborate a phantom, so candidates faster than cap_ratio x the
    median are rejected outright — 1.35 is the measured bimodal phase
    ratio (docs/PERFORMANCE.md session G), the largest envelope/median
    gap a real clear-path phase can produce. With no supported estimate
    anywhere, the SECOND-fastest capped time wins (conservative: one
    unsupported outlier never sets the envelope). EVERY return path is
    clamped to the window median — in a sparse window the cap can drop
    the fastest estimate and leave only slow-tail candidates (or a
    mutually-corroborating slow-tail pair), and reporting anything
    slower than the median as the "envelope" reads as a device
    regression when the median itself is the better clear-path
    estimate. A single-estimate window is returned unchanged."""
    ts = sorted(valid)
    if len(ts) == 1:
        return ts[0]
    median = ts[len(ts) // 2]
    floor = median / cap_ratio
    capped = [t for t in ts if t >= floor]
    for i in range(len(capped) - 1):
        if capped[i + 1] <= capped[i] * (1.0 + tol):
            return min(capped[i], median)
    return min(capped[1], median) if len(capped) > 1 else capped[0]


def robust_estimates(estimates):
    """Drop differencing artifacts from a list of per-iter estimates.

    A relay phase flip BETWEEN a pair's two runs can make t2-t1 tiny or
    negative (observed: a 1900 img/s "estimate", 14x the device rate).
    The bimodal phases differ by ~1.35x, so any estimate faster than
    half the median of the positive estimates is an artifact, not the
    device."""
    finite = sorted(e for e in estimates if e > 0)
    if not finite:
        raise RuntimeError(f"no positive estimates in {estimates}")
    floor = finite[len(finite) // 2] / 2.0
    return [e for e in finite if e >= floor]


# transient relay failure signatures that a fresh process recovers from:
# per-process registration ("axon ... not in the list of known backends")
# and mid-run RPC drops on the relay's compile/load service (observed
# round-5 gate: "remote_compile: read body: response body closed before
# all bytes were read" killed the bench AFTER four good windows)
_TRANSIENT_RELAY_SIGNATURES = ("axon", "remote_compile",
                               "response body closed", "connection reset",
                               "connection refused")


def _retry_on_dead_relay(exc: BaseException) -> None:
    """The axon relay registers per-process at interpreter startup and
    fails transiently; a failed registration cannot be repaired in-process,
    and a dropped compile-service RPC poisons the backend mid-run.
    Re-exec the interpreter (bounded by GPP_BENCH_EXEC_RETRIES) so the
    round's headline measurement survives a relay blip."""
    import sys

    msg = str(exc).lower()
    if not any(sig in msg for sig in _TRANSIENT_RELAY_SIGNATURES):
        raise exc
    tries = int(os.environ.get("GPP_BENCH_EXEC_RETRIES", "10"))
    if tries <= 0:
        raise exc
    os.environ["GPP_BENCH_EXEC_RETRIES"] = str(tries - 1)
    print(f"transient relay failure ({exc}); re-exec in 60s "
          f"({tries} attempts left)", file=sys.stderr, flush=True)
    time.sleep(60)
    os.execv(sys.executable, [sys.executable] + sys.argv)


def _inputs(rng, batch, image_shape=None, n_planes=None):
    """Synthetic bench inputs (KITTI-plausible calib + plane ranges).
    Shape/plane count default to this module's config; tools profiling
    other buckets pass their own."""
    image_shape = IMAGE_SHAPE if image_shape is None else image_shape
    n_planes = N_PLANES if n_planes is None else n_planes
    images = jnp.asarray(
        rng.uniform(-128, 128, (batch, *image_shape, 3)), jnp.float32)
    P = np.array([[721.5, 0.0, 609.6, 44.9],
                  [0.0, 721.5, 172.9, 0.2],
                  [0.0, 0.0, 1.0, 0.003]])
    P_inv = jnp.asarray(
        np.tile(np.linalg.pinv(P)[None], (batch, 1, 1)), jnp.float32)
    planes = np.stack([
        rng.uniform(-0.05, 0.05, n_planes),
        np.ones(n_planes),
        rng.uniform(-0.05, 0.05, n_planes),
        rng.uniform(-2.5, -1.0, n_planes),
    ], axis=1)
    planes = jnp.asarray(np.tile(planes[None], (batch, 1, 1)), jnp.float32)
    return images, P_inv, planes


def _flops_per_call(fn, variables, images, P_inv, planes):
    """XLA cost-analysis FLOPs of one compiled inference call (or None)."""
    try:
        compiled = fn.lower(variables, images, P_inv, planes).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        return float(analysis["flops"])
    except Exception:
        return None


def emit(metric, value, unit, vs_baseline):
    print(json.dumps({"metric": metric, "value": round(value, 3),
                      "unit": unit, "vs_baseline": round(vs_baseline, 3)}),
          flush=True)


def emit_phase_evidence(label, batch, per_iter, estimates, window_secs):
    """Relay-phase evidence attached to a measurement window (round-4
    VERDICT item 2): enough statistics that a reader can tell a device
    regression (envelope AND median low, tight spread) from relay weather
    (wide envelope/median gap, or a window whose whole rate range sits in
    the degraded band) without trusting the builder. Extra keys beyond
    the driver's 4-field schema are legal on aux lines — the driver
    parses only the FINAL stdout line."""
    rates = sorted(batch / e for e in estimates)
    median = rates[len(rates) // 2]
    envelope = batch / per_iter
    rec = {
        "metric": f"gpp_phase_evidence_{label}",
        "value": round(100.0 * (envelope / median - 1.0), 3),
        "unit": "pct_envelope_above_median",
        "vs_baseline": 0.0,
        "n_estimates": len(rates),
        "rate_min": round(rates[0], 3),
        "rate_median": round(median, 3),
        "rate_max_raw": round(rates[-1], 3),
        "rate_envelope": round(envelope, 3),
        "window_secs": window_secs,
        "pair": [N1, N2],
    }
    print(json.dumps(rec), flush=True)


STALL_RETRIES = int(os.environ.get("GPP_BENCH_STALL_RETRIES", 2))
# absolute sanity floor for the b1 envelope itself (img/s): far below
# every recorded legitimate b1 envelope (149.8-176.8 across all rounds,
# 154-164 on degraded-relay days) and far above fully-stalled readings
# (15-80 observed). Seeds the cross-line floors below even when the b1
# window is the one that stalls.
B1_SANITY_FLOOR = float(os.environ.get("GPP_BENCH_B1_SANITY_FLOOR", 100.0))
# cross-line floors carry a margin: a later window may legitimately
# sample a worse (slow-but-healthy) relay phase than the b1 window did —
# the documented bimodal phase ratio is ~1.35x (session G), so anything
# above b1_envelope/1.4 is plausible weather, while stalled windows read
# 3-10x below the b1 envelope.
STALL_FLOOR_FRACTION = 0.7


def measure_with_floor_retry(label, batch, floor_rate, measure,
                             settle_secs=90.0, retries=None):
    """Run a measurement window; re-run it (bounded) while the result is
    physically implausible (round-4 VERDICT item 2's 'health-gated
    retry').

    `floor_rate` is a cross-line bound (see main(): STALL_FLOOR_FRACTION
    x the run's own b1 envelope, itself sanity-floored at
    B1_SANITY_FLOOR): a larger-batch window landing well below the
    same run's batch-1 rate means the relay stalled through the whole
    window — in-window statistics cannot flag that, a fully-stalled
    window is internally consistent (observed 2026-08-21: int8+fuse b4
    'measured' 51.6 img/s against a 243-305 documented band while the
    same run's b1 bf16 envelope was 161). The margin keeps a
    legitimately degraded-phase window (<=1.35x slower, session G's
    bimodal ratio) from triggering a false retry that would bias the
    published line upward via best-of-N selection.
    On an implausible window: wait out the stall (settle doubles per
    attempt — measured stall phases run minutes, and the first
    production retry at 90 s re-measured a still-stalled b2 window),
    re-measure, keep the BEST window overall, and emit one
    gpp_window_stall_retry_* line per DISCARDED window with that
    window's own rate (so the artifact records every attempt: N retry
    lines + the published best). Bounded: GPP_BENCH_STALL_RETRIES
    attempts (default 2, <=8.5 min added worst case), none when
    floor_rate is None (b1 aux lines skipped, e.g. under
    GPP_BENCH_BATCH overrides)."""
    if retries is None:
        retries = STALL_RETRIES
    best = measure()
    attempts = 0
    while (floor_rate is not None and attempts < retries
           and batch / best[0] < floor_rate):
        time.sleep(settle_secs * (2.0 ** attempts))
        attempts += 1
        again = measure()
        discarded = best if again[0] < best[0] else again
        rate_d = batch / discarded[0]
        emit(f"gpp_window_stall_retry_{label}", rate_d, "images/sec/chip",
             rate_d / REFERENCE_FPS_ESTIMATE)
        if again[0] < best[0]:
            best = again
    return best


def main():
    from ground_plane_polling_tpu.inference import make_detect_fn
    from ground_plane_polling_tpu.models import build_detector

    rng = np.random.RandomState(0)
    model = build_detector("resnet50", num_classes=1, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *IMAGE_SHAPE, 3), jnp.float32))
    if FUSE:
        from ground_plane_polling_tpu.models import fuse_detector_params

        model = build_detector("resnet50", num_classes=1, dtype=jnp.bfloat16,
                               fuse_cls_dim=True)
        variables = fuse_detector_params(variables)
    images, P_inv, planes = _inputs(rng, BATCH)

    def _quant_scales():
        from ground_plane_polling_tpu.models.quantize import collect_scales

        return collect_scales(lambda v, im: model.apply(v, im),
                              [(variables, images)])

    suffix = ""
    quant_scales = None
    if INT8:
        quant_scales = _quant_scales()
        suffix = "_int8"
    fn = make_detect_fn(model, IMAGE_SHAPE, num_classes=1, with_pose=True,
                        pre_nms_top_k=TOP_K, quant_scales=quant_scales)

    # b1 aux lines: the single-image envelope (BENCH_r0{1,2,3}'s headline
    # metric, kept under the SAME name for round-over-round comparability),
    # its estimate-spread median, and MFU.
    b1_rate = None  # floor for the later windows' stall-retry check
    if B1_WINDOW_SECS > 0 and BATCH == 1:
        # the b1 window seeds every later window's floor, so it gets its
        # own retry against the ABSOLUTE sanity floor — otherwise a
        # stalled b1 window both publishes garbage and silently disarms
        # the stall gate for the whole run
        per_iter_1, estimates_1 = measure_with_floor_retry(
            f"b1{suffix}", 1, B1_SANITY_FLOOR,
            lambda: measure_envelope(fn, variables, images, P_inv,
                                     planes, B1_WINDOW_SECS,
                                     MIN_ESTIMATES))
        b1_rate = 1.0 / per_iter_1
        emit(f"gpp_resnet50_e2e_inference{suffix}", b1_rate,
             "images/sec/chip", b1_rate / REFERENCE_FPS_ESTIMATE)
        rates_1 = sorted(1.0 / e for e in estimates_1)
        median_1 = rates_1[len(rates_1) // 2]
        emit(f"gpp_b1_estimate_spread_median_n{len(rates_1)}{suffix}",
             median_1, "images/sec/chip", median_1 / REFERENCE_FPS_ESTIMATE)
        emit_phase_evidence(f"b1{suffix}", 1, per_iter_1, estimates_1,
                            B1_WINDOW_SECS)
        flops = _flops_per_call(fn, variables, images, P_inv, planes)
        if flops is not None and not INT8:
            tflops = flops / per_iter_1 / 1e12
            mfu = tflops / PEAK_BF16_TFLOPS
            emit("gpp_resnet50_e2e_mfu", 100.0 * mfu,
                 "percent_of_184tflops_bf16", mfu)

    # cross-line stall floor for every later window: margined b1 rate,
    # sanity-floored so a stalled b1 window cannot disarm the gate
    floor = (STALL_FLOOR_FRACTION * max(b1_rate, B1_SANITY_FLOOR)
             if b1_rate is not None else None)

    # batch-2 aggregate aux (phase-stable; a short window suffices): the
    # measured bf16 serving sweet spot (docs/PERFORMANCE.md round-3 sweep)
    if AUX_WINDOW_SECS > 0 and BATCH == 1:
        images_a, P_inv_a, planes_a = _inputs(rng, 2)
        per_iter_a, _ = measure_with_floor_retry(
            f"b2{suffix}", 2, floor,
            lambda: measure_envelope(fn, variables, images_a, P_inv_a,
                                     planes_a, AUX_WINDOW_SECS,
                                     MIN_ESTIMATES))
        emit(f"gpp_resnet50_e2e_inference_b2{suffix}", 2 / per_iter_a,
             "images/sec/chip", (2 / per_iter_a) / REFERENCE_FPS_ESTIMATE)

    if INT8_WINDOW_SECS > 0 and not INT8 and BATCH == 1:
        # int8-PTQ aux line at batch 4 in the best measured serving config:
        # conv trunk int8 (models/quantize.py; ~1-pt mAP absmax / at-parity
        # with --int8-percentile 99.9) PLUS the exact block-diagonal fused
        # cls+dim towers — the levers stack (+42% int8 alone, 304.6 vs
        # 289.4 img/s with fuse on top, session K, docs/PERFORMANCE.md).
        # Fusion is numerically exact, so accuracy == the plain int8 line
        # this replaces (label suffix records the config change).
        from ground_plane_polling_tpu.models import fuse_detector_params

        model_qf = build_detector("resnet50", num_classes=1,
                                  dtype=jnp.bfloat16, fuse_cls_dim=True)
        variables_qf = (variables if FUSE
                        else fuse_detector_params(variables))
        from ground_plane_polling_tpu.models.quantize import collect_scales

        scales_qf = collect_scales(
            lambda v, im: model_qf.apply(v, im), [(variables_qf, images)])
        fn_q = make_detect_fn(model_qf, IMAGE_SHAPE, num_classes=1,
                              with_pose=True, pre_nms_top_k=TOP_K,
                              quant_scales=scales_qf)
        b_q = INT8_AUX_BATCH
        images_q, P_inv_q, planes_q = _inputs(rng, b_q)
        per_iter_q, _ = measure_with_floor_retry(
            f"b{b_q}_int8_fuse", b_q, floor,
            lambda: measure_envelope(fn_q, variables_qf, images_q,
                                     P_inv_q, planes_q, INT8_WINDOW_SECS,
                                     MIN_ESTIMATES))
        emit(f"gpp_resnet50_e2e_inference_b{b_q}_int8_fuse",
             b_q / per_iter_q, "images/sec/chip",
             (b_q / per_iter_q) / REFERENCE_FPS_ESTIMATE)

    # HEADLINE measurement: batch-4 aggregate throughput by default (the
    # most phase-robust line — 2.2% spread across sessions vs the b1
    # envelope's 18%; see module docstring). A GPP_BENCH_BATCH override
    # measures that batch instead (and the aux blocks above are skipped).
    headline_batch = 4 if BATCH == 1 else BATCH
    images_h, P_inv_h, planes_h = _inputs(rng, headline_batch)
    per_iter, estimates = measure_with_floor_retry(
        f"b{headline_batch}{suffix}", headline_batch, floor,
        lambda: measure_envelope(fn, variables, images_h, P_inv_h,
                                 planes_h, WINDOW_SECS, MIN_ESTIMATES))
    images_per_sec = headline_batch / per_iter

    # estimate spread: how bimodal was the relay during this measurement?
    # (vs_baseline stays the measured/10 ratio on every img/s line)
    rates = sorted(headline_batch / e for e in estimates)
    median = rates[len(rates) // 2]
    emit(f"gpp_b{headline_batch}_estimate_spread_median_n{len(rates)}"
         f"{suffix}", median, "images/sec/chip",
         median / REFERENCE_FPS_ESTIMATE)
    emit_phase_evidence(f"b{headline_batch}{suffix}", headline_batch,
                        per_iter, estimates, WINDOW_SECS)

    # headline LAST: the driver parses the final JSON line
    emit(f"gpp_resnet50_e2e_throughput_b{headline_batch}{suffix}",
         images_per_sec, "images/sec/chip",
         images_per_sec / REFERENCE_FPS_ESTIMATE)


if __name__ == "__main__":
    try:
        main()
    except RuntimeError as e:  # axon registration is per-process; re-exec
        _retry_on_dead_relay(e)
