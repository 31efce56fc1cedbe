"""Where does the inference batch-scaling knee at b4 come from? (VERDICT
round-3 item 5: the b8 aggregate regresses vs b4 — 264.0 vs 289.4 int8,
flat-to-down bf16 — and the cause was asserted, not profiled.)

Per-batch, per-stage chained timing on the real chip:
  stage 1  model forward (backbone + FPN + heads)
  stage 2  + decode + filter/NMS
  stage 3  full detect fn (+ polling + pose)
for b in GPP_KNEE_BATCHES (default 2,4,8), bf16 and (optionally) the
int8+fused-towers serving config. Long differencing pairs + envelope over
a short window per point, same artifact-hardened protocol as bench.py
(docs/PERFORMANCE.md round 3).

The stage deltas tell the story:
  - if stage-1 per-image time keeps dropping b4->b8 but stage-3 doesn't,
    the knee is in filter/polling/pose scaling;
  - if even stage 1 stops scaling, the knee is device-side (HBM or
    scheduling), not the relay;
  - if per-ITER fixed cost is constant and per-image device time is flat,
    b8 should win — a b8 loss then points at the measurement itself.

Run (one python process at a time on this box):
  tools/tpu_run.sh python tools/profile_batch_knee.py
Env: GPP_KNEE_BATCHES, GPP_KNEE_WINDOW_SECS (default 45), GPP_KNEE_INT8
(default 1), GPP_KNEE_PAIR (default "25,125"), plus CPU-smoke overrides
GPP_KNEE_SHAPE ("416,1344"), GPP_KNEE_BACKBONE ("resnet50"),
GPP_KNEE_PLANES (1024).
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the measurement protocol (differencing pairs, envelope window, artifact
# floor, validated pair parsing, synthetic inputs) is bench.py's — import
# it so protocol fixes apply to every harness at once
from bench import _inputs, measure_envelope_fn, parse_pair  # noqa: E402
from ground_plane_polling_tpu.inference import (decode_predictions,
                                                make_detect_fn)
from ground_plane_polling_tpu.models import (build_detector,
                                             fuse_detector_params)
from ground_plane_polling_tpu.ops import anchors as anchor_ops
from ground_plane_polling_tpu.ops.filtering import filter_detections_batch

IMAGE_SHAPE = tuple(int(s) for s in
                    os.environ.get("GPP_KNEE_SHAPE", "416,1344").split(","))
BACKBONE = os.environ.get("GPP_KNEE_BACKBONE", "resnet50")
N_PLANES = int(os.environ.get("GPP_KNEE_PLANES", 1024))
BATCHES = [int(b) for b in
           os.environ.get("GPP_KNEE_BATCHES", "2,4,8").split(",")]
WINDOW_SECS = float(os.environ.get("GPP_KNEE_WINDOW_SECS", 45))
WITH_INT8 = os.environ.get("GPP_KNEE_INT8", "1") == "1"
PAIR = parse_pair("GPP_KNEE_PAIR")


def envelope(fn, images, scalar_of, window_secs=WINDOW_SECS):
    """min/median differenced per-iter seconds across a time window."""
    best, valid = measure_envelope_fn(fn, images, scalar_of,
                                      window_secs, 3, pair=PAIR)
    return best, valid[len(valid) // 2]


def inputs(rng, batch):
    return _inputs(rng, batch, IMAGE_SHAPE, N_PLANES)


def profile_config(label, model, variables, quant_scales, rng):
    anchors = jnp.asarray(anchor_ops.anchors_for_shape(IMAGE_SHAPE))
    print(f"\n== {label} ==", flush=True)
    print(f"{'b':>3} {'fwd ms/it':>10} {'+filt ms/it':>12} "
          f"{'full ms/it':>11} | {'fwd':>6} {'filt':>6} {'poll+pose':>9} "
          f"ms/img | {'agg img/s':>9} {'med':>7}")
    # The stage probes must run the SAME forward the full detect fn runs:
    # when profiling the int8 config, apply the quantization interceptor
    # (the first knee run measured the bf16 forward in the int8 stage
    # columns, which made the poll+pose deltas negative — see
    # docs/PERFORMANCE.md "plateau not knee").
    if quant_scales is not None:
        from ground_plane_polling_tpu.models.quantize import quantize_apply
        apply_fn = quantize_apply(
            lambda v, im: model.apply(v, im), quant_scales)
    else:
        apply_fn = lambda v, im: model.apply(v, im)

    for b in BATCHES:
        images, P_inv, planes = inputs(rng, b)

        fwd = jax.jit(lambda im: apply_fn(variables, im))
        t_fwd, _ = envelope(fwd, images,
                            lambda o: o["regression"][0, 0, 0])

        @jax.jit
        def fwd_filter(im):
            raw = apply_fn(variables, im)
            boxes, dims = decode_predictions(raw, anchors, 1)
            return filter_detections_batch(
                boxes, dims, raw["classification"], num_classes=1)

        t_fil, _ = envelope(fwd_filter, images, lambda o: o.scores[0, 0])

        full = make_detect_fn(model, IMAGE_SHAPE, num_classes=1,
                              with_pose=True, quant_scales=quant_scales)
        t_full, med_full = envelope(
            lambda im: full(variables, im, P_inv, planes), images,
            lambda o: o.scores[0, 0])
        print(f"{b:>3} {t_fwd*1e3:>10.2f} {t_fil*1e3:>12.2f} "
              f"{t_full*1e3:>11.2f} | {t_fwd/b*1e3:>6.2f} "
              f"{(t_fil-t_fwd)/b*1e3:>6.2f} {(t_full-t_fil)/b*1e3:>9.2f} "
              f"ms/img | {b/t_full:>9.1f} {b/med_full:>7.1f}", flush=True)


def main():
    rng = np.random.RandomState(0)
    model = build_detector(BACKBONE, num_classes=1, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *IMAGE_SHAPE, 3), jnp.float32))
    if os.environ.get("GPP_KNEE_BF16", "1") == "1":
        profile_config("bf16", model, variables, None, rng)

    if WITH_INT8:
        from ground_plane_polling_tpu.models.quantize import collect_scales

        model_f = build_detector(BACKBONE, num_classes=1,
                                 dtype=jnp.bfloat16, fuse_cls_dim=True)
        variables_f = fuse_detector_params(variables)
        images1, _, _ = inputs(rng, 1)
        scales = collect_scales(lambda v, im: model_f.apply(v, im),
                                [(variables_f, images1)])
        profile_config("int8 + fused towers", model_f, variables_f,
                       scales, rng)


if __name__ == "__main__":
    main()
