"""Component-level forward-pass profiling on the real chip.

Times each piece of the conv pipeline separately (backbone, FPN, each head
tower on synthetic pyramid features, full forward) with the chained +
host-fetch protocol so the remote-relay round trip cancels out. Prints an
estimated FLOPs/achieved-TFLOPs table to show where the MXU headroom is.

Run (single TPU process, persistent compile cache):
    tools/tpu_run.sh python tools/profile_fwd.py
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import time

import jax
import jax.numpy as jnp
import numpy as np

from ground_plane_polling_tpu.models import build_detector
from ground_plane_polling_tpu.models.fpn import FPN
from ground_plane_polling_tpu.models.heads import (BoxRegressionHead,
                                                   ClassificationHead,
                                                   DimRegressionHead)
from ground_plane_polling_tpu.ops import anchors as anchor_ops

IMAGE_SHAPE = (416, 1344)  # pipeline bucket at pad_multiple=32 (was 512x1408 through round 2)
N1, N2 = 4, 16
DTYPE = jnp.bfloat16


def chained_time(fn, x, scalar_of, label):
    def run(iters):
        carry = jnp.zeros((), x.dtype)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x + carry)
            carry = (scalar_of(out) * 0).astype(x.dtype)
        np.asarray(carry)
        return time.perf_counter() - t0

    t_compile0 = time.perf_counter()
    run(2)
    compile_s = time.perf_counter() - t_compile0
    dt = (run(N2) - run(N1)) / (N2 - N1)
    print(f"{label:34s}: {dt*1e3:8.3f} ms   (first-call {compile_s:.1f}s)",
          flush=True)
    return dt


def conv_flops(h, w, cin, cout, k=3):
    return 2.0 * h * w * cin * cout * k * k


def main():
    rng = np.random.RandomState(0)
    model = build_detector("resnet50", num_classes=1, dtype=DTYPE)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *IMAGE_SHAPE, 3), jnp.float32))
    images = jnp.asarray(rng.uniform(-128, 128, (1, *IMAGE_SHAPE, 3)),
                         jnp.float32)

    # ---- full forward -----------------------------------------------------
    fwd = jax.jit(lambda im: model.apply(variables, im))
    t_full = chained_time(fwd, images, lambda o: o["regression"][0, 0, 0],
                          "full forward")

    # ---- backbone only ----------------------------------------------------
    from ground_plane_polling_tpu.models.resnet import ResNetBackbone
    bb = ResNetBackbone(dtype=DTYPE, name="backbone")
    bb_vars = {"params": variables["params"]["backbone"],
               "frozen": variables["frozen"]["backbone"]}
    bb_fn = jax.jit(lambda im: bb.apply(bb_vars, im))
    t_bb = chained_time(bb_fn, images, lambda o: o[0][0, 0, 0, 0],
                        "backbone (C3,C4,C5)")

    # ---- backbone + FPN ---------------------------------------------------
    fpn = FPN(dtype=DTYPE, name="fpn")
    fpn_vars = {"params": variables["params"]["fpn"]}

    def bb_fpn(im):
        c3, c4, c5 = bb.apply(bb_vars, im)
        return fpn.apply(fpn_vars, c3, c4, c5)

    t_fpn = chained_time(jax.jit(bb_fpn), images, lambda o: o[0][0, 0, 0, 0],
                         "backbone + FPN")

    # ---- heads on synthetic pyramid features -------------------------------
    shapes = anchor_ops.feature_shapes(IMAGE_SHAPE)
    feats = [jnp.asarray(rng.normal(0, 1, (1, h, w, 512)), DTYPE)
             for h, w in shapes]
    print("pyramid shapes:", shapes, flush=True)

    heads = {
        "classification": (ClassificationHead(dtype=DTYPE, name="classification"),
                           256),
        "regression": (BoxRegressionHead(dtype=DTYPE, name="regression"), 512),
        "regression_dim": (DimRegressionHead(dtype=DTYPE,
                                             name="regression_dim"), 128),
    }
    head_times = {}
    for name, (mod, width) in heads.items():
        hv = {"params": variables["params"][name]}

        def head_fn(f0, _mod=mod, _hv=hv):
            outs = [_mod.apply(_hv, f0)] + [_mod.apply(_hv, f) for f in feats[1:]]
            return jnp.concatenate(outs, axis=1)

        head_times[name] = chained_time(
            jax.jit(head_fn), feats[0], lambda o: o[0, 0, 0],
            f"head {name} (width {width})")

    # ---- FLOPs model -------------------------------------------------------
    total = 0.0
    for name, (mod, width) in heads.items():
        f = 0.0
        out_ch = {"classification": 96, "regression": 144,
                  "regression_dim": 36}[name]
        for h, w in shapes:
            f += conv_flops(h, w, 512, width)          # tower layer 0
            f += 3 * conv_flops(h, w, width, width)    # tower layers 1-3
            f += conv_flops(h, w, width, out_ch)       # out conv
        total += f
        t = head_times[name]
        print(f"{name:16s}: {f/1e9:7.1f} GFLOP  measured {t*1e3:7.3f} ms "
              f"-> {f/t/1e12:6.1f} TFLOP/s", flush=True)

    t_heads_sum = sum(head_times.values())
    print(f"\nsummary: backbone {t_bb*1e3:.2f} | fpn {1e3*(t_fpn-t_bb):.2f} | "
          f"heads(sum, separate) {t_heads_sum*1e3:.2f} | "
          f"full {t_full*1e3:.2f} ms", flush=True)

    # ---- fused cls+dim tower (block-diagonal 384-wide) ---------------------
    from ground_plane_polling_tpu.models import fuse_detector_params
    from ground_plane_polling_tpu.models.heads import FusedClsDimHead

    fused_vars = fuse_detector_params(variables)
    fh = FusedClsDimHead(dtype=DTYPE, name="clsdim")
    fhv = {"params": fused_vars["params"]["clsdim"]}

    def fused_head_fn(f0):
        outs = [fh.apply(fhv, f0)] + [fh.apply(fhv, f) for f in feats[1:]]
        return jnp.concatenate([o[0] for o in outs], axis=1)

    t_fused_head = chained_time(
        jax.jit(fused_head_fn), feats[0], lambda o: o[0, 0, 0],
        "head cls+dim FUSED (width 384)")
    f_fused = 0.0
    for h, w in shapes:
        f_fused += conv_flops(h, w, 512, 384)
        f_fused += 3 * conv_flops(h, w, 384, 384)
        f_fused += conv_flops(h, w, 384, 132)
    print(f"clsdim fused    : {f_fused/1e9:7.1f} GFLOP  measured "
          f"{t_fused_head*1e3:7.3f} ms -> {f_fused/t_fused_head/1e12:6.1f} "
          f"TFLOP/s  (split towers summed: "
          f"{1e3*(head_times['classification']+head_times['regression_dim']):.3f} ms)",
          flush=True)

    # ---- full forward with fused towers ------------------------------------
    fused_model = build_detector("resnet50", num_classes=1, dtype=DTYPE,
                                 fuse_cls_dim=True)
    ffwd = jax.jit(lambda im: fused_model.apply(fused_vars, im))
    chained_time(ffwd, images, lambda o: o["regression"][0, 0, 0],
                 "full forward FUSED cls+dim")

    # ---- diagnostic: single 3x3 conv rate vs width on the P3 grid ----------
    h3, w3 = shapes[0]
    print(f"\nsingle 3x3 conv on P3 grid ({h3}x{w3}), bf16:", flush=True)
    for width in (128, 256, 384, 512, 768):
        k = jnp.asarray(rng.normal(0, 0.01, (3, 3, 512, width)), DTYPE)
        x0 = jnp.asarray(rng.normal(0, 1, (1, h3, w3, 512)), DTYPE)

        def conv_fn(x, _k=k):
            return jax.lax.conv_general_dilated(
                x, _k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        t = chained_time(jax.jit(conv_fn), x0, lambda o: o[0, 0, 0, 0],
                         f"  conv 512->{width}")
        f = conv_flops(h3, w3, 512, width)
        print(f"    -> {f/t/1e12:6.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
