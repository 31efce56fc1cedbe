"""Per-layer roofline for the GPP inference pipeline (VERDICT r04 item 4).

Question being answered: the measured end-to-end MFU plateaus at 45-48%
of the calibrated 184 TFLOP/s bf16 matmul ceiling — is that a conv-mix
CEILING or headroom? This tool produces the per-layer evidence:

  1. lowers the REAL model (resnet50 detector, 416x1344, the bench
     bucket) to StableHLO and extracts every convolution with its exact
     shapes — no hand-enumerated architecture table to drift;
  2. computes each conv's FLOPs and minimum HBM traffic (operands +
     output, bf16), i.e. its arithmetic intensity;
  3. models each conv's floor time as max(FLOPs/peak, bytes/BW) — the
     roofline — plus an XLA-measured alternative: group convs by
     published fusion region if a compiled module is available;
  4. prints the table + the implied best-case MFU for this conv mix.

Peak comes from the measured device calibration (184 TFLOP/s, large
bf16 matmuls — docs/PERFORMANCE.md "device calibration"); HBM bandwidth
is measured on-chip by tools/tpu_session_r5.sh (bw microbench) and passed
via --hbm-gbps. Run host-side analysis anywhere (lowering is
platform-independent):

  PALLAS_AXON_POOL_IPS= python tools/roofline.py --hbm-gbps 1200

The headline comparison: sum(max(t_c, t_m)) over convs vs the measured
conv-trunk time (tools/profile_batch_knee.py: ~3.85 ms/img at b4).
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# single source of truth for the measured bf16 matmul ceiling — the MFU
# line this tool is reconciled against divides by the same constant
from bench import PEAK_BF16_TFLOPS as PEAK_TFLOPS


def conv_records(hlo_text):
    """Extract (label, out_shape, window, flops, bytes) per convolution.

    StableHLO convs print operand/result types in the trailing signature:
      ... : (tensor<4x416x1344x3xf32>, tensor<7x7x3x64xbf16>)
                -> tensor<4x208x672x64xbf16>
    FLOPs = 2 * prod(out) * kh * kw * Cin (one MAC = 2 flops; layout
    NHWC x HWIO -> NHWC as emitted by flax).
    """
    recs = []
    pat = re.compile(
        r"stablehlo\.convolution.*?:\s*"
        r"\(tensor<([^>]+)>,\s*tensor<([^>]+)>\)\s*->\s*tensor<([^>]+)>",
        re.S)
    for m in pat.finditer(hlo_text):
        ishape, wshape, oshape = (
            _dims(m.group(1)), _dims(m.group(2)), _dims(m.group(3)))
        if len(wshape[0]) != 4 or len(oshape[0]) != 4:
            continue  # not a 2D conv
        (idims, ibytes), (wdims, wbytes), (odims, obytes) = (
            ishape, wshape, oshape)
        kh, kw, cin, cout = wdims
        b, oh, ow, oc = odims
        flops = 2.0 * b * oh * ow * oc * kh * kw * cin
        traffic = (np.prod(idims) * ibytes + np.prod(wdims) * wbytes
                   + np.prod(odims) * obytes)
        recs.append({
            "in": tuple(idims), "w": tuple(wdims), "out": tuple(odims),
            "flops": flops, "bytes": float(traffic),
        })
    return recs


def _dims(type_str):
    """'4x208x672x64xbf16' -> ([4,208,672,64], bytes_per_element)."""
    parts = type_str.strip().split("x")
    dtype = parts[-1]
    dims = [int(p) for p in parts[:-1]]
    bpe = {"bf16": 2, "f16": 2, "f32": 4, "f64": 8, "i8": 1, "si8": 1,
           "ui8": 1, "i32": 4, "si32": 4}.get(dtype, 4)
    return dims, bpe


def analyze(batch=4, image_shape=(416, 1344), hbm_gbps=1200.0,
            backbone="resnet50"):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from ground_plane_polling_tpu.models import build_detector

    model = build_detector(backbone, num_classes=1, dtype=jnp.bfloat16)
    variables = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, *image_shape, 3),
                                          jnp.float32)),
        jax.random.PRNGKey(0))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables)
    lowered = jax.jit(lambda v, x: model.apply(v, x)).lower(
        variables, jnp.zeros((batch, *image_shape, 3), jnp.float32))
    recs = conv_records(lowered.as_text())
    if not recs:
        raise SystemExit("no convolutions found in lowered HLO")

    bw = hbm_gbps * 1e9
    peak = PEAK_TFLOPS * 1e12
    total_f = total_b = total_t = t_compute = 0.0
    total_fp = total_tp = tp_compute = 0.0
    rows = []
    for r in recs:
        tc = r["flops"] / peak
        tm = r["bytes"] / bw
        t = max(tc, tm)
        bound = "compute" if tc >= tm else "memory"
        # MXU-tile-padded FLOPs: the systolic array is 128 lanes wide and
        # 8 sublanes deep, so channel counts round up to 128 (to 8 below
        # the sublane width: the 3-ch stem) and the im2col row count
        # (B*OH*OW) rounds up to 8. Odd head channels (36/96/144) and the
        # 64-ch stage-1 trunk pay real padding FLOPs the nominal count
        # hides — x1.12 aggregate for this model (measured round-5).
        kh, kw, cin, cout = r["w"]
        b_, oh, ow, oc = r["out"]
        fp = (2.0 * _pad(b_ * oh * ow, 8) * _pad(oc, 128) * kh * kw
              * _pad(cin, 128 if cin > 8 else 8))
        tcp = fp / peak
        rows.append((r, tc, tm, t, bound))
        total_f += r["flops"]
        total_fp += fp
        total_b += r["bytes"]
        total_t += t
        total_tp += max(tcp, tm)
        t_compute += tc
        tp_compute += tcp

    rows.sort(key=lambda x: -x[3])
    print(f"# roofline: {backbone} {image_shape} b{batch}, "
          f"peak {PEAK_TFLOPS} TFLOP/s bf16, HBM {hbm_gbps} GB/s")
    print(f"{'out shape':>22} {'kernel':>16} {'GFLOPs':>9} {'MiB':>8} "
          f"{'t_comp us':>10} {'t_mem us':>9} {'bound':>8}")
    for r, tc, tm, t, bound in rows:
        print(f"{str(r['out']):>22} {str(r['w']):>16} "
              f"{r['flops'] / 1e9:>9.2f} {r['bytes'] / 2**20:>8.1f} "
              f"{tc * 1e6:>10.1f} {tm * 1e6:>9.1f} {bound:>8}")
    n_mem = sum(1 for *_, b in rows if b == "memory")
    print(f"\nconvs: {len(rows)} ({n_mem} memory-bound at this BW)")
    print(f"total conv FLOPs/img: {total_f / batch / 1e9:.1f} GFLOP")
    print(f"total min HBM traffic/img: {total_b / batch / 2**20:.0f} MiB "
          f"(un-fused per-conv bound; XLA fusion removes inter-layer "
          f"activations, so the real traffic is lower)")
    print(f"pure-compute floor: {t_compute / batch * 1e3:.2f} ms/img "
          f"-> MFU 100% by construction")
    print(f"roofline floor sum(max(tc,tm)): {total_t / batch * 1e3:.2f} "
          f"ms/img -> best-case MFU "
          f"{100.0 * t_compute / total_t:.1f}% for this conv mix")
    print(f"MXU-padded FLOPs/img: {total_fp / batch / 1e9:.1f} GFLOP "
          f"(x{total_fp / total_f:.2f} nominal) -> padded roofline floor "
          f"{total_tp / batch * 1e3:.2f} ms/img "
          f"(nominal-FLOP MFU at that floor: "
          f"{100.0 * t_compute / total_tp:.1f}%)")
    return rows, total_t / batch, t_compute / batch


def _pad(n, m):
    return ((n + m - 1) // m) * m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--height", type=int, default=416)
    ap.add_argument("--width", type=int, default=1344)
    ap.add_argument("--hbm-gbps", type=float, default=1200.0,
                    help="measured HBM bandwidth (tools/tpu_session_r5.sh)")
    ap.add_argument("--backbone", default="resnet50")
    args = ap.parse_args()
    analyze(args.batch, (args.height, args.width), args.hbm_gbps,
            args.backbone)


if __name__ == "__main__":
    main()
