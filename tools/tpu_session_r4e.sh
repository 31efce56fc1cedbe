#!/bin/bash
# TPU session R4e: re-measure bin/run_network after the host-only Rodrigues
# fix (the r4d run plateaued at ~0.3 img/s because the KITTI writer paid
# ~20 ms of relay round-trips per detection row).
#   1. probe: per-stage wall split (write should drop ~1.9 s -> ~ms)
#   2. run-network directory throughput b1 / b4 / b4 int8+fuse
# One python process at a time (single-tenant chip).
set -uo pipefail
cd /root/repo
source tools/tpu_lib.sh

DATA40=${DATA40:-/tmp/full_res_kitti40}
MODEL=${MODEL:-/tmp/full_res_long/model.npz}
PLANES="$DATA40/road_planes_database.mat"
OUT=${OUT:-/tmp/run_network_throughput_r4e}

echo "=== R4e-1: probe_run_network_wall (post-fix) ==="
retry python tools/probe_run_network_wall.py "$MODEL" "$DATA40" || true

run_case () {
  local name="$1"; shift
  echo "=== R4e-2: run-network $name ==="
  rm -rf "$OUT/$name"
  retry python -m ground_plane_polling_tpu.bin.run_network \
    "$MODEL" "$DATA40/val/images" "$DATA40/val/calibs" "$PLANES" \
    "$OUT/$name" --kitti "$@" || true
}
run_case b1 --batch 1
run_case b4 --batch 4
run_case b4_int8_fuse --batch 4 --int8 8 --int8-percentile 99.9 \
  --fuse-towers

echo "=== R4e: KITTI txt b1-vs-b4 parity (tolerance-aware) ==="
# the b1 and b4 canvases compile to different XLA programs; bf16
# reduction-order differences show up as last-digit wobble in the
# 2-decimal txt fields. Parity = same rows, same types, numeric fields
# within 0.011 (one printed ulp); anything larger is a row-mixup bug.
PALLAS_AXON_POOL_IPS= python - <<'EOF'
import os, sys
root = os.environ.get("OUT", "/tmp/run_network_throughput_r4e")
a = os.path.join(root, "b1", "model", "outputs", "kitti")
b = os.path.join(root, "b4", "model", "outputs", "kitti")
if not (os.path.isdir(a) and os.path.isdir(b)):
    sys.exit("missing kitti dirs")
worst, bad = 0.0, []
files = sorted(os.listdir(a))
for f in files:
    ra = [l.split() for l in open(os.path.join(a, f))]
    rb = [l.split() for l in open(os.path.join(b, f))]
    if len(ra) != len(rb) or any(x[0] != y[0] for x, y in zip(ra, rb)):
        bad.append((f, "row structure"))
        continue
    import math
    for x, y in zip(ra, rb):
        ds = [abs(float(u) - float(v)) for u, v in zip(x[1:], y[1:])]
        # alpha (idx 2 here) and r_y (idx 13) wrap at +-pi
        for i in (2, 13):
            ds[i] = min(ds[i], abs(ds[i] - 2 * math.pi))
        d = max(ds)
        worst = max(worst, d)
        if d > 0.011:
            bad.append((f, d))
            break
print(f"b1-vs-b4 txt parity: {len(files) - len(bad)}/{len(files)} within "
      f"one printed ulp; worst field delta {worst:.4f}"
      + (f"; FAIL: {bad[:5]}" if bad else ""))
EOF

echo "=== session R4e done ==="
