#!/bin/bash
# TPU session R4b: measured directory-throughput for the batched
# run-network CLI (closes VERDICT round-3 item 4's measurement half).
# Drives the REAL CLI — PNG decode, host resize, device detect, pose,
# .mat + KITTI txt writes — over the 40-image full-res val directory,
# at b1, b4 bf16, and b4 int8+fuse (the measured serving sweet spot).
# Run after tools/tpu_session_r4.sh (reuses its fixture + model).
set -uo pipefail
cd /root/repo
source tools/tpu_lib.sh

MODEL=${MODEL:-/tmp/full_res_long/model.npz}
DATA40=${DATA40:-/tmp/full_res_kitti40}
PLANES="$DATA40/road_planes_database.mat"
OUT=${OUT:-/tmp/run_network_throughput}

run_case () {
  local name="$1"; shift
  echo "=== R4b: run-network $name ==="
  rm -rf "$OUT/$name"
  retry python -m ground_plane_polling_tpu.bin.run_network \
    "$MODEL" "$DATA40/val/images" "$DATA40/val/calibs" "$PLANES" \
    "$OUT/$name" --kitti "$@" || true
}

run_case b1 --batch 1
run_case b4 --batch 4
run_case b4_int8_fuse --batch 4 --int8 8 --int8-percentile 99.9 \
  --fuse-towers

echo "=== session R4b done ==="
