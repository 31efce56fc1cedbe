#!/bin/bash
# TPU session M: (M1) training-step batch curve (device step b2/b4/b8),
# (M3) f32 vs int8-p99.9 accuracy on the current proof model.
# The fused-vs-two-stage CLI A/B ran live in session M via
# tools/profile_train_wall.py (see docs/PERFORMANCE.md "Session M").
# NOTE: /tmp/full_res_long/model.npz here is the POST-augmentation-fix
# retrain (box restart wiped the older full_res_long2; session-D rerun
# with current code, mAP 0.4381 f32) — it supersedes CLAUDE.md's earlier
# "prefer full_res_long2" note.
# Requires /tmp/full_res_kitti + the proof model (tools/tpu_session_d.sh).
set -uo pipefail
cd /root/repo
source tools/tpu_lib.sh

MODEL=${GPP_PROOF_MODEL:-/tmp/full_res_long/model.npz}
ROOT=/tmp/full_res_kitti

echo "=== M1: train-step device batch curve ==="
for b in 2 4 8; do
  GPP_BENCH_BATCH=$b retry python tools/bench_train.py
done

echo "=== M3: eval f32 vs int8 p99.9 on $MODEL ==="
retry python -m ground_plane_polling_tpu.bin.evaluate \
  "$MODEL" "$ROOT" --backbone resnet50 || true
retry python -m ground_plane_polling_tpu.bin.evaluate \
  "$MODEL" "$ROOT" --backbone resnet50 \
  --int8 8 --int8-percentile 99.9 || true
echo "=== session M done ==="
