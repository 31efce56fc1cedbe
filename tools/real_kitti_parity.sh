#!/bin/bash
# One-command readiness loop for the real-KITTI AP3D/AOS parity proof.
#
# The reference publishes its headline numbers only in the linked GPP paper
# (/root/reference/README.md:3 -> cvrr.ucsd.edu/publications/2020/GPP.pdf);
# neither the KITTI dataset nor a reference .h5 checkpoint exists on this
# box, so the proof cannot run today. This script packages the whole loop —
# reference-h5 import -> convert -> batched run-network -> official
# AP_2D/BEV/3D + AOS metrics — so it is a single command the moment the
# artifacts appear.
#
# Real mode:
#   KITTI_ROOT=/path/to/prepared REF_H5=/path/to/resnet50_kitti.h5 \
#     bash tools/real_kitti_parity.sh
#   KITTI_ROOT must contain val/{images,calibs,labels} (run
#   gpp-tpu-prepare-data over the raw KITTI layout first if it does not).
#   Optional env:
#     PLANES      road-plane .mat (default: the reference 10k DB)
#     BATCH       run-network dispatch batch (default 4)
#     EXTRA_FLAGS extra run-network flags, e.g. "--int8 --fuse-towers"
#                 (the measured serving sweet spot, docs/PERFORMANCE.md)
#     OUT         output root (default /tmp/real_kitti_parity)
#
# Dry-run mode (no data needed; CPU-only; a few minutes):
#   bash tools/real_kitti_parity.sh --dry-run
#   Builds a tiny synthetic KITTI set, trains the tiny backbone for two
#   short epochs, then drives the IDENTICAL convert -> run-network --batch
#   -> evaluate-3d chain, proving the loop end to end.

set -euo pipefail
cd "$(dirname "$0")/.."

OUT="${OUT:-/tmp/real_kitti_parity}"
BATCH="${BATCH:-4}"
PLANES="${PLANES:-/root/reference/road_planes_database/road_planes_database_10k.mat}"
EXTRA_FLAGS="${EXTRA_FLAGS:-}"

if [[ "${1:-}" == "--dry-run" ]]; then
  # CPU-only: skip the axon relay registration entirely, and point the
  # backend selector at cpu BEFORE any python process starts (the shell
  # profile exports JAX_PLATFORMS=axon; see CLAUDE.md)
  export PALLAS_AXON_POOL_IPS=
  export JAX_PLATFORMS=cpu
  PY=(python)
  export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
  ROOT="$OUT/dryrun"
  OUT="$ROOT"   # keep every dry-run artifact under one wiped directory
  rm -rf "$ROOT"
  mkdir -p "$ROOT"
  echo "== dry-run: synthetic KITTI fixture at $ROOT/data"
  "${PY[@]}" - "$ROOT/data" <<'EOF'
import sys

sys.path.insert(0, "tools")
from synthetic_kitti import make_full_res_kitti

make_full_res_kitti(sys.argv[1], n_train=8, n_val=3, n_planes=16, seed=7)
print("fixture ready")
EOF
  KITTI_ROOT="$ROOT/data"
  PLANES="$KITTI_ROOT/road_planes_database.mat"
  echo "== dry-run: 2-epoch tiny-backbone training (stand-in for REF_H5)"
  "${PY[@]}" -m ground_plane_polling_tpu.bin.train \
    --backbone tiny --batch-size 2 --epochs 2 --steps 4 \
    --image-min-side 96 --image-max-side 320 --no-evaluation \
    --snapshot-path "$ROOT/snapshots" --log-path "$ROOT/log.jsonl" \
    kitti "$KITTI_ROOT"
  CKPT=$("${PY[@]}" -c "
from ground_plane_polling_tpu.training.checkpoint import latest_checkpoint
print(latest_checkpoint('$ROOT/snapshots'))")
  MODEL_IN="$CKPT"
  CONVERT_FLAGS=(--backbone tiny)
  RUN_FLAGS=(--no-bf16 --score-threshold 0.0 --image-min-side 96
             --image-max-side 320)
else
  : "${KITTI_ROOT:?set KITTI_ROOT to the prepared KITTI root (val/{images,calibs,labels})}"
  : "${REF_H5:?set REF_H5 to the reference Keras .h5 checkpoint}"
  for d in images calibs labels; do
    [[ -d "$KITTI_ROOT/val/$d" ]] || {
      echo "missing $KITTI_ROOT/val/$d — run gpp-tpu-prepare-data first" >&2
      exit 1
    }
  done
  [[ -f "$PLANES" ]] || { echo "missing plane DB $PLANES" >&2; exit 1; }
  # TPU path: one python process at a time, persistent compile cache
  source tools/tpu_lib.sh
  PY=(python)
  mkdir -p "$OUT"
  MODEL_IN="$REF_H5"
  CONVERT_FLAGS=()
  RUN_FLAGS=()
fi

echo "== convert: $MODEL_IN -> $OUT/model.npz (h5 path exercises models/h5_import)"
"${PY[@]}" -m ground_plane_polling_tpu.bin.convert_model \
  "$MODEL_IN" "$OUT/model.npz" "${CONVERT_FLAGS[@]:+${CONVERT_FLAGS[@]}}"
echo "-- sidecar:" && cat "$OUT/model.npz.json" && echo

echo "== run-network (batch $BATCH${EXTRA_FLAGS:+, $EXTRA_FLAGS}) over $KITTI_ROOT/val"
# shellcheck disable=SC2086
"${PY[@]}" -m ground_plane_polling_tpu.bin.run_network \
  "$OUT/model.npz" "$KITTI_ROOT/val/images" "$KITTI_ROOT/val/calibs" \
  "$PLANES" "$OUT/results" --kitti --batch "$BATCH" $EXTRA_FLAGS \
  "${RUN_FLAGS[@]:+${RUN_FLAGS[@]}}"

DET_DIR="$OUT/results/model/outputs/kitti"
echo "== official metrics ($KITTI_ROOT/val/labels vs $DET_DIR)"
for mode in 11 40; do
  echo "-- AP mode: ${mode}-point"
  "${PY[@]}" -m ground_plane_polling_tpu.bin.evaluate_3d \
    "$KITTI_ROOT/val/labels" "$DET_DIR" --ap-mode "$mode" \
    --json "$OUT/metrics_ap$mode.json"
done

cat <<EOF

== parity check ==
Compare the Car AP_3D / AP_BEV / AOS rows above against the GPP paper's
KITTI tables (linked from the reference README.md:3,
http://cvrr.ucsd.edu/publications/2020/GPP.pdf). The paper reports
11-point APs on the KITTI val/test splits; use the "AP mode: 11-point"
block for that comparison. JSON copies: $OUT/metrics_ap{11,40}.json
EOF
