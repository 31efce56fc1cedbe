#!/bin/bash
# TPU session E: cheap e2e levers A/B on the headline bench.
#   1. pre_nms_top_k 512 / 256 (parity-justified by the top-k sweeps)
#   2. XLA latency-hiding scheduler flag
#   3. bigger scoped-vmem limit
# Each variant is its own process so XLA_FLAGS take effect at startup.
set -uo pipefail
cd /root/repo
source tools/tpu_lib.sh



echo "=== E0. baseline b1 (session anchor) ==="
GPP_BENCH_INT8_WINDOW_SECS=0 retry python bench.py || true
echo "=== E1a. top_k=512 b1 ==="
GPP_BENCH_INT8_WINDOW_SECS=0 GPP_BENCH_TOPK=512 retry python bench.py || true
echo "=== E1b. top_k=256 b1 ==="
GPP_BENCH_INT8_WINDOW_SECS=0 GPP_BENCH_TOPK=256 retry python bench.py || true
echo "=== E1c. top_k=512 b4 ==="
GPP_BENCH_INT8_WINDOW_SECS=0 GPP_BENCH_TOPK=512 GPP_BENCH_BATCH=4 retry python bench.py || true
echo "=== E2. latency-hiding scheduler b1 ==="
GPP_BENCH_INT8_WINDOW_SECS=0 XLA_FLAGS="--xla_tpu_enable_latency_hiding_scheduler=true" retry python bench.py || true
echo "=== E3. scoped vmem 64MiB b1 ==="
GPP_BENCH_INT8_WINDOW_SECS=0 XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=65536" retry python bench.py || true

echo "=== E4. training epoch wall time (uint8 image upload) ==="
# 3 epochs, no eval — compare per-epoch 'seconds' against the f32-upload
# runs recorded in docs (27-77 s/epoch at the same config)
retry python -m ground_plane_polling_tpu.bin.train \
  --backbone resnet50 --batch-size 2 --epochs 3 --steps 60 \
  --lr 1e-4 --bf16 --random-transform --no-evaluation --no-snapshots \
  --log-path /tmp/e4_log.jsonl \
  kitti /tmp/full_res_kitti || true
cat /tmp/e4_log.jsonl || true
echo "=== session E done ==="
