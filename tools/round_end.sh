#!/usr/bin/env bash
# Round-end artifact gate (round-4 VERDICT item 7): run every driver-contract
# surface the round snapshot will be judged on, and FAIL LOUDLY if any of
# them would read as failed — the r04 snapshot shipped with a red
# MULTICHIP_r04.json (rc=124 timeout) that nobody noticed.
#
# Usage (from /root/repo, with the relay healthy for the bench step):
#   bash tools/round_end.sh            # full gate: tests + dryrun + bench
#   GPP_ROUND_END_SKIP_BENCH=1 bash tools/round_end.sh   # CPU-only parts
#   GPP_ROUND_END_COLD=1 bash tools/round_end.sh         # re-time the
#       dryrun against an empty compile cache (what a fresh driver box sees)
#
# Everything runs SEQUENTIALLY: this is a 1-CPU box and concurrent python
# processes blow each other's timeouts (CLAUDE.md "don't run pytest +
# dryrun + bench concurrently").
set -u
cd "$(dirname "$0")/.."

FAILURES=()
note() { printf '\n=== %s ===\n' "$*"; }
check() { # check <name> <rc>
  if [ "$2" -ne 0 ]; then FAILURES+=("$1 (rc=$2)"); echo "GATE: $1 FAILED (rc=$2)"; fi
}

note "1/5 default test lane"
PALLAS_AXON_POOL_IPS= timeout 1500 python -m pytest tests/ -q
check "default-lane" $?

note "2/5 slow test lane"
PALLAS_AXON_POOL_IPS= timeout 1800 python -m pytest tests/ -q -m slow
check "slow-lane" $?

note "3/5 dryrun_multichip(8) core tier (driver contract)"
COLD_CACHE_DIR=""
if [ "${GPP_ROUND_END_COLD:-0}" = "1" ]; then
  # time against an empty cache — the number a fresh driver box pays
  COLD_CACHE_DIR="$(mktemp -d /tmp/gpp_coldcache.XXXX)"
  export GPP_CPU_CACHE_DIR="$COLD_CACHE_DIR"
  trap '[ -n "$COLD_CACHE_DIR" ] && rm -rf "$COLD_CACHE_DIR"' EXIT
  echo "cold-cache mode: GPP_CPU_CACHE_DIR=$GPP_CPU_CACHE_DIR"
fi
t0=$(date +%s)
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  timeout 480 python -u __graft_entry__.py dryrun 8
rc=$?
t1=$(date +%s)
echo "dryrun core tier wall: $((t1 - t0)) s (budget 480 s)"
check "dryrun-core" $rc
unset GPP_CPU_CACHE_DIR

note "4/5 real-KITTI parity loop freshness (tools/real_kitti_parity.sh --dry-run)"
PALLAS_AXON_POOL_IPS= timeout 1200 bash tools/real_kitti_parity.sh --dry-run
check "real-kitti-dry-run" $?

if [ "${GPP_ROUND_END_SKIP_BENCH:-0}" = "1" ]; then
  note "5/5 bench.py SKIPPED (GPP_ROUND_END_SKIP_BENCH=1)"
else
  note "5/5 bench.py (real chip; one python at a time)"
  out=$(JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1 \
        timeout 3000 python bench.py)
  rc=$?
  echo "$out"
  check "bench" $rc
  if [ $rc -eq 0 ]; then
    # the driver parses the FINAL stdout line as the headline
    echo "$out" | tail -1 | python -c '
import json, sys
rec = json.loads(sys.stdin.read())
assert rec["metric"].startswith("gpp_resnet50_e2e_throughput_b"), rec
assert rec["value"] > 0, rec
print("headline ok: %s = %s" % (rec["metric"], rec["value"]))
'
    check "bench-headline-parse" $?
  fi
fi

note "gate summary"
if [ ${#FAILURES[@]} -gt 0 ]; then
  echo "ROUND-END GATE FAILED:"
  printf '  - %s\n' "${FAILURES[@]}"
  exit 1
fi
echo "ROUND-END GATE PASSED (all driver-contract artifacts green)"
