#!/usr/bin/env bash
# On-chip measurement sequence for a freshly recovered TPU tunnel.
# Round-3 context: the axon relay died before the megakernel/int4/sampler
# work could be timed on hardware; this script runs the full sequence in
# dependency order and tees every log under runs/onchip/.
#
# Usage:  bash tools/run_onchip_suite.sh [quick]
#   quick = skip the floor sweeps, run only checks + the headline bench.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=.:${PYTHONPATH:-}
OUT=runs/onchip
mkdir -p "$OUT"

step() { echo; echo "=== $1 ==="; }

step "0. tunnel preflight"
python - <<'EOF' || exit 2
import socket, sys
for port in (8082, 8083, 8087, 8092, 8093, 8097):
    try:
        socket.create_connection(("127.0.0.1", port), timeout=2).close()
        sys.exit(0)
    except OSError:
        pass
print("relay ports closed — tunnel down"); sys.exit(2)
EOF

step "1. kernel numerics on-chip (flash, packed matmuls, sampler, mega int8+int4)"
timeout 2400 python tests/tpu/run_tpu_checks.py 2>&1 | tee "$OUT/checks.log"
if grep -q "ALL OK" "$OUT/checks.log"; then
  CHECKS=ok
else
  # Measurements still matter when one kernel misbehaves — mark and go on.
  CHECKS=failed
  echo "CHECKS FAILED — continuing to measurements anyway (see $OUT/checks.log)"
fi

if [ "${1:-}" != "quick" ]; then
  step "2. megakernel floors (ms/token at serving geometry, 4-layer probe)"
  for cfg in "8 8" "4 8" "4 4"; do
    set -- $cfg
    BM_L=4 BM_B=24 BM_T=1024 BM_WBITS=$1 BM_KVBITS=$2 \
      timeout 1200 python tools/perf/bench_mega.py 2>&1 \
      | tee "$OUT/mega_w$1_kv$2_b24.log"
  done
  BM_L=4 BM_B=40 BM_T=1024 BM_WBITS=4 BM_KVBITS=4 \
    timeout 1200 python tools/perf/bench_mega.py 2>&1 \
    | tee "$OUT/mega_w4_kv4_b40.log"
fi

step "3. headline bench (ladder: mega int4 b40 -> b32 -> stepwise int8 b20)"
timeout 3600 python bench.py 2>&1 | tee "$OUT/bench.log"

step "4. panoptic-only timing (pallas sampler vs gather)"
for s in pallas gather; do
  MMOR_TPU_BENCH_SAMPLER=$s MMOR_TPU_BENCH_PRESET=7b \
    MMOR_TPU_BENCH_BATCH=8 MMOR_TPU_BENCH_NEW_TOKENS=8 \
    timeout 2400 python bench.py 2>&1 | tee "$OUT/panoptic_$s.log"
done

step "done — logs in $OUT/ (checks: $CHECKS)"
