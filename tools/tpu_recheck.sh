#!/bin/bash
# One-shot TPU revalidation after tunnel recovery: correctness first,
# then benchmarks. Run from the repo root; writes /tmp/tpu_recheck.log.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_recheck.log
: > "$LOG"
echo "== probe ==" | tee -a "$LOG"
timeout 60 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
  || { echo "tunnel still wedged" | tee -a "$LOG"; exit 1; }

echo "== key-switch bit-exactness on TPU (incl. DevPerm parity) ==" | tee -a "$LOG"
timeout 900 python -u tools/verify_ks_tpu.py >> "$LOG" 2>&1 \
  && echo ok || echo "VERIFY FAILED — see $LOG"

echo "== on-device fuzz smoke (Mosaic lowering coverage) ==" | tee -a "$LOG"
timeout 900 python -u tools/fuzz_tpu.py 4 >> "$LOG" 2>&1 \
  && echo ok || echo "FUZZ FAILED — see $LOG"

echo "== per-kernel roofline ==" | tee -a "$LOG"
timeout 900 python -u -m eva_tpu.profiling >> "$LOG" 2>&1

echo "== speed-of-light Sobel budget (for comparison) ==" | tee -a "$LOG"
timeout 600 python -u -m eva_tpu.profiling estimate sobel >> "$LOG" 2>&1

echo "== bench (ct-mul / rotation / sobel) ==" | tee -a "$LOG"
timeout 2500 python -u bench.py >> "$LOG" 2>&1

tail -40 "$LOG"
