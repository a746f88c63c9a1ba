#!/bin/bash
# Round-4 queue D: follow-ups from queue B's first results.
#  1. BS10_GFR_FFN — bs10 + global-flash remat missed HBM by only 29.30 MB
#     (queue B, 05:28 log: 15.78 used / 15.75); adding FFN-only encoder remat
#     + flash-residual remat frees hundreds of MB. This is r4 queue A item 4
#     that never executed before the session restart.
#  2. INT8_BWD re-run — the queue B measurement (3.016) was flagged
#     "contended": true (max step 5.6 s vs median 2.65) because the builder
#     was running oracle tests on the 1-core host during the timed region.
#     The int8 dx-GEMM tier is the largest untested step-time lever
#     (bwd ~1.72 s of 2.52 s; int8 GEMMs 1.43x bf16 at op level).
#  3. DEFAULTS re-baseline on a quiet host (queue B's 3.105 had the same
#     contention; r3 quiet-host reference is 3.165).
cd /root/repo || exit 1
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
log=${R4_LOG:-/tmp/r4_exp.log}
echo "=== $(date) r4 queue D start ===" >> "$log"

run() {  # run <label> <timeout> <cmd...>
  local label=$1 t=$2
  shift 2
  echo "=== $(date) $label ===" >> "$log"
  timeout "$t" "$@" >> "$log" 2>&1
  echo "--- rc=$? $(date) ---" >> "$log"
}

run "BS10_GFR_FFN" 2400 env BENCH_BATCH=10 BENCH_ENC_REMAT=ffn \
  SAM3_ENC_FLASH_REMAT=1 SAM3_GLOBAL_FLASH_REMAT=1 python bench.py
run "INT8_BWD_QUIET" 2400 env BENCH_QUANT=int8_bwd python bench.py
run "DEFAULTS_QUIET" 2400 python bench.py
echo "=== QUEUE D DONE $(date) ===" >> "$log"
