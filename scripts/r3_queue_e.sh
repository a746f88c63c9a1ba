#!/bin/bash
# Round-3 queue E: the VMEM-fixed qkv-native chain A/B (eef0660), the
# still-unrecorded real-data pipeline bench (VERDICT r2 #3) and serving
# latency percentiles (VERDICT r2 #6, killed mid-run last session), plus a
# fresh step-anatomy profile at the current best config to aim the next
# perf lever. Keep the host quiet while this runs (1 CPU core).
cd /root/repo
log=${R3_LOG:-/tmp/r3_exp.log}
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
echo "=== $(date) r3 queue E start ===" >> $log

run() {  # run <label> <timeout> <cmd...>
  echo "=== $(date) $1 ===" >> $log
  shift
  t=$1; shift
  timeout "$t" "$@" >> $log 2>&1
  echo "--- rc=$? $(date) ---" >> $log
}

# 1. headline candidate: VMEM-fixed qkv-native (default on) + wo_block_mid
run "QKV_SPLIT8_WO_BLOCK_MID" 2400 env BENCH_REMAT=wo_block_mid python bench.py
# 2. real-data input pipeline at the best-known measured config
#    (grouped chain, wo_block_mid = 3.135); apples-to-apples vs synthetic
run "REAL_DATA_GROUPED_WO_BLOCK_MID" 2400 env BENCH_DATA=real SAM3_WINDOW_QKV_NATIVE=0 BENCH_REMAT=wo_block_mid python bench.py
# 3. serving latency percentiles (p50/p90/p99, bf16 + int8)
run "SERVING_PERCENTILES" 3000 python scripts/bench_infer.py
# 4. fresh step anatomy at the best config (trunk/encoder/decoder splits)
run "PROFILE_STEP_GROUPED_WO_BLOCK_MID" 2400 env SAM3_WINDOW_QKV_NATIVE=0 BENCH_REMAT=wo_block_mid python scripts/profile_step.py
# 5. coarser fwd split A/B: 4 slices = 4 heads / 256-lane blocks per program
run "QKV_SPLIT4_WO_BLOCK_MID" 2400 env SAM3_WINDOW_QKV_FWD_SPLIT=4 BENCH_REMAT=wo_block_mid python bench.py
echo "=== QUEUE E DONE $(date) ===" >> $log
