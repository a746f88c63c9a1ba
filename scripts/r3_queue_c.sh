#!/bin/bash
# Round-3 queue C: packed-native window chain A/B + the never-measured
# int8 dx-GEMM backward tier. Keep the host quiet while this runs
# (1 CPU core: concurrent work contaminates TPU step timings by 20-30%).
cd /root/repo
log=${R3_LOG:-/tmp/r3_exp.log}
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
echo "=== $(date) r3 queue C start ===" >> $log

run() {  # run <label> <timeout> <cmd...>
  echo "=== $(date) $1 ===" >> $log
  shift
  t=$1; shift
  timeout "$t" "$@" >> $log 2>&1
  echo "--- rc=$? $(date) ---" >> $log
}

run "PACKED_WO_BLOCK_MID" 2400 env BENCH_REMAT=wo_block_mid python bench.py
run "GROUPED_WO_BLOCK_MID_CONTROL" 2400 env SAM3_WINDOW_PACKED=0 BENCH_REMAT=wo_block_mid python bench.py
run "INT8BWD_PACKED_WO_BLOCK_MID" 2400 env BENCH_QUANT=int8_bwd BENCH_REMAT=wo_block_mid python bench.py
run "PACKED_DEFAULT_REMAT" 2400 python bench.py
echo "=== QUEUE C DONE $(date) ===" >> $log
