#!/bin/bash
# Round-3 queue D: qkv-native chain A/B (zero-relayout window attention),
# the int8 dx-GEMM backward tier, remat A/B, the real-data pipeline bench
# (VERDICT r2 #3) and serving latency percentiles (VERDICT r2 #6).
# Keep the host quiet while this runs (1 CPU core: concurrent work
# contaminates TPU step timings by 20-30%). Do NOT edit sam3_lora_tpu/ or
# bench.py while it runs — each entry imports the current files.
cd /root/repo
log=${R3_LOG:-/tmp/r3_exp.log}
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
echo "=== $(date) r3 queue D start ===" >> $log

run() {  # run <label> <timeout> <cmd...>
  echo "=== $(date) $1 ===" >> $log
  shift
  t=$1; shift
  timeout "$t" "$@" >> $log 2>&1
  echo "--- rc=$? $(date) ---" >> $log
}

# 1. headline candidate: qkv-native (default on) + wo_block_mid remat
run "QKV_WO_BLOCK_MID" 2400 env BENCH_REMAT=wo_block_mid python bench.py
# 2. int8 dx-GEMM backward tier on top of the same config
run "INT8BWD_QKV_WO_BLOCK_MID" 2400 env BENCH_QUANT=int8_bwd BENCH_REMAT=wo_block_mid python bench.py
# 3. qkv-native at the current bench default remat (windows_only)
run "QKV_DEFAULT_REMAT" 2400 python bench.py
# 4. chain A/B control: grouped layout (no qkv-native, no packed)
run "GROUPED_WO_BLOCK_MID_CONTROL" 2400 env SAM3_WINDOW_QKV_NATIVE=0 SAM3_WINDOW_PACKED=0 BENCH_REMAT=wo_block_mid python bench.py
# 5. real-data input pipeline at the best-known config (VERDICT r2 #3)
run "REAL_DATA_QKV_WO_BLOCK_MID" 2400 env BENCH_DATA=real BENCH_REMAT=wo_block_mid python bench.py
# 6. serving latency percentiles (VERDICT r2 #6)
run "SERVING_PERCENTILES" 2400 python scripts/bench_infer.py
# 7-8. softmax-variant experiments on top of the qkv-native chain
run "QKV_MXUSUM_WO_BLOCK_MID" 2400 env SAM3_WINDOW_MXU_SUM=1 BENCH_REMAT=wo_block_mid python bench.py
run "QKV_NOMAX_WO_BLOCK_MID" 2400 env SAM3_WINDOW_NO_MAX=1 BENCH_REMAT=wo_block_mid python bench.py
echo "=== QUEUE D DONE $(date) ===" >> $log
