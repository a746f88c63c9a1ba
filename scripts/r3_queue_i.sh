#!/bin/bash
# Round-3 queue I (session 9): queue H restarted after the runner died mid-
# item-2 (VM restart at 19:28; item 1 ENC_NOREMAT_FLASH_REMAT OOM'd on the
# GLOBAL library-flash f32[8,16,5632,128] temps — 4x352 MB + 4x176 MB padded
# outputs — so the retry at the end adds SAM3_GLOBAL_FLASH_REMAT to shed
# exactly those).
cd /root/repo || exit 1
log=${R3_LOG:-/tmp/r3_exp.log}
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
echo "=== $(date) r3 queue I start ===" >> "$log"

run() {  # run <label> <timeout> <cmd...>
  local t
  echo "=== $(date) $1 ===" >> "$log"
  shift
  t=$1; shift
  timeout "$t" "$@" >> "$log" 2>&1
  echo "--- rc=$? $(date) ---" >> "$log"
}

# 1. encoder: FFN-only remat + checkpointed flash (the r2 COMBO minus OOM)
run "ENC_FFN_FLASH_REMAT" 2400 env BENCH_ENC_REMAT=ffn SAM3_ENC_FLASH_REMAT=1 python bench.py
# 2. bs10 under freed HBM
run "BS10_GLOBAL_FLASH_REMAT" 2400 env BENCH_BATCH=10 SAM3_GLOBAL_FLASH_REMAT=1 python bench.py
# 3. bs8 control: what the 4 global flash replays cost on their own
run "GLOBAL_FLASH_REMAT_BS8" 2400 env SAM3_GLOBAL_FLASH_REMAT=1 python bench.py
# 4. encoder no-remat retry with the global flash temps shed too
run "ENC_NOREMAT_BOTH_FLASH_REMAT" 2400 env BENCH_ENC_REMAT=0 SAM3_ENC_FLASH_REMAT=1 SAM3_GLOBAL_FLASH_REMAT=1 python bench.py
echo "=== QUEUE I PERF DONE $(date) ===" >> "$log"
# 5. int8 quality arm (bf16 arm recorded: final ma25 266.321, val 264.838)
run "QUANT_QUALITY_INT8" 5400 env QQ_QUANTS=int8 python scripts/train_quality_quant.py
echo "=== QUEUE I DONE $(date) ===" >> "$log"
