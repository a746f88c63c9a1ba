#!/bin/bash
# Round-4 queue A — VERDICT r3 items, in dependency-safe order:
#  1. INT8_QUALITY (VERDICT next-#2): the int8 arm of the quality A/B that
#     queues F/H/I never completed. Runs FIRST so a dead tunnel can't starve
#     it again. QQ_DATA_DIR pins the (seeded, deterministic) dataset so the
#     curve is directly comparable to the recorded r3 bf16 arm
#     (final ma25 266.321 / val 264.838, PARITY session 7).
#  2. ENC_FFN_BOTH_FLASH_REMAT (VERDICT next-#1 / r3 queue J item 1): the
#     combo that OOM'd by 47 MB without SAM3_GLOBAL_FLASH_REMAT.
#  3. GLOBAL_FLASH_REMAT_BS8: cut off by the r3 snapshot mid-run.
#  4. BS10_GFR_FFN: bs10 retry under BOTH flash-remats (queue F measured the
#     plain bs10 OOM at 2.47 GB over; global-flash frees ~3 GB).
cd /root/repo || exit 1
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
log=${R4_LOG:-/tmp/r4_exp.log}
echo "=== $(date) r4 queue A start ===" >> "$log"

run() {  # run <label> <timeout> <cmd...>
  local label=$1 t=$2
  shift 2
  echo "=== $(date) $label ===" >> "$log"
  timeout "$t" "$@" >> "$log" 2>&1
  echo "--- rc=$? $(date) ---" >> "$log"
}

run "INT8_QUALITY" 3600 env QQ_QUANTS=int8 QQ_DATA_DIR=/tmp/qqds_r4 \
  python scripts/train_quality_quant.py
echo "=== QUEUE A ITEM 1 DONE $(date) ===" >> "$log"

run "ENC_FFN_BOTH_FLASH_REMAT" 2400 env BENCH_ENC_REMAT=ffn \
  SAM3_ENC_FLASH_REMAT=1 SAM3_GLOBAL_FLASH_REMAT=1 python bench.py
run "GLOBAL_FLASH_REMAT_BS8" 2400 env SAM3_GLOBAL_FLASH_REMAT=1 python bench.py
run "BS10_GFR_FFN" 2400 env BENCH_BATCH=10 BENCH_ENC_REMAT=ffn \
  SAM3_ENC_FLASH_REMAT=1 SAM3_GLOBAL_FLASH_REMAT=1 python bench.py
echo "=== QUEUE A DONE $(date) ===" >> "$log"
