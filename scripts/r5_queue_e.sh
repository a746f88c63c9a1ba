#!/bin/bash
cd /root/repo || exit 1
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
log=/root/repo/scripts/logs_r5_e.log
run() { local label=$1 t=$2; shift 2
  echo "=== $(date) $label ===" >> "$log"
  timeout "$t" "$@" >> "$log" 2>&1
  echo "--- rc=$? $(date) ---" >> "$log"; }
# retries at the BM512 all-shapes defaults (both lost at BM256)
run "BWDK_512" 2400 env SAM3_GEMM_BWD_KERNEL=1 python bench.py
run "LORAFUSED_512" 2400 env SAM3_GEMM_LORA_FUSED=1 python bench.py
# real-data at the final defaults (PARITY companion number)
run "REAL_FINAL" 3600 env BENCH_DATA=real BENCH_PREFETCH=6 BENCH_DEVBUF=3 BENCH_WORKERS=12 python bench.py
echo "=== QUEUE E DONE $(date) ===" >> "$log"
git add scripts/logs_r5_e.log && git commit -q -m "r5 queue E results: BM512 retries + final real-data" || true
