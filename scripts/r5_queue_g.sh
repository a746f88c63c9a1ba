#!/bin/bash
cd /root/repo || exit 1
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
log=/root/repo/scripts/logs_r5_g.log
run() { local label=$1 t=$2; shift 2
  echo "=== $(date) $label ===" >> "$log"
  timeout "$t" "$@" >> "$log" 2>&1
  echo "--- rc=$? $(date) ---" >> "$log"; }
# encoder remat fully OFF at the final memory landscape (saves the ~6x FFN
# replay; previously OOM pre-long-kernel, 3.109 slower with flash remat)
run "ENC0_FLAT" 2400 env BENCH_ENC_REMAT=0 python bench.py
# bs10 at the final kernels (3.472 predates flat + GEMM kernel)
run "BS10_FLAT_KERNEL" 2400 env BENCH_BATCH=10 python bench.py
echo "=== QUEUE G DONE $(date) ===" >> "$log"
git add scripts/logs_r5_g.log && git commit -q -m "r5 queue G results: enc-remat-off + bs10 at final kernels" || true
