#!/bin/bash
cd /root/repo || exit 1
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
log=/root/repo/scripts/logs_r5_d.log
run() { local label=$1 t=$2; shift 2
  echo "=== $(date) $label ===" >> "$log"
  timeout "$t" "$@" >> "$log" 2>&1
  echo "--- rc=$? $(date) ---" >> "$log"; }
# 1. GEMM-kernel block-size sweep incl. the loser shapes (qkv regression:
#    73.7 TF/s at BM=256 — is it a block-size artifact?)
for bm in 128 512 1024; do
  run "GEMM_BM_$bm" 1800 env SAM3_GEMM_BM=$bm SAM3_GEMM_ALLSHAPES=1 python scripts/bench_gemm.py
done
# 2. host-fetch group 8 at the flat defaults
run "GROUP8_FLAT" 2400 env BENCH_GROUP=8 BENCH_STEPS=24 python bench.py
# 3. window WPP=4 at the flat defaults (queue G: bwd 7.60 vs 7.78 ms)
run "WPP4_FLAT" 2400 env SAM3_WINDOW_WPP=4 python bench.py
# 4. clean final defaults (exactly what the driver runs)
run "FINAL_DEFAULTS" 2400 python bench.py
echo "=== QUEUE D DONE $(date) ===" >> "$log"
git add scripts/logs_r5_d.log && git commit -q -m "r5 queue D results: GEMM BM sweep + group8 + WPP4 + final defaults" || true
