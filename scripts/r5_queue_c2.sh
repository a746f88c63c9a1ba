#!/bin/bash
cd /root/repo || exit 1
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
log=/root/repo/scripts/logs_r5_c.log
run() { local label=$1 t=$2; shift 2
  echo "=== $(date) $label ===" >> "$log"
  timeout "$t" "$@" >> "$log" 2>&1
  echo "--- rc=$? $(date) ---" >> "$log"; }
# dx-kernel A/B rows (bench_gemm now prints dy@W^T XLA vs PALLAS wres)
run "GEMM_AB_DX" 1800 python scripts/bench_gemm.py
# validate the new bench defaults exactly as the driver will run them
run "DEFAULTS_FLAT_GEMMK" 2400 python bench.py
# the bwd dx kernel in the full step
run "DEFAULTS_BWDK" 2400 env SAM3_GEMM_BWD_KERNEL=1 python bench.py
# real-data at the flat default (headline companion number)
run "REAL_FLAT" 3600 env BENCH_DATA=real BENCH_PREFETCH=6 BENCH_DEVBUF=3 BENCH_WORKERS=12 python bench.py
echo "=== QUEUE C2 DONE $(date) ===" >> "$log"
git add scripts/logs_r5_c.log && git commit -q -m "r5 queue C2 results: dx-kernel A/B + flat-default validation + real-data" || true
