#!/bin/bash
# Round-4 queue G: refresh the derived benchmarks with the long-attention +
# clamp kernels (the step dropped 2.576 -> ~2.26 s, so the r3-era real-data
# and serving numbers are stale), then the remaining small levers.
cd /root/repo || exit 1
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
log=${R4_LOG:-/tmp/r4_exp.log}
echo "=== $(date) r4 queue G start ===" >> "$log"

run() {  # run <label> <timeout> <cmd...>
  local label=$1 t=$2
  shift 2
  echo "=== $(date) $label ===" >> "$log"
  timeout "$t" "$@" >> "$log" 2>&1
  echo "--- rc=$? $(date) ---" >> "$log"
}

# 1. real-data pipeline on the new step time (r3: 2.985 synchronous-decode-
#    bound; the gap to synthetic grows as the step shrinks)
run "REAL_DATA_NEWKERNELS" 3600 env BENCH_DATA=real python bench.py
# 2. serving percentiles with the new kernels (bs 1/2/4/8, bf16 + int8)
run "SERVE_SWEEP_NEWKERNELS" 2400 env INFER_BATCH=1,2,4,8 \
  python scripts/bench_infer.py
# 3. window WPP x clamp interaction (clamp shifted the VPU/DMA balance)
for wpp in 2 4; do
  run "WPPCLAMP wpp=$wpp" 900 env SAM3_WINDOW_WPP=$wpp python scripts/sweep_window.py
done
# 4. host-fetch group 8 (RTT amortization: ~8 -> ~4 ms/step of harness
#    overhead; steps stay 20, so 2 fetch groups + median over groups of 8)
run "BENCH_GROUP8" 2400 env BENCH_GROUP=8 BENCH_STEPS=24 python bench.py
echo "=== QUEUE G DONE $(date) ===" >> "$log"
