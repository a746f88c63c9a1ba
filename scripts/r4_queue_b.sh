#!/bin/bash
# Round-4 queue B: configs unlocked by the r4 memory fixes (masks_loss lazy
# broadcast ~1.3 GB at bs8 / ~1.6 GB at bs10; seg-head bf16 logits ~270 MB)
# plus the never-measured tiers VERDICT r3 names.
#  1. DEFAULTS         — re-baseline the driver config on the fixed code
#  2. ENC_FFN_FLASH    — r3's 47-MB-short config WITHOUT global-flash remat
#                        (now ~1.5 GB under; no global fwd replay in bwd)
#  3. BS10_GFR         — bs10 + global-flash remat (was 464 MB over pre-fix)
#  4. INT8_BWD         — int8 dx-GEMM tier (ops/quant.py bwd_int8; the r2
#                        queue item that was never measured)
#  5. window kernel cross-product {MXU_SUM, NO_MAX, FUSE_ROPE} microbench
cd /root/repo || exit 1
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
log=${R4_LOG:-/tmp/r4_exp.log}
echo "=== $(date) r4 queue B start ===" >> "$log"

run() {  # run <label> <timeout> <cmd...>
  local label=$1 t=$2
  shift 2
  echo "=== $(date) $label ===" >> "$log"
  timeout "$t" "$@" >> "$log" 2>&1
  echo "--- rc=$? $(date) ---" >> "$log"
}

# highest-leverage first: the re-baseline (driver config on the fixed code)
# and the int8 dx-GEMM tier (bwd is ~1.72 s of the 2.52 s step and int8 GEMMs
# measured 1.43x bf16 at op level — the largest untested step-time lever)
run "DEFAULTS_R4FIX" 2400 python bench.py
run "INT8_BWD" 2400 env BENCH_QUANT=int8_bwd python bench.py
run "ENC_FFN_FLASH" 2400 env BENCH_ENC_REMAT=ffn SAM3_ENC_FLASH_REMAT=1 python bench.py
run "BS10_GFR" 2400 env BENCH_BATCH=10 SAM3_GLOBAL_FLASH_REMAT=1 python bench.py

for ms in 0 1; do for nm in 0 1; do for fr in 0 1; do
  run "WSWEEP ms=$ms nm=$nm fr=$fr" 900 env \
    SAM3_WINDOW_MXU_SUM=$ms SAM3_WINDOW_NO_MAX=$nm SAM3_WINDOW_FUSE_ROPE=$fr \
    python scripts/sweep_window.py
done; done; done

# serving latency-throughput table, bs 1/2/4/8 x bf16/int8 (VERDICT r3 #9)
run "SERVE_SWEEP" 3600 env INFER_BATCH=1,2,4,8 INFER_QUANT=none,int8 \
  python scripts/bench_infer.py
echo "=== QUEUE B DONE $(date) ===" >> "$log"
