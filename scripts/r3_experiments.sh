#!/bin/bash
# Round-3 TPU experiment queue. Tier 1: step-level benches that decide the
# default config (one flag delta each, FUSE_ROPE is now default-ON so it is
# part of DEFAULT). Tier 2: real-data + serving evidence runs.
# All runs use the persistent compilation cache and the median-step bench.
cd /root/repo
log=${R3_LOG:-/tmp/r3_exp.log}
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
echo "=== $(date) r3 queue start ===" >> $log

run() {  # run <label> <timeout> <cmd...>
  echo "=== $(date) $1 ===" >> $log
  shift
  t=$1; shift
  timeout "$t" "$@" >> $log 2>&1
  echo "--- rc=$? $(date) ---" >> $log
}

# --- tier 1: default-config decision benches ---
# DEFAULT now includes the rowsum(dP*P)->dO.(PV) backward identity (r3)
run "DEFAULT (fuse_rope+prequant int8+windows_only+median-bench+dpp-identity)" 1800 python bench.py
run "MXU_SUM" 1800 env SAM3_WINDOW_MXU_SUM=1 python bench.py
run "MXU_SUM+NO_MAX" 1800 env SAM3_WINDOW_MXU_SUM=1 SAM3_WINDOW_NO_MAX=1 python bench.py
run "INT8_BWD" 1800 env BENCH_QUANT=int8_bwd python bench.py
run "INT8_BWD+MXU_SUM+NO_MAX" 1800 env BENCH_QUANT=int8_bwd SAM3_WINDOW_MXU_SUM=1 SAM3_WINDOW_NO_MAX=1 python bench.py
run "INTERLEAVE" 1800 env SAM3_WINDOW_INTERLEAVE=1 python bench.py
run "WO_BLOCK_MID" 1800 env BENCH_REMAT=wo_block_mid python bench.py
run "BS12" 1800 env BENCH_BATCH=12 python bench.py
echo "=== TIER1 DONE $(date) ===" >> $log

# --- tier 2: evidence runs ---
run "REAL_DATA" 2400 env BENCH_DATA=real python bench.py
run "SERVING bf16+int8 percentiles" 3000 env INFER_BATCH=1,4,8 python scripts/bench_infer.py
echo "=== TIER2 DONE $(date) ===" >> $log

# --- tier 3: int8-vs-bf16 training quality (300 steps each) ---
run "QUANT_QUALITY bf16 vs int8" 7200 python scripts/train_quality_quant.py
echo "=== ALL DONE $(date) ===" >> $log
