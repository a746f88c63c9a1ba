#!/bin/bash
# Round-3 queue J: follow-ups from queue I.
# Queue I item 1 (ENC_FFN_FLASH_REMAT alone) OOM'd by just 47 MB (15.79G vs
# 15.75G HBM) with the 4 global blocks' library-flash f32 temps (~1.4 GB)
# still resident — so the FFN-only encoder remat combo re-runs here with
# SAM3_GLOBAL_FLASH_REMAT=1 shedding exactly those.
cd /root/repo || exit 1
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
log=${R3_LOG:-/tmp/r3_exp.log}
echo "=== $(date) r3 queue J start ===" >> "$log"

run() {  # run <label> <timeout> <cmd...>
  echo "=== $(date) $1 ===" >> "$log"
  shift
  t=$1; shift
  timeout "$t" "$@" >> "$log" 2>&1
  echo "--- rc=$? $(date) ---" >> "$log"
}

# 1. the 47-MB-short config, with the global flash temps shed
run "ENC_FFN_BOTH_FLASH_REMAT" 2400 env BENCH_ENC_REMAT=ffn SAM3_ENC_FLASH_REMAT=1 SAM3_GLOBAL_FLASH_REMAT=1 python bench.py
echo "=== QUEUE J PERF DONE $(date) ===" >> "$log"
# 2. re-timed curated fast tier on the then-quiet host (<300 s target)
run "FAST_TIER_TIME2" 1800 python -m pytest tests/ -q -m "not slow" --durations=10
echo "=== QUEUE J DONE $(date) ===" >> "$log"
