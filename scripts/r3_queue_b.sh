#!/bin/bash
# Round-3 queue B: tier-1 remainder (queue A died mid-INTERLEAVE when its
# launching session ended). Keep the host quiet while this runs.
cd /root/repo
log=${R3_LOG:-/tmp/r3_exp.log}
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
echo "=== $(date) r3 queue B start ===" >> $log

run() {  # run <label> <timeout> <cmd...>
  echo "=== $(date) $1 ===" >> $log
  shift
  t=$1; shift
  timeout "$t" "$@" >> $log 2>&1
  echo "--- rc=$? $(date) ---" >> $log
}

run "INTERLEAVE" 1800 env SAM3_WINDOW_INTERLEAVE=1 python bench.py
run "WO_BLOCK_MID" 1800 env BENCH_REMAT=wo_block_mid python bench.py
run "BS12" 1800 env BENCH_BATCH=12 python bench.py
echo "=== QUEUE B DONE $(date) ===" >> $log
