#!/bin/bash
# Round-3 queue F: tunnel-RTT probe, pipelined-fetch headline re-measure at
# the new defaults (wo_block_mid + grouped chain + group-of-4 barriers), the
# first qkv-native SPLIT8 compile attempt under the 64 MB VMEM budget, the
# prefetch+packbits real-data validation, a bs10 probe, the 300-step
# int8-vs-bf16 training-quality A/B (VERDICT r2 weak #6), and a timed
# fast-tier pytest run (VERDICT r2 weak #5).
# PRECONDITION: no other queue running; bench.py pipelined patch committed.
cd /root/repo
log=${R3_LOG:-/tmp/r3_exp.log}
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
echo "=== $(date) r3 queue F start ===" >> $log

run() {  # run <label> <timeout> <cmd...>
  echo "=== $(date) $1 ===" >> $log
  shift
  t=$1; shift
  timeout "$t" "$@" >> $log 2>&1
  echo "--- rc=$? $(date) ---" >> $log
}

# 1. tunnel fetch RTT on the idle device (constant the per-step bench paid)
run "RTT_PROBE" 600 python scripts/probe_rtt.py
# 2. headline candidate = exactly what the driver runs: pure defaults
#    (wo_block_mid, grouped chain, int8 prequant, group-of-4 fetch barriers)
run "PIPELINED_DEFAULTS" 2400 python bench.py
# 3. qkv-native split8 (2 heads/program, 128-lane blocks) — never compiled
#    on TPU before the 64 MB scoped-VMEM budget landed; split4 was slower
run "PIPELINED_QKV_SPLIT8" 2400 env SAM3_WINDOW_QKV_NATIVE=1 python bench.py
# 4. real input pipeline with device prefetch + bit-packed masks — should
#    now match the synthetic number (queue E: 2.452 vs 3.135 from the
#    synchronous 46 MB/step tunnel transfer)
run "PIPELINED_REAL" 2400 env BENCH_DATA=real python bench.py
# 5. batch-size probe at the current HBM picture
run "PIPELINED_BS10" 2400 env BENCH_BATCH=10 python bench.py
# 6. int8-base vs bf16-base 300-step training quality (VERDICT r2 weak #6)
run "QUANT_QUALITY_300" 7200 python scripts/train_quality_quant.py
# 7. timed fast tier on the quiet host (VERDICT r2 weak #5: must be <300 s)
run "FAST_TIER_TIME" 1800 python -m pytest tests/ -q -m "not slow" --durations=15
echo "=== QUEUE F DONE $(date) ===" >> $log
