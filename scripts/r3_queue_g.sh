#!/bin/bash
# Round-3 queue G: the encoder flash-remat levers (423bce3) — the library
# flash kernel's 128-lane-tiled f32 stats made FFN-only encoder remat OOM;
# with SAM3_ENC_FLASH_REMAT the backward keeps bf16 qkv only — plus the
# bs10 retry under the freed HBM, the fixed RTT probe, a step anatomy with
# the fwd+bwd (no-opt) stage, the re-run int8 quality arm (queue F's wedged
# on a dead tunnel fetch), and the re-timed curated fast tier.
# PRECONDITION: queue F fully done.
cd /root/repo
log=${R3_LOG:-/tmp/r3_exp.log}
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
echo "=== $(date) r3 queue G start ===" >> $log

run() {  # run <label> <timeout> <cmd...>
  echo "=== $(date) $1 ===" >> $log
  shift
  t=$1; shift
  timeout "$t" "$@" >> $log 2>&1
  echo "--- rc=$? $(date) ---" >> $log
}

# 1. tunnel fetch RTT (fixed: line-buffered prints, 20 reps) — also a
#    tunnel-health check after the wedged fetch that killed queue F's entry 6
run "RTT_PROBE2" 600 python scripts/probe_rtt.py
# 2. encoder lever A: FFN-only layer remat + checkpointed flash self-attn
#    (the r2 COMBO that OOM'd, minus its fat flash residuals)
run "ENC_FFN_FLASH_REMAT" 2400 env BENCH_ENC_REMAT=ffn SAM3_ENC_FLASH_REMAT=1 python bench.py
# 3. encoder lever B: NO layer remat at all + checkpointed flash
#    (saves the FFN replay too if the (8,5184,2048) hiddens fit)
run "ENC_NOREMAT_FLASH_REMAT" 2400 env BENCH_ENC_REMAT=0 SAM3_ENC_FLASH_REMAT=1 python bench.py
# 4. ViT global blocks: flash-remat cost probe (frees ~3 GB HBM; measures
#    what the 4 extra flash-forward replays cost against it)
run "GLOBAL_FLASH_REMAT" 2400 env SAM3_GLOBAL_FLASH_REMAT=1 python bench.py
# 5. bs10 retry: plain bs10 OOM'd by 2.47 GB (18.22 vs 15.75 HBM) — the
#    global-flash checkpointing frees ~3 GB of fat stats, exactly the gap
run "BS10_GLOBAL_FLASH_REMAT" 2400 env BENCH_BATCH=10 SAM3_GLOBAL_FLASH_REMAT=1 python bench.py
# 6. step anatomy incl. the new fwd+bwd (no-opt) stage at current defaults
run "PROFILE_STEP_SPLIT_OPT" 2400 python scripts/profile_step.py
# 7. int8 arm of the training-quality A/B — bf16 arm's numbers are in the
#    log (final ma25 266.321, val 264.8382) to compare against
run "QUANT_QUALITY_INT8" 5400 env QQ_QUANTS=int8 python scripts/train_quality_quant.py
# 8. re-timed curated fast tier (conftest _SLOW_ON_THIS_HOST list): must be
#    <300 s on this quiet host (VERDICT r2 weak #5; was 1038 s uncurated)
run "FAST_TIER_TIME2" 1800 python -m pytest tests/ -q -m "not slow" --durations=10
echo "=== QUEUE G DONE $(date) ===" >> $log
