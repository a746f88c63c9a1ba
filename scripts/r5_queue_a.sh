#!/bin/bash
# Round-5 queue A: re-profile the 2.24 s step at the r4 final defaults
# (long-attention kernel + clamp + QT576 + ffn-only encoder remat + _RS_EPS
# guard) to publish the roofline to 7.0 img/s/chip (VERDICT r5 next-#1), plus
# the bs10/bs12 retries now that the masks-loss/seg-head/clamp memory moved
# (next-#2a), and the int8 serving bs4/bs8 tail the r4 snapshot cut twice.
#
# Evidence hygiene (VERDICT next-#3): the log lives IN THE REPO and the last
# queue item commits it, so a round snapshot cannot orphan the results.
cd /root/repo || exit 1
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
log=${R5_LOG:-/root/repo/scripts/logs_r5_a.log}
echo "=== $(date) r5 queue A start ===" >> "$log"

run() {  # run <label> <timeout> <cmd...>
  local label=$1 t=$2
  shift 2
  echo "=== $(date) $label ===" >> "$log"
  timeout "$t" "$@" >> "$log" 2>&1
  echo "--- rc=$? $(date) ---" >> "$log"
}

# 1. DEFAULTS re-validation after the _RS_EPS reciprocal guard (expected
#    neutral: one (QT,)-wide scalar add per softmax; r4 clean ref 3.571)
run "DEFAULTS_R5_EPS" 2400 python bench.py
# 2-3. step anatomy at the BENCH config (profile scripts now share
#    bench_model_config): trunk fwd / trunk+adapter-grad / full fwd / full grad,
#    then the non-trunk bisection (encoder vs decoder vs seg+loss bwd)
run "PROFILE_BWD_DEFAULTS" 3600 python scripts/profile_bwd.py
run "PROFILE_GROUND_DEFAULTS" 3600 python scripts/profile_ground.py
# 4. op-level rates at the new defaults (window kernel share, MLP GEMMs,
#    block fwd+bwd under remat) for the roofline denominators
run "MICROBENCH_DEFAULTS" 3600 python scripts/microbench.py
# 5. bs10/bs12 retries (r4: bs10 was 29.3 MB over BEFORE clamp+QT576 moved
#    VMEM/HBM; block_mid remats the globals too = most memory-lean policy)
run "BS10_DEFAULT" 2400 env BENCH_BATCH=10 python bench.py
run "BS10_BLOCKMID" 2400 env BENCH_BATCH=10 BENCH_REMAT=block_mid python bench.py
run "BS12_BLOCKMID" 2400 env BENCH_BATCH=12 BENCH_REMAT=block_mid python bench.py
# 6. the serving int8 bs4/bs8 rows cut off twice in r4
run "SERVE_INT8_TAIL" 2400 env INFER_QUANT=int8 INFER_BATCH=4,8 \
  python scripts/bench_infer.py
echo "=== QUEUE A DONE $(date) ===" >> "$log"
git add scripts/logs_r5_a.log && git commit -q -m "r5 queue A results: step anatomy + bs10/12 retries + int8 serving tail" || true
