#!/bin/bash
# Round-4 queue E: follow-ups to the long-attention kernel (ops/long_attention.py).
# The kernel replaces the library flash path for the 4 ViT global blocks and
# the 6 encoder self-attns; its residuals are lean bf16 q/k/v/O (no
# 128-lane-tiled f32 stats), freeing ~2 GB at bs8. Candidates that previously
# OOM'd by small margins become live again:
#  1. ENC_FFN_LONG — FFN-only encoder remat (attention unrematted, saving the
#     6x ~13 ms fwd replay). Was 1.27 GB over with library residuals
#     (queue B); the long kernel's encoder residuals are ~85 MB/layer.
#  2. BS10_LONG — bs10 was 29.3 MB short WITH global-flash remat; the long
#     kernel frees ~650 MB/global-block of residual+stats at bs10 without
#     any replay.
#  3. BS10_FFN_LONG — the combo, if 2 OOMs.
#  4. LONG_OFF control — SAM3_LONG_ATTENTION=0 on the same VM (the morning's
#     DEFAULTS_QUIET 3.106 is the reference; this re-pins it post-merge).
cd /root/repo || exit 1
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
log=${R4_LOG:-/tmp/r4_exp.log}
echo "=== $(date) r4 queue E start ===" >> "$log"

run() {  # run <label> <timeout> <cmd...>
  local label=$1 t=$2
  shift 2
  echo "=== $(date) $label ===" >> "$log"
  timeout "$t" "$@" >> "$log" 2>&1
  echo "--- rc=$? $(date) ---" >> "$log"
}

run "ENC_FFN_LONG" 2400 env BENCH_ENC_REMAT=ffn python bench.py
run "BS10_LONG" 2400 env BENCH_BATCH=10 python bench.py
run "BS10_FFN_LONG" 2400 env BENCH_BATCH=10 BENCH_ENC_REMAT=ffn python bench.py
run "LONG_OFF_CONTROL" 2400 env SAM3_LONG_ATTENTION=0 python bench.py
echo "=== QUEUE E DONE $(date) ===" >> "$log"
