#!/bin/bash
cd /root/repo || exit 1
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
log=/root/repo/scripts/logs_r5_f.log
run() { local label=$1 t=$2; shift 2
  echo "=== $(date) $label ===" >> "$log"
  timeout "$t" "$@" >> "$log" 2>&1
  echo "--- rc=$? $(date) ---" >> "$log"; }
run "WIN_EXP2_MICRO" 1200 env SAM3_WINDOW_EXP2=1 python scripts/sweep_window.py
run "LONG_EXP2_MICRO" 1800 env SAM3_LONG_EXP2=1 python scripts/bench_enc_attn.py
run "DEFAULTS_EXP2" 2400 env SAM3_WINDOW_EXP2=1 SAM3_LONG_EXP2=1 python bench.py
echo "=== QUEUE F DONE $(date) ===" >> "$log"
git add scripts/logs_r5_f.log && git commit -q -m "r5 queue F results: exp2 fold A/B" || true
