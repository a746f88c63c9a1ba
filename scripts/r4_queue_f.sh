#!/bin/bash
# Round-4 queue F: softmax-clamp + Q-tile sweeps for the long/window kernels.
# CLAMP replaces the row-max reduce+subtract (2 VPU passes per score tile,
# fwd and bwd) with one min(s, 70) pass — exact for |s| <= 70, soft-saturating
# (never NaN) beyond. Both kernels are partially VPU-bound, so this is the
# next shaving after the pad-mask reduction.
cd /root/repo || exit 1
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
log=${R4_LOG:-/tmp/r4_exp.log}
echo "=== $(date) r4 queue F start ===" >> "$log"

run() {  # run <label> <timeout> <cmd...>
  local label=$1 t=$2
  shift 2
  echo "=== $(date) $label ===" >> "$log"
  timeout "$t" "$@" >> "$log" 2>&1
  echo "--- rc=$? $(date) ---" >> "$log"
}

run "LONGCLAMP_MICRO_GLOBAL" 900 env SAM3_LONG_SOFTMAX=clamp EL=5184 EH=16 ED=64 \
  python scripts/bench_enc_attn.py
run "LONGCLAMP_MICRO_ENC" 900 env SAM3_LONG_SOFTMAX=clamp EL=5184 EH=8 ED=32 \
  python scripts/bench_enc_attn.py
run "LONGQT_MICRO_864" 900 env SAM3_LONG_QT2=864 EL=5184 EH=16 ED=64 \
  python scripts/bench_enc_attn.py
run "LONGQT_MICRO_QT4_576" 900 env SAM3_LONG_QT4=576 EL=5184 EH=8 ED=32 \
  python scripts/bench_enc_attn.py
run "WINCLAMP_MICRO" 900 env SAM3_WINDOW_CLAMP=1 python scripts/sweep_window.py
run "BENCH_CLAMP_BOTH" 3600 env SAM3_LONG_SOFTMAX=clamp SAM3_WINDOW_CLAMP=1 \
  python bench.py
echo "=== QUEUE F DONE $(date) ===" >> "$log"
