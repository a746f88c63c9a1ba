#!/bin/bash
# Queued TPU experiments, PRIORITIZED for a late tunnel recovery: step-level
# benches that decide the round's default config run first; diagnostics and
# secondary benches follow. Logs to /tmp/tpu_exp.log.
cd /root/repo
log=/tmp/tpu_exp.log
echo "=== $(date) waiting for TPU (prioritized queue v2) ===" >> $log
while true; do
  if timeout 120 python -c "import jax; assert jax.devices()[0].platform not in ('cpu','gpu')" 2>/dev/null; then
    echo "TPU UP at $(date)" >> $log; break
  fi
  sleep 60
done

run() {  # run <label> <timeout> <cmd...>
  echo "=== $(date) $1 ===" >> $log
  shift
  t=$1; shift
  timeout "$t" "$@" >> $log 2>&1
  echo "--- rc=$? $(date) ---" >> $log
}

# --- tier 1: default-config decision benches (one flag delta each) ---
run "bench DEFAULT (bf16-bwd kernel + prequant int8 + windows_only)" 1800 python bench.py
run "bench FUSE_ROPE" 1800 env SAM3_WINDOW_FUSE_ROPE=1 python bench.py
run "bench MXU_SUM" 1800 env SAM3_WINDOW_MXU_SUM=1 python bench.py
run "bench WO_BLOCK_MID" 1800 env BENCH_REMAT=wo_block_mid python bench.py
run "bench ENC_REMAT_FFN" 1800 env BENCH_ENC_REMAT=ffn python bench.py
run "bench COMBO (rope+mxu+womid+ffn)" 2400 env SAM3_WINDOW_FUSE_ROPE=1 SAM3_WINDOW_MXU_SUM=1 BENCH_REMAT=wo_block_mid BENCH_ENC_REMAT=ffn python bench.py
run "bench COMBO bs12" 2400 env SAM3_WINDOW_FUSE_ROPE=1 SAM3_WINDOW_MXU_SUM=1 BENCH_REMAT=wo_block_mid BENCH_ENC_REMAT=ffn BENCH_BATCH=12 python bench.py
echo "=== TIER1 DONE $(date) ===" >> $log

# --- tier 2: kernel-level sweeps (attribution/diagnostics) ---
for ms in 0 1; do
  for g in 2 4; do
    for il in 0 1; do
      run "sweep g=$g il=$il ms=$ms" 900 env SAM3_WINDOW_HEAD_GROUP=$g SAM3_WINDOW_INTERLEAVE=$il SAM3_WINDOW_MXU_SUM=$ms python scripts/sweep_window.py
    done
  done
done
run "sweep g=1 baseline" 900 env SAM3_WINDOW_HEAD_GROUP=1 python scripts/sweep_window.py
run "sweep rope-fused g=2 ms=1 il=1" 900 env SAM3_WINDOW_FUSE_ROPE=1 SAM3_WINDOW_MXU_SUM=1 SAM3_WINDOW_INTERLEAVE=1 python scripts/sweep_window.py
echo "=== TIER2 DONE $(date) ===" >> $log

# --- tier 3: secondary step benches ---
run "bench INT8_BWD" 1800 env BENCH_QUANT=int8_bwd python bench.py
run "bench ENC_REMAT_OFF retry (prequant freed HBM)" 1800 env BENCH_ENC_REMAT=0 python bench.py
run "bench bs12 plain" 1800 env BENCH_BATCH=12 python bench.py
run "bench REAL DATA pipeline" 2400 env BENCH_DATA=real python bench.py
echo "=== TIER3 DONE $(date) ===" >> $log

# --- tier 4: microbench + serving ---
run "microbench full" 1800 python scripts/microbench.py
run "infer/serving bench bf16+int8" 2400 env INFER_BATCH=1,4,8 python scripts/bench_infer.py
echo "=== ALL DONE $(date) ===" >> $log
