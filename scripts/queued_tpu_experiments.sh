#!/bin/bash
# Queued TPU experiments: runs when the tunnel recovers, logs to /tmp/tpu_exp.log.
cd /root/repo
log=/tmp/tpu_exp.log
echo "=== $(date) waiting for TPU ===" >> $log
while true; do
  if timeout 120 python -c "import jax; assert jax.devices()[0].platform not in ('cpu','gpu')" 2>/dev/null; then
    echo "TPU UP at $(date)" >> $log; break
  fi
  sleep 60
done
echo "=== window-kernel sweep (head group x interleave) ===" >> $log
for g in 1 2 4; do
  for il in 0 1; do
    SAM3_WINDOW_HEAD_GROUP=$g SAM3_WINDOW_INTERLEAVE=$il timeout 900 python scripts/sweep_window.py >> $log 2>&1
  done
done
echo "=== microbench (full op-level) ===" >> $log
timeout 1800 python scripts/microbench.py >> $log 2>&1
echo "=== bench default (int8-prequant + windows_only + bf16-bwd kernel) ===" >> $log
timeout 1800 python bench.py >> $log 2>&1
echo "=== bench wo_block_mid ===" >> $log
BENCH_REMAT=wo_block_mid timeout 1800 python bench.py >> $log 2>&1
echo "=== bench bs12 retry (prequant freed HBM) ===" >> $log
BENCH_BATCH=12 timeout 1800 python bench.py >> $log 2>&1
echo "=== bench real data ===" >> $log
BENCH_DATA=real timeout 2400 python bench.py >> $log 2>&1
echo "=== ALL DONE $(date) ===" >> $log
echo "=== bench int8_bwd (dx GEMM on int8 MXU path) ===" >> $log
BENCH_QUANT=int8_bwd timeout 1800 python bench.py >> $log 2>&1
echo "=== bench enc remat off retry (prequant freed ~0.85G) ===" >> $log
BENCH_ENC_REMAT=0 timeout 1800 python bench.py >> $log 2>&1
echo "=== EXTENDED DONE $(date) ===" >> $log
echo "=== inference/serving bench (bf16 + int8, bs 1/4/8) ===" >> $log
INFER_BATCH=1,4,8 timeout 2400 python scripts/bench_infer.py >> $log 2>&1
echo "=== INFER DONE $(date) ===" >> $log
echo "=== bench fuse_rope (RoPE rotation fused into window kernel) ===" >> $log
SAM3_WINDOW_FUSE_ROPE=1 timeout 1800 python bench.py >> $log 2>&1
echo "=== bench fuse_rope + wo_block_mid ===" >> $log
SAM3_WINDOW_FUSE_ROPE=1 BENCH_REMAT=wo_block_mid timeout 1800 python bench.py >> $log 2>&1
echo "=== FUSE_ROPE DONE $(date) ===" >> $log
echo "=== bench enc remat FFN-only (attention unrematted, FFN hidden freed) ===" >> $log
BENCH_ENC_REMAT=ffn timeout 1800 python bench.py >> $log 2>&1
echo "=== ENC_FFN DONE $(date) ===" >> $log
echo "=== bench COMBO fuse_rope + wo_block_mid + enc ffn remat ===" >> $log
SAM3_WINDOW_FUSE_ROPE=1 BENCH_REMAT=wo_block_mid BENCH_ENC_REMAT=ffn timeout 1800 python bench.py >> $log 2>&1
echo "=== bench COMBO + bs12 ===" >> $log
SAM3_WINDOW_FUSE_ROPE=1 BENCH_REMAT=wo_block_mid BENCH_ENC_REMAT=ffn BENCH_BATCH=12 timeout 1800 python bench.py >> $log 2>&1
echo "=== COMBO DONE $(date) ===" >> $log
echo "=== sweep MXU_SUM kernel variants ===" >> $log
SAM3_WINDOW_MXU_SUM=1 timeout 900 python scripts/sweep_window.py >> $log 2>&1
SAM3_WINDOW_MXU_SUM=1 SAM3_WINDOW_FUSE_ROPE=1 timeout 900 python scripts/sweep_window.py >> $log 2>&1
SAM3_WINDOW_MXU_SUM=1 SAM3_WINDOW_INTERLEAVE=1 timeout 900 python scripts/sweep_window.py >> $log 2>&1
echo "=== bench MXU_SUM ===" >> $log
SAM3_WINDOW_MXU_SUM=1 timeout 1800 python bench.py >> $log 2>&1
echo "=== bench MXU_SUM + fuse_rope ===" >> $log
SAM3_WINDOW_MXU_SUM=1 SAM3_WINDOW_FUSE_ROPE=1 timeout 1800 python bench.py >> $log 2>&1
echo "=== MXU_SUM DONE $(date) ===" >> $log
echo "=== sweep MXU_SUM g=4 ===" >> $log
SAM3_WINDOW_MXU_SUM=1 SAM3_WINDOW_HEAD_GROUP=4 timeout 900 python scripts/sweep_window.py >> $log 2>&1
echo "=== SWEEP2 DONE $(date) ===" >> $log
