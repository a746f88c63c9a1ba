#!/bin/bash
# Round-5 queue B: exploit the saved-attention-output remat policies (the
# long-kernel fwd replay is now DCE-able, commit e8f10c3) for larger-batch
# fits, probe the flat (non-scan) ViT layout's backward overlap, and push the
# real-data pipeline depth (VERDICT r5 next-#2/#5).
cd /root/repo || exit 1
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
log=${R5_LOG:-/root/repo/scripts/logs_r5_b.log}
echo "=== $(date) r5 queue B start ===" >> "$log"

run() {  # run <label> <timeout> <cmd...>
  local label=$1 t=$2
  shift 2
  echo "=== $(date) $label ===" >> "$log"
  timeout "$t" "$@" >> "$log" 2>&1
  echo "--- rc=$? $(date) ---" >> "$log"
}

# 1. encoder full remat with the enc_attn_out save policy at bs8: replay is
#    now in_proj+FFN only (~2 ms/layer); frees the ffn-mode's unrematted
#    attention residuals (~0.5 GB) if ~neutral -> the bs10 enabler
run "BS8_ENC1_POLICY" 2400 env BENCH_ENC_REMAT=1 python bench.py
# 2-3. max-lean configs at bs10/bs12: globals rematted (block_mid now saves
#    their o, killing the 4x15.5 ms long-kernel replay) + enc full remat
run "BS10_LEAN" 2400 env BENCH_BATCH=10 BENCH_REMAT=block_mid BENCH_ENC_REMAT=1 python bench.py
run "BS12_LEAN" 2400 env BENCH_BATCH=12 BENCH_REMAT=block_mid BENCH_ENC_REMAT=1 python bench.py
# 4. flat per-block ViT layout (no nn.scan): XLA may overlap the windowed
#    blocks' bwd small-ops (LN/gelu/relayout chains) across blocks
run "FLAT_BS8" 3600 env BENCH_SCAN=0 python bench.py
# 5. real-data with deeper pipeline (prefetch 6, device buffer 3, 12 workers)
run "REAL_DEEP" 3600 env BENCH_DATA=real BENCH_PREFETCH=6 BENCH_DEVBUF=3 BENCH_WORKERS=12 python bench.py
echo "=== QUEUE B DONE $(date) ===" >> "$log"
git add scripts/logs_r5_b.log && git commit -q -m "r5 queue B results: lean remat fits + flat layout + deep real-data pipeline" || true
