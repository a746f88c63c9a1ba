#!/bin/bash
# Round-4 queue C: windows-per-program (WPP) attack on the DMA-bound window
# kernel. The packed kernel's forward DMAs (2, 576, 128) blocks; the measured
# copy rate (~260 GB/s for 128-lane blocks, probe_dma_floor) is still far
# below the 819 GB/s HBM peak, and the grid is 288 tiny programs. Larger WPP
# means larger contiguous bursts + fewer launches, bounded by scoped VMEM
# (raised to 96 MB for the packed kernels, window_attention.py::_PARALLEL_BIG).
#  1. WPP microbench sweep {2, 4, 8} x {plain, +MXU_SUM}
#  2. full-bench runs of WPP=4 and WPP=8 (kernel-level wins have previously
#     evaporated at step level — always confirm on the real step)
#  3. fast-tier timing with --durations=25 (VERDICT r3 #3) — LAST, so the
#     host is otherwise quiet
cd /root/repo || exit 1
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
log=${R4_LOG:-/tmp/r4_exp.log}
echo "=== $(date) r4 queue C start ===" >> "$log"

run() {  # run <label> <timeout> <cmd...>
  local label=$1 t=$2
  shift 2
  echo "=== $(date) $label ===" >> "$log"
  timeout "$t" "$@" >> "$log" 2>&1
  echo "--- rc=$? $(date) ---" >> "$log"
}

for wpp in 2 4 8; do for ms in 0 1; do
  run "WPPSWEEP wpp=$wpp ms=$ms" 900 env \
    SAM3_WINDOW_WPP=$wpp SAM3_WINDOW_MXU_SUM=$ms \
    python scripts/sweep_window.py
done; done

run "BENCH_WPP4" 2400 env SAM3_WINDOW_WPP=4 python bench.py
run "BENCH_WPP8" 2400 env SAM3_WINDOW_WPP=8 python bench.py

run "FAST_TIER_TIME" 1200 python -m pytest tests/ -m "not slow" -q \
  --durations=25 -p no:cacheprovider
echo "=== QUEUE C DONE $(date) ===" >> "$log"
