"""Multi-chip input-path probe (VERDICT r3 next-#6 / SURVEY hard-part #4).

Measures, on an 8-virtual-device CPU mesh (no TPU needed):
  1. host-only loader rate: JPEG decode + mask rasterize + static collate,
     img/s through the threaded DataLoader (the per-host production ceiling);
  2. the sharded device-prefetch path: prefetch_to_device with
     batch_sharding(mesh) + per-row bit-packed bool masks — correctness is
     covered by tests/test_prefetch.py; here we time the pipeline end to end.

The 8-chip demand is 8 x the per-chip train rate (BENCH_r*.json); the probe
prints both so the PARITY table can state how many host cores the decode
needs (rates scale ~linearly with cores; this box has 1).

Usage: python scripts/probe_input_rate.py   [PROBE_IMGS=128 PROBE_BATCH=8]
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    from sam3_lora_tpu.config import ModelConfig
    from sam3_lora_tpu.parallel import batch_sharding, make_mesh
    from sam3_lora_tpu.train.data import (
        COCOSegmentDataset,
        DataLoader,
        make_synthetic_coco,
    )
    from sam3_lora_tpu.train.prefetch import prefetch_to_device

    n_imgs = int(os.environ.get("PROBE_IMGS", "128"))
    batch = int(os.environ.get("PROBE_BATCH", "8"))
    workers = int(os.environ.get("PROBE_WORKERS", "8"))
    cfg = ModelConfig(dtype="bfloat16")  # full 1008^2 geometry, model unused

    root = os.environ.get("PROBE_DATA_DIR") or f"/tmp/probe_input_{n_imgs}"
    if not os.path.exists(os.path.join(root, "train", "_annotations.coco.json")):
        make_synthetic_coco(root, "train", num_images=n_imgs, img_size=cfg.img_size)
    ds = COCOSegmentDataset(root, "train", model_config=cfg)
    loader = DataLoader(
        ds, batch, shuffle=False, num_workers=workers, prefetch=3, drop_last=True
    )

    # 1. host-only loader rate (decode+rasterize+collate; no device)
    t0 = time.time()
    n = 0
    for b in loader.epoch(0):
        n += batch
    host_s = time.time() - t0
    host_rate = n / host_s

    # 2. sharded prefetch onto the 8-device mesh (packed bool wire)
    mesh = make_mesh()
    sharding = batch_sharding(mesh)
    t0 = time.time()
    n2 = 0
    for b in prefetch_to_device(
        iter(loader.epoch(1)), size=2, sharding=sharding, pack_bool=True
    ):
        jax.block_until_ready(b)
        n2 += batch
    mesh_s = time.time() - t0
    mesh_rate = n2 / mesh_s

    chip_rate = float(os.environ.get("PROBE_CHIP_RATE", "3.17"))  # BENCH_r03
    demand8 = 8 * chip_rate
    print(
        json.dumps(
            {
                "host_loader_img_per_s": round(host_rate, 3),
                "sharded_prefetch_img_per_s": round(mesh_rate, 3),
                "images": n,
                "host_cores": os.cpu_count(),
                "chip_rate_img_per_s": chip_rate,
                "demand_8chip_img_per_s": round(demand8, 2),
                "cores_needed_for_8chips": round(
                    demand8 / max(host_rate, 1e-9) * os.cpu_count(), 1
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
