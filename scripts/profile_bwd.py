"""Bisect the backward pass: trunk-only adapter grad vs full-model grad.

Stages (each jitted, timed with host-fetch barriers):
  1. trunk fwd (train mode)
  2. trunk fwd + adapter-grad (remat as in training)
  3. full loss fwd
  4. full loss fwd + adapter-grad (the train step minus optimizer)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sam3_lora_tpu.config import LoRAConfig, ModelConfig  # noqa: F401 (env-tier tests)
from sam3_lora_tpu.models import build_sam3_image_model, init_model_fast
from sam3_lora_tpu.models.builder import dummy_batch
from sam3_lora_tpu.train.losses import LossConfig, compute_losses
from sam3_lora_tpu.train.trainer import merge_trainable, split_trainable

B = int(os.environ.get("B", "8"))
REPS = int(os.environ.get("REPS", "10"))


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[0])


def bench(name, fn, *args):
    t0 = time.time()
    _fetch(fn(*args))
    ct = time.time() - t0
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    _fetch(out)
    dt = (time.time() - t0) / REPS
    print(f"{name:40s} compile {ct:6.1f}s  steady {dt * 1e3:9.1f} ms")
    return dt


def main():
    # measure at the EXACT headline-bench config (int8 prequant base,
    # wo_block_mid, ffn-only encoder remat, uint8 images) so the anatomy
    # explains the driver's number — env-overridable like bench.py
    from bench import bench_lora_config, bench_model_config

    cfg = bench_model_config()
    lcfg = bench_lora_config()
    model = build_sam3_image_model(cfg, lora=lcfg)
    rng = np.random.RandomState(0)
    batch = dummy_batch(cfg, batch_size=B, with_targets=True)
    batch = batch.replace(
        images=jnp.asarray(
            rng.randint(0, 256, (B, 3, cfg.img_size, cfg.img_size)), jnp.uint8
        )
    )
    params = init_model_fast(model)
    trainable, frozen = split_trainable(params)
    del params
    if cfg.base_quant != "none" and os.environ.get("BENCH_PREQUANT", "1") == "1":
        from sam3_lora_tpu.ops.quant import prequantize_base

        frozen = prequantize_base(frozen, min_dim=cfg.base_quant_min_dim)
    key = jax.random.PRNGKey(0)

    # NOTE: frozen params MUST be an argument — closing over them bakes
    # 3.4 GB of literals into the HLO (measured 270 s lowering).
    def trunk_fwd(tr, fz, x, k):
        p = merge_trainable(tr, fz)
        out = model.apply(
            {"params": p}, x, train=True, rngs={"dropout": k},
            method=lambda m, img, train: m.trunk(img, train=train),
        )
        return jnp.sum(out.astype(jnp.float32))

    bench("trunk fwd (train)", jax.jit(trunk_fwd), trainable, frozen, batch.images, key)
    bench("trunk fwd+grad(adapters)",
          jax.jit(jax.grad(trunk_fwd)), trainable, frozen, batch.images, key)

    def full_loss(tr, fz, b, k):
        p = merge_trainable(tr, fz)
        out = model.apply({"params": p}, b, train=True, rngs={"dropout": k})
        return compute_losses(out, b.targets, LossConfig())["core_loss"]

    bench("full loss fwd (train)", jax.jit(full_loss), trainable, frozen, batch, key)
    bench("full loss fwd+grad(adapters)",
          jax.jit(jax.grad(full_loss)), trainable, frozen, batch, key)


if __name__ == "__main__":
    main()
