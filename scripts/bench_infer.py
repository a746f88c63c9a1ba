"""Inference/serving benchmark on the real chip (full 848M config).

Measures the production serving path (reference analogue: infer_sam.py
single-image predict + sam3_image_processor.py cached-backbone re-ground):

  1. encode  — backbone pass per image (Sam3Processor.set_image device work)
  2. ground  — cached-backbone re-ground for one new text prompt
  3. e2e     — full eval forward (backbone + ground), batched over images,
               reported as img/s/chip

Reports LATENCY PERCENTILES (p50/p90/p99 over per-rep host-fetch-barriered
timings — BASELINE.json's metric names p50 single-image mask latency):
each rep is individually timed with a scalar host fetch as the barrier (the
axon tunnel ignores block_until_ready), so one contended rep shows up in the
spread instead of poisoning a mean.

Env: INFER_BATCH (default 1 and 4), INFER_QUANT (default also sweeps int8),
REPS (default 50). Run alone — the host has one CPU core and concurrent jobs
skew timings (see memory: tpu-bench-methodology).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = int(os.environ.get("REPS", "50"))

RESULTS = {}


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[0])


def timeit(name, fn, *args):
    _fetch(fn(*args))  # compile
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        out = fn(*args)
        _fetch(out)  # per-rep barrier: percentiles, not a polluted mean
        ts.append(time.time() - t0)
    ts = np.asarray(ts)
    p50, p90, p99 = (float(np.percentile(ts, q)) for q in (50, 90, 99))
    print(
        f"{name:52s} p50 {p50 * 1e3:8.2f} ms  p90 {p90 * 1e3:8.2f} ms  "
        f"p99 {p99 * 1e3:8.2f} ms  (min {ts.min() * 1e3:.2f})",
        flush=True,
    )
    RESULTS[name.strip()] = {
        "p50_ms": round(p50 * 1e3, 3),
        "p90_ms": round(p90 * 1e3, 3),
        "p99_ms": round(p99 * 1e3, 3),
        "min_ms": round(float(ts.min()) * 1e3, 3),
        "reps": REPS,
    }
    return p50


def run(quant: str, batches):
    from sam3_lora_tpu.config import LoRAConfig, ModelConfig
    from sam3_lora_tpu.models import (
        Batch,
        GeoPrompt,
        build_sam3_image_model,
        init_model_fast,
    )
    from sam3_lora_tpu.train.trainer import split_trainable

    if os.environ.get("INFER_TINY") == "1":
        from sam3_lora_tpu.config import tiny_model_config

        cfg = tiny_model_config(base_quant=quant, base_quant_min_dim=16)
    else:
        cfg = ModelConfig(dtype="bfloat16", base_quant=quant)
    lcfg = LoRAConfig(rank=32, alpha=64.0)
    model = build_sam3_image_model(cfg, lora=lcfg)
    params = init_model_fast(model)
    if quant != "none":
        from sam3_lora_tpu.ops.quant import prequantize_tree

        params = prequantize_tree(params, min_dim=cfg.base_quant_min_dim)

    @jax.jit
    def encode(p, images):
        return model.apply(
            {"params": p}, images, train=False,
            method=lambda m, img, train: m.backbone_image(img, train=train),
        )

    @jax.jit
    def ground(p, feats, poss, token_ids):
        b = token_ids.shape[0]
        batch = Batch(
            images=jnp.zeros((0,)),
            token_ids=token_ids,
            img_ids=jnp.zeros((b,), jnp.int32),
            geo=GeoPrompt.empty(b, cfg.max_prompt_boxes),
            targets=None,
        )
        out = model.apply(
            {"params": p}, feats, poss, batch, train=False,
            method=lambda m, f, ps, bt, train: m.ground(f, ps, bt, train=train),
        )
        return (
            jax.nn.sigmoid(out["pred_logits"][-1][..., 0]),
            out["pred_boxes"][-1],
            jax.nn.sigmoid(out["pred_masks"]),
        )

    @jax.jit
    def e2e(p, images, token_ids):
        b = token_ids.shape[0]
        batch = Batch(
            images=images,
            token_ids=token_ids,
            img_ids=jnp.arange(b, dtype=jnp.int32),
            geo=GeoPrompt.empty(b, cfg.max_prompt_boxes),
            targets=None,
        )
        out = model.apply({"params": p}, batch, train=False)
        return (
            jax.nn.sigmoid(out["pred_logits"][-1][..., 0]),
            out["pred_boxes"][-1],
            jax.nn.sigmoid(out["pred_masks"]),
        )

    rng = np.random.RandomState(0)
    tok = jnp.asarray(rng.randint(1, 1000, (1, cfg.text_context_length)), jnp.int32)
    for b in batches:
        # uint8 like the production pipeline ships (ViT normalizes on device)
        images = jnp.asarray(
            rng.randint(0, 256, (b, 3, cfg.img_size, cfg.img_size)), jnp.uint8
        )
        tok_b = jnp.tile(tok, (b, 1))
        if b == batches[0]:
            img1 = images[:1]
            dt = timeit(f"[{quant}] encode (backbone) bs=1", encode, params, img1)
            feats, poss = encode(params, img1)
            timeit(f"[{quant}] ground (cached backbone, 1 prompt)", ground,
                   params, feats, poss, tok)
        dt = timeit(f"[{quant}] e2e eval forward bs={b}", e2e, params,
                    images, tok_b)
        print(f"[{quant}] e2e throughput bs={b}: {b / dt:.3f} img/s/chip",
              flush=True)


def main():
    quants = os.environ.get("INFER_QUANT", "none,int8").split(",")
    batches = [int(x) for x in os.environ.get("INFER_BATCH", "1,4").split(",")]
    for q in quants:
        run(q, batches)
    print(json.dumps({"serving_latency": RESULTS}), flush=True)


if __name__ == "__main__":
    main()
